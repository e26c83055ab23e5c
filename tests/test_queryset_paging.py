"""QuerySet iteration/paging surface (reference: Django QuerySet
__iter__/__getitem__/iterator/__bool__, inherited by the reference's
models/query_set.py QuerySet)."""

import pytest

from lamindb_spark.catalog.query import QuerySet


@pytest.fixture()
def lake(lakehouse):
    lakehouse.save(
        "ulabel",
        [{"name": f"l{i:02d}"} for i in range(10)],
    )
    return lakehouse


def _qs(lake):
    return QuerySet(lake, "ulabel").order_by("name")


def test_iter_streams_rows_in_order(lake):
    names = [r["name"] for r in _qs(lake)]
    assert names == [f"l{i:02d}" for i in range(10)]
    # iterator() is the explicit spelling, chunk_size accepted
    assert [r["name"] for r in _qs(lake).iterator(chunk_size=3)] == names


def test_getitem_int_and_bounds(lake):
    qs = _qs(lake)
    assert qs[0]["name"] == "l00"
    assert qs[7]["name"] == "l07"
    with pytest.raises(IndexError):
        qs[10]
    with pytest.raises(ValueError, match="negative"):
        qs[-1]
    with pytest.raises(TypeError, match="integers or slices"):
        qs["name"]


def test_slice_pages(lake):
    qs = _qs(lake)
    page = qs[3:6]
    assert isinstance(page, QuerySet)
    assert [r["name"] for r in page._df.collect()] == ["l03", "l04", "l05"]
    # open-ended and empty slices
    assert [r["name"] for r in qs[8:]._df.collect()] == ["l08", "l09"]
    assert qs[6:6].count() == 0
    # stepped slice materializes a list (Django behavior)
    stepped = qs[0:6:2]
    assert [r["name"] for r in stepped] == ["l00", "l02", "l04"]
    with pytest.raises(ValueError, match="negative"):
        qs[-3:]
    # non-positive steps rejected with a QuerySet-specific message
    # (Django rejects them too; a silent [::-1] would reverse
    # plan-dependent order — ADVICE r13)
    with pytest.raises(ValueError, match="positive step"):
        qs[::-1]
    with pytest.raises(ValueError, match="positive step"):
        qs[0:6:0]
    # slicing composes with filters
    assert [r["name"] for r in _qs(lake).filter(name__gte="l05")[1:3]._df.collect()] == [
        "l06", "l07",
    ]


def test_bool_and_no_len(lake):
    assert bool(_qs(lake))
    empty = QuerySet(lake, "ulabel").filter(name="nope")
    assert not empty
    # deliberately no __len__: list(qs) must not probe a hidden full
    # count() job through CPython's length-hint protocol
    with pytest.raises(TypeError):
        len(_qs(lake))
    assert _qs(lake).count() == 10
