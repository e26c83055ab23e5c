"""Lookup compiler + Q algebra (SURVEY §2.2 F1/F2).

Mirrors the reference's queryset filter tests
(``tests/pydata/test_queryset.py``) on small literal frames.
"""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.operators.filters import Q, compile_filters, compile_lookup, split_lookup
from lamindb_spark.sources.literals import literal_table


@pytest.fixture(scope="module")
def df(spark):
    return literal_table(
        spark,
        [
            (1, "alpha", 10.0, "A"),
            (2, "Beta", 20.0, "B"),
            (3, "gamma ray", 30.0, None),
            (4, "delta", None, "A"),
        ],
        ["id", "name", "score", "tag"],
    )


def _ids(df, cond):
    return sorted(r["id"] for r in df.filter(cond).select("id").collect())


def test_exact_and_none(df):
    assert _ids(df, compile_lookup("name", "alpha")) == [1]
    assert _ids(df, compile_lookup("tag", None)) == [3]


def test_case_insensitive(df):
    assert _ids(df, compile_lookup("name__iexact", "BETA")) == [2]
    assert _ids(df, compile_lookup("name__icontains", "AMMA")) == [3]
    assert _ids(df, compile_lookup("name__istartswith", "be")) == [2]


def test_comparisons(df):
    assert _ids(df, compile_lookup("score__gt", 10)) == [2, 3]
    assert _ids(df, compile_lookup("score__gte", 10)) == [1, 2, 3]
    assert _ids(df, compile_lookup("score__lt", 20)) == [1]
    assert _ids(df, compile_lookup("score__lte", 20)) == [1, 2]
    assert _ids(df, compile_lookup("score__range", (10, 20))) == [1, 2]


def test_membership_null_regex(df):
    assert _ids(df, compile_lookup("name__in", ["alpha", "delta"])) == [1, 4]
    assert _ids(df, compile_lookup("score__isnull", True)) == [4]
    assert _ids(df, compile_lookup("score__isnull", False)) == [1, 2, 3]
    assert _ids(df, compile_lookup("name__regex", "^ga.*ray$")) == [3]
    assert _ids(df, compile_lookup("name__iregex", "^GAMMA")) == [3]


def test_q_algebra(df):
    cond = (Q(name="alpha") | Q(name="delta")) & ~Q(tag="A")
    assert _ids(df, cond.to_column()) == []
    cond2 = Q(score__gt=15) & ~Q(name__startswith="gamma")
    assert _ids(df, cond2.to_column()) == [2]
    assert _ids(df, compile_filters(Q(tag="A") | Q(tag="B"), id__lte=2)) == [1, 2]


def test_split_lookup():
    assert split_lookup("a__b__gte") == ("a__b", "gte")
    assert split_lookup("plain") == ("plain", "exact")
    assert split_lookup("rel__field") == ("rel__field", "exact")


def test_in_requires_collection(df):
    with pytest.raises(TypeError):
        compile_lookup("name__in", "alpha")
