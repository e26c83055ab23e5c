"""ArtifactSet surface on QuerySet — load/open/mapped/to_artifact
(reference ``lamindb/models/artifact_set.py:34-380``)."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.query import QuerySet


@pytest.fixture()
def lake(lakehouse):
    """Two tabular artifacts with overlapping (not identical) schemas."""
    spark = lakehouse.spark
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "x bigint, shared string")
    df2 = spark.createDataFrame(
        [("c", 10.0), ("d", 11.0), ("e", 12.0)], "shared string, y double"
    )
    lakehouse.save_dataframe(df1, "exports/one.parquet")
    lakehouse.save_dataframe(df2, "exports/two.parquet")
    return lakehouse


def arts(lake):
    return QuerySet(lake, "artifact").filter(key__startswith="exports/").order_by("id")


def test_load_outer_unions_columns(lake):
    out = arts(lake).load(join="outer")
    assert set(out.columns) == {"x", "shared", "y"}
    assert out.count() == 5
    # rows from the shard missing a column carry NULL there
    assert out.filter(F.col("y").isNull()).count() == 2
    assert out.filter(F.col("x").isNull()).count() == 3


def test_load_inner_intersects_columns(lake):
    out = arts(lake).load(join="inner")
    assert out.columns == ["shared"]
    assert out.count() == 5


def test_load_inner_no_common_columns_raises(lake):
    d3 = lake.spark.createDataFrame([(True,)], "z boolean")
    lake.save_dataframe(d3, "exports/three.parquet")
    with pytest.raises(ValueError, match="no common columns"):
        arts(lake).load(join="inner")


def test_load_requires_artifact_registry(lake):
    with pytest.raises(TypeError, match="artifact query sets"):
        QuerySet(lake, "ulabel").load()


def test_load_empty_set_raises(lake):
    with pytest.raises(ValueError, match="empty artifact set"):
        QuerySet(lake, "artifact").filter(key="nope").load()


def test_open_spark_and_pyarrow(lake):
    import pyarrow.dataset as pads

    # spark engine: one multi-path scan over identical-suffix payloads
    one = (
        QuerySet(lake, "artifact").filter(key="exports/two.parquet").order_by("id")
    )
    sdf = one.open(engine="spark")
    assert sdf.count() == 3
    ds = one.open(engine="pyarrow")
    assert isinstance(ds, pads.Dataset)
    assert ds.count_rows() == 3
    with pytest.raises(ValueError, match="unknown engine"):
        one.open(engine="duckdb")


def test_mapped_random_access(lake):
    mc = arts(lake).mapped()
    assert len(mc) == 5
    row = mc[0]
    assert "_store_idx" in row and row["_store_idx"] == 0
    assert mc[4]["_store_idx"] == 1


def test_array_payloads_refused(lake):
    import os

    p = str(lake.root) + "_ann"
    os.makedirs(p, exist_ok=True)
    with open(p + "/obs.parquet", "wb") as f:
        f.write(b"stub")
    lake.register_artifact(p, key="ann/store", otype="AnnDataLong")
    qs = QuerySet(lake, "artifact").filter(key="ann/store").order_by("id")
    with pytest.raises(NotImplementedError, match="array store"):
        qs.load()


def test_load_tracks_run_inputs(lake):
    from lamindb_spark.lineage.context import Context

    ctx = Context(lake).track("pipelines/set_load.py", source_code="x=1")
    arts(lake).load().count()
    run_id = lake.current_run_id
    ctx.finish()
    linked = (
        lake.read_raw("run_input_artifacts")
        .filter(F.col("run_id") == run_id)
        .count()
    )
    assert linked == 2
    # is_run_input=False suppresses tracking
    ctx2 = Context(lake).track("pipelines/set_load2.py", source_code="x=2")
    arts(lake).load(is_run_input=False)
    run_id2 = lake.current_run_id
    ctx2.finish()
    assert (
        lake.read_raw("run_input_artifacts").filter(F.col("run_id") == run_id2).count()
        == 0
    )


def test_to_artifact_round_trip(lake):
    lake.save("ulabel", [{"name": "K562"}, {"name": "HEK293"}])
    res = QuerySet(lake, "ulabel").to_artifact()
    assert res["key"] == "record_exports/ulabel_subset.csv"
    back = lake.open_artifact(res["key"], is_run_input=False)
    names = {r["name"] for r in back.select("name").collect()}
    assert {"K562", "HEK293"} <= names
    # suffix overrides the default format; key and suffix are exclusive
    res2 = QuerySet(lake, "ulabel").to_artifact(suffix=".parquet")
    assert res2["key"].endswith(".parquet")
    with pytest.raises(AssertionError):
        QuerySet(lake, "ulabel").to_artifact(key="a.csv", suffix=".csv")


def test_artifacts_from_path(lake):
    row = QuerySet(lake, "artifact").get(key="exports/one.parquet")
    path = lake.artifact_path(row)
    hits = QuerySet(lake, "artifact").artifacts_from_path(path)
    assert hits.count() == 1 and hits.one()["key"] == "exports/one.parquet"
    assert (
        QuerySet(lake, "artifact").artifacts_from_path("/elsewhere/x.parquet").count()
        == 0
    )
    with pytest.raises(TypeError):
        QuerySet(lake, "ulabel").artifacts_from_path(path)


def test_track_run_inputs_setting(lake):
    from lamindb_spark.lineage.context import Context
    from pyspark.sql import functions as F

    lake.track_run_inputs = False
    ctx = Context(lake).track("p/quiet.py", source_code="q=1")
    run_id = lake.current_run_id
    lake.open_artifact("exports/one.parquet")  # auto → setting says no
    arts(lake).load()
    lake.open_artifact("exports/one.parquet", is_run_input=True)  # explicit wins
    ctx.finish()
    lake.track_run_inputs = True
    n = (
        lake.read_raw("run_input_artifacts")
        .filter(F.col("run_id") == run_id)
        .count()
    )
    assert n == 1


def test_to_artifact_empty_set(lake):
    res = QuerySet(lake, "record").to_artifact(key="exports/empty.csv")
    assert res["n_observations"] == 0
