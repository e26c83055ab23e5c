"""Round-15 optimization guards: the driver-local fast paths added for
iterative graph operators must stay bit-identical to the distributed
loops they shortcut (the same equality contract pagerank's r12 local
mode carries)."""

import pytest
from pyspark.sql import functions as F


def test_connected_components_local_matches_distributed(spark):
    from lamindb_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (9, 4), (4, 7), (7, 9), (11, 11), (5, 13)],
        ["id_a", "id_b"],
    )
    local = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, local=False).collect()
    }
    assert local == dist
    # min-id convention spot check: {1,2,3} -> 1, {4,7,9} -> 4
    assert local[3] == 1 and local[9] == 4 and local[11] == 11


def test_connected_components_local_string_ids(spark):
    from lamindb_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("z", "y")], ["id_a", "id_b"]
    )
    local = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, local=False).collect()
    }
    assert local == dist == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}


def test_connected_components_null_ids_fall_back(spark):
    """Null endpoints route to the distributed loop (pandas int->NaN
    coercion would corrupt ids locally); output matches local=False."""
    from lamindb_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (3, None), (None, 4)], "id_a: bigint, id_b: bigint"
    )
    default = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, local=False).collect()
    }
    assert default == dist


def test_connected_components_over_limit_probe_falls_back(spark):
    from lamindb_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(2, 1), (3, 2), (9, 4)], ["id_a", "id_b"])
    dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, local_edge_limit=1).collect()
    }
    assert dist == {1: 1, 2: 1, 3: 1, 4: 4, 9: 4}


def test_pagerank_probe_collect_matches_distributed(spark):
    """The r15 single-probe edge collect must preserve the r12 local/
    distributed equality (different pandas frame construction, same
    update rule)."""
    from lamindb_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(200)] + [(1, 2), (2, 3)],
        ["src", "dst"],
    )
    local = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    dist = {
        r["node"]: r["rank"] for r in pagerank(edges, iters=5, local=False).collect()
    }
    assert local == dist


def test_closure_edge_collect_matches_per_hop_scan(spark, monkeypatch):
    """The r15 driver-collected-edges BFS must agree with the per-hop
    scan mode it shortcuts (forced by making the edge probe bail)."""
    from lamindb_spark.operators import graph as g

    edges = spark.createDataFrame(
        [(k, k // 2) for k in range(2, 200)], ["child_id", "parent_id"]
    )
    seeds = spark.createDataFrame([(150,), (151,)], ["id"])
    fast = {
        r["id"]: r["depth"]
        for r in g.closure(
            edges, seeds, src="child_id", dst="parent_id", include_depth=True
        ).collect()
    }
    monkeypatch.setattr(g, "_closure_edges_local", lambda *a, **k: None)
    slow = {
        r["id"]: r["depth"]
        for r in g.closure(
            edges, seeds, src="child_id", dst="parent_id", include_depth=True
        ).collect()
    }
    assert fast == slow
    assert fast[75] == 1 and fast[1] == 7


def _rows_set(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_local_frame_matches_classic_createDataFrame(spark):
    """The Arrow-path local_frame must produce the same schema and
    values as the classic list-of-tuples createDataFrame it replaces."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from lamindb_spark.sources.literals import local_frame

    rows = [(0, 123456), (1, -999999), (2, 0)]
    ddl = "dim int, loading_micro long"
    a = local_frame(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert a.schema == b.schema and _rows_set(a) == _rows_set(b)

    srows = [("a",), ("b",), (None,)]
    sschema = StructType([StructField("__s", spark.createDataFrame([("x",)], ["__s"]).schema["__s"].dataType)])
    a = local_frame(spark, srows, sschema)
    b = spark.createDataFrame(srows, sschema)
    assert a.schema == b.schema and _rows_set(a) == _rows_set(b)

    ischema = StructType([StructField("__s", IntegerType())])
    irows = [(7,), (None,), (42,)]
    a = local_frame(spark, irows, ischema)
    b = spark.createDataFrame(irows, ischema)
    assert a.schema == b.schema and _rows_set(a) == _rows_set(b)


def test_local_frame_arrays_and_empty(spark):
    from lamindb_spark.sources.literals import local_frame

    rows = [(0, [1.0, 2.5]), (1, [0.25, -3.0])]
    ddl = "cid int, cvec array<double>"
    a = local_frame(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    assert a.schema == b.schema
    assert [r.asDict() for r in a.orderBy("cid").collect()] == [
        r.asDict() for r in b.orderBy("cid").collect()
    ]
    empty = local_frame(spark, [], ddl)
    assert empty.schema == b.schema and empty.count() == 0


def test_local_frame_restores_arrow_conf(spark):
    from lamindb_spark.sources.literals import local_frame

    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        local_frame(spark, [(1,)], "x int")
        assert spark.conf.get(key) == "false"
    finally:
        spark.conf.set(key, prev)


def test_cov_pair_stats_ragged_null_semantics(spark):
    """Pin the exact (n, si, sj, sij) semantics of the shared
    covariance kernel on ragged vectors, null elements and null vector
    rows: n counts rows where BOTH positions exist (null elements
    included), the sums are SQL null-skipping, and null/short vectors
    contribute nothing to absent positions. Values exact-in-binary so
    float sum order cannot blur the comparison."""
    from lamindb_spark.pipeline import similarity as sim

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 4.0]),
            (2, [0.5, -1.0, 8.0]),
            (3, [0.25, None, 2.0]),
            (4, [16.0, 0.125]),  # ragged: no position 2
            (5, None),  # null vector: contributes nothing
            (6, [-0.5, 4.0, 1.0]),
        ],
        "vec_id int, embedding array<double>",
    )
    got = {
        (r["i"], r["j"]): (r["n"], r["si"], r["sj"], r["sij"])
        for r in sim._cov_pair_stats(df, "embedding").collect()
    }
    assert got[(0, 0)] == (5, 17.25, 17.25, 257.5625)
    assert got[(0, 1)] == (5, 17.25, 5.125, 1.5)
    assert got[(0, 2)] == (4, 1.25, 15.0, 8.0)  # ragged row 4 excluded
    assert got[(1, 1)] == (5, 5.125, 5.125, 21.015625)
    assert got[(1, 2)] == (4, 5.0, 15.0, 4.0)  # row 3's null v1 skipped
    assert got[(2, 2)] == (4, 15.0, 15.0, 85.0)
    assert got[(2, 0)] == (4, 15.0, 1.25, 8.0)  # mirror swaps si/sj
    assert len(got) == 9


def test_cov_empty_and_allnull_frames(spark):
    from lamindb_spark.pipeline import similarity as sim

    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    assert sim.embedding_covariance(empty).count() == 0
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id int, embedding array<double>"
    )
    assert sim.embedding_covariance(allnull).count() == 0
