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
