"""Iterative graph closure — ontology parents/children & lineage walks.

The reference's recursive queries (``has_parents.py:34-71``,
``record.py:1057-1079``; run-graph traversal ``has_parents.py:527-632``)
loop a frontier of ids until fixpoint. The Spark-native equivalent is an
iterative DataFrame loop over an edge table:

    frontier ⋈ edges → next frontier;  visited ∪= frontier

Each step is one broadcast/shuffle join; ``localCheckpoint`` every few
iterations truncates the growing lineage so plans stay bounded on deep
graphs (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def closure(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "child_id",
    dst: str = "parent_id",
    id_col: str = "id",
    max_hops: int = 100,
    include_depth: bool = False,
) -> DataFrame:
    """Transitive closure from seed ids along ``src → dst`` edges.

    Returns distinct reached ids (excluding seeds) as column ``id_col``,
    plus ``depth`` (min hop count) when requested. BFS with a
    deduplicated frontier; every frontier is ``localCheckpoint``-ed so
    (a) the plan does not grow hop-over-hop (no exponential
    re-execution) and (b) ``visited`` is a union of already-materialized
    blocks — each hop costs exactly one join, at any graph depth.
    """
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).localCheckpoint(
        eager=True
    )
    frontier = (
        seeds.select(F.col(id_col).alias("__s")).distinct().localCheckpoint(eager=True)
    )
    visited = frontier.withColumn("depth", F.lit(0))
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, "__s")
            .select(F.col("__d").alias("__s"))
            .distinct()
            .join(visited.select("__s"), "__s", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt.withColumn("depth", F.lit(hop)))
        frontier = nxt
    out = visited.filter(F.col("depth") > 0)
    if include_depth:
        return out.select(F.col("__s").alias(id_col), "depth")
    return out.select(F.col("__s").alias(id_col))
