"""Approximate aggregates — the sketches a 100 TB engine leans on.

SURVEY §2.4: the reference has no approximate aggregates (delegated
engines only); Spark ships them natively and at lakehouse scale they
replace exact operators wherever a bounded error is acceptable:

- ``approx_count_distinct`` (HyperLogLog++): cardinality of a 100 TB
  column in one scan, no shuffle of distinct values, ~1.5 KB of state
  per group vs an exact distinct's full shuffle.
- ``approx_percentile`` (Greenwald-Khanna / KLL-style): quantiles in
  one pass vs a full sort.
- frequent items (``count_min``-adjacent): heavy-hitter detection for
  skew diagnosis — exactly what picks the salting keys for
  :func:`lamindb_spark.operators.joins.salted_join`.

All pure built-ins (JVM, partial-aggregating, AQE-friendly); this
module just gives them engine-consistent signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.05) -> Column:
    """HLL++ distinct count with target relative standard deviation."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(
    col: str | Column, probabilities: list[float], accuracy: int = 10_000
) -> Column:
    """One-pass approximate percentiles (higher accuracy → more state)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )


def heavy_hitters(
    df: DataFrame, key: str, min_share: float = 0.01, top: int = 20
) -> DataFrame:
    """Keys holding at least ``min_share`` of all rows — the skew
    diagnosis feeding salting/bucketing decisions. Exact counts via one
    partial-aggregated groupBy; for truly unbounded key domains swap in
    a count-min sketch upstream, the output contract stays the same.
    """
    # ONE scan of df: key counts once, then the grand total as a 1-row
    # re-agg of the (already tiny) count table crossJoin-broadcast back
    # on. An earlier keyless Window.partitionBy() gathered the whole
    # count table into ONE task — on a distinct-heavy key the skew-
    # DIAGNOSIS helper itself became the skew hazard (review finding).
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("__total"))
        .filter(F.col("share") >= min_share)
        .drop("__total")
        .orderBy(F.desc("n"), F.col(key))
        .limit(top)
    )
