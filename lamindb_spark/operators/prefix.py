"""Distributed prefix computations — the shared scale primitive behind
global row ranking (``pipeline/mapped.py``) and token-stream packing
(``pipeline/rules.py``), unified in r6 (VERDICT r5 #8).

The naive ``Window.orderBy(...)`` with no partition key funnels the
entire dataset through ONE partition — the canonical Spark scale
killer. Both primitives here keep the data path distributed:

1. range-repartition + sort-within-partitions on the order columns
   (Spark's distributed sort; partition p holds keys strictly below
   partition p+1, so ascending pid reconstructs global order),
2. a partition-LOCAL position or cumulative sum,
3. per-partition totals → cumulative offsets — a #partitions-row
   plan, never a data-row plan — broadcast-joined back.

Data rows flow through exactly ONE wide exchange (the range shuffle);
the offset branch operates on #partitions rows (the same shape as RDD
``zipWithIndex``'s driver-side offset scan, kept inside the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cumulative_offsets(totals: DataFrame, pid_col: str, n_col: str, off_col: str) -> DataFrame:
    """Exclusive running total over the #partitions-row table. The
    single-partition window here is sanctioned: it sees one row per
    partition of the DATA plan, i.e. a few hundred rows at 100 TB."""
    return totals.withColumn(
        off_col,
        F.coalesce(
            F.sum(n_col).over(
                Window.orderBy(pid_col).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    ).select(pid_col, off_col)


def ranked_index(df: DataFrame, order_cols: list[Column], out_col: str) -> DataFrame:
    """Dense 0-based global rank of every row by ``order_cols``.

    After the range shuffle, ``monotonically_increasing_id``'s bit
    layout ``(partition_id << 33) | position`` yields BOTH the
    partition id and the key-ordered local position in one map-side
    projection — no per-partition window, no extra data exchange.
    pid and position derive from the single mid value, so the two are
    consistent by construction.
    """
    mask = (1 << 33) - 1
    local = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("long"))
        .withColumn("__local", F.col("__mid").bitwiseAND(F.lit(mask)))
        .drop("__mid")
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    offsets = _cumulative_offsets(counts, "__pid", "__n", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """INCLUSIVE global prefix sum of ``value_col`` in ``order_col``
    order, appended as ``out_col`` (long). Exclusive form = out_col -
    value_col, all-integer when the input is integral.

    Unlike :func:`ranked_index` the local step needs real accumulation,
    so it pays one partition-LOCAL window (``Window.partitionBy(pid)``
    — distributed) instead of the mid bit-trick; everything else is the
    same range-shuffle + broadcast-offsets shape. Callers should
    project to the narrow (keys, value) schema BEFORE calling so the
    shuffle moves a few bytes per row.
    """
    local = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    local = local.withColumn(
        "__cum", F.sum(F.col(value_col).cast("long")).over(w)
    )
    # partition total = SUM of values, not max of the running sum:
    # with negative values the running max exceeds the true total and
    # every later partition's offset inflates (review finding)
    totals = local.groupBy("__pid").agg(
        F.sum(F.col(value_col).cast("long")).alias("__tot")
    )
    offsets = _cumulative_offsets(totals, "__pid", "__tot", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__cum")).cast("long"))
        .drop("__pid", "__cum", "__off")
    )
