"""Temporal operators: as-of join, trailing range windows, sessionization.

The reference has no theta/range/as-of joins (SURVEY.md §2.3 note) —
these are Spark-native extensions for the event-stream side of a
training-data lakehouse, built to scale:

- ``asof_join_union``: the classic "latest left-row at or before each
  right-row" join implemented WITHOUT a range join. A naive
  ``a.ts <= b.ts`` join explodes quadratically per key; instead we
  UNION both sides, sort once per key inside a window, and carry the
  last left value forward (``last(..., ignorenulls=True)``). One
  shuffle on the key, linear work, no fanout — the same trick Flink's
  temporal join and kdb's aj use.
- ``trailing_window_agg``: per-row aggregates over a trailing time
  interval via a RANGE window frame on epoch-microseconds — pure
  window, no self-join.
- ``sessionize``: gap-based session ids via lag + running sum — the
  batch equivalent of Structured Streaming's ``session_window`` (see
  ``lamindb_spark.streaming.events`` for the streaming form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_micros(c: Column) -> Column:
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns (the
    engine session runs in UTC, so the NTZ cast is exact)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    left_value_cols: list[str],
) -> DataFrame:
    """For every row of ``right``, attach the most recent ``left`` row
    (same ``on`` key, ``left.ts <= right.ts``) — ties at equal ts count.

    Returns ``right`` columns plus ``asof_<c>`` for each left value
    column. Scales as one shuffle on ``on`` + one sort per partition.
    """
    lt = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__lv_{c}") for c in left_value_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right.columns if c not in (on, ts_col)],
    )
    rt = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__lv_{c}")
          for c in left_value_cols],
        *[F.col(c) for c in right.columns if c not in (on, ts_col)],
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(F.col(f"__lv_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in left_value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop(
        "__side", *[f"__lv_{c}" for c in left_value_cols]
    )


def trailing_window_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    trailing_micros: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Per-row aggregates over [ts - trailing, ts] within each key.

    ``aggs`` maps output name → aggregate Column (applied over the RANGE
    frame). Epoch-microsecond RANGE frame keeps tie handling identical
    across engines (peers are always included together).
    """
    mic = _epoch_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key)
        .orderBy(mic)
        .rangeBetween(-trailing_micros, 0)
    )
    return df.select("*", *[expr.over(w).alias(name) for name, expr in aggs.items()])


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_micros: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous row exceeds ``gap_micros``.

    Adds ``session_id`` (1-based per key). lag + running-sum — the
    standard linear sessionization; one shuffle on ``key``.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    mic = _epoch_micros(F.col(ts_col))
    gap = mic - F.lag(mic).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_micros), F.lit(1)).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(wcum))
