"""ANALYZE-style table profiling: per-column data-quality stats in ONE
aggregation pass — the lakehouse health check run before curation
(reference analogue: `Artifact.describe()` surfaces row/field stats;
this is the payload-level generalization a 100 TB table needs).

Shape: every requested column contributes (count, nulls, exact
distinct, min, max) expressions to a SINGLE `agg` — one scan; the
multi-distinct rewrite is Catalyst's expand-aggregate, still one pass
over the data with map-side partials. The 1-row result pivots to a
long (column, stat) frame driver-side via an explode of literal
structs — zero extra jobs. min/max surface as strings so heterogeneous
column types fit one schema (the caller keeps typed access by querying
the column directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form profile: one row per column with
    (n_rows, n_null, n_distinct, min_val, max_val).

    Plan note (measured at sf0.1 `events`): a variable-width (string)
    min/max in the same aggregate as the multi-distinct Expand forces
    the WHOLE 4n-row expanded stream through SortAggregate — Tungsten's
    hash buffer only holds fixed-width mutable values. String min/max
    therefore folds in a SEPARATE keyless aggregate (no keys → no sort,
    a plain partial/final fold) cross-joined back as a 1-row broadcast.
    Counts, distincts and numeric min/max stay in the one Expand-based
    hash aggregate. At 100 TB the trade is the same but bigger: one
    extra sequential columnar scan versus sorting 4n expanded rows.
    """
    dtypes = dict(df.dtypes)
    fixed = {
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "boolean", "date", "timestamp", "timestamp_ntz",
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    fold_aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
        ]
        minmax = aggs if dtypes.get(c) in fixed else fold_aggs
        minmax += [
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    if fold_aggs:
        one = one.crossJoin(F.broadcast(df.agg(*fold_aggs)))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
