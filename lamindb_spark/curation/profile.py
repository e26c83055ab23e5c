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
    (n_rows, n_null, n_distinct, min_val, max_val)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
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
