"""EAV annotation pivot — the reference's ``to_dataframe`` wide export.

The reference's heaviest relational pipeline (``query_set.py:1142-1298``
+ helpers, ~700 LoC) LEFT-joins long-form feature annotations, pivots
them wide in pandas (``unstack``), and casts per-feature dtypes. Here
the whole thing is one lazy plan:

    annotations.groupBy(entity).pivot(feature).agg(...)   # map-side
    entity_df.join(pivoted, key, "left")                  # broadcast-able

``pivot(values=[...])`` with an explicit feature list avoids the extra
distinct-values job; multi-valued features aggregate to sorted arrays
(the reference collects sets), scalars take ``first``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_annotations(
    annotations: DataFrame,
    entity_key: str,
    feature_col: str,
    value_col: str,
    features: list[str] | None = None,
    multi_valued: bool = False,
) -> DataFrame:
    """Long (entity, feature, value) → wide one-row-per-entity.

    With ``features`` given, the pivot skips the distinct-feature scan —
    at scale that removes an entire job. ``multi_valued=True`` yields
    sorted deduped arrays per cell (stable, order-insensitive).
    """
    g = annotations.groupBy(entity_key)
    p = g.pivot(feature_col, features) if features else g.pivot(feature_col)
    if multi_valued:
        agg = F.array_sort(F.collect_set(F.col(value_col)))
    else:
        agg = F.first(F.col(value_col), ignorenulls=True)
    return p.agg(agg)


def to_wide(
    entities: DataFrame,
    annotations: DataFrame,
    entity_key: str,
    feature_col: str,
    value_col: str,
    features: list[str] | None = None,
    dtype_casts: dict[str, str] | None = None,
    multi_valued: bool = False,
) -> DataFrame:
    """Full wide export: entities LEFT JOIN pivoted annotations, then
    per-feature dtype casts (reference casts at
    ``query_set.py:921-978, 1277-1293``)."""
    wide = pivot_annotations(
        annotations, entity_key, feature_col, value_col, features, multi_valued
    )
    out = entities.join(wide, entity_key, "left")
    for feat, dtype in (dtype_casts or {}).items():
        if feat in out.columns:
            out = out.withColumn(feat, F.col(feat).cast(dtype))
    return out


def unwrap_singletons(df: DataFrame, array_cols: list[str]) -> DataFrame:
    """1-element arrays → scalar, like the reference's post-pivot
    flatten (``query_set.py:904-919``)."""
    for c in array_cols:
        df = df.withColumn(
            c, F.when(F.size(F.col(c)) == 1, F.col(c)[0]).otherwise(F.col(c).cast("string"))
        )
    return df
