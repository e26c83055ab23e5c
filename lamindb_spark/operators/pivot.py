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


def wide_customer_export(
    c: DataFrame, n: DataFrame, r: DataFrame, o: DataFrame
) -> DataFrame:
    """The §2.10 ``to_dataframe(include=...)`` registry-pivot kernel
    over the TPC-H shapes (reference ``query_set.py:1059-1141``
    process_cols_from_include + ``:719`` cardinality analysis): entity
    rows + a 2-hop to-one FK chain column (nation→region), a to-many
    sorted-list column (order priorities), and a pivoted feature
    (order-status counts) — one row per entity, no fanout: to-many
    paths aggregate BEFORE the join. Dim chain is broadcast; the two
    fact-side aggregations shuffle once on the entity key each and
    join back on that same key. Factored out of ``__spark_entry__``'s
    ``wide_include`` so the 120× registry scale study
    (``scripts/scale_registry.py``) times exactly the shipped kernel."""
    fk = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"], "left").select(
        F.col("n_nationkey").alias("__nk"),
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )
    many = o.groupBy("o_custkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        )
    )
    feat = (
        o.groupBy("o_custkey")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_custkey",
            F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_status_f"),
            F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_status_o"),
            F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_status_p"),
        )
    )
    return (
        c.join(F.broadcast(fk), c["c_nationkey"] == fk["__nk"], "left")
        .join(many, c["c_custkey"] == many["o_custkey"], "left")
        .drop("o_custkey")
        .join(feat, c["c_custkey"] == feat["o_custkey"], "left")
        .select(
            "c_custkey",
            "nation_name",
            "region_name",
            F.coalesce(F.col("priorities"), F.lit("")).alias("priorities"),
            F.coalesce(F.col("n_status_f"), F.lit(0)).alias("n_status_f"),
            F.coalesce(F.col("n_status_o"), F.lit(0)).alias("n_status_o"),
            F.coalesce(F.col("n_status_p"), F.lit(0)).alias("n_status_p"),
        )
    )
