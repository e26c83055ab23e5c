"""Window operators: version-family heads and latest-per-key.

The reference maintains exactly one ``is_latest`` head per version
family (stem uid) and branch, reconciled with ad-hoc SQL
(``_is_versioned.py:271-373``). In Spark this is one window:

    row_number() OVER (PARTITION BY stem, branch ORDER BY created DESC) == 1

which Catalyst executes as a single shuffle on the partition keys —
the minimal movement possible for this semantics at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mark_latest(
    df: DataFrame,
    family_cols: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
    flag_col: str = "is_latest",
) -> DataFrame:
    """Add boolean ``flag_col``: True for the newest row per family."""
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*family_cols).orderBy(*order)
    return df.withColumn(flag_col, F.row_number().over(w) == 1)


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep only the newest row per key (reference ``is_latest=True``
    default-get semantics, ``query_set.py:353-366``)."""
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def max_version_in_family(
    df: DataFrame, family_cols: list[str], version_col: str, out_col: str = "max_version"
) -> DataFrame:
    """Max version suffix per family (reference
    ``max_version_uid_in_family``, ``_is_versioned.py:195-213``)."""
    return df.groupBy(*family_cols).agg(F.max(version_col).alias(out_col))
