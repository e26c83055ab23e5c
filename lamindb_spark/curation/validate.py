"""Curation: validate / inspect / standardize value sets.

Reference semantics (``can_curate.py``):
- ``validate(values, field)`` → boolean mask of which values exist in a
  registry column (``can_curate.py:159-216``)
- ``inspect`` → partition into validated / non-validated
  (``can_curate.py:56-156``)
- ``standardize`` → map synonyms ("|"-delimited synonym column) to the
  canonical name (``can_curate.py:219-299``)

Spark-first: all three are joins against the registry (broadcast — the
registry/domain side is small by construction), so validation of a
100 TB column is a single scan + broadcast lookup, no shuffle of the
data being validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_values(
    values: DataFrame,
    registry: DataFrame,
    value_col: str,
    registry_field: str,
) -> DataFrame:
    """Add boolean ``validated``: does the value exist in the registry
    column? (left broadcast join + null test)."""
    domain = F.broadcast(
        registry.select(F.col(registry_field).alias(value_col)).distinct()
        .withColumn("__hit", F.lit(True))
    )
    return values.join(domain, value_col, "left").withColumn(
        "validated", F.coalesce(F.col("__hit"), F.lit(False))
    ).drop("__hit")


def inspect_values(
    values: DataFrame, registry: DataFrame, value_col: str, registry_field: str
) -> tuple[DataFrame, DataFrame]:
    """(validated, non_validated) split."""
    flagged = validate_values(values, registry, value_col, registry_field)
    return (
        flagged.filter(F.col("validated")).drop("validated"),
        flagged.filter(~F.col("validated")).drop("validated"),
    )


def synonym_map(registry: DataFrame, name_field: str, synonyms_field: str) -> DataFrame:
    """Explode the "|"-delimited synonyms column into (synonym → name)
    rows, including the name itself (reference explodes the same way)."""
    syns = registry.select(
        F.col(name_field).alias("__name"),
        F.explode(
            F.array_union(
                F.split(F.coalesce(F.col(synonyms_field), F.lit("")), "\\|"),
                F.array(F.col(name_field)),
            )
        ).alias("__syn"),
    ).filter(F.col("__syn") != "")
    # ONE canonical name per synonym: two registry rows claiming the
    # same synonym would otherwise fan out every matching data row in
    # the standardize join (review finding — silent row duplication).
    # min(name) is the deterministic winner, matching validate's
    # set-membership semantics.
    return syns.groupBy("__syn").agg(F.min("__name").alias("__name"))


def standardize_values(
    values: DataFrame,
    registry: DataFrame,
    value_col: str,
    name_field: str,
    synonyms_field: str,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Map each value through the synonym table to the canonical name;
    unmatched values pass through unchanged (reference default)."""
    m = F.broadcast(synonym_map(registry, name_field, synonyms_field))
    out = values.join(m, values[value_col] == m["__syn"], "left")
    canonical = F.coalesce(F.col("__name"), F.col(value_col)) if keep_unmatched else F.col("__name")
    return out.withColumn("standardized", canonical).drop("__syn", "__name")


def from_values(
    lakehouse,
    registry_name: str,
    values: list,
    field: str = "name",
    defaults: dict | None = None,
) -> DataFrame:
    """Bulk get-or-create (reference ``models/_from_values.py:50-170``,
    V9): load registry rows matching ``values`` on ``field``; create the
    missing ones; return the full matched set.

    Spark shape: anti-join finds the missing values (one broadcast
    lookup — ``values`` is a user-supplied list, always small relative
    to the registry), append them via the catalog upsert, then a semi
    filter returns the complete row set.
    """
    # None entries can never round-trip (isin() never matches NULL, so
    # a null row would be re-created on EVERY call and never returned —
    # review finding); the reference's from_values likewise skips nulls
    values = [v for v in values if v is not None]
    if lakehouse.settings.creation.search_names:
        reg = lakehouse.read(registry_name)
        present = {
            r[0]
            for r in reg.filter(F.col(field).isin(values))
            .select(field)
            .distinct()
            .collect()
        }
    else:
        # settings.creation.search_names=False (reference
        # CreationSettings): skip the existing-name lookup for bulk
        # speed — duplicates become the caller's concern, as documented
        # on the reference setting
        present = set()
    missing = [v for v in dict.fromkeys(values) if v not in present]
    if missing:
        lakehouse.save(
            registry_name, [{field: v, **(defaults or {})} for v in missing]
        )
    return lakehouse.read(registry_name).filter(F.col(field).isin(values))
