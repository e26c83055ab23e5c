"""DataFrameCurator — the reference's composed curation flow.

Reference ``DataFrameCurator.validate()`` (``curators/core.py:893-909``)
runs a schema/dtype pass then a categorical pass
(``DataFrameCatManager``, ``:2030-2242``); ``standardize()`` fills
defaults and maps synonyms (``:834-881``); a valid frame saves as an
artifact whose categorical values are linked as annotation rows
(``annotate_artifact``, ``:2261-2400``).

Spark shape: dtype violations are one aggregate pass; each categorical
check is a broadcast anti-join of the column's distinct values against
the registry domain; annotation writes are long-form appends. The
frame being curated is never shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema_check import SchemaSpec, check_dtypes, check_schema_columns
from .validate import standardize_values, synonym_map


@dataclass
class CategoricalSpec:
    """One categorical column validated against a registry domain."""

    registry: DataFrame
    field: str
    synonyms_field: str | None = None


class CurationError(ValueError):
    pass


class DataFrameCurator:
    def __init__(
        self,
        df: DataFrame,
        spec: SchemaSpec,
        categoricals: dict[str, CategoricalSpec] | None = None,
        defaults: dict[str, object] | None = None,
    ):
        self.df = df
        self.spec = spec
        self.categoricals = categoricals or {}
        self.defaults = defaults or {}
        self._report: dict | None = None

    def validate(self) -> dict:
        """Schema flags + dtype counts + per-categorical invalid values.

        Returns {"columns": ..., "dtypes": {col: n_bad}, "categoricals":
        {col: [invalid values]}, "is_valid": bool}.
        """
        cols = check_schema_columns(self.df, self.spec)
        dtypes = {k: v for k, v in check_dtypes(self.df, self.spec).items() if v}
        cats: dict[str, list] = {}
        for col, cspec in self.categoricals.items():
            if col not in self.df.columns:
                continue
            domain = cspec.registry.select(
                F.col(cspec.field).alias("__v")
            ).distinct()
            if cspec.synonyms_field:
                domain = domain.unionByName(
                    synonym_map(cspec.registry, cspec.field, cspec.synonyms_field)
                    .select(F.col("__syn").alias("__v"))
                ).distinct()
            bad = (
                self.df.select(F.col(col).alias("__v"))
                .filter(F.col("__v").isNotNull())
                .distinct()
                .join(F.broadcast(domain), "__v", "left_anti")
                .collect()
            )
            if bad:
                cats[col] = sorted(r["__v"] for r in bad)
        report = {
            "columns": cols,
            "dtypes": dtypes,
            "categoricals": cats,
            "is_valid": not (
                cols["missing"] or cols["unexpected"] or cols["order_errors"]
                or dtypes or cats
            ),
        }
        self._report = report
        return report

    def standardize(self) -> "DataFrameCurator":
        """Fill missing declared columns with defaults (typed-null when
        none), map categorical synonyms to canonical names. Returns a
        new curator over the standardized frame."""
        df = self.df
        for name, dtype in self.spec.features.items():
            if name not in df.columns:
                df = df.withColumn(name, F.lit(self.defaults.get(name)).cast(dtype))
        for col, cspec in self.categoricals.items():
            if cspec.synonyms_field and col in df.columns:
                df = (
                    standardize_values(
                        df, cspec.registry, col, cspec.field, cspec.synonyms_field
                    )
                    .withColumn(col, F.col("standardized"))
                    .drop("standardized")
                )
        return DataFrameCurator(df, self.spec, self.categoricals, self.defaults)

    def save_artifact(self, lakehouse, key: str, description: str | None = None):
        """Validate; on success write the artifact and link each
        categorical column's distinct values as annotation rows (V8)."""
        report = self._report or self.validate()
        if not report["is_valid"]:
            raise CurationError(f"not valid: {report}")
        art = lakehouse.save_dataframe(self.df, key, description=description)
        for col, cspec in self.categoricals.items():
            if col not in self.df.columns:
                continue
            vals = sorted(
                r[0]
                for r in self.df.select(col).filter(F.col(col).isNotNull()).distinct().collect()
            )
            if cspec.synonyms_field:
                # annotate with CANONICAL names: validation accepts
                # synonyms (pinned lenient semantics), but annotating
                # the raw synonym made features__<col>=<canonical>
                # silently miss the artifact (review finding)
                m = {
                    r["__syn"]: r["__name"]
                    for r in synonym_map(
                        cspec.registry, cspec.field, cspec.synonyms_field
                    ).collect()
                }
                vals = sorted({m.get(v, v) for v in vals})
            # one scalar annotation row per value (explode_lists), so
            # the EAV filter path can match individual values
            lakehouse.annotate(
                "artifact", art["id"], {col: vals}, explode_lists=True
            )
        return art
