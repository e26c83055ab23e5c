"""Schema-flag validation: minimal/maximal/ordered column sets + dtype
checks (reference ``schema.py:584-592`` flags, enforced at
``curators/core.py:797-806``; dtype checks ``base/dtypes.py:20-87``).

Column-set checks are driver-side (metadata only). Dtype violation
counting is one aggregate pass over the data — all violation counts in
a single job, no per-column scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SchemaSpec:
    """Declared schema: ordered feature names → spark dtype strings."""

    features: dict[str, str]
    minimal_set: bool = True   # all declared columns required
    maximal_set: bool = False  # no undeclared columns allowed
    ordered_set: bool = False  # declared order must match
    optional: set[str] = field(default_factory=set)


def check_schema_columns(df: DataFrame, spec: SchemaSpec) -> dict[str, list[str]]:
    """Return {missing, unexpected, order_errors} column-name lists."""
    cols = list(df.columns)
    declared = list(spec.features)
    missing = (
        [c for c in declared if c not in cols and c not in spec.optional]
        if spec.minimal_set
        else []
    )
    unexpected = [c for c in cols if c not in declared] if spec.maximal_set else []
    order_errors: list[str] = []
    if spec.ordered_set:
        present = [c for c in declared if c in cols]
        actual = [c for c in cols if c in declared]
        if present != actual:
            order_errors = actual
    return {"missing": missing, "unexpected": unexpected, "order_errors": order_errors}


def _violation_cond(dtype: str, col: Column) -> Column:
    """Non-null value that fails to parse/cast as the declared dtype.

    ``try_cast``, not ``cast``: under ANSI mode (Spark 4 default) a
    plain cast *throws* on the very rows we are counting.
    """
    return col.isNotNull() & col.try_cast(dtype).isNull()


def check_dtypes(df: DataFrame, spec: SchemaSpec) -> dict[str, int]:
    """Count castability violations per declared column in ONE pass."""
    aggs = []
    for name, dtype in spec.features.items():
        if name in df.columns:
            aggs.append(
                F.sum(_violation_cond(dtype, F.col(name)).cast("long")).alias(name)
            )
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0]
    return {k: int(row[k] or 0) for k in row.asDict()}
