"""Literal (driver-side) dimension tables as LocalRelations.

``spark.createDataFrame`` turns small local data into a parallelized
RDD — a full 32-task job just to materialize 4 rows. A SQL ``VALUES``
clause instead becomes a Catalyst LocalRelation: zero tasks, constant-
folded, directly broadcastable. Registries/domains built in driver code
(synonym maps, whitelists) should always take this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def literal_table(
    spark: SparkSession, rows: list[tuple], columns: list[str]
) -> DataFrame:
    """Build a LocalRelation DataFrame from driver-side rows."""
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    cols = ", ".join(columns)
    return spark.sql(f"SELECT * FROM (VALUES {values}) AS t({cols})")
