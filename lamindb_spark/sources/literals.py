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


def local_frame(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Driver-side result rows → DataFrame via the Arrow batch path.

    ``createDataFrame(list_of_tuples)`` pickles row-by-row and decodes
    through per-partition Python workers — ~0.7–0.9 s per
    materialization at local[32] even for 64 rows. Routing the same
    rows through a pandas frame with Arrow serialization keeps the
    decode JVM-side (~0.15–0.25 s, and O(rows) instead of O(tasks)).
    Identical schema and values (pinned by test); exact ``schema`` is
    required, so no inference ambiguity. Arrow is enabled only for the
    duration of the conversion — the caller's session confs (and the
    behavior of every later ``toPandas``) are untouched. Any failure
    falls back to the classic path."""
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd

        names = spark.createDataFrame([], schema).columns
        pdf = pd.DataFrame.from_records(list(rows), columns=names)
        return local_frame_pdf(spark, pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


def local_frame_pdf(spark: SparkSession, pdf, schema=None) -> DataFrame:
    """Arrow-path ``createDataFrame`` for an existing pandas frame,
    with the Arrow conf scoped to the conversion (see
    :func:`local_frame`). ``schema=None`` keeps pandas-dtype
    inference, which for the flat numeric/string frames used here
    matches the classic path (pinned by the fast-path equality
    tests)."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    try:
        spark.conf.set(key, "true")
        if schema is None:
            return spark.createDataFrame(pdf)
        return spark.createDataFrame(pdf, schema=schema)
    finally:
        try:
            if prev is not None:
                spark.conf.set(key, prev)
        except Exception:
            pass
