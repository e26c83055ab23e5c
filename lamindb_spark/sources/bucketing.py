"""Bucketed tables: shuffle-free co-located joins (SURVEY §4 / north
star "repartition/bucketing for co-located joins").

Writing both sides of a recurring join bucketed by the join key means
every future join between them is exchange-free: Spark's scan emits the
bucket partitioning, the join runs bucket-to-bucket. At 100 TB this
converts the single most expensive operation in the pipeline — the
fact-to-fact shuffle — into a local merge per bucket, and it composes
with AQE (bucket pruning + coalescing still apply).

Buckets are written through the session catalog (``saveAsTable``) —
bucket metadata lives in the metastore; plain ``.parquet(path)`` writes
cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 64,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    ``n_buckets`` should be sized so a bucket of the LARGER table fits
    an executor core's working set (rows/n_buckets × row width ≲ a few
    hundred MB); both sides of a co-located join must use the same
    ``n_buckets`` and key.
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table — the bucket spec rides along and joins on
    the bucket key skip the exchange."""
    return spark.table(table)
