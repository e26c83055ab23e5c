"""SparkSession factory with engine defaults.

The engine targets large multi-executor clusters; locally we run
``local[N]``. Defaults chosen for scale:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switches replace hand-tuned partition counts.
- Arrow on: any unavoidable Python stage moves batches, not rows.
- Session timezone UTC: payload timestamps are naive/UTC; keeps results
  engine-independent (matches DuckDB/pyarrow semantics).
- ``nanosAsLong``: some producers write TIMESTAMP(NANOS) parquet, which
  Spark's vectorized reader rejects; we read the raw int64 and rebuild
  timestamps in the loader (see ``sources.readers``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs we need even on a session we did not build
# (the verification driver passes us its own session).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # registries / dims are small; let Spark broadcast aggressively
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment; builder path sets it instead
    return spark


def _default_driver_memory() -> str:
    """Driver heap default scaled to detected system RAM, like the cpu/
    shuffle settings: 16g only where it comfortably fits (≥48 GB), 8g
    down to 16 GB hosts, 4g below — a library entry point must not OOM
    the machine it is imported on. ``$SPARK_DRIVER_MEMORY`` overrides.
    """
    try:
        total_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) / (1 << 30)
    except (AttributeError, ValueError, OSError):
        return "8g"
    if total_gb >= 48:
        return "16g"
    if total_gb >= 16:
        return "8g"
    return "4g"


def get_spark(app_name: str = "lamindb-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores. On a
    real cluster the master/conf comes from spark-submit; everything here
    is safe to leave in place.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_parts = max(2 * n, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{n}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    # Scan-split tuning. At production scale (100 TB of ~128 MB-1 GB
    # files) the 128 MB default yields thousands of scan tasks per
    # table; the benchmark fixtures are single small files, so scan
    # parallelism at test scale requires a proportionally smaller
    # split size. Env-gated so default behavior is untouched; used by
    # the row-group-split experiment (BASELINE.md).
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if mpb:
        builder = builder.config("spark.sql.files.maxPartitionBytes", mpb).config(
            "spark.sql.files.openCostInBytes", mpb
        )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)


def release_checkpoints(spark: SparkSession) -> int:
    """Unpersist every persistent RDD — in particular the
    ``localCheckpoint`` blocks left behind by iterative operators
    (graph closure, dup groups, BPE, logreg): each invocation pins
    its blocks in the block manager for the life of the session, so a
    long-lived service (or a benchmark loop) should sweep between
    units of work or memory pressure creeps. Returns the number of
    RDDs released. Call BETWEEN units of work only: localCheckpoint
    truncates lineage, so frames still referencing a swept checkpoint
    cannot recompute — release when prior results are consumed."""
    n = 0
    try:
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)
            n += 1
    except Exception:
        pass
    return n
