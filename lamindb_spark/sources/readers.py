"""Payload readers.

Mirrors the reference's suffix-dispatched loaders (reference
``lamindb/core/loaders.py:56-213`` and lazy open
``artifact.py:2920-3115``) as lazy ``spark.read`` scans: opening a
payload never materializes it; Catalyst pushes filters/projections into
the parquet scan.

``load_table`` knows the driver's testdata layout
(``<sf_dir>/<name>.parquet``) and papers over one producer quirk: the
``events`` table is written with parquet TIMESTAMP(NANOS), which Spark's
reader does not accept. With ``spark.sql.legacy.parquet.nanosAsLong``
the column arrives as int64 nanoseconds and we rebuild a
``timestamp_ntz`` column (UTC wall clock — identical values to what
DuckDB/pyarrow decode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as TIMESTAMP(NANOS) per table — read as int64 ns and rebuilt.
_NANOS_TS_COLS = {"events": ("ts",)}


def _rebuild_nanos_ts(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    for c in cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # int64 ns → µs → timestamp (session tz = UTC) → naive ntz.
            # Integer division: `/` would round-trip through DOUBLE and
            # lose µs precision above 2^53 ns (~1973) — off-by-1 vs the
            # exact ns→µs truncation DuckDB/pyarrow perform.
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    return df


# Session-scoped relation cache: (session, path, file fingerprint) →
# analyzed DataFrame. `spark.read.parquet` re-infers the schema from
# parquet footers on EVERY call (~100 ms of driver/py4j work per table
# at sf0.1) even though the relation is immutable metadata — this is
# what a table catalog exists to avoid, and at cluster scale the same
# role is played by the metastore / transaction-log snapshot cache
# (our own `catalog.commitlog.snapshot()` does this for managed
# tables; this cache is the analogue for raw-path reads). The lazy
# DataFrame carries no data, so reuse across queries changes no
# results; a changed file invalidates via the stat fingerprint, the
# same mechanism as `pipeline.similarity._MODEL_CACHE`.
_RELATION_CACHE: dict[tuple[int, str, str, tuple], DataFrame] = {}
_RELATION_CACHE_MAX = 256


def _path_fingerprint(path: str) -> tuple:
    """(mtime_ns, size) of the file, or of every member for a directory
    parquet — any rewrite changes the fingerprint."""
    import os

    try:
        st = os.stat(path)
    except OSError:
        # non-stat-able (remote URI, vanished file): no fingerprint
        # means no invalidation signal, so the caller must NOT cache —
        # a constant key here would pin the first relation forever
        # even after the remote object is rewritten (review finding)
        return None
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size)
    # RECURSIVE walk: a partitioned layout (<path>/a=1/b=2/part.parquet)
    # rewrites files two levels down without touching the top dir's
    # mtime or its immediate entries — a one-level listdir fingerprint
    # would serve the stale cached relation forever (review finding)
    parts = []
    for root, dirs, files in os.walk(path):
        dirs.sort()
        rel_root = os.path.relpath(root, path)
        for entry in sorted(files):
            try:
                est = os.stat(os.path.join(root, entry))
            except OSError:
                continue
            parts.append(
                (os.path.join(rel_root, entry), est.st_mtime_ns, est.st_size)
            )
    return (st.st_mtime_ns, tuple(parts))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one testdata table (relation cached per session)."""
    apply_runtime_confs(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    fp = _path_fingerprint(path)
    if fp is None:
        # no invalidation signal (remote URI / vanished file): build
        # uncached rather than risk serving a stale relation
        df = spark.read.parquet(path)
        if name in _NANOS_TS_COLS:
            df = _rebuild_nanos_ts(df, _NANOS_TS_COLS[name])
        return df
    key = (id(spark), spark.sparkContext.applicationId, path, fp)
    df = _RELATION_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if name in _NANOS_TS_COLS:
            df = _rebuild_nanos_ts(df, _NANOS_TS_COLS[name])
        if len(_RELATION_CACHE) >= _RELATION_CACHE_MAX:
            # evict superseded entries first: same (session, path) with
            # a DIFFERENT fingerprint can never hit again (the file was
            # rewritten); only if nothing is evictable, clear — a cold
            # cache costs one re-analysis, never correctness
            stale = [
                k
                for k in _RELATION_CACHE
                if k[:3] == key[:3] and k[3] != key[3]
            ]
            for k in stale:
                del _RELATION_CACHE[k]
            if len(_RELATION_CACHE) >= _RELATION_CACHE_MAX:
                _RELATION_CACHE.clear()
        _RELATION_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


# suffix → (format, options); the reference dispatches on suffix the same
# way (core/loaders.py:185-213) but eagerly into pandas — here it stays lazy.
_FORMATS: dict[str, tuple[str, dict[str, str]]] = {
    ".parquet": ("parquet", {}),
    ".csv": ("csv", {"header": "true", "inferSchema": "true"}),
    ".tsv": ("csv", {"header": "true", "inferSchema": "true", "sep": "\t"}),
    ".json": ("json", {}),
    ".jsonl": ("json", {}),
    ".orc": ("orc", {}),
    # Arrow IPC/feather: no native Spark source — bridged via pyarrow
    # (see _read_arrow_ipc). Fine for driver-sized files; at scale,
    # convert IPC payloads to parquet on ingest.
    ".arrow": ("__arrow__", {}),
    ".feather": ("__arrow__", {}),
    ".ipc": ("__arrow__", {}),
    ".txt": ("text", {}),
}


def _read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC/feather → DataFrame via a driver-side pyarrow read and
    Arrow-native createDataFrame. Driver-memory-bounded by design —
    the reference's IPC support is likewise an eager local read
    (``core/loaders.py`` suffix table)."""
    import pyarrow.feather as feather

    table = feather.read_table(path)
    return spark.createDataFrame(table.to_pandas())


def read_payload(spark: SparkSession, path: str, suffix: str | None = None) -> DataFrame:
    """Open any supported payload lazily (reference: ``Artifact.open``).

    Accepts a single file, a directory of homogeneous files, or a glob —
    multi-file scans are an implicit UNION ALL (reference
    ``artifact_set.py:64-82`` multi-file dataset open).
    """
    apply_runtime_confs(spark)
    sfx = suffix
    if sfx is None:
        base = path.rstrip("/").rsplit("/", 1)[-1]
        sfx = "." + base.rsplit(".", 1)[-1] if "." in base else ".parquet"
    if sfx not in _FORMATS:
        raise ValueError(f"unsupported payload suffix {sfx!r}; known: {sorted(_FORMATS)}")
    fmt, opts = _FORMATS[sfx]
    if fmt == "__arrow__":
        return _read_arrow_ipc(spark, path)
    reader = spark.read.format(fmt)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load(path)
