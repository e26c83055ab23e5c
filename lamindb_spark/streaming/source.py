"""Commit-log CDC as a Structured Streaming SOURCE.

``read_changes`` (catalog/commitlog.py) is batch-only: the caller owns
the "which version did I last see" bookkeeping. This module closes the
loop with a PySpark 4 Python streaming data source
(``pyspark.sql.datasource.DataSourceStreamReader``): commit VERSIONS
are the stream offsets, so Spark's own checkpoint carries the CDC
cursor and a restarted query resumes exactly after the last committed
version — ingest → CDC → downstream MERGE composes into an end-to-end
exactly-once pipeline (the Delta ``readChangeFeed`` shape).

Semantics per micro-batch (versions ``(start, end]``), identical to
:func:`read_changes`:

- ``op == "compact"`` commits are pure layout rewrites — emitted as
  nothing;
- MERGE/DELETE survivor rewrites (``survivor_files`` metadata) are
  excluded — unchanged rows never re-feed a consumer;
- every other added file is change data, one input partition per file
  (at scale a micro-batch fans out across executors by file).

Reference: lamindb's lineage/stream story stops at batch `Artifact`
versions (`artifact.py` version family); this is the Spark-native
extension of the same commit log to continuous consumers.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

FORMAT_NAME = "lamindb_commitlog"


class _ChangeFilePartition(InputPartition):
    def __init__(self, path: str | None, version: int = -1, with_version: bool = False):
        self.path = path
        self.version = version
        self.with_version = with_version


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_commits")


def _expired_error(table_path: str, start_v: int) -> ValueError:
    return ValueError(
        f"CDC stream offset v{start_v} is below the oldest retained "
        f"commit of {table_path} — the range was expired by checkpoint "
        "log cleanup; re-baseline the consumer from a full snapshot "
        "(read_snapshot) and restart with startingVersion set to the "
        "snapshot version"
    )


def _change_files(
    table_path: str, start_v: int, end_v: int, store=None
) -> list[tuple[int, str]]:
    """(version, absolute path) of change-data files in
    ``(start_v, end_v]`` — delegates to the shared
    :func:`catalog.commitlog.change_data_files` (one bounded listing,
    compact/survivor exclusion, dense-version expired-range guard), so
    the batch CDC reader and the stream cannot drift. Needs no
    SparkSession (safe in the data source's python worker)."""
    from ..catalog.commitlog import change_data_files

    return change_data_files(table_path, start_v, end_v, store)


def _newest_retained_add(table_path: str, store=None) -> str | None:
    """Absolute path of the most recently added file across retained
    commits (newest commit first), or None. Schema-inference helper:
    deliberately NOT window-guarded — it answers "show me any footer",
    not "give me a complete change feed"."""
    from ..catalog.logstore import DEFAULT_STORE

    store = store or DEFAULT_STORE
    log_dir = _log_dir(table_path)
    commits = sorted(
        (
            int(n[: -len(".json")])
            for n in store.list(log_dir)
            if n.endswith(".json")
            and not n.startswith(".tmp")
            and n[: -len(".json")].isdigit()
        ),
        reverse=True,
    )
    for v in commits:
        body = store.read_json(os.path.join(log_dir, f"{v:020d}.json"))
        adds = body.get("add", [])
        if adds:
            return os.path.join(table_path.rstrip("/"), adds[-1])
    return None


def _check_offset_retained(table_path: str, start_version: int, store=None) -> None:
    """Raise when change data strictly after ``start_version`` was
    expired by checkpoint log cleanup — the stream analogue of the
    boundary :func:`catalog.commitlog.read_changes` enforces. Called
    from ``initialOffset`` so a stale consumer fails at OPEN time;
    ``partitions`` (via :func:`_change_files`) re-checks every batch
    for mid-run expiry (ADVICE r7/r8).

    Delegates to the SAME dense-prefix guard the per-batch path uses
    (:func:`catalog.commitlog.change_data_files`) with a one-version
    window — one bounded listing, at most one commit-body read — so
    the open-time check and the per-batch check cannot drift (review
    finding: this was a third near-copy of the head computation)."""
    from ..catalog.commitlog import change_data_files

    try:
        change_data_files(table_path, start_version, start_version + 1, store)
    except ValueError:
        raise _expired_error(table_path, start_version) from None


def _latest_version(table_path: str, store=None) -> int:
    # checkpoint files count toward the head version: after log expiry
    # the newest checkpoint may be the only record of it, and a
    # regressing latestOffset would re-window the stream. Delegates to
    # the log's own head discovery (one pointer read + one tail
    # listing, O(tail) per trigger) — the same computation commit()
    # uses, not a local re-derivation.
    from ..catalog.commitlog import CommitLog

    return CommitLog(table_path, store)._head_version()


class CommitLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._table_path = options["path"]
        self._start = int(options.get("startingversion", -1))
        self._with_version = (
            str(options.get("withversioncolumn", "false")).lower() == "true"
        )
        # admission control (Delta's maxFilesPerTrigger analogue, by
        # commit count): cap each micro-batch at N versions past the
        # consumer's position so commits arriving during a long-running
        # query land as bounded batches instead of one giant replay.
        # Best-effort by API shape: the simple Python source API gives
        # latestOffset() no view of the CHECKPOINTED offset, so the
        # position is learned in-run (from commit()/partitions()) and
        # the first batch after a cold (re)start is uncapped.
        self._max_per_batch = int(options.get("maxversionsperbatch", 0))
        self._committed: int | None = None
        self._planned_start: int | None = None

    def initialOffset(self) -> dict:
        # fail stale consumers at OPEN time, not on the first
        # micro-batch (ADVICE r8): a startingVersion below the oldest
        # retained change data can never become readable again, so
        # surface the error before the query starts. The partitions()
        # guard stays for mid-run expiry (log cleanup racing a running
        # stream).
        _check_offset_retained(self._table_path, self._start)
        return {"version": self._start}

    def latestOffset(self) -> dict:
        latest = max(_latest_version(self._table_path), self._start)
        if self._max_per_batch > 0:
            # the engine acknowledges (commit) one batch BEHIND the one
            # it last planned (partitions), so the consumer's true
            # position is the max of both signals
            known = [
                v for v in (self._committed, self._planned_start) if v is not None
            ]
            if known:
                base = max(known)
                latest = max(min(latest, base + self._max_per_batch), base)
        return {"version": latest}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        self._planned_start = int(end["version"])  # position hint for the cap
        # expired-range guard (ADVICE r7): after write_checkpoint() +
        # expire_log() the per-commit change data below the checkpoint
        # is GONE — the feed must fail loudly, not go silently partial.
        # _change_files enforces it from its own (single, bounded)
        # listing, so the guard costs no extra I/O per micro-batch.
        files = _change_files(
            self._table_path, int(start["version"]), int(end["version"])
        )
        if not files:
            # an admissible empty batch: one partition that yields nothing
            return [_ChangeFilePartition(None)]
        return [
            _ChangeFilePartition(f, v, self._with_version) for v, f in files
        ]

    def read(self, partition: _ChangeFilePartition) -> Iterator:
        if partition.path is None:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        if partition.with_version:
            table = table.append_column(
                "_commit_version",
                pa.array([partition.version] * len(table), type=pa.int64()),
            )
        return iter(table.to_batches())

    def commit(self, end: dict) -> None:
        # offsets live in the query checkpoint (nothing to acknowledge
        # in the append-only log); remembered locally as the admission-
        # control base for the next micro-batch's cap
        self._committed = int(end["version"])


class CommitLogDataSource(DataSource):
    """``spark.readStream.format("lamindb_commitlog").option("path", t)``.

    Options: ``path`` (required) — the commit-log table directory;
    ``startingVersion`` (default -1) — emit changes of versions
    STRICTLY AFTER this (Delta's startingVersion semantics);
    ``withVersionColumn`` (default false) — append an int64
    ``_commit_version`` column so a downstream keyed apply can resolve
    multiple versions of one key landing in the SAME micro-batch
    (Delta's ``_commit_version`` CDF column; essential on
    checkpoint-wipe replays where the whole feed arrives as batch 0).
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        # infer from the newest change file so evolved columns are
        # visible; no SparkSession here — pyarrow reads the footer
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        table_path = self.options["path"]
        v = self.options.get("versionasof")
        snap = _snapshot_files(table_path, int(v) if v is not None else None)
        if snap:
            newest = snap[-1]
        else:
            # empty snapshot (e.g. every live file removed): any ONE
            # retained footer carries the schema, so walk retained
            # commits newest-first WITHOUT the dense-prefix expired-
            # range guard — schema inference needs no complete window,
            # and raising the CDC-expiry error here would fail opens
            # with a perfectly valid startingVersion (review finding).
            newest = _newest_retained_add(table_path)
            if newest is None:
                raise FileNotFoundError(
                    f"no committed data in {table_path}; commit once "
                    "before opening the source"
                )
        arrow = pq.ParquetFile(newest).schema_arrow
        if str(self.options.get("withversioncolumn", "false")).lower() == "true":
            arrow = arrow.append(pa.field("_commit_version", pa.int64()))
        return from_arrow_schema(arrow)

    def streamReader(self, schema) -> CommitLogStreamReader:
        return CommitLogStreamReader(dict(self.options))

    def reader(self, schema) -> "CommitLogBatchReader":
        # the BATCH half: spark.read.format("lamindb_commitlog") scans
        # the committed snapshot (optionally time-traveled with
        # .option("versionAsOf", v)) — one input partition per live
        # file, same arrow read path as the stream
        return CommitLogBatchReader(dict(self.options))


def stream_changes(
    spark: "SparkSession",
    table_path: str,
    starting_version: int = -1,
    with_version_column: bool = False,
    max_versions_per_batch: int = 0,
) -> "DataFrame":
    """Open a commit-log table's change feed as a streaming DataFrame.

    Micro-batch boundaries follow commit versions (everything newer
    than the checkpointed offset lands in the next batch); pair with
    :func:`lamindb_spark.streaming.sink.stream_merge_exactly_once`
    (``order_col="_commit_version"`` with ``with_version_column=True``)
    for an end-to-end exactly-once CDC apply."""
    spark.dataSource.register(CommitLogDataSource)
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("path", table_path)
        .option("startingVersion", starting_version)
        .option("withVersionColumn", str(with_version_column).lower())
        .option("maxVersionsPerBatch", max_versions_per_batch)
        .load()
    )


class CommitLogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self._table_path = options["path"]
        v = options.get("versionasof")
        self._version = int(v) if v is not None else None

    def partitions(self):
        files = _snapshot_files(self._table_path, self._version)
        if not files:
            return [_ChangeFilePartition(None)]
        return [_ChangeFilePartition(f) for f in files]

    def read(self, partition: _ChangeFilePartition):
        if partition.path is None:
            return iter(())
        import pyarrow.parquet as pq

        return iter(pq.read_table(partition.path).to_batches())


def _snapshot_files(table_path: str, version: int | None) -> list[str]:
    # local import: the reader runs in a python worker process where
    # only this module is shipped by value; the catalog import resolves
    # from the same installed package
    from ..catalog.commitlog import CommitLog

    _, files = CommitLog(table_path).snapshot(version)
    return files


def read_snapshot(
    spark: "SparkSession", table_path: str, version: int | None = None
) -> "DataFrame":
    """Batch-read a commit-log table through the registered data source
    (``spark.read.format("lamindb_commitlog")``), optionally
    time-traveled. Functionally equivalent to
    :func:`catalog.commitlog.read_committed`, but resolved through the
    source registry — the path a SQL-first user takes."""
    spark.dataSource.register(CommitLogDataSource)
    r = spark.read.format(FORMAT_NAME).option("path", table_path)
    if version is not None:
        r = r.option("versionAsOf", version)
    return r.load()
