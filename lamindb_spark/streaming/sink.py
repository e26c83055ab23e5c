"""Streaming → catalog sink: land a stream as a tracked Artifact.

The reference's closest analogue is the write-tracking finalizer that
creates a new version when a backed artifact is closed
(``artifact.py:3091-3112`` ``_track_writes_factory``); here the same
idea runs continuously: each micro-batch appends parquet files under
the artifact's key, and the registry row is re-versioned per batch (or
once at stream end with ``availableNow``), so downstream consumers
always ``open_artifact`` a consistent snapshot through the catalog.

Scale notes: ``foreachBatch`` gives exactly-once parquet appends per
micro-batch under the default checkpointing contract; registry updates
are metadata-sized. The payload append itself is a distributed
``df.write`` — executor-parallel, no driver data path.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from ..catalog.logstore import DEFAULT_STORE, LogStore


def _identity_path(checkpoint_dir: str) -> str:
    return checkpoint_dir.rstrip("/") + "/_txn_identity.json"


def _read_identity(checkpoint_dir: str, store: LogStore) -> str | None:
    try:
        return store.read_json(_identity_path(checkpoint_dir)).get("id") or None
    except FileNotFoundError:
        return None


def _checkpoint_identity(checkpoint_dir: str, store: LogStore | None = None) -> str:
    """Identity BOUND to the checkpoint directory (Delta's appId ≅
    checkpoint contract): a micro-batch id only means "already applied"
    relative to the checkpoint that numbered it, because Spark restarts
    batch ids at 0 after a checkpoint wipe. Stored as a tiny JSON
    object inside the checkpoint dir, so wiping the checkpoint rotates
    the identity with it — without this, a wiped MERGE stream whose
    source replays old+NEW rows as batch 0 would match the OLD run's
    ``(name, 0)`` txn and silently drop the new rows (review finding).

    All reads/writes go through the :class:`LogStore` seam (ADVICE r9):
    checkpoint locations are commonly object-store URIs at cluster
    scale, and ``os.makedirs("s3a://...")`` would create a literal
    local directory visible to ONE driver node — after a driver move
    the identity silently rotates and the exactly-once guarantees
    break. The put-if-absent create also closes the two-driver race
    the old read/replace file dance left open (zombie driver during
    failover): exactly one identity wins and both read it back."""
    store = store or DEFAULT_STORE
    ident = _read_identity(checkpoint_dir, store)
    if ident:
        return ident
    candidate = uuid.uuid4().hex[:12]
    if store.put_json_if_absent(_identity_path(checkpoint_dir), {"id": candidate}):
        return candidate
    won = _read_identity(checkpoint_dir, store)  # lost the race — read winner
    return won if won else candidate


def stream_to_artifact(
    lakehouse,
    stream_df: DataFrame,
    key: str,
    checkpoint_dir: str,
    description: str | None = None,
    trigger_available_now: bool = True,
    timeout_sec: float = 300,
):
    """Run a streaming query that appends each micro-batch to the
    payload at ``key`` and registers/re-versions the Artifact when the
    stream drains. Returns the final artifact row.

    With ``trigger_available_now`` (the batch-drain mode used in tests
    and backfills) the query processes all available input then stops;
    for continuous jobs pass ``False`` and manage the returned query.
    """
    _sid, storage_root = lakehouse._resolve_storage_root()
    target = f"{storage_root}/{key}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(target)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"stream into '{key}' did not drain within {timeout_sec}s; "
                "query stopped — payload is partial and was NOT registered"
            )
        return lakehouse.register_artifact(
            target, key=key, description=description, otype="DataFrame"
        )
    return writer.start()


def stream_append_exactly_once(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    query_name: str = "stream",
    trigger_available_now: bool = True,
    timeout_sec: float = 300,
    store: LogStore | None = None,
):
    """Streaming append with END-TO-END exactly-once semantics into a
    commit-log table: each micro-batch commits through
    :func:`catalog.commitlog.append_dataframe_txn` keyed on
    ``(query_name, batch_id)``, so a replayed batch — Spark re-runs
    the last micro-batch after an unclean restart, the documented
    at-least-once edge of ``foreachBatch`` — is recognized in the log
    and skipped instead of double-appending.

    This is the Delta ``txn``/SetTransaction pattern; the plain
    ``mode("append")`` sink in :func:`stream_to_artifact` is
    at-least-once by comparison (duplicate part-files on replay).
    Readers use ``read_committed`` and never see staged files.
    """
    from ..catalog.commitlog import CommitLog, append_dataframe_txn

    # Wipe guard: a FRESH checkpoint (no identity file) while the table
    # already records txns for this query_name means batch numbering
    # restarted at 0 against a log that remembers the old numbering —
    # silently skipping batches (data loss) or re-appending the whole
    # replayed feed (duplication) are both wrong for an "exactly-once"
    # sink, so fail loudly and make the operator choose: restore the
    # checkpoint, or use a new query_name (accepting the re-append).
    if _read_identity(checkpoint_dir, store or DEFAULT_STORE) is None and any(
        t[0] == query_name for t in CommitLog(table_path, store).known_txns()
    ):
        raise ValueError(
            f"checkpoint {checkpoint_dir!r} is new/wiped but {table_path!r} "
            f"already records transactions for query_name={query_name!r}: "
            "batch ids restarted at 0 and would collide with the old "
            "run's. Restore the original checkpoint, or pass a NEW "
            "query_name (the stream will then re-append the full "
            "replayed source feed)."
        )
    _checkpoint_identity(checkpoint_dir, store)  # mark this checkpoint as used

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_dataframe_txn(batch_df, table_path, query_name, batch_id, store)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        # awaitTermination returns False on timeout with the query STILL
        # RUNNING — returning None then would let callers read a
        # partially-populated table with no signal (ADVICE r5). Stop the
        # query and raise instead.
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"stream '{query_name}' did not drain within {timeout_sec}s; "
                "query stopped — table contents are partial"
            )
        return None
    return writer.start()


def stream_merge_exactly_once(
    stream_df: DataFrame,
    table_path: str,
    key: str,
    checkpoint_dir: str,
    query_name: str = "merge-stream",
    timeout_sec: float = 300,
    order_col: str | None = None,
    store: LogStore | None = None,
) -> None:
    """Streaming UPSERT (CDC apply) into a commit-log table with
    end-to-end exactly-once semantics: each micro-batch MERGEs on
    ``key`` — later records for the same key replace earlier rows —
    and the commit carries the ``(query_name, batch_id)`` transaction
    identity, so a replayed batch after an unclean restart is detected
    in the log and skipped instead of double-applying.

    This is the standard change-data-capture landing pattern (Delta's
    ``foreachBatch`` + ``MERGE`` recipe): the stream carries row-level
    upserts, the table converges to one row per key. Within a batch,
    duplicate keys resolve deterministically to the highest-value row
    (max_by over the remaining columns) before the merge — foreachBatch
    gives no intra-batch ordering guarantee, so the reduction must be
    explicit. With ``order_col`` (e.g. the CDC feed's
    ``_commit_version`` from :func:`streaming.source.stream_changes`),
    duplicates resolve to the row with the HIGHEST order value — the
    correct semantics when a batch spans several source commits, as on
    a checkpoint-wipe replay — and the order column itself is dropped
    before the merge. Scale shape per batch = :func:`catalog.commitlog.
    merge_into`'s: footer-span file pruning, survivors rewritten
    narrowly, one optimistic commit.
    """
    from pyspark.sql import functions as F

    from ..catalog.commitlog import CommitLog, merge_into

    # txn identity bound to the CHECKPOINT, not the bare query name: a
    # wiped checkpoint restarts batch ids at 0, and the old run's
    # (name, 0) txn would swallow the new incarnation's batch 0 — with
    # its never-before-seen rows — whole (review finding). Rotation is
    # safe HERE because MERGE is idempotent per key: the full replayed
    # feed re-applies and converges (the append sink instead fails
    # loudly, where re-application would duplicate rows).
    app = f"{query_name}#{_checkpoint_identity(checkpoint_dir, store)}"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        log = CommitLog(table_path, store)
        if (app, batch_id) in log.known_txns():
            return  # replayed batch — already applied (survives log expiry)
        others = [c for c in batch_df.columns if c != key]
        if order_col is not None:
            rest = [c for c in others if c != order_col]
            # highest order wins; residual tie broken by the values
            # themselves so the reduction stays deterministic
            rank = F.struct(F.col(order_col), *[F.col(c) for c in rest])
            if rest:
                dedup = batch_df.groupBy(key).agg(
                    *[F.max_by(c, rank).alias(c) for c in rest]
                )
            else:
                # key-only stream: drop the order column BEFORE dedup —
                # dropDuplicates([key]) would keep an arbitrary order
                # value and leak _commit_version into the target schema
                # (ADVICE r7)
                dedup = batch_df.select(key).dropDuplicates()
        elif others:
            dedup = batch_df.groupBy(key).agg(
                *[F.max_by(c, F.struct(*others)).alias(c) for c in others]
            )
        else:
            # key-only stream: agg(*[]) raises — dedup is just distinct keys
            dedup = batch_df.dropDuplicates([key])
        if log.snapshot()[0] < 0:
            # first batch bootstraps the table (MERGE needs a snapshot).
            # Checkpoint-aware on purpose: after write_checkpoint() +
            # expire_log() the _commits dir can hold ZERO commit JSONs
            # while the table is non-empty (the snapshot lives in the
            # checkpoint) — gating on `not log.versions()` here re-took
            # the append path and silently duplicated keys (ADVICE r7)
            from ..catalog.commitlog import append_dataframe_txn

            append_dataframe_txn(dedup, table_path, app, batch_id, store)
            return
        merge_into(
            batch_df.sparkSession,
            table_path,
            dedup,
            key,
            extra_metadata={"txn_app": app, "txn_version": batch_id},
            store=store,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream '{query_name}' did not drain within {timeout_sec}s"
        )
