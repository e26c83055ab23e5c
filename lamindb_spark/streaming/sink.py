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

from pyspark.sql import DataFrame


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
    from ..catalog.commitlog import append_dataframe_txn

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_dataframe_txn(batch_df, table_path, query_name, batch_id)

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
