"""Commit-log CDC streaming source (streaming/source.py): version
offsets in the query checkpoint, change-only emission, and the
end-to-end exactly-once composition with the MERGE sink."""

import os

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.commitlog import (
    append_dataframe,
    compact,
    merge_into,
    read_committed,
)
from lamindb_spark.streaming.source import stream_changes


def _drain(stream_df, batches: list, checkpoint: str, name: str):
    """Run the stream availableNow, appending (batch_id, rows) tuples."""

    def sink(bdf, bid):
        batches.append((bid, sorted(tuple(r) for r in bdf.collect())))

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"


def test_stream_emits_each_change_exactly_once(spark, tmp_path):
    """3-commit log (append, append, merge): the stream emits exactly
    the changed rows — no survivor rewrites, no compaction rereads —
    and a restart from the SAME checkpoint emits nothing new until a
    new commit lands."""
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    df = lambda rows: spark.createDataFrame(rows, ["id", "val"])  # noqa: E731
    append_dataframe(df([(1, "a"), (2, "b")]).coalesce(1), t)
    append_dataframe(df([(3, "c")]).coalesce(1), t)
    merge_into(spark, t, df([(2, "B"), (4, "d")]), "id")

    batches: list = []
    _drain(stream_changes(spark, t), batches, ckpt, "cdc1")
    got = sorted(row for _bid, rows in batches for row in rows)
    # the merge emits its upsert rows only — (1,'a') and (3,'c') were
    # rewritten as survivors and must NOT re-feed
    assert got == [(1, "a"), (2, "B"), (2, "b"), (3, "c"), (4, "d")]

    # restart, same checkpoint: offset persisted -> empty
    batches2: list = []
    _drain(stream_changes(spark, t), batches2, ckpt, "cdc2")
    assert all(rows == [] for _bid, rows in batches2)

    # a compaction is layout churn: still nothing to emit
    compact(spark, t, target_files=1)
    batches3: list = []
    _drain(stream_changes(spark, t), batches3, ckpt, "cdc3")
    assert all(rows == [] for _bid, rows in batches3)

    # one real new commit: exactly its rows arrive
    append_dataframe(df([(5, "e")]).coalesce(1), t)
    batches4: list = []
    _drain(stream_changes(spark, t), batches4, ckpt, "cdc4")
    got4 = [row for _bid, rows in batches4 for row in rows]
    assert got4 == [(5, "e")]


def test_cdc_to_merge_sink_exactly_once_even_after_checkpoint_wipe(
    spark, tmp_path
):
    """The composition VERDICT r6 #6 asks for: commit-log ingest →
    CDC stream → downstream MERGE. The downstream table converges to
    one row per key; wiping the source checkpoint and replaying the
    whole feed changes NOTHING downstream (keyed MERGE makes the apply
    idempotent — the exactly-once story end-to-end)."""
    import shutil

    from lamindb_spark.streaming.sink import stream_merge_exactly_once

    src_tbl = str(tmp_path / "src")
    dst_tbl = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    df = lambda rows: spark.createDataFrame(rows, ["id", "val"])  # noqa: E731
    append_dataframe(df([(1, "a"), (2, "b")]).coalesce(1), src_tbl)
    append_dataframe(df([(3, "c")]).coalesce(1), src_tbl)
    merge_into(spark, src_tbl, df([(2, "B2")]), "id")

    stream_merge_exactly_once(
        stream_changes(spark, src_tbl, with_version_column=True),
        dst_tbl,
        "id",
        ckpt,
        query_name="apply",
        order_col="_commit_version",
    )
    want = {(1, "a"), (2, "B2"), (3, "c")}
    got = {(r["id"], r["val"]) for r in read_committed(spark, dst_tbl).collect()}
    assert got == want

    # wipe the checkpoint: the full feed replays, but the keyed MERGE
    # (latest _commit_version wins) converges to the same state — no
    # duplicates, no lost rows
    shutil.rmtree(ckpt)
    stream_merge_exactly_once(
        stream_changes(spark, src_tbl, with_version_column=True),
        dst_tbl,
        "id",
        str(tmp_path / "ckpt2"),
        query_name="apply-replay",
        order_col="_commit_version",
    )
    got2 = {(r["id"], r["val"]) for r in read_committed(spark, dst_tbl).collect()}
    assert got2 == want


def test_starting_version_skips_history(spark, tmp_path):
    """startingVersion=N streams only versions > N (Delta semantics)."""
    t = str(tmp_path / "tbl")
    df = lambda rows: spark.createDataFrame(rows, ["id"])  # noqa: E731
    v0 = append_dataframe(df([(1,)]).coalesce(1), t)
    append_dataframe(df([(2,)]).coalesce(1), t)
    batches: list = []
    _drain(
        stream_changes(spark, t, starting_version=v0),
        batches,
        str(tmp_path / "ck"),
        "sv",
    )
    got = [row for _bid, rows in batches for row in rows]
    assert got == [(2,)]
