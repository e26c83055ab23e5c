"""Optimistic-concurrency commit log: multi-writer appends, snapshot
isolation, time travel, conflict detection (catalog/commitlog.py)."""

import os
import threading

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.commitlog import (
    CommitConflictError,
    CommitLog,
    append_dataframe,
    compact,
    read_committed,
)


def test_append_snapshot_isolation(spark, tmp_path):
    """Readers see exactly the committed files: staged-but-uncommitted
    data is invisible; each append becomes visible atomically."""
    t = str(tmp_path / "tbl")
    v0 = append_dataframe(spark.range(0, 10), t)
    assert read_committed(spark, t).count() == 10
    # stage a directory WITHOUT committing — must stay invisible
    spark.range(100, 200).write.parquet(os.path.join(t, "stage-orphan"))
    assert read_committed(spark, t).count() == 10
    v1 = append_dataframe(spark.range(10, 25), t)
    assert v1 > v0
    assert read_committed(spark, t).count() == 25
    # time travel: the v0 snapshot still reads exactly the first append
    assert read_committed(spark, t, version=v0).count() == 10


def test_concurrent_writers_never_lose_commits(spark, tmp_path):
    """N threads committing concurrently: every commit wins a distinct
    version and every file survives — the os.link CAS is the only
    coordination point."""
    t = str(tmp_path / "tbl")
    log = CommitLog(t)
    os.makedirs(t, exist_ok=True)
    n_writers, per_writer = 8, 5
    errors = []

    def writer(wid):
        try:
            for i in range(per_writer):
                fname = f"w{wid}-{i}.parquet"
                open(os.path.join(t, fname), "wb").close()
                log.commit(add=[fname])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    versions = log.versions()
    assert len(versions) == n_writers * per_writer
    assert versions == list(range(n_writers * per_writer)), "dense distinct versions"
    _, live = log.snapshot()
    assert len(live) == n_writers * per_writer, "no lost commits"


def test_compaction_swap_and_conflict(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in range(0, 30, 10):
        append_dataframe(spark.range(lo, lo + 10), t)
    v = compact(spark, t, target_files=1)
    assert v >= 3
    df = read_committed(spark, t)
    assert df.count() == 30
    assert len(df.inputFiles()) == 1, "compacted to one file"
    # rows identical across the swap
    assert sorted(r["id"] for r in df.collect()) == list(range(30))
    # conflicting remove: removing an already-removed file raises
    log = CommitLog(t)
    with pytest.raises(CommitConflictError, match="already removed"):
        log.commit(remove=["stage-definitely-gone/x.parquet"])


def test_crashed_writer_leaves_no_trace(spark, tmp_path):
    """A writer that staged files and died before commit affects
    nothing; a later compaction doesn't pick its orphans up either."""
    t = str(tmp_path / "tbl")
    append_dataframe(spark.range(5), t)
    spark.range(1000).write.parquet(os.path.join(t, "stage-crashed"))
    compact(spark, t)
    assert read_committed(spark, t).count() == 5


def test_txn_append_is_idempotent(spark, tmp_path):
    from lamindb_spark.catalog.commitlog import append_dataframe_txn

    t = str(tmp_path / "tbl")
    v = append_dataframe_txn(spark.range(0, 10), t, "job-a", 0)
    assert v is not None
    # replay of the SAME transaction: skipped, no new rows, no new commit
    assert append_dataframe_txn(spark.range(0, 10), t, "job-a", 0) is None
    assert read_committed(spark, t).count() == 10
    assert CommitLog(t).versions() == [v]
    # a different txn version (next batch) lands normally
    assert append_dataframe_txn(spark.range(10, 15), t, "job-a", 1) is not None
    assert read_committed(spark, t).count() == 15
    # same version from a DIFFERENT app is a different transaction
    assert append_dataframe_txn(spark.range(100, 102), t, "job-b", 0) is not None
    assert read_committed(spark, t).count() == 17


def test_stream_exactly_once_replay(spark, tmp_path):
    """Exactly-once append across restarts: a RETAINED checkpoint
    resumes with zero re-appends; a WIPED checkpoint with the same
    query_name fails LOUDLY instead of guessing. (The old behavior —
    silently dedup the wiped replay on (name, batch_id) — lost data
    whenever new rows had arrived before the wipe, because they share
    batch 0 with the replay and were skipped with it; r9 second
    review pass.)"""
    import pytest as _pytest

    from lamindb_spark.catalog.commitlog import CommitLog
    from lamindb_spark.streaming.sink import stream_append_exactly_once

    src = str(tmp_path / "src")
    spark.range(0, 50).write.parquet(src)
    table = str(tmp_path / "tbl")
    stream = spark.readStream.schema("id long").parquet(src)
    stream_append_exactly_once(stream, table, str(tmp_path / "ck1"), "ingest")
    assert read_committed(spark, table).count() == 50
    n_commits = len(CommitLog(table).versions())
    # wiped checkpoint + same query_name: batch numbering restarted —
    # refuse at open, directing the operator to the safe recoveries
    stream2 = spark.readStream.schema("id long").parquet(src)
    with _pytest.raises(ValueError, match="new/wiped"):
        stream_append_exactly_once(stream2, table, str(tmp_path / "ck2"), "ingest")
    assert read_committed(spark, table).count() == 50
    # recovery 1: the ORIGINAL checkpoint resumes cleanly (no new
    # input -> no new batches -> no duplicates)
    stream3 = spark.readStream.schema("id long").parquet(src)
    stream_append_exactly_once(stream3, table, str(tmp_path / "ck1"), "ingest")
    assert read_committed(spark, table).count() == 50
    assert len(CommitLog(table).versions()) == n_commits


def test_delete_where_prunes_and_history(spark, tmp_path):
    """Predicate DELETE rewrites only overlapping files; CDC emits
    nothing for a delete; history lists every op newest-first."""
    from lamindb_spark.catalog.commitlog import delete_where, history, read_changes

    t = str(tmp_path / "tbl")
    df = spark.range(0, 800).withColumn("val", F.col("id") * 3)
    stage = str(tmp_path / "init")
    df.repartitionByRange(8, "id").sortWithinPartitions("id").write.parquet(stage)
    files = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    os.makedirs(t, exist_ok=True)
    for f in files:
        os.rename(os.path.join(stage, f), os.path.join(t, f))
    CommitLog(t).commit(add=files, metadata={"op": "append"})

    got = delete_where(spark, t, "id", lo=100, hi=140)
    assert got["n_rewritten"] <= 2 and got["n_pruned"] >= 6
    out = read_committed(spark, t)
    ids = sorted(r["id"] for r in out.collect())
    assert len(ids) == 800 - 41 and 100 not in ids and 140 not in ids and 99 in ids
    # CDC: the delete added no rows
    assert read_changes(spark, t, since_version=got["version"] - 1).count() == 0
    # no-op delete outside every span
    assert delete_where(spark, t, "id", lo=10_000)["version"] == -1
    # history: newest first, ops recorded
    h = history(t)
    assert [r["op"] for r in h][:2] == ["delete", "append"]
    assert h[0]["version"] > h[1]["version"]
    assert h[0]["metadata"]["n_pruned"] >= 6


def test_schema_enforcement_and_evolution(spark, tmp_path):
    """Delta-style schema contract: enforce rejects drift BEFORE any
    commit; merge admits new columns (evolution) readable with
    merge_schema; retypes always raise."""
    from lamindb_spark.catalog.commitlog import SchemaMismatchError

    t = str(tmp_path / "tbl")
    append_dataframe(spark.range(5).withColumn("val", F.col("id") * 2), t)
    n_commits = len(CommitLog(t).versions())

    # extra column under enforce → rejected, log untouched
    evolved = spark.range(5, 8).withColumn("val", F.col("id")).withColumn("tag", F.lit("x"))
    with pytest.raises(SchemaMismatchError, match="new columns"):
        append_dataframe(evolved, t)
    # missing column → rejected
    with pytest.raises(SchemaMismatchError, match="missing table columns"):
        append_dataframe(spark.range(3), t)
    # retyped column → rejected even under merge
    retyped = spark.range(3).withColumn("val", F.lit("oops"))
    with pytest.raises(SchemaMismatchError, match="retyped"):
        append_dataframe(retyped, t, mode="merge")
    assert len(CommitLog(t).versions()) == n_commits, "no commit on rejection"

    # evolution: merge admits the new column
    append_dataframe(evolved, t, mode="merge")
    out = read_committed(spark, t, merge_schema=True)
    assert set(out.columns) == {"id", "val", "tag"}
    rows = {r["id"]: r["tag"] for r in out.collect()}
    assert rows[6] == "x" and rows[0] is None  # old files read null
    assert out.count() == 8


def test_compact_small_files_binpack(spark, tmp_path):
    """Bin-packing OPTIMIZE: many small append files collapse into few
    outputs; a file already at target size is left untouched (same
    path before and after); rows survive exactly; CDC treats the swap
    as maintenance (op=compact → excluded)."""
    from lamindb_spark.catalog.commitlog import compact_small_files, read_changes

    t = str(tmp_path / "tbl")
    for lo in range(0, 50, 10):
        append_dataframe(spark.range(lo, lo + 10).coalesce(1), t)
    got = compact_small_files(spark, t, target_bytes=10 * 1024 * 1024)
    assert got["n_rewritten"] == 5 and got["n_bins"] >= 1
    out = read_committed(spark, t)
    assert sorted(r["id"] for r in out.collect()) == list(range(50))
    assert len(set(out.inputFiles())) == got["n_bins"]
    # second run: everything already packed → no-op
    again = compact_small_files(spark, t, target_bytes=10 * 1024 * 1024)
    assert again["version"] == -1 and again["n_rewritten"] == 0
    # compaction is invisible to incremental consumers
    v = got["version"]
    assert read_changes(spark, t, since_version=v - 1, to_version=v).count() == 0


def test_stream_merge_exactly_once(spark, tmp_path):
    """Streaming CDC apply: upserts land via MERGE per micro-batch,
    the table converges to one row per key, an incremental batch
    applies once, and a full replay against a WIPED checkpoint is
    recognized by its txn identity and skipped."""
    from lamindb_spark.streaming.sink import stream_merge_exactly_once

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, 1) for i in range(10)] + [(i, 2) for i in range(5, 15)],
        "id long, val long",
    ).write.parquet(src)

    def drain(ck):
        stream = spark.readStream.schema("id long, val long").parquet(src)
        stream_merge_exactly_once(stream, table, "id", str(tmp_path / ck), "cdc")

    drain("ck1")
    out = {r["id"]: r["val"] for r in read_committed(spark, table).collect()}
    # one row per key; overlapping keys resolved to the max-val record
    assert len(out) == 15
    assert out[0] == 1 and out[5] == 2 and out[14] == 2
    n_commits = len(CommitLog(table).versions())

    # incremental upsert through the SAME checkpoint: a new batch merges
    spark.createDataFrame([(0, 9), (99, 9)], "id long, val long").write.mode(
        "append"
    ).parquet(src)
    drain("ck1")
    out = {r["id"]: r["val"] for r in read_committed(spark, table).collect()}
    assert out[0] == 9 and out[99] == 9 and len(out) == 16

    # full replay, wiped checkpoint: the txn identity is checkpoint-
    # bound (r9 second review pass), so batch 0 of the new incarnation
    # is NOT mistaken for the old run's batch 0 — it re-MERGEs the
    # whole re-derived feed, which is idempotent per key: the STATE
    # converges (this is the path that previously lost any new rows
    # that had arrived before the wipe, silently skipped with the
    # replay)
    drain("ck-wiped")
    out2 = {r["id"]: r["val"] for r in read_committed(spark, table).collect()}
    assert out2 == out


def test_read_changes_incremental_feed(spark, tmp_path):
    from lamindb_spark.catalog.commitlog import read_changes

    t = str(tmp_path / "tbl")
    v0 = append_dataframe(spark.range(0, 10), t)
    v1 = append_dataframe(spark.range(10, 30), t)
    compact(spark, t, target_files=1)
    v3 = append_dataframe(spark.range(30, 35), t)
    # everything after v0: the two real appends, NOT the compaction
    got = sorted(r["id"] for r in read_changes(spark, t, since_version=v0).collect())
    assert got == list(range(10, 35))
    # bounded window
    got = sorted(
        r["id"] for r in read_changes(spark, t, v0, to_version=v1).collect()
    )
    assert got == list(range(10, 30))
    # empty window → empty frame with the table schema
    assert read_changes(spark, t, since_version=v3).count() == 0


def test_merge_into_upsert_with_file_pruning(spark, tmp_path):
    """Upsert touching a narrow key range rewrites ONLY the files whose
    footer span overlaps it; a clustered table keeps most files as
    untouched bytes and untouched log entries."""
    from lamindb_spark.catalog.commitlog import CommitLog, merge_into

    t = str(tmp_path / "tbl")
    # clustered layout: 8 files, each a tight id range
    df = spark.range(0, 800).withColumn("val", F.col("id") * 10)
    stage = str(tmp_path / "init")
    df.repartitionByRange(8, "id").sortWithinPartitions("id").write.parquet(stage)
    files = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    # move staged files under the table dir and commit them
    os.makedirs(t, exist_ok=True)
    for f in files:
        os.rename(os.path.join(stage, f), os.path.join(t, f))
    CommitLog(t).commit(add=files, metadata={"op": "append"})
    before = {p for p in read_committed(spark, t).inputFiles()}

    # upsert: update ids 100..104, insert ids 10_000..10_001
    src = spark.createDataFrame(
        [(100 + i, -1) for i in range(5)] + [(10_000, -2), (10_001, -2)],
        "id long, val long",
    )
    merge_into(spark, t, src, "id")
    out = read_committed(spark, t)
    assert out.count() == 802
    vals = {r["id"]: r["val"] for r in out.filter(F.col("id").isin(99, 100, 104, 10_000)).collect()}
    assert vals[99] == 990 and vals[100] == -1 and vals[104] == -1 and vals[10_000] == -2
    # pruning: at most 1-2 of the 8 original files rewritten
    log = CommitLog(t)
    with open(os.path.join(log.log_dir, f"{log.versions()[-1]:020d}.json")) as fh:
        import json as _json

        meta = _json.load(fh)["metadata"]
    assert meta["op"] == "merge"
    assert meta["n_rewritten"] <= 2, meta
    assert meta["n_pruned"] >= 6, meta
    after = {p for p in out.inputFiles()}
    # the pruned files are literally the same paths as before
    assert len(before & after) >= 6


def test_read_committed_pruned_skips_files(spark, tmp_path):
    """Stats-pruned snapshot read: a narrow range predicate on a
    clustered table must scan ONLY the overlapping files (driver-side
    footer check) and return exactly what a full scan + filter would."""
    from lamindb_spark.catalog.commitlog import read_committed_pruned

    t = str(tmp_path / "tbl")
    df = spark.range(0, 800).withColumn("val", F.col("id") * 2)
    stage = str(tmp_path / "init")
    df.repartitionByRange(8, "id").sortWithinPartitions("id").write.parquet(stage)
    files = [f for f in os.listdir(stage) if f.endswith(".parquet")]
    os.makedirs(t, exist_ok=True)
    for f in files:
        os.rename(os.path.join(stage, f), os.path.join(t, f))
    CommitLog(t).commit(add=files, metadata={"op": "append"})

    pruned = read_committed_pruned(spark, t, "id", lo=100, hi=140)
    rows = sorted(r["id"] for r in pruned.collect())
    assert rows == list(range(100, 141))
    # file-level skip proven by the scan's input set: ≤2 of 8 files
    assert len(set(pruned.inputFiles())) <= 2
    full = read_committed(spark, t).filter((F.col("id") >= 100) & (F.col("id") <= 140))
    assert sorted(r["id"] for r in full.collect()) == rows
    # open ranges and empty intersections behave
    assert read_committed_pruned(spark, t, "id", lo=799).count() == 1
    assert read_committed_pruned(spark, t, "id", lo=5000).count() == 0


def test_vacuum_collects_unreferenced_and_orphans(spark, tmp_path):
    from lamindb_spark.catalog.commitlog import vacuum

    t = str(tmp_path / "tbl")
    append_dataframe(spark.range(0, 10), t)
    append_dataframe(spark.range(10, 30), t)
    compact(spark, t, target_files=1)          # removes the 2 appends' files
    # crashed writer's orphan stage
    spark.range(99).write.parquet(os.path.join(t, "stage-deadbeef0000"))
    before = read_committed(spark, t).count()

    # retain full history → nothing referenced may go, orphan goes
    got = vacuum(t, retain_versions=10, min_age_sec=0)
    assert got["orphan_dirs"] == 1
    assert got["data_files"] == 0
    assert read_committed(spark, t).count() == before

    # retain only the latest snapshot → pre-compaction files collected
    got = vacuum(t, retain_versions=0, min_age_sec=0)
    assert got["data_files"] >= 2
    assert read_committed(spark, t).count() == before
    # time travel BEYOND the horizon now fails on missing bytes — the
    # documented trade; the latest snapshot is fully intact
    with pytest.raises(Exception):
        read_committed(spark, t, version=CommitLog(t).versions()[0]).count()


def test_optimize_vs_concurrent_append_both_land(spark, tmp_path, monkeypatch):
    """VERDICT r6 #5: OPTIMIZE racing a writer is the first conflict
    that actually happens at scale. A compaction whose inputs are all
    still live must survive a concurrent append (version retry, no
    remove-set overlap) and the append's file must NOT be swallowed by
    the swap — both commits land, zero lost or duplicated rows."""
    from lamindb_spark.catalog import commitlog as CL

    t = str(tmp_path / "tbl")
    for lo in range(0, 30, 10):
        CL.append_dataframe(spark.range(lo, lo + 10).coalesce(1), t)
    orig = CL.CommitLog.commit
    state = {"fired": False}

    def racing(self, add=None, remove=None, metadata=None, **kw):
        # deterministic interleaving: the rival append lands AFTER the
        # compaction planned its swap but BEFORE its commit
        if metadata and metadata.get("op") == "compact" and not state["fired"]:
            state["fired"] = True
            CL.append_dataframe_txn(spark.range(100, 110).coalesce(1), t, "rival", 0)
        return orig(self, add=add, remove=remove, metadata=metadata, **kw)

    monkeypatch.setattr(CL.CommitLog, "commit", racing)
    res = CL.compact_small_files(spark, t, target_bytes=1 << 30)
    assert state["fired"] and res["version"] >= 0 and res["n_rewritten"] == 3
    rows = sorted(r["id"] for r in CL.read_committed(spark, t).collect())
    assert rows == list(range(30)) + list(range(100, 110))
    # the rival's file survived the swap as its own live entry
    _, live = CL.CommitLog(t).snapshot()
    assert any("stage-" in f for f in live), "appended file still live"


def test_delete_vs_merge_same_file_one_loser_no_lost_rows(spark, tmp_path, monkeypatch):
    """delete_where racing merge_into over the SAME file: the merge
    wins, the delete sees its remove target already gone and raises
    CommitConflictError (remove-set overlap detection, not just version
    collision); the table equals the winner's outcome exactly, and the
    loser's re-plan then applies cleanly on the new snapshot."""
    import pytest as _pytest

    from lamindb_spark.catalog import commitlog as CL

    t = str(tmp_path / "tbl")
    df = spark.range(0, 10).withColumn("val", (F.col("id") * 10).cast("long"))
    CL.append_dataframe(df.coalesce(1), t)  # ONE file => guaranteed overlap
    orig = CL.CommitLog.commit
    state = {"fired": False}

    def racing(self, add=None, remove=None, metadata=None, **kw):
        if metadata and metadata.get("op") == "delete" and not state["fired"]:
            state["fired"] = True
            src = spark.createDataFrame([(3, 999)], ["id", "val"])
            CL.merge_into(spark, t, src, "id")
        return orig(self, add=add, remove=remove, metadata=metadata, **kw)

    monkeypatch.setattr(CL.CommitLog, "commit", racing)
    with _pytest.raises(CL.CommitConflictError, match="already removed"):
        CL.delete_where(spark, t, "id", lo=5)
    assert state["fired"]
    # winner's state intact: upsert applied, nothing lost or duplicated
    rows = {r["id"]: r["val"] for r in CL.read_committed(spark, t).collect()}
    assert rows == {i: (999 if i == 3 else i * 10) for i in range(10)}
    # loser re-plans on the fresh snapshot and succeeds
    res = CL.delete_where(spark, t, "id", lo=5)
    assert res["version"] >= 0
    rows2 = {r["id"]: r["val"] for r in CL.read_committed(spark, t).collect()}
    assert rows2 == {0: 0, 1: 10, 2: 20, 3: 999, 4: 40}


def test_checkpoint_snapshot_equivalence_and_expiry(spark, tmp_path):
    """Delta-style log checkpointing: write_checkpoint consolidates
    the fold; snapshot() from checkpoint+tail equals the full replay;
    expire_log() deletes subsumed commit files without changing the
    snapshot; new commits keep monotonic versions even when the
    checkpoint is the only record of the head."""
    from lamindb_spark.catalog import commitlog as CL

    t = str(tmp_path / "tbl")
    for lo in range(0, 30, 10):
        CL.append_dataframe(spark.range(lo, lo + 10).coalesce(1), t)
    CL.merge_into(spark, t, spark.range(5, 8).coalesce(1), "id")
    log = CL.CommitLog(t)
    before = log.snapshot()
    v = log.write_checkpoint()
    assert v == before[0]
    assert log.snapshot() == before  # checkpoint+empty tail == replay
    # tail after checkpoint folds on top
    CL.append_dataframe(spark.range(100, 105).coalesce(1), t)
    full_rows = sorted(r["id"] for r in CL.read_committed(spark, t).collect())
    assert full_rows == list(range(30)) + list(range(100, 105))
    # expire: subsumed commit jsons gone, snapshot identical
    n = log.expire_log()
    assert n == 4 and log.versions() == [4]
    assert sorted(r["id"] for r in CL.read_committed(spark, t).collect()) == full_rows
    # version monotonicity survives even with all commits expired
    log.write_checkpoint()
    log.expire_log()
    assert log.versions() == []
    v_new = CL.append_dataframe(spark.range(200, 201).coalesce(1), t)
    assert v_new == 5, "next version comes from the checkpoint head"
    # time travel to the checkpointed version still works
    assert len(CL.read_committed(spark, t, version=4).collect()) == 35


def test_txn_dedup_survives_log_expiry(spark, tmp_path):
    """Exactly-once txn identities ride the checkpoint: a replayed
    transaction is still skipped after its commit json was expired."""
    from lamindb_spark.catalog import commitlog as CL

    t = str(tmp_path / "tbl")
    CL.append_dataframe_txn(spark.range(0, 10).coalesce(1), t, "job", 7)
    log = CL.CommitLog(t)
    log.write_checkpoint()
    log.expire_log()
    assert log.versions() == []
    assert ("job", 7) in log.known_txns()
    assert CL.append_dataframe_txn(spark.range(0, 10).coalesce(1), t, "job", 7) is None
    assert CL.read_committed(spark, t).count() == 10


def test_cdc_read_below_expired_range_raises(spark, tmp_path):
    """read_changes must refuse a window that starts below the oldest
    retained commit instead of silently dropping expired changes."""
    import pytest as _pytest

    from lamindb_spark.catalog import commitlog as CL

    t = str(tmp_path / "tbl")
    for lo in range(0, 30, 10):
        CL.append_dataframe(spark.range(lo, lo + 10).coalesce(1), t)
    log = CL.CommitLog(t)
    log.write_checkpoint()
    log.expire_log()
    CL.append_dataframe(spark.range(100, 110).coalesce(1), t)
    with _pytest.raises(ValueError, match="expired"):
        CL.read_changes(spark, t, since_version=0)
    # window entirely within the retained tail is fine
    got = sorted(r["id"] for r in CL.read_changes(spark, t, since_version=2).collect())
    assert got == list(range(100, 110))


def test_checkpoint_model_property(tmp_path):
    """Property (hypothesis): under ANY interleaving of add/remove
    commits, checkpoints and log expiry, snapshot() equals a pure-
    python fold of the same operation sequence, and versions stay
    dense and monotonic. No Spark involved — the log is exercised
    directly (commits reference path strings; snapshot never opens
    data files)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from lamindb_spark.catalog.commitlog import CommitLog

    ops = st.lists(
        st.one_of(
            st.tuples(st.just("add"), st.integers(0, 30)),
            st.tuples(st.just("swap"), st.integers(0, 30)),  # remove one live + add
            st.tuples(st.just("checkpoint"), st.just(0)),
            st.tuples(st.just("expire"), st.just(0)),
        ),
        min_size=1,
        max_size=25,
    )

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=ops)
    def run(ops):
        import shutil
        import uuid

        t = str(tmp_path / f"tbl-{uuid.uuid4().hex[:8]}")
        log = CommitLog(t)
        model: dict[str, None] = {}
        head = -1
        n_files = 0
        for kind, arg in ops:
            if kind == "add":
                f = f"f{n_files}.parquet"
                n_files += 1
                v = log.commit(add=[f])
                model[f] = None
                assert v == head + 1, "dense monotonic versions"
                head = v
            elif kind == "swap" and model:
                gone = sorted(model)[arg % len(model)]
                f = f"f{n_files}.parquet"
                n_files += 1
                v = log.commit(add=[f], remove=[gone])
                model.pop(gone)
                model[f] = None
                assert v == head + 1
                head = v
            elif kind == "checkpoint":
                ck = log.write_checkpoint()
                assert ck == head
            elif kind == "expire":
                log.expire_log()
        got_v, got_files = log.snapshot()
        assert got_v == head
        import os

        assert {os.path.relpath(p, t) for p in got_files} == set(model)
        shutil.rmtree(t, ignore_errors=True)

    run()


def test_cdc_read_raises_when_all_commits_expired(spark, tmp_path):
    """Every commit expired into a checkpoint: a stale CDC consumer
    must get the expired-range error, never a silent empty feed."""
    import pytest as _pytest

    from lamindb_spark.catalog import commitlog as CL

    t = str(tmp_path / "tbl")
    for lo in (0, 10):
        CL.append_dataframe(spark.range(lo, lo + 10).coalesce(1), t)
    log = CL.CommitLog(t)
    log.write_checkpoint()
    log.expire_log()
    assert log.versions() == []
    with _pytest.raises(ValueError, match="expired"):
        CL.read_changes(spark, t, since_version=0)
    # a consumer already past the checkpointed head gets an empty (not
    # erroneous) feed — nothing new has been committed
    assert CL.read_changes(spark, t, since_version=1).count() == 0


def test_compact_zorder_improves_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER on a commit-log table: one optimistic swap
    commit; afterwards footer-span pruning skips files on BOTH
    clustered columns, and the rows are unchanged."""
    from lamindb_spark.catalog import commitlog as CL

    t = str(tmp_path / "tbl")
    df = spark.range(0, 4096).select(
        F.col("id"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    # ingest row-id ordered: x is scattered across every file
    for lo in range(0, 4096, 1024):
        CL.append_dataframe(
            df.filter((F.col("id") >= lo) & (F.col("id") < lo + 1024)).coalesce(1), t
        )
    before = CL.read_committed_pruned(spark, t, "x", lo=3, hi=3)
    assert len(before.inputFiles()) == 4, "pre-zorder: x spans every file"
    v = CL.compact_zorder(spark, t, ["x", "y"], n_files=8)
    assert v >= 4
    rows = CL.read_committed(spark, t)
    assert rows.count() == 4096 and len(rows.inputFiles()) == 8
    after_x = CL.read_committed_pruned(spark, t, "x", lo=3, hi=3)
    after_y = CL.read_committed_pruned(spark, t, "y", lo=3, hi=3)
    # pre-zorder the x slice touched 100% of files; the Z-curve layout
    # prunes on BOTH columns simultaneously (a single-column sort can
    # only ever prune one of them)
    assert len(after_x.inputFiles()) <= 4 < 8, "x-range skips files"
    assert len(after_y.inputFiles()) < 8, "y-range prunes too (Z-curve)"
    assert after_x.count() == 64 and after_y.count() == 64
    # values survived the swap exactly
    got = sorted(r["id"] for r in rows.collect())
    assert got == list(range(4096))
