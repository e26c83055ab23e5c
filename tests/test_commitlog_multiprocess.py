"""Cross-PROCESS races on the commit log and id allocator (r15).

The existing concurrency tests race N threads; the protocol's claim
is stronger — nothing depends on shared Python state, only on the
LogStore's atomic put-if-absent (``os.link`` locally, conditional PUT
on object stores). These tests race real OS processes (spawn context:
no inherited interpreter state, each child builds its own CommitLog /
LogIdAllocator from the path alone) — the multi-writer deployment
story (several Spark drivers sharing one registry root) in miniature.
Pure file-protocol tests: no SparkSession in the children.
"""

import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, "/root/repo")

N_WRITERS = 6
COMMITS_EACH = 12
ID_ROUNDS = 15


def _commit_worker(args):
    table_path, wid = args
    from lamindb_spark.catalog.commitlog import CommitLog

    log = CommitLog(table_path)
    won = []
    for i in range(COMMITS_EACH):
        fname = f"data/w{wid}-{i}.parquet"
        # the protocol tracks file NAMES; content is irrelevant here
        v = log.commit(add=[fname])
        won.append((v, fname))
    return won


def _id_worker(args):
    root, wid = args
    from lamindb_spark.catalog.idalloc import LogIdAllocator
    from lamindb_spark.catalog.logstore import PosixLogStore

    alloc = LogIdAllocator(root, PosixLogStore())
    ranges = []
    for i in range(ID_ROUNDS):
        n = 1 + (wid + i) % 9  # varied batch sizes race harder
        start = alloc.take("ulabel", n)
        ranges.append((start, n))
    return ranges


def test_commit_race_cross_process(tmp_path):
    table = str(tmp_path / "table")
    os.makedirs(table, exist_ok=True)
    ctx = mp.get_context("spawn")
    with ctx.Pool(N_WRITERS) as pool:
        results = pool.map(_commit_worker, [(table, w) for w in range(N_WRITERS)])

    from lamindb_spark.catalog.commitlog import CommitLog

    log = CommitLog(table)
    all_commits = [c for worker in results for c in worker]
    versions = [v for v, _f in all_commits]
    # every commit won a DISTINCT version, and the log is gapless
    # (versions are 0-based: the empty log's head is -1)
    assert len(set(versions)) == len(versions) == N_WRITERS * COMMITS_EACH
    assert sorted(versions) == list(range(N_WRITERS * COMMITS_EACH))
    # no write lost: the final snapshot lives exactly the added files
    head, live = log.snapshot()
    live_rel = {os.path.relpath(p, table) for p in live}
    assert live_rel == {f for _v, f in all_commits}
    assert head == N_WRITERS * COMMITS_EACH - 1
    # each version's body records the file its winner added
    for v, f in all_commits:
        body = json.load(open(os.path.join(table, "_commits", f"{v:020d}.json")))
        assert body["add"] == [f]


def test_id_allocator_race_cross_process(tmp_path):
    root = str(tmp_path / "ids")
    ctx = mp.get_context("spawn")
    with ctx.Pool(N_WRITERS) as pool:
        results = pool.map(_id_worker, [(root, w) for w in range(N_WRITERS)])

    spans = [(s, s + n - 1) for worker in results for s, n in worker]
    spans.sort()
    # ranges never overlap, regardless of interleaving
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2, f"overlapping id ranges: ({s1},{e1}) vs ({s2},{e2})"
    # ids start above the floor and every reservation is non-empty
    assert spans[0][0] >= 1
