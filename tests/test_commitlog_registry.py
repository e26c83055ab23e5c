"""Registries on the commit log (VERDICT r11 #2): the Lakehouse
registry tier running on catalog/commitlog.py + logstore.py —
txn-committed appends/rewrites/compaction, conditional-put id ledger
(catalog/idalloc.py) instead of the single-writer counters sidecar,
interleaved writers without lost rows or duplicate ids, and the whole
metadata protocol exercised against the fake-boto3 S3 contract."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_s3_logstore import FakeS3Client  # noqa: E402

from lamindb_spark.catalog.idalloc import LogIdAllocator  # noqa: E402
from lamindb_spark.catalog.lakehouse import Lakehouse  # noqa: E402
from lamindb_spark.catalog.logstore import (  # noqa: E402
    InMemoryLogStore,
    PosixLogStore,
    S3LogStore,
)


@pytest.fixture()
def cl_lakehouse(spark, tmp_path):
    return Lakehouse(
        spark, str(tmp_path / "lake"), registry_log_store=PosixLogStore()
    )


def test_end_to_end_on_commitlog_tier(cl_lakehouse, tmp_path):
    lh = cl_lakehouse
    # bootstrap rows landed through commit-log appends
    assert {r["name"] for r in lh.read_raw("branch").collect()} == {
        "main", "archive", "trash",
    }
    # no sidecar, no bucketed layout — the commit log IS the registry
    assert not os.path.exists(f"{lh.root}/registries/_counters.json")
    assert os.path.isdir(f"{lh.root}/registries/branch/_commits")
    assert not any(
        d.startswith("__bucket=")
        for d in os.listdir(f"{lh.root}/registries/branch")
    )

    # bulk save: inserts get fresh ids from the ledger
    rows = lh.save("ulabel", [{"name": "a"}, {"name": "b"}])
    ids = [r["id"] for r in rows]
    assert len(set(ids)) == 2
    # upsert by uid rides the optimistic MERGE commit
    upd = lh.save("ulabel", [{"uid": rows[0]["uid"], "name": "a2"}])
    assert upd[0]["id"] == rows[0]["id"]
    got = {r["name"] for r in lh.read_raw("ulabel").collect()}
    assert got == {"a2", "b"}

    # artifact ingest + versioning (family bump rewrites via MERGE)
    src = tmp_path / "f.csv"
    src.write_text("x\n1\n")
    a1 = lh.register_artifact(str(src), key="d/f.csv")
    src.write_text("x\n2\n")
    a2 = lh.register_artifact(str(src), key="d/f.csv")
    assert a2["uid"][:16] == a1["uid"][:16] and a2["uid"] != a1["uid"]
    heads = (
        lh.read_raw("artifact")
        .filter(F.col("key") == "d/f.csv")
        .filter(F.col("is_latest"))
        .collect()
    )
    assert [h["id"] for h in heads] == [a2["id"]]

    # soft delete -> trash branch via the rewrite path
    lh.delete("ulabel", [rows[1]["id"]])
    visible = {r["name"] for r in lh.read("ulabel").collect()}
    assert visible == {"a2"}


def test_interleaved_writers_no_lost_rows_no_dup_ids(spark, tmp_path):
    """Two live Lakehouse instances on the SAME root, interleaving
    saves: every row lands, no id is ever reused — the coordination
    is entirely commit objects + the id ledger (single-writer
    discipline lifted)."""
    root = str(tmp_path / "lake")
    w1 = Lakehouse(spark, root, registry_log_store=PosixLogStore())
    w2 = Lakehouse(spark, root, registry_log_store=PosixLogStore())
    expect = set()
    for i in range(4):
        w = w1 if i % 2 == 0 else w2
        saved = w.save("ulabel", [{"name": f"l{i}a"}, {"name": f"l{i}b"}])
        expect |= {f"l{i}a", f"l{i}b"}
        assert all(r["id"] is not None for r in saved)
    rows = w1.read_raw("ulabel").collect()
    assert {r["name"] for r in rows} == expect  # no lost rows
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids)) == 8  # no duplicate ids


def test_registry_protocol_runs_on_fake_s3_contract(spark, tmp_path):
    """The full metadata protocol — table commits, id ledger — against
    the boto3 S3 API shapes (conditional put, paginated list): the
    exact coordination a schemed deployment uses, with data files on
    the Spark-writable root."""
    client = FakeS3Client()
    store = S3LogStore("bkt", prefix="warehouse", client=client)
    lh = Lakehouse(spark, str(tmp_path / "lake"), registry_log_store=store)
    rows = lh.save("ulabel", [{"name": "s3-a"}, {"name": "s3-b"}])
    assert {r["name"] for r in lh.read_raw("ulabel").collect()} == {"s3-a", "s3-b"}
    # commit objects and ledger reservations live in the (fake) bucket
    assert any("/_commits/" in k for k in client.objects)
    assert any("/_ids/ulabel/" in k for k in client.objects)
    assert client.conditional_puts > 0  # every commit/reservation is one
    # second instance on the same bucket sees the same state and
    # allocates ABOVE the ledger
    lh2 = Lakehouse(spark, str(tmp_path / "lake"), registry_log_store=store)
    more = lh2.save("ulabel", [{"name": "s3-c"}])
    assert more[0]["id"] > max(r["id"] for r in rows)


def test_schemed_root_requires_log_store(spark):
    with pytest.raises(ValueError, match="registry_log_store"):
        Lakehouse(spark, "s3a://bucket/lake")


def test_id_allocator_ranges_never_overlap():
    store = InMemoryLogStore()
    a = LogIdAllocator("/lake/_ids", store)
    b = LogIdAllocator("/lake/_ids", store)
    taken = []
    for i in range(6):
        alloc = a if i % 2 == 0 else b
        start = alloc.take("artifact", 3)
        taken.append((start, start + 2))
    flat = [i for s, e in taken for i in range(s, e + 1)]
    assert len(flat) == len(set(flat)) == 18
    assert min(flat) == 1  # dense from 1 when uncontended


def test_id_allocator_lost_race_retries_above_winner():
    class SneakyStore(InMemoryLogStore):
        """Injects a competitor's reservation between a taker's tail
        read and its conditional put — the classic race."""

        def __init__(self):
            super().__init__()
            self.sneak = True

        def put_json_if_absent(self, path, body):
            if self.sneak and path.endswith("1.json"):
                self.sneak = False
                super().put_json_if_absent(path, {"n": 5})  # rival wins 1..5
            return super().put_json_if_absent(path, body)

    alloc = LogIdAllocator("/lake/_ids", SneakyStore())
    start = alloc.take("run", 3)
    assert start == 6  # retried above the rival's range, no overlap


def test_id_allocator_note_advances_past_explicit_ids():
    store = InMemoryLogStore()
    alloc = LogIdAllocator("/lake/_ids", store)
    alloc.note("branch", 1)  # bootstrap rows with fixed ids
    assert alloc.take("branch", 1) == 2
    alloc.note("branch", 100)  # cross-instance transfer
    assert alloc.take("branch", 2) == 101
    alloc.note("branch", 50)  # behind the ledger: no-op
    assert alloc.take("branch", 1) == 103


def test_lineage_and_annotation_flows_on_commitlog_tier(cl_lakehouse, spark, tmp_path):
    """Higher-level engine flows ride the tier unchanged: tracked
    runs (run/transform registries), run-input capture, annotation
    EAV rows, describe, and set-based delete/update rewrites."""
    import json

    from lamindb_spark.lineage import flow, step, track

    lh = cl_lakehouse
    ctx = track(lh, "pipe/clean.py", source_code="print('x')")
    df = spark.range(3).withColumn("v", F.col("id") * 2)
    art = lh.save_dataframe(df, key="out/clean.parquet")
    ctx.finish()
    run = lh.read_raw("run").first()
    assert art["run_id"] == run["id"] and run["status_code"] == 0

    # nested flow/step on the tier
    seen = {}

    @step(lh)
    def s():
        seen["step"] = lh.current_run_id

    @flow(lh)
    def wf():
        seen["flow"] = lh.current_run_id
        s()

    wf()
    runs = {r["id"]: r.asDict() for r in lh.read_raw("run").collect()}
    assert runs[seen["step"]]["initiated_by_run_id"] == seen["flow"]

    # annotation + describe
    lh.annotate("artifact", art["id"], {"stage": "clean"})
    doc = json.loads(lh.describe_artifact("out/clean.parquet"))
    assert doc["features"]["stage"] == "clean"

    # set-based update/delete rewrites (optimistic overwrite commits)
    lh.save("ulabel", [{"name": "keep"}, {"name": "drop"}])
    matched = lh.read_raw("ulabel").filter(F.col("name") == "drop")
    lh.delete_where("ulabel", matched, permanent=True)
    assert {r["name"] for r in lh.read_raw("ulabel").collect()} == {"keep"}


def test_register_dir_and_compaction_on_commitlog_tier(cl_lakehouse, tmp_path):
    """Bulk ingest appends once; pushing past the compaction
    threshold swaps the table to one file via a single optimistic
    commit, and the rows survive bit-identical."""
    lh = cl_lakehouse
    d = tmp_path / "many"
    d.mkdir()
    for i in range(5):
        (d / f"f{i}.txt").write_text(f"payload {i}")
    rows = lh.register_dir(str(d), key="bulk")
    assert len(rows) == 5
    before = {(r["key"], r["hash"]) for r in lh.read_raw("artifact").collect()}

    # force a compaction: many tiny appends, then check live-file count
    for i in range(8):
        lh.save("ulabel", [{"name": f"x{i}"}])
    lh._maybe_compact("ulabel", max_files=4)
    assert len(lh._cl_files("ulabel")) == 1
    assert lh.read_raw("ulabel").count() == 8
    # artifact registry untouched by ulabel compaction
    after = {(r["key"], r["hash"]) for r in lh.read_raw("artifact").collect()}
    assert after == before


def test_registry_time_travel_and_history(cl_lakehouse):
    """Time travel + DESCRIBE HISTORY fall out of the log for free:
    a registry read at an earlier version returns exactly the rows
    committed by then; history lists every commit newest-first."""
    lh = cl_lakehouse
    lh.save("ulabel", [{"name": "v1"}])
    v_after_first = lh.registry_history("ulabel")[0]["version"]
    lh.save("ulabel", [{"name": "v2"}])
    now = {r["name"] for r in lh.read_raw("ulabel").collect()}
    assert now == {"v1", "v2"}
    then = {
        r["name"]
        for r in lh.read_raw("ulabel", version=v_after_first).collect()
    }
    assert then == {"v1"}
    hist = lh.registry_history("ulabel")
    assert [h["version"] for h in hist] == sorted(
        (h["version"] for h in hist), reverse=True
    )
    assert all(h["op"] in ("append", "overwrite") for h in hist)


def test_time_travel_rejected_on_bucketed_tier(lakehouse):
    with pytest.raises(ValueError, match="commit-log tier"):
        lakehouse.read_raw("branch", version=0)
    with pytest.raises(ValueError, match="commit-log tier"):
        lakehouse.registry_history("branch")
