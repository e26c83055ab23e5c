"""Streaming near-dup admission gate (streaming/dedup.py): MinHash-LSH
micro-batch admission against the accumulated commit-log index —
exact/near duplicates rejected across batches AND within a batch
(greedy id order), novel docs admitted, replays exactly-once."""

import json
import os

import pytest

from lamindb_spark.catalog.commitlog import read_committed
from lamindb_spark.streaming.dedup import stream_admit_neardup

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles carry mottled baskets of ripe apricots across "
    "the shallow river delta toward the old stone lighthouse "
)


def _write_batch(src_dir, rows, name):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _drain(spark, src, tmp, query_name="nd"):
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    return stream_admit_neardup(
        stream,
        accepted_path=f"{tmp}/accepted",
        index_path=f"{tmp}/index",
        checkpoint_dir=f"{tmp}/ckpt",
        query_name=query_name,
        n_hashes=64,
        n_bands=16,
        rows_per_band=4,
    )


def test_stream_admission_across_and_within_batches(spark, tmp_path):
    tmp = str(tmp_path)
    src = f"{tmp}/src"
    # batch 1: A novel; B exact copy of A (higher id, rejected);
    # C novel (admitted)
    _write_batch(
        src,
        [
            {"doc_id": 1, "text": BASE * 3},
            {"doc_id": 2, "text": BASE * 3},
            {"doc_id": 3, "text": "completely different content about maritime "
                                  "chronometers and the longitude problem " * 5},
        ],
        "b1.json",
    )
    _drain(spark, src, tmp)
    got = {r["doc_id"] for r in read_committed(spark, f"{tmp}/accepted").collect()}
    assert got == {1, 3}

    # idempotent re-drain: nothing new in the source -> no change
    _drain(spark, src, tmp)
    assert (
        read_committed(spark, f"{tmp}/accepted").count() == 2
    ), "re-drain must not re-admit"

    # batch 2: D near-dup of A (one word changed) rejected against the
    # INDEX; E novel admitted; F/G near-identical to each other (novel
    # vs index) -> greedy keeps the lower id F, rejects G
    pair = (
        "forty silver weather balloons drifted over the terraced "
        "vineyard while the census takers argued about ledger ink " * 4
    )
    _write_batch(
        src,
        [
            {"doc_id": 10, "text": (BASE * 3).replace("lazy", "sleepy")},
            {"doc_id": 11, "text": "a short novel note on tidal harmonics and "
                                   "the resonance of enclosed basins " * 6},
            {"doc_id": 12, "text": pair},
            {"doc_id": 13, "text": pair.replace("silver", "copper")},
        ],
        "b2.json",
    )
    _drain(spark, src, tmp)
    got = {r["doc_id"] for r in read_committed(spark, f"{tmp}/accepted").collect()}
    assert got == {1, 3, 11, 12}
    # the index grew only by admitted docs' band keys (16 bands each)
    idx = read_committed(spark, f"{tmp}/index")
    assert idx.count() == 4 * 16
    assert {r["doc_id"] for r in idx.select("doc_id").distinct().collect()} == got


def test_conflict_overflow_degrades_to_distributed(spark, tmp_path):
    """VERDICT r11 #4: conflict mass above max_conflicts no longer
    raises — the distributed kernel resolves the same greedy set."""
    tmp = str(tmp_path)
    src = f"{tmp}/src"
    _write_batch(
        src,
        [{"doc_id": i, "text": BASE * 2} for i in range(1, 5)]
        + [{"doc_id": 9, "text": "entirely novel content on glacial moraines "
                                 "and the stratigraphy of eskers " * 6}],
        "b1.json",
    )
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    stream_admit_neardup(
        stream,
        accepted_path=f"{tmp}/accepted",
        index_path=f"{tmp}/index",
        checkpoint_dir=f"{tmp}/ckpt",
        max_conflicts=2,  # 4 identical docs collide > cap -> distributed
    )
    got = {r["doc_id"] for r in read_committed(spark, f"{tmp}/accepted").collect()}
    assert got == {1, 9}  # min-id of the dup cluster + the clean doc


def test_distributed_resolution_matches_sequential_greedy(spark):
    """The distributed kernel must admit EXACTLY the sequential greedy
    set on a structured conflict graph: star (min wins), chain (1st
    and 3rd win — the middle loses to an admitted doc, but its other
    bucket is NOT claimed), index-hit (rejected, claims nothing, so
    its neighbor still gets in)."""
    from lamindb_spark.streaming.dedup import _resolve_conflicts_distributed

    # (doc_id, band, bucket): star {1,2,3}@b0; chain 4-(b1)-5-(b2)-6;
    # 7 hits the index via b3 but shares b4 with 8
    rows = [
        (1, 0, 100), (2, 0, 100), (3, 0, 100),
        (4, 1, 200), (5, 1, 200), (5, 2, 300), (6, 2, 300),
        (7, 3, 400), (7, 4, 500), (8, 4, 500),
    ]
    keys = spark.createDataFrame(rows, "doc_id long, band int, bucket long")
    conflicted = keys.select("doc_id").distinct()
    hit_index = spark.createDataFrame([(7,)], "doc_id long")

    admitted = {
        r["doc_id"]
        for r in _resolve_conflicts_distributed(
            keys, conflicted, hit_index, "doc_id"
        ).collect()
    }
    # sequential greedy: 1 admits (2,3 lose); 4 admits (5 loses);
    # 6 admits (5 was rejected, b2 unclaimed); 7 index-rejected,
    # claims nothing; 8 admits (b4 unclaimed)
    assert admitted == {1, 4, 6, 8}


def test_replay_after_checkpoint_loss_skips_before_recompute(
    spark, tmp_path, monkeypatch
):
    """Review finding: if BOTH txn appends committed but the streaming
    checkpoint was lost, the replayed batch must skip via the index
    txn marker BEFORE recomputing — a recompute would see the batch's
    own index entries and mis-flag every doc as conflicted. The pin:
    _admit_batch is monkeypatched to raise (foreachBatch sinks run on
    the driver), so passing proves the replay never recomputed.
    (The old pin — max_conflicts=0 raising — died when conflict
    overflow started degrading to the distributed kernel.)"""
    import shutil

    import lamindb_spark.streaming.dedup as sd

    tmp = str(tmp_path)
    src = f"{tmp}/src"
    _write_batch(
        src,
        [{"doc_id": 1, "text": BASE * 3}, {"doc_id": 2, "text": "tidal basins " * 40}],
        "b1.json",
    )
    _drain(spark, src, tmp)
    n_acc = read_committed(spark, f"{tmp}/accepted").count()
    assert n_acc == 2
    shutil.rmtree(f"{tmp}/ckpt")  # lose the checkpoint, keep both tables

    def tripwire(*a, **k):
        raise AssertionError("replayed batch recomputed instead of skipping")

    monkeypatch.setattr(sd, "_admit_batch", tripwire)
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    stream_admit_neardup(
        stream,
        accepted_path=f"{tmp}/accepted",
        index_path=f"{tmp}/index",
        checkpoint_dir=f"{tmp}/ckpt",
        query_name="nd",
    )
    assert read_committed(spark, f"{tmp}/accepted").count() == n_acc  # no dupes
    assert read_committed(spark, f"{tmp}/index").count() == n_acc * 16
