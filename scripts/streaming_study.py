"""Streaming admission throughput/latency study (VERDICT r13 stretch):
gives `stream_admit_neardup` the same measured-evidence treatment the
batch operators got — micro-batch size vs per-batch admission latency
and docs/sec, with the corpus index GROWING across batches (each point
drains against the index accumulated so far, the steady-state regime).

Method: the sf0.1 documents table (perturbed per copy like
scale_dedup so batches contain genuine near-dups of earlier batches)
is split into B jsonl micro-batch files; one availableNow drain with
maxFilesPerTrigger=1 processes them as B sequential micro-batches.
Per batch we book wall seconds (from a foreachBatch-wrapping timer),
docs offered/admitted, and the index size the batch probed against.
Three batch sizes cover the knee: small batches pay the per-batch
fixed cost (index probe + 2 commit-log txns) repeatedly; large
batches amortize it but raise in-batch conflict work.

Usage: python scripts/streaming_study.py [sf_dir] [scratch] → one
JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lamindb_spark.catalog.commitlog import CommitLog, read_committed
from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table


def _write_batches(docs_pdf, n_per_batch: int, src: str) -> int:
    os.makedirs(src, exist_ok=True)
    rows = docs_pdf.to_dict("records")
    n_batches = 0
    for i in range(0, len(rows), n_per_batch):
        with open(os.path.join(src, f"b{i // n_per_batch:05d}.jsonl"), "w") as fh:
            for r in rows[i : i + n_per_batch]:
                fh.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        n_batches += 1
    return n_batches


def run_point(spark, docs_pdf, n_per_batch: int, root: str) -> dict:
    """One study point: drain all docs in n_per_batch-sized batches."""
    from lamindb_spark.streaming import dedup as sd

    base = os.path.join(root, f"bs{n_per_batch}")
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    n_batches = _write_batches(docs_pdf, n_per_batch, src)

    # wrap _admit_batch with a timer — measures the admission kernel
    # itself (the commit-log appends are timed by the outer delta)
    batch_secs: list[float] = []
    index_rows_at_probe: list[int] = []
    orig = sd._admit_batch

    def timed(spark_, batch_df, index_path, *a, **kw):
        try:
            index_rows_at_probe.append(
                read_committed(spark_, index_path).count()
            )
        except FileNotFoundError:
            index_rows_at_probe.append(0)
        t0 = time.time()
        out = orig(spark_, batch_df, index_path, *a, **kw)
        batch_secs.append(time.time() - t0)
        return out

    sd._admit_batch = timed
    t0 = time.time()
    try:
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).json(src)
        sd.stream_admit_neardup(
            stream,
            accepted_path=f"{base}/accepted",
            index_path=f"{base}/index",
            checkpoint_dir=f"{base}/ckpt",
            query_name=f"study{n_per_batch}",
            timeout_sec=1200,
        )
    finally:
        sd._admit_batch = orig
    wall = time.time() - t0
    admitted = read_committed(spark, f"{base}/accepted").count()
    index_rows = read_committed(spark, f"{base}/index").count()
    n_txn = len(CommitLog(f"{base}/accepted").versions())
    return {
        "batch_size": n_per_batch,
        "n_batches": n_batches,
        "docs_offered": len(docs_pdf),
        "docs_admitted": admitted,
        "index_rows_final": index_rows,
        "accepted_txns": n_txn,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(len(docs_pdf) / wall, 1),
        "admit_sec_first_batch": round(batch_secs[0], 3) if batch_secs else None,
        "admit_sec_last_batch": round(batch_secs[-1], 3) if batch_secs else None,
        "admit_sec_mean": round(sum(batch_secs) / len(batch_secs), 3)
        if batch_secs
        else None,
        "index_rows_last_probe": index_rows_at_probe[-1]
        if index_rows_at_probe
        else 0,
    }


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    spark = get_spark("streaming-study")
    root = os.path.join(scratch, "stream_study")
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    # 2x the table with per-copy perturbation: the second half are
    # near-dups of the first, so late batches genuinely collide with
    # the accumulated index (scale_dedup's replication, inline)
    two = docs.unionByName(
        docs.select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" replica1")).alias("text"),
        )
    )
    pdf = two.orderBy("doc_id").toPandas()  # 10k docs at sf0.1 — driver-fine
    # batch sizes: argv[3] comma list (r15: lets the 10x-corpus run pick
    # sizes that measure index growth without a 600-batch slog)
    sizes = (
        tuple(int(x) for x in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (500, 2000, 10000)
    )
    points = [run_point(spark, pdf, bs, root) for bs in sizes]
    print(json.dumps({"metric": "stream_admission_study", "points": points}))


if __name__ == "__main__":
    main()
