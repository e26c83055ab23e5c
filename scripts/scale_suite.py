"""Suite-level 10x scale sweep (VERDICT r13 #1): the engine's scale
claims rested on two synthetic skew studies; this runs the ACTUAL
suite queries — the most expensive ones plus the seven fixture-weak
ones — at 1x and 10x of sf0.1, using the same replication generators
as scripts/scale_dedup.py / scale_corpus_ops.py:

  * documents 10x: distinct doc_ids, per-copy text perturbation so
    copies are near-dups (dedup structure stays realistic, families
    grow 10x);
  * embeddings 10x: per-copy vector rotation so copies decorrelate
    (no artificial exact-dup cliques);
  * events 10x: fresh event/user id ranges per copy (10x users,
    per-user volume constant — the realistic growth axis);
  * TPC-H tables symlinked from the source sf dir (the swept queries
    don't read them beyond registry-sized dims).

For each query it books best-of-2 wall time at each scale, output
row counts, the time ratio, and the count of `Exchange SinglePartition`
nodes in the EXECUTED 10x plan (scalar final aggregations legitimately
use one over partial-agg rows; anything else is attributed in
SCALE.md). Expectation: ratios ≤ ~10 (sub-linear while the per-query
fixed floor still matters, approaching linear as work dominates), and
the seven skew-safe rewrites' crossover visible as ratios well below
their window-form counterparts would give.

Usage: python scripts/scale_suite.py [sf_dir] [scratch] [mult]
[queries] → one JSON line (also mirrored per-query to stderr as it
goes). ``queries`` is an optional comma list; default WEAK+EXPENSIVE.
The 100× point runs the fixture-weak set only — `ngram_jaccard` and
friends are excluded there because near-dup replication grows their
PAIR OUTPUT quadratically in family size (100-copy families → ~5k
pairs each), which measures the generator, not the engine.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from lamindb_spark.session import get_spark, release_checkpoints
from lamindb_spark.sources.readers import load_table
from scripts.scale_dedup import _replicate
from scripts.scale_corpus_ops import emb_replicate

# the seven fixture-ratio-weak queries (VERDICT r13 performance table)
WEAK = [
    "ppl_buckets",
    "tfidf_keywords",
    "span_novelty",
    "top_docs_per_source",
    "max_dup_spans",
    "dup_representatives",
    "pagerank",
]
# the suite's most expensive remaining queries (BENCH_LOCAL steady map)
EXPENSIVE = [
    "ngram_jaccard",
    "lm_perplexity",
    "curated_packing",
    "dup_groups",
    "lsh_admission",
    "dedup_spans",
    "minhash_portable",
    "word_rank",
    "top_pc",
    "logreg_weights",
    "profile_events",
]


def _events_replicate(spark, ev1, mult: int, path: str):
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        copies = [
            ev1.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                F.col("ts"),
                (F.col("user_id") + F.lit(i * 100_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(mult)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def build_scaled_dir(spark, sf_dir: str, scratch: str, mult: int) -> str:
    """Materialize a directory shaped like an sf dir at mult x."""
    out = os.path.join(scratch, f"suite{mult}x")
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    _replicate(docs, mult, os.path.join(out, "documents.parquet"))
    emb = load_table(spark, sf_dir, "embeddings")
    # emb_replicate caches under scratch/emb_{mult}x; link it in place
    emb_path = emb_replicate(spark, emb, mult, scratch)
    link = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(scratch, f"emb_{mult}x"), link)
    ev = load_table(spark, sf_dir, "events")
    _events_replicate(spark, ev, mult, os.path.join(out, "events.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), link)
    del emb_path
    return out


def time_query(spark, fn, sf_dir: str, runs: int = 2):
    best, rows, plan = None, 0, ""
    for _ in range(runs):
        release_checkpoints(spark)
        gc.collect()
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows = len(df.toPandas())
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
        try:
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            plan = ""
    return round(best, 3), rows, plan


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    wanted = sys.argv[4].split(",") if len(sys.argv) > 4 else WEAK + EXPENSIVE
    spark = get_spark("scale-suite")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    queries = entrymod.queries()
    names = [n for n in wanted if n in queries]
    missing = [n for n in wanted if n not in queries]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    big_dir = build_scaled_dir(spark, sf_dir, scratch, mult)
    # warmup (codegen/footers) on both dirs
    queries["tpch_q1"](spark, sf_dir).collect()

    out: dict[str, dict] = {}
    for name in names:
        t1, rows1, _ = time_query(spark, queries[name], sf_dir)
        tn, rowsn, plan = time_query(spark, queries[name], big_dir)
        sp = plan.count("Exchange SinglePartition")
        out[name] = {
            "t1": t1,
            f"t{mult}": tn,
            "ratio": round(tn / t1, 2) if t1 else None,
            "rows1": rows1,
            f"rows{mult}": rowsn,
            "singlepartition_exchanges": sp,
        }
        print(
            f"# {name}: {t1:.2f}s -> {tn:.2f}s ({out[name]['ratio']}x), "
            f"rows {rows1} -> {rowsn}, 1-part exchanges {sp}",
            file=sys.stderr,
            flush=True,
        )
    total1 = round(sum(v["t1"] for v in out.values()), 2)
    totaln = round(sum(v[f"t{mult}"] for v in out.values()), 2)
    print(
        json.dumps(
            {
                "metric": "suite_scale_sweep",
                "mult": mult,
                "n_queries": len(out),
                "total_t1": total1,
                f"total_t{mult}": totaln,
                "overall_ratio": round(totaln / total1, 2),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
