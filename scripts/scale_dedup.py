"""Dedup-family scale evidence (VERDICT r04 #8 / r03 #8).

Generates a ~10x documents table (sf0.1 x 10 with distinct doc_ids and
mild deterministic text perturbation so dedup structure stays
realistic: the 10 copies of each document are true near-dups), then
times the four text kernels at 1x and 10x. Expectation from the
fixed-floor argument in BASELINE.md: strongly sub-linear wall-time
growth (floor-dominated at 1x), approaching linear as work dominates.
Also verifies the `_spread` 64 MB size gate actually takes the spread
branch on the 10x input (it must — that is the branch designed for
data that exceeds the gate).

Usage: python scripts/scale_dedup.py [sf_dir] [out_dir] → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table


def best_of(n, fn):
    runs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def _replicate(docs, mult: int, out_dir: str):
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        copies = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)).withColumn(
                "text",
                # perturb: append a copy-specific token so copies are
                # near-dups (high Jaccard), not byte-identical
                F.concat(F.col("text"), F.lit(f" replica{i}")),
            )
            for i in range(mult)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(out_dir)
    return docs.sparkSession.read.parquet(out_dir)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    spark = get_spark("scale-dedup")
    docs1 = load_table(spark, sf, "documents")

    from lamindb_spark.pipeline.dedup import (
        _plan_size_bytes,
        _SPREAD_MIN_BYTES,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash_signatures,
        winnow_fingerprint,
    )

    out = {
        "rows_1x": docs1.count(),
        "plan_bytes_1x": _plan_size_bytes(docs1),
        "spread_gate_bytes": _SPREAD_MIN_BYTES,
    }
    kernels = {
        "minhash": lambda d: minhash_signatures(d).count(),
        "simhash": lambda d: simhash_signatures(d).count(),
        "fingerprint": lambda d: winnow_fingerprint(d).count(),
        "ngram_jaccard": lambda d: ngram_jaccard_pairs(d, threshold=0.2).count(),
    }
    for name, fn in kernels.items():
        out[f"{name}_1x"] = best_of(2, lambda: fn(docs1))

    # 10x: floor-dominated regime (still under the spread gate);
    # 120x: crosses the 64 MB gate — proves the spread branch engages
    # on data actually exceeding it. ngram is skipped at 120x: with
    # every doc in a 120-replica near-dup cluster the designed
    # max_doc_freq stop-shingle cap removes most buckets, which tests
    # the cap, not the join — pair growth is covered by the 10x run.
    for mult in (10, 120):
        docs_m = _replicate(docs1, mult, os.path.join(scratch, f"docs_{mult}x"))
        out[f"rows_{mult}x"] = docs_m.count()
        out[f"plan_bytes_{mult}x"] = _plan_size_bytes(docs_m)
        out[f"spread_branch_{mult}x"] = (
            out[f"plan_bytes_{mult}x"] >= _SPREAD_MIN_BYTES
        )
        for name, fn in kernels.items():
            if name == "ngram_jaccard" and mult > 10:
                continue
            out[f"{name}_{mult}x"] = best_of(2, lambda: fn(docs_m))
            out[f"{name}_{mult}x_scaling"] = round(
                out[f"{name}_{mult}x"] / out[f"{name}_1x"], 2
            )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
