"""ANN recall@k study (VERDICT r7 #4 / r8 next-round #5): measure
recall@10 of every approximate tier against the EXACT top-10 under the
tier's own metric — cosine for IVF (its scoring is exact cosine over
probed cells), L2 for the quantized tiers (PQ/IVF-PQ/residual/SQ8
rank by an L2 surrogate, so exact L2 kNN is their ground truth, as in
Jégou et al. 2011's evaluation protocol).

Prints one JSON object {tier: {nprobe_or_-: mean_recall}} and a
markdown table for SCALE.md.

Usage: python scripts/ann_recall.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table

NPROBES = (1, 2, 4, 8)
K = 10
N_CELLS = 8


def _ids(df) -> list[int]:
    return [int(r[0]) for r in df.collect()]


def recall_at_k(approx: list[int], exact: list[int]) -> float:
    return len(set(approx) & set(exact)) / len(exact)


def measure(spark, sf_dir: str, n_queries: int = 20) -> dict:
    from lamindb_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_build_index,
        ivf_topk,
        ivfpq_build_index,
        ivfpq_residual_build_index,
        ivfpq_residual_topk,
        ivfpq_topk,
        kmeans_fit,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
        refine_topk,
        sq8_topk,
        sq8_train,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + n_queries)
        ).collect()
    ]
    assert queries, "no query vectors in range"
    cents = kmeans_fit(emb, k=N_CELLS, iters=2)
    tmp = tempfile.mkdtemp(prefix="ann_recall_")
    out: dict[str, dict] = {}
    try:
        exact_cos = {q: _ids(brute_force_topk(emb, v, K)) for q, v in queries}
        exact_l2 = {
            q: _ids(brute_force_topk(emb, v, K, metric="l2")) for q, v in queries
        }

        def sweep(name, fn, exact, nprobes=NPROBES):
            out[name] = {}
            for np_ in nprobes:
                rs = [recall_at_k(_ids(fn(v, np_)), exact[q]) for q, v in queries]
                out[name][str(np_)] = round(sum(rs) / len(rs), 3)

        ivf_path = os.path.join(tmp, "ivf")
        ivf_build_index(emb, cents, ivf_path)
        sweep(
            "ivf",
            lambda v, np_: ivf_topk(spark, ivf_path, cents, v, K, nprobe=np_),
            exact_cos,
        )

        books = pq_train(emb, dim=64, m=8, k=16, iters=2)
        enc = pq_encode(emb, books, dim=64).localCheckpoint(eager=True)
        rs = [
            recall_at_k(
                _ids(pq_adc_topk(enc, pq_distance_table(books, v), K)), exact_l2[q]
            )
            for q, v in queries
        ]
        out["pq_flat"] = {"-": round(sum(rs) / len(rs), 3)}

        ivfpq_path = os.path.join(tmp, "ivfpq")
        ivfpq_build_index(emb, cents, books, ivfpq_path, dim=64)
        sweep(
            "ivfpq",
            lambda v, np_: ivfpq_topk(
                spark, ivfpq_path, cents, books, v, K, nprobe=np_
            ),
            exact_l2,
        )

        res_path = os.path.join(tmp, "ivfpq_res")
        rbooks = ivfpq_residual_build_index(
            emb, cents, res_path, dim=64, m=8, k=16, iters=2
        )
        sweep(
            "ivfpq_residual",
            lambda v, np_: ivfpq_residual_topk(
                spark, res_path, cents, rbooks, v, K, nprobe=np_
            ),
            exact_l2,
        )

        bounds = sq8_train(emb)
        rs = [
            recall_at_k(_ids(sq8_topk(emb, bounds, v, K)), exact_l2[q])
            for q, v in queries
        ]
        out["sq8"] = {"-": round(sum(rs) / len(rs), 3)}

        # the two-stage read path: PQ ADC top-c candidates -> exact
        # integer-quantized L2 re-rank; recall(refined top-k) equals
        # the first pass's recall@c — on this worst-case structureless
        # corpus that is 0.55 at c=100 rising to 0.855 at c=400 (the
        # fetch-budget curve in SCALE.md)
        for c in (50, 100):
            rs = [
                recall_at_k(
                    _ids(
                        refine_topk(
                            pq_adc_topk(enc, pq_distance_table(books, v), c),
                            emb,
                            v,
                            K,
                        )
                    ),
                    exact_l2[q],
                )
                for q, v in queries
            ]
            out[f"pq_refine_c{c}"] = {"-": round(sum(rs) / len(rs), 3)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("ann-recall")
    out = measure(spark, sf_dir, n_queries)
    print(json.dumps({"sf_dir": sf_dir, "k": K, "n_queries": n_queries, "recall": out}))
    # markdown for SCALE.md
    print("\n| tier | nprobe=1 | 2 | 4 | 8 |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for tier, vals in out.items():
        if "-" in vals:
            print(f"| {tier} | {vals['-']} (no probe param) ||||", file=sys.stderr)
        else:
            cells = " | ".join(str(vals[str(n)]) for n in NPROBES)
            print(f"| {tier} | {cells} |", file=sys.stderr)


if __name__ == "__main__":
    main()
