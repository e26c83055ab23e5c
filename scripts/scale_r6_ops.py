"""Scale evidence for the round-6 kernels (VERDICT r6 #4): times
knn_join (train+assign+cell-blocked GEMM), ann_pq (fused PQ training +
encode + integer ADC), dsir_weights, max_dup_spans and tfidf_keywords
at 1x/10x/120x of sf0.1, with the same output-growth honesty as the r5
tables (scale_corpus_ops.py / scale_dedup.py — same replicated
fixtures).

Expected shapes:
- knn_join emits n*k rows by construction; cell size is held bounded
  by scaling the trainer's k with the corpus (the blocking contract),
  so pair work grows ~linearly in n, never n^2.
- ann_pq's trainer is a fixed number of jobs regardless of corpus size
  (ONE assignment pass + ONE posexplode agg per Lloyd round for all 8
  subspaces); encode + ADC are zero-shuffle map passes, so the whole
  pipeline should scale ~linearly with scan bytes.
- dsir_weights fits a 256-bucket model in one bounded agg and scores
  map-side — model size is constant at any corpus size.
- max_dup_spans does 2 narrow shuffles (k-gram repeat marking and the
  gaps-and-islands window); replicas are near-dups, so covered spans
  GROW with the multiplier — output growth is reported alongside.
- tfidf_keywords is ONE corpus scan (tf agg + token-window df +
  per-doc top-k).

Usage: python scripts/scale_r6_ops.py [sf_dir] [scratch] -> one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table
from scripts.scale_dedup import _replicate, best_of


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    spark = get_spark("scale-r6")
    docs1 = load_table(spark, sf, "documents")
    emb1 = load_table(spark, sf, "embeddings")

    from lamindb_spark.pipeline.corpus import duplicated_spans, tfidf_keywords
    from lamindb_spark.pipeline.dsir import dsir_weights
    from lamindb_spark.pipeline.similarity import (
        kmeans_fit,
        knn_join_exact,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
    )

    from lamindb_spark.pipeline.similarity import kmeans_assign

    def _knn_join(e, k_cells):
        # cell count scales with the corpus so cell SIZE (the GEMM
        # block, the quadratic term) stays bounded — same contract as
        # semantic_dedup's scale table. Past 64 cells kmeans_assign
        # auto-switches to the broadcast-packed path (plan size O(1)).
        cents = kmeans_fit(e, k=k_cells, iters=2)
        assigned = e.select(
            "vec_id", "embedding"
        ).join(kmeans_assign(e, cents), "vec_id")
        return knn_join_exact(assigned, "cell", k=3).count()

    def _ann_pq(e, _m):
        books = pq_train(e, dim=64, m=8, k=16, iters=2)
        qvec = [
            float(x)
            for x in e.orderBy("vec_id").select("embedding").first()[0]
        ]
        enc = pq_encode(e, books, dim=64)
        return len(pq_adc_topk(enc, pq_distance_table(books, qvec), k=10).collect())

    doc_kernels = {
        "dsir_weights": lambda d: dsir_weights(
            d, F.col("source").isin("src0", "src1", "src2"), n_buckets=256
        ).count(),
        "max_dup_spans": lambda d: duplicated_spans(d, k=5, min_tokens=8).count(),
        "tfidf_keywords": lambda d: tfidf_keywords(d, top_k=3).count(),
    }

    from scripts.scale_corpus_ops import emb_replicate

    out: dict = {"rows_1x": docs1.count(), "emb_rows_1x": emb1.count()}
    for name, fn in doc_kernels.items():
        out[f"{name}_1x_rows"] = fn(docs1)
        out[f"{name}_1x"] = best_of(2, lambda: fn(docs1))
    out["knn_join_1x"] = best_of(2, lambda: _knn_join(emb1, 8))
    out["ann_pq_1x"] = best_of(2, lambda: _ann_pq(emb1, 1))

    for mult in (10, 120):
        docs_m = _replicate(docs1, mult, os.path.join(scratch, f"docs_{mult}x"))
        out[f"rows_{mult}x"] = docs_m.count()
        for name, fn in doc_kernels.items():
            out[f"{name}_{mult}x_rows"] = fn(docs_m)
            out[f"{name}_{mult}x"] = best_of(2, lambda: fn(docs_m))
            out[f"{name}_{mult}x_scaling"] = round(
                out[f"{name}_{mult}x"] / out[f"{name}_1x"], 2
            )
        emb_m = emb_replicate(spark, emb1, mult, scratch)
        out[f"emb_rows_{mult}x"] = emb_m.count()
        out[f"knn_join_{mult}x"] = best_of(
            2, lambda: _knn_join(emb_m, max(8, min(mult, 96)))
        )
        out[f"knn_join_{mult}x_scaling"] = round(
            out[f"knn_join_{mult}x"] / out["knn_join_1x"], 2
        )
        out[f"ann_pq_{mult}x"] = best_of(2, lambda: _ann_pq(emb_m, mult))
        out[f"ann_pq_{mult}x_scaling"] = round(
            out[f"ann_pq_{mult}x"] / out["ann_pq_1x"], 2
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
