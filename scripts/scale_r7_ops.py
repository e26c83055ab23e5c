"""Scale evidence for the round-7 kernels: times source_kl, word_rank
(graph build + 5 PageRank iterations), top_pc (integer covariance +
driver iterations), sq8 (train + score) and the persisted ivfpq index
(build + pruned query) at 1x/10x/120x of sf0.1 — same replicated
fixtures as scale_dedup/scale_corpus_ops/scale_r6_ops.

Expected shapes:
- source_kl: one corpus scan into the vocab-bounded (source,token)
  table; replicas barely grow the vocab, so only the scan grows.
- word_rank: the co-occurrence edge set is VOCAB-bounded — iteration
  cost stops growing once the corpus covers the vocabulary; only the
  one edge-extraction scan scales.
- top_pc: dim^2 aggregation state regardless of corpus size; the
  driver iterations are O(dim^2) and corpus-independent.
- sq8: one bounds agg + a zero-shuffle codegen score — pure scan
  shape.
- ivfpq: build is one scan+write; the query opens nprobe cells' files
  no matter how many cells exist.

Usage: python scripts/scale_r7_ops.py [sf_dir] [scratch] -> one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table
from scripts.scale_corpus_ops import emb_replicate
from scripts.scale_dedup import _replicate, best_of


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    spark = get_spark("scale-r7")
    docs1 = load_table(spark, sf, "documents")
    emb1 = load_table(spark, sf, "embeddings")

    from lamindb_spark.operators.graph import pagerank
    from lamindb_spark.pipeline.corpus import source_kl, word_cooccurrence_edges
    from lamindb_spark.pipeline.similarity import (
        ivfpq_build_index,
        ivfpq_topk,
        power_iteration_top_pc,
        pq_train,
        sq8_topk,
        sq8_train,
    )

    def _word_rank(d):
        edges = word_cooccurrence_edges(d, "text", min_len=3)
        return pagerank(edges, damping=0.85, iters=5).count()

    def _sq8(e):
        bounds = sq8_train(e)
        q = [float(x) for x in e.orderBy("vec_id").select("embedding").first()[0]]
        return len(sq8_topk(e, bounds, q, k=10).collect())

    def _ivfpq(e, tag):
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in e.orderBy("vec_id").limit(8).collect()
        ]
        q = cents[0][1]
        books = pq_train(e, dim=64, m=8, k=16, iters=2)
        path = os.path.join(scratch, f"ivfpq_{tag}")
        ivfpq_build_index(e, cents, books, path, dim=64)
        return len(ivfpq_topk(spark, path, cents, books, q, k=10, nprobe=2).collect())

    doc_kernels = {
        "source_kl": lambda d: source_kl(d).count(),
        "word_rank": _word_rank,
    }
    emb_kernels = {
        "top_pc": lambda e, m: len(power_iteration_top_pc(e, iters=3)),
        "sq8": lambda e, m: _sq8(e),
        "ivfpq": lambda e, m: _ivfpq(e, m),
    }

    out: dict = {"rows_1x": docs1.count(), "emb_rows_1x": emb1.count()}
    out["edges_1x"] = word_cooccurrence_edges(docs1, "text").count()
    for name, fn in doc_kernels.items():
        out[f"{name}_1x"] = best_of(2, lambda: fn(docs1))
    for name, fn in emb_kernels.items():
        out[f"{name}_1x"] = best_of(2, lambda: fn(emb1, 1))
    for mult in (10, 120):
        docs_m = _replicate(docs1, mult, os.path.join(scratch, f"docs_{mult}x"))
        emb_m = emb_replicate(spark, emb1, mult, scratch)
        out[f"rows_{mult}x"] = docs_m.count()
        out[f"edges_{mult}x"] = word_cooccurrence_edges(docs_m, "text").count()
        for name, fn in doc_kernels.items():
            out[f"{name}_{mult}x"] = best_of(2, lambda: fn(docs_m))
            out[f"{name}_{mult}x_scaling"] = round(
                out[f"{name}_{mult}x"] / out[f"{name}_1x"], 2
            )
        for name, fn in emb_kernels.items():
            out[f"{name}_{mult}x"] = best_of(2, lambda: fn(emb_m, mult))
            out[f"{name}_{mult}x_scaling"] = round(
                out[f"{name}_{mult}x"] / out[f"{name}_1x"], 2
            )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
