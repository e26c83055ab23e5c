"""Scale evidence for the r5 corpus operators (sibling of
scale_dedup.py, same replicated tables): times dedup_token_spans,
bm25_rank, vocab_coverage and bpe_train at 1x/10x/120x of sf0.1.

The headline property measured here: replicating the corpus 120x
leaves the DISTINCT-WORD table essentially unchanged, so BPE's merge
rounds — the iterative part — cost the same at any corpus size; only
the single tokenize+count pass grows. That is the word-frequency
formulation's entire point, shown live.

Usage: python scripts/scale_corpus_ops.py [sf_dir] [scratch] → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lamindb_spark.session import get_spark
from lamindb_spark.sources.readers import load_table
from scripts.scale_dedup import _replicate, best_of


def emb_replicate(spark, emb1, mult: int, scratch: str):
    """Embedding replication shared by the scale scripts: copy i's
    vector is rotated by i positions so copies decorrelate (cosine
    between different rotations of a random-ish vector ~ 0) instead of
    forming mult-cliques of exact dups; with 64 dims, rotations repeat
    every 64 copies, so at 120x each vector has ~1 exact twin — output
    growth stays linear, honestly bounded."""
    from pyspark.sql import functions as F

    path = os.path.join(scratch, f"emb_{mult}x")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        copies = [
            emb1.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                F.expr(
                    f"transform(sequence(0, 63), j -> embedding[(j + {i}) % 64])"
                ).alias("embedding"),
            )
            for i in range(mult)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch"
    spark = get_spark("scale-corpus")
    docs1 = load_table(spark, sf, "documents")

    from pyspark.sql import functions as F

    from lamindb_spark.pipeline.bpe import _word_table, bpe_train
    from lamindb_spark.pipeline.classifier import featurize, train_logreg
    from lamindb_spark.pipeline.corpus import (
        bigram_lm_scores,
        bm25_rank,
        dedup_token_spans,
        vocab_coverage,
    )

    def _logreg(d):
        toks = F.filter(
            F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+"),
            lambda x: x != "",
        )
        feats = featurize(d, F.array_contains(toks, "spark"), n_buckets=128)
        return len(train_logreg(feats, n_buckets=128, iters=5)[0])

    from lamindb_spark.operators.graph import pagerank
    from lamindb_spark.pipeline.rules import pack_sequences
    from lamindb_spark.pipeline.similarity import kmeans_fit, semantic_dedup

    def _pack(d):
        toks = d.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("n_tokens"),
        )
        return pack_sequences(toks, "n_tokens", "doc_id", budget=2048).count()

    kernels = {
        "dedup_spans": lambda d: dedup_token_spans(d).count(),
        "bm25": lambda d: bm25_rank(d, ["spark", "shuffle", "merge"]).count(),
        "oov_rate": lambda d: vocab_coverage(d).count(),
        "bpe_8merges": lambda d: len(bpe_train(d, n_merges=8)),
        "lm_perplexity": lambda d: bigram_lm_scores(d).count(),
        "logreg_5iters": _logreg,
        "pack_sequences": _pack,
    }
    out = {"rows_1x": docs1.count(), "vocab_1x": _word_table(docs1, "text").count()}
    for name, fn in kernels.items():
        out[f"{name}_1x"] = best_of(2, lambda: fn(docs1))
    for mult in (10, 120):
        docs_m = _replicate(docs1, mult, os.path.join(scratch, f"docs_{mult}x"))
        out[f"rows_{mult}x"] = docs_m.count()
        out[f"vocab_{mult}x"] = _word_table(docs_m, "text").count()
        for name, fn in kernels.items():
            out[f"{name}_{mult}x"] = best_of(2, lambda: fn(docs_m))
            out[f"{name}_{mult}x_scaling"] = round(
                out[f"{name}_{mult}x"] / out[f"{name}_1x"], 2
            )

    # -- embedding kernels: k-means trainer and SemDeDup ----------------
    # Replication rotates each copy's vector by i positions so copies
    # decorrelate (cosine between different rotations of a random-ish
    # vector ~ 0) instead of forming 120-cliques of exact dups; with 64
    # dims, rotations repeat every 64 copies, so at 120x each vector has
    # ~1 exact twin — output growth stays linear, honestly bounded.
    emb1 = load_table(spark, sf, "embeddings")

    def _emb_replicate(mult: int):
        return emb_replicate(spark, emb1, mult, scratch)

    # SemDeDup's scale contract: cell count grows with the corpus so
    # cell SIZE (the quadratic term) stays bounded — k scales with mult.
    # The literal-centroid argmin plan is the right kernel to a few
    # hundred cells; past that the IVF file layout
    # (similarity.ivf_build_index) is the documented scale path, so the
    # 120x semantic_dedup run measures k=96 (5x cell size) rather than
    # pretending k=8 at 600k vectors is the production shape.
    emb_kernels = {
        "kmeans_2iters": lambda e, m: kmeans_fit(e, k=8, iters=2) and 8,
        "semantic_dedup": lambda e, m: semantic_dedup(
            e, k=max(8, m), iters=2, threshold=0.35
        ).count(),
    }
    for name, fn in emb_kernels.items():
        out[f"{name}_emb_1x"] = best_of(2, lambda: fn(emb1, 1))
    for mult in (10, 120):
        emb_m = _emb_replicate(mult)
        out[f"emb_rows_{mult}x"] = emb_m.count()
        for name, fn in emb_kernels.items():
            out[f"{name}_emb_{mult}x"] = best_of(2, lambda: fn(emb_m, min(mult, 96)))
            out[f"{name}_emb_{mult}x_scaling"] = round(
                out[f"{name}_emb_{mult}x"] / out[f"{name}_emb_1x"], 2
            )

    # -- pagerank: residue-star graph scaled by node count --------------
    def _pr(n_nodes: int):
        edges = (
            spark.range(97, 97 + n_nodes)
            .select(F.col("id").alias("src"), (F.col("id") % 97).alias("dst"))
        )
        return pagerank(edges, damping=0.85, iters=5).count()

    base_nodes = 20_000
    out["pagerank_nodes_1x"] = base_nodes
    out["pagerank_1x"] = best_of(2, lambda: _pr(base_nodes))
    for mult in (10, 120):
        out[f"pagerank_{mult}x"] = best_of(2, lambda: _pr(base_nodes * mult))
        out[f"pagerank_{mult}x_scaling"] = round(
            out[f"pagerank_{mult}x"] / out["pagerank_1x"], 2
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
