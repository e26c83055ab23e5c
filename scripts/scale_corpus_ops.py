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

    kernels = {
        "dedup_spans": lambda d: dedup_token_spans(d).count(),
        "bm25": lambda d: bm25_rank(d, ["spark", "shuffle", "merge"]).count(),
        "oov_rate": lambda d: vocab_coverage(d).count(),
        "bpe_8merges": lambda d: len(bpe_train(d, n_merges=8)),
        "lm_perplexity": lambda d: bigram_lm_scores(d).count(),
        "logreg_5iters": _logreg,
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
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
