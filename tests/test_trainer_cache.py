"""The r9 extension of the fingerprint-keyed model cache to the
text-side trainers: BPE merges, logreg weights, DSIR ratio table.
Same contract as `test_advice_fixes_r7.test_model_cache_hit_and_isolation`:
a key hit must skip training entirely (proved by feeding an input the
trainer could not succeed on), and distinct keys/hyperparams miss.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat", "src0"),
        (2, "the cat ran off the mat", "src0"),
        (3, "dogs chase the cat around", "src1"),
        (4, "spark makes big data small", "src9"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_bpe_train_cache_hit_skips_training(spark):
    from lamindb_spark.pipeline import similarity as S
    from lamindb_spark.pipeline.bpe import bpe_train

    S._MODEL_CACHE.clear()
    d = _docs(spark)
    merges = bpe_train(d, n_merges=4, cache_key="fpA")
    assert merges
    # empty input would train zero merges — a hit must return the model
    hit = bpe_train(d.limit(0), n_merges=4, cache_key="fpA")
    assert hit == merges
    # different hyperparams / key: retrains (empty input -> no merges)
    assert bpe_train(d.limit(0), n_merges=3, cache_key="fpA") == []
    assert bpe_train(d.limit(0), n_merges=4, cache_key="fpB") == []
    S._MODEL_CACHE.clear()


def test_logreg_cache_hit_skips_training(spark):
    from lamindb_spark.pipeline import similarity as S
    from lamindb_spark.pipeline.classifier import featurize, train_logreg

    S._MODEL_CACHE.clear()
    d = _docs(spark)
    from lamindb_spark.functions.text import ws_tokens

    toks = ws_tokens(F.col("text"), lowercase=True)
    feats = featurize(
        d.select("doc_id", "text"), F.array_contains(toks, "cat"), n_buckets=16
    )
    w, b = train_logreg(feats, n_buckets=16, iters=2, cache_key="fpL")
    assert any(x != 0 for x in w + [b])
    # a hit must not touch the input at all
    w2, b2 = train_logreg(feats.limit(0), n_buckets=16, iters=2, cache_key="fpL")
    assert (w2, b2) == (w, b)
    # untrained twin on empty input proves the miss path retrains
    w3, b3 = train_logreg(feats.limit(0), n_buckets=16, iters=2, cache_key="fpL2")
    assert all(x == 0 for x in w3 + [b3])
    S._MODEL_CACHE.clear()


def test_dsir_cache_hit_skips_fit(spark):
    from lamindb_spark.pipeline import similarity as S
    from lamindb_spark.pipeline.dsir import dsir_weights

    S._MODEL_CACHE.clear()
    d = _docs(spark)
    tgt = F.col("source") == "src0"
    full = {
        r["doc_id"]: (r["n_bigrams"], r["score_micro"])
        for r in dsir_weights(d, tgt, cache_key="fpD:t0").collect()
    }
    assert full and any(s != 0 for _, s in full.values())
    # scoring an empty frame with a cached model: no fit scan happens
    # (an empty fit would produce the all-unseen model, score 0 for
    # everything — so re-scoring the full frame must match `full`)
    again = {
        r["doc_id"]: (r["n_bigrams"], r["score_micro"])
        for r in dsir_weights(d.limit(0), tgt, cache_key="fpD:t0").collect()
    }
    assert again == {}
    again_full = {
        r["doc_id"]: (r["n_bigrams"], r["score_micro"])
        for r in dsir_weights(d, tgt, cache_key="fpD:t0").collect()
    }
    assert again_full == full
    S._MODEL_CACHE.clear()
