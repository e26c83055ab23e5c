"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The published recipe: represent every document as hashed n-gram
counts, fit two bag-of-ngrams distributions — target domain vs raw
pool — and score each raw document by the importance log-ratio
``sum_b n_b * (log p_target[b] - log p_raw[b])``; resampling by that
weight yields a corpus distributed like the target. This is the
standard cheap alternative to classifier-based domain filtering
(GPT-3's quality classifier) and composes with
:func:`rules.stratified_sample` for the resampling step.

Spark shape (the 100 TB contract):

1. ONE corpus-sized pass: explode hashed bigram buckets, conditional
   partial aggregation → per-bucket (target_count, raw_count). The
   shuffle carries at most ``n_buckets`` rows per mapper; the result —
   the entire "model" — is ``n_buckets`` rows fetched to the driver
   (same bounded-traffic contract as the k-means centroid fetch).
2. ONE zero-shuffle scoring pass: the smoothed log-ratios become a
   literal array; each document's score is an integer aggregate over
   its bigram buckets — whole-stage-codegen, no joins, no Python.

Engine portability: buckets hash through the md5 idiom
(:func:`classifier.token_bucket`), and log-ratios are quantized to
integer MICRO-units before the per-document sum, so document scores
are exact integer arithmetic — summation order cannot flip a round.

Reference scope: lamindb has no data-selection ops; this extends the
training-data pipeline family (SURVEY §2 corpus block).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_tokens
from .classifier import token_bucket

SCALE = 1_000_000


def bigram_buckets(text_col: Column, n_buckets: int) -> Column:
    """array<int>: hashed buckets of the document's word bigrams
    (lowercased whitespace tokens, space-joined pairs), one entry per
    OCCURRENCE — DSIR weights count repetitions. Pure expression."""
    toks = ws_tokens(text_col, lowercase=True)
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(grams, lambda g: token_bucket(g, n_buckets))


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    cache_key: str | None = None,
) -> DataFrame:
    """Importance log-weight per document: (id, n_bigrams, score_micro).

    ``target`` is a boolean Column marking the target-domain slice of
    ``df`` (e.g. ``F.col("source") == "wiki"``). Laplace-smoothed
    bucket probabilities: ``p[b] = (count[b] + 1) / (total + B)`` on
    each side; per-bucket log-ratio quantized to micro-units
    (``round(lr * 1e6)``), per-document score = integer sum of the
    ratios of its bigram occurrences. Positive score ⇒ looks like the
    target domain. Docs with no bigrams score 0.

    ``cache_key`` opts into the fingerprint-keyed model cache
    (``similarity._MODEL_CACHE``) for the fitted ratio table — the
    DSIR importance model IS the reusable artifact (Xie et al. fit it
    once, score everything). The fit is deterministic, so the key is
    (source fingerprint + a target descriptor chosen by the caller,
    text_col, n_buckets) — text_col is folded in like bpe_train does,
    so the same cache_key with a different text column can never serve
    the wrong ratio table; callers MUST still fold the target
    predicate into the key.
    """
    # note: no spread_for_cpu here — feats feeds TWO passes (model fit,
    # then scoring), so an inserted repartition would be paid twice and
    # measured slower at sf0.1 than the single-core scan; the fit pass
    # shuffles anyway (explode+groupBy) and parallelizes there.
    feats = df.select(
        F.col(id_col),
        bigram_buckets(F.col(text_col), n_buckets).alias("__bks"),
        target.cast("int").alias("__is_t"),
    )
    lr = None
    if cache_key is not None:
        from .similarity import _cache_get

        lr = _cache_get(("dsir", cache_key, text_col, n_buckets))
    if lr is None:
        stats = (
            feats.select(F.explode("__bks").alias("__bk"), "__is_t")
            .groupBy("__bk")
            .agg(
                F.sum("__is_t").cast("long").alias("ct"),
                F.count(F.lit(1)).cast("long").alias("cr"),
            )
            .collect()
        )  # ≤ n_buckets rows — the model, not the data
        n_t = sum(int(r["ct"]) for r in stats)
        n_r = sum(int(r["cr"]) for r in stats)
        # buckets never seen get the pure-smoothing ratio
        unseen = int(
            round(
                (math.log(1.0 / (n_t + n_buckets)) - math.log(1.0 / (n_r + n_buckets)))
                * SCALE
            )
        )
        lr = [unseen] * n_buckets
        for r in stats:
            val = math.log((int(r["ct"]) + 1.0) / (n_t + n_buckets)) - math.log(
                (int(r["cr"]) + 1.0) / (n_r + n_buckets)
            )
            lr[int(r["__bk"])] = int(round(val * SCALE))
        if cache_key is not None:
            from .similarity import _cache_put

            _cache_put(("dsir", cache_key, text_col, n_buckets), lr)
    # scoring expression as ONE F.expr parse: n_buckets F.lit py4j
    # round-trips would dominate plan-build time (the portable_bucket
    # finding); `L`-suffixed literals keep the sum exact bigint
    lits = ",".join(f"{int(x)}L" for x in lr)
    score = F.expr(
        f"aggregate(__bks, cast(0 as bigint), "
        f"(acc, b) -> acc + element_at(array({lits}), b + 1))"
    )
    return feats.select(
        F.col(id_col),
        F.size("__bks").cast("long").alias("n_bigrams"),
        score.alias("score_micro"),
    )
