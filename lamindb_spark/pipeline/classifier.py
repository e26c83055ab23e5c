"""Distributed logistic-regression text classifier (fastText-style
hashed bag-of-words) — the "quality classifier" stage of modern
pretraining pipelines (CCNet / DCLM-style model-based filtering).

Architecture, not a library call: features are the hashing trick
(md5-bucketed token presence — the same engine-portable md5 idiom as
``rules.hash_split``), training is full-batch gradient descent where
EACH iteration is ONE Spark aggregation (explode buckets → integer
partial-agg gradient), and the weight vector — k integers — is the
only thing that ever touches the driver, exactly like the k-means
centroid fetch.

Integer-exact by construction: weights live in fixed-point (1e-6),
the per-doc probability is quantized to an integer BEFORE the
gradient sum, so every gradient is an INTEGER sum — exact and
summation-order-independent — and the weight update is integer floor
arithmetic on the driver. An independent SQL engine replays the whole
training bit-for-bit (the ``logreg_weights`` oracle unrolls the
iterations as a CTE chain); the one float op per doc-iteration is the
sigmoid's ``exp``, whose sub-ulp engine differences vanish in the
1e-6 quantization.

At 100 TB: featurization is a zero-shuffle map pass; each iteration
shuffles (bucket, partial-sum) pairs — k rows per mapper after
map-side combine; driver traffic is k longs per iteration. Scoring is
a pure codegen expression against the literal weight array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_tokens

SCALE = 1_000_000


def _fld(a: int, b: int) -> int:
    """Floor division on exact integers (python // is already floor;
    spelled out so the SQL oracle's ``(a - pymod(a,b)) // b`` is
    recognizably the same operation)."""
    return a // b


def token_bucket(tok: Column, n_buckets: int) -> Column:
    """Engine-portable hashing trick: first 8 md5 hex digits → int →
    mod buckets (same idiom as rules.hash_split)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def featurize(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 128,
) -> DataFrame:
    """(id, y, buckets): distinct presence buckets per document.
    Zero-shuffle map pass."""
    toks = ws_tokens(F.col(text_col), lowercase=True)
    return df.select(
        F.col(id_col),
        label.cast("int").alias("y"),
        F.array_distinct(
            F.transform(toks, lambda t: token_bucket(t, n_buckets))
        ).alias("buckets"),
    )


def train_logreg(
    feats: DataFrame,
    n_buckets: int = 128,
    iters: int = 5,
    lr_num: int = 1,
    lr_den: int = 2,
    cache_key: str | None = None,
) -> tuple[list[int], int]:
    """Full-batch GD on hashed presence features; returns fixed-point
    (weights, bias). One integer-aggregation Spark job per iteration;
    weight updates happen on the driver in exact integer arithmetic.

    ``cache_key`` opts into the fingerprint-keyed model cache
    (``similarity._MODEL_CACHE``): training is exact-integer
    deterministic, so the learned (weights, bias) keyed by (features'
    source fingerprint, hyperparameters) is the reusable artifact —
    the trained quality classifier a pipeline applies corpus-wide.
    NOTE the key must fingerprint the FEATURIZATION too if the caller
    varies it (include a label/feature descriptor in ``cache_key``).
    """
    if cache_key is not None:
        from .similarity import _cache_get

        hit = _cache_get(("logreg", cache_key, n_buckets, iters, lr_num, lr_den))
        if hit is not None:
            return hit
    feats = feats.localCheckpoint(eager=True)
    n_docs = feats.count()
    w = [0] * n_buckets
    bias = 0
    for _ in range(iters):
        warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
        zi = F.lit(int(bias)).cast("long") + F.aggregate(
            F.transform(F.col("buckets"), lambda b: F.element_at(warr, b + 1)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        z = F.least(F.greatest(zi / float(SCALE), F.lit(-30.0)), F.lit(30.0))
        p_int = F.round(F.lit(float(SCALE)) / (1.0 + F.exp(-z)), 0).cast("long")
        resid = (p_int - F.col("y") * SCALE).alias("r")
        # bucket -1 rides along as the bias feature so the whole
        # gradient (weights + bias) is ONE aggregation job
        rows = feats.select(
            resid,
            F.concat(F.array(F.lit(-1)), F.col("buckets")).alias("buckets"),
        )
        grad = {
            int(r["b"]): int(r["g"])
            for r in rows.select(F.explode("buckets").alias("b"), "r")
            .groupBy("b")
            .agg(F.sum("r").alias("g"))
            .collect()
        }
        for b, g in grad.items():
            if b == -1:
                bias -= _fld(lr_num * g, lr_den * n_docs)
            else:
                w[b] -= _fld(lr_num * g, lr_den * n_docs)
    if cache_key is not None:
        from .similarity import _cache_put

        _cache_put(("logreg", cache_key, n_buckets, iters, lr_num, lr_den), (w, bias))
    return w, bias


def score_logreg(
    feats: DataFrame, w: list[int], bias: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, prob): sigmoid of the learned linear score — a pure
    codegen expression against the literal weight array, zero shuffle."""
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    zi = F.lit(int(bias)).cast("long") + F.aggregate(
        F.transform(F.col("buckets"), lambda b: F.element_at(warr, b + 1)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    z = F.least(F.greatest(zi / float(SCALE), F.lit(-30.0)), F.lit(30.0))
    return feats.select(
        F.col(id_col), F.round(1.0 / (1.0 + F.exp(-z)), 6).alias("prob")
    )
