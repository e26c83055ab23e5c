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


def _train_local(
    rows, n_buckets: int, iters: int, lr_num: int, lr_den: int
) -> tuple[list[int], int]:
    """Driver-local replay of the distributed GD loop over collected
    (y, buckets) rows — bit-identical to the per-iteration Spark
    aggregation by construction:

    - zi / z / the sigmoid are the same float64 ops in the same order;
      zi itself is an exact-integer sum (|zi| ≤ 128·|w|max + |bias| ≈
      3e8 ≪ 2^53, so the float64 ``bincount`` partials are exact).
    - The probability quantization ``round(x, 0).cast("long")`` on a
      double is Spark's ``BigDecimal.valueOf(x).setScale(0, HALF_UP)``
      — decimal half-up on a round-trippable repr of x. For x < 2^51
      that equals binary half-up ``floor(x + 0.5)``: x and 0.5 are
      both exact multiples of ulp(x) ≤ 0.5, so the sum is exact, and
      no representable double sits strictly between x's repr value
      and x on opposite sides of a k+0.5 boundary (k+0.5 is itself
      representable, so a repr crossing it would round-trip to the
      wrong double). Hence ``np.floor(p + 0.5)`` below is exact.
    - Gradients are integer sums (float64-exact: ≤ n_docs·1e6 ≪ 2^53)
      and the update is the same floor division. Buckets with a zero
      gradient sum get a ``-(0 // den) = 0`` update, identical to the
      distributed form where they are simply absent from the groupBy.
    - Docs whose y or buckets are NULL contribute no gradient rows in
      the distributed explode (``sum`` skips NULL residuals) but DO
      count in ``n_docs`` — mirrored by the ``ok`` filter vs
      ``len(rows)`` here. (``featurize`` never produces NULLs —
      ``ws_tokens`` is null-safe — this mirrors the SQL semantics.)

    Equality with the distributed loop is pinned across every fixture
    SF by ``tests/test_opt_r16.py``; the ``logreg_weights`` oracle
    replays the whole training in DuckDB SQL and hash-matches.
    """
    import numpy as np

    n_docs = len(rows)
    ok = [r for r in rows if r[0] is not None and r[1] is not None]
    y = np.array([int(r[0]) for r in ok], dtype=np.int64)
    lens = np.array([len(r[1]) for r in ok], dtype=np.int64)
    flat = np.array(
        [b for r in ok for b in r[1]], dtype=np.int64
    )
    doc_of = np.repeat(np.arange(len(ok), dtype=np.int64), lens)
    w = np.zeros(n_buckets, dtype=np.int64)
    bias = 0
    if n_docs == 0 or not ok:
        # distributed form: empty gradient groupBy → no updates at all
        return [0] * n_buckets, 0
    den = lr_den * n_docs
    for _ in range(iters):
        zi = bias + np.bincount(
            doc_of, weights=w[flat].astype(np.float64), minlength=len(ok)
        ).astype(np.int64)
        z = np.minimum(np.maximum(zi / float(SCALE), -30.0), 30.0)
        p = float(SCALE) / (1.0 + np.exp(-z))
        p_int = np.floor(p + 0.5).astype(np.int64)
        resid = p_int - y * SCALE
        gb = np.bincount(
            flat, weights=resid[doc_of].astype(np.float64), minlength=n_buckets
        ).astype(np.int64)
        w = w - (lr_num * gb) // den
        bias -= _fld(lr_num * int(resid.sum()), den)
    return [int(x) for x in w], int(bias)


def train_logreg(
    feats: DataFrame,
    n_buckets: int = 128,
    iters: int = 5,
    lr_num: int = 1,
    lr_den: int = 2,
    cache_key: str | None = None,
    local_max_docs: int | None = 200_000,
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

    r16 (VERDICT r15 #3): a feature table within the established
    driver budget (``local_max_docs``, the graph-operators' probe
    pattern) is collected ONCE — a single bounded job via
    ``limit(cap+1)``, so at 100 TB the probe reads ~cap rows and falls
    through — and the whole GD loop runs driver-local in exact numpy
    integer arithmetic (:func:`_train_local`), replacing
    checkpoint + count + one scheduled aggregation job PER iteration
    (7 jobs → 1 for the default 5 iterations; the iterative-job-floor
    disease the r15 graph fast paths cured). Above the cap (or with
    ``local_max_docs=None``) the distributed loop below is unchanged.
    """
    if cache_key is not None:
        from .similarity import _cache_get

        hit = _cache_get(("logreg", cache_key, n_buckets, iters, lr_num, lr_den))
        if hit is not None:
            return hit
    if local_max_docs is not None:
        probe = feats.select("y", "buckets").limit(local_max_docs + 1).collect()
        if len(probe) <= local_max_docs:
            w, bias = _train_local(probe, n_buckets, iters, lr_num, lr_den)
            if cache_key is not None:
                from .similarity import _cache_put

                _cache_put(
                    ("logreg", cache_key, n_buckets, iters, lr_num, lr_den),
                    (w, bias),
                )
            return w, bias
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
