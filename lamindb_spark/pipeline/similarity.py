"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with a JVM-side
score expression and TakeOrdered; correct at any scale, O(n) per query.

Scale path: LSH bucketing by random-hyperplane sign bits — queries only
scan their bucket (plus optional multi-probe neighbors), turning top-k
into a partition-pruned lookup. Hyperplanes are derived deterministically
from xxhash64 so both sides of a correctness comparison agree.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Top-k neighbors of a constant query vector.

    The query vector is inlined as an array literal → the score is one
    codegen'd expression per row; ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge, no full
    sort, no shuffle of the data).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = cosine(F.col(vec_col), q) if metric == "cosine" else dot(F.col(vec_col), q)
    return (
        embeddings.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def _sign_bits(vec: Column, dim: int, n_bits: int) -> Column:
    """Random-hyperplane LSH code: sign of dot(vec, h_j) for n_bits
    deterministic pseudo-random hyperplanes (components in {-1,+1}
    derived from xxhash64(i,j))."""
    bits = []
    for j in range(n_bits):
        # h_j[i] = +1 if hash(i,j) even else -1
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: v
                * (F.xxhash64(i, F.lit(j)).bitwiseAND(F.lit(1)) * 2 - 1).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return reduce(add, bits)


def lsh_index(embeddings: DataFrame, dim: int, n_bits: int = 8, vec_col: str = "embedding") -> DataFrame:
    """Add an LSH ``bucket`` column — persist this partitioned-by-bucket
    for pruned ANN lookups."""
    return embeddings.withColumn("bucket", _sign_bits(F.col(vec_col), dim, n_bits))


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via same-bucket candidates (single probe).

    The query's bucket is computed with the same deterministic
    hyperplanes; candidates = rows with equal bucket; score + TakeOrdered
    within the bucket only.
    """
    indexed = lsh_index(embeddings, dim, n_bits, vec_col)
    qdf_bucket = _sign_bits(
        F.array(*[F.lit(float(x)) for x in query_vec]), dim, n_bits
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        indexed.filter(F.col("bucket") == qdf_bucket)
        .select(F.col(id_col), cosine(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
