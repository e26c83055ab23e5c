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


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest
    centroid (squared L2, deterministic centroid-id tiebreak).

    Centroid table is tiny → broadcast nested-loop join (n_vec × n_cent
    distance evals, all codegen'd), then a per-vector argmin window. At
    100 TB this is the standard IVF build step: the assignment column
    becomes the partition key, so ANN queries scan one (or a few) cells
    instead of the full corpus.
    """
    from pyspark.sql import Window

    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col(centroid_vec_col), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    joined = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col), F.col(centroid_id_col), d2.alias("__d2")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__d2").asc(), F.col(centroid_id_col).asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__d2")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine within a blocking key.

    The block column (a cluster/IVF/LSH cell id) bounds the quadratic
    pair space to within-block pairs — the embedding analogue of LSH
    banding. Output: (id_a, id_b, cos) with id_a < id_b, cos >= threshold.
    """
    a = embeddings.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = embeddings.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    return (
        a.join(b, ["__blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


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
