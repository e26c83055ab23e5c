"""Corpus deduplication at scale: exact, MinHash+LSH, SimHash, Jaccard.

Training-data-pipeline extensions beyond the reference surface (its
dedup is whole-file content hashing, ``artifact.py:384-505``); these
operate on a document *text* column.

Scale design:
- exact: hash-groupBy — one shuffle on a 16-byte key, AQE-coalesced.
- MinHash: signatures are pure Column expressions (xxhash64 with per-
  permutation seeds, array min) — no UDF; LSH banding turns the O(n²)
  pair problem into a groupBy on (band, band_hash) buckets + intra-
  bucket self-join, the standard linear-ish-scale shape.
- SimHash: 64-bit sign-aggregated token hashes via bit arithmetic.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, shingles


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized content: keeper id (min), count.

    Returns (content_hash, keeper_id, n_dups).
    """
    return (
        df.select(fingerprint(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 64,
) -> DataFrame:
    """(id, signature array<long>) — min over xxhash64(shingle, seed_i).

    Entirely JVM-side: shingling with array HOFs, n_hashes mins per row.
    """
    sh = shingles(F.col(text_col), k_shingle).alias("__sh")
    sig_cols = [
        F.array_min(
            F.transform(F.col("__sh"), lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return (
        df.select(F.col(id_col), sh)
        .select(F.col(id_col), F.array(*sig_cols).alias("signature"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signatures, bucket-join within bands → candidate pairs.

    Output: (id_a, id_b, n_shared_bands) with id_a < id_b. The self-join
    happens per (band, bucket) — tiny groups — instead of a full cross
    join; this is what makes near-dup mining feasible at 100 TB.
    """
    bands = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("signature")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bucket") == F.col(f"b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def signature_jaccard(pairs: DataFrame, signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal
    signature positions."""
    sa = signatures.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = signatures.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    n = F.size(F.col("sig_a"))
    eq = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn("est_jaccard", eq / n)
        .drop("sig_a", "sig_b")
    )


def ngram_jaccard(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
) -> Column:
    raise NotImplementedError(
        "exact pairwise n-gram jaccard is O(n^2); use minhash_signatures + "
        "lsh_candidate_pairs + signature_jaccard for the scale path"
    )


def simhash64(col: Column, seed: int = 0) -> Column:
    """64-bit SimHash of whitespace tokens, pure bit arithmetic.

    For each bit position, sum +1/-1 over token-hash bits, take sign.
    """
    toks = F.array_distinct(F.split(F.lower(F.trim(col)), "\\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))
    bits = []
    for i in range(64):
        # +1 if bit set else -1, summed over tokens
        contrib = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )
        bits.append(
            F.shiftleft(F.when(contrib > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i)
        )
    return reduce(add, bits).alias("simhash")


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
