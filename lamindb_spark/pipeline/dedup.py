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
    """(id, signature array<long>) — n_hashes permutation minima.

    Shape chosen for scale: hash each *token* once, derive shingle
    hashes by combining consecutive token hashes (no shingle strings
    are ever materialized), then aggregate n_hashes cheap long-rehash
    minima under whole-stage codegen with map-side partial aggregation
    — the shuffle carries only n_docs × n_hashes longs.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    sh = th
    for j in range(1, k_shingle):
        # combine with the j-shifted hash array; zip_with pads the
        # shorter side with null → trimmed to the valid window below
        sh = F.zip_with(
            sh,
            F.slice(th, j + 1, F.greatest(F.size(th) - j, F.lit(0))),
            lambda a, b: F.xxhash64(a, b),
        )
    valid = F.greatest(F.size(th) - (k_shingle - 1), F.lit(1))
    base = df.select(F.col(id_col), F.explode(F.slice(sh, 1, valid)).alias("__h"))
    mins = base.groupBy(id_col).agg(
        *[F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"h{i}") for i in range(n_hashes)]
    )
    return mins.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("signature")
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
