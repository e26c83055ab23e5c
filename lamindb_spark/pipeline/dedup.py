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


def _spread(df: DataFrame) -> DataFrame:
    """Ensure at least cluster-default parallelism before a CPU-heavy
    per-row stage (tokenize/shingle/hash). A small parquet arrives as
    1-2 partitions and would pin the whole stage to one core; at real
    scale the input already has ≥ defaultParallelism partitions and
    this is a no-op (no shuffle inserted)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
    base = _spread(df).select(F.col(id_col), F.explode(F.slice(sh, 1, valid)).alias("__h"))
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
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Band the signatures, bucket-join within bands → candidate pairs.

    Output: (id_a, id_b, n_shared_bands) with id_a < id_b. The self-join
    happens per (band, bucket) — tiny groups — instead of a full cross
    join; this is what makes near-dup mining feasible at 100 TB.

    ``max_bucket_size`` guards the quadratic intra-bucket join against
    degenerate buckets (mass-duplicated boilerplate sharing a band
    hash): a bucket larger than the cap emits a linear STAR — every
    member paired with the bucket's min id — instead of all n(n−1)/2
    pairs. Connectivity for duplicate-group clustering is preserved
    (the group stays one connected component) while the output stays
    O(n) per bucket. Same role as ``max_doc_freq`` in
    :func:`ngram_jaccard_pairs`; the window count reuses the
    (band, bucket) shuffle partitioning the join needs anyway.

    .. note:: star mode changes ``n_shared_bands`` semantics for pairs
       that only meet inside oversized buckets: it counts CAPPED bands
       only, so it under-counts band agreement there and must not be
       used as a similarity score on its own. Precision is restored
       downstream by verifying every candidate with
       :func:`signature_jaccard` (estimated Jaccard from full
       signatures), which is unaffected by the cap — see
       ``tests/test_pipeline.py::test_star_mode_jaccard_verification``.
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
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket")
        sized = bands.withColumn("__bs", F.count(F.lit(1)).over(w)).withColumn(
            "__min", F.min(id_col).over(w)
        )
        small = sized.filter(F.col("__bs") <= max_bucket_size).drop("__bs", "__min")
        star = (
            sized.filter(
                (F.col("__bs") > max_bucket_size) & (F.col(id_col) != F.col("__min"))
            )
            .select(
                F.col("__min").alias("id_a"),
                F.col(id_col).alias("id_b"),
                "band",
            )
        )
    else:
        small, star = bands, None
    a = small.alias("a")
    b = small.alias("b")
    raw = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.band").alias("band"),
    )
    if star is not None:
        raw = raw.unionByName(star)
    return raw.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_shared_bands"))


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


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity for all pairs above a threshold —
    via a sparse inverted-index join, never a cross join.

    Shape: doc → distinct shingles (explode), self-join on shingle to
    count intersections (only docs sharing a shingle ever meet), then
    ``|A∩B| / (|A| + |B| - |A∩B|)``. ``max_doc_freq`` drops
    stop-shingles that appear in more than N docs — the standard guard
    against quadratic blowup on ubiquitous n-grams at corpus scale.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    # Materialize the exploded (id, shingle) table once — it feeds four
    # consumers (sizes, doc-freq, both self-join sides); without this the
    # corpus would be re-tokenized and re-shingled per consumer.
    sh = _spread(df).select(
        F.col(id_col), F.explode(F.array_distinct(shingles(F.col(text_col), k_shingle))).alias("sh")
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        # doc-freq cap via a window count instead of groupBy+semi-join:
        # one shuffle on `sh` whose partitioning the self-join below
        # then reuses, instead of two shuffles plus a join.
        from pyspark.sql import Window

        w = Window.partitionBy("sh")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
    a = sh.select(F.col("sh"), F.col(id_col).alias("id_a"))
    b = sh.select(F.col("sh"), F.col(id_col).alias("id_b"))
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def contamination_overlap(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for every training document, how
    many of its distinct k-shingles also occur anywhere in a benchmark
    set — the standard n-gram-overlap decontamination pass before
    training on a crawl.

    Shape: both sides explode to distinct shingles; the benchmark side
    collapses to a DISTINCT shingle set (its size is vocabulary-bounded
    and independent of benchmark doc count), then one semi-joinable
    equi-join on the shingle feeds a per-doc count. All training docs
    are kept (``n_shared = 0`` when clean) so the output is a stable
    per-doc verdict table.

    Output: (doc_id, n_shingles, n_shared, overlap_ratio, contaminated).

    Both sides are separate lazy scans ON PURPOSE: a benchmark set is
    orders of magnitude smaller than the training corpus, and keeping
    it a distinct frame lets Catalyst push its defining predicate into
    the scan — measured faster than sharing (and checkpointing) one
    exploded shingle table across both sides.
    """
    tr = _spread(train).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), k_shingle))).alias("sh"),
    )
    bn = (
        bench.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), k_shingle))).alias("sh")
        )
        .distinct()
    )
    hits = (
        tr.join(bn, "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        sizes.join(hits, id_col, "left")
        .select(
            id_col,
            F.col("n_shingles"),
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_shingles"), 6
            ).alias("overlap_ratio"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


_FP_PRIME = 1_000_000_007


def _token_polyhash(tok: Column) -> Column:
    """Deterministic cross-engine token hash: Horner polynomial over
    character codes mod a prime — expressible identically in ANSI SQL
    (DuckDB ``list_reduce``), unlike xxhash64."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % _FP_PRIME,
    )


def _token_hash_arrays(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, __th array<long>) — per-document token-hash arrays with the
    per-CHARACTER Horner hash computed once per DISTINCT token (the
    dictionary-encoding trick: natural-language vocabularies are tiny
    relative to corpus size), broadcast-joined back to positions and
    reassembled in order. Avoids a depth-3 nested higher-order
    expression per row, which defeats codegen and costs ~10× more."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    pos_tok = _spread(df).select(F.col(id_col), F.posexplode(toks).alias("__pos", "__tok"))
    vocab = (
        pos_tok.select("__tok")
        .distinct()
        .withColumn("__h", _token_polyhash(F.col("__tok")))
    )
    hashed = pos_tok.join(F.broadcast(vocab), "__tok")
    return hashed.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__h"))), lambda s: s["__h"]
        ).alias("__th")
    )


def winnow_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing, bottom-sketch):
    hash every token (polynomial rolling hash), combine each
    ``window``-token run into one hash, keep the minimum — a compact,
    shift-tolerant content fingerprint for near-dup grouping.

    Output (id, fingerprint, n_windows); token hashing via
    :func:`_token_hash_arrays` (dictionary trick).
    """
    th_per_doc = _token_hash_arrays(df, text_col, id_col)
    th = F.col("__th")
    n = F.size(th)
    n_windows = F.greatest(n - (window - 1), F.lit(1))
    window_hashes = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.aggregate(
            F.slice(th, i, F.least(F.lit(window), n)),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * 37 + h) % _FP_PRIME,
        ),
    )
    return th_per_doc.select(
        F.col(id_col),
        F.array_min(window_hashes).alias("fingerprint"),
        n_windows.cast("long").alias("n_windows"),
    )


def minhash_signatures_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
) -> DataFrame:
    """MinHash over 2-shingles with CROSS-ENGINE hashes: polynomial
    token hashes (see ``_token_polyhash``) combined Horner-style into
    shingle hashes, re-permuted by affine maps ``(2i+1)·x + 12345·i + 7
    mod p``. Slower than the xxhash64 production path
    (:func:`minhash_signatures`) but every value is reproducible in
    ANSI SQL — used by the correctness harness to value-check the
    MinHash pipeline itself, not just its row counts.

    Output: (id, hash_idx, sig) exploded long-form; token hashing via
    :func:`_token_hash_arrays` (dictionary trick).
    """
    th_per_doc = _token_hash_arrays(df, text_col, id_col)
    th = F.col("__th")
    n = F.size(th)
    combine = lambda a, b: (a * 37 + b) % _FP_PRIME
    sh = F.when(
        n < 2,
        F.array(F.aggregate(th, F.lit(0).cast("long"), combine)),
    ).otherwise(F.zip_with(F.slice(th, 1, n - 1), F.slice(th, 2, n - 1), combine))
    sigs = F.array(
        *[
            F.array_min(
                F.transform(sh, lambda x: ((2 * i + 1) * x + 12345 * i + 7) % _FP_PRIME)
            )
            for i in range(n_hashes)
        ]
    )
    return th_per_doc.select(
        F.col(id_col), F.posexplode(sigs).alias("hash_idx", "sig")
    ).select(F.col(id_col), F.col("hash_idx").cast("long").alias("hash_idx"), "sig")


def simhash_bit_sums_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 30,
) -> DataFrame:
    """SimHash bit-contribution sums with CROSS-ENGINE hashes: for each
    of the polynomial token hash's ``n_bits`` low bits, the ±1 sum over
    DISTINCT tokens (the quantity whose sign is the SimHash bit). The
    polynomial hash spans <2^30, so 30 bits is the honest width; the
    production :func:`simhash_signatures` (xxhash64, 64 bits) stays the
    scale path — this twin exists so the correctness harness can
    value-check the SimHash computation against ANSI SQL, not just row
    counts.

    Output: (id, bit_idx, contrib) exploded long-form.
    """
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), "\\s+"))
    base = _spread(df).select(F.col(id_col), F.explode(toks).alias("__t")).select(
        F.col(id_col), _token_polyhash(F.col("__t")).alias("__h")
    )
    sums = base.groupBy(id_col).agg(
        *[
            F.sum(
                (F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
            ).alias(f"b{i}")
            for i in range(n_bits)
        ]
    )
    arr = F.array(*[F.col(f"b{i}") for i in range(n_bits)])
    return sums.select(F.col(id_col), F.posexplode(arr).alias("bit_idx", "contrib")).select(
        F.col(id_col), F.col("bit_idx").cast("long").alias("bit_idx"), "contrib"
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """64-bit SimHash per document — explode/groupBy shape for scale.

    One pass: distinct token hashes explode to (id, hash) rows, then
    16 packed SUM aggregates — each long carries four 16-bit bit-set
    counters (fields saturate at 65535, so distinct tokens per doc are
    capped at 65535 via ``slice``; the cap is deterministic and far
    above real document sizes). Bit i of the signature is set iff
    ``2*count_set(i) > n_tokens`` — identical to the ±1-sum sign, but
    the agg state is 16 longs + a count instead of 64 sums: 4× fewer
    aggregation buffers and 4× less shuffled agg state per doc.
    """
    toks = F.slice(
        F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")),
        1,
        65535,
    )
    base = _spread(df).select(
        F.col(id_col), F.explode(toks).alias("__t")
    ).select(F.col(id_col), F.xxhash64(F.col("__t"), F.lit(seed)).alias("__h"))

    def _pack(k: int) -> Column:
        # bits 4k..4k+3 of the token hash, one per 16-bit field
        bit = lambda i: F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1))
        return (
            bit(4 * k)
            + F.shiftleft(bit(4 * k + 1), 16)
            + F.shiftleft(bit(4 * k + 2), 32)
            + F.shiftleft(bit(4 * k + 3), 48)
        )

    sums = base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(_pack(k)).alias(f"p{k}") for k in range(16)],
    )

    def _sigbit(i: int) -> Column:
        k, f = divmod(i, 4)
        cnt = F.shiftright(F.col(f"p{k}"), 16 * f).bitwiseAND(F.lit(0xFFFF))
        return F.shiftleft((cnt * 2 > F.col("__n")).cast("long"), i)

    sig = reduce(add, [_sigbit(i) for i in range(64)])
    return sums.select(F.col(id_col), sig.alias("simhash"))


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
