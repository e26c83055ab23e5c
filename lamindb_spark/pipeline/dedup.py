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

from ..functions.text import fingerprint


#: below this estimated input size the pre-stage repartition is pure
#: overhead: one core chews through <64 MB of text faster than a full
#: round-robin shuffle + an extra stage of task scheduling costs.
_SPREAD_MIN_BYTES = 64 * 1024 * 1024


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan (parquet
    statistics propagated through filters/projections). Errs huge on
    unknown so gates default to the scale-safe branch."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62


#: canonical tokenization fragment shared by every text kernel. NULL
#: text is normalized to '' HERE, explicitly: null handling must not
#: depend on size(NULL) semantics, which flip between -1 and NULL with
#: spark.sql.ansi.enabled / legacy.sizeOfNull (ADVICE r4). An empty/
#: null doc therefore tokenizes to [''] and flows through every kernel
#: like any other single-token doc (null-text docs pair as exact dups,
#: fingerprints/signatures are emitted, never silently dropped).
_TOKENS_SQL = "split(lower(trim(coalesce({text}, ''))), '\\\\s+')"


def _spread(
    df: DataFrame, force: bool | None = None, size_bytes: int | None = None
) -> DataFrame:
    """Ensure at least cluster-default parallelism before a CPU-heavy
    per-row stage (tokenize/shingle/hash). A small parquet arrives as
    1-2 partitions and would pin the whole stage to one core; at real
    scale the input already has ≥ defaultParallelism partitions and
    this is a no-op (no shuffle inserted).

    Gated on the optimizer's SIZE estimate, not partition count alone:
    a sub-``_SPREAD_MIN_BYTES`` input is cheaper to process on its 1-2
    scan partitions than to shuffle first (the r3 bench paid a full
    extra Exchange per text query for nothing — VERDICT r03 #1).
    ``force=True/False`` overrides the heuristic (tests pin both
    branches); ``size_bytes`` supplies an already-computed estimate so
    callers that also gate on size run Catalyst optimization once."""
    do = force
    if do is None:
        target = df.sparkSession.sparkContext.defaultParallelism
        size = _plan_size_bytes(df) if size_bytes is None else size_bytes
        do = size >= _SPREAD_MIN_BYTES and df.rdd.getNumPartitions() < target
    if do:
        return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df


def _shingle_hash_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    size_bytes: int | None = None,
    with_count: bool = False,
) -> DataFrame:
    """(id, sh) rows — one row per DISTINCT k-shingle hash per doc
    (plus the doc's distinct-shingle count ``n_sh`` when
    ``with_count`` — a map-side column that rides along the explode,
    saving downstream consumers a per-doc count shuffle).

    Shingles are 64-bit hashes of k consecutive token hashes, never
    materialized as strings: per-row work is a handful of xxhash64
    calls instead of slice+concat string allocation (NOT measurable at
    bench scale — SCALE.md ledger r5: 0.495 vs 0.483 s at sf0.1, floor-
    dominated; the design is kept for the 8-byte long join/broadcast
    keys downstream and per-byte cost at corpus scale), and set
    semantics are identical to string shingles modulo 64-bit collisions
    (~n²/2⁶⁵ — zero in practice). A doc shorter than k tokens
    contributes one whole-doc hash, mirroring ``shingles()``; NULL
    text is normalized to '' up front (see ``_TOKENS_SQL``). Built as
    SQL strings: one parse, no py4j round-trip pile-up.
    """
    base = _spread(df, size_bytes=size_bytes).selectExpr(
        id_col,
        f"transform({_TOKENS_SQL.format(text=text_col)}, t -> xxhash64(t)) AS __th",
    )
    sh = "__th"
    for j in range(1, k):
        sh = (
            f"zip_with({sh}, slice(__th, {j + 1}, greatest(size(__th) - {j}, 0)), "
            "(a, b) -> xxhash64(a, b))"
        )
    valid = f"greatest(size(__th) - {k - 1}, 1)"
    whole = "array(aggregate(__th, 42L, (a, b) -> xxhash64(a, b)))"
    arr = (
        f"array_distinct(CASE WHEN size(__th) < {k} THEN {whole} "
        f"ELSE slice({sh}, 1, {valid}) END)"
    )
    if with_count:
        return base.selectExpr(id_col, f"{arr} AS __arr").selectExpr(
            id_col, "size(__arr) AS n_sh", "explode(__arr) AS sh"
        )
    return base.selectExpr(id_col, f"explode({arr}) AS sh")


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

    The wide expressions (shingle zip_with chain, n_hashes minima) are
    built as SQL strings — ONE parser call each — instead of nested
    Column-API calls: with 64 hashes the py4j round-trips otherwise
    cost ~2.5 s of plan-build per invocation (measured r4), dwarfing
    the execution itself at bench scale.
    """
    base = _spread(df).selectExpr(
        id_col,
        f"transform({_TOKENS_SQL.format(text=text_col)}, t -> xxhash64(t)) AS __th",
    )
    sh = "__th"
    for j in range(1, k_shingle):
        # combine with the j-shifted hash array; zip_with pads the
        # shorter side with null → trimmed to the valid window below
        sh = (
            f"zip_with({sh}, slice(__th, {j + 1}, greatest(size(__th) - {j}, 0)), "
            "(a, b) -> xxhash64(a, b))"
        )
    valid = f"greatest(size(__th) - {k_shingle - 1}, 1)"
    rows = base.selectExpr(id_col, f"explode(slice({sh}, 1, {valid})) AS __h")
    mins = ", ".join(f"min(xxhash64(__h, {i}))" for i in range(n_hashes))
    return rows.groupBy(id_col).agg(F.expr(f"array({mins})").alias("signature"))


def band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, bucket) — the LSH banding step on its own: each
    band's ``rows_per_band`` signature slots hash to one bucket value.
    Shared by :func:`lsh_candidate_pairs` (batch pair mining) and the
    streaming near-dup admission gate
    (:func:`lamindb_spark.streaming.dedup.stream_admit_neardup`),
    which persists these rows as its corpus index — one kernel, one
    bucket semantics."""
    band_structs = ", ".join(
        "struct({b} AS band, xxhash64(concat_ws(',', {cols})) AS bucket)".format(
            b=b,
            cols=", ".join(
                f"signature[{b * rows_per_band + r}]" for r in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    # one SQL parse for the whole banding expression (vs ~n_bands ×
    # rows_per_band py4j calls); inline() explodes straight to columns
    return signatures.selectExpr(id_col, f"inline(array({band_structs}))")


def lsh_admission_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Batch LSH admission summary with CROSS-ENGINE values: a doc is
    ADMITTED iff it shares no band bucket with any lower-id doc — the
    CONSERVATIVE (non-greedy) admission rule, chosen because it is the
    strongest rule a SQL oracle can replay value-for-value (greedy
    chain resolution is inherently sequential). What this certifies for
    the streaming gate in ``streaming/dedup.py`` is the shared kernel —
    signatures, banding, bucket collision semantics — plus this rule;
    the gate's GREEDY refinement (a doc colliding only with a REJECTED
    doc is admitted) deliberately differs on collision chains and is
    pinned by ``tests/test_streaming_dedup.py`` instead.

    Buckets combine each band's portable signature slots with an
    order-insensitive multiplier sum ``Σ sig·37^(slot)`` — exact int64
    arithmetic (sig < 1e9+7, 37³·1e9 ≪ 2^63), reproducible in ANSI
    SQL. Output: one row per source with admitted/total counts and an
    admitted-id checksum.

    r15 shape: "no band shares a bucket with a lower id" is exactly
    "the doc is the MINIMUM of every one of its band buckets" (a
    bucket's min is < id iff a lower id collides there). Every doc
    owns exactly ``ceil(n_hashes / rows_per_band)`` buckets, so the
    BUCKET-MIN table alone decides admission: count, per doc id, the
    buckets it is the min of — admitted iff that count is the band
    count. The r13-r14 form re-joined the corpus-sized ``keyed`` frame
    against the bucket minima, which (a) shuffled the doc table a
    second time and (b) re-ran the whole signature expression chain
    for the second consumer. Now the signature chain feeds exactly one
    consumer; the chain after it is bucket-bounded: per-bucket min →
    per-min-id count → broadcast-sized join back to (id, source).
    Identical admit set by the equivalence above (oracle-pinned).
    """
    sigs = minhash_signatures_portable(df, text_col, id_col, n_hashes)
    keyed = sigs.selectExpr(
        id_col,
        f"CAST(hash_idx DIV {rows_per_band} AS BIGINT) AS band",
        f"sig * CAST(pow(37, hash_idx % {rows_per_band}) AS BIGINT) AS term",
    ).groupBy(id_col, "band").agg(F.sum("term").alias("bucket"))
    n_bands = -(-n_hashes // rows_per_band)
    min_counts = (
        keyed.groupBy("band", "bucket")
        .agg(F.min(id_col).alias("bucket_min"))
        .groupBy("bucket_min")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(F.col("bucket_min").alias(id_col), "__c")
    )
    admit = F.coalesce(F.col("__c") == F.lit(n_bands), F.lit(False))
    return (
        df.select(id_col, "source")
        .join(min_counts, id_col, "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(admit.cast("long")).alias("n_admitted"),
            F.sum(F.when(admit, F.col(id_col)).otherwise(F.lit(0)).cast("long")).alias(
                "admitted_id_sum"
            ),
        )
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
    bands = band_buckets(signatures, id_col, n_bands, rows_per_band)
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

    Shape: doc → distinct shingle HASHES with the per-doc count
    ``n_sh`` carried as a map-side column (see
    :func:`_shingle_hash_rows` ``with_count``), group by shingle into
    a sorted (id, n_sh) struct array (only docs sharing a shingle
    ever meet), expand the C(k,2) pairs with two chained codegen
    generators — each pair carries BOTH set sizes — count per pair,
    then ``|A∩B| / (|A| + |B| - |A∩B|)``. TWO shuffles total (the
    inverted-index groupBy and the pair count); the r1-r4 formulation
    paid a third shuffle (per-doc size table over the full exploded
    rows) plus two joins to attach it — carrying n_sh through the
    expansion deleted all three. Same-session A/B at sf0.1 (r5):
    1.92 vs 2.00 s best-of-4 — locally ~even (floor-dominated); the
    real win is the deleted exploded-rows shuffle at corpus scale.
    ``max_doc_freq`` drops stop-shingles that appear in more than N
    docs — the standard guard against quadratic blowup on ubiquitous
    n-grams at corpus scale — and here it is FREE: a ``size(ids)``
    filter on the already-grouped arrays.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    # NO checkpoint here (r9 review): the exploded shingle table feeds
    # exactly ONE consumer (the groupBy), so materializing it buys no
    # recompute savings — and localCheckpoint truncates lineage to
    # NON-reliable executor storage, so at cluster scale losing one
    # executor mid-job would make the stage unrecoverable instead of
    # recomputable. Plain lineage recomputes shingling on retry, which
    # is exactly what we want.
    size_bytes = _plan_size_bytes(df)
    sh = _shingle_hash_rows(
        df, text_col, id_col, k_shingle, size_bytes=size_bytes, with_count=True
    )
    grouped = sh.groupBy("sh").agg(
        F.sort_array(F.collect_list(F.struct(F.col(id_col), F.col("n_sh")))).alias("ids")
    ).filter(F.size("ids") >= 2)
    if max_doc_freq is not None:
        grouped = grouped.filter(F.size("ids") <= max_doc_freq)
    # C(k,2) pair expansion as two chained generators + a filter: both
    # explodes run inside whole-stage codegen and stream (nothing
    # materializes the n² intermediate), which beats the nested
    # transform/slice struct HOF formulation ~1.4× (SCALE.md ledger).
    pairs = (
        grouped.selectExpr("explode(ids) AS a", "ids")
        .selectExpr("a", "explode(ids) AS b")
        .filter(F.col("a")[id_col] < F.col("b")[id_col])
    )
    return (
        pairs.groupBy(
            F.col("a")[id_col].alias("id_a"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b")[id_col].alias("id_b"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
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

    Shape: the benchmark side collapses to a DISTINCT shingle set (its
    size is vocabulary-bounded and independent of benchmark doc count)
    and is BROADCAST — a benchmark set is orders of magnitude smaller
    than the training corpus. The training side is then a SINGLE pass:
    explode to distinct shingles, broadcast left join against the
    bench set, one per-doc aggregate computing total and shared counts
    together (the earlier two-consumer formulation shingled the corpus
    twice). All training docs are kept (``n_shared = 0`` when clean)
    so the output is a stable per-doc verdict table.

    The bench frame only needs ``text_col`` — a synthetic row id feeds
    the shingler, so benchmark dumps without a document-id column work.

    Output: (doc_id, n_shingles, n_shared, overlap_ratio, contaminated).
    """
    tr = _shingle_hash_rows(train, text_col, id_col, k_shingle)
    bn_src = bench.select(
        F.monotonically_increasing_id().alias("__bid"), F.col(text_col)
    )
    bn = (
        _shingle_hash_rows(bn_src, text_col, "__bid", k_shingle)
        .select("sh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        tr.join(F.broadcast(bn), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_shared"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("overlap_ratio"),
            (F.col("n_shared") > 0).alias("contaminated"),
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


#: one SQL fragment: per-token Horner polynomial hash over character
#: codes — cross-engine deterministic (DuckDB list_reduce equivalent);
#: tokenization (incl. NULL→'' normalization) via _TOKENS_SQL
_TOKEN_POLYHASH_SQL = (
    "transform(" + _TOKENS_SQL.format(text="{text}") + ", "
    "t -> aggregate(split(t, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % {p}))"
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

    Output (id, fingerprint, n_windows).

    ZERO-shuffle shape: everything is a per-row expression (token
    hashes inline, window combination as a zip_with Horner chain,
    array_min). The r3 version hashed distinct tokens once and
    broadcast the vocabulary back (3 shuffles + a broadcast); at web
    scale that broadcast is the vocabulary of the whole corpus —
    unbounded — while re-hashing a token per occurrence is ~6 cheap
    arithmetic ops. Embarrassingly parallel wins here.
    """
    base = _spread(df).selectExpr(
        id_col, _TOKEN_POLYHASH_SQL.format(text=text_col, p=_FP_PRIME) + " AS __th"
    )
    w = "__th"
    for j in range(1, window):
        w = (
            f"zip_with({w}, slice(__th, {j + 1}, greatest(size(__th) - {j}, 0)), "
            f"(a, b) -> (a * 37 + b) % {_FP_PRIME})"
        )
    n_windows = f"greatest(size(__th) - {window - 1}, 1)"
    # short docs (n < window): one window = Horner over ALL tokens
    short = f"aggregate(__th, 0L, (acc, h) -> (acc * 37 + h) % {_FP_PRIME})"
    return base.selectExpr(
        id_col,
        f"CASE WHEN size(__th) < {window} THEN {short} "
        f"ELSE array_min(slice({w}, 1, {n_windows})) END AS fingerprint",
        f"cast({n_windows} AS long) AS n_windows",
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

    Output: (id, hash_idx, sig) exploded long-form.

    ZERO-shuffle shape: token hashes, adjacent-pair shingle hashes and
    the per-permutation minima are all per-row expressions built as
    SQL strings (one parse each). Two r3 formulations were both worse
    — the window-``lead`` variant paid a doc-key shuffle plus two
    window passes (+43%% on the driver bench despite its docstring
    claim, VERDICT r03 #1), and the dictionary-trick variant paid a
    distinct + an unbounded vocabulary broadcast.
    """
    base = _spread(df).selectExpr(
        id_col, _TOKEN_POLYHASH_SQL.format(text=text_col, p=_FP_PRIME) + " AS __th"
    )
    # adjacent-pair shingle hash; a single-token doc contributes its
    # lone token hash (== Horner over the 1-element array)
    shingled = base.selectExpr(
        id_col,
        "CASE WHEN size(__th) < 2 THEN array(__th[0]) "
        "ELSE zip_with(slice(__th, 1, size(__th) - 1), slice(__th, 2, size(__th) - 1), "
        f"(a, b) -> (a * 37 + b) % {_FP_PRIME}) END AS __sh",
    )
    sig_arr = ", ".join(
        f"array_min(transform(__sh, x -> ({2 * i + 1} * x + {12345 * i + 7}) % {_FP_PRIME}))"
        for i in range(n_hashes)
    )
    return shingled.selectExpr(
        id_col, f"posexplode(array({sig_arr})) AS (hash_idx, sig)"
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

    Agg state uses the same 4-counters-per-long packing as the
    production :func:`simhash_signatures` (16-bit saturating fields,
    ``contrib = 2·count_set − n``) — 8 packed sums + a count instead
    of 30 ±1 sums; measured ~25%% faster with identical output. The
    wide pack/unpack expressions are built as SQL strings (one
    ``F.expr`` parse each) rather than incremental Column calls —
    hundreds of py4j round-trips otherwise dominate plan BUILD time
    (~0.9 s → ~0.25 s per invocation).
    """
    # SAME 65535 distinct-token cap as simhash_signatures: each packed
    # long holds four 16-bit counters, so an uncapped giant document
    # would carry a per-bit count past 0xFFFF into the neighboring
    # field (review finding — the production twin sliced, this didn't)
    toks = F.slice(
        F.array_distinct(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), "\\s+")
        ),
        1,
        65535,
    )
    base = _spread(df).select(F.col(id_col), F.explode(toks).alias("__t")).select(
        F.col(id_col), _token_polyhash(F.col("__t")).alias("__h")
    )

    def _pack_sql(k: int) -> str:
        terms = []
        for f in range(4):
            i = 4 * k + f
            if i < n_bits:
                t = f"(shiftright(__h, {i}) & 1)"
                terms.append(t if f == 0 else f"shiftleft({t}, {16 * f})")
        return "sum(" + " + ".join(terms) + f") AS p{k}"

    n_pack = (n_bits + 3) // 4
    sums = base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.expr(_pack_sql(k)) for k in range(n_pack)],
    )
    contribs = ", ".join(
        f"cast((shiftright(p{i // 4}, {16 * (i % 4)}) & 65535)*2 - __n as long)"
        for i in range(n_bits)
    )
    return sums.selectExpr(
        id_col, f"posexplode(array({contribs})) AS (bit_idx, contrib)"
    ).select(F.col(id_col), F.col("bit_idx").cast("long").alias("bit_idx"), "contrib")


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
    aggregation buffers and 4× less shuffled agg state per doc. (At
    bench scale the pack/unpack arithmetic makes this ~24% SLOWER than
    64 plain sums — SCALE.md ledger r5; packing is kept for the
    shuffle-state property, which is what matters at corpus scale.)

    Pack and signature-assembly expressions are SQL strings (one
    parse each) — the r3 Column-API build cost ~2.3 s of py4j
    round-trips per invocation (VERDICT r03 #1).
    """
    base = _spread(df).selectExpr(
        id_col,
        f"explode(slice(array_distinct({_TOKENS_SQL.format(text=text_col)}), 1, 65535)) AS __t",
    ).selectExpr(id_col, f"xxhash64(__t, {seed}) AS __h")

    def _pack_sql(k: int) -> str:
        # bits 4k..4k+3 of the token hash, one per 16-bit field
        terms = [
            f"(shiftright(__h, {4 * k}) & 1)",
            *[
                f"shiftleft((shiftright(__h, {4 * k + f}) & 1), {16 * f})"
                for f in range(1, 4)
            ],
        ]
        return f"sum({' + '.join(terms)}) AS p{k}"

    sums = base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.expr(_pack_sql(k)) for k in range(16)],
    )
    sig = " + ".join(
        f"shiftleft(cast((shiftright(p{i // 4}, {16 * (i % 4)}) & 65535) * 2 > __n AS long), {i})"
        for i in range(64)
    )
    return sums.selectExpr(id_col, f"({sig}) AS simhash")


def simhash64(col: Column, seed: int = 0) -> Column:
    """64-bit SimHash of whitespace tokens, pure bit arithmetic.

    For each bit position, sum +1/-1 over token-hash bits, take sign.

    .. warning:: SMALL-DATA / TEST VARIANT. 64 interpreted
       higher-order aggregates per row defeat codegen — use
       :func:`simhash_signatures` (explode + packed sums) for any real
       corpus; this exists as the independent value oracle its tests
       compare against.
    """
    toks = F.array_distinct(F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), "\\s+"))
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
