"""Training-data pipeline ops: dedup, similarity, text metrics."""

from pyspark.sql import functions as F

from lamindb_spark.functions.text import fingerprint, lang_id, quality_score, token_count
from lamindb_spark.functions.vectors import cosine, dot, l2_distance
from lamindb_spark.pipeline.dedup import (
    exact_dedup,
    hamming64,
    lsh_candidate_pairs,
    minhash_signatures,
    signature_jaccard,
    simhash64,
)
from lamindb_spark.pipeline.similarity import brute_force_topk, lsh_index, lsh_topk
from lamindb_spark.sources.literals import literal_table


def _docs(spark):
    return literal_table(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "The  Quick Brown Fox jumps over the lazy dog"),  # exact dup of 1 modulo ws/case
            (4, "completely different text about spark engines"),
        ],
        ["doc_id", "text"],
    )


def test_exact_dedup_normalizes(spark):
    got = exact_dedup(_docs(spark))
    groups = {r["keeper_id"]: r["n_dups"] for r in got.collect()}
    assert groups[1] == 2       # docs 1+3 collapse
    assert groups[2] == 1 and groups[4] == 1


def test_minhash_lsh_finds_near_dups(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs, k_shingle=2, n_hashes=32)
    pairs = lsh_candidate_pairs(sigs, n_bands=16, rows_per_band=2)
    scored = signature_jaccard(pairs, sigs)
    best = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in scored.collect()}
    assert best.get((1, 3), 0) == 1.0          # identical after normalization
    assert best.get((1, 2), 0) > 0.5           # near-dup detected
    assert (1, 4) not in best and (2, 4) not in best


def test_lsh_bucket_cap_stays_linear(spark):
    """1k identical docs (a degenerate LSH bucket) must produce O(n)
    candidate pairs — the star fallback — not n(n-1)/2 ≈ 500k
    (VERDICT r01 #2). Connectivity is preserved: the dup group stays
    one connected component rooted at the min id."""
    rows = [(i, "boilerplate header repeated everywhere exactly") for i in range(1000)]
    rows.append((5000, "something else entirely unrelated to anything"))
    docs = literal_table(spark, rows, ["doc_id", "text"])
    sigs = minhash_signatures(docs, k_shingle=2, n_hashes=32)
    pairs = lsh_candidate_pairs(sigs, n_bands=16, rows_per_band=2, max_bucket_size=100)
    got = pairs.collect()
    assert len(got) == 999, f"expected linear star pairs, got {len(got)}"
    assert all(r["id_a"] == 0 for r in got), "star must root at the bucket min id"
    assert all(r["n_shared_bands"] == 16 for r in got)
    # uncapped sanity on a small bucket: full pairs still emitted
    small = lsh_candidate_pairs(sigs, n_bands=16, rows_per_band=2, max_bucket_size=None)
    assert small.filter((F.col("id_a") == 0) & (F.col("id_b") == 2)).count() == 1


def test_star_mode_jaccard_verification(spark):
    """VERDICT r02 #9: a TRUE near-dup pair routed through an oversized
    bucket's star survives signature_jaccard verification with a high
    estimate, while a boilerplate-only co-bucket member scores low —
    the downstream verify step restores the precision star mode trades
    away in n_shared_bands."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(200)]                 # degenerate bucket
    rows.append((900, base + " tail"))                     # true near-dup of the group
    rows.append((901, "completely different content about spark query planning"))
    docs = literal_table(spark, rows, ["doc_id", "text"])
    sigs = minhash_signatures(docs, k_shingle=2, n_hashes=32)
    pairs = lsh_candidate_pairs(sigs, n_bands=16, rows_per_band=2, max_bucket_size=50)
    scored = signature_jaccard(pairs, sigs)
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in scored.collect()}
    # exact duplicates through the star: estimate stays 1.0 (full-signature
    # comparison, NOT the capped n_shared_bands)
    star_pairs = [(a, b) for (a, b) in est if a == 0 and b < 900]
    assert star_pairs and all(est[p] == 1.0 for p in star_pairs)
    # the near-dup that shares buckets with the group: high estimate
    near = [(a, b) for (a, b) in est if b == 900]
    assert near and all(est[p] >= 0.5 for p in near)
    # unrelated doc: never a candidate
    assert not any(901 in p for p in est)


def test_simhash_distance(spark):
    docs = _docs(spark)
    h = docs.select("doc_id", simhash64(F.col("text")).alias("sh"))
    vals = {r["doc_id"]: r["sh"] for r in h.collect()}
    assert vals[1] == vals[3]  # normalization-identical
    d12 = spark.range(1).select(
        hamming64(F.lit(vals[1]), F.lit(vals[2])).alias("d")
    ).first()["d"]
    d14 = spark.range(1).select(
        hamming64(F.lit(vals[1]), F.lit(vals[4])).alias("d")
    ).first()["d"]
    assert d12 < d14  # near-dup closer than unrelated


def test_vector_math(spark):
    df = literal_table(spark, [(1,)], ["id"]).select(
        dot(F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))).alias("d"),
        cosine(F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(1.0), F.lit(0.0))).alias("c"),
        l2_distance(F.array(F.lit(0.0), F.lit(3.0)), F.array(F.lit(4.0), F.lit(0.0))).alias("l"),
    )
    row = df.first()
    assert row["d"] == 11.0 and abs(row["c"] - 1.0) < 1e-12 and row["l"] == 5.0


def test_brute_force_and_lsh_topk(spark):
    vecs = literal_table(
        spark,
        [(1, 1.0, 0.0), (2, 0.9, 0.1), (3, 0.0, 1.0), (4, -1.0, 0.0)],
        ["vec_id", "x", "y"],
    ).select("vec_id", F.array("x", "y").alias("embedding"))
    top = brute_force_topk(vecs, [1.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    # LSH single-probe returns same-bucket neighbors only, query included
    approx = lsh_topk(vecs, [1.0, 0.0], dim=2, k=4, n_bits=4).collect()
    ids = [r["vec_id"] for r in approx]
    assert 1 in ids and 4 not in ids  # opposite vector lands in another bucket


def test_lsh_topk_multiprobe_recall(spark):
    from lamindb_spark.pipeline.similarity import probe_buckets, query_bucket

    vecs = literal_table(
        spark,
        [(1, 1.0, 0.0), (2, 0.9, 0.1), (3, 0.0, 1.0), (4, -1.0, 0.0)],
        ["vec_id", "x", "y"],
    ).select("vec_id", F.array("x", "y").alias("embedding"))
    # probing out to Hamming distance 2 must keep the near neighbors
    exact = [r["vec_id"] for r in brute_force_topk(vecs, [1.0, 0.0], k=2).collect()]
    full = lsh_topk(
        vecs, [1.0, 0.0], dim=2, k=4, n_bits=4, n_probes=1 + 4 + 6
    ).collect()
    assert set(exact) <= {r["vec_id"] for r in full}
    # multi-probe candidate set grows monotonically with n_probes
    b = query_bucket([1.0, 0.0], dim=2, n_bits=4)
    p1, p5 = probe_buckets(b, 4, 1), probe_buckets(b, 4, 5)
    assert p1 == [b] and p5[0] == b and len(set(p5)) == 5
    n1 = lsh_topk(vecs, [1.0, 0.0], dim=2, k=4, n_bits=4, n_probes=1).count()
    n5 = lsh_topk(vecs, [1.0, 0.0], dim=2, k=4, n_bits=4, n_probes=5).count()
    assert n1 <= n5


def test_text_metrics(spark):
    df = literal_table(spark, [(1, "the cat and the hat of a mat")], ["id", "text"])
    row = df.select(
        token_count(F.col("text")).alias("n"),
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
    ).first()
    assert row["n"] == 8 and row["lang"] == "en"
    assert 0.0 <= row["q"] <= 1.0 and len(row["fp"]) == 32
    assert token_count(F.lit("")).__class__  # builds without error
    assert df.select(token_count(F.lit("   "))).first()[0] == 0


def test_ngram_jaccard_exact_pairs(spark):
    from lamindb_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = _docs(spark)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, k_shingle=3, threshold=0.1).collect()
    }
    assert got[(1, 3)] == 1.0  # identical after normalization
    # docs 1/2 share 6 of their 7+7 trigrams → 6/8
    assert abs(got[(1, 2)] - 0.75) < 1e-6
    assert (1, 4) not in got


def test_winnow_fingerprint_shift_tolerant(spark):
    from lamindb_spark.pipeline.dedup import winnow_fingerprint

    docs = literal_table(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            # same content with a prefix — min window hash often survives
            (2, "PREFIX alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally unrelated words here nothing shared at all"),
            (4, "x"),  # shorter than the window → single whole-text window
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["fingerprint"], r["n_windows"]) for r in winnow_fingerprint(docs).collect()}
    assert got[1][1] == 5 and got[4][1] == 1
    assert got[1][0] != got[3][0]
    # determinism: same input → same fingerprint
    again = {r["doc_id"]: r["fingerprint"] for r in winnow_fingerprint(docs).collect()}
    assert again[1] == got[1][0]


def test_simhash_signatures_matches_column_variant(spark):
    from lamindb_spark.pipeline.dedup import simhash_signatures

    docs = _docs(spark)
    df_level = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    col_level = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", simhash64(F.col("text")).alias("sh")).collect()
    }
    assert df_level == col_level


def test_ivf_assign_nearest_centroid(spark):
    from lamindb_spark.pipeline.similarity import ivf_assign

    vecs = literal_table(
        spark,
        [(10, 0.9, 0.1), (11, 0.1, 0.9), (12, 1.0, 0.05)],
        ["vec_id", "x", "y"],
    ).select("vec_id", F.array("x", "y").alias("embedding"))
    cents = literal_table(
        spark, [(0, 1.0, 0.0), (1, 0.0, 1.0)], ["centroid_id", "x", "y"]
    ).select("centroid_id", F.array("x", "y").alias("centroid"))
    got = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(vecs, cents).collect()}
    assert got == {10: 0, 11: 1, 12: 0}


def test_cosine_neardup_pairs_blocked(spark):
    from lamindb_spark.pipeline.similarity import cosine_neardup_pairs

    vecs = literal_table(
        spark,
        [(1, "a", 1.0, 0.0), (2, "a", 0.99, 0.01), (3, "a", -1.0, 0.0), (4, "b", 1.0, 0.0)],
        ["vec_id", "blk", "x", "y"],
    ).select("vec_id", "blk", F.array("x", "y").alias("embedding"))
    got = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(vecs, "blk", 0.9).collect()}
    assert got == {(1, 2)}  # 3 dissimilar; 4 in another block never compared


def test_pca_fit_project_matches_numpy(spark):
    import numpy as np

    from lamindb_spark.pipeline.similarity import pca_fit, pca_project

    rng = np.random.default_rng(13)
    # anisotropic cloud: variance concentrated along two known axes
    base = rng.standard_normal((200, 2)) * np.array([5.0, 2.0])
    mix = np.array([[1.0, 0.0, 0.5, 0.0], [0.0, 1.0, 0.0, 0.25]])
    data = base @ mix + rng.standard_normal((200, 4)) * 0.01
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    means, comps = pca_fit(emb, n_components=2)
    # reference PCA on the driver
    X = data - data.mean(axis=0)
    C = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:2]
    for got, k in zip(comps, order):
        ref = vecs[:, k]
        nz = np.flatnonzero(np.abs(ref) > 1e-12)
        if ref[nz[0]] < 0:
            ref = -ref
        # covariance was rounded to 6dp before eigh → small tolerance
        assert np.allclose(got, ref, atol=1e-3), (got, ref)
    proj = pca_project(emb, means, comps)
    P = np.array(
        [r["proj"] for r in proj.orderBy("vec_id").collect()]
    )
    # variance ordering holds and matches the reference projection
    assert P[:, 0].var() > P[:, 1].var()
    ref_proj = X @ np.array(comps).T
    assert np.allclose(P, ref_proj, atol=1e-3)
    # projection plan is a pure map pass
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0
