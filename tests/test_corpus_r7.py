"""Semantic unit tests for the round-7 operators: source_kl,
power-iteration top PC, TextRank word graph."""

from pyspark.sql import functions as F


def test_source_kl_zero_for_identical_distributions(spark):
    """Two sources with the SAME token distribution: every per-token
    log-ratio is ln(1)=0 exactly, so kl_microsum is exactly 0; a
    drifted source scores strictly positive."""
    from lamindb_spark.pipeline.corpus import source_kl

    rows = [
        ("a", "x x y z"),
        ("b", "x x y z"),
        ("c", "q q q q"),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {r["source"]: r for r in source_kl(df).collect()}
    # a and b have identical p_s; corpus differs from both (c drags it)
    assert got["a"]["kl_microsum"] == got["b"]["kl_microsum"] > 0
    assert got["c"]["kl_microsum"] > 0
    assert got["a"]["n_tokens"] == 4
    # identical-to-corpus case: single source => p_s == p_c => exactly 0
    one = spark.createDataFrame([("a", "x y"), ("a", "y x")], ["source", "text"])
    assert source_kl(one).collect()[0]["kl_microsum"] == 0


def test_top_pc_finds_dominant_direction(spark):
    """Anisotropic cloud stretched along axis 2: after 3 power
    iterations the max-|loading| component must be dim 2 (loading
    ±10^6) and the orthogonal axes must be comparatively tiny."""
    from lamindb_spark.pipeline.similarity import power_iteration_top_pc

    rows = []
    for i in range(40):
        spread = (i % 7) - 3  # dominant variance on axis 2
        noise = (i % 3) - 1
        rows.append((i, [0.1 * noise, 0.02 * noise, 1.0 * spread, 0.05 * noise]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pc = dict(power_iteration_top_pc(df, iters=3))
    top_dim = max(pc, key=lambda d: abs(pc[d]))
    assert top_dim == 2
    assert abs(pc[2]) == 1_000_000  # renormalized max component
    assert all(abs(v) < 200_000 for d, v in pc.items() if d != 2)


def test_top_pc_matches_pure_python_replay(spark):
    """The Spark covariance + driver iterations must equal a from-
    scratch python replay of the same integer contract."""
    from lamindb_spark.pipeline.similarity import (
        embedding_covariance_micro,
        power_iteration_top_pc,
    )

    rows = [(i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(4)]) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = dict(power_iteration_top_pc(df, iters=3))

    cov = {(r["i"], r["j"]): r["cov_micro"] for r in embedding_covariance_micro(df).collect()}
    v = [1_000_000] * 4
    for _ in range(3):
        a = [sum(cov[(i, j)] * v[j] for j in range(4)) for i in range(4)]
        b = max(abs(x) for x in a)
        if b == 0:
            break
        v = [(1 if x >= 0 else -1) * (abs(x) * 1_000_000 // b) for x in a]
    assert got == {i: v[i] for i in range(4)}


def test_word_rank_graph_and_hub(spark):
    """Edges: filtered-sequence adjacency, undirected, distinct, no
    self-loops, short/non-alpha tokens dropped BEFORE adjacency; the
    hub word co-occurring with everything ranks first."""
    from lamindb_spark.operators.graph import pagerank
    from lamindb_spark.pipeline.corpus import word_cooccurrence_edges

    rows = [
        (1, "hub alpha hub beta hub gamma"),
        (2, "alpha of beta"),  # 'of' filtered -> alpha~beta adjacency
        (3, "x y"),  # all dropped -> no edges
        (4, "solo"),  # single token -> no pairs
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    edges = {(r["src"], r["dst"]) for r in word_cooccurrence_edges(df, "text").collect()}
    assert ("alpha", "beta") in edges and ("beta", "alpha") in edges  # filtered adjacency
    assert ("hub", "alpha") in edges and ("gamma", "hub") in edges
    assert not any(s == d for s, d in edges)
    assert not any("of" in e or "x" in e or "y" in e or "solo" in e for e in edges)
    ranks = {r["node"]: r["rank"] for r in pagerank(word_cooccurrence_edges(df, "text"), iters=5).collect()}
    assert max(ranks, key=ranks.get) == "hub"
