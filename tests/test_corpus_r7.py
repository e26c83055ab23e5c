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


def test_ivfpq_index_prunes_files_and_matches_bruteforce(spark, tmp_path):
    """The persisted IVF-PQ layout: (a) the probed-cell predicate lands
    in PartitionFilters and only the nprobe cells' files are read
    (scan metrics); (b) results equal the unpersisted ann_ivfpq
    composition (filter + encode + ADC) exactly."""
    from lamindb_spark.pipeline.similarity import (
        _argmin_cell,
        ivfpq_build_index,
        ivfpq_topk,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
        probe_cells,
    )
    from lamindb_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    qvec = next(v for c, v in cents if c == 0)
    books = pq_train(emb, dim=64, m=4, k=8, iters=2)
    path = str(tmp_path / "ivfpq")
    ivfpq_build_index(emb, cents, books, path, dim=64)

    out = ivfpq_topk(spark, path, cents, books, qvec, k=10, nprobe=2)
    rows = [(r["vec_id"], r["adc_d2"]) for r in out.collect()]

    # executed-scan metrics prove FILE-level pruning (inputFiles() lists
    # the whole relation, so the proof must come from the scan node)
    import os

    probes = set(probe_cells(cents, qvec, 2))
    n_cells = len(
        [d for d in os.listdir(path) if d.startswith("centroid_id=")]
    )
    assert n_cells >= 4, "fixture produced several cells"
    qe = out._jdf.queryExecution()
    leaves = qe.executedPlan().collectLeaves()
    scans = [
        leaves.apply(i)
        for i in range(leaves.length())
        if "FileSourceScan" in leaves.apply(i).getClass().getSimpleName()
    ]
    assert len(scans) == 1
    scan_str = scans[0].toString()
    assert "PartitionFilters" in scan_str and "centroid_id" in scan_str.split(
        "PartitionFilters", 1
    )[1][:120]
    assert int(scans[0].metrics().apply("numPartitions").value()) == 2, (
        "scan did not prune to nprobe cells"
    )

    # parity with the unpersisted composition
    cand = emb.filter(_argmin_cell(F.col("embedding"), cents).isin(list(probes)))
    want = [
        (r["vec_id"], r["adc_d2"])
        for r in pq_adc_topk(
            pq_encode(cand, books, dim=64), pq_distance_table(books, qvec), k=10
        ).collect()
    ]
    assert rows == want


def test_sq8_quantization_properties(spark):
    """SQ8: codes lie in 0..255 with the extremes hit exactly, the
    query's own vector scores 0, and the integer score formula replays
    in pure python."""
    from lamindb_spark.pipeline.similarity import (
        _quant_half_up,
        _sq8_code,
        sq8_topk,
        sq8_train,
    )

    rows = [
        (0, [0.0, 1.0]),
        (1, [1.0, 0.0]),
        (2, [0.5, 0.5]),
        (3, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bounds = sq8_train(df)
    assert bounds == [(0, 1_000_000), (0, 1_000_000)]
    assert _sq8_code(0, 0, 1_000_000) == 0
    assert _sq8_code(1_000_000, 0, 1_000_000) == 255
    out = {r["vec_id"]: r["sq8_d2"] for r in sq8_topk(df, bounds, [0.0, 1.0], k=4).collect()}
    assert out[0] == 0, "query's own vector at distance 0"
    # python replay of the documented integer formula
    def score(vec, q):
        s = 0
        for i, (lo, hi) in enumerate(bounds):
            w = hi - lo
            if w == 0:
                continue
            c = ((_quant_half_up(vec[i]) - lo) * 255) // w
            qc = ((_quant_half_up(q[i]) - lo) * 255) // w
            s += ((abs(c - qc) * w) // 1000) ** 2
        return s
    for vid, vec in rows:
        assert out[vid] == score(vec, [0.0, 1.0]), vid
    # constant dimension contributes 0, not a crash
    dfc = spark.createDataFrame([(0, [1.0, 5.0]), (1, [1.0, 7.0])], ["vec_id", "embedding"])
    b2 = sq8_train(dfc)
    assert b2[0] == (1_000_000, 1_000_000)
    got = {r["vec_id"]: r["sq8_d2"] for r in sq8_topk(dfc, b2, [1.0, 5.0], k=2).collect()}
    assert got[0] == 0 and got[1] > 0


def test_residual_ivfpq_matches_numpy_and_improves_on_raw(spark, tmp_path):
    """Residual IVF-PQ: (a) ADC scores equal a from-scratch numpy
    replay of the same integer contract (residual train, encode,
    per-cell tables); (b) the query's own vector ranks first; (c) on a
    clustered fixture the residual quantization error is strictly
    smaller than raw-vector PQ's — the reason IVF-ADC encodes
    residuals."""
    import numpy as np

    from lamindb_spark.pipeline.similarity import (
        _quant_half_up,
        ivfpq_residual_build_index,
        ivfpq_residual_topk,
        probe_cells,
    )

    rng = np.random.default_rng(11)
    # two tight clusters far apart: raw PQ wastes range on the offset
    centers = np.array([[0.0] * 8, [10.0] * 8])
    vecs = np.concatenate(
        [centers[i % 2] + rng.normal(0, 0.05, 8).round(4) for i in range(30)]
    ).reshape(30, 8)
    vecs[0] = centers[0]
    vecs[1] = centers[1]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    cents = [(0, list(map(float, vecs[0]))), (1, list(map(float, vecs[1])))]
    path = str(tmp_path / "rivfpq")
    books = ivfpq_residual_build_index(
        df, cents, path, dim=8, m=2, k=4, iters=2
    )
    q = [float(x) for x in vecs[0]]
    out = ivfpq_residual_topk(
        spark, path, cents, books, q, k=5, nprobe=1
    ).collect()
    assert out[0]["vec_id"] == 0, "query's own vector first"
    # NOTE: own-vector ADC is the quantization error of the zero
    # residual (distance to the nearest residual CENTROID), not 0

    # numpy replay: assign -> residual -> codes -> per-cell table sums
    def d2(a, b):
        return float(((np.asarray(a) - np.asarray(b)) ** 2).sum())

    assign = [0 if d2(v, cents[0][1]) <= d2(v, cents[1][1]) else 1 for v in vecs]
    probes = probe_cells(cents, q, 1)
    cand = [i for i in range(30) if assign[i] in probes]
    books_np = [[(cid, np.asarray(cv)) for cid, cv in b] for b in books]
    scores = {}
    for i in cand:
        res = vecs[i] - np.asarray(cents[assign[i]][1])
        s = 0
        q_res = np.asarray(q) - np.asarray(cents[assign[i]][1])
        for sub in range(2):
            lo, hi = sub * 4, (sub + 1) * 4
            codes = books_np[sub]
            best = min(
                codes, key=lambda c: (d2(res[lo:hi], c[1]), c[0])
            )
            qq = [_quant_half_up(x) for x in q_res[lo:hi]]
            cc = [_quant_half_up(x) for x in best[1]]
            s += sum((a - b) * (a - b) for a, b in zip(qq, cc))
        scores[i] = s
    want = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    got = [(r["vec_id"], r["adc_d2"]) for r in out]
    assert got == want

    # (c) residual quantization reconstructs better than raw PQ
    from lamindb_spark.pipeline.similarity import pq_encode, pq_train

    raw_books = pq_train(df, dim=8, m=2, k=4, iters=2)
    raw_enc = {r["vec_id"]: (r["code_0"], r["code_1"]) for r in pq_encode(df, raw_books, dim=8).collect()}
    res_df = spark.createDataFrame(
        [(i, [float(x) for x in (vecs[i] - np.asarray(cents[assign[i]][1]))]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    res_enc = {r["vec_id"]: (r["code_0"], r["code_1"]) for r in pq_encode(res_df, books, dim=8).collect()}

    def recon_err(i, enc_map, book_set, base):
        err = 0.0
        for sub in range(2):
            lo, hi = sub * 4, (sub + 1) * 4
            cv = dict((c, v) for c, v in book_set[sub])[enc_map[i][sub]]
            target = vecs[i][lo:hi] - (np.asarray(base(i))[lo:hi])
            err += d2(target, cv)
        return err

    raw_err = sum(recon_err(i, raw_enc, raw_books, lambda i: [0.0] * 8) for i in range(30))
    res_err = sum(
        recon_err(i, res_enc, books, lambda i: cents[assign[i]][1]) for i in range(30)
    )
    # strictly better, not dramatically: k-means PQ codebooks also
    # capture the bimodal structure at this k; the residual win grows
    # with cluster count vs codebook size
    assert res_err < raw_err, (res_err, raw_err)
