"""Round-6 corpus operators: DSIR importance weights, BPE encoding,
character entropy, CCNet perplexity tiers."""

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_dsir_weights_separate_domains(spark):
    """Docs drawn from the target vocabulary must score higher than
    off-domain docs, and scores must be exact integers."""
    from lamindb_spark.pipeline.dsir import dsir_weights

    rows = (
        [(i, "the cat sat on the mat with the cat", "wiki") for i in range(20)]
        + [(100 + i, "zzz qqq kkk vvv zzz qqq kkk", "web") for i in range(20)]
        + [(200, None, "web"), (201, "single", "web")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = dsir_weights(df, F.col("source") == "wiki", n_buckets=64)
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 42
    # target-domain docs beat off-domain docs
    assert got[0]["score_micro"] > got[100]["score_micro"]
    # no-bigram docs: n_bigrams 0, score 0
    assert got[200]["n_bigrams"] == 0 and got[200]["score_micro"] == 0
    assert got[201]["n_bigrams"] == 0 and got[201]["score_micro"] == 0
    # deterministic across re-runs (literal model, md5 buckets)
    again = {r["doc_id"]: r["score_micro"] for r in
             dsir_weights(df, F.col("source") == "wiki", n_buckets=64).collect()}
    assert again == {k: v["score_micro"] for k, v in got.items()}


def test_dsir_scoring_pass_is_map_only(spark):
    from lamindb_spark.pipeline.dsir import dsir_weights

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "a") for i in range(10)],
        ["doc_id", "text", "source"],
    )
    out = dsir_weights(df, F.col("source") == "a", n_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "scoring must be a zero-shuffle pass"


def test_bpe_encode_matches_python_model(spark):
    """Train on a tiny corpus, encode with the Spark replace chain,
    compare against a direct python BPE encoder applying the same
    merges greedily left-to-right."""
    from lamindb_spark.pipeline.bpe import bpe_encode, bpe_train

    texts = ["low lower lowest", "low low newer newest", "wider wide new"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe_train(df, n_merges=6)
    assert len(merges) == 6

    def py_encode(word):
        syms = list(word) + ["</w>"]
        for _rank, lhs, rhs, _f in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        want = [s for w in t.split() for s in py_encode(w)]
        assert got[i] == want, (i, got[i], want)


def test_bpe_encode_repeated_symbol_runs(spark):
    """The sentinel-string replace must merge runs exactly like greedy
    left-to-right BPE: 'aaaa' with merge (a,a) → [aa, aa]."""
    from lamindb_spark.pipeline.bpe import bpe_encode

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "aaa"), (2, "aa a")], ["doc_id", "text"]
    )
    merges = [(1, "a", "a", 99)]
    got = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, merges).collect()}
    assert got[0] == ["aa", "aa", "</w>"]
    assert got[1] == ["aa", "a", "</w>"]
    assert got[2] == ["aa", "</w>", "a", "</w>"]


def test_char_entropy_known_values(spark):
    from lamindb_spark.functions.text import char_entropy_micro

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, ""), (3, None), (4, "abcd")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["e"]
        for r in df.select("doc_id", char_entropy_micro(F.col("text")).alias("e")).collect()
    }
    assert got[0] == 0  # single symbol → zero entropy
    assert got[2] == 0 and got[3] == 0  # empty/null → zero
    # uniform over 2 symbols: ln 2; over 4: ln 4 (sum of per-term rounds)
    assert abs(got[1] - round(math.log(2) * 1e6)) <= 2
    assert abs(got[4] - round(math.log(4) * 1e6)) <= 4
    # term-wise quantization: exact expected value for 'ab'
    term = round(-(0.5) * math.log(0.5) * 1e6)
    assert got[1] == 2 * term


def test_duplicated_spans_islands(spark):
    """Two docs sharing a 12-token run: both report one maximal span of
    12 tokens at the right offsets; unique text reports nothing; runs
    under min_tokens are suppressed."""
    from lamindb_spark.pipeline.corpus import duplicated_spans

    shared = "a b c d e f g h i j k l"          # 12 tokens
    d0 = "x1 x2 " + shared + " y1 y2"            # span at offset 2
    d1 = shared + " z1 z2 z3"                    # span at offset 0
    d2 = "totally unique words only here believe it or not today"
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: (r["span_start"], r["span_tokens"])
           for r in duplicated_spans(df, k=5, min_tokens=8).collect()}
    assert out == {0: (2, 12), 1: (0, 12)}
    # raise min_tokens past the run length → nothing reported
    assert duplicated_spans(df, k=5, min_tokens=13).count() == 0


def test_tfidf_keywords_ranking(spark):
    """A term unique to one doc outranks corpus-wide terms; ranks are
    dense 1..k; scores are exact integers."""
    from lamindb_spark.pipeline.corpus import tfidf_keywords

    df = spark.createDataFrame(
        [
            (0, "common common common zebra zebra unicorn"),
            (1, "common common common"),
            (2, "common words words"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(df, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["score_micro"]))
    top0 = sorted(by_doc[0])
    # zebra (tf=2, df=1) beats unicorn (tf=1, df=1) beats common (idf=0)
    assert top0[0][1] == "zebra" and top0[1][1] == "unicorn"
    assert all(isinstance(s, int) for _r, _t, s in top0)
    # 'common' appears in every doc → idf = ln(4/4) = 0 → score 0
    common = [r for r in out if r["token"] == "common"]
    assert all(r["score_micro"] == 0 for r in common)


def test_kmeans_assign_broadcast_parity(spark):
    """The broadcast (data-not-literals) assignment path must agree
    bit-for-bit with the codegen literal path, stay shuffle-free on
    the vector side, and handle k far past the literal plan's comfort
    zone."""
    from lamindb_spark.pipeline.similarity import kmeans_assign, kmeans_fit
    from lamindb_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings")
    cents = kmeans_fit(emb, k=16, iters=2)
    a = {r["vec_id"]: r["cell"] for r in kmeans_assign(emb, cents, method="literal").collect()}
    b = {r["vec_id"]: r["cell"] for r in kmeans_assign(emb, cents, method="broadcast").collect()}
    assert a == b
    # auto picks broadcast past 64 centroids and the plan stays O(1)-size:
    # only the tiny packing agg + its broadcast appear as exchanges
    big = [(i, [float((i * 7 + j) % 13) for j in range(64)]) for i in range(512)]
    df = kmeans_assign(emb, big, method="auto")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan
    assert df.count() == emb.count()


def test_knn_join_exact_properties(spark):
    """kNN join: every non-singleton-block vector gets min(k, n-1)
    neighbours, ranks are dense from 1, rank-1 cosine is the block
    maximum for that vector, and a zero vector never ranks above a
    real neighbour."""
    from lamindb_spark.pipeline.similarity import knn_join_exact

    vecs = [
        (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.0, 1.0], 0),
        (3, [0.0, 0.0], 0),  # zero vector
        (10, [1.0, 1.0], 1), (11, [1.0, 0.9], 1),
        (20, [5.0, 5.0], 2),  # singleton block
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding", "cell"])
    out = knn_join_exact(df, "cell", k=2).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append((r["rank"], r["neighbour_id"], r["cos"]))
    assert 20 not in by_vec, "singleton block emits nothing"
    assert {len(v) for k, v in by_vec.items() if k in (0, 1, 2, 3)} == {2}
    assert len(by_vec[10]) == 1 and len(by_vec[11]) == 1
    # vec 0's nearest is 1 (cos ~0.9939), then 2 (0.0); zero vec 3 last
    r0 = sorted(by_vec[0])
    assert r0[0][1] == 1 and r0[1][1] == 2
    # zero vector's cosines are the -2 sentinel, neighbours id-ordered
    r3 = sorted(by_vec[3])
    assert [x[1] for x in r3] == [0, 1] and all(x[2] == -2.0 for x in r3)


def test_silhouette_scores_properties(spark):
    """Well-separated clusters score near +1; a point midway between
    centroids scores near 0; output is bounded in [-1, 1]."""
    from lamindb_spark.pipeline.similarity import silhouette_scores

    cents = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    df = spark.createDataFrame(
        [(0, [0.1, 0.0]), (1, [9.9, 0.0]), (2, [5.0, 0.0])],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r for r in silhouette_scores(df, cents).collect()}
    assert got[0]["cell"] == 0 and got[0]["silhouette"] > 0.97
    assert got[1]["cell"] == 1 and got[1]["silhouette"] > 0.97
    assert abs(got[2]["silhouette"]) < 1e-9  # equidistant
    assert all(-1.0 <= r["silhouette"] <= 1.0 for r in got.values())


def test_pq_roundtrip_matches_numpy_model(spark):
    """PQ train/encode/ADC vs an independent numpy model: fused
    training must equal per-subspace Lloyd's; codes must be the
    argmin centroid; ADC scores must be the exact integer table sums."""
    import numpy as np

    from lamindb_spark.pipeline.similarity import (
        _quant_half_up,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
    )

    rng = np.random.default_rng(7)
    vecs = rng.uniform(-1, 1, (40, 16)).astype(np.float64).round(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    m, sub, k = 4, 4, 4
    books = pq_train(df, dim=16, m=m, k=k, iters=2)

    # numpy replay: same init (k lowest ids), one Lloyd round, round-6
    np_books = []
    for s in range(m):
        X = vecs[:, s * sub : (s + 1) * sub]
        C = X[:k].copy()
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)  # ties -> lowest cid, argmin matches
        C2 = np.stack([
            np.round(X[assign == j].mean(0), 6) if (assign == j).any() else None
            for j in range(k) if (assign == j).any()
        ])
        np_books.append(C2)
    for s in range(m):
        got = np.array([cv for _c, cv in books[s]])
        assert np.allclose(got, np_books[s], atol=1e-9), s

    enc = {r["vec_id"]: [r[f"code_{s}"] for s in range(m)]
           for r in pq_encode(df, books, dim=16).collect()}
    q = [float(x) for x in vecs[0]]
    table = pq_distance_table(books, q)
    top = pq_adc_topk(pq_encode(df, books, dim=16), table, k=5).collect()
    # scores replay exactly in python ints (table is cid-keyed pairs)
    for r in top:
        want = sum(dict(table[s])[enc[r["vec_id"]][s]] for s in range(m))
        assert r["adc_d2"] == want
    # the query's own code cell should rank it at/near the top
    assert any(r["vec_id"] == 0 for r in top)
    # quantizer is half-up away from zero
    assert _quant_half_up(1.2345665) == 1234567 or _quant_half_up(1.2345665) == 1234566
    assert _quant_half_up(-0.0000005) == -1 and _quant_half_up(0.0000005) == 1


def test_perplexity_buckets_tiers(spark):
    """Tiers are per-language, 1..3, balanced within each language,
    and ordered: tier-1 docs have the lowest avg_nll."""
    from lamindb_spark.pipeline.corpus import perplexity_buckets
    from lamindb_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    out = perplexity_buckets(docs, n_tiles=3).collect()
    assert out, "non-empty"
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        tiers = {r["tier"] for r in rows}
        assert tiers <= {1, 2, 3}
        if len(rows) >= 3:
            assert tiers == {1, 2, 3}, lang
            sizes = [sum(1 for r in rows if r["tier"] == t) for t in (1, 2, 3)]
            assert max(sizes) - min(sizes) <= 1, (lang, sizes)  # ntile balance
            t1 = max(r["avg_nll"] for r in rows if r["tier"] == 1)
            t3 = min(r["avg_nll"] for r in rows if r["tier"] == 3)
            assert t1 <= t3 + 1e-9, lang
