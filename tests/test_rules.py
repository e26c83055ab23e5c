"""Training-corpus rule operators: Gopher quality gate, repetition,
sequence packing, URL normalization, and distributed k-means."""

import re

import pytest
from pyspark.sql import functions as F

from lamindb_spark.pipeline.rules import (
    gopher_rules,
    normalize_url,
    pack_sequences,
    top_bigram_frac,
)
from lamindb_spark.pipeline.similarity import kmeans_assign, kmeans_fit
from lamindb_spark.sources.literals import literal_table

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back home "
    "to rest with friends that have seen many good days of sunshine and "
    "calm winds across the wide open field where tall grass moves gently "
    "under a bright warm sky while birds sing their long evening songs"
)


def _rules(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}


def test_gopher_rules_flags(spark):
    rows = [
        (1, GOOD),
        (2, "too few words here"),                     # fails r_words
        (3, " ".join(["supercalifragilistic"] * 60)),  # fails mwl + stop + dup
        (4, GOOD + " " + "#" * 1 + " ##### ### ## # " + "# " * 10),  # symbols
        (5, " ".join(["1234 5678"] * 30)),             # fails alpha + stop
    ]
    got = _rules(spark, rows)
    assert got[1]["passes"] == 1 and got[1]["r_words"] == 1
    assert got[2]["r_words"] == 0 and got[2]["passes"] == 0
    assert got[3]["r_mwl"] == 0 and got[3]["r_stop"] == 0 and got[3]["r_dup"] == 0
    assert got[4]["r_symbol"] == 0
    assert got[5]["r_alpha"] == 0 and got[5]["r_stop"] == 0
    # measurements present and sane
    assert got[1]["n_words"] == len(GOOD.split())
    assert got[2]["n_words"] == 4
    assert 0.0 <= got[1]["dup_word_frac"] < 1.0


def test_gopher_rules_null_and_empty(spark):
    got = _rules(spark, [(1, None), (2, "")])
    for d in (1, 2):
        assert got[d]["passes"] == 0
        assert got[d]["r_words"] == 0


def test_gopher_rules_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "quality gate must be a pure map pass"


def test_top_bigram_frac(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "x y"), (3, "solo")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in top_bigram_frac(df).collect()}
    assert got[1]["top_count"] == 2 and got[1]["n_bigrams"] == 5
    assert abs(got[1]["top_frac"] - 0.4) < 1e-9
    assert got[2]["top_count"] == 1 and got[2]["n_bigrams"] == 1
    assert 3 not in got, "single-token docs have no bigrams"


def test_pack_sequences_semantics(spark):
    # token stream: 3,4,5,6 with budget 8 → starts 0,3,7,12 → seqs 0,0,0,1
    df = spark.createDataFrame(
        [(1, 3), (2, 4), (3, 5), (4, 6)], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "n_tokens", "doc_id", budget=8).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1}


def test_pack_sequences_matches_serial_prefix_sum(spark):
    n = 5000
    df = spark.range(n).selectExpr("id AS doc_id", "(id % 37) + 1 AS n_tokens")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "n_tokens", "doc_id", budget=100).collect()
    }
    cum = 0
    for i in range(n):
        tok = (i % 37) + 1
        assert got[i] == cum // 100, f"doc {i}"
        cum += tok
    assert len(got) == n


def test_pack_sequences_distributed_plan(spark):
    df = spark.range(20000).selectExpr("id AS doc_id", "(id % 11) + 1 AS n_tokens")
    out = pack_sequences(df, "n_tokens", "doc_id", budget=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    sp_children = re.findall(
        r"Exchange SinglePartition[^\n]*\n[^\n]*?\+\- (\w+)", plan
    )
    assert all(c == "HashAggregate" for c in sp_children), (
        f"SinglePartition exchange over data rows: {sp_children}"
    )
    # r14 partition-id pin: the range shuffle lives inside the
    # localCheckpoint; the outer plan shows its scan
    assert "Scan ExistingRDD" in plan, "partition-id pin missing"
    from lamindb_spark.operators import prefix

    stamped = prefix._last_stamped._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in stamped, "data path must use the range shuffle"


def test_normalize_url(spark):
    cases = {
        "HTTPS://WWW.Example.COM/a/b/?q=1#frag": "example.com/a/b",
        "http://example.com/": "example.com",
        "example.com/path/": "example.com/path",
        "ftp://www.files.org/x": "files.org/x",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["url"])
    got = {
        r["url"]: r["norm"]
        for r in df.select("url", normalize_url(F.col("url")).alias("norm")).collect()
    }
    assert got == cases


def test_kmeans_separated_clusters(spark):
    # three tight, well-separated clusters; ids 0,1,2 are the three seeds
    centers = {0: [0.0, 0.0], 1: [10.0, 0.0], 2: [0.0, 10.0]}
    rows, vid = [], 3
    for c, (cx, cy) in centers.items():
        rows.append((c, [cx, cy]))
        for j in range(1, 5):
            rows.append((vid, [cx + 0.1 * j, cy - 0.1 * j]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_fit(df, k=3, iters=3)
    assert len(cents) == 3
    got = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, cents).collect()}
    # every point lands with its seed's cluster
    for c in centers:
        members = [v for v, cell in got.items() if cell == got[c]]
        assert len(members) == 5
    # centroids converged near the true means
    for cell, cv in cents:
        cx, cy = centers[cell]
        assert abs(cv[0] - (cx + 0.25)) < 0.2 and abs(cv[1] - (cy - 0.25)) < 0.2


def test_kmeans_assign_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)], ["vec_id", "embedding"]
    )
    cents = [(0, [0.0, 0.0]), (1, [9.0, 0.0])]
    plan = (
        kmeans_assign(df, cents)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "assignment must be a pure map pass"


def test_random_projection_matches_numpy(spark):
    import numpy as np

    from lamindb_spark.pipeline.similarity import hyperplane_signs, random_projection

    rng = np.random.default_rng(5)
    vecs = rng.uniform(-1, 1, (20, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r["proj"] for r in random_projection(df, dim=16, out_dim=4).collect()}
    signs = np.array(hyperplane_signs(16, 4))
    q = np.round(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    want = q @ signs.T
    for i in range(20):
        assert got[i] == list(want[i]), i
    # zero-shuffle plan
    plan = random_projection(df, 16, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # flat form: scalar proj_0..proj_3 columns, identical values, still zero-shuffle
    flat = random_projection(df, dim=16, out_dim=4, flat=True)
    assert flat.columns == ["vec_id", "proj_0", "proj_1", "proj_2", "proj_3"]
    fgot = {r["vec_id"]: [r[f"proj_{j}"] for j in range(4)] for r in flat.collect()}
    for i in range(20):
        assert fgot[i] == list(want[i]), i
    fplan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in fplan


def test_hash_split_deterministic_and_grouped(spark):
    from lamindb_spark.pipeline.rules import hash_split

    df = spark.createDataFrame(
        [(i, f"src{i % 7}") for i in range(200)], ["doc_id", "source"]
    )
    out = hash_split(df, "source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["split"])
    # leakage guard: one split per source
    assert all(len(s) == 1 for s in by_src.values())
    # stable across invocations
    again = {r["doc_id"]: r["split"] for r in hash_split(df, "source").collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out)
    # different salt → (very likely) different assignment for some key
    salted = {r["source"]: r["split"] for r in hash_split(df, "source", salt="v2").collect()}
    base = {r["source"]: r["split"] for r in out}
    assert salted.keys() == base.keys()
    # weights roughly honored on many keys
    many = spark.createDataFrame([(i, f"k{i}") for i in range(2000)], ["id", "k"])
    frac = {}
    for r in hash_split(many, "k").collect():
        frac[r["split"]] = frac.get(r["split"], 0) + 1
    assert 0.74 < frac["train"] / 2000 < 0.86
    # zero-shuffle plan
    plan = hash_split(df, "source")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_exact_quota_and_determinism(spark):
    from lamindb_spark.pipeline.rules import stratified_sample

    rows = [(i, "a" if i < 30 else "b") for i in range(40)]  # strata 30 + 10
    df = literal_table(spark, rows, ["doc_id", "source"])
    s1 = stratified_sample(df, "source", 0.3)
    got = s1.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"a": 9, "b": 3}  # ceil(30*0.3), ceil(10*0.3)
    # deterministic: second run picks the identical rows
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in stratified_sample(df, "source", 0.3).collect())
    assert ids1 == ids2
    # growing a stratum keeps the earlier picks stable in hash order:
    # the 30%-sample of the first 30 'a' rows is a PREFIX of the hash
    # order, so all of them remain chosen at the same fraction when
    # only the quota boundary moves outward with new rows
    grown = literal_table(
        spark, rows + [(100 + i, "a") for i in range(30)], ["doc_id", "source"]
    )
    ids_grown = {r["doc_id"] for r in stratified_sample(grown, "source", 0.3).collect()}
    # hash order is stable, so every previously-chosen row stays chosen
    # when the stratum grows (the quota boundary only moves outward:
    # 'a' quota 9 -> 18)
    assert set(ids1) <= ids_grown


def test_mix_corpora_quotas_and_stability(spark):
    from lamindb_spark.pipeline.rules import mix_corpora, stratified_sample

    rows = [(i, "a" if i < 20 else "b" if i < 40 else "c") for i in range(60)]
    df = literal_table(spark, rows, ["doc_id", "source"])
    out = mix_corpora(df, "source", {"a": 0.5, "b": 0.25}).collect()
    counts = {}
    for r in out:
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    assert counts == {"a": 10, "b": 5}  # 'c' unlisted → dropped
    # mixture retuning keeps prior picks: the 25% 'b' sample is a
    # subset of the 50% 'b' sample (same hash order, bigger quota)
    small = {r["doc_id"] for r in out if r["source"] == "b"}
    big = {
        r["doc_id"]
        for r in mix_corpora(df, "source", {"b": 0.5}).collect()
    }
    assert small <= big
    # and agrees with stratified_sample at the same fraction
    strat = {
        r["doc_id"]
        for r in stratified_sample(
            df.filter("source = 'b'"), "source", 0.25
        ).collect()
    }
    assert small == strat
