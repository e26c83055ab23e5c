"""Core operators: windows, pivot, closure, eav, joins, search."""

from pyspark.sql import functions as F

from lamindb_spark.operators.eav import entities_with_feature
from lamindb_spark.operators.graph import closure
from lamindb_spark.operators.joins import anti_join, fk_join, semi_join
from lamindb_spark.operators.pivot import to_wide
from lamindb_spark.operators.search import search
from lamindb_spark.operators.windows import latest_per_key, mark_latest, max_version_in_family
from lamindb_spark.sources.literals import literal_table


def test_mark_latest_per_branch(spark):
    df = literal_table(
        spark,
        [("s1", 1, 1, 10), ("s1", 1, 2, 20), ("s1", 2, 3, 5), ("s2", 1, 4, 1)],
        ["stem", "branch", "id", "created"],
    )
    got = mark_latest(df, ["stem", "branch"], "created", tiebreak_col="id")
    heads = sorted(r["id"] for r in got.filter("is_latest").collect())
    assert heads == [2, 3, 4]  # one head per (stem, branch)


def test_latest_per_key_tiebreak(spark):
    df = literal_table(spark, [(1, 5, "a"), (1, 5, "b"), (2, 3, "c")], ["k", "t", "v"])
    got = {r["k"]: r["v"] for r in latest_per_key(df, ["k"], "t", tiebreak_col="v").collect()}
    assert got == {1: "b", 2: "c"}


def test_max_version_in_family(spark):
    df = literal_table(spark, [("s1", "0001"), ("s1", "0003"), ("s2", "0002")], ["stem", "v"])
    got = {r["stem"]: r["max_version"] for r in
           max_version_in_family(df, ["stem"], "v").collect()}
    assert got == {"s1": "0003", "s2": "0002"}


def test_joins(spark):
    left = literal_table(spark, [(1, 10), (2, 20), (3, None)], ["id", "dim_id"])
    dim = literal_table(spark, [(10, "x"), (20, "y")], ["id", "name"])
    j = fk_join(left, dim, "dim_id", "id", prefix="dim")
    assert sorted(r["dim__name"] for r in j.collect()) == ["x", "y"]
    keys = literal_table(spark, [(1,), (3,)], ["id"])
    assert sorted(r["id"] for r in semi_join(left, keys, "id").collect()) == [1, 3]
    assert [r["id"] for r in anti_join(left, keys, "id").collect()] == [2]


def test_pivot_to_wide_with_casts(spark):
    entities = literal_table(spark, [(1, "a1"), (2, "a2")], ["id", "name"])
    ann = literal_table(
        spark,
        [(1, "temp", "21.5"), (1, "species", "human"), (2, "temp", "36.0")],
        ["id", "feature", "value"],
    )
    wide = to_wide(
        entities, ann, "id", "feature", "value",
        features=["temp", "species"], dtype_casts={"temp": "double"},
    )
    rows = {r["id"]: r for r in wide.collect()}
    assert rows[1]["temp"] == 21.5 and rows[1]["species"] == "human"
    assert rows[2]["species"] is None
    assert dict(wide.dtypes)["temp"] == "double"


def test_closure_diamond(spark):
    #    1
    #   / \
    #  2   3     (diamond: both reach 4)
    #   \ /
    #    4
    edges = literal_table(
        spark, [(4, 2), (4, 3), (2, 1), (3, 1)], ["child_id", "parent_id"]
    )
    seeds = literal_table(spark, [(4,)], ["id"])
    got = {r["id"]: r["depth"] for r in
           closure(edges, seeds, include_depth=True).collect()}
    assert got == {2: 1, 3: 1, 1: 2}  # min depth, visited once


def test_closure_wide_frontier_broadcast_join(spark):
    """VERDICT r02 #4: above ISIN_LITERAL_LIMIT a hop must not embed
    the frontier as literals — it broadcast-joins a frontier DF — and
    the closure result must be identical either way."""
    from lamindb_spark.operators import graph as G

    # star-out: 1 → 2..2501 (wide hop), then 2..2501 → 9999 (converge)
    n = 2_500
    edges = spark.createDataFrame(
        [(1, i) for i in range(2, n + 2)] + [(i, 9_999) for i in range(2, n + 2)],
        "child_id long, parent_id long",
    )
    seeds = literal_table(spark, [(1,)], ["id"])
    got = {r["id"]: r["depth"] for r in
           closure(edges, seeds, src="child_id", dst="parent_id",
                   include_depth=True).collect()}
    assert got[9_999] == 2 and len(got) == n + 1

    # plan shape: wide frontier → BroadcastHashJoin, zero isin literals;
    # narrow frontier → pushed isin filter, no join.
    e = edges.select(F.col("child_id").alias("__s"), F.col("parent_id").alias("__d"))
    wide_plan = G._hop_scan(e, list(range(2, n + 2)))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in wide_plan
    assert "2501" not in wide_plan, "frontier ids leaked into the plan as literals"
    narrow_plan = G._hop_scan(e, [1, 2, 3])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in narrow_plan


def test_connected_components(spark):
    from lamindb_spark.operators.graph import connected_components

    # chain 1-2-3-4-5 (diameter 4, needs multiple propagation rounds),
    # pair 10-11, isolated self-loop style single edge 20-20
    edges = literal_table(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 20)],
        ["id_a", "id_b"],
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_lsh_composition(spark):
    """Pairs from LSH → groups: every member of an exact-dup cluster
    lands in one component rooted at the min id (star cap included)."""
    from lamindb_spark.operators.graph import connected_components
    from lamindb_spark.pipeline.dedup import lsh_candidate_pairs, minhash_signatures

    rows = [(i, "same text everywhere always repeated") for i in range(30)]
    rows += [(100, "one totally unrelated document right here")]
    docs = literal_table(spark, rows, ["doc_id", "text"])
    sigs = minhash_signatures(docs, k_shingle=2, n_hashes=32)
    pairs = lsh_candidate_pairs(sigs, n_bands=16, rows_per_band=2, max_bucket_size=10)
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0}  # one group, keeper = min id
    assert len(comp) == 30  # the unrelated doc never entered the graph


def test_eav_entity_selection(spark):
    entities = literal_table(spark, [(1,), (2,), (3,)], ["id"])
    ann = literal_table(
        spark, [(1, "color", "red"), (2, "color", "blue")], ["id", "feature", "value"]
    )
    pred = (F.col("feature") == "color") & (F.col("value") == "red")
    assert [r["id"] for r in entities_with_feature(entities, ann, "id", pred).collect()] == [1]
    assert sorted(
        r["id"] for r in entities_with_feature(entities, ann, "id", pred, negate=True).collect()
    ) == [2, 3]


def test_search_rank_ordering(spark):
    df = literal_table(
        spark,
        [
            (1, "alpha"),                 # exact match
            (2, "alpha particle"),        # left-anchored phrase
            (3, "the alpha particle"),    # interior phrase
            (4, "alphabet"),              # substring only
            (5, "beta"),                  # no match
        ],
        ["id", "name"],
    )
    got = search(df, "alpha", ["name"]).select("id", "rank").collect()
    ids = [r["id"] for r in got]
    assert ids[0] == 1 and set(ids) == {1, 2, 3, 4}
    ranks = {r["id"]: r["rank"] for r in got}
    assert ranks[1] > ranks[2] > ranks[3] > ranks[4]


def test_creates_cycle(spark):
    from lamindb_spark.operators.graph import creates_cycle

    edges = spark.createDataFrame(
        [(2, 1), (3, 2)], "child_id long, parent_id long"
    )  # 3 → 2 → 1
    assert creates_cycle(edges, 1, 3)   # 1 → 3 closes the loop
    assert creates_cycle(edges, 5, 5)   # self-edge
    assert not creates_cycle(edges, 4, 1)
    assert not creates_cycle(edges, 1, 4)


def test_filtered_left_join_keeps_left_rows(spark):
    from pyspark.sql import functions as F

    from lamindb_spark.operators.joins import filtered_left_join

    ents = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    ann = spark.createDataFrame(
        [(1, 1, "x"), (2, -1, "trash")], "eid long, branch long, v string"
    )
    out = filtered_left_join(ents, ann, "id", "eid", F.col("branch") == 1)
    got = {r["id"]: r["v"] for r in out.collect()}
    # entity 2's only annotation fails the condition → row kept, value null
    assert got == {1: "x", 2: None, 3: None}


def test_feature_isnull_presence_absence(spark):
    from pyspark.sql import functions as F

    from lamindb_spark.operators.eav import feature_isnull

    ents = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    ann = spark.createDataFrame(
        [(1, "species", "human"), (2, "tissue", "lung")],
        "id long, feature string, value string",
    )
    pred = F.col("feature") == "species"
    absent = {r["id"] for r in feature_isnull(ents, ann, "id", pred, isnull=True).collect()}
    present = {r["id"] for r in feature_isnull(ents, ann, "id", pred, isnull=False).collect()}
    assert absent == {2, 3} and present == {1}


def test_pagerank_hand_computed_iteration(spark):
    from lamindb_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=1).collect()}
    # N=3, outdeg 1 each, r0 = round(1/3) = 0.333333
    # r(3) = 0.05 + 0.85*(0.333333*2) = 0.616666 (round-6)
    # r(1) = 0.05 + 0.85*0.333333   = 0.333333
    # r(2) = 0.05 (no in-edges)
    assert out[3] == 0.616666
    assert out[1] == 0.333333
    assert out[2] == 0.05
    # more iterations keep the hub ordering
    out5 = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert out5[3] > out5[1] > out5[2]


def test_pagerank_local_path_bit_identical_to_distributed(spark):
    """r12 driver-local fast path (under-threshold graphs): the numpy
    iteration must reproduce the distributed loop's round-6 ranks
    EXACTLY — same HALF_UP rounding as Spark's F.round (Decimal on
    the .5 ambiguity band), dangling mass not redistributed."""
    from lamindb_spark.operators.graph import pagerank

    # star + chain + dangling sink + a 20000-node-style teleport case
    rows = (
        [(f"h", f"s{i}") for i in range(50)]
        + [(f"s{i}", f"s{i+1}") for i in range(49)]
        + [("a", "b"), ("b", "c"), ("c", "a"), ("x", "dangling")]
    )
    edges = spark.createDataFrame(rows, "src string, dst string")
    loc = {
        (r["node"], r["rank"])
        for r in pagerank(edges, iters=5).collect()
    }
    dist = {
        (r["node"], r["rank"])
        for r in pagerank(edges, iters=5, local=False).collect()
    }
    assert loc == dist


def test_round_half_up_matches_spark_round(spark):
    """The local path's rounding on adversarial .5-boundary values ==
    Spark F.round (BigDecimal.valueOf HALF_UP semantics)."""
    import numpy as np
    from pyspark.sql import functions as F

    from lamindb_spark.operators.graph import _round_half_up

    vals = [
        7.5e-06, 6.5e-06, 8.5e-06, 1.5e-06, 2.5e-06,  # exact midpoints
        0.1499999 / 20000, 0.15 / 20000,              # teleport shapes
        1.0000005, 0.9999995, 0.12345649999, 0.1234565,
    ]
    got = _round_half_up(np.array(vals), 6).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    want = [r["r"] for r in df.select(F.round("v", 6).alias("r")).collect()]
    assert got == want
