"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one or more operators from
SURVEY.md §2 through the ``lamindb_spark`` engine; ``oracle_sql()``
holds the DuckDB-equivalent ANSI SQL. Column names and types are
aligned on both sides (driver sorts columns by name and hash-compares
values).

Determinism rules used throughout:
- money/value doubles are exact multiples of 0.01 in the testdata, so
  aggregates use integer cents (``round(x*100)::bigint``) — exact,
  order-insensitive, identical in both engines;
- every top-k has a unique tiebreak column;
- timestamps are compared as formatted strings (µs-truncated
  identically by both readers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lamindb_spark.curation.validate import standardize_values, validate_values
from lamindb_spark.functions.text import lang_id, marker_hits
from lamindb_spark.functions.vectors import cosine
from lamindb_spark.operators.eav import entities_with_feature
from lamindb_spark.operators.filters import Q, compile_filters
from lamindb_spark.operators.graph import closure
from lamindb_spark.operators.joins import anti_join, fk_join, semi_join
from lamindb_spark.operators.search import search
from lamindb_spark.operators.windows import latest_per_key
from lamindb_spark.pipeline.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    signature_jaccard,
    simhash64,
)
from lamindb_spark.sources.literals import literal_table
from lamindb_spark.sources.readers import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def _cents(col):
    return F.round(col * 100).cast("long")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: star-schema revenue per nation (broadcast dims, one
    fact shuffle) on sf0.001."""
    return _q_star_revenue(spark, SF_SMOKE)


# ---------------------------------------------------------------- queries

def _q_filter_lookups(spark, sf):
    """F1/F2/F4: django-lookup kwargs + Q OR-tree → Column predicate."""
    li = load_table(spark, sf, "lineitem")
    import datetime

    pred = compile_filters(
        Q(l_returnflag="R") | Q(l_returnflag="A"),
        l_quantity__gte=30,
        l_shipdate__lt=datetime.datetime(1996, 1, 1),
        l_linestatus__iexact="f",
    )
    return li.filter(pred).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        _cents(F.col("l_extendedprice")).alias("price_cents"),
    )


def _q_q_objects(spark, sf):
    """F2: nested boolean algebra incl. negation."""
    c = load_table(spark, sf, "customer")
    pred = compile_filters(
        (Q(c_mktsegment="BUILDING") | Q(c_acctbal__gt=9000)) & ~Q(c_nationkey__in=[0, 1, 2])
    )
    return c.filter(pred).select(
        "c_custkey", "c_name", "c_mktsegment", _cents(F.col("c_acctbal")).alias("acctbal_cents")
    )


def _q_tpch_q1(spark, sf):
    """A1-A4 aggregate suite (TPC-H Q1 shape): partial (map-side)
    aggregation + one shuffle on the 4-group key."""
    li = load_table(spark, sf, "lineitem")
    disc_cents = F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _cents(F.sum("l_extendedprice")).alias("sum_base_cents"),
            F.sum(disc_cents).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
    )


def _q_star_revenue(spark, sf):
    """J1 FK-chain joins: fact lineitem joins broadcast dims; revenue
    per nation in ASIA."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    dim = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    fact = li.join(
        F.broadcast(o.select("o_orderkey", "o_custkey")), li.l_orderkey == F.col("o_orderkey")
    )
    joined = fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey)
    rev = F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100).cast("long")
    return joined.groupBy("n_name").agg(
        F.sum(rev).alias("revenue_cents"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


def _q_semi_join(spark, sf):
    """J3: customers having ≥1 urgent high-value order."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    big = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (_cents(F.col("o_totalprice")) > 30000000)
    ).select(F.col("o_custkey").alias("c_custkey"))
    return semi_join(c, big, "c_custkey").select(
        "c_custkey", "c_name", _cents(F.col("c_acctbal")).alias("acctbal_cents")
    )


def _q_anti_join(spark, sf):
    """J4: parts never shipped in quantity ≥ 48."""
    p = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem")
    hi = li.filter(F.col("l_quantity") >= 48).select(F.col("l_partkey").alias("p_partkey"))
    return anti_join(p, hi, "p_partkey").select("p_partkey", "p_name", "p_brand")


def _q_distinct(spark, sf):
    """A2: distinct pairs."""
    c = load_table(spark, sf, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


def _q_topk(spark, sf):
    """O4: top-25 orders by value (TakeOrderedAndProject, no full sort)."""
    o = load_table(spark, sf, "orders")
    return (
        o.select("o_orderkey", "o_custkey", _cents(F.col("o_totalprice")).alias("totalprice_cents"))
        .orderBy(F.desc("totalprice_cents"), F.desc("o_orderkey"))
        .limit(25)
    )


def _q_latest_event(spark, sf):
    """W1/W2: latest row per key via row_number window."""
    e = load_table(spark, sf, "events")
    latest = latest_per_key(e, ["user_id"], "ts", tiebreak_col="event_id")
    return latest.select(
        "user_id", "event_id", "event_type", _cents(F.col("value")).alias("value_cents")
    )


def _q_search(spark, sf):
    """§2.9 weighted-rank text search, deterministic top-k."""
    d = load_table(spark, sf, "documents")
    out = search(d, "spark", fields=["text"], limit=None)
    return (
        out.orderBy(F.desc("rank"), F.asc("doc_id"))
        .limit(30)
        .select("doc_id", "rank")
    )


def _q_pivot_events(spark, sf):
    """§2.10 EAV pivot: long (user, event_type, value) → wide."""
    e = load_table(spark, sf, "events")
    ann = e.select(
        F.col("user_id"), F.col("event_type"), _cents(F.col("value")).alias("value_cents")
    )
    return (
        ann.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.sum("value_cents"))
    )


def _q_json_extract(spark, sf):
    """F8/X6: typed predicate on JSON values."""
    e = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
        .withColumn("avg_k", F.col("sum_k") / F.col("n"))
    )


def _q_validate(spark, sf):
    """V1: validate document langs against a label registry."""
    d = load_table(spark, sf, "documents")
    registry = literal_table(spark, [("en",), ("fr",), ("de",), ("es",)], ["name"])
    values = d.select(F.col("lang").alias("value")).distinct()
    return validate_values(values, registry, "value", "name")


def _q_standardize(spark, sf):
    """V3: synonym → canonical mapping via exploded synonym table."""
    d = load_table(spark, sf, "documents")
    registry = literal_table(
        spark,
        [
            ("english", "en|eng"),
            ("spanish", "es"),
            ("french", "fr|fra"),
            ("german", "de|deu"),
        ],
        ["name", "synonyms"],
    )
    out = standardize_values(d.select("doc_id", "lang"), registry, "lang", "name", "synonyms")
    return out.select("doc_id", "lang", "standardized")


def _q_closure(spark, sf):
    """G1/G2: iterative ancestor closure over a derived part hierarchy
    (child k → parent k//2)."""
    p = load_table(spark, sf, "part")
    edges = p.filter(F.col("p_partkey") >= 2).select(
        F.col("p_partkey").alias("child_id"),
        F.floor(F.col("p_partkey") / 2).cast("long").alias("parent_id"),
    )
    seeds = p.filter(F.col("p_partkey").isin([150, 151, 152, 153])).select(
        F.col("p_partkey").alias("id")
    )
    return closure(
        edges, seeds, src="child_id", dst="parent_id", id_col="id", include_depth=True
    )


def _q_version_latest(spark, sf):
    """W1/A6 versioning semantics: one head per family (customer ×
    latest order)."""
    o = load_table(spark, sf, "orders")
    latest = latest_per_key(o, ["o_custkey"], "o_orderdate", tiebreak_col="o_orderkey")
    return latest.select(
        "o_custkey", "o_orderkey", _cents(F.col("o_totalprice")).alias("totalprice_cents")
    )


def _q_dedup_exact(spark, sf):
    """Pipeline: exact content dedup via normalized md5 (hash-groupBy)."""
    d = load_table(spark, sf, "documents")
    return exact_dedup(d, "text", "doc_id")


def _q_minhash_pairs(spark, sf):
    """Pipeline: MinHash+LSH near-dup candidate pairs (no SQL oracle —
    xxhash64 signatures are Spark-specific; rows-only check)."""
    d = load_table(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sigs = minhash_signatures(d, "text", "doc_id", k_shingle=2, n_hashes=32).localCheckpoint(eager=True)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_bands=16, rows_per_band=2)
    return signature_jaccard(pairs, sigs, "doc_id").filter(F.col("est_jaccard") >= 0.5)


def _q_simhash(spark, sf):
    """Pipeline: 64-bit SimHash fingerprints (rows-only check)."""
    d = load_table(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return d.select("doc_id", simhash64(F.col("text")).alias("simhash"))


def _q_knn(spark, sf):
    """Pipeline: brute-force cosine top-k against a fixed query vector."""
    emb = load_table(spark, sf, "embeddings").withColumn(
        "vec", F.col("embedding").cast("array<double>")
    )
    qvec = emb.filter(F.col("vec_id") == 0).select("vec").head()[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        emb.select("vec_id", F.round(cosine(F.col("vec"), q), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(20)
    )


def _q_token_stats(spark, sf):
    """Pipeline text analysis: token counts + density metrics."""
    d = load_table(spark, sf, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), "\\s+")).cast("long")
    nchars = F.length("text").cast("long")
    nonspace = F.length(F.regexp_replace(F.col("text"), "\\s", "")).cast("long")
    return d.select(
        "doc_id",
        toks.alias("n_tokens"),
        nchars.alias("n_chars_calc"),
        F.round(nonspace / toks, 6).alias("mean_tok_len"),
    )


def _q_lang_id(spark, sf):
    """Pipeline: marker-stopword language identification."""
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        "lang",
        lang_id(F.col("text")).alias("pred_lang"),
        marker_hits(F.col("text"), "en").alias("hits_en"),
    )


def _q_hourly_events(spark, sf):
    """§2.14 streaming-equivalent batch: tumbling 1h windows (the same
    plan Structured Streaming runs incrementally; see
    lamindb_spark.streaming)."""
    e = load_table(spark, sf, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        e.groupBy(hour.alias("hour_ts"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_cents(F.col("value"))).alias("sum_value_cents"))
    )


def _q_union(spark, sf):
    """U1/U3: union of two filtered sets, deduped."""
    o = load_table(spark, sf, "orders")
    a = o.filter(_cents(F.col("o_totalprice")) > 35000000).select("o_orderkey", "o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_custkey")
    return a.unionByName(b).distinct()


def _q_eav_filter(spark, sf):
    """F5-F7 EAV feature filters: entity = user, feature = event_type.
    Keep users with avg(purchase)>threshold AND ≥1 error AND no
    high-value error; pure semi/anti joins, no fanout."""
    e = load_table(spark, sf, "events")
    users = e.select("user_id").distinct()
    purchase_ok = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.avg(_cents(F.col("value"))).alias("avg_cents"))
        .filter(F.col("avg_cents") > 4800)
        .select("user_id")
    )
    sel = users.join(purchase_ok, "user_id", "left_semi")
    sel = entities_with_feature(sel, e, "user_id", F.col("event_type") == "error")
    sel = entities_with_feature(
        sel, e, "user_id",
        (F.col("event_type") == "error") & (_cents(F.col("value")) > 25000),
        negate=True,
    )
    return (
        e.join(sel, "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _q_path_filter(spark, sf):
    """F9/X2: computed storage-path column + prefix filter (reference
    ``artifacts_from_path``, artifact_set.py:382-441)."""
    d = load_table(spark, sf, "documents")
    db_path = F.concat_ws(
        "/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt"))
    )
    return (
        d.withColumn("db_path", db_path)
        .filter(F.col("db_path").startswith("src1/"))
        .select("doc_id", "db_path")
    )


def _q_limit_preserved(spark, sf):
    """O2/O3: limit with preserved selection order as an explicit
    position column (reference query_set.py:1167-1189)."""
    from pyspark.sql import Window

    d = load_table(spark, sf, "documents")
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 20)
        .select("doc_id", "n_chars", "pos")
    )


def _q_topmost_dedup(spark, sf):
    """A5 keep_topmost_matches: per group keep the min-depth row
    (reference has_parents.py:74-132)."""
    p = load_table(spark, sf, "part")
    from lamindb_spark.operators.windows import latest_per_key

    # reuse latest_per_key with inverted ordering via negative depth
    best = (
        p.withColumn("neg_size", -F.col("p_size"))
        .transform(lambda df: latest_per_key(df, ["p_brand"], "neg_size", tiebreak_col="p_partkey"))
    )
    return best.select("p_brand", "p_partkey", "p_size")


def _q_collect_list(spark, sf):
    """A3 list-agg per group (GroupConcat/ArrayAgg analogue), emitted
    as a deterministic sorted CSV string."""
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    return j.groupBy("n_name").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias("suppliers"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


def _q_multi_set_agg(spark, sf):
    """A4 set-agg per entity: distinct sorted event types per user."""
    e = load_table(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("etypes"),
        F.countDistinct("event_type").alias("n_types"),
    )


def _q_case_coalesce(spark, sf):
    """X3/X4 + conditional bucketing (Case/When/Coalesce rewrite)."""
    c = load_table(spark, sf, "customer")
    grp = (
        F.when(F.col("c_acctbal") < 0, F.lit("negative"))
        .when(F.col("c_mktsegment") == "BUILDING", F.lit("building"))
        .otherwise(F.coalesce(F.col("c_mktsegment"), F.lit("unknown")))
    )
    return (
        c.withColumn("grp", grp)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_cents(F.col("c_acctbal"))).alias("bal_cents"))
    )


def _q_union_by_name(spark, sf):
    """S4 heterogeneous concat: unionByName(allowMissingColumns=True)
    — the reference's outer-join concat (artifact_set.py:47-61)."""
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_quantity").alias("q")
    )
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"), _cents(F.col("o_totalprice")).alias("p")
    )
    u = li.unionByName(o, allowMissingColumns=True)
    return u.groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("q").alias("n_q"),
        F.count("p").alias("n_p"),
        F.sum("q").alias("sum_q"),
    )


def _q_length_order(spark, sf):
    """X7 length-ordered top-k (longest-prefix resolution shape)."""
    p = load_table(spark, sf, "part")
    return (
        p.select("p_partkey", "p_name", F.length("p_name").cast("long").alias("name_len"))
        .orderBy(F.desc("name_len"), F.asc("p_name"), F.asc("p_partkey"))
        .limit(15)
    )


def _q_json_object(spark, sf):
    """X10 JSONObject export: row → JSON string."""
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("meta_json"),
    ).filter(F.col("o_orderkey") % 100 == 0)


def _q_rollup_revenue(spark, sf):
    """Beyond-reference agg extension: ROLLUP over region/nation."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    fact = li.join(F.broadcast(o.select("o_orderkey", "o_custkey")), li.l_orderkey == F.col("o_orderkey"))
    joined = fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey)
    rev = F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100).cast("long")
    return joined.rollup("r_name", "n_name").agg(F.sum(rev).alias("revenue_cents"))


def _q_search_synonyms(spark, sf):
    """Se1 full search semantics incl. "|"-delimited synonym rank over
    a label registry (reference query_manager.py:113-164)."""
    reg = literal_table(
        spark,
        [
            (1, "T cell", "T-cell|T lymphocyte"),
            (2, "B cell", "B-cell"),
            (3, "T cell receptor", None),
            (4, "cell", None),
            (5, "neuron", None),
        ],
        ["id", "name", "synonyms"],
    )
    out = search(reg, "t cell", fields=["name"], synonyms_field="synonyms", limit=None)
    return out.orderBy(F.desc("rank"), F.asc("id")).select("id", "name", "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "filter_lookups": _q_filter_lookups,
        "q_objects": _q_q_objects,
        "tpch_q1": _q_tpch_q1,
        "star_revenue": _q_star_revenue,
        "semi_join": _q_semi_join,
        "anti_join": _q_anti_join,
        "distinct_pairs": _q_distinct,
        "topk_orders": _q_topk,
        "latest_event": _q_latest_event,
        "search_rank": _q_search,
        "pivot_events": _q_pivot_events,
        "json_extract": _q_json_extract,
        "validate_values": _q_validate,
        "standardize_values": _q_standardize,
        "graph_closure": _q_closure,
        "version_latest": _q_version_latest,
        "dedup_exact": _q_dedup_exact,
        "minhash_pairs": _q_minhash_pairs,
        "simhash": _q_simhash,
        "knn_cosine": _q_knn,
        "token_stats": _q_token_stats,
        "lang_id": _q_lang_id,
        "hourly_events": _q_hourly_events,
        "union_sets": _q_union,
        "eav_filter": _q_eav_filter,
        "path_filter": _q_path_filter,
        "limit_preserved": _q_limit_preserved,
        "topmost_dedup": _q_topmost_dedup,
        "collect_list": _q_collect_list,
        "multi_set_agg": _q_multi_set_agg,
        "case_coalesce": _q_case_coalesce,
        "union_by_name": _q_union_by_name,
        "length_order": _q_length_order,
        "json_object": _q_json_object,
        "rollup_revenue": _q_rollup_revenue,
        "search_synonyms": _q_search_synonyms,
    }


_RANK_SQL = """
  (CASE WHEN lower(text) = 'spark' THEN 200 ELSE 0 END
   + CASE WHEN regexp_matches(lower(text), '(^|[^a-z0-9])spark($|[^a-z0-9])') THEN 10 ELSE 0 END
   + CASE WHEN regexp_matches(lower(text), '(^|[^a-z0-9])spark') THEN 8 ELSE 0 END
   + CASE WHEN starts_with(lower(text), 'spark') THEN 2 ELSE 0 END
   + CASE WHEN ends_with(lower(text), 'spark') THEN 2 ELSE 0 END
   + CASE WHEN contains(lower(text), 'spark') THEN 1 ELSE 0 END)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "filter_lookups": """
            SELECT l_orderkey, l_linenumber, l_quantity AS qty,
                   CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
            FROM lineitem
            WHERE (l_returnflag = 'R' OR l_returnflag = 'A')
              AND l_quantity >= 30
              AND l_shipdate < TIMESTAMP '1996-01-01'
              AND lower(l_linestatus) = 'f'
        """,
        "q_objects": """
            SELECT c_custkey, c_name, c_mktsegment,
                   CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
            FROM customer
            WHERE (c_mktsegment = 'BUILDING' OR c_acctbal > 9000)
              AND NOT (c_nationkey IN (0, 1, 2))
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(round(sum(l_extendedprice)*100) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   count(*) AS count_order,
                   sum(l_quantity) / count(*) AS avg_qty
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "star_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "semi_join": """
            SELECT c_custkey, c_name,
                   CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
            FROM customer
            WHERE c_custkey IN (
                SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
                  AND CAST(round(o_totalprice*100) AS BIGINT) > 30000000
            )
        """,
        "anti_join": """
            SELECT p_partkey, p_name, p_brand
            FROM part
            WHERE p_partkey NOT IN (
                SELECT l_partkey FROM lineitem WHERE l_quantity >= 48
            )
        """,
        "distinct_pairs": """
            SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey,
                   CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
            FROM orders
            ORDER BY totalprice_cents DESC, o_orderkey DESC
            LIMIT 25
        """,
        "latest_event": """
            SELECT user_id, event_id, event_type,
                   CAST(round(value*100) AS BIGINT) AS value_cents
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "search_rank": f"""
            SELECT doc_id, {_RANK_SQL} AS rank
            FROM documents
            WHERE contains(lower(text), 'spark')
            ORDER BY rank DESC, doc_id ASC
            LIMIT 30
        """,
        "pivot_events": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type='click' THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT) AS click,
                   CAST(sum(CASE WHEN event_type='error' THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT) AS error,
                   CAST(sum(CASE WHEN event_type='purchase' THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT) AS purchase,
                   CAST(sum(CASE WHEN event_type='signup' THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT) AS signup,
                   CAST(sum(CASE WHEN event_type='view' THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT) AS view
            FROM events GROUP BY user_id
        """,
        "json_extract": """
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(sum(k) AS BIGINT) / count(*) AS avg_k
            FROM (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                FROM events
            ) WHERE k > 50
            GROUP BY event_type
        """,
        "validate_values": """
            SELECT value, value IN ('en','fr','de','es') AS validated
            FROM (SELECT DISTINCT lang AS value FROM documents)
        """,
        "standardize_values": """
            SELECT doc_id, lang,
                   CASE lang
                     WHEN 'en' THEN 'english' WHEN 'eng' THEN 'english' WHEN 'english' THEN 'english'
                     WHEN 'es' THEN 'spanish' WHEN 'spanish' THEN 'spanish'
                     WHEN 'fr' THEN 'french' WHEN 'fra' THEN 'french' WHEN 'french' THEN 'french'
                     WHEN 'de' THEN 'german' WHEN 'deu' THEN 'german' WHEN 'german' THEN 'german'
                     ELSE lang END AS standardized
            FROM documents
        """,
        "graph_closure": """
            WITH RECURSIVE anc(id, depth) AS (
                SELECT p_partkey // 2 AS id, 1 AS depth
                FROM part WHERE p_partkey IN (150,151,152,153) AND p_partkey >= 2
                UNION
                SELECT p.p_partkey // 2, a.depth + 1
                FROM anc a JOIN part p ON p.p_partkey = a.id AND p.p_partkey >= 2
            )
            SELECT id, MIN(depth) AS depth FROM anc GROUP BY id
        """,
        "version_latest": """
            SELECT o_custkey, o_orderkey,
                   CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
                ) AS rn FROM orders
            ) WHERE rn = 1
        """,
        "dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
                   min(doc_id) AS keeper_id,
                   count(*) AS n_dups
            FROM documents
            GROUP BY 1
        """,
        "knn_cosine": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
            )
            SELECT vec_id,
                   round(
                     list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q))
                     / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                        * sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))),
                   6) AS score
            FROM embeddings
            ORDER BY score DESC, vec_id ASC
            LIMIT 20
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_calc,
                   round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
                         / CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT), 6) AS mean_tok_len
            FROM documents
        """,
        "lang_id": """
            WITH t AS (
                SELECT doc_id, lang,
                       string_split_regex(lower(trim(text)), '\\s+') AS toks
                FROM documents
            ), h AS (
                SELECT doc_id, lang,
                  (CASE WHEN list_contains(toks,'the') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'and') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'of') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'to') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'a') THEN 1 ELSE 0 END) AS hits_en,
                  (CASE WHEN list_contains(toks,'el') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'la') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'de') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'que') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'los') THEN 1 ELSE 0 END) AS hits_es,
                  (CASE WHEN list_contains(toks,'le') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'la') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'les') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'des') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'est') THEN 1 ELSE 0 END) AS hits_fr,
                  (CASE WHEN list_contains(toks,'der') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'die') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'das') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'und') THEN 1 ELSE 0 END
                 + CASE WHEN list_contains(toks,'ist') THEN 1 ELSE 0 END) AS hits_de
                FROM t
            )
            SELECT doc_id, lang,
                   CASE WHEN greatest(hits_en,hits_es,hits_fr,hits_de) = 0 THEN 'und'
                        WHEN hits_en = greatest(hits_en,hits_es,hits_fr,hits_de) THEN 'en'
                        WHEN hits_es = greatest(hits_es,hits_fr,hits_de) THEN 'es'
                        WHEN hits_fr = greatest(hits_fr,hits_de) THEN 'fr'
                        ELSE 'de' END AS pred_lang,
                   hits_en
            FROM h
        """,
        "hourly_events": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
                   event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events
            GROUP BY 1, 2
        """,
        "union_sets": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE CAST(round(o_totalprice*100) AS BIGINT) > 35000000
            UNION
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        """,
        "eav_filter": """
            SELECT user_id, count(*) AS n_events
            FROM events
            WHERE user_id IN (
                    SELECT user_id FROM events
                    WHERE event_type = 'purchase'
                    GROUP BY user_id
                    HAVING avg(CAST(round(value*100) AS BIGINT)) > 4800
                )
              AND user_id IN (SELECT user_id FROM events WHERE event_type = 'error')
              AND user_id NOT IN (
                    SELECT user_id FROM events
                    WHERE event_type = 'error' AND CAST(round(value*100) AS BIGINT) > 25000
                )
            GROUP BY user_id
        """,
        "path_filter": """
            SELECT doc_id,
                   source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS db_path
            FROM documents
            WHERE starts_with(source || '/' || CAST(doc_id AS VARCHAR) || '.txt', 'src1/')
        """,
        "limit_preserved": """
            SELECT doc_id, n_chars, pos FROM (
                SELECT doc_id, n_chars,
                       row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS pos
                FROM documents
            ) WHERE pos <= 20
        """,
        "topmost_dedup": """
            SELECT p_brand, p_partkey, p_size FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY p_brand ORDER BY p_size ASC, p_partkey DESC
                ) AS rn FROM part
            ) WHERE rn = 1
        """,
        "collect_list": """
            SELECT n_name,
                   string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
                   count(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "multi_set_agg": """
            SELECT user_id,
                   string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS etypes,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
            FROM events GROUP BY user_id
        """,
        "case_coalesce": """
            SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                        WHEN c_mktsegment = 'BUILDING' THEN 'building'
                        ELSE coalesce(c_mktsegment, 'unknown') END AS grp,
                   count(*) AS n,
                   CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
            FROM customer GROUP BY 1
        """,
        "union_by_name": """
            SELECT count(*) AS n_rows, count(q) AS n_q, count(p) AS n_p,
                   sum(q) AS sum_q
            FROM (
                SELECT l_orderkey AS k, l_quantity AS q FROM lineitem
                UNION ALL BY NAME
                SELECT o_orderkey AS k,
                       CAST(round(o_totalprice*100) AS BIGINT) AS p
                FROM orders
            )
        """,
        "length_order": """
            SELECT p_partkey, p_name, CAST(length(p_name) AS BIGINT) AS name_len
            FROM part
            ORDER BY name_len DESC, p_name ASC, p_partkey ASC
            LIMIT 15
        """,
        "json_object": """
            SELECT o_orderkey,
                   '{"status":"' || o_orderstatus || '","priority":"' || o_orderpriority || '"}' AS meta_json
            FROM orders WHERE o_orderkey % 100 = 0
        """,
        "rollup_revenue": """
            SELECT r_name, n_name,
                   CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
        """,
        "search_synonyms": """
            WITH reg(id, name, synonyms) AS (
                VALUES (1, 'T cell', 'T-cell|T lymphocyte'),
                       (2, 'B cell', 'B-cell'),
                       (3, 'T cell receptor', NULL),
                       (4, 'cell', NULL),
                       (5, 'neuron', NULL)
            ), ranked AS (
                SELECT id, name,
                  (CASE WHEN lower(name) = 't cell' THEN 200 ELSE 0 END
                 + CASE WHEN regexp_matches(lower(name), '(^|[^a-z0-9])t cell($|[^a-z0-9])') THEN 10 ELSE 0 END
                 + CASE WHEN regexp_matches(lower(name), '(^|[^a-z0-9])t cell') THEN 8 ELSE 0 END
                 + CASE WHEN starts_with(lower(name), 't cell') THEN 2 ELSE 0 END
                 + CASE WHEN ends_with(lower(name), 't cell') THEN 2 ELSE 0 END
                 + CASE WHEN contains(lower(name), 't cell') THEN 1 ELSE 0 END
                 + CASE WHEN lower(coalesce(synonyms,'')) = 't cell' THEN 200 ELSE 0 END
                 + CASE WHEN regexp_matches(lower(coalesce(synonyms,'')), '^(.*\|)?t cell(\|.*)?$') THEN 200 ELSE 0 END
                 + CASE WHEN regexp_matches(lower(coalesce(synonyms,'')), '(^|[^a-z0-9])t cell($|[^a-z0-9])') THEN 10 ELSE 0 END
                 + CASE WHEN regexp_matches(lower(coalesce(synonyms,'')), '(^|[^a-z0-9])t cell') THEN 8 ELSE 0 END
                 + CASE WHEN starts_with(lower(coalesce(synonyms,'')), 't cell') THEN 2 ELSE 0 END
                 + CASE WHEN ends_with(lower(coalesce(synonyms,'')), 't cell') THEN 2 ELSE 0 END
                 + CASE WHEN contains(lower(coalesce(synonyms,'')), 't cell') THEN 1 ELSE 0 END) AS rank,
                  (contains(lower(name), 't cell') OR contains(lower(coalesce(synonyms,'')), 't cell')) AS m
                FROM reg
            )
            SELECT id, name, rank FROM ranked WHERE m
            ORDER BY rank DESC, id ASC
        """,
    }
