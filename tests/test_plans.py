"""Plan-invariant guard across the whole query suite.

Catches scale regressions that correctness checks cannot: a query that
silently falls back to a row-at-a-time Python UDF, or a join that
degenerates into an unblocked cartesian product, still returns correct
rows — and then dies at 100 TB. Asserted on the optimized physical plan
of every `__spark_entry__.queries()` entry at sf0.001.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# ann_ivf / knn intentionally cross-join a broadcast centroid/query
# table: BroadcastNestedLoopJoin over a tiny build side is the correct
# plan. Nothing may produce a non-broadcast CartesianProduct.
_CARTESIAN_OK = set()

# the sanctioned Python stages: Arrow-batched applyInPandas
# (FlatMapGroupsInPandas) in embedding_neardup / multimodal, and
# semantic_dedup's "exact" kernel — integer-quantized int64 GEMM,
# whose sums are order-free and therefore bit-replayable in SQL
# (the r6 resolution of ADVICE r5's float-accumulation concern).
_ARROW_OK = {"embedding_neardup", "semantic_dedup", "knn_join"}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_plan_invariants(spark, name):
    df = entrymod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # no row-at-a-time Python UDFs anywhere in the suite
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF in plan"
    # Python allowed only as Arrow-batched grouped map, only where sanctioned
    if name not in _ARROW_OK:
        assert "FlatMapGroupsInPandas" not in plan, f"{name}: unsanctioned Python stage"
    # no unblocked cartesian product
    if name not in _CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


# Shuffle-count ceilings (pre-AQE static plans at sf0.001) pin the
# single-shuffle designs documented in SCALE.md — a regression that
# introduces an extra Exchange in these operators fails here even if
# results stay correct.
_MAX_EXCHANGES = {
    "tpch_q1": 1,          # partial agg + one shuffle on the group key
    # All 22 TPC-H shapes pinned at their current (sf0.001, 4 shuffle
    # partitions) exchange counts — VERDICT r04 #3: a join-order or
    # broadcast regression in ANY of them now fails loudly instead of
    # silently doubling shuffles. Broadcast exchanges count too, so a
    # broadcast→sort-merge flip trips the ceiling (SMJ adds 2
    # hashpartitioning exchanges for the 1 BroadcastExchange it drops).
    "tpch_q2": 13,         # deep dim chain + correlated min-supplycost subquery
    "tpch_q3": 3,
    "tpch_q4": 3,          # semi-join via exists
    "tpch_q5": 7,
    "tpch_q6": 1,          # scan + filter + global agg (single reduce exchange)
    "tpch_q7": 7,
    "tpch_q8": 9,
    "tpch_q9": 5,
    "tpch_q10": 4,
    "tpch_q11": 9,         # two-pass over partsupp (group + global threshold)
    "tpch_q12": 3,
    "tpch_q13": 4,         # outer join + double agg
    "tpch_q14": 2,
    "tpch_q15": 6,         # revenue view reused (max + equi-join)
    "tpch_q16": 5,
    "tpch_q17": 4,         # per-part avg subquery join
    "tpch_q18": 3,
    "tpch_q19": 2,
    "tpch_q20": 9,         # nested exists chain
    # r11 rewrite: the per-(order,supplier) pre-agg removed the Expand
    # (count_distinct pair doubled the joined stream) at the cost of
    # ONE textual exchange — the pre-agg subtree appears under both the
    # per-order counts and the waiting branch, and AQE collapses the
    # duplicate to a ReusedExchange at runtime (verified: post-exec
    # plan has exactly 1 ReusedExchange), so physical shuffles stayed 7.
    "tpch_q21": 8,
    "tpch_q22": 5,
    "dedup_exact": 1,      # hash-groupBy
    # (doc,band) agg + (band,bucket) min + two joins back (doc agg,
    # source agg) over the ZERO-shuffle portable-signature scan; the
    # keyed subtree repeats textually under both join sides and AQE
    # reuses it at runtime — same pattern as tpch_q21
    "lsh_admission": 7,
    "gopher_rules": 1,     # quality gate is a pure map pass + the r15
                           # spread_for_cpu parallelism-repair exchange
                           # (fires only on under-split fixtures; no-op
                           # at real scale)
    "top_bigram": 1,       # r14 shuffle-free run-length form; the one
                           # exchange is the r15 spread_for_cpu repair
    # pack_sequences: range shuffle + pid-local window exchange on the
    # narrow (key, long) projection, plus the #partitions-row offsets
    # branch (tiny SinglePartition aggregates) and its broadcast.
    "pack_sequences": 6,
    "kmeans_clusters": 2,  # final assignment is map-side; sizes agg + sort
    "limit_preserved": 0,  # TakeOrdered + window over the 20-row head
    "split_by_source": 0,  # md5-bucket split is a pure map pass
    "curated_packing": 6,  # map-only gate feeding the packing shape above
    "sessionize": 1,       # one shuffle on user_id (lag+cumsum+agg share it)
    "asof_join": 1,        # union+window: one shuffle on the key, no range join
    "range_window": 1,     # RANGE frame window
    "version_latest": 1,   # is_latest window
    "hourly_events": 1,    # tumbling-window agg
    "quantiles": 1,        # percentile agg
    "latest_event": 1,
    "token_stats": 0,      # pure scan + expressions
    "quality_score": 1,    # + r15 spread_for_cpu repair exchange
    "chunk_docs": 1,       # explode is map-side; + r15 spread repair
    "redact_pii": 0,       # regexp_replace chain, pure scan
    "token_freq": 1,       # partial agg + one shuffle; top-k is TakeOrdered
    "user_profiles": 1,    # one (user_id) shuffle shared by all three windows
    "ngram_jaccard": 2,    # inverted-index groupBy + pair count; NO size
                           # join (n_sh rides the explode) — r5 rewrite
    "dedup_spans": 3,      # r13: election = min-struct groupBy + join
                           # back (heavy-hitter-safe; the seg subtree
                           # repeats textually and reuses at runtime)
                           # + doc reassembly
    "bm25_rank": 4,        # 1-row stats agg (SinglePartition) + its broadcast;
                           # scoring itself is a pure map pass; + the r15
                           # spread repair exchange (textually under both
                           # the stats and scoring branches, reused at
                           # runtime)
    "semantic_dedup": 3,   # cell-blocked pair join shuffle + 2 broadcasts
                           # (stats/dropped-ids); kmeans passes are map-side
    "oov_rate": 0,         # scoring is a pure map pass (vocab is a literal
                           # array fetched at build time, like kmeans cents)
    # r13 rewrite (VERDICT r12 #1): range shuffle on (stratum, md5, id)
    # + the pid-local row_number window's (pid, stratum) hash exchange
    # (cells agg rides its clustering) + tiny offset windows + broadcast
    # join back — no window partitioned by the stratum alone, so a
    # dominant stratum never sorts through one task
    # (see test_stratified_rank.py)
    "stratified_sample": 6,
    "dup_representatives": 1,  # one content-hash shuffle: the whole
                               # election is a map-side-combined
                               # min-struct agg (r13 — no window, no
                               # join back)
    "profile_events": 4,     # the multi-distinct expand-aggregate pair
                             # + the r9 keyless string-min/max fold
                             # (SinglePartition + its 1-row broadcast):
                             # one extra sequential scan bought the
                             # whole 4n expanded stream out of
                             # SortAggregate (see curation/profile.py)
    "lm_perplexity": 8,      # bigram/unigram count aggs + scoring joins
                             # (3 of the 8 are broadcasts at this size)
    "mix_sources": 6,        # same skew-safe stratified_rank shape as
                             # stratified_sample (r13)
    "span_novelty": 3,       # r13: span-count groupBy + join back
                             # (heavy-hitter-safe) + doc re-agg
    "top_docs_per_source": 2,  # r13 two-phase topk_per_group: the
                               # (pid, group) local-candidate exchange
                               # + the tiny global candidate window —
                               # no per-group window over data rows
    "length_outliers": 2,    # 1-row percentile agg (SinglePartition) +
                             # its broadcast; the flag pass is map-only
    "embedding_cov": 1,      # one (i,j) shuffle of dim^2 partial sums
    # -- r6 additions --
    # the CPU-heavy HOF ops carry exactly one exchange at test scale:
    # the spread_for_cpu round-robin that repairs an under-split scan
    # (provable no-op once splits >= parallelism — operators/spread.py)
    "dsir_weights": 0,       # model fits eagerly (bounded collect);
                             # the returned scoring pass is map-only
    "bpe_encode": 1,         # spread; merges fetched at build; encode
                             # is a shuffle-free replace chain
    "char_entropy": 1,       # spread; otherwise pure expression
    "ppl_buckets": 18,       # lm_perplexity's 8 + lang join + the r13
                             # skew-safe stratified_rank (range shuffle
                             # + cell agg + broadcast; the scoring
                             # subtree repeats textually under the cell
                             # branch and exchange reuse collapses it
                             # at runtime — same pattern as tpch_q21);
                             # the per-language ntile window is GONE
    "random_proj": 1,        # spread; projection is a pure map pass
    "knn_join": 1,           # one cell shuffle into the Arrow top-k
                             # GEMM; assignment itself is map-side
    "silhouette": 1,         # spread; literal-centroid distances are
                             # otherwise a pure map pass
    "ann_pq": 2,             # spread + TakeOrdered gather; codebooks
                             # fetched at build, ADC itself map-only
    "max_dup_spans": 3,      # r13: repeat k-grams via groupBy-count +
                             # semi-join (heavy-hitter-safe) + per-doc
                             # gaps-and-islands — all narrow
    "tfidf_keywords": 7,     # r13: tf agg + token-df groupBy joined
                             # back (a stopword's rows never gather in
                             # one window task) + n_docs 1-row pair +
                             # per-doc top-k window; r15: df side
                             # BROADCAST (see build-side test below)
    # -- r7 additions --
    "source_kl": 7,          # ONE corpus scan into the checkpointed
                             # (source,token) table; corpus counts ride
                             # a token window (no self-join); the
                             # source/total tables are tiny broadcasts
    "top_pc": 1,             # one (i,j) shuffle of dim^2 partial sums;
                             # power iterations are driver-side on the
                             # model-sized integer matrix
    "word_rank": 0,          # TakeOrdered over checkpointed pagerank
                             # ranks (iteration shuffles sit behind
                             # localCheckpoint, vocab-bounded)
    "ann_ivfpq": 1,          # TakeOrdered gather only: cell pruning is
                             # a map-side argmin filter BEFORE encode,
                             # candidates never join
    "ann_sq8": 1,            # spread; the 64-term integer score is one
                             # codegen'd expression, then TakeOrdered
    "fim_transform": 0,      # pure map pass (token split + slices)
    # -- r9 additions --
    "ann_pq_refine": 5,      # ADC pass (spread + TakeOrdered gather +
                             # its SinglePartition limit) feeds the
                             # candidate BROADCAST; the refine itself
                             # is BroadcastHashJoin + TakeOrdered — the
                             # raw-vector side NEVER shuffles (the
                             # whole point of the two-stage read path)
    "wide_include": 7,       # registry-pivot kernel: 3 hash exchanges
                             # (priorities agg; pivot's (key,status)
                             # partial + key final) + 4 broadcasts
                             # (dim chain + agg results joined back);
                             # a broadcast→SMJ flip trips this (r9)
    "slot_validate": 6,      # r15 S8 tagged-union verdict fold: ONE
                             # post-union probe distinct + shared
                             # domain broadcasts (anti-join pushed
                             # through the union by Catalyst) + the
                             # final orderBy range exchange. At this
                             # sf the pre-fold shape also read 6, so
                             # the fold's evidence is the sf0.1 plan
                             # diff (plans/r15, 14->12) — the ceiling
                             # pins today's shape against growth
}


@pytest.mark.parametrize("name", sorted(_MAX_EXCHANGES))
def test_shuffle_count_ceiling(spark, name):
    df = entrymod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange")
    assert n <= _MAX_EXCHANGES[name], f"{name}: {n} exchanges (max {_MAX_EXCHANGES[name]})"


def test_ivf_topk_partition_pruning(spark, tmp_path):
    """VERDICT r02 #2: the IVF top-k scan must prune at the FILE level —
    only the nprobe probed cells' files are read, and the probed-cell
    predicate lands in PartitionFilters, not a post-scan Filter."""
    from pyspark.sql import functions as F

    from lamindb_spark.pipeline.similarity import ivf_build_index, ivf_topk, probe_cells
    from lamindb_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings").withColumn(
        "vec", F.col("embedding").cast("array<double>")
    )
    cents = [
        (int(r["vec_id"]), list(r["vec"]))
        for r in emb.filter(F.col("vec_id") < 8).select("vec_id", "vec").collect()
    ]
    qvec = next(v for cid, v in cents if cid == 0)
    path = str(tmp_path / "ivf")
    ivf_build_index(emb.select("vec_id", "vec"), cents, path, vec_col="vec")

    topk = ivf_topk(spark, path, cents, qvec, k=5, nprobe=2, vec_col="vec")
    # correctness within probed cells: top-1 is the query itself
    assert topk.collect()[0]["vec_id"] == 0
    # plan: the cell predicate is a PartitionFilter on the scan, and the
    # executed scan's metrics prove only the 2 probed cells' files were
    # read (the index has 8 cell dirs on disk)
    qe = topk._jdf.queryExecution()
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
    m = scans[0].metrics()
    assert int(m.apply("numPartitions").value()) == 2, "scan did not prune to nprobe cells"
    n_cells = len(
        {f.split("centroid_id=")[1].split("/")[0]
         for f in spark.read.parquet(path).inputFiles()}
    )
    assert n_cells > 2, "index degenerate — pruning proved nothing"
    assert set(probe_cells(cents, qvec, 2)) < {int(c[0]) for c in cents}


def test_query_registry_invariants():
    """The certification-window contract: the driver value-checks the
    FIRST 50 `queries()` entries, so every one of them must carry an
    oracle (rows-only entries belong past the cap), and every oracle
    must point at a real query."""
    q = list(entrymod.queries())
    o = entrymod.oracle_sql()
    window = q[:50]
    missing = [n for n in window if n not in o]
    assert not missing, f"rows-only entries inside the driver window: {missing}"
    orphans = [n for n in o if n not in q]
    assert not orphans, f"oracles without queries: {orphans}"
    assert len(q) == len(set(q))


def test_certification_union_property():
    """Every `queries()` entry must have a driver-green row in SOME past
    CORRECTNESS_r*.json, or sit inside the CURRENT first-50 window (so
    the next driver run certifies it). The only permanent exceptions are
    the two seeded-xxhash64 rows-only entries whose hashes DuckDB cannot
    reproduce — their *_portable twins are certified instead."""
    import glob
    import json

    rows_only_forever = {"minhash_pairs", "simhash"}
    certified = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") is True:
                    certified.add(name)
    q = list(entrymod.queries())
    window = set(q[:50])
    uncovered = [
        n for n in q
        if n not in certified and n not in window and n not in rows_only_forever
    ]
    assert not uncovered, (
        f"queries never driver-certified AND outside the current window: {uncovered}"
    )


def test_tfidf_vocab_broadcast_build_side(spark):
    """r15: left unhinted, Catalyst broadcast the CORPUS-sized tf side
    of the idf join (under the 64 MB threshold at fixture scale — a
    plan that dies at 100 TB). The shipped form hints the
    DISTINCT-TERM-sized df-counts table; this pins (a) the executed
    build side is the vocab table (dfreq is the join's right operand)
    and (b) the ``vocab_broadcast=False`` shuffle fallback is
    value-identical."""
    import re

    from lamindb_spark.pipeline.corpus import tfidf_keywords
    from lamindb_spark.sources.readers import load_table

    d = load_table(spark, SF, "documents")
    hinted = tfidf_keywords(d, top_k=3)
    fallback = tfidf_keywords(d, top_k=3, vocab_broadcast=False)
    rows_h = sorted(map(tuple, hinted.collect()))
    assert rows_h == sorted(map(tuple, fallback.collect()))
    final = (
        hinted._jdf.queryExecution().executedPlan().toString()
        .split("Initial Plan")[0]  # AQE repeats the pre-run plan below
    )
    sides = re.findall(r"BroadcastHashJoin \[token[^\n]*?(Build\w+)", final)
    assert sides == ["BuildRight"], f"idf join build side regressed: {sides}"
