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

# the single sanctioned Python stage: Arrow-batched applyInPandas
# (FlatMapGroupsInPandas) in embedding_neardup / multimodal.
_ARROW_OK = {"embedding_neardup"}


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
    "dedup_exact": 1,      # hash-groupBy
    "sessionize": 1,       # one shuffle on user_id (lag+cumsum+agg share it)
    "asof_join": 1,        # union+window: one shuffle on the key, no range join
    "range_window": 1,     # RANGE frame window
    "version_latest": 1,   # is_latest window
    "hourly_events": 1,    # tumbling-window agg
    "quantiles": 1,        # percentile agg
    "latest_event": 1,
    "token_stats": 0,      # pure scan + expressions
    "quality_score": 0,
}


@pytest.mark.parametrize("name", sorted(_MAX_EXCHANGES))
def test_shuffle_count_ceiling(spark, name):
    df = entrymod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange")
    assert n <= _MAX_EXCHANGES[name], f"{name}: {n} exchanges (max {_MAX_EXCHANGES[name]})"
