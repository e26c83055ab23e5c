"""stratified_rank — the r13 skew-safe replacement for per-stratum
row_number()/count()/ntile() windows (VERDICT r12 #1).

Pins two things: (1) bit-identical semantics to the window form,
including NULL strata and ties; (2) the scale shape — the data rows
range-shuffle on (stratum, order...) and NO per-stratum window function
touches them, so a 90%-dominant stratum spreads across partitions
instead of sorting through one task.
"""

import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from lamindb_spark.operators.prefix import stratified_rank


def _window_rank(df, strata_col, order_cols):
    w = Window.partitionBy(strata_col).orderBy(*order_cols)
    return df.withColumn("exp_rank", F.row_number().over(w) - 1).withColumn(
        "exp_n", F.count(F.lit(1)).over(Window.partitionBy(strata_col))
    )


def test_stratified_rank_matches_window_semantics(spark):
    rows = [(i, ["a", "b", "c"][i % 3], float((i * 7) % 13)) for i in range(200)]
    # a NULL stratum must behave as one ordinary group
    rows += [(1000 + i, None, float(i)) for i in range(7)]
    df = spark.createDataFrame(rows, ["id", "src", "score"])
    got = stratified_rank(
        df, "src", [F.col("score"), F.col("id")], "rn0", "n"
    ).collect()
    exp = {
        (r["id"]): (r["exp_rank"], r["exp_n"])
        for r in _window_rank(df, "src", [F.col("score"), F.col("id")]).collect()
    }
    assert len(got) == len(exp)
    for r in got:
        assert (r["rn0"], r["n"]) == exp[r["id"]], r["id"]


def test_stratified_rank_ties_break_deterministically(spark):
    # identical scores: the id tiebreak must make ranks reproducible
    df = spark.createDataFrame(
        [(i, "only", 1.0) for i in range(50)], ["id", "src", "score"]
    )
    out1 = {
        r["id"]: r["rn0"]
        for r in stratified_rank(
            df, "src", [F.col("score"), F.col("id")], "rn0", "n"
        ).collect()
    }
    out2 = {
        r["id"]: r["rn0"]
        for r in stratified_rank(
            df, "src", [F.col("score"), F.col("id")], "rn0", "n"
        ).collect()
    }
    assert out1 == out2
    assert sorted(out1.values()) == list(range(50))
    # id is the only varying key, so rank follows id order
    assert out1[0] == 0 and out1[49] == 49


def test_stratified_rank_skew_spreads_dominant_stratum(spark):
    """90% of rows in one stratum: the dominant stratum must occupy
    MULTIPLE range partitions (the whole point of ranking globally by
    (stratum, order...) instead of windowing per stratum)."""
    n = 20_000
    rows = [(i, "web" if i % 10 else f"s{i % 7}", float(i % 997)) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "src", "score"]).repartition(8)
    # replicate the operator's data-path exchange and observe the pids
    # (explicit partition count: at fixture scale AQE coalesces the
    # few-hundred-KB shuffle to one partition, which is correct sizing
    # behavior, not funneling — at 100 TB the same exchange yields
    # thousands of partitions and this asserts the dominant stratum
    # spans them)
    local = (
        df.repartitionByRange(8, F.col("src"), F.col("score"), F.col("id"))
        .withColumn("pid", F.spark_partition_id())
    )
    pids = {
        r["pid"]
        for r in local.filter(F.col("src") == "web").select("pid").distinct().collect()
    }
    assert len(pids) > 1, "dominant stratum funneled into one partition"
    # and the ranks over the skewed frame are still exactly the window's
    got = stratified_rank(df, "src", [F.col("score"), F.col("id")], "rn0", "n")
    sample = got.filter(F.col("src") == "web").orderBy("rn0").limit(5).collect()
    exp = (
        _window_rank(df, "src", [F.col("score"), F.col("id")])
        .filter(F.col("src") == "web")
        .orderBy("exp_rank")
        .limit(5)
        .collect()
    )
    assert [(r["id"], r["rn0"]) for r in sample] == [
        (r["id"], r["exp_rank"]) for r in exp
    ]


@pytest.mark.parametrize("name", ["stratified_sample", "mix_sources", "ppl_buckets"])
def test_no_per_stratum_window_functions_in_plans(spark, name):
    """The three operators VERDICT r12 flagged must carry NO ranking
    window PARTITIONED BY THE STRATUM ALONE over data rows. The
    sanctioned windows are the pid-local row_number (its spec leads
    with __pid, so partitions are range-partition-sized) and the
    tiny-cell-table offset sums."""
    import re

    import __spark_entry__ as entrymod
    from lamindb_spark.operators import prefix

    df = entrymod.queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" not in plan, f"{name}: per-stratum ntile survives"
    bad = re.findall(r"row_number\(\) windowspecdefinition\((?:source|lang)#", plan)
    assert not bad, f"{name}: row_number partitioned by the stratum alone"
    for m in re.finditer(r"row_number\(\) windowspecdefinition\((\w+)#", plan):
        assert m.group(1) == "__pid", f"{name}: unexpected window key {m.group(1)}"
    # the range shuffle lives INSIDE the partition-id pin (r14: the
    # stamped frame is localCheckpointed so both consumers read one
    # frozen partitioning) — the outer plan shows the checkpoint scan,
    # the pre-pin stamped plan shows the range exchange
    assert "Scan ExistingRDD" in plan, f"{name}: partition-id pin missing"
    stamped = prefix._last_stamped._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(" in stamped.lower(), f"{name}: range shuffle missing"


def test_topk_per_group_matches_single_window(spark):
    """Two-phase top-k must be bit-identical to the plain group window
    (ties included), on a skewed frame where one group dominates."""
    from lamindb_spark.operators.windows import topk_per_group

    n = 5_000
    rows = [
        (i, "big" if i % 10 else f"s{i % 7}", float((i * 13) % 97)) for i in range(n)
    ]
    # duplicate scores force tie-breaking through the id
    df = spark.createDataFrame(rows, "id long, grp string, score double").repartition(8)
    got = sorted(
        (r["grp"], r["rk"], r["id"])
        for r in topk_per_group(
            df, ["grp"], [F.desc("score"), F.asc("id")], 5
        ).collect()
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("id"))
    exp = sorted(
        (r["grp"], r["rk"], r["id"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5")
        .collect()
    )
    assert got == exp
    # k larger than some groups is fine
    small = topk_per_group(
        df.filter("grp = 's1'").limit(3), ["grp"], [F.asc("id")], 10
    ).count()
    assert small == 3
