"""Approximate aggregates: bounded-error guarantees hold."""

from pyspark.sql import functions as F

from lamindb_spark.functions.sketches import (
    approx_distinct,
    approx_quantiles,
    heavy_hitters,
)
from lamindb_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    o = load_table(spark, SF_DIR, "orders")
    exact = o.select("o_custkey").distinct().count()
    approx = o.agg(approx_distinct("o_custkey", rsd=0.02).alias("a")).first()["a"]
    assert abs(approx - exact) / exact < 0.06  # 3× the target rsd

def test_approx_quantiles_close_to_exact(spark):
    o = load_table(spark, SF_DIR, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    approx = o.agg(approx_quantiles("cents", [0.5]).alias("q")).first()["q"][0]
    exact = o.agg(F.percentile("cents", F.lit(0.5)).alias("q")).first()["q"]
    assert abs(approx - exact) / exact < 0.01

def test_heavy_hitters_finds_skewed_key(spark):
    skewed = spark.createDataFrame(
        [(1,)] * 500 + [(k,) for k in range(2, 200)], "k long"
    )
    hits = heavy_hitters(skewed, "k", min_share=0.5)
    rows = hits.collect()
    assert rows[0]["k"] == 1 and rows[0]["share"] > 0.7
    assert len(rows) == 1
    # the total must NOT ride a keyless window gathering the whole
    # key-count table into one task (VERDICT r13: on a distinct-heavy
    # key the skew-DIAGNOSIS helper itself became the skew hazard) —
    # it rides a 1-row agg broadcast back on
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
