"""Bucketed co-located joins and salted skew joins."""

from pyspark.sql import functions as F

from lamindb_spark.operators.joins import salted_join
from lamindb_spark.sources.bucketing import read_bucketed, write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dims = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("w")
    )
    write_bucketed(facts, "b_facts", "k", n_buckets=8)
    write_bucketed(dims, "b_dims", "k", n_buckets=8)
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "b_facts").join(read_bucketed(spark, "b_dims"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_salted_join_matches_plain_join(spark):
    # one mega-key (skew) plus a tail
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 30)], "k long, x long"
    )
    right = spark.createDataFrame([(k, k * 10) for k in range(1, 30)], "k long, y long")
    plain = sorted(map(tuple, left.join(right, "k").select("k", "x", "y").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", n_salts=8).select("k", "x", "y").collect()))
    assert plain == salted and len(plain) == 528
