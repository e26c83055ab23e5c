"""Partition-id pin regression (r14, found by the 100× suite sweep):
the prefix primitives' stamped frame is consumed by two branches, and
WITHOUT the localCheckpoint pin Spark planned two separate range
exchanges whose AQEShuffleReads coalesced independently — the row's
partition id disagreed between the data branch and the offsets branch
and the join silently dropped rows (ranked_index lost 40% of 500k
rows; nondeterministic across runs; invisible at oracle scale). These
tests run the primitives at the scale where the divergence actually
triggered and assert exact totals/contiguity."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.operators.prefix import (
    prefix_sum,
    ranked_index,
    stratified_rank,
)
from lamindb_spark.session import release_checkpoints

N = 500_000


@pytest.fixture()
def big(spark):
    # 500k rows, a skewed stratum, a heavily-tied float order key —
    # the shape that made AQE coalesce the two readers differently
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 != 0, F.lit("en"))
            .otherwise(F.concat(F.lit("l"), (F.col("id") % 7).cast("string")))
            .alias("lang"),
            ((F.col("id") * 37) % 97).cast("double").alias("score"),
            ((F.col("id") % 13) + 1).alias("w"),
        )
        .repartition(32)
    )
    yield df
    release_checkpoints(spark)


def test_ranked_index_exact_at_coalesce_scale(big, spark):
    out = ranked_index(big, [F.col("score"), F.col("doc_id")], "g").toPandas()
    assert len(out) == N
    g = out["g"].sort_values().reset_index(drop=True)
    assert g.iloc[0] == 0 and g.iloc[-1] == N - 1 and g.is_unique


def test_stratified_rank_exact_at_coalesce_scale(big, spark):
    out = stratified_rank(
        big, "lang", [F.col("score"), F.col("doc_id")], "rn", "n"
    ).toPandas()
    assert len(out) == N
    per = out.groupby("lang")["rn"].agg(["count", "min", "max"])
    # ranks are exactly 0..count-1 inside every stratum
    assert (per["min"] == 0).all()
    assert (per["max"] == per["count"] - 1).all()
    assert out.groupby("lang")["n"].nunique().eq(1).all()


def test_prefix_sum_exact_at_coalesce_scale(big, spark):
    out = prefix_sum(big.select("doc_id", "w"), "doc_id", "w", "c").toPandas()
    assert len(out) == N
    true_total = big.agg(F.sum("w")).first()[0]
    assert int(out["c"].max()) == true_total
