"""Regression pins for the round-9 targeted review of operators /
streaming event ops / scalar functions — fourth review batch. One test
per finding."""

import pytest
from pyspark.sql import functions as F


def test_prefix_sum_handles_negative_values(spark):
    """Partition totals must be SUM(value), not max(running sum): with
    negatives the running max exceeds the true total and every later
    partition's offset inflates."""
    from lamindb_spark.operators.prefix import prefix_sum

    rows = [(i, v) for i, v in enumerate([5, -3, 2, -7, 4, 1, -1, 6])]
    df = spark.createDataFrame(rows, ["ord", "val"]).repartition(4)
    got = {
        r["ord"]: r["cum"]
        for r in prefix_sum(df, order_col="ord", value_col="val", out_col="cum").collect()
    }
    run, expect = 0, {}
    for i, v in rows:
        run += v
        expect[i] = run
    assert got == expect


def test_token_count_null_is_zero(spark):
    """NULL text counts 0 tokens (the ws_tokens contract), not
    size(NULL) = -1 silently corrupting corpus totals."""
    from lamindb_spark.functions.text import token_count

    df = spark.createDataFrame(
        [(1, "two words"), (2, None), (3, "")], ["id", "text"]
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", token_count(F.col("text")).alias("n")).collect()
    }
    assert got == {1: 2, 2: 0, 3: 0}


def test_salted_join_rejects_outer_and_matches_plain_inner(spark):
    from lamindb_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "a")] * 50 + [(2, "b")], ["k", "l"])
    right = spark.createDataFrame([(1, "X"), (2, "Y"), (3, "Z")], ["k", "r"])
    out = salted_join(left, right, "k", n_salts=4)
    assert out.count() == left.join(right, "k").count()
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="right")


def test_pagerank_empty_edges_returns_empty(spark):
    from lamindb_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges, src="src", dst="dst")
    assert out.count() == 0
    assert set(out.columns) == {"node", "rank"}


def test_connected_components_string_ids(spark):
    """String (uid-typed) ids: labels must be correct AND the
    convergence check must actually fire (the old sum-of-labels check
    was NULL for strings, so every call paid all 50 rounds)."""
    from lamindb_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, src="src", dst="dst").collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_increment_suffix_alphabet_order():
    """The alphabet is digits, lowercase, uppercase — the docstring
    previously claimed 0-9A-Za-z and an example that didn't match the
    code."""
    from lamindb_spark.functions.ids import decode_base62, increment_suffix

    assert increment_suffix("0000") == "0001"
    assert increment_suffix("0009") == "000a"
    assert increment_suffix("000z") == "000A"
    assert increment_suffix("000Z") == "0010"
    # round-trip consistency with the decoder the catalog maxes by
    assert decode_base62("000A") == decode_base62("000z") + 1


def test_search_limit_zero_returns_no_rows(spark):
    from lamindb_spark.operators.search import search

    df = spark.createDataFrame([("alpha",), ("alphabet",)], ["name"])
    assert search(df, "alpha", ["name"], limit=0).count() == 0
    assert search(df, "alpha", ["name"], limit=None).count() == 2


def test_heavy_hitters_single_scan_shares(spark):
    from lamindb_spark.functions.sketches import heavy_hitters

    df = spark.createDataFrame(
        [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5, ["k"]
    )
    got = {r["k"]: (r["n"], round(r["share"], 2)) for r in heavy_hitters(df, "k", 0.10).collect()}
    assert got == {"hot": (80, 0.8), "warm": (15, 0.15)}


def test_run_stream_to_memory_mode_inference(spark, tmp_path):
    """The helper must drain non-aggregation streams (append), windowed
    aggregations (complete), and stateful update streams — the old
    hardcoded 'complete' rejected everything but aggregations — and
    reject batch frames with a clear TypeError. Also pins the HALF_UP
    cents fix: value=0.125 rounds to 13 cents like the batch twin's
    F.round, where pandas .round() (half-to-even) gave 12."""
    from lamindb_spark.streaming.events import (
        EVENT_SCHEMA,
        read_event_stream,
        run_stream_to_memory,
        stream_dedup,
        windowed_counts,
    )
    from lamindb_spark.streaming.stateful import running_user_profiles

    src = str(tmp_path / "events")
    spark.createDataFrame(
        [
            (1, "2026-01-01 00:00:00", 10, "click", 0.125, "{}"),
            (1, "2026-01-01 00:00:01", 10, "click", 2.0, "{}"),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").select(
        [f.name for f in EVENT_SCHEMA.fields]
    ).write.parquet(src)

    dd = run_stream_to_memory(
        spark, stream_dedup(read_event_stream(spark, src)), "r9d_dedup"
    )
    assert dd.count() == 1  # duplicate event_id dropped, append mode OK

    wc = run_stream_to_memory(
        spark,
        windowed_counts(read_event_stream(spark, src), window="1 hour"),
        "r9d_counts",
    )
    assert wc.count() >= 1  # complete mode OK for aggregations

    with pytest.raises(TypeError, match="streaming"):
        run_stream_to_memory(spark, spark.range(3), "r9d_batch")


def test_stateful_stream_half_up_cents(spark, tmp_path):
    """HALF_UP cents in the stateful profile: value=0.125 contributes
    13 cents like the batch twin's F.round — pandas .round()
    (half-to-even) gave 12, silently diverging the streaming profile
    from the batch query on exact .5 cents. Also exercises the
    helper's 'update' mode inference for applyInPandasWithState."""
    from lamindb_spark.streaming.events import (
        EVENT_SCHEMA,
        read_event_stream,
        run_stream_to_memory,
    )
    from lamindb_spark.streaming.stateful import running_user_profiles

    src = str(tmp_path / "events")
    spark.createDataFrame(
        [
            (1, "2026-01-01 00:00:00", 10, "click", 0.125, "{}"),
            (2, "2026-01-01 00:00:01", 10, "click", 2.0, "{}"),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").select(
        [f.name for f in EVENT_SCHEMA.fields]
    ).write.parquet(src)
    prof = run_stream_to_memory(
        spark,
        running_user_profiles(read_event_stream(spark, src)),
        "r9d_prof",
        timeout_sec=30,
    )
    rows = sorted(prof.collect(), key=lambda r: r["n_events"])
    assert rows[-1]["sum_value_cents"] == 13 + 200  # HALF_UP, not 12+200
