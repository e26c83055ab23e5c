"""Temporal operators: as-of join, trailing range window, sessionize."""

import datetime

from pyspark.sql import functions as F

from lamindb_spark.operators.temporal import (
    asof_join_union,
    sessionize,
    trailing_window_agg,
)


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_basic(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (2, _ts(5))], "user_id long, ts timestamp"
    )
    buys = spark.createDataFrame(
        [(1, _ts(4), 100), (1, _ts(10), 101), (1, _ts(20), 102), (3, _ts(9), 103)],
        "user_id long, ts timestamp, event_id long",
    )
    out = {
        r["event_id"]: r["asof_ts"]
        for r in asof_join_union(clicks, buys, "user_id", "ts", ["ts"]).collect()
    }
    assert out[100] == _ts(0)  # latest click before 0:04 is 0:00
    assert out[101] == _ts(10)  # tie at equal ts counts
    assert out[102] == _ts(10)
    assert out[103] is None  # user with no clicks → null


def test_trailing_window_agg(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(2)), (1, _ts(10)), (2, _ts(0))],
        "user_id long, ts timestamp",
    )
    out = trailing_window_agg(
        df, "user_id", "ts", 5 * 60 * 1_000_000, {"n": F.count(F.lit(1))}
    )
    got = sorted((r["user_id"], r["ts"].minute, r["n"]) for r in out.collect())
    # user1@0:00 → 1; user1@0:02 → 2 (0:00 within 5min); user1@0:10 → 1
    assert got == [(1, 0, 1), (1, 2, 2), (1, 10, 1), (2, 0, 1)]


def test_sessionize_gaps(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(1), 2), (1, _ts(30), 3), (2, _ts(0), 4)],
        "user_id long, ts timestamp, event_id long",
    )
    out = sessionize(df, "user_id", "ts", 10 * 60 * 1_000_000, tiebreak_col="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}
