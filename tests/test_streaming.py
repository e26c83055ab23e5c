"""Structured Streaming extension: windowed aggs + dedup over an event
stream, checked against the equivalent batch plan (one definition, two
execution modes)."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.sources.readers import load_table
from lamindb_spark.streaming.events import (
    read_event_stream,
    session_windows,
    stream_dedup,
    windowed_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Re-materialize the events table as µs-timestamp parquet (the
    raw testdata is TIMESTAMP(NANOS), which a stream source can't
    declare) split into several files = several micro-batches."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def _run(stream_df, spark, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=2)
    got = _run(windowed_counts(stream, "1 hour"), spark, "win_counts", "complete")
    batch = windowed_counts(spark.read.parquet(event_dir), "1 hour")
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stream_dedup_drops_duplicate_ids(spark, event_dir, tmp_path):
    # duplicate every event by writing the dir twice into one source
    dup_dir = str(tmp_path / "dup")
    df = spark.read.parquet(event_dir)
    df.write.mode("overwrite").parquet(dup_dir)
    df.write.mode("append").parquet(dup_dir)
    stream = read_event_stream(spark, dup_dir, max_files_per_trigger=4)
    got = _run(stream_dedup(stream, "10 minutes"), spark, "dedup_out", "append")
    n_unique = spark.read.parquet(event_dir).select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == n_unique
    assert got.count() == n_unique  # duplicates actually dropped


def test_session_windows_batch_shape(spark, event_dir):
    out = session_windows(spark.read.parquet(event_dir), gap="30 minutes")
    row = out.first()
    assert {"session_start", "session_end", "user_id", "n_events"} <= set(out.columns)
    assert row["n_events"] >= 1


def test_stream_to_artifact_registers_catalog_row(spark, event_dir, lakehouse, tmp_path):
    from lamindb_spark.streaming.sink import stream_to_artifact

    stream = read_event_stream(spark, event_dir, max_files_per_trigger=2)
    art = stream_to_artifact(
        lakehouse,
        stream.select("event_id", "event_type"),
        key="streams/events.parquet",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert art["key"] == "streams/events.parquet"
    opened = lakehouse.open_artifact("streams/events.parquet", is_run_input=False)
    n_src = spark.read.parquet(event_dir).count()
    assert opened.count() == n_src


def test_stateful_running_profiles(spark, event_dir):
    from lamindb_spark.streaming.stateful import running_user_profiles

    stream = read_event_stream(spark, event_dir, max_files_per_trigger=2)
    q = (
        running_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("profiles")
    # update mode emits one row per (user, micro-batch); the LAST row
    # per user carries the final accumulated state
    final = {
        r["user_id"]: r
        for r in out.collect()  # memory sink appends in batch order
    }
    batch = spark.read.parquet(event_dir)
    exact = {
        r["user_id"]: (r["n"], r["cents"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert set(final) == set(exact)
    for uid, (n, cents) in exact.items():
        assert final[uid]["n_events"] == n  # state accumulated across batches
        assert final[uid]["sum_value_cents"] == cents  # replay-invariant cents
