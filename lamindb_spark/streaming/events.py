"""Structured Streaming extension (beyond-reference, SURVEY §2.14).

The reference has no streaming operators; the engine adds Spark-native
stream processing over the same event schema used in batch: parquet-
directory sources, watermarked tumbling/sliding/session windows, and
watermark-bounded stream dedup. The batch query ``hourly_events`` in
``__spark_entry__`` is exactly the plan ``windowed_counts`` runs
incrementally — one definition, two execution modes, which is the
Spark-idiomatic way to keep batch and streaming semantics aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming scan of a parquet event directory (files appearing in
    the dir are the micro-batches)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) window counts + value sums per event_type,
    late data bounded by the watermark. Works identically on a batch
    DataFrame (watermark is a no-op there)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based), the canonical stateful
    streaming aggregation."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate event_ids within the watermark horizon — bounded
    state, the streaming analogue of hash dedup."""
    src = events.withWatermark("ts", watermark)
    return src.dropDuplicatesWithinWatermark(["event_id"])


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    timeout_sec: int = 60,
    output_mode: str | None = None,
) -> DataFrame:
    """Execute a streaming query into an in-memory sink until the
    source is exhausted (test/demo helper).

    ``output_mode`` defaults by plan shape: 'complete' only for
    aggregation streams (where the memory sink wants the full result
    table each trigger), 'append' otherwise — the previous hardcoded
    'complete' made Spark REJECT every non-aggregation stream
    (dedup/stateful: "Complete output mode not supported...") and the
    batch-DataFrame branch was unreachable because .writeStream itself
    throws on batch frames (review finding)."""
    if not stream_df.isStreaming:
        raise TypeError(
            "run_stream_to_memory needs a streaming DataFrame; "
            "batch frames have .collect()"
        )
    if output_mode is None:
        plan = stream_df._jdf.queryExecution().logical().toString()
        if "FlatMapGroupsInPandasWithState" in plan:
            output_mode = "update"  # the mode the stateful op declares
        elif "Aggregate" in plan:
            output_mode = "complete"
        else:
            output_mode = "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        # a stateful query with processing-time timeouts never
        # self-terminates (each processed batch schedules a future
        # timeout batch), even under availableNow — if the query is
        # healthy and has drained its input, the data HAS been
        # processed: stop it and return what landed. A query that
        # died raises its real error; one still chewing on available
        # data genuinely timed out.
        exc = q.exception()
        drained = not q.status.get("isDataAvailable", True)
        q.stop()
        if exc is not None:
            raise exc
        if drained and q.recentProgress:
            return spark.table(name)
        raise TimeoutError(f"stream '{name}' did not drain within {timeout_sec}s")
    return spark.table(name)
