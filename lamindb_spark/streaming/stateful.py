"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in streaming surface (windows, session windows, watermark
dedup — ``streaming.events``) covers aggregations Spark already knows.
This module is the escape hatch the north star calls for: arbitrary
per-key state machines over an unbounded stream, expressed as a pandas
function with explicit ``GroupState`` — here, a running per-user
activity profile (event count, value sum, last-seen timestamp) that
emits an updated row per key per micro-batch.

Scale notes: state lives in the state store (one entry per key,
checkpointed, RocksDB-backed on real clusters); each micro-batch
shuffles only that batch's rows to their key's partition. State is
evicted by processing-time timeout — unbounded key domains need a
timeout or state grows forever.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_cents", LongType()),
        StructField("last_seen_us", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-EVENT cents rounding (not round-of-batch-sum) so the
        # accumulated state is replay-invariant: any micro-batch split
        # of the stream yields the same profile as the batch-twin
        # window query (__spark_entry__._q_user_profiles). HALF_UP
        # (away from zero) explicitly: pandas .round() is half-to-even
        # and diverges from Spark F.round on exact .5 cents (review
        # finding — value=0.125 gave 12 here vs the twin's 13).
        v = pdf["value"].fillna(0.0).mul(100)
        cents += int(np.copysign(np.floor(np.abs(v) + 0.5), v).sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
    state.update((n, cents, last_us))
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict idle keys after a day
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "sum_value_cents": cents, "last_seen_us": last_us}]
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running activity profile over an event stream.

    Each micro-batch emits the UPDATED profile row for every user seen
    in that batch (update output mode); state persists across batches.
    Works only on streaming DataFrames — the batch equivalent is a
    plain ``groupBy().agg()``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
