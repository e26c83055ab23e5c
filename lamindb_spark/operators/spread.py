"""Input-parallelism repair for CPU-heavy map stages.

Two related gates live in this repo:

- ``pipeline.dedup._spread`` — SIZE-gated (≥64 MB): right for cheap
  per-row kernels (hashing, regex), where shuffling a small input
  costs more than processing it on its 1-2 scan partitions
  (VERDICT r03 #1 adjudicated this).
- :func:`spread_for_cpu` (here) — PARALLELISM-gated only: right for
  expensive per-row kernels (interpreted higher-order-function chains:
  entropy folds, BPE replace chains, per-token scoring), where even a
  sub-megabyte input carries seconds of single-core CPU. The shuffle
  it inserts is bounded by the input size — by definition small in the
  only regime where the gate fires (scan partitions < cluster
  parallelism). At 100 TB the scan already has orders of magnitude
  more splits than cores and this is a provable no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster default parallelism iff the
    current scan under-splits it; no-op (and no exchange) otherwise."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
