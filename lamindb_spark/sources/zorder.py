"""Z-order (Morton-curve) clustered writes for multi-dimensional data
skipping — the lakehouse layout optimization behind Delta/Iceberg's
OPTIMIZE ZORDER BY.

Why: sorting a table by ONE column gives parquet row-group min/max
stats that prune scans filtering on that column — and nothing else.
Interleaving the bits of k rank-quantized columns into one sort key
makes every file/row-group cover a small HYPERCUBE of the key space,
so predicates on ANY of the k columns skip most of the data
(~n^((k-1)/k) files touched for a point query instead of n).

Everything is JVM codegen: quantization is arithmetic on the column,
the Morton key is a chain of shift/mask/or terms, and the layout is
``repartitionByRange(key).sortWithinPartitions(key)`` — one range
shuffle, the same cost as any global sort, paid once at write time.
At 100 TB this is the difference between a full scan and touching a
few percent of files for every selective filter that follows.

Scope note: the reference (lamindb) delegates layout to its backing
warehouse; this is the Spark-native equivalent a 100 TB deployment
needs. Stats-based skipping itself is then exercised by the engine's
parquet reader (row-group pruning) — verified directly from parquet
footers in ``tests/test_zorder.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantized(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min/max-scale ``col`` to an unsigned ``bits``-bit integer rank.
    Nulls sort first (rank 0) — they cluster together, which is what
    a skipping layout wants."""
    top = (1 << bits) - 1
    span = (cmax - cmin).cast("double")
    frac = (col.cast("double") - cmin.cast("double")) / span
    q = F.floor(frac * top + 0.5).cast("long")
    return F.when(col.isNull() | (span == 0), F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(top), q))
    )


def zorder_key(qcols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each quantized column into a Morton
    key (column j contributes bit i to key position ``i*k + j``).
    ``bits * len(qcols)`` must fit a signed long (≤ 62)."""
    k = len(qcols)
    if bits * k > 62:
        raise ValueError(f"bits*cols = {bits * k} exceeds the long key budget")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qcols):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def with_zorder_key(
    df: DataFrame, by: list[str], bits: int = 16, key_col: str = "__zkey"
) -> DataFrame:
    """Attach the Morton key. Column min/max come from ONE scalar
    aggregate broadcast back (a 1-row nested-loop join — the same
    stats-pass shape as bm25's); numeric and timestamp columns only
    (timestamps quantize via their epoch value)."""
    aggs = []
    for c in by:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    stats = df.agg(*aggs)
    joined = df.join(F.broadcast(stats))
    qcols = [
        _quantized(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in by
    ]
    drop = [f"__min_{c}" for c in by] + [f"__max_{c}" for c in by]
    return joined.withColumn(key_col, zorder_key(qcols, bits)).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    by: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve over ``by``: range-partition on the Morton key (one
    shuffle), sort within each partition, drop the key before writing.
    Every output file then covers a tight hypercube — its parquet
    min/max stats prune on every ``by`` column."""
    keyed = with_zorder_key(df, by, bits=bits)
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
