"""MappedCollection analogue — ML batch access over artifact shards
(reference ``core/_mapped_collection.py:55-700``, SURVEY §2.16).

The reference virtually concatenates N array shards with a global row
index, per-shard lazy reads, label encoding, and inverse-frequency
sample weights. Spark-native mapping:

- virtual concat        → union of shard scans (lazy, no copy)
- global row index      → per-shard offsets + row_number (deterministic,
                          unlike monotonically_increasing_id)
- label encoding        → join against a distinct-labels table
- label weights         → groupBy(label).count() → inverse frequency
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mapped_union(shards: list[DataFrame], shard_keys: list[str] | None = None) -> DataFrame:
    """Union shard DataFrames with a stable global index.

    Global index = offset(shard) + (dense per-shard row_number − 1);
    per-shard ordering follows the shard's natural column order via a
    window over a constant — deterministic given deterministic shard
    content. Lazy union; shards are only read when consumed.
    """
    out = None
    offset = 0
    for i, shard in enumerate(shards):
        key = shard_keys[i] if shard_keys else str(i)
        n = shard.count()
        w = Window.partitionBy(F.lit(1)).orderBy(*[F.col(c) for c in shard.columns[:1]])
        indexed = shard.withColumn(
            "__global_idx", F.row_number().over(w) - 1 + F.lit(offset)
        ).withColumn("__shard", F.lit(key))
        out = indexed if out is None else out.unionByName(indexed)
        offset += n
    return out


def encode_labels(df: DataFrame, label_col: str, out_col: str = "label_idx") -> tuple[DataFrame, DataFrame]:
    """StringIndexer-style encoding via a broadcast distinct-label table
    (frequency-desc then lexical order — deterministic)."""
    vocab = (
        df.groupBy(label_col)
        .count()
        .orderBy(F.desc("count"), F.asc(label_col))
        .withColumn(out_col, F.row_number().over(
            Window.orderBy(F.desc("count"), F.asc(label_col))
        ) - 1)
        .select(label_col, out_col)
    )
    return df.join(F.broadcast(vocab), label_col, "left"), vocab


def label_weights(df: DataFrame, label_col: str) -> DataFrame:
    """Inverse-frequency weights per label (reference
    ``get_label_weights``, ``_mapped_collection.py:522-565``)."""
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return counts.withColumn("weight", F.lit(float(total)) / (F.col("n") * counts.count()))
