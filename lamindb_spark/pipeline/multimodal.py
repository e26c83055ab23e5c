"""Multimodal payload columns: image/audio/video as opaque binary +
typed metadata, processed with Arrow-batched pandas iterators.

Design (BASELINE.json north star): media cells are ``binary`` columns
with a sidecar metadata struct; decode / feature-extraction / resize /
frame-sampling run as ``mapInPandas`` stages — per-partition Arrow
batches, so bytes move JVM→Python once per batch, never per row. The
actual codecs (PIL/libav) are NOT in this environment, so the decode
kernel is stubbed behind ``DECODERS`` with a deterministic fake: the
Spark-side plumbing — schema, batching, partition sizing — is real and
tested; swapping in a real codec is a one-function change.

At 100 TB: binary columns dominate row size → partition by
``bytes-per-partition`` not rows (``repartitionByRange`` on a size
column or small ``maxPartitionBytes``), and keep metadata in separate
small columns so metadata-only queries never touch the bytes (columnar
pruning does this for free in parquet).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
    ]
)


def _fake_decode(content: bytes) -> list[float]:
    """STUB decoder: deterministic pseudo-pixels from the byte stream.

    Replace with a real codec (PIL.Image.open / soundfile / pyav) —
    same signature: bytes in, float feature vector out. Raising
    NotImplementedError here would be honest too; the deterministic
    fake lets the downstream plumbing be exercised end-to-end.
    """
    if content is None:
        return []
    return [b / 255.0 for b in content[:256]]


DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def extract_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas``.

    One Python worker per partition, Arrow batches of ``batch_size``
    rows (set small — media cells are megabytes each; cap with
    ``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = row["content"]
                decode = DECODERS.get(row["kind"], _fake_decode)
                pixels = np.asarray(decode(content), dtype="float64")
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(content) if content is not None else 0,
                        "content_hash": hashlib.md5(content or b"").hexdigest(),
                        "feat_mean": float(pixels.mean()) if pixels.size else 0.0,
                        "feat_std": float(pixels.std()) if pixels.size else 0.0,
                    }
                )
            yield pd.DataFrame(out)

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return media.mapInPandas(_process, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (decode stubbed — emits frame offsets; a real
    implementation decodes at each offset). Pure-DataFrame explode, so
    the fan-out happens JVM-side before any Python decode stage."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_offset_ms"),
        )
    )


def media_from_binary_files(spark, path_glob: str, kind: str) -> DataFrame:
    """Ingest media files via Spark's binaryFile source — each file one
    row (path, modificationTime, length, content).

    Note: the binaryFile source silently skips zero-byte files
    (observed on Spark 4.1) — count inputs independently if exact file
    accounting matters.
    """
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int, batch_size: int = 64) -> DataFrame:
    """Resize stage for image rows via ``mapInPandas`` — identical
    batch shape to :func:`extract_features`.

    STUB kernel: no image codec ships in this environment, so the
    "resize" deterministically truncates/pads the byte stream to
    ``width*height`` bytes (real implementation: PIL
    ``Image.open(...).resize((w, h))`` re-encoded — one-function swap,
    the Spark-side schema/batching/partitioning is what this module
    pins down).
    """

    def _process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                resized = bytes(content[:target]).ljust(target, b"\0")
                out.append(
                    {
                        "media_id": row["media_id"],
                        "content": resized,
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(out)

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return media.filter(F.col("kind") == "image").mapInPandas(_process, RESIZED_SCHEMA)
