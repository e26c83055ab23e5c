"""Multimodal binary columns + MappedCollection analogue."""

from pyspark.sql import Row, functions as F

from lamindb_spark.pipeline.mapped import encode_labels, label_weights, mapped_union
from lamindb_spark.pipeline.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    sample_frames,
)
from lamindb_spark.sources.literals import literal_table


def _media(spark):
    rows = [
        Row(media_id=1, kind="image", content=bytes(range(200)), mime="image/png",
            width=10, height=20, duration_ms=None),
        Row(media_id=2, kind="video", content=b"\xff" * 64, mime="video/mp4",
            width=None, height=None, duration_ms=3500),
        Row(media_id=3, kind="audio", content=None, mime=None,
            width=None, height=None, duration_ms=None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_batched(spark):
    got = {r["media_id"]: r for r in extract_features(_media(spark)).collect()}
    assert got[1]["n_bytes"] == 200 and 0 < got[1]["feat_mean"] < 1
    assert got[2]["feat_std"] == 0.0          # constant bytes
    assert got[3]["n_bytes"] == 0             # null content survives
    assert len(got[1]["content_hash"]) == 32


def test_sample_frames_plan(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    # 3500ms video at 1s sampling → frames 0,1,2 (JVM-side explode)
    assert [(r["frame_idx"], r["frame_offset_ms"]) for r in frames] == [
        (0, 0), (1, 1000), (2, 2000),
    ]


def test_mapped_union_global_index(spark):
    s1 = literal_table(spark, [(1, "a"), (2, "b")], ["id", "label"])
    s2 = literal_table(spark, [(3, "a"), (4, "c"), (5, "a")], ["id", "label"])
    u = mapped_union([s1, s2], shard_keys=["s1", "s2"])
    idx = sorted(r["__global_idx"] for r in u.collect())
    assert idx == [0, 1, 2, 3, 4]  # contiguous across shards
    assert u.filter(F.col("__shard") == "s2").count() == 3


def test_label_encoding_and_weights(spark):
    df = literal_table(
        spark, [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c")], ["id", "label"]
    )
    encoded, vocab = encode_labels(df, "label")
    m = {r["label"]: r["label_idx"] for r in vocab.collect()}
    assert m == {"a": 0, "b": 1, "c": 2}  # frequency-desc then lexical
    w = {r["label"]: r["weight"] for r in label_weights(df, "label").collect()}
    assert w["b"] == w["c"] > w["a"]  # inverse frequency


def test_resize_images_stub_plumbing(spark):
    from lamindb_spark.pipeline.multimodal import MEDIA_SCHEMA, resize_images

    rows = [
        (1, "image", b"\x01\x02\x03\x04\x05", "image/png", 10, 10, None),
        (2, "audio", b"\xff", "audio/wav", None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, width=2, height=2).collect()
    assert len(out) == 1  # audio filtered out before the Python stage
    r = out[0]
    assert r["media_id"] == 1 and len(r["content"]) == 4
    assert (r["width"], r["height"]) == (2, 2)
