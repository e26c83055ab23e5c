"""Hashed-feature logistic regression: learning behavior, integer
determinism, and scoring."""

from pyspark.sql import functions as F

from lamindb_spark.pipeline.classifier import (
    featurize,
    score_logreg,
    train_logreg,
    token_bucket,
)
from lamindb_spark.sources.literals import literal_table


def _toy_docs(spark):
    rows = []
    for i in range(30):
        rows.append((i, "good clean prose with structure and meaning"))
    for i in range(30, 60):
        rows.append((i, "zz qq junk junk zz garbled qq noise"))
    return literal_table(spark, rows, ["doc_id", "text"])


def test_logreg_learns_separable_labels(spark):
    docs = _toy_docs(spark)
    label = F.array_contains(
        F.split(F.col("text"), " "), "junk"
    )
    feats = featurize(docs, label, n_buckets=64)
    w, bias = train_logreg(feats, n_buckets=64, iters=20, lr_num=2, lr_den=1)
    scored = {
        r["doc_id"]: r["prob"]
        for r in score_logreg(feats, w, bias).collect()
    }
    pos = [scored[i] for i in range(30, 60)]
    neg = [scored[i] for i in range(30)]
    assert min(pos) > max(neg), (min(pos), max(neg))
    assert min(pos) > 0.8 and max(neg) < 0.2


def test_logreg_training_is_deterministic(spark):
    docs = _toy_docs(spark)
    label = F.col("doc_id") >= 30
    feats = featurize(docs, label, n_buckets=32)
    a = train_logreg(feats, n_buckets=32, iters=5)
    b = train_logreg(feats, n_buckets=32, iters=5)
    assert a == b
    assert all(isinstance(x, int) for x in a[0]) and isinstance(a[1], int)


def test_token_bucket_matches_hash_split_idiom(spark):
    # same md5-prefix arithmetic as rules.hash_split: value pinned so
    # an engine upgrade that changes conv/md5 behavior fails loudly
    row = spark.range(1).select(
        token_bucket(F.lit("spark"), 128).alias("b")
    ).first()
    import hashlib

    expect = int(hashlib.md5(b"spark").hexdigest()[:8], 16) % 128
    assert row["b"] == expect
