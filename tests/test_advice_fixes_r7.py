"""Regression tests for the round-6 ADVICE findings and VERDICT r6 #2.

Each test pins one specific fix:
- PQ ADC tables are keyed by the cid a code actually carries, so a
  codebook gapped by a cell death during Lloyd rounds still scores
  every row correctly (the r6 latent positional-lookup bug);
- _snapshot_schema folds ALL live parquet footers (mergeSchema), so
  schema enforcement stays deterministic after a mode='merge'
  evolution;
- stream_merge_exactly_once handles a key-only stream (no non-key
  columns) instead of raising on groupBy().agg(*[]);
- silhouette_scores' broadcast-packed path is bit-identical to the
  literal path (the k=1000+ plan-size route, VERDICT r6 #2);
- pq_encode's broadcast-packed path is bit-identical to the literal
  path.
"""

import pytest
from pyspark.sql import functions as F


def _gapped_embeddings(spark):
    """9 vectors engineered so k=3 init has two IDENTICAL centroids:
    vec0 == vec1, so cell 1 gets zero assignments on the first Lloyd
    round (argmin ties break to the lowest cid) and the trained
    codebook is gapped — cids {0, 2} with 1 missing."""
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # duplicate of vec0 -> cell 1 starves
        (2, [10.0, 10.0, 10.0, 10.0]),
        (3, [0.1, 0.1, 0.0, 0.0]),
        (4, [10.1, 9.9, 10.0, 10.0]),
        (5, [0.0, 0.2, 0.1, 0.0]),
        (6, [9.9, 10.2, 10.0, 10.1]),
        (7, [0.2, 0.0, 0.0, 0.1]),
        (8, [10.0, 10.0, 9.8, 10.2]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pq_adc_correct_on_gapped_codebook(spark):
    """After a cell death the codebook cids skip a value; codes above
    the gap must still look up THEIR OWN distance (positional lookup
    read the wrong entry and nulled the top code)."""
    from lamindb_spark.pipeline.similarity import (
        _quant_half_up,
        pq_adc_topk,
        pq_distance_table,
        pq_encode,
        pq_train,
    )

    df = _gapped_embeddings(spark)
    books = pq_train(df, dim=4, m=2, k=3, iters=2)
    # the engineered gap actually happened: cid 1 is gone, cids not dense
    for book in books:
        cids = [cid for cid, _ in book]
        assert cids == [0, 2], cids
    enc = {
        r["vec_id"]: (r["code_0"], r["code_1"])
        for r in pq_encode(df, books, dim=4).collect()
    }
    assert {c for pair in enc.values() for c in pair} == {0, 2}
    q = [0.0, 0.0, 0.0, 0.0]
    table = pq_distance_table(books, q)
    top = pq_adc_topk(pq_encode(df, books, dim=4), table, k=9).collect()
    assert len(top) == 9
    # every score non-null and equal to the exact python cid-keyed replay
    for r in top:
        want = sum(dict(table[s])[enc[r["vec_id"]][s]] for s in range(2))
        assert r["adc_d2"] is not None and r["adc_d2"] == want
    # far-cluster codes (cid 2) must carry the far distance, not cell 0's
    far = dict(table[0])[2]
    near = dict(table[0])[0]
    assert far > near
    scores = {r["vec_id"]: r["adc_d2"] for r in top}
    assert scores[2] > scores[0]  # vec2 is in the far cluster
    assert _quant_half_up(10.0) == 10_000_000


def test_snapshot_schema_merges_evolved_footers(spark, tmp_path):
    """After mode='merge' adds a column, the inferred table schema must
    contain BOTH generations' columns regardless of which footer Spark
    would sample — enforce checks must be deterministic."""
    from lamindb_spark.catalog.commitlog import (
        CommitLog,
        SchemaMismatchError,
        _snapshot_schema,
        append_dataframe,
    )

    path = str(tmp_path / "tbl")
    append_dataframe(spark.createDataFrame([(1, "a")], ["id", "name"]), path)
    append_dataframe(
        spark.createDataFrame([(2, "b", 7.5)], ["id", "name", "score"]),
        path,
        mode="merge",
    )
    schema = _snapshot_schema(spark, CommitLog(path))
    assert {f.name for f in schema.fields} == {"id", "name", "score"}
    # deterministic enforcement: an append matching only the OLD schema
    # must now consistently fail enforce (score is a table column)
    with pytest.raises(SchemaMismatchError):
        append_dataframe(
            spark.createDataFrame([(3, "c")], ["id", "name"]), path, mode="enforce"
        )
    # and a full-width append still lands
    append_dataframe(
        spark.createDataFrame([(4, "d", 1.0)], ["id", "name", "score"]), path
    )


def test_stream_merge_key_only_stream(spark, tmp_path):
    """A stream carrying ONLY the merge key must dedup via distinct
    keys, not raise on an empty aggregate list."""
    from lamindb_spark.catalog.commitlog import read_committed
    from lamindb_spark.streaming.sink import stream_merge_exactly_once

    src = str(tmp_path / "src")
    spark.createDataFrame([(1,), (2,), (2,), (3,)], ["id"]).coalesce(1).write.json(src)
    stream = spark.readStream.schema("id long").json(src)
    table = str(tmp_path / "tbl")
    stream_merge_exactly_once(
        stream, table, "id", str(tmp_path / "ckpt"), query_name="keyonly"
    )
    got = sorted(r["id"] for r in read_committed(spark, table).collect())
    assert got == [1, 2, 3]


def test_silhouette_broadcast_parity(spark):
    """Broadcast-packed centroids give bit-identical silhouettes to the
    literal path (and the plan no longer inlines k*dim literals)."""
    from lamindb_spark.pipeline.similarity import kmeans_fit, silhouette_scores

    df = _gapped_embeddings(spark)
    cents = kmeans_fit(df, k=3, iters=2)
    lit = {
        r["vec_id"]: (r["cell"], r["silhouette"])
        for r in silhouette_scores(df, cents, method="literal").collect()
    }
    bc = {
        r["vec_id"]: (r["cell"], r["silhouette"])
        for r in silhouette_scores(df, cents, method="broadcast").collect()
    }
    assert lit == bc and len(lit) == 9


def test_pq_encode_broadcast_parity(spark):
    """Broadcast-packed codebooks emit the same codes as literal
    argmins, including on a gapped codebook."""
    from lamindb_spark.pipeline.similarity import pq_encode, pq_train

    df = _gapped_embeddings(spark)
    books = pq_train(df, dim=4, m=2, k=3, iters=2)
    lit = sorted(
        tuple(r) for r in pq_encode(df, books, dim=4, method="literal").collect()
    )
    bc = sorted(
        tuple(r) for r in pq_encode(df, books, dim=4, method="broadcast").collect()
    )
    assert lit == bc and len(lit) == 9


def test_model_cache_hit_and_isolation(spark):
    """Same cache_key + hyperparams => cached model (no retrain);
    mutating a returned model must not poison the cache; different
    hyperparams miss."""
    from lamindb_spark.pipeline import similarity as S

    df = _gapped_embeddings(spark)
    S._MODEL_CACHE.clear()
    a = S.kmeans_fit(df, k=3, iters=2, cache_key="fp1")
    assert len(S._MODEL_CACHE) == 1
    b = S.kmeans_fit(df.limit(0), k=3, iters=2, cache_key="fp1")  # would fail w/o hit
    assert a == b
    b[0][1][0] = 999.0  # mutate the returned copy
    c = S.kmeans_fit(df.limit(0), k=3, iters=2, cache_key="fp1")
    assert c == a and c[0][1][0] != 999.0
    d = S.kmeans_fit(df, k=2, iters=2, cache_key="fp1")
    assert len(S._MODEL_CACHE) == 2 and d != a
    books = S.pq_train(df, dim=4, m=2, k=3, iters=2, cache_key="fp1")
    books2 = S.pq_train(df.limit(0), dim=4, m=2, k=3, iters=2, cache_key="fp1")
    assert books == books2
    S._MODEL_CACHE.clear()
