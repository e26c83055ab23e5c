"""Streaming near-duplicate admission control: continuous corpus
ingestion where each micro-batch of documents is MinHash-LSH-checked
against everything admitted so far, and only novel documents land.

This is the streaming composition of two certified batch kernels —
``pipeline.dedup.minhash_signatures`` + ``band_buckets`` — with the
commit-log's exactly-once txn sink: the admitted documents AND their
bucket index entries append through
``catalog.commitlog.append_dataframe_txn`` keyed on the micro-batch
id, so a replayed batch (the documented at-least-once edge of
``foreachBatch``) is recognized and skipped instead of re-admitting.

Admission rule (the online greedy LSH dedup used by large-corpus
pipelines): a document is admitted iff none of its band buckets is
already claimed — by the persisted index (prior batches) or by an
earlier-``id`` admitted document of the SAME batch. Rejected documents
claim nothing, so a near-dup of a REJECTED doc that is novel w.r.t.
every admitted doc still gets in — greedy semantics, matching what a
sequential one-at-a-time ingest would do.

Scale shape: the common case (no collision anywhere) is fully
vectorized — signatures, banding, one broadcast-or-shuffle semi-join
against the index, one in-batch bucket count. Only the COLLIDING
subset needs greedy resolution: a small conflict set resolves
driver-side (a few collected rows beat Spark rounds); above
``max_conflicts`` the DISTRIBUTED kernel takes over
(:func:`_resolve_conflicts_distributed` — iterative local-minima
elimination, the parallel form of the same greedy order), so a
duplicate-heavy batch costs extra Spark rounds, never an unbounded
driver collect and never a wedged stream.

Crash-window audit (same discipline as ``stream_append_exactly_once``):
the two txn appends share the batch id and run docs-first. If the
docs-append commits and the index-append crashes, the replay
recomputes the SAME admitted set (minhash is deterministic and the
index cannot yet contain this batch's keys — that append is the one
that failed), skips the docs-append via its txn marker, and lands the
index rows. If BOTH committed and only the streaming checkpoint was
lost, the sink detects the batch's index txn marker and skips before
recomputing — a recompute would see the batch's own index entries and
mis-flag every doc as conflicted (review finding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.commitlog import CommitLog, append_dataframe_txn, read_committed
from ..pipeline.dedup import band_buckets, minhash_signatures


def _resolve_conflicts_distributed(
    keys: DataFrame,
    conflicted: DataFrame,
    hit_index: DataFrame | None,
    id_col: str,
    max_iters: int = 50,
) -> DataFrame:
    """Admitted ids among the colliding subset, resolved DISTRIBUTED
    (VERDICT r11 #4): the greedy sequential admission — process docs
    in ascending id, admit unless a bucket is already claimed by an
    earlier ADMITTED doc — is exactly the lexicographically-first
    maximal independent set of the conflict graph (docs conflict iff
    they share a band bucket). That MIS parallelizes as iterative
    local-minima elimination, never materializing the pairwise graph
    (a degenerate bucket with B docs would be B² edges):

    per round, over still-UNDECIDED docs: (1) min undecided id per
    bucket; (2) a doc whose id equals that min in EVERY bucket it
    holds has no smaller undecided neighbor — sequential greedy would
    reach it with all its buckets unclaimed, so it is ADMITTED; (3)
    undecided docs sharing a bucket with a round-admitted doc are
    REJECTED (their bucket is now claimed by an earlier admitted id);
    (4) repeat on the remainder. Index-hit docs are rejected up front
    and claim nothing — same as the sequential gate. Converges in
    O(longest id-chain through shared buckets) rounds; each round is
    two bucket-keyed aggregates + semi/anti-joins, checkpointed so the
    plan never grows. Rejected docs drop out WITHOUT claiming buckets,
    preserving the greedy "a near-dup of a rejected doc can still be
    novel" semantics.
    """
    conf_keys = keys.join(conflicted, [id_col], "left_semi")
    undecided = conflicted
    if hit_index is not None:
        undecided = undecided.join(hit_index, [id_col], "left_anti")
    undecided = undecided.select(id_col).localCheckpoint(eager=True)
    admitted = None
    for _round in range(max_iters):
        if not undecided.head(1):
            break
        live_keys = conf_keys.join(undecided, [id_col], "left_semi")
        bucket_min = live_keys.groupBy("band", "bucket").agg(
            F.min(id_col).alias("__bmin")
        )
        round_admitted = (
            live_keys.join(bucket_min, ["band", "bucket"])
            .groupBy(id_col)
            # every bucket's min must be the doc itself; bmin ≤ id
            # always (the doc sits in the bucket), so min(bmin)==id ⇔
            # no smaller undecided id shares ANY bucket
            .agg(F.min("__bmin").alias("__m"))
            .filter(F.col("__m") == F.col(id_col))
            .select(id_col)
            .localCheckpoint(eager=True)
        )
        admitted = (
            round_admitted
            if admitted is None
            else admitted.unionByName(round_admitted).localCheckpoint(eager=True)
        )
        claimed = (
            live_keys.join(round_admitted, [id_col], "left_semi")
            .select("band", "bucket")
            .distinct()
        )
        losers = (
            live_keys.join(claimed, ["band", "bucket"], "left_semi")
            .select(id_col)
            .distinct()
        )
        undecided = undecided.join(losers, [id_col], "left_anti").localCheckpoint(
            eager=True
        )
    else:
        raise RuntimeError(
            f"conflict resolution did not converge in {max_iters} rounds "
            "(id-chain through shared buckets longer than max_iters)"
        )
    if admitted is None:
        return conflicted.select(id_col).limit(0)
    return admitted


def _admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_path: str,
    text_col: str,
    id_col: str,
    k_shingle: int,
    n_hashes: int,
    n_bands: int,
    rows_per_band: int,
    max_conflicts: int,
) -> tuple[DataFrame, DataFrame]:
    """(admitted docs, their band keys) for one micro-batch."""
    sigs = minhash_signatures(batch_df, text_col, id_col, k_shingle, n_hashes)
    keys = band_buckets(sigs, id_col, n_bands, rows_per_band).localCheckpoint(
        eager=True
    )  # consumed 3× below (index probe, in-batch counts, admitted keys)
    try:
        index = read_committed(spark, index_path).select("band", "bucket")
    except FileNotFoundError:  # first batch: no index table yet
        index = None
    hit_index = (
        keys.join(index, ["band", "bucket"], "left_semi")
        .select(id_col)
        .distinct()
        if index is not None
        else None
    )
    in_batch = (
        keys.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    shared = (
        keys.join(in_batch.select("band", "bucket"), ["band", "bucket"], "left_semi")
        .select(id_col)
        .distinct()
    )
    conflicted = (
        shared.unionByName(hit_index) if hit_index is not None else shared
    ).distinct()
    # fast path: untouched docs admit vectorized, no driver involvement
    clean_keys = keys.join(conflicted, [id_col], "left_anti")

    # slow path: greedy resolution of the colliding subset, id order.
    # Small conflict sets resolve driver-side (a few collected rows
    # beat several Spark rounds); above max_conflicts the DISTRIBUTED
    # equivalent takes over (VERDICT r11 #4) — a duplicate-heavy batch
    # degrades to extra Spark rounds instead of a ValueError, and the
    # admitted set is identical (both compute the lex-first MIS of the
    # shared-bucket conflict graph).
    n_conf = conflicted.count()
    if n_conf > max_conflicts:
        dist = _resolve_conflicts_distributed(keys, conflicted, hit_index, id_col)
        admitted_ids = (
            keys.join(conflicted, [id_col], "left_anti")
            .select(id_col)
            .distinct()
            .unionByName(dist.select(id_col))
        )
        admitted_docs = batch_df.join(admitted_ids, [id_col], "left_semi")
        admitted_keys = keys.join(admitted_ids, [id_col], "left_semi")
        return admitted_docs, admitted_keys
    resolved_ids: list = []
    if n_conf:
        conf_keys = keys.join(conflicted, [id_col], "left_semi")
        hit_ids = (
            {r[0] for r in hit_index.collect()} if hit_index is not None else set()
        )
        by_doc: dict = {}
        for r in conf_keys.collect():
            by_doc.setdefault(r[id_col], []).append((r["band"], r["bucket"]))
        claimed: set = set()
        for doc in sorted(by_doc):
            if doc in hit_ids:
                continue  # index-claimed bucket: rejected, claims nothing
            if any(bb in claimed for bb in by_doc[doc]):
                continue  # loses to an earlier admitted batch peer
            claimed.update(by_doc[doc])
            resolved_ids.append(doc)

    admitted_ids = clean_keys.select(id_col).distinct()
    if resolved_ids:
        extra = spark.createDataFrame(
            [(i,) for i in resolved_ids], admitted_ids.schema
        )
        admitted_ids = admitted_ids.unionByName(extra)
    admitted_docs = batch_df.join(admitted_ids, [id_col], "left_semi")
    admitted_keys = keys.join(admitted_ids, [id_col], "left_semi")
    return admitted_docs, admitted_keys


def stream_admit_neardup(
    docs_stream: DataFrame,
    accepted_path: str,
    index_path: str,
    checkpoint_dir: str,
    query_name: str = "neardup",
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    rows_per_band: int = 4,
    max_conflicts: int = 100_000,
    timeout_sec: float = 300,
):
    """Drain ``docs_stream`` through the near-dup admission gate:
    admitted documents append to the ``accepted_path`` commit-log
    table, their band keys to ``index_path`` (the accumulated corpus
    index), both exactly-once per micro-batch. ``availableNow``
    trigger — processes everything currently in the source and stops
    (call again on the same checkpoint for incremental re-drains).
    """
    spark = docs_stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # Fully-applied replay guard (review finding): if the INDEX
        # append (the second/last txn) already carries this batch id,
        # both appends landed and the batch must skip BEFORE
        # recomputing — a recompute would see the batch's own index
        # entries, flag every doc as conflicted, and a batch larger
        # than max_conflicts would then wedge the stream on every
        # restart. (Index-committed implies docs-committed: the
        # appends are sequential.)
        # (known_txns returns an empty set for a not-yet-created table
        # — LogStore.list is [] on a missing prefix — so no guard)
        if (f"{query_name}:index", batch_id) in CommitLog(index_path).known_txns():
            return
        docs, keys = _admit_batch(
            spark,
            batch_df,
            index_path,
            text_col,
            id_col,
            k_shingle,
            n_hashes,
            n_bands,
            rows_per_band,
            max_conflicts,
        )
        append_dataframe_txn(docs, accepted_path, f"{query_name}:docs", batch_id)
        append_dataframe_txn(keys, index_path, f"{query_name}:index", batch_id)

    q = (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream '{query_name}' did not drain within {timeout_sec}s"
        )
    versions = CommitLog(accepted_path).versions()
    return versions[-1] if versions else None
