"""Composed corpus curation pipeline + chunking / PII / heavy hitters
/ contamination operators."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.pipeline.corpus import (
    chunk_documents,
    curate_corpus,
    token_frequencies,
)
from lamindb_spark.sources.literals import literal_table


def test_curate_corpus_verdicts(spark):
    docs = literal_table(
        spark,
        [
            (1, "the cat and the dog of a house sat on the mat near the door and slept all day " * 3),
            (2, "the cat and the dog of a house sat on the mat near the door and slept all day " * 3),  # dup of 1
            (3, "el perro y el gato de la casa que los dos " * 5),  # spanish
            (4, "tiny"),  # too short
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curate_corpus(docs).collect()}
    assert out[1]["keep"] is True and out[1]["is_keeper"] is True and out[1]["n_copies"] == 2
    assert out[2]["keep"] is False and out[2]["is_keeper"] is False  # dup loser
    assert out[3]["keep"] is False and out[3]["pred_lang"] == "es"
    assert out[4]["keep"] is False and out[4]["n_tokens"] == 1


def test_chunk_documents_windows(spark):
    toks = " ".join(f"w{i}" for i in range(11))  # 11 tokens
    docs = literal_table(spark, [(1, toks), (2, "short doc")], ["doc_id", "text"])
    out = chunk_documents(docs, chunk_size=5, overlap=2)  # step 3
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
         for r in out.collect())
    )
    # doc 1: starts 0,3,6,9 → windows of ≤5 tokens, overlap 2
    d1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2, 3]
    assert d1[0][2] == "w0 w1 w2 w3 w4" and d1[0][3] == 5
    assert d1[1][2] == "w3 w4 w5 w6 w7"          # overlap of 2 with chunk 0
    assert d1[3][2] == "w9 w10" and d1[3][3] == 2  # short tail
    d2 = [r for r in rows if r[0] == 2]
    assert d2 == [(2, 0, "short doc", 2)]
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=5, overlap=5)


def test_token_frequencies_topk(spark):
    docs = literal_table(
        spark,
        [(1, "a b a c a b"), (2, "b c d")],
        ["doc_id", "text"],
    )
    got = [(r["token"], r["n"]) for r in token_frequencies(docs, k=3).collect()]
    assert got == [("a", 3), ("b", 3), ("c", 2)]  # ties break lexically


def test_redact_pii(spark):
    from lamindb_spark.functions.text import redact_pii

    docs = literal_table(
        spark,
        [(1, "mail bob.smith+x@sub.example.org or 555-010-1234 from 192.168.0.1 ok"),
         (2, "clean text with numbers 12345 and v1.2 stays")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["r"] for r in
           docs.select("doc_id", redact_pii(F.col("text")).alias("r")).collect()}
    assert got[1] == "mail <EMAIL> or <PHONE> from <IP> ok"
    assert got[2] == "clean text with numbers 12345 and v1.2 stays"


def test_contamination_overlap(spark):
    from lamindb_spark.pipeline.dedup import contamination_overlap

    bench = literal_table(
        spark, [(1, "the quick brown fox jumps high")], ["doc_id", "text"]
    )
    train = literal_table(
        spark,
        [(10, "the quick brown fox jumps high today"),   # heavy overlap
         (11, "a completely different document body here"),  # clean
         (12, "quick brown fox seen again")],             # partial
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in
           contamination_overlap(train, bench).collect()}
    assert got[10]["contaminated"] and got[10]["n_shared"] == 4
    assert not got[11]["contaminated"] and got[11]["n_shared"] == 0
    assert got[12]["contaminated"] and got[12]["n_shared"] == 1  # 'quick brown fox'
    assert 0 < got[12]["overlap_ratio"] < got[10]["overlap_ratio"]


def test_dedup_lines_canonical_occurrence(spark):
    docs = literal_table(
        spark,
        [
            (1, "alpha beta\nshared boilerplate line\nunique one"),
            (2, "shared boilerplate line\nunique two"),
            (3, "x\nrepeat me\nrepeat me\ny"),  # intra-doc dup
        ],
        ["doc_id", "text"],
    )
    from lamindb_spark.pipeline.corpus import dedup_lines

    out = {r["doc_id"]: r for r in dedup_lines(docs, min_chars=2).collect()}
    # doc 1 is the canonical holder of the shared line
    assert out[1]["clean_text"] == "alpha beta\nshared boilerplate line\nunique one"
    assert out[1]["n_dropped"] == 0
    # doc 2 loses its copy
    assert out[2]["clean_text"] == "unique two"
    assert out[2]["n_kept"] == 1 and out[2]["n_dropped"] == 1
    # intra-doc repeat: only the first occurrence survives; the
    # 1-char lines are below min_chars and bypass dedup entirely
    assert out[3]["clean_text"] == "x\nrepeat me\ny"
    assert out[3]["n_dropped"] == 1


def test_dedup_lines_min_chars_guard(spark):
    docs = literal_table(
        spark, [(1, "a\nb\na"), (2, "a\nc")], ["doc_id", "text"]
    )
    from lamindb_spark.pipeline.corpus import dedup_lines

    # min_chars=2: every 1-char line is exempt — nothing is dropped
    out = {r["doc_id"]: r for r in dedup_lines(docs, min_chars=2).collect()}
    assert out[1]["n_dropped"] == 0 and out[2]["n_dropped"] == 0
    # min_chars=1: corpus-wide 'a' collapses to doc 1's first copy
    out = {r["doc_id"]: r for r in dedup_lines(docs, min_chars=1).collect()}
    assert out[1]["clean_text"] == "a\nb" and out[2]["clean_text"] == "c"


def test_dedup_token_spans_reassembly(spark):
    # spans of 2 tokens; docs 1 and 2 share the span "p q"
    docs = literal_table(
        spark,
        [(1, "p q r s"), (2, "p q t u"), (3, "v w")],
        ["doc_id", "text"],
    )
    from lamindb_spark.pipeline.corpus import dedup_token_spans

    out = {r["doc_id"]: r for r in dedup_token_spans(docs, span_tokens=2).collect()}
    assert out[1]["clean_text"] == "p q r s"
    assert out[2]["clean_text"] == "t u" and out[2]["n_dropped"] == 1
    assert out[3]["clean_text"] == "v w"


def test_bm25_ranking_order(spark):
    docs = literal_table(
        spark,
        [
            (1, "spark spark spark"),          # high tf, short
            (2, "spark " + "filler " * 50),    # tf 1, long doc → penalized
            (3, "spark spark other words"),
            (4, "nothing relevant here"),      # score 0 → excluded
        ],
        ["doc_id", "text"],
    )
    from lamindb_spark.pipeline.corpus import bm25_rank

    rows = bm25_rank(docs, ["spark"], top_n=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 4 not in ids
    # tf saturation + length normalization: doc 1 beats 3 beats 2
    assert ids == [1, 3, 2]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_semantic_dedup_drops_near_neighbor(spark):
    from lamindb_spark.pipeline.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.14, 0.0, 0.0]),   # near-dup of 0 (cos ≈ 0.99)
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, k=4, iters=2, threshold=0.9).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False            # lower-id neighbour 0 wins
    assert all(out[i]["keep"] for i in (2, 3, 4))
    assert out[0]["cell"] == out[1]["cell"]   # same cluster → same block


def test_vocab_coverage_oov_ratio(spark):
    docs = literal_table(
        spark,
        [
            (1, "a a a b"),      # all in-vocab (vocab_size=2 → {a, b})
            (2, "a b zz qq"),    # half OOV
            (3, "qq zz"),        # all OOV (b wins the count tie lexically)
        ],
        ["doc_id", "text"],
    )
    from lamindb_spark.pipeline.corpus import vocab_coverage

    out = {r["doc_id"]: r for r in vocab_coverage(docs, vocab_size=2).collect()}
    assert out[1]["oov_ratio"] == 0.0 and out[1]["n_tokens"] == 4
    assert out[2]["oov_ratio"] == 0.5
    assert out[3]["oov_ratio"] == 1.0


def test_bigram_lm_scores_hand_math(spark):
    import math

    docs = literal_table(
        spark,
        [(1, "a b a b"), (2, "a b"), (3, "b zz"), (4, "solo")],
        ["doc_id", "text"],
    )
    from lamindb_spark.pipeline.corpus import bigram_lm_scores

    out = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    # corpus: unigrams a:3 b:4 zz:1 solo:1 → V=4
    # bigrams: (a,b):3 (b,a):1 (b,zz):1
    def p(c2, c1):
        return (c2 + 1.0) / (c1 + 4.0)

    # doc 1: bigrams (a,b),(b,a),(a,b) → nll = mean(-log2 p)
    want1 = -(2 * math.log2(p(3, 3)) + math.log2(p(1, 4))) / 3
    assert abs(out[1]["avg_nll"] - round(want1, 6)) < 1e-9
    assert out[1]["n_bigrams"] == 3
    # doc 3: (b,zz) rare → higher nll than doc 2's common (a,b)
    assert out[3]["avg_nll"] > out[2]["avg_nll"]
    # doc 4: single token → no bigrams → absent
    assert 4 not in out


def test_elect_representatives_quality_keeper(spark):
    from lamindb_spark.pipeline.corpus import elect_representatives

    # docs 1/2/3 collide after normalization (ws-collapse + lowercase);
    # doc 9 is unique
    base = "a decent sentence with reasonable words overall repeated here"
    docs = literal_table(
        spark,
        [
            (1, base),
            (2, base + "  "),          # trailing ws → same normalized form
            (3, base.upper()),          # lowercased → same normalized form
            (9, "another unique document body"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in elect_representatives(docs).collect()}
    # one keeper for the 3-copy group, plus the unique doc
    assert len(out) == 2
    keeper = next(i for i in out if i != 9)
    assert out[keeper]["n_copies"] == 3
    assert out[9]["n_copies"] == 1


def test_profile_long_form(spark):
    from lamindb_spark.curation.profile import profile

    df = spark.createDataFrame(
        [(1, 2.0, "x"), (2, None, "y"), (2, 5.0, None)],
        "a long, b double, c string",
    )
    rows = {r["column"]: r for r in profile(df, ["a", "b", "c"]).collect()}
    assert rows["a"]["n_rows"] == 3 and rows["a"]["n_null"] == 0
    assert rows["a"]["n_distinct"] == 2
    assert rows["b"]["n_null"] == 1 and rows["b"]["min_val"] == "2.0"
    assert rows["c"]["n_null"] == 1 and rows["c"]["max_val"] == "y"


def test_span_novelty_fractions(spark):
    from lamindb_spark.pipeline.corpus import span_novelty

    docs = literal_table(
        spark,
        [(1, "p q r s"), (2, "p q t u"), (3, "v w")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in span_novelty(docs, span_tokens=2).collect()}
    # "p q" occurs in docs 1 and 2 → not novel; all other spans unique
    assert out[1]["n_spans"] == 2 and out[1]["novelty"] == 0.5
    assert out[2]["novelty"] == 0.5
    assert out[3]["novelty"] == 1.0
