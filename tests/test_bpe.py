"""Distributed BPE trainer/encoder vs an independent pure-Python
reference (the textbook Sennrich et al. algorithm on a dict of word
frequencies)."""

from collections import Counter

from lamindb_spark.pipeline.bpe import bpe_encode, bpe_train
from lamindb_spark.sources.literals import literal_table


def _ref_train(texts: list[str], n_merges: int):
    """Reference BPE: greedy left-to-right merge on symbol tuples."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # (freq desc, lhs asc, rhs asc) — the engine tiebreak
        (a, b), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, f))
        new_vocab = {}
        for syms, fr in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + fr
        vocab = new_vocab
    return merges


def _ref_encode(text: str, merges):
    toks = []
    for w in text.lower().split():
        syms = list(w) + ["</w>"]
        for _rank, a, b, _f in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide wide widest",
    "low new wide lower",
]


def test_bpe_train_matches_reference(spark):
    docs = literal_table(spark, list(enumerate(TEXTS)), ["doc_id", "text"])
    got = bpe_train(docs, n_merges=10)
    want = _ref_train(TEXTS, 10)
    assert got == want


def test_bpe_train_run_merging(spark):
    # "aaaa" must merge pairwise (aa, aa), not (aa, a, a) — the greedy
    # left-to-right property the sentinel encoding guarantees
    docs = literal_table(spark, [(1, "aaaa aaaa")], ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    enc = bpe_encode(docs, merges).collect()[0]["tokens"]
    assert enc == ["aa", "aa", "</w>", "aa", "aa", "</w>"]


def test_bpe_encode_matches_reference(spark):
    docs = literal_table(spark, list(enumerate(TEXTS)), ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=8)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        assert enc[i] == _ref_encode(t, merges), f"doc {i}"


def test_bpe_encode_no_cross_word_merge(spark):
    # word-final </w> symbols must never merge with the next word's
    # first symbol even when the pair pattern appears in the stream
    docs = literal_table(spark, [(1, "ab ab ab")], ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=3)
    enc = bpe_encode(docs, merges).collect()[0]["tokens"]
    assert enc == ["ab</w>", "ab</w>", "ab</w>"]
