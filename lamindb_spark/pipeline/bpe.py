"""Distributed byte-pair-encoding tokenizer training (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

The trainer runs on the WORD-FREQUENCY table, not the corpus: Zipf's
law collapses a corpus of any size into a vocabulary-sized table, so
only the FIRST pass (tokenize + count) is corpus-sized — one shuffle —
and every merge iteration is a small job over distinct words. That is
the textbook formulation and exactly the 100 TB shape: n_merges
iterations cost n_merges × O(vocab), independent of corpus bytes.

Symbol representation — the trick that makes everything engine-portable:
a word's symbol sequence is rendered as a STRING, each symbol prefixed
with a sentinel (U+001F) and suffixed with a space::

    "low" →  "␟l ␟o ␟w ␟</w> "

Merging pair (A, B) is then ``replace(vstr, "␟A ␟B ", "␟AB ")``.
Because adjacent occurrences share no characters (each match starts at
its own sentinel), left-to-right non-overlapping ``replace`` — the
semantics of BOTH Spark's and ANSI SQL's replace — is exactly BPE's
greedy left-to-right merge, including runs like ``a a a a`` →
``aa aa``. No fold, no UDF, and an independent SQL engine reproduces
the training bit-for-bit (see the generated oracle in
``__spark_entry__._bpe_oracle_sql``).

Reference scope: lamindb has no tokenizer ops; this extends the
training-data pipeline family (SURVEY §2 corpus block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import ws_tokens

SENTINEL = "\x1f"
END_WORD = "</w>"


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(vstr, freq): distinct words rendered to symbol strings.

    The one corpus-sized job — tokenize + hash-aggregate (map-side
    partial counts). Everything after runs on this table.
    """
    toks = F.explode(ws_tokens(F.col(text_col), lowercase=True)).alias("word")
    # strip any literal U+001F from corpus words BEFORE rendering: the
    # sentinel invariant (every merge pattern matches only at symbol
    # boundaries) requires the sentinel to never occur INSIDE a symbol
    # — a crawl doc carrying control-char noise would otherwise let a
    # trained pattern match mid-symbol and silently corrupt merges
    # (review finding). bpe_encode strips identically.
    words = (
        df.select(toks)
        .select(F.replace(F.col("word"), F.lit(SENTINEL), F.lit("")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.expr(
        "array_join(transform(sequence(1, length(word)), "
        f"i -> concat('{SENTINEL}', substring(word, i, 1))), ' ')"
    )
    vstr = F.concat(chars, F.lit(f" {SENTINEL}{END_WORD} "))
    return words.select(vstr.alias("vstr"), "freq")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbol strings:
    split → zip-shifted slices → explode → weighted partial agg.
    Symbols keep their sentinel prefix here (stripped only at API
    boundaries)."""
    lst = F.filter(F.split(F.col("vstr"), " "), lambda x: x != "")
    pairs = F.zip_with(
        F.slice(lst, 1, F.size(lst) - 1),
        F.slice(lst, 2, F.size(lst) - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("f"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_freq: int = 1,
    checkpoint_every: int = 4,
    cache_key: str | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(rank, lhs, rhs, freq)].

    Each round: one vocab-sized aggregation picks the most frequent
    adjacent pair ((freq desc, lhs, rhs) tiebreak — deterministic and
    engine-portable), then a zero-shuffle ``replace`` applies it.
    Driver traffic is one 3-field row per round (like the k-means
    centroid fetch). ``localCheckpoint`` every ``checkpoint_every``
    rounds keeps the replace-chain plan bounded. Stops early when the
    best pair's frequency drops below ``min_freq``.

    ``cache_key`` opts into the fingerprint-keyed model cache
    (``similarity._MODEL_CACHE``): a trained tokenizer is exactly the
    artifact a real pipeline trains once and ships everywhere, and
    training is deterministic, so a (source fingerprint,
    hyperparameters)-keyed merge list is safe to reuse in-process —
    a regenerated corpus changes the fingerprint and retrains.
    """
    if cache_key is not None:
        from .similarity import _cache_get

        hit = _cache_get(("bpe_train", cache_key, n_merges, text_col, min_freq))
        if hit is not None:
            return hit
    vocab = _word_table(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("f"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["f"] < min_freq:
            break
        a, b, f = top[0]["a"], top[0]["b"], int(top[0]["f"])
        merges.append((rank, a[1:], b[1:], f))
        pat, rep = f"{a} {b} ", f"{a}{b[1:]} "
        # literal (non-regex) replace: symbols may contain any corpus
        # character, so a regex variant would need escaping
        vocab = vocab.select(
            F.replace(F.col("vstr"), F.lit(pat), F.lit(rep)).alias("vstr"),
            "freq",
        )
        if rank % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    if cache_key is not None:
        from .similarity import _cache_put

        _cache_put(("bpe_train", cache_key, n_merges, text_col, min_freq), merges)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: render every word
    to its symbol string, apply the merges in rank order (a chain of
    literal replaces — one zero-shuffle map pass), split back to
    tokens. ``</w>`` stays as the end-of-word suffix on merged tokens,
    matching the reference implementation's output alphabet.

    Cross-word safety: no trained merge can start with (or contain)
    ``</w>`` — a pair with ``</w>`` on the left never occurs inside a
    word — so applying the replace chain to the whole rendered
    document cannot merge across word boundaries.
    """
    from ..operators.spread import spread_for_cpu

    chars = F.expr(
        "array_join(transform(tokens, w -> concat("
        "array_join(transform(sequence(1, length(w)), "
        f"i -> concat('{SENTINEL}', substring(w, i, 1))), ' '), "
        f"' {SENTINEL}{END_WORD}')), ' ')"
    )
    # same sentinel-stripping as _word_table (the two sides must agree
    # on the rendered alphabet)
    toks = F.filter(
        F.transform(
            ws_tokens(F.col(text_col), lowercase=True),
            lambda w: F.replace(w, F.lit(SENTINEL), F.lit("")),
        ),
        lambda w: w != "",
    )
    # render + replace-chain is seconds of single-core CPU on a
    # 1-partition scan; spread_for_cpu is a no-op at real scale
    rendered = spread_for_cpu(df.select(F.col(id_col), toks.alias("tokens"))).select(
        F.col(id_col), F.concat(chars, F.lit(" ")).alias("vstr")
    )
    col = F.col("vstr")
    for _rank, lhs, rhs, _f in merges:
        pat = f"{SENTINEL}{lhs} {SENTINEL}{rhs} "
        rep = f"{SENTINEL}{lhs}{rhs} "
        col = F.replace(col, F.lit(pat), F.lit(rep))
    symbols = F.filter(F.split(col, " "), lambda x: x != "")
    return rendered.select(
        F.col(id_col),
        F.transform(symbols, lambda s: F.substring(s, 2, 1_000_000)).alias("tokens"),
    )
