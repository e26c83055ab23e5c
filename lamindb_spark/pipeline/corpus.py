"""End-to-end corpus curation: the composed training-data filter.

One pass over a document corpus that computes every per-document
signal the individual operators expose (token count, quality score,
language id, content fingerprint) plus the exact-dup group decision,
and derives a final ``keep`` verdict — the canonical "clean a 100 TB
crawl" pipeline:

    scan → per-row signals (codegen) → one shuffle on content_hash
    (dup grouping via window) → verdict expression

Everything except the dup-group window is embarrassingly parallel;
the window shuffles only (hash, id) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, quality_score, token_count, with_lang_id


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    keep_langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Per-document signals + keep/drop verdict.

    keep = quality ≥ min_quality AND n_tokens ≥ min_tokens AND
    predicted language allowed AND (unique content OR the keeper —
    lowest id — of its exact-dup group).
    """
    enriched = with_lang_id(df, text_col, "pred_lang").select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        quality_score(F.col(text_col)).alias("quality"),
        F.col("pred_lang"),
        fingerprint(F.col(text_col)).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash")
    grouped = enriched.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_copies"),
        (F.min(id_col).over(w) == F.col(id_col)).alias("is_keeper"),
    )
    keep = (
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & F.col("pred_lang").isin(list(keep_langs))
        & F.col("is_keeper")
    )
    return grouped.withColumn("keep", keep)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    context-window packing step of a training-data pipeline.

    Chunks start every ``chunk_size - overlap`` tokens; the last chunk
    may be short. One JVM-side explode, no Python, no shuffle: the
    fan-out multiplies rows ~``1/(1-overlap/chunk_size)``× at scan
    speed. ``chunk_idx = start // step`` so the id is derivable on both
    sides of a cross-engine comparison without ordinality."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    staged = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(step)
    )
    return (
        staged.select(id_col, "__toks", "__n", F.explode(starts).alias("__start"))
        .select(
            F.col(id_col),
            (F.col("__start") / step).cast("long").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_size), F.col("__n") - F.col("__start"))
            .cast("long")
            .alias("n_chunk_tokens"),
        )
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Corpus-wide top-k token frequencies (exact heavy hitters):
    explode → hash-aggregate with map-side partial counts (one shuffle
    of (token, partial_n)) → TakeOrdered. The exact twin of the
    count-min/heavy-hitter sketches in ``functions/sketches.py`` —
    exact is the right call whenever the vocabulary fits a shuffle,
    which a whitespace vocabulary does even at corpus scale."""
    toks = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token")
    return (
        df.select(toks)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )
