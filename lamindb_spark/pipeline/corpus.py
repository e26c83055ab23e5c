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
