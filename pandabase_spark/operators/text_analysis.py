"""Document-level text analysis tables.

Thin operators over :mod:`pandabase_spark.functions.text` — each is a
single projection or one groupBy, so the 100 TB cost model is "one scan"
(profile) or "one scan + one partial-aggregated shuffle" (summary).

Extension surface for the driver's ``documents`` table (the reference
has no text operators, SURVEY.md §2 Table B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandabase_spark.functions.text import (
    alpha_ratio,
    content_hash,
    lang_best_guess,
    quality_score,
    simhash64,
    stopword_ratio,
    token_count,
)


def document_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    *, with_simhash: bool = False,
) -> DataFrame:
    """Per-document stats: tokens, chars, quality, language guess,
    content hash (+ optional simhash fingerprint). One codegen'd
    projection — no shuffle, no UDF."""
    cols = [
        F.col(id_col),
        # long, not int: keeps the schema stable as corpora grow and
        # matches ANSI BIGINT aggregates downstream
        token_count(text_col).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(alpha_ratio(text_col), 4).alias("alpha_ratio"),
        quality_score(text_col).alias("quality"),
        lang_best_guess(text_col).alias("lang_guess"),
        content_hash(text_col).alias("chash"),
    ]
    if with_simhash:
        cols.append(simhash64(text_col).alias("simhash"))
    return df.select(*cols)


def corpus_language_summary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus rollup by guessed language: doc count, token sum, mean
    quality. One scan + one small hash aggregate."""
    prof = document_profile(df, id_col, text_col)
    return (
        prof.groupBy("lang_guess")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", *, min_quality: float = 0.75
) -> DataFrame:
    """Keep documents at or above a quality score — the classic cheap
    pre-filter stage of a training-data pipeline."""
    return df.where(quality_score(text_col) >= min_quality)
