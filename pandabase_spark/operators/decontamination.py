"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM §C:
drop or flag training documents sharing long n-grams with any eval
document). Shapes:

- :func:`ngram_overlap_pairs` — (corpus_id, eval_id, n_shared) for
  every corpus/eval pair sharing ≥ ``min_shared`` distinct word
  ``n``-grams. Inverted-index join on the shingle (only pairs that
  share a shingle are ever materialized), eval side broadcast — an
  eval set is small by definition, so the corpus never shuffles.
- :func:`contamination_report` — per-corpus-doc rollup:
  (id, n_shared_ngrams, n_eval_docs_hit), the drop/flag list.

Scale notes: the corpus side streams map-side through the broadcast
hash join — zero corpus shuffle; the per-doc rollup shuffles only the
(tiny) hit set. At 100 TB join on a hash of the shingle instead of the
raw string (16 bytes vs ~50) and exact-verify survivors; here the raw
string keeps the operator bit-exact against the SQL oracle.

The reference has no text surface (SURVEY.md §2 Table B); shingle
construction is shared with :mod:`pandabase_spark.operators.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandabase_spark.operators.dedup import _shingle_rows


def ngram_overlap_pairs(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    mode: str = "word",
    min_shared: int = 1,
) -> DataFrame:
    """(corpus_id, eval_id, n_shared) per overlapping pair.

    ``n_shared`` counts DISTINCT shared ``n``-grams. ``eval_df`` is
    broadcast — keep it the (small) benchmark side.
    """
    c_sh = _shingle_rows(corpus, id_col, text_col, mode, n).distinct()
    e_sh = (
        _shingle_rows(eval_df, id_col, text_col, mode, n)
        .distinct()
        .select(F.col(id_col).alias("eval_id"), "sh")
    )
    return (
        c_sh.select(F.col(id_col).alias("corpus_id"), "sh")
        .join(F.broadcast(e_sh), on="sh")
        .groupBy("corpus_id", "eval_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    mode: str = "word",
    min_shared: int = 1,
) -> DataFrame:
    """Per-corpus-document contamination rollup: (id, n_shared_ngrams,
    n_eval_docs_hit) for every document sharing ≥ ``min_shared``
    distinct ``n``-grams with ANY eval document — the drop/flag list a
    training pipeline acts on."""
    pairs = ngram_overlap_pairs(
        corpus, eval_df, id_col=id_col, text_col=text_col,
        n=n, mode=mode, min_shared=1,
    )
    return (
        pairs.groupBy("corpus_id")
        .agg(
            F.sum("n_shared").cast("long").alias("n_shared_ngrams"),
            F.count(F.lit(1)).cast("long").alias("n_eval_docs_hit"),
        )
        .where(F.col("n_shared_ngrams") >= min_shared)
        .select(
            F.col("corpus_id").alias(id_col),
            "n_shared_ngrams",
            "n_eval_docs_hit",
        )
    )
