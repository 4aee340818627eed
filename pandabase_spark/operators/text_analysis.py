"""Document-level text analysis tables.

Thin operators over :mod:`pandabase_spark.functions.text` — each is a
single projection or one groupBy, so the 100 TB cost model is "one scan"
(profile) or "one scan + one partial-aggregated shuffle" (summary).

Extension surface for the driver's ``documents`` table (the reference
has no text operators, SURVEY.md §2 Table B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

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
    content hash (+ optional simhash fingerprint). No shuffle, no UDF.

    Shared intermediates (normalized text, token array, per-signal
    counts) are staged as aliased columns across projections instead of
    inlining each function's full expression tree: Catalyst's
    CollapseProject keeps a non-cheap alias referenced more than once
    in its own Project node, so the regex normalization and the token
    split run once per row rather than once per consumer (~20×
    duplication in the naive single-projection form — measured ~6×
    faster end-to-end at sf0.1).
    """
    from pandabase_spark.functions.text import (
        LANG_MARKERS, LANG_ORDER, STOPWORDS, normalize_text,
    )

    stage1 = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        normalize_text(text_col).alias("_norm"),
    )
    stage2 = stage1.select(
        id_col, "n_chars", "_norm",
        F.split(F.col("_norm"), " ").alias("_toks"),
    )
    def _marker_hits(markers: tuple[str, ...]):
        return F.size(F.filter(F.col("_toks"), lambda t: t.isin(list(markers))))

    lang_hit_cols = [
        _marker_hits(LANG_MARKERS[lang]).alias(f"_hits_{lang}")
        for lang in LANG_ORDER
    ]
    stage3 = stage2.select(
        id_col, "n_chars", "_norm", "_toks",
        F.when(F.length("_norm") == 0, F.lit(0))
        .otherwise(F.size("_toks")).cast("long").alias("n_tokens"),
        F.size(
            F.filter(F.col("_toks"), lambda t: t.isin(list(STOPWORDS)))
        ).alias("_stop_hits"),
        F.length(F.regexp_replace(F.col("_norm"), r"[^a-z ]", ""))
        .alias("_alpha_keep"),
        *lang_hit_cols,
    )
    ntok = F.col("n_tokens").cast("double")
    stop_ratio = F.when(
        ntok > 0, F.col("_stop_hits").cast("double") / ntok
    ).otherwise(F.lit(0.0))
    a_ratio = F.when(
        F.length("_norm") > 0,
        F.col("_alpha_keep").cast("double") / F.length("_norm"),
    ).otherwise(F.lit(0.0))
    stage4 = stage3.select(
        id_col, "n_chars", "_norm", "_toks", "n_tokens",
        *[f"_hits_{lang}" for lang in LANG_ORDER],
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(a_ratio, 4).alias("alpha_ratio"),
        stop_ratio.alias("_stop_ratio_raw"),
        a_ratio.alias("_alpha_ratio_raw"),
    )
    # quality: four equally-weighted boolean signals (C4-style), same
    # definition as functions.text.quality_score
    mean_len = F.when(
        ntok > 0, (F.length("_norm") - (ntok - 1)) / ntok
    ).otherwise(F.lit(0.0))
    quality = (
        ((ntok >= 5) & (ntok <= 5000)).cast("double") * 0.25
        + ((mean_len >= 2.0) & (mean_len <= 12.0)).cast("double") * 0.25
        + (F.col("_stop_ratio_raw") >= 0.01).cast("double") * 0.25
        + (F.col("_alpha_ratio_raw") >= 0.6).cast("double") * 0.25
    )
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in LANG_ORDER])
    lang_expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        lang_expr = F.when(
            (best > 0) & (F.col(f"_hits_{lang}") == best), F.lit(lang)
        ).otherwise(lang_expr)
    cols = [
        F.col(id_col),
        F.col("n_tokens"),
        F.col("n_chars"),
        F.col("stopword_ratio"),
        F.col("alpha_ratio"),
        quality.alias("quality"),
        lang_expr.alias("lang_guess"),
        F.md5(F.col("_norm").cast("binary")).alias("chash"),
    ]
    if with_simhash:
        cols.append(simhash64(F.col("_norm")).alias("simhash"))
    return stage4.select(*cols)


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


def tfidf_top_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF
    (keyword extraction): ``score = tf * (ln((N+1)/(df+1)) + 1)``.

    Plan: one token explode feeds BOTH aggregations — (doc, term) term
    frequency and per-term document frequency — then a join on the term
    and a per-document top-k window. The corpus size ``N`` rides along
    as a broadcast 1-row cross join (no eager driver count). Scores are
    rounded to 4 decimals BEFORE ranking so the rank order is identical
    across engines (ties break on the term string).

    Scale notes: the tf aggregate is the big shuffle (map-side
    combined, keyed on (doc, term)); the df table is vocabulary-sized —
    orders of magnitude smaller than the corpus — so its join is
    broadcast-able at any realistic vocabulary and AQE picks that up at
    gate scale. The top-k window partitions on the doc id, which is the
    same key the tf aggregate just shuffled on, so AQE-planned
    exchange reuse keeps it to one effective shuffle of the scored
    rows. Nothing is quadratic; no UDF.

    The reference has no text surface; the formula is the standard
    smoothed-idf variant (e.g. scikit-learn's ``TfidfTransformer``
    with ``smooth_idf=True``), rounded for cross-engine determinism.
    """
    from pandabase_spark.functions.text import tokenize

    tok = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("t"))
    tf = tok.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("t").agg(
        F.countDistinct(id_col).alias("df_t")
    )
    n = df.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, on="t")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("t").alias("term"),
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df_t") + 1.0)) + 1),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    '21 §A1.1 repetition filters, adapted to token granularity —
    the driver corpus has no line structure):

    - ``top_token_frac``     — fraction of tokens that are the single
      most frequent token (boilerplate/spam marker);
    - ``unique_token_ratio`` — distinct/total tokens (low ⇒ loops);
    - ``top_2gram_frac``     — most frequent word-2-gram over total
      2-grams;
    - ``dup_5gram_frac``     — fraction of word-5-grams that are
      repeats of an earlier 5-gram (1 − distinct/total).

    Plan: three explode→count aggregations (token, 2-gram, 5-gram),
    each a partial-aggregated hash shuffle keyed on the doc id — no
    window over the corpus, no UDF. The n-gram rows reuse the shared
    shingle builder (posexplode + lead, codegen'd). At 100 TB each
    granularity is one map-side-combined shuffle of (doc_id, gram)
    counts; nothing is quadratic and no per-row HOF is interpreted.

    The reference has no text surface; signals follow the published
    Gopher ladder. All ratios are exact (no sketches) — run AFTER the
    cheap single-pass profile (:func:`document_profile`) on the
    still-unfiltered corpus slice.
    """
    from pandabase_spark.functions.text import tokenize
    from pandabase_spark.operators.dedup import _shingle_rows

    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("t"))
    tok_stats = (
        toks.groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("_n_tok"),
            F.count(F.lit(1)).alias("_n_tok_distinct"),
            F.max("c").alias("_top_tok"),
        )
    )

    def _gram_stats(n: int, top_alias: str, total_alias: str, dist_alias: str):
        g = _shingle_rows(df, id_col, text_col, "word", n)
        return (
            g.groupBy(id_col, "sh")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col)
            .agg(
                F.max("c").alias(top_alias),
                F.sum("c").alias(total_alias),
                F.count(F.lit(1)).alias(dist_alias),
            )
        )

    g2 = _gram_stats(2, "_top2", "_n2", "_d2")
    g5 = _gram_stats(5, "_top5", "_n5", "_d5")

    out = tok_stats.join(g2, on=id_col).join(g5, on=id_col)
    return out.select(
        F.col(id_col),
        F.col("_n_tok").cast("long").alias("n_tokens"),
        F.round(F.col("_top_tok") / F.col("_n_tok"), 4).alias("top_token_frac"),
        F.round(F.col("_n_tok_distinct") / F.col("_n_tok"), 4).alias(
            "unique_token_ratio"
        ),
        F.round(F.col("_top2") / F.col("_n2"), 4).alias("top_2gram_frac"),
        F.round(1 - F.col("_d5") / F.col("_n5"), 4).alias("dup_5gram_frac"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char).

    A cheap language-agnostic quality signal: natural prose sits around
    4–4.5 bits/char, repeated boilerplate and padding much lower, and
    base64/hex blobs higher — a one-column filter that catches junk
    neither length nor stopword ratios see (used alongside the
    perplexity filters of CCNet, Wenzek et al. '19).

    H = log2(n) − Σ c·log2(c) / n  over per-character counts c — one
    algebraic identity instead of materializing probabilities, so the
    whole thing is two map-side-combined hash aggregations keyed on
    (doc, char) then (doc): at 100 TB the shuffle carries one row per
    distinct character per document (≤ alphabet size), not the corpus.
    No UDF, no window; empty documents yield entropy 0.

    The reference has no text surface (SURVEY §2 Table B); this is
    extension surface for the training-data pipeline.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(text_col, ""), lambda c: c != "")).alias(
            "ch"
        ),
    )
    return (
        chars.groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("_n"),
            F.sum(F.col("c") * F.log2("c")).alias("_clog"),
        )
        .select(
            F.col(id_col),
            F.col("_n").cast("long").alias("n_chars_counted"),
            F.round(F.log2("_n") - F.col("_clog") / F.col("_n"), 4).alias(
                "char_entropy"
            ),
        )
    )


def bigram_lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    *, checkpoint: bool = True,
) -> DataFrame:
    """Perplexity-proxy quality score from a corpus-trained character
    bigram model (the shape of CCNet's LM filter, Wenzek et al. '19,
    with the KenLM stage replaced by an in-engine bigram model).

    Train: corpus-wide bigram and unigram-prefix counts with add-one
    smoothing over the observed alphabet V:
        p(c2 | c1) = (count(c1 c2) + 1) / (count(c1 ·) + |V|)
    Score: mean negative log2-probability of each document's bigrams —
    high = unlike the corpus (junk, wrong language, binary spill),
    low = fluent under the corpus distribution.

    Plan: one explode produces the (doc, bigram) stream; the MODEL is
    ONE aggregation of that stream (bigram counts, at most |V|² rows)
    from which the prefix counts and |V| are rolled up, broadcast back
    onto it. Scoring is a broadcast
    join + per-doc average: no shuffle carries more than one row per
    (doc, distinct bigram). Train on a hash-sample at 100 TB; the
    model is frozen rows, so train-once/score-many falls out of
    passing a precomputed model DataFrame if needed.

    Documents shorter than 2 characters have no bigrams and yield no
    row. Reference: no text surface (SURVEY §2 Table B) — extension.

    ``checkpoint=False`` returns the LAZY scoring plan (no
    localCheckpoint, no persist-backed reuse) so plan tests can audit
    the actual model/scoring tree rather than a checkpoint scan; the
    default materializes while the bigram cache is alive, which is the
    execution-efficient form.
    """
    from pandabase_spark.functions.text import normalize_text

    normed = df.select(F.col(id_col), normalize_text(text_col).alias("_t"))
    grams = normed.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length("_t") - 1, F.lit(1))
                    ),
                    lambda i: F.col("_t").substr(i, F.lit(2)),
                ),
                lambda g: F.length(g) == 2,
            )
        ).alias("bg"),
    )
    # two consumers read the bigram stream (the bigram-count aggregate
    # and the scoring join) — persist it once or the explode+substr
    # pipeline runs twice (measured 67s → 8s at 5k docs). Prefix
    # counts and the |V| vocab size are both DERIVED from the tiny
    # (≤|V|² rows) bigram-count frame instead of re-aggregating the
    # full gram stream: sum(c_bg) grouped by first char equals the
    # prefix count, and every observed character appears in some
    # distinct bigram. Output is the small per-doc aggregate:
    # checkpoint it, then release the caches before returning.
    grams = grams.persist()
    big_counts = None
    try:
        big_counts = (
            grams.groupBy("bg")
            .agg(F.count(F.lit(1)).alias("c_bg"))
            .persist()
        )
        pre_counts = big_counts.groupBy(
            F.substring("bg", 1, 1).alias("c1")
        ).agg(F.sum("c_bg").alias("c_pre"))
        vocab = (
            big_counts.select(F.substring("bg", 1, 1).alias("ch"))
            .union(big_counts.select(F.substring("bg", 2, 1)))
            .distinct()
            .count()
        )
        model = big_counts.join(
            pre_counts, F.substring(big_counts.bg, 1, 1) == pre_counts.c1
        ).select(
            "bg",
            (
                -F.log2((F.col("c_bg") + 1) / (F.col("c_pre") + F.lit(vocab)))
            ).alias("nll"),
        )
        out = (
            grams.join(F.broadcast(model), on="bg")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.round(F.avg("nll"), 4).alias("bits_per_bigram"),
            )
        )
        if checkpoint:
            out = out.localCheckpoint(eager=True)
    finally:
        grams.unpersist()
        if big_counts is not None:
            big_counts.unpersist()
    return out
