"""LLM-pipeline extension operators added in round 3: repetition
signals, decontamination overlap, deterministic stratified sampling.

Semantics-level tests on constructed corpora; the driver-table oracle
checks live in workload.py (repetition_signals / contamination_report /
stratified_sample_frac / stratified_token_sample).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_repetition_signals_known_values(spark):
    from pandabase_spark.operators.text_analysis import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one token repeated 4x
            (2, "a b c d e f g h"),              # all distinct
            (3, "x y x y x y x y"),              # 2-gram loop
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_token_frac"] == 1.0
    assert got[1]["unique_token_ratio"] == 0.25
    # "spam spam" appears 3x of 3 bigrams
    assert got[1]["top_2gram_frac"] == 1.0
    assert got[2]["top_token_frac"] == pytest.approx(1 / 8, abs=1e-4)
    assert got[2]["unique_token_ratio"] == 1.0
    assert got[2]["dup_5gram_frac"] == 0.0  # 4 distinct 5-grams
    # doc 3: tokens x*4 y*4 → top_token 0.5; bigrams: "x y"*4 "y x"*3
    assert got[3]["top_token_frac"] == 0.5
    assert got[3]["top_2gram_frac"] == pytest.approx(4 / 7, abs=1e-4)
    # 5-grams: 4 total ("x y x y x","y x y x y" alternating) → 2 distinct
    assert got[3]["dup_5gram_frac"] == 0.5


def test_contamination_overlap_planted(spark):
    from pandabase_spark.operators.decontamination import (
        contamination_report,
        ngram_overlap_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    corpus = spark.createDataFrame(
        [
            (10, f"prefix words here {shared} suffix words"),
            (11, "completely unrelated text with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(90, f"benchmark question {shared} benchmark answer")],
        ["doc_id", "text"],
    )
    pairs = ngram_overlap_pairs(corpus, eval_df, n=8).collect()
    assert len(pairs) == 1
    assert (pairs[0]["corpus_id"], pairs[0]["eval_id"]) == (10, 90)
    assert pairs[0]["n_shared"] == 1  # exactly the planted 8-gram

    rep = contamination_report(corpus, eval_df, n=8).collect()
    assert len(rep) == 1 and rep[0]["doc_id"] == 10
    assert rep[0]["n_eval_docs_hit"] == 1

    # raising n past the shared span finds nothing
    assert ngram_overlap_pairs(corpus, eval_df, n=9).count() == 0


def test_stratified_sample_fraction_and_determinism(spark):
    from pandabase_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(100)],
        ["doc_id", "lang"],
    )
    out = stratified_sample(df, strata=["lang"], fraction=0.25, id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # en: 66 rows → ceil(16.5) = 17; de: 34 → ceil(8.5) = 9
    assert counts == {"en": 17, "de": 9}
    # deterministic: same rows both runs
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            df, strata=["lang"], fraction=0.25, id_col="doc_id"
        ).collect()
    }
    assert ids1 == ids2
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, strata=["lang"], fraction=0.0, id_col="doc_id")


def test_sample_to_token_budget_prefix_property(spark):
    from pandabase_spark.operators.sampling import sample_to_token_budget

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "w " * (5 + i % 7)) for i in range(60)],
        ["doc_id", "lang", "text"],
    )
    small = sample_to_token_budget(
        df, strata=["lang"], budget_tokens=50, id_col="doc_id"
    )
    big = sample_to_token_budget(
        df, strata=["lang"], budget_tokens=150, id_col="doc_id"
    )
    # budget respected per stratum
    for out, budget in ((small, 50), (big, 150)):
        mx = out.groupBy("lang").agg(F.max("cum_tokens").alias("m")).collect()
        assert all(r["m"] <= budget for r in mx)
    # prefix property: the small sample is a subset of the big one
    small_ids = {r["doc_id"] for r in small.collect()}
    big_ids = {r["doc_id"] for r in big.collect()}
    assert small_ids < big_ids
    # explicit token column takes precedence over text counting
    pre = df.withColumn("ntok", F.lit(10))
    out = sample_to_token_budget(
        pre, strata=["lang"], budget_tokens=35, id_col="doc_id",
        token_col="ntok",
    )
    assert out.groupBy("lang").count().collect()[0]["count"] == 3
