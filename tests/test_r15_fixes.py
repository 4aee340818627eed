"""Round-15 advisory fixes — focused regression pins.

Each test pins one of the five r14 ADVICE items:
1. word-mode shingles emit NO rows for NULL-text docs (the
   sequence/greatest explode used to emit one (id, NULL) shingle, so
   every NULL-text doc minhashed to the same signature);
2. ``narrowing_aggs_grouped``'s level-2 merges coalesce to the
   empty-batch identity (SUM over zero groups is NULL, not 0), so the
   folded create drops all-null columns exactly like the unfolded
   pandas path on a zero-row batch;
3. the folded create falls back to narrow-first when a generated
   expression references a narrowing-candidate column (the folded
   path computed generated columns BEFORE narrowing, the unfolded
   path after);
4. ``_probe_type`` returns None for mixed-type probe values so the
   local-frame fast path defers to classic createDataFrame inference
   (which merges [1, 2.5] to double) instead of pinning LongType and
   raising;
5. standalone ``pq_codebooks`` trains over the SAME
   ``_train_sample``-shaped frame as the shared-training seam, so the
   byte-equality parity test holds by construction at any core count.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_null_text_docs_emit_no_word_shingles(spark):
    from pandabase_spark.operators.dedup import _shingle_rows

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, ""), (4, "x y")],
        "id long, text string",
    )
    rows = sorted(
        (r["id"], r["sh"])
        for r in _shingle_rows(df, "id", "text", "word", 3).collect()
    )
    # doc 2 (NULL text): zero rows; doc 3 (empty text): one empty
    # shingle (split('') = ['']); doc 4: one partial shingle
    assert rows == [(1, "a b c"), (1, "b c d"), (3, ""), (4, "x y")]


def test_null_text_docs_are_not_near_duplicates(spark):
    from pandabase_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "totally unrelated words here"),
         (4, "completely different content again")],
        "id long, text string",
    )
    pairs = minhash_lsh_pairs(df, "id", "text").collect()
    ids_in_pairs = {r["id_1"] for r in pairs} | {r["id_2"] for r in pairs}
    assert 1 not in ids_in_pairs and 2 not in ids_in_pairs


def test_grouped_narrowing_empty_batch_identity(spark):
    from pandabase_spark.types import (
        apply_narrowing, narrowing_aggs_grouped,
    )

    e = spark.createDataFrame([], "k long, v long, s string")
    l1, l2, nc, ac = narrowing_aggs_grouped(e, ["k"])
    grouped = e.groupBy("k").agg(F.count(F.lit(1)).alias("__c"), *l1)
    stats = grouped.agg(F.sum("__c").alias("n"), *l2).first().asDict()
    assert stats["__cnt_v"] == 0 and stats["__cnt_s"] == 0
    assert stats["__nb_v"] == 0
    # the all-null drop decision fires exactly like the unfolded path
    assert apply_narrowing(e, stats, nc, ac).columns == ["k"]


def test_empty_create_drops_allnull_columns_on_folded_path(catalog, spark):
    """Zero-row Spark-frame create (folded narrowing): every value
    column of an empty batch is vacuously all-null/typeless, so the
    created schema keeps only the keys — the same decision the
    unfolded single-level aggregate path makes (its COUNT over an
    empty ungrouped agg is 0, not NULL)."""
    sdf = spark.createDataFrame([], "k long, v double, s string")
    catalog.to_table(sdf, "t_spark_empty", keys=["k"])
    s1 = [f.name for f in catalog.meta("t_spark_empty").schema.fields]
    assert s1 == ["k"]


def test_generated_referencing_narrowing_candidate_matches_unfolded(
    catalog, spark
):
    """A generated column referencing an all-null (narrowing-dropped)
    value column must behave identically whether the input arrives as
    a Spark frame (folded path) or pandas (unfolded path)."""
    sdf = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v double"
    )
    pdf = pd.DataFrame(
        {"k": pd.array([1, 2], dtype="Int64"),
         "v": pd.array([None, None], dtype="float64")}
    ).set_index("k")
    res = {}
    for name, frame in (("spark", sdf), ("pandas", pdf)):
        try:
            catalog.to_table(
                frame, f"t_gen_{name}", keys=["k"],
                generated={"g": "v + 1"},
            )
            res[name] = sorted(
                [f.name for f in catalog.meta(f"t_gen_{name}").schema.fields]
            )
        except Exception:
            res[name] = "rejected"
    # before the r15 fix the folded spark path silently SUCCEEDED
    # (generated computed from the pre-narrow column) while the
    # unfolded pandas path rejected; both must now make the same
    # decision — the all-null referenced column is dropped first, so
    # the generated expression cannot resolve
    assert res["spark"] == res["pandas"] == "rejected"


def test_probe_type_mixed_values_take_classic_path(spark):
    from pandabase_spark.operators.sketches import _probe_type

    assert _probe_type([1, 2.5]) is None
    assert _probe_type([1, True]) is None
    assert _probe_type([None, None]) is None
    from pyspark.sql import types as T

    assert _probe_type([None, 3]) == T.LongType()
    assert _probe_type([0.5]) == T.DoubleType()
    assert _probe_type(["a", "b"]) == T.StringType()


def test_mixed_probe_rows_defer_to_classic_inference(spark):
    """Whatever classic createDataFrame inference decides for mixed
    int/float rows (on this Spark version: CANNOT_MERGE_TYPE) is the
    contract the probe-frame fast path must reproduce — _probe_type
    returning None routes mixed lists to exactly that path instead of
    pinning the first value's type and failing differently."""
    import pytest as _pytest

    rows = [(1, 10), (2.5, 20)]
    with _pytest.raises(Exception, match="CANNOT_MERGE_TYPE"):
        spark.createDataFrame(rows, ["v", "est_count"])


def test_standalone_pq_codebooks_matches_shared_training(spark):
    """Parity by construction: the standalone trained path and the
    sharing seam iterate the SAME repartitioned sample, so codebooks
    are byte-identical (this was layout-dependent before r15)."""
    from pandabase_spark.operators.similarity import (
        _seed_vectors, _train_sample, pq_codebooks,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)])
         for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    standalone = pq_codebooks(emb, m=4, k=4, iters=2, sample_mod=2)
    train = _train_sample(
        emb, id_col="vec_id", vec_col="embedding", sample_mod=2
    ).persist()
    try:
        seeds = _seed_vectors(train, 4)
        shared = pq_codebooks(
            emb, m=4, k=4, iters=2, sample_mod=2,
            _train=train, _seed_rows=seeds,
        )
    finally:
        train.unpersist()
    assert standalone == shared
