"""Round-2 fix coverage: ArrayType storage, companda NaN, auto-index
plan shape, pandas explicit-key cleaning.

Reference anchors: NaN-as-missing comparison
(reference:pandabase/companda.py:129-147); auto-index contiguity
(reference:tests/test_sql.py:824-843).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.compare import companda
from pandabase_spark.io import AUTO_INDEX_NAME


def test_arraytype_roundtrip(spark, catalog):
    """array<float> embeddings store + read through the keyed API."""
    emb = spark.createDataFrame(
        [(i, [float(i), float(i) * 2, 0.5]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    catalog.to_table(emb, "emb", keys=["vec_id"])
    back = catalog.read_table("emb")
    assert dict(back.dtypes)["embedding"] == "array<double>"
    row = back.where(F.col("vec_id") == 3).collect()[0]
    assert row["embedding"] == [3.0, 6.0, 0.5]
    # range read still works on the scalar key
    assert catalog.read_table("emb", lowest=10, highest=19).count() == 10


def test_arraytype_upsert_preserves(spark, catalog):
    emb = spark.createDataFrame(
        [(i, [1.0] * 4, "a") for i in range(20)],
        "vec_id long, embedding array<double>, tag string",
    )
    catalog.to_table(emb, "emb2", keys=["vec_id"])
    patch = spark.createDataFrame(
        [(5, [9.0] * 4), (20, [7.0] * 4)], "vec_id long, embedding array<double>"
    )
    catalog.to_table(patch, "emb2", keys=["vec_id"], how="upsert")
    back = {r["vec_id"]: r for r in catalog.read_table("emb2").collect()}
    assert back[5]["embedding"] == [9.0] * 4
    assert back[5]["tag"] == "a"  # preserved column
    assert back[20]["embedding"] == [7.0] * 4 and back[20]["tag"] is None
    assert len(back) == 21


def test_companda_nan_equals_nan(spark):
    """A float NaN must compare equal to itself (reference treats NaN as
    missing on both sides)."""
    a = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, None)], "k long, v double"
    )
    b = spark.createDataFrame(
        [(1, 1.0005), (2, float("nan")), (3, None)], "k long, v double"
    )
    assert companda(a, b, keys=["k"])
    # NaN vs a real value still differs
    c = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, None)], "k long, v double")
    assert not companda(a, c, keys=["k"])
    # NaN vs NULL is EQUAL: the reference's pandas world cannot tell
    # them apart, so both are "missing" (companda.py:129-147 semantics)
    d = spark.createDataFrame([(1, 1.0), (2, None), (3, None)], "k long, v double")
    assert companda(a, d, keys=["k"])


def test_autoindex_no_global_window(spark, catalog):
    """Contiguity preserved; the ranking window must be partitioned (no
    single-partition global exchange in the plan)."""
    pdf = pd.DataFrame({"x": np.arange(500, dtype=float)})
    catalog.to_table(pdf, "auto1", auto_index=True)
    catalog.to_table(
        pd.DataFrame({"x": np.arange(100, dtype=float)}), "auto1",
        auto_index=True, how="append",
    )
    back = catalog.read_pandas("auto1")
    assert len(back) == 600
    idx = np.sort(back.index.to_numpy())
    assert idx[0] == 0 and idx[-1] == 599
    assert (np.diff(idx) == 1).all()  # contiguous, no gaps

    # plan shape: the window in _assign_auto_index partitions by
    # spark_partition_id — a bare Window.orderBy would show
    # 'Window [...] ORDER BY' with an Exchange SinglePartition below it
    probe = catalog._assign_auto_index(
        spark.range(1000).withColumnRenamed("id", "x"), base=0
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pandas_explicit_keys_cleaned(catalog):
    """keys=['My Col'] must match the cleaned column my_col
    (parity with the Spark-input branch)."""
    pdf = pd.DataFrame({"My Col": [1, 2, 3], "Value X": [0.1, 0.2, 0.3]})
    catalog.to_table(pdf, "cleankeys", keys=["My Col"])
    back = catalog.read_table("cleankeys")
    assert set(back.columns) == {"my_col", "value_x"}
    assert catalog.meta("cleankeys").keys == ["my_col"]


def test_array_key_rejected(spark, catalog):
    emb = spark.createDataFrame(
        [(i, [float(i)]) for i in range(5)], "vec_id long, v array<double>"
    )
    with pytest.raises(TypeError, match="non-orderable"):
        catalog.to_table(emb, "embk", keys=["v"])
    # arrays as VALUES are fine; bad bound type still raises
    catalog.to_table(emb, "embk", keys=["vec_id"])
    with pytest.raises(TypeError, match="incompatible"):
        catalog.read_table("embk", lowest=[0.0])
