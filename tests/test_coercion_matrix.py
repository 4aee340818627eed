"""Coercion matrix against an existing table (table wins — the DB is
the source of truth, reference:README.md:61).

Mirrors the reference's case table (reference:tests/test_sql.py:563-667):
int↔float and bool↔int/float coerce silently; incompatible scalar
pairs raise TypeError. Deviation (documented in types.py): a
datetime-vs-other mismatch CASTS instead of silently passing through —
the reference's pass-through is its own TODO and would corrupt the
segment/schema contract here.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.io import KeyedCatalog


def _table_with(spark, catalog: KeyedCatalog, name: str, coltype: str, value):
    df = spark.createDataFrame(
        [(i, value) for i in range(10)], f"k long, v {coltype}"
    )
    catalog.to_table(df, name, keys=["k"])
    return df


@pytest.mark.parametrize(
    "table_type,table_val,batch_type,batch_val,expect_type,expect_val",
    [
        ("double", 1.5, "long", 7, "double", 7.0),          # int → float table
        ("long", 10, "double", 7.9, "long", 7),             # float → int: truncates
        ("double", 1.5, "boolean", True, "double", 1.0),    # bool → float table
        ("long", 10, "boolean", True, "long", 1),           # bool → int table
        ("boolean", True, "long", 0, "boolean", False),     # int → bool table
        ("long", 5, "int", 7, "long", 7),                   # widening int32 → int64
    ],
)
def test_silent_coercions(
    spark, catalog, table_type, table_val, batch_type, batch_val,
    expect_type, expect_val,
):
    name = f"co_{table_type}_{batch_type}"
    _table_with(spark, catalog, name, table_type, table_val)
    batch = spark.createDataFrame([(0, batch_val)], f"k long, v {batch_type}")
    catalog.to_table(batch, name, keys=["k"], how="upsert")
    out = catalog.read_table(name)
    assert dict(out.dtypes)["v"].startswith(expect_type[:4].replace("long", "bigi"))
    got = out.where(F.col("k") == 0).collect()[0]["v"]
    assert got == expect_val


@pytest.mark.parametrize(
    "table_type,table_val,batch_type,batch_val",
    [
        ("string", "x", "long", 7),
        ("long", 1, "string", "nope"),
        ("double", 1.0, "string", "nope"),
        ("string", "x", "boolean", True),
    ],
)
def test_incompatible_raises(
    spark, catalog, table_type, table_val, batch_type, batch_val
):
    name = f"bad_{table_type}_{batch_type}"
    _table_with(spark, catalog, name, table_type, table_val)
    batch = spark.createDataFrame([(0, batch_val)], f"k long, v {batch_type}")
    with pytest.raises(TypeError, match="not.*coercible|coercible"):
        catalog.to_table(batch, name, keys=["k"], how="upsert")


def test_datetime_mismatch_casts(spark, catalog):
    """Deviation from the reference's silent pass-through: a parseable
    string batch column casts into a timestamp table column."""
    base = spark.createDataFrame(
        [(0, "2024-01-01 10:00:00")], "k long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    catalog.to_table(base, "dt_t", keys=["k"])
    patch = spark.createDataFrame([(0, "2024-06-15 08:30:00")], "k long, ts string")
    catalog.to_table(patch, "dt_t", keys=["k"], how="upsert")
    got = catalog.read_table("dt_t").collect()[0]["ts"]
    assert got.year == 2024 and got.month == 6 and got.day == 15


def test_pandas_coercion_path(catalog):
    """pandas batches inherit the same matrix through the inference
    bridge (nullable Int64 in, double table wins)."""
    base = pd.DataFrame(
        {"v": [1.5, 2.5, 3.5]}, index=pd.RangeIndex(3, name="k")
    )
    catalog.to_table(base, "pd_co")
    patch = pd.DataFrame(
        {"v": pd.array([7], dtype="Int64")}, index=pd.Index([1], name="k")
    )
    catalog.to_table(patch, "pd_co", how="upsert")
    out = catalog.read_pandas("pd_co")
    assert out.loc[1, "v"] == 7.0
    assert out["v"].dtype == "float64"
