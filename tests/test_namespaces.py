"""Schema-namespace coverage (reference:pandabase/util.py:5-80,
sql.py:46,71 ``schema=`` kwarg) and legacy auto-index name recognition
(reference:pandabase/sql.py:466).

A schema maps to a warehouse sub-directory; same table name in two
namespaces must not interact, and every catalog API accepts schema=.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark import catalog as cutil


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def test_same_table_name_two_namespaces_no_crosstalk(spark, catalog):
    catalog.to_table(_df(spark, 0, 100, "flat"), "t", keys=["k"])
    catalog.to_table(_df(spark, 0, 50, "alpha"), "t", keys=["k"], schema="ns_a")
    catalog.to_table(_df(spark, 0, 80, "beta"), "t", keys=["k"], schema="ns_b")

    assert catalog.read_table("t").count() == 100
    assert catalog.read_table("t", schema="ns_a").count() == 50
    assert catalog.read_table("t", schema="ns_b").count() == 80
    assert (
        catalog.read_table("t", schema="ns_a").select("tag").distinct().collect()[0][0]
        == "alpha"
    )

    # upsert in one namespace leaves the others untouched
    catalog.to_table(
        _df(spark, 40, 60, "alpha2"), "t", keys=["k"], how="upsert", schema="ns_a"
    )
    assert catalog.read_table("t", schema="ns_a").count() == 60
    assert catalog.read_table("t").count() == 100
    assert catalog.read_table("t", schema="ns_b").count() == 80

    # drop in one namespace only drops there
    catalog.drop_table("t", schema="ns_b")
    assert not catalog.has_table("t", schema="ns_b")
    assert catalog.has_table("t")
    assert catalog.has_table("t", schema="ns_a")


def test_table_names_and_namespaces_scoping(spark, catalog):
    catalog.to_table(_df(spark, 0, 10, "x"), "flat_t", keys=["k"])
    catalog.to_table(_df(spark, 0, 10, "x"), "t1", keys=["k"], schema="ns1")
    catalog.to_table(_df(spark, 0, 10, "x"), "t2", keys=["k"], schema="ns1")
    catalog.to_table(_df(spark, 0, 10, "x"), "t1", keys=["k"], schema="ns2")

    assert catalog.table_names() == ["flat_t"]  # namespaces are not tables
    assert catalog.table_names(schema="ns1") == ["t1", "t2"]
    assert catalog.table_names(schema="ns2") == ["t1"]
    assert catalog.namespaces() == ["ns1", "ns2"]


def test_describe_scoped_per_namespace(spark, catalog):
    catalog.to_table(_df(spark, 0, 30, "x"), "d1", keys=["k"], schema="nsd")
    catalog.to_table(_df(spark, 0, 10, "x"), "d2", keys=["k"], schema="nsd")
    catalog.to_table(_df(spark, 0, 99, "x"), "d1", keys=["k"])

    rows = {r["table_name"]: r for r in catalog.describe(schema="nsd").collect()}
    assert set(rows) == {"nsd/d1", "nsd/d2"}
    assert rows["nsd/d1"]["count"] == 30 and rows["nsd/d1"]["max_pk"] == "29"
    flat = {r["table_name"]: r for r in catalog.describe("d1").collect()}
    assert flat["d1"]["count"] == 99


def test_namespace_api_passthroughs(spark, catalog):
    catalog.to_table(_df(spark, 0, 20, "x"), "api_t", keys=["k"], schema="nsx")
    assert cutil.has_table(catalog, "api_t", schema="nsx")
    assert not cutil.has_table(catalog, "api_t")
    assert cutil.get_db_table_names(catalog, schema="nsx") == ["api_t"]
    assert cutil.get_table_column_names(catalog, "api_t", schema="nsx") == [
        "k", "tag",
    ]
    assert catalog.column_names("api_t", schema="nsx") == ["k", "tag"]
    # history / time travel / CDC / compact / vacuum all take schema=
    catalog.to_table(
        _df(spark, 20, 30, "y"), "api_t", keys=["k"], how="append", schema="nsx"
    )
    hist = catalog.history("api_t", schema="nsx")
    assert [h["version"] for h in hist] == [1, 2]
    assert catalog.read_table("api_t", version=1, schema="nsx").count() == 20
    ch = catalog.table_changes("api_t", 1, schema="nsx")
    assert ch.where(F.col("_change_type") == "insert").count() == 10
    assert catalog.compact("api_t", schema="nsx") == 2
    assert catalog.vacuum("api_t", schema="nsx") == []
    assert catalog.read_table("api_t", schema="nsx").count() == 30
    cutil.drop_db_table(catalog, "api_t", schema="nsx")
    assert not cutil.has_table(catalog, "api_t", schema="nsx")


def test_dirty_schema_name_rejected(spark, catalog):
    with pytest.raises(NameError, match="clean"):
        catalog.to_table(_df(spark, 0, 5, "x"), "t", keys=["k"], schema="bad schema!")
    with pytest.raises(NameError, match="clean"):
        catalog.table_names(schema="bad schema!")


def test_read_pandas_with_schema(spark, catalog):
    catalog.to_table(_df(spark, 0, 15, "x"), "pd_t", keys=["k"], schema="nsp")
    pdf = catalog.read_pandas("pd_t", schema="nsp")
    assert len(pdf) == 15 and pdf.index.name == "k"


def test_legacy_auto_index_name_suppressed_on_read(spark, catalog):
    """A single key named with the legacy pandabase_default_index*
    prefix (reference:pandabase/sql.py:466) reads back as a nameless
    index, exactly like an auto-indexed table."""
    legacy = "pandabase_default_index_1234567890"
    df = spark.range(0, 25).select(
        F.col("id").alias(legacy), (F.col("id") * 2).alias("v")
    )
    catalog.to_table(df, "legacy_t", keys=[legacy])
    pdf = catalog.read_pandas("legacy_t")
    assert pdf.index.name is None
    assert list(pdf.columns) == ["v"]
    assert len(pdf) == 25
    # the modern name is recognized too when used as an explicit key
    from pandabase_spark.io import AUTO_INDEX_NAME

    df2 = spark.range(0, 5).select(
        F.col("id").alias(AUTO_INDEX_NAME), F.lit("z").alias("v")
    )
    catalog.to_table(df2, "modern_t", keys=[AUTO_INDEX_NAME])
    assert catalog.read_pandas("modern_t").index.name is None
