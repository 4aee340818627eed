"""CSV ingestion parity (reference loads zipped CSVs in fixtures,
reference:tests/conftest.py:117-130)."""

from __future__ import annotations

import zipfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.sources import read_csv, read_zipped_csv


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "Sample Data.csv"
    pd.DataFrame(
        {
            "Order Key": [1, 2, 3, 4],
            "Total (USD)": [10.5, 20.0, 30.25, 40.0],
            "Flag": [0, 1, 0, 1],
            "Dead Col": [None, None, None, None],
        }
    ).to_csv(p, index=False)
    return str(p)


def test_read_csv_clean_names(spark, csv_file):
    df = read_csv(spark, csv_file)
    assert df.columns == ["order_key", "total__usd_", "flag", "dead_col"]
    assert df.count() == 4
    assert dict(df.dtypes)["total__usd_"] == "double"


def test_read_csv_narrowing(spark, csv_file):
    df = read_csv(spark, csv_file, narrow=True)
    # 0/1 int column narrowed to boolean; all-null column dropped
    assert dict(df.dtypes)["flag"] == "boolean"
    assert "dead_col" not in df.columns
    assert df.where(F.col("flag")).count() == 2


def test_read_zipped_csv(spark, csv_file, tmp_path):
    zpath = tmp_path / "fixture.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(csv_file, arcname="sample.csv")
    df = read_zipped_csv(spark, str(zpath))
    assert df.count() == 4
    assert "order_key" in df.columns


def test_csv_into_keyed_table(spark, catalog, csv_file):
    df = read_csv(spark, csv_file, narrow=True)
    catalog.to_table(df, "from_csv", keys=["order_key"])
    assert catalog.read_table("from_csv").count() == 4
