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


def test_jsonl_roundtrip_exact(spark, tmp_path):
    from pandabase_spark.sources import read_jsonl, write_jsonl

    src = spark.createDataFrame(
        [(1, "a b", 0.1), (2, "c", 12345.678901234567), (3, None, -1.5)],
        ["Row Id", "Text Col", "val"],
    )
    path = str(tmp_path / "jl")
    write_jsonl(src, path)
    # inferred: names cleaned, fields alphabetized, ints widened
    inferred = read_jsonl(spark, path)
    assert sorted(inferred.columns) == inferred.columns
    # explicit schema: exact dtypes + order (names cleaned), values
    # roundtrip bit-exact
    back = read_jsonl(spark, path, schema=src.schema)
    assert back.columns == ["row_id", "text_col", "val"]
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in src.schema.fields
    ]
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }


def test_orc_roundtrip_exact(spark, tmp_path):
    from pandabase_spark.sources import read_orc, write_orc

    src = spark.createDataFrame(
        [(1, "x", 1.25), (2, "y", None)], ["id", "s", "v"]
    )
    path = str(tmp_path / "orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }


def test_csv_into_keyed_table(spark, catalog, csv_file):
    df = read_csv(spark, csv_file, narrow=True)
    catalog.to_table(df, "from_csv", keys=["order_key"])
    assert catalog.read_table("from_csv").count() == 4


def test_partitioned_write_colocates_files(spark, tmp_path):
    import glob

    from pandabase_spark.sources import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )

    src = spark.range(0, 1000).withColumn(
        "grp", (F.col("id") % 4).cast("string")
    )
    path = str(tmp_path / "part")
    write_partitioned_parquet(src, path, partition_by=["grp"])
    # colocated write: one data file per partition value, not one per
    # input task per value
    for g in range(4):
        files = glob.glob(f"{path}/grp={g}/*.parquet")
        assert len(files) == 1, f"grp={g}: {len(files)} files"
    back = read_partitioned_parquet(spark, path)
    assert back.count() == 1000
    one = back.where(F.col("grp") == "2")
    assert one.count() == 250
    assert set(one.select("id").toPandas()["id"] % 4) == {2}


def test_jsonl_malformed_record_modes(spark, tmp_path):
    """Dirty-data contract for the JSONL source: PERMISSIVE quarantines
    malformed lines into the corrupt-record column (good fields NULL),
    DROPMALFORMED silently drops them, FAILFAST raises — the three
    industry-standard dispositions, all reachable through read_jsonl's
    option passthrough. At 100 TB always PERMISSIVE + quarantine sink:
    dropped rows are unauditable."""
    import pytest as _pytest
    from pyspark.sql import types as T

    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"k": 1, "v": "ok"}\n'
        '{"k": 2, "v": "also ok"}\n'
        '{"k": 3, "v": BROKEN!!\n'
    )
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("_bad", T.StringType()),
    ])
    from pandabase_spark.sources import read_jsonl

    perm = read_jsonl(
        spark, str(p), schema=schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord="_bad",
    ).collect()
    assert len(perm) == 3
    quarantined = [r for r in perm if r["_bad"] is not None]
    assert len(quarantined) == 1 and quarantined[0]["k"] is None
    assert "BROKEN" in quarantined[0]["_bad"]

    dropped = read_jsonl(
        spark, str(p),
        schema=T.StructType(schema.fields[:2]), mode="DROPMALFORMED",
    ).collect()
    assert {r["k"] for r in dropped} == {1, 2}

    with _pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_jsonl(
            spark, str(p),
            schema=T.StructType(schema.fields[:2]), mode="FAILFAST",
        ).collect()


def test_read_binary_files(spark, tmp_path):
    """binaryFile ingestion: one row per file, content intact, glob
    filter and max_bytes guard applied before payload reads."""
    from pandabase_spark.sources import read_binary_files

    (tmp_path / "a.png").write_bytes(b"\x89PNG-fake-a" * 10)
    (tmp_path / "b.png").write_bytes(b"\x89PNG-fake-bb" * 2000)
    (tmp_path / "c.txt").write_text("not media")
    df = read_binary_files(spark, str(tmp_path), glob="*.png")
    rows = {r["path"].rsplit("/", 1)[1]: bytes(r["content"]) for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert rows["a.png"] == b"\x89PNG-fake-a" * 10
    small = read_binary_files(
        spark, str(tmp_path), glob="*.png", max_bytes=1000
    )
    assert [r["path"].rsplit("/", 1)[1] for r in small.collect()] == ["a.png"]
    # pipes straight into the multimodal stats operator
    from pandabase_spark.operators.multimodal import payload_stats

    stats = payload_stats(
        df.select(F.col("path").alias("doc_id"), F.col("content").alias("payload"))
    )
    assert stats.count() == 2


def test_python_datasource_partitions_and_determinism(spark):
    """pb_synth (Spark 4 Python Data Source API): split planning
    yields the requested partition count with non-overlapping ranges,
    rows are deterministic across reads, and options rescale."""
    from pyspark.sql import functions as F

    from pandabase_spark.sources.pyds import register

    register(spark)

    def load(n, parts):
        return (
            spark.read.format("pb_synth")
            .option("n", n).option("parts", parts).load()
        )

    df = load(1000, 5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1000
    ids = [r["event_id"] for r in df.select("event_id").collect()]
    assert sorted(ids) == list(range(1000))  # no overlap, no gaps
    a = sorted(map(tuple, load(200, 3).collect()))
    b = sorted(map(tuple, load(200, 7).collect()))
    assert a == b  # partitioning never changes content
    kinds = {r["kind"] for r in df.select("kind").distinct().collect()}
    assert kinds == {"view", "click", "purchase"}
