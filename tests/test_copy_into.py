"""copy_into: file-level idempotent directory ingestion (COPY INTO).

The loaded-file ledger rides in the same manifest commit as the data,
so retries after crashes or scheduler re-runs load each file exactly
once — no separate bookkeeping table to desync.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _write_file(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3.0).alias("v")
    ).coalesce(1).write.mode("append").parquet(path)


def test_copy_into_loads_each_file_exactly_once(spark, catalog, tmp_path):
    src = str(tmp_path / "drop")
    _write_file(spark, src, 0, 10)
    r1 = catalog.copy_into("ci_t", src, keys=["k"])
    assert r1["files_loaded"] >= 1 and r1["rows_loaded"] == 10
    # re-run with nothing new: pure no-op
    r2 = catalog.copy_into("ci_t", src, keys=["k"])
    assert r2 == {
        "files_loaded": 0,
        "files_skipped": r1["files_loaded"],
        "rows_loaded": 0,
    }
    assert catalog.read_table("ci_t").count() == 10
    # new files arrive in the same directory: only they load
    _write_file(spark, src, 10, 25)
    r3 = catalog.copy_into("ci_t", src)  # keys resolved from the table
    assert r3["rows_loaded"] == 15 and r3["files_skipped"] >= 1
    got = catalog.read_table("ci_t")
    assert got.count() == 25
    assert got.agg(F.sum("v")).first()[0] == sum(k * 3.0 for k in range(25))
    # the ledger is manifest state: visible in table history semantics
    assert len(catalog._manifest("ci_t")["ingest"]) == (
        r1["files_loaded"] + r3["files_loaded"]
    )


def test_copy_into_ledger_survives_maintenance(spark, catalog, tmp_path):
    src = str(tmp_path / "drop")
    _write_file(spark, src, 0, 10)
    catalog.copy_into("ci_m", src, keys=["k"])
    catalog.compact("ci_m")
    catalog.to_table(
        spark.range(100, 110).select(
            F.col("id").alias("k"), F.lit(0.0).alias("v")
        ),
        "ci_m", keys=["k"], how="append",
    )
    # ledger carried through compact + unrelated writes: still a no-op
    r = catalog.copy_into("ci_m", src)
    assert r["files_loaded"] == 0
    assert catalog.read_table("ci_m").count() == 20


def test_copy_into_ledger_keys_are_canonical(spark, catalog, tmp_path):
    """The same physical directory spelled differently — trailing
    slash, file:// scheme, a symlink, a ../ segment — must dedupe:
    ledger keys are canonical URIs, not caller spelling."""
    import os

    src = str(tmp_path / "drop")
    _write_file(spark, src, 0, 10)
    r1 = catalog.copy_into("ci_c", src, keys=["k"])
    assert r1["rows_loaded"] == 10
    spellings = [
        src + "/",
        "file://" + src,
        str(tmp_path / "sub" / ".." / "drop"),
    ]
    link = str(tmp_path / "link")
    os.makedirs(str(tmp_path / "sub"), exist_ok=True)
    os.symlink(src, link)
    spellings.append(link)
    for s in spellings:
        r = catalog.copy_into("ci_c", s)
        assert r["files_loaded"] == 0, s
        assert r["files_skipped"] == r1["files_loaded"], s
    assert catalog.read_table("ci_c").count() == 10


def test_copy_into_validates_early(spark, catalog, tmp_path):
    """Nonexistent table without keys, and an empty source directory
    on first load, both fail fast with clear errors (never a deep
    _normalize_input failure or a silent no-op that created nothing)."""
    src = str(tmp_path / "drop")
    _write_file(spark, src, 0, 5)
    with pytest.raises(ValueError, match="does not exist.*keys"):
        catalog.copy_into("ci_nokeys", src)
    empty = str(tmp_path / "empty")
    import os

    os.makedirs(empty)
    with pytest.raises(IOError, match="no .*files"):
        catalog.copy_into("ci_empty", empty, keys=["k"])
    assert not catalog.has_table("ci_nokeys")
    assert not catalog.has_table("ci_empty")


def test_copy_into_upsert_mode_and_validation(spark, catalog, tmp_path):
    src1, src2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    _write_file(spark, src1, 0, 10)
    catalog.copy_into("ci_u", src1, keys=["k"], how="upsert")
    # same KEYS from a DIFFERENT directory: new files, upsert wins
    spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    ).coalesce(1).write.parquet(src2)
    catalog.copy_into("ci_u", src2, how="upsert")
    assert {r.v for r in catalog.read_table("ci_u").collect()} == {-1.0}
    with pytest.raises(ValueError, match="append.*upsert"):
        catalog.copy_into("ci_u", src1, how="overwrite")
