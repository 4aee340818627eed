"""Delta Lake writer (export interop) — protocol conformance and the
optimistic-commit loop, verified through the independent reader
(:mod:`delta_reader` replays the log; it shares no code with the
writer's action construction) plus STRUCTURAL assertions on the raw
log JSON, so a writer/reader bug pair cannot cancel out.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pandabase_spark.fs import HadoopFS
from pandabase_spark.sources.delta_reader import (
    delta_history,
    delta_scan,
    delta_table_version,
)
from pandabase_spark.sources.delta_writer import (
    delta_append,
    delta_checkpoint,
    delta_create,
    delta_overwrite,
)


def _df(spark, lo, hi, mult=1.0):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") * float(mult)).alias("v"),
        (F.col("id") % 3).cast("int").alias("p"),
    )


def _rows(df):
    return {(r["id"], r["v"], r["p"]) for r in df.collect()}


def test_create_append_overwrite_roundtrip(spark, tmp_path):
    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 100), table, partition_by=["p"])
    assert delta_table_version(spark, table) == 0
    assert _rows(delta_scan(spark, table)) == _rows(_df(spark, 0, 100))

    v = delta_append(_df(spark, 100, 150), table)
    assert v == 1
    assert _rows(delta_scan(spark, table)) == _rows(_df(spark, 0, 150))

    v = delta_overwrite(_df(spark, 500, 520, mult=2.0), table)
    assert v == 2
    assert _rows(delta_scan(spark, table)) == _rows(
        _df(spark, 500, 520, mult=2.0)
    )
    # time travel still reconstructs the pre-overwrite snapshots
    assert _rows(delta_scan(spark, table, version=1)) == _rows(
        _df(spark, 0, 150)
    )
    ops = [h["operation"] for h in delta_history(spark, table)]
    assert ops == ["CREATE TABLE AS SELECT", "WRITE", "WRITE"]
    # creating on top of an existing table refuses
    with pytest.raises(FileExistsError):
        delta_create(_df(spark, 0, 5), table)


def test_log_json_is_protocol_shaped(spark, tmp_path):
    """Structural conformance of the raw commit JSON — the half the
    roundtrip can't prove: action key spelling, string-typed
    partitionValues, root-relative un-prefixed paths, protocol
    versions that claim no unwritten features, and data files that do
    NOT contain the partition column."""
    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 30), table, partition_by=["p"])
    fs = HadoopFS(spark)
    lines = [
        json.loads(ln)
        for ln in fs.read_text(
            f"{table}/_delta_log/{0:020d}.json"
        ).splitlines()
    ]
    kinds = [next(iter(a)) for a in lines]
    assert kinds[0] == "commitInfo"
    assert set(kinds) == {"commitInfo", "protocol", "metaData", "add"}
    proto = next(a["protocol"] for a in lines if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in lines if "metaData" in a)
    assert meta["partitionColumns"] == ["p"]
    assert json.loads(meta["schemaString"])["type"] == "struct"
    assert meta["format"] == {"provider": "parquet", "options": {}}
    adds = [a["add"] for a in lines if "add" in a]
    assert adds, "create must add files"
    for add in adds:
        assert not add["path"].startswith("/")
        assert "://" not in add["path"]
        pv = add["partitionValues"]
        assert set(pv) == {"p"} and all(
            isinstance(x, str) for x in pv.values()
        )
        assert add["size"] > 1 and add["dataChange"] is True
        # the data file itself must NOT contain the partition column
        cols = spark.read.parquet(f"{table}/{add['path']}").columns
        assert cols == ["id", "v"]


def test_checkpoint_then_log_cleanup_reads_back(spark, tmp_path):
    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 40), table, partition_by=["p"])
    delta_append(_df(spark, 40, 60), table)
    delta_overwrite(_df(spark, 0, 25, mult=3.0), table)
    v = delta_checkpoint(spark, table)
    assert v == 2
    delta_append(_df(spark, 25, 30, mult=3.0), table)
    fs = HadoopFS(spark)
    for old in (0, 1, 2):
        fs.delete(
            f"{table}/_delta_log/{old:020d}.json", recursive=False
        )
    assert _rows(delta_scan(spark, table)) == _rows(
        _df(spark, 0, 30, mult=3.0)
    )


def test_concurrent_appends_both_land(spark, tmp_path):
    """Two appends claiming the same next version: put-if-absent
    gives exactly one winner; the loser retries at the next version
    and NEITHER batch is lost — the LogStore contract."""
    import pandabase_spark.sources.delta_writer as W

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])

    real_claim = W._claim
    raced = {"done": False}

    def racing_claim(fs, log_dir, actions, v):
        # on the first claim attempt, a rival lands the same version
        # first — forcing the optimistic loop to re-resolve and retry
        if not raced["done"]:
            raced["done"] = True
            rival = [
                {"commitInfo": {"operation": "WRITE", "timestamp": 0}},
                *(
                    {"add": a}
                    for a in W._stage_data_files(
                        _df(spark, 100, 110), table, ["p"]
                    )
                ),
            ]
            assert real_claim(fs, log_dir, rival, v)
        return real_claim(fs, log_dir, actions, v)

    W._claim = racing_claim
    try:
        v = delta_append(_df(spark, 200, 210), table)
    finally:
        W._claim = real_claim
    assert v == 2  # rival took 1, retry landed at 2
    assert _rows(delta_scan(spark, table)) == (
        _rows(_df(spark, 0, 10))
        | _rows(_df(spark, 100, 110))
        | _rows(_df(spark, 200, 210))
    )


def test_overwrite_retry_replaces_rivals_commit_state(spark, tmp_path):
    """An overwrite losing the race must recompute its remove set
    against the NEW head: the rival's freshly-added files are part of
    'whatever is live at commit time' and must be removed too."""
    import pandabase_spark.sources.delta_writer as W

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])

    real_claim = W._claim
    raced = {"done": False}

    def racing_claim(fs, log_dir, actions, v):
        if not raced["done"]:
            raced["done"] = True
            rival = [
                {"commitInfo": {"operation": "WRITE", "timestamp": 0}},
                *(
                    {"add": a}
                    for a in W._stage_data_files(
                        _df(spark, 100, 110), table, ["p"]
                    )
                ),
            ]
            assert real_claim(fs, log_dir, rival, v)
        return real_claim(fs, log_dir, actions, v)

    W._claim = racing_claim
    try:
        delta_overwrite(_df(spark, 900, 905), table)
    finally:
        W._claim = real_claim
    # the rival's rows were live at overwrite-commit time -> replaced
    assert _rows(delta_scan(spark, table)) == _rows(_df(spark, 900, 905))
