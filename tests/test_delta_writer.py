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
        # the path is URL-encoded per the protocol ('=' in the hive
        # dir name encodes as %3D); decode it like a reader would
        from urllib.parse import unquote

        # the data file itself must NOT contain the partition column
        cols = spark.read.parquet(
            f"{table}/{unquote(add['path'])}"
        ).columns
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
            _sub, rival_adds = W._stage_data_files(
                _df(spark, 100, 110), table, ["p"]
            )
            rival = [
                {"commitInfo": {"operation": "WRITE", "timestamp": 0}},
                *({"add": a} for a in rival_adds),
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
            _sub, rival_adds = W._stage_data_files(
                _df(spark, 100, 110), table, ["p"]
            )
            rival = [
                {"commitInfo": {"operation": "WRITE", "timestamp": 0}},
                *({"add": a} for a in rival_adds),
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


def test_writer_refuses_unhonorable_tables(spark, tmp_path):
    """r13 review findings: (a) minWriterVersion above 2 / writer
    feature lists refuse; (b) delta.appendOnly=true refuses
    overwrite but allows append; (c) frames with missing/extra
    columns or mismatched types refuse instead of silently
    truncating or committing wrongly-typed parquet."""
    import json as _json

    from pandabase_spark.sources.delta_reader import DeltaProtocolError

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"

    # (c) schema misalignment refuses BEFORE anything is staged
    with pytest.raises(NameError, match="missing.*extra|extra"):
        delta_append(
            _df(spark, 10, 20).withColumn("zz", F.lit(1)), table
        )
    with pytest.raises(NameError, match="missing"):
        delta_append(_df(spark, 10, 20).drop("v"), table)
    with pytest.raises(TypeError, match="type mismatch"):
        delta_append(
            _df(spark, 10, 20).withColumn(
                "v", F.col("v").cast("string")
            ),
            table,
        )

    # (b) appendOnly: re-declare metaData with the config set
    meta = {
        "metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": _df(spark, 0, 1).schema.json(),
            "partitionColumns": ["p"],
            "configuration": {"delta.appendOnly": "true"},
        }
    }
    fs.write_text_atomic(f"{log}/{1:020d}.json", _json.dumps(meta))
    v = delta_append(_df(spark, 10, 20), table)  # appends still fine
    assert v == 2
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        delta_overwrite(_df(spark, 0, 5), table)

    # (a) higher writer version refuses everything
    fs.write_text_atomic(f"{log}/{3:020d}.json", _json.dumps({
        "protocol": {"minReaderVersion": 1, "minWriterVersion": 4}
    }))
    with pytest.raises(DeltaProtocolError, match="writer version 4"):
        delta_append(_df(spark, 30, 40), table)


def test_writer_percent_encodes_paths_with_special_partitions(
    spark, tmp_path
):
    """add.path is URL-encoded per the protocol: a string partition
    value containing ':' produces a hive-escaped directory
    (k=a%3Ab), which must be logged percent-encoded (k=a%253Ab) so
    every conformant reader's unquote lands on the real file. Null
    partition values serialize as JSON null, not the hive sentinel
    string."""
    import json as _json

    table = str(tmp_path / "out")
    df = spark.range(4).select(
        F.col("id"),
        F.when(F.col("id") < 2, F.lit("a:b")).otherwise(
            F.lit(None).cast("string")
        ).alias("k"),
    )
    delta_create(df, table, partition_by=["k"])
    fs = HadoopFS(spark)
    adds = [
        _json.loads(ln)["add"]
        for ln in fs.read_text(
            f"{table}/_delta_log/{0:020d}.json"
        ).splitlines()
        if '"add"' in ln
    ]
    pvs = [a["partitionValues"]["k"] for a in adds]
    assert set(pvs) == {"a:b", None}
    enc = next(a for a in adds if a["partitionValues"]["k"] == "a:b")
    assert "%253A" in enc["path"] and ":" not in enc["path"]
    # and the independent reader round-trips both partitions
    got = {
        (r["id"], r["k"]) for r in delta_scan(spark, table).collect()
    }
    assert got == {(0, "a:b"), (1, "a:b"), (2, None), (3, None)}


def test_checkpoint_preserves_table_identity_and_config(
    spark, tmp_path
):
    """The checkpoint must carry the table's ACTUAL metaData (id,
    configuration) — a fabricated id would churn on every checkpoint
    and dropped configuration would silently lose appendOnly after
    log cleanup."""
    import json as _json

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    orig = next(
        _json.loads(ln)["metaData"]
        for ln in fs.read_text(f"{log}/{0:020d}.json").splitlines()
        if '"metaData"' in ln
    )
    delta_append(_df(spark, 10, 20), table)
    delta_checkpoint(spark, table)
    ck = spark.read.parquet(f"{log}/{1:020d}.checkpoint.parquet")
    meta_rows = [
        r["metaData"].asDict()
        for r in ck.collect()
        if r["metaData"] and r["metaData"]["schemaString"]
    ]
    assert len(meta_rows) == 1
    assert meta_rows[0]["id"] == orig["id"]
    # cleanup + read-back still works and the version survives
    fs.delete(f"{log}/{0:020d}.json", recursive=False)
    fs.delete(f"{log}/{1:020d}.json", recursive=False)
    assert _rows(delta_scan(spark, table)) == _rows(_df(spark, 0, 20))
    assert delta_table_version(spark, table) == 1


def test_checkpoint_carries_format_and_retained_tombstones(
    spark, tmp_path
):
    """r13 advisory: after log cleanup the checkpoint is the only
    surviving metaData, so it must include the REQUIRED format field
    (+ createdTime) and the remove tombstones still inside the
    retention window — a conformant third-party reader reconstructs
    Metadata from it verbatim and vacuum needs the tombstones."""
    import json as _json

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    delta_overwrite(_df(spark, 20, 30), table)  # tombstones v0 files
    delta_checkpoint(spark, table)
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    ck = spark.read.parquet(f"{log}/{1:020d}.checkpoint.parquet")
    assert "remove" in ck.columns
    meta = next(
        r["metaData"].asDict(recursive=True)
        for r in ck.collect()
        if r["metaData"] and r["metaData"]["schemaString"]
    )
    orig = next(
        _json.loads(ln)["metaData"]
        for ln in fs.read_text(f"{log}/{0:020d}.json").splitlines()
        if '"metaData"' in ln
    )
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["createdTime"] == orig["createdTime"]
    removes = [
        r["remove"].asDict()
        for r in ck.collect()
        if r["remove"] and r["remove"]["path"]
    ]
    # the overwrite tombstoned exactly the v0 files, all recent
    v0_adds = {
        _json.loads(ln)["add"]["path"]
        for ln in fs.read_text(f"{log}/{0:020d}.json").splitlines()
        if '"add"' in ln
    }
    assert {rm["path"] for rm in removes} == v0_adds
    assert all(rm["deletionTimestamp"] > 0 for rm in removes)
    # tombstoned paths and live paths are disjoint (protocol rule)
    adds = {
        r["add"]["path"] for r in ck.collect()
        if r["add"] and r["add"]["path"]
    }
    assert adds.isdisjoint({rm["path"] for rm in removes})
    # and the table still reads back after cleanup
    for v in (0, 1):
        fs.delete(f"{log}/{v:020d}.json", recursive=False)
    assert _rows(delta_scan(spark, table)) == _rows(_df(spark, 20, 30))


def test_retry_recheck_fails_on_mid_loop_metadata_change(
    spark, tmp_path
):
    """r13 advisory: a rival's metadata change landing mid-commit-loop
    (appendOnly flip, schema change) must FAIL the commit on retry —
    the staged files are typed against the old schema — not be
    silently ignored."""
    import json as _json

    import pandabase_spark.sources.delta_writer as W
    from pandabase_spark.sources.delta_reader import DeltaProtocolError

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"

    real_claim = W._claim

    def rival_flips_append_only(fs_, log_dir, actions, v):
        if not raced["done"]:
            raced["done"] = True
            meta = {
                "metaData": {
                    "id": "x",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _df(spark, 0, 1).schema.json(),
                    "partitionColumns": ["p"],
                    "configuration": {"delta.appendOnly": "true"},
                }
            }
            assert real_claim(fs_, log_dir, [meta], v)
        return real_claim(fs_, log_dir, actions, v)

    raced = {"done": False}
    W._claim = rival_flips_append_only
    try:
        with pytest.raises(DeltaProtocolError, match="appendOnly"):
            delta_overwrite(_df(spark, 50, 60), table)
    finally:
        W._claim = real_claim
    # the failed overwrite staged files then cleaned them up: no
    # unreferenced c-<uuid> dirs beyond the two successful commits
    live_dirs = {
        d for d in fs.list_dirs(table) if d.startswith("c-")
    }
    referenced = set()
    for n in fs.list_files(log):
        if n.endswith(".json"):
            for ln in fs.read_text(f"{log}/{n}").splitlines():
                act = _json.loads(ln)
                if "add" in act:
                    referenced.add(act["add"]["path"].split("/")[0])
    assert live_dirs == referenced

    # a mid-loop SCHEMA change fails an append the same way
    raced = {"done": False}

    def rival_changes_schema(fs_, log_dir, actions, v):
        if not raced["done"]:
            raced["done"] = True
            meta = {
                "metaData": {
                    "id": "x",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _df(spark, 0, 1).withColumn(
                        "zz", F.lit(1)
                    ).schema.json(),
                    "partitionColumns": ["p"],
                    "configuration": {},
                }
            }
            assert real_claim(fs_, log_dir, [meta], v)
        return real_claim(fs_, log_dir, actions, v)

    W._claim = rival_changes_schema
    try:
        with pytest.raises(DeltaProtocolError, match="schema moved"):
            delta_append(_df(spark, 70, 80), table)
    finally:
        W._claim = real_claim


def test_lost_create_race_cleans_staged_files(spark, tmp_path):
    """Losing the version-0 claim race must delete the staged
    c-<uuid> directory — nothing will ever reference or vacuum it."""
    import pandabase_spark.sources.delta_writer as W

    table = str(tmp_path / "out")
    real_claim = W._claim

    def always_lose(fs_, log_dir, actions, v):
        fs_.write_text_if_absent(
            f"{log_dir}/{v:020d}.json", '{"commitInfo": {}}'
        )
        return False

    W._claim = always_lose
    try:
        with pytest.raises(FileExistsError, match="claim race"):
            delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    finally:
        W._claim = real_claim
    fs = HadoopFS(spark)
    assert not [d for d in fs.list_dirs(table) if d.startswith("c-")]


def test_object_store_warning_fires_on_s3_paths():
    """The LogStore caveat: object-store schemes warn (put-if-absent
    degrades to check-then-act there); local paths stay silent."""
    import warnings

    from pandabase_spark.sources.delta_writer import (
        _warn_if_object_store,
    )

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert _warn_if_object_store("s3a://bucket/table") is True
        assert _warn_if_object_store("abfss://c@a.dfs/x") is True
        assert _warn_if_object_store("/local/table") is False
        assert _warn_if_object_store("file:/local/table") is False
        assert _warn_if_object_store("hdfs://nn:8020/table") is False
    msgs = [str(w.message) for w in caught]
    assert len(msgs) == 2 and all("LogStore" in m for m in msgs)


def test_unescape_partition_decodes_utf8_multibyte():
    """r13 advisory: %XX pairs decode as BYTES then UTF-8, so another
    engine's percent-encoded ``é`` (%C3%A9) round-trips instead of
    becoming Latin-1 mojibake; Spark/Hive's ASCII escapes still work;
    undecodable runs fall back bytewise."""
    from pandabase_spark.fs import unescape_partition

    assert unescape_partition("app%3A0") == "app:0"
    assert unescape_partition("caf%C3%A9") == "café"
    assert unescape_partition("%E6%97%A5%E6%9C%AC") == "日本"
    assert unescape_partition("plain") == "plain"
    assert unescape_partition("a%2Fb%3D1") == "a/b=1"
    # lone invalid byte: surrogateescape round-trip, no crash
    got = unescape_partition("x%FFy")
    assert got.encode("utf-8", "surrogateescape") == b"x\xffy"


def test_delta_vacuum_collects_aged_unreferenced_files(
    spark, tmp_path
):
    """r14: vacuum deletes files the current version no longer
    references once they age past retention — overwritten data,
    failed-commit orphans and their emptied directories — while
    keeping live files, referenced DV sidecars, young tombstones and
    the whole log."""
    import os
    import time as _time

    from pandabase_spark.sources.delta_writer import delta_vacuum

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 30), table, partition_by=["p"])
    delta_overwrite(_df(spark, 50, 70), table)
    fs = HadoopFS(spark)
    # a failed-commit orphan directory with one stale file
    os.makedirs(f"{table}/c-orphan/p=0", exist_ok=True)
    with open(f"{table}/c-orphan/p=0/junk.parquet", "wb") as fh:
        fh.write(b"x")

    # retention floor: sub-hour retention refuses by default
    with pytest.raises(ValueError, match="safety floor"):
        delta_vacuum(spark, table, retention_ms=0)

    # everything is young: nothing to collect yet
    assert delta_vacuum(spark, table) == []

    # age everything on disk, then dry-run vs real run
    old = _time.time() - 9 * 24 * 3600
    for root, _dirs, names in os.walk(table):
        if "_delta_log" in root:
            continue
        for n in names:
            os.utime(os.path.join(root, n), (old, old))
    would = delta_vacuum(
        spark, table, retention_ms=3_600_000, dry_run=True
    )
    assert any("junk.parquet" in p for p in would)
    got = delta_vacuum(spark, table, retention_ms=3_600_000)
    assert got == would
    # orphan dir collapsed, live table intact, log untouched
    assert not fs.exists(f"{table}/c-orphan")
    assert _rows(delta_scan(spark, table)) == _rows(_df(spark, 50, 70))
    assert fs.list_files(f"{table}/_delta_log")
    # second vacuum is a no-op
    assert delta_vacuum(spark, table, retention_ms=3_600_000) == []


def test_delta_vacuum_keeps_live_dv_sidecars(spark, tmp_path):
    import os
    import time as _time

    from pandabase_spark.sources.delta_fixture import make_delta_dv_fixture
    from pandabase_spark.sources.delta_writer import delta_vacuum

    table = str(tmp_path / "dvt")
    make_delta_dv_fixture(spark, table)
    old = _time.time() - 9 * 24 * 3600
    for root, _dirs, names in os.walk(table):
        if "_delta_log" in root:
            continue
        for n in names:
            os.utime(os.path.join(root, n), (old, old))
    removed = delta_vacuum(spark, table, retention_ms=3_600_000)
    assert removed == []  # both data files + the sidecar are live
    live_a = {i for i in range(100) if not (i < 20 and i % 2 == 1)}
    assert {r["id"] for r in delta_scan(spark, table).collect()} == (
        live_a | set(range(105, 180))
    )


def test_delta_timestamp_time_travel(spark, tmp_path):
    """timestamp= resolves to the last commit at or before the
    instant, from commit-file mtimes (delta-spark semantics)."""
    import os

    from pandabase_spark.sources.delta_reader import delta_scan as scan

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    delta_append(_df(spark, 10, 20), table)
    delta_overwrite(_df(spark, 50, 55), table)
    log = f"{table}/_delta_log"
    # pin distinct mtimes: v0 @1000, v1 @2000, v2 @3000 (epoch s)
    for v, t in [(0, 1000), (1, 2000), (2, 3000)]:
        os.utime(f"{log}/{v:020d}.json", (t, t))
    assert _rows(scan(spark, table, timestamp=1500)) == _rows(
        _df(spark, 0, 10)
    )
    assert _rows(scan(spark, table, timestamp=2000)) == _rows(
        _df(spark, 0, 20)
    )
    assert _rows(scan(spark, table, timestamp=9e9)) == _rows(
        _df(spark, 50, 55)
    )
    assert _rows(
        scan(spark, table, timestamp="1970-01-01T00:33:20+00:00")
    ) == _rows(_df(spark, 0, 20))  # 2000s epoch
    with pytest.raises(NameError, match="no Delta commit at or before"):
        scan(spark, table, timestamp=10)
    with pytest.raises(ValueError, match="not both"):
        scan(spark, table, version=1, timestamp=1500)


def test_write_stats_and_predicate_file_skipping(spark, tmp_path):
    """r14: staged adds carry Delta's four-field stats JSON (computed
    in ONE distributed pass over the staged data), and
    delta_scan(predicate=...) prunes files whose [min,max] interval
    cannot match — at PLANNING time, before any file IO — while kept
    files still row-filter, so the result equals a plain WHERE."""
    import json as _json

    from pandabase_spark.sources.delta_reader import delta_scan as scan

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 100).coalesce(1), table)
    delta_append(_df(spark, 100, 200).coalesce(1), table)
    delta_append(_df(spark, 200, 300).coalesce(1), table)
    fs = HadoopFS(spark)
    add0 = next(
        _json.loads(ln)["add"]
        for ln in fs.read_text(
            f"{table}/_delta_log/{0:020d}.json"
        ).splitlines()
        if '"add"' in ln
    )
    st = _json.loads(add0["stats"])
    assert st["numRecords"] == 100
    assert st["minValues"]["id"] == 0 and st["maxValues"]["id"] == 99
    assert st["nullCount"]["v"] == 0

    df = scan(
        spark, table, predicate=[("id", ">=", 150), ("id", "<", 250)]
    )
    assert len(df.inputFiles()) == 2  # files 0..99 pruned from the log
    assert _rows(df) == _rows(_df(spark, 150, 250))
    # stats survive a checkpoint + log cleanup
    delta_checkpoint(spark, table)
    for v in (0, 1, 2):
        fs.delete(f"{table}/_delta_log/{v:020d}.json", recursive=False)
    df2 = scan(spark, table, predicate=[("id", "<", 100)])
    assert len(df2.inputFiles()) == 1
    assert _rows(df2) == _rows(_df(spark, 0, 100))
    # a file WITHOUT stats is never pruned
    fs.write_text_atomic(
        f"{table}/_delta_log/{3:020d}.json",
        _json.dumps({"add": {
            "path": add0["path"], "partitionValues": {},
            "size": 1, "modificationTime": 0, "dataChange": True,
        }}),
    )
    df3 = scan(spark, table, predicate=[("id", ">", 10_000)])
    assert add0["path"] in " ".join(df3.inputFiles()) or (
        len(df3.inputFiles()) == 1
    )
    assert df3.count() == 0  # residual row filter still applies
    # bad predicate shapes refuse
    import pytest as _pytest

    with _pytest.raises(NameError, match="not in schema"):
        scan(spark, table, predicate=[("zz", "=", 1)])
    with _pytest.raises(ValueError, match="not in"):
        scan(spark, table, predicate=[("id", "!=", 1)])
    with _pytest.raises(ValueError, match="null predicate"):
        scan(spark, table, predicate=[("id", "=", None)])


def test_predicate_prunes_on_partition_values_too(spark, tmp_path):
    from pandabase_spark.sources.delta_reader import delta_scan as scan

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 90), table, partition_by=["p"])
    df = scan(spark, table, predicate=[("p", "=", 1)])
    assert _rows(df) == {
        (i, 1.0 * i, 1) for i in range(90) if i % 3 == 1
    }
    # only p=1's files reach the scan
    assert all("p=1" in f for f in df.inputFiles())


def test_checkpoint_preserves_deletion_vectors_and_features(
    spark, tmp_path
):
    """r14 review finding: a checkpoint of a DV table must carry each
    add's deletionVector descriptor and the protocol's feature lists
    — otherwise a post-cleanup replay serves files unfiltered and
    deleted rows resurrect."""
    from pandabase_spark.sources.delta_fixture import make_delta_dv_fixture

    table = str(tmp_path / "dvt")
    make_delta_dv_fixture(spark, table)
    live_a = {i for i in range(100) if not (i < 20 and i % 2 == 1)}
    expected = (
        {(i, 1.0 * i, 0) for i in live_a}
        | {(i, 1.0 * i, 1) for i in range(105, 180)}
    )
    assert _rows(delta_scan(spark, table)) == expected
    v = delta_checkpoint(spark, table)
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    ck = spark.read.parquet(f"{log}/{v:020d}.checkpoint.parquet")
    dvs = [
        r["add"]["deletionVector"]
        for r in ck.collect()
        if r["add"] and r["add"]["path"]
    ]
    assert sum(1 for d in dvs if d is not None) == 2
    proto = next(
        r["protocol"].asDict(recursive=True)
        for r in ck.collect()
        if r["protocol"] and r["protocol"]["minReaderVersion"]
    )
    assert proto["readerFeatures"] == ["deletionVectors"]
    # log cleanup: the checkpoint alone must still serve FILTERED
    for old in range(v + 1):
        fs.delete(f"{log}/{old:020d}.json", recursive=False)
    assert _rows(delta_scan(spark, table)) == expected


def test_vacuum_keeps_recently_tombstoned_old_files(spark, tmp_path):
    """r14 review finding: vacuum eligibility is the REMOVAL time
    (deletionTimestamp), not file mtime — a 30-day-old file
    overwritten a minute ago must survive the full retention window
    so in-retention time travel keeps working."""
    import os
    import time as _time

    from pandabase_spark.sources.delta_writer import delta_vacuum

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 30), table, partition_by=["p"])
    # age the v0 DATA FILES far past any retention
    old = _time.time() - 40 * 24 * 3600
    for root, _dirs, names in os.walk(table):
        if "_delta_log" in root:
            continue
        for n in names:
            os.utime(os.path.join(root, n), (old, old))
    # tombstone them NOW
    delta_overwrite(_df(spark, 50, 60), table)
    removed = delta_vacuum(spark, table)  # default 7-day retention
    assert removed == []  # recent tombstones protect the old files
    # the pre-overwrite snapshot is still reconstructable
    assert _rows(delta_scan(spark, table, version=0)) == _rows(
        _df(spark, 0, 30)
    )


def test_cleanup_helper_never_deletes_referenced_staging(
    spark, tmp_path
):
    """r14 review finding: the failure-path cleanup must not delete a
    staged directory that a durable commit already references (an
    interrupt can land between the claim and the return)."""
    import json as _json

    from pandabase_spark.sources.delta_writer import (
        _cleanup_staged_if_unreferenced,
    )

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    fs = HadoopFS(spark)
    live = [d for d in fs.list_dirs(table) if d.startswith("c-")]
    assert len(live) == 1
    # referenced (v0 mentions it): must survive
    _cleanup_staged_if_unreferenced(spark, table, live[0], -1)
    assert fs.exists(f"{table}/{live[0]}")
    # an unreferenced orphan: deleted
    fs.mkdirs(f"{table}/c-deadbeef")
    fs.write_text_atomic(f"{table}/c-deadbeef/x.parquet", "junk")
    _cleanup_staged_if_unreferenced(spark, table, "c-deadbeef", -1)
    assert not fs.exists(f"{table}/c-deadbeef")


def test_predicate_coerces_by_schema_type(spark, tmp_path):
    """r14 review finding: predicate comparison follows the COLUMN's
    declared type — a string literal against an int partition column
    compares numerically (no '10' < '9' lexical pruning), and
    uncoercible literals never prune."""
    from pandabase_spark.sources.delta_reader import delta_scan as scan

    table = str(tmp_path / "out")
    # p = id % 12 -> partition values '0'..'11' (two-digit vs one)
    df = spark.range(0, 120).selectExpr(
        "id", "CAST(id % 12 AS INT) AS p"
    )
    delta_create(df, table, partition_by=["p"])
    got = scan(spark, table, predicate=[("p", ">=", "9")])
    assert {r["p"] for r in got.collect()} == {9, 10, 11}
    # numeric literal against int stats column, string spelling
    got2 = scan(spark, table, predicate=[("id", ">=", "100")])
    assert {r["id"] for r in got2.collect()} == set(range(100, 120))
    # uncoercible literal: keeps files, residual filter returns empty
    got3 = scan(spark, table, predicate=[("id", ">", "abc")])
    assert got3.count() == 0


def test_cdf_refuses_when_not_enabled(spark, tmp_path):
    from pandabase_spark.sources.delta_reader import (
        DeltaProtocolError, delta_scan_changes,
    )

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 10), table, partition_by=["p"])
    with pytest.raises(DeltaProtocolError, match="enableChangeDataFeed"):
        delta_scan_changes(spark, table, 0)


def test_cdf_deletes_attribute_partition_values(spark, tmp_path):
    """r14 review finding pair: our overwrite removes now carry
    extendedFileMetadata partitionValues, and even when a foreign
    writer omits them the CDF reader recovers the values from the
    pre-commit snapshot instead of emitting NULL partition keys."""
    import json as _json

    from pandabase_spark.sources.delta_reader import delta_scan_changes

    table = str(tmp_path / "out")
    delta_create(_df(spark, 0, 12), table, partition_by=["p"])
    # enable CDF retroactively (configuration change via metaData)
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    meta = next(
        _json.loads(ln)["metaData"]
        for ln in fs.read_text(f"{log}/{0:020d}.json").splitlines()
        if '"metaData"' in ln
    )
    meta["configuration"]["delta.enableChangeDataFeed"] = "true"
    fs.write_text_atomic(
        f"{log}/{1:020d}.json",
        "\n".join([
            _json.dumps({"commitInfo": {
                "operation": "SET TBLPROPERTIES", "timestamp": 5000,
            }}),
            _json.dumps({"metaData": meta}),
        ]),
    )
    delta_overwrite(_df(spark, 100, 103), table)
    # our writer's removes carry partitionValues
    rm = [
        _json.loads(ln)["remove"]
        for ln in fs.read_text(f"{log}/{2:020d}.json").splitlines()
        if '"remove"' in ln
    ]
    assert rm and all(
        r.get("extendedFileMetadata") and "partitionValues" in r
        for r in rm
    )
    ch = delta_scan_changes(spark, table, 2, 2)
    dels = [r for r in ch.collect() if r["_change_type"] == "delete"]
    assert {(r["id"], r["p"]) for r in dels} == {
        (i, i % 3) for i in range(12)
    }
    assert all(r["p"] is not None for r in dels)
    # strip partitionValues from the removes (foreign writer shape):
    # recovery via the pre-commit snapshot must still attribute them
    lines = fs.read_text(f"{log}/{2:020d}.json").splitlines()
    out = []
    for ln in lines:
        a = _json.loads(ln)
        if "remove" in a:
            a["remove"].pop("partitionValues", None)
            a["remove"].pop("extendedFileMetadata", None)
        out.append(_json.dumps(a))
    fs.write_text_atomic(f"{log}/{2:020d}.json", "\n".join(out))
    ch2 = delta_scan_changes(spark, table, 2, 2)
    dels2 = [r for r in ch2.collect() if r["_change_type"] == "delete"]
    assert {(r["id"], r["p"]) for r in dels2} == {
        (i, i % 3) for i in range(12)
    }
