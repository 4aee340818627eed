"""Delta Lake log-replay reader (r13 interop surface).

The fixture below writes a synthetic Delta table BY HAND per the
public protocol (JSON commits, partitionValues in the log, a real
checkpoint parquet + _last_checkpoint) with a deliberately FLAT data
layout — no hive-style directories — so a reader that cheats by
listing directories instead of replaying the log cannot pass.
Content is arithmetic in the row id, so every expectation is exact.

Table history:
  v0  metaData/protocol; add A (p=0, ids 0..99, v=id*1)
                         add B (p=1, ids 100..199, v=id*1)
  v1  remove B; add C (p=1, ids 100..149, v=id*2)   [overwrite]
  v2  add D (p=2, ids 200..249, v=id*3)  + CHECKPOINT at 2
  v3  remove D; add E (p=2, ids 200..219, v=id*5)

Live at latest: A + C + E (170 rows).
"""

from __future__ import annotations

import json

import pytest

from pandabase_spark.fs import HadoopFS
from pandabase_spark.sources.delta_fixture import make_delta_fixture
from pandabase_spark.sources.delta_reader import (
    DeltaProtocolError,
    delta_history,
    delta_scan,
    delta_table_version,
)

def _expected_latest():
    return (
        {(i, float(i), 0) for i in range(100)}
        | {(i, 2.0 * i, 1) for i in range(100, 150)}
        | {(i, 5.0 * i, 2) for i in range(200, 220)}
    )


@pytest.fixture()
def delta_table(spark, tmp_path):
    table = str(tmp_path / "dtab")
    make_delta_fixture(spark, table)
    return table


def _rows(df):
    return {(r["id"], r["v"], r["p"]) for r in df.collect()}


def test_delta_scan_latest_replays_checkpoint_plus_tail(
    spark, delta_table
):
    df = delta_scan(spark, delta_table)
    assert df.columns == ["id", "v", "p"]
    assert _rows(df) == _expected_latest()
    assert delta_table_version(spark, delta_table) == 3
    ops = [h["operation"] for h in delta_history(spark, delta_table)]
    assert ops == ["REPLACE"]  # tail above the checkpoint


def test_delta_scan_time_travel(spark, delta_table):
    v1 = delta_scan(spark, delta_table, version=1)
    assert _rows(v1) == (
        {(i, float(i), 0) for i in range(100)}
        | {(i, 2.0 * i, 1) for i in range(100, 150)}
    )
    v0 = delta_scan(spark, delta_table, version=0)
    assert _rows(v0) == {
        (i, float(i), 0 if i < 100 else 1) for i in range(200)
    }
    with pytest.raises(NameError, match="not in Delta log"):
        delta_scan(spark, delta_table, version=9)


def test_delta_scan_partition_filter_prunes_files(spark, delta_table):
    got = delta_scan(
        spark, delta_table,
        partition_filter=lambda pv: pv.get("p") == "1",
    )
    assert _rows(got) == {(i, 2.0 * i, 1) for i in range(100, 150)}
    # empty selection: typed empty frame, no scan
    none = delta_scan(
        spark, delta_table, partition_filter=lambda pv: False
    )
    assert none.count() == 0 and none.columns == ["id", "v", "p"]


def test_delta_scan_survives_log_cleanup_via_checkpoint(
    spark, delta_table
):
    """Delete the commits the checkpoint covers (Delta's log cleanup):
    latest reads must still work from checkpoint + tail; pinned
    versions below the checkpoint raise the truncation error."""
    fs = HadoopFS(spark)
    log = f"{delta_table}/_delta_log"
    for v in (0, 1, 2):
        fs.delete(f"{log}/{v:020d}.json", recursive=False)
    assert _rows(delta_scan(spark, delta_table)) == _expected_latest()
    with pytest.raises(NameError, match="outside the retained log"):
        delta_scan(spark, delta_table, version=1)


def test_delta_scan_refuses_unsupported_features(spark, tmp_path):
    # deletionVectors is now an IMPLEMENTED reader feature (r14):
    # declaring it must not refuse a table with no DVs attached
    table = str(tmp_path / "dv")
    make_delta_fixture(spark, table)
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    fs.write_text_atomic(f"{log}/{4:020d}.json", json.dumps({
        "protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    }))
    assert _rows(delta_scan(spark, table)) == _expected_latest()
    # an unknown DV storage type refuses rather than misreads
    table2 = str(tmp_path / "dv2")
    make_delta_fixture(spark, table2)
    log2 = f"{table2}/_delta_log"
    fs.write_text_atomic(f"{log2}/{4:020d}.json", json.dumps({
        "add": {
            "path": "e.parquet", "partitionValues": {"p": "2"},
            "size": 1, "modificationTime": 0, "dataChange": True,
            "deletionVector": {"storageType": "x", "pathOrInlineDv": "x",
                               "sizeInBytes": 1, "cardinality": 1},
        }
    }))
    with pytest.raises(DeltaProtocolError, match="storage type"):
        delta_scan(spark, table2).collect()
    # unknown reader feature: refuse rather than misread
    table3 = str(tmp_path / "dv3")
    make_delta_fixture(spark, table3)
    fs.write_text_atomic(
        f"{table3}/_delta_log/{4:020d}.json", json.dumps({
            "protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["someFutureFeature"],
            }
        })
    )
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        delta_scan(spark, table3)


def test_delta_scan_serves_deletion_vectors(spark, tmp_path):
    """r14: DV-bearing tables are served FILTERED — sidecar (u) and
    inline (i) bitmaps expand executor-side and anti-join
    _metadata.row_index; deleted rows never surface; time travel to
    the pre-DV version restores them; partition pruning composes."""
    from pandabase_spark.sources.delta_fixture import make_delta_dv_fixture

    table = str(tmp_path / "dvt")
    make_delta_dv_fixture(spark, table)
    df = delta_scan(spark, table)
    assert df.columns == ["id", "v", "p"]
    live_a = {i for i in range(100) if not (i < 20 and i % 2 == 1)}
    assert _rows(df) == (
        {(i, 1.0 * i, 0) for i in live_a}
        | {(i, 1.0 * i, 1) for i in range(105, 180)}
    )
    # pre-DV snapshot: every row still present
    v0 = delta_scan(spark, table, version=0)
    assert v0.count() == 180
    # planning-time pruning composes with the DV anti-join
    p0 = delta_scan(
        spark, table, partition_filter=lambda pv: pv.get("p") == "0"
    )
    assert {r["id"] for r in p0.collect()} == live_a


def test_delta_scan_corrupt_dv_raises(spark, tmp_path):
    """A DV whose bitmap cardinality disagrees with its descriptor —
    or whose sidecar bytes are corrupted — must raise, never serve."""
    from pandabase_spark.fs import HadoopFS as _FS
    from pandabase_spark.sources.delta_fixture import make_delta_dv_fixture

    table = str(tmp_path / "dvc")
    make_delta_dv_fixture(spark, table)
    fs = _FS(spark)
    # corrupt the sidecar: flip a byte inside the framed blob
    name = next(
        n for n in fs.list_files(f"{table}/ab")
        if n.startswith("deletion_vector_")
    )
    p = f"{table}/ab/{name}"
    with open(p, "rb") as fh:
        raw = bytearray(fh.read())
    raw[10] ^= 0xFF
    with open(p, "wb") as fh:
        fh.write(bytes(raw))
    with pytest.raises(Exception, match="checksum|size mismatch|magic"):
        delta_scan(spark, table).collect()


def test_delta_scan_not_a_table(spark, tmp_path):
    with pytest.raises(NameError, match="not a Delta table"):
        delta_scan(spark, str(tmp_path / "nope"))


def test_delta_scan_column_mapping_name_mode(spark, tmp_path):
    """Name-mode column mapping (r14): data files speak physical
    names, the result speaks logical names; partitionValues in the
    log are keyed by the physical partition-column name; the
    partition_filter callback still sees LOGICAL keys."""
    from pandabase_spark.sources.delta_fixture import make_delta_cm_fixture

    table = str(tmp_path / "cm")
    make_delta_cm_fixture(spark, table)
    df = delta_scan(spark, table)
    assert df.columns == ["id", "v", "p"]
    assert _rows(df) == (
        {(i, 1.0 * i, 0) for i in range(50)}
        | {(i, 4.0 * i, 1) for i in range(50, 70)}
    )
    # time travel pre-overwrite
    v0 = delta_scan(spark, table, version=0)
    assert _rows(v0) == (
        {(i, 1.0 * i, 0) for i in range(50)}
        | {(i, 2.0 * i, 1) for i in range(50, 80)}
    )
    # planning-time pruning with logical keys
    only1 = delta_scan(
        spark, table, partition_filter=lambda pv: pv.get("p") == "1"
    )
    assert _rows(only1) == {(i, 4.0 * i, 1) for i in range(50, 70)}


def test_delta_scan_refuses_id_mode_mapping(spark, tmp_path):
    from pandabase_spark.fs import HadoopFS
    from pandabase_spark.sources.delta_fixture import make_delta_cm_fixture

    table = str(tmp_path / "cmid")
    make_delta_cm_fixture(spark, table)
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    meta = None
    for line in fs.read_text(f"{log}/{0:020d}.json").splitlines():
        act = json.loads(line)
        if "metaData" in act:
            meta = act["metaData"]
    meta["configuration"]["delta.columnMapping.mode"] = "id"
    fs.write_text_atomic(
        f"{log}/{2:020d}.json", json.dumps({"metaData": meta})
    )
    with pytest.raises(DeltaProtocolError, match="id"):
        delta_scan(spark, table)


def test_delta_scan_many_tuples_single_scan(spark, tmp_path):
    """r13 verdict scale finding: 1,000 live partition tuples must
    plan as ONE parquet scan (+ one broadcast mapping join), not one
    union leg per tuple — the date×hour lake-table shape."""
    from pandabase_spark.sources.delta_fixture import (
        make_delta_many_tuples_fixture,
    )

    table = str(tmp_path / "many")
    make_delta_many_tuples_fixture(spark, table, n_tuples=1000)
    df = delta_scan(spark, table)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    got = {
        (r["id"], r["v"], r["d"], r["h"]) for r in df.collect()
    }
    assert got == {
        (i, i * 1.0, i // 24, i % 24) for i in range(1000)
    }
    # planning-time pruning still reaches the single scan: one day
    pruned = delta_scan(
        spark, table, partition_filter=lambda pv: pv.get("d") == "3"
    )
    assert {r["id"] for r in pruned.collect()} == set(range(72, 96))


def test_incomplete_multipart_checkpoint_falls_back_to_complete(
    spark, delta_table
):
    """r13 review finding: a crashed (incomplete) NEWER multi-part
    checkpoint must not mask an older complete one — and time travel
    to a version above everything still raises on a fully-cleaned
    log."""
    fs = HadoopFS(spark)
    log = f"{delta_table}/_delta_log"
    # a bogus _last_checkpoint + one part of a "2-part" v3 checkpoint
    fs.write_text_atomic(
        f"{log}/_last_checkpoint",
        json.dumps({"version": 3, "parts": 2, "size": 9}),
    )
    fs.rename_dir(
        f"{log}/{2:020d}.checkpoint.parquet",
        f"{log}/{2:020d}.checkpoint.parquet.keep",
    )
    fs.rename_dir(
        f"{log}/{2:020d}.checkpoint.parquet.keep",
        f"{log}/{2:020d}.checkpoint.parquet",
    )
    fs.write_text_atomic(
        f"{log}/{3:020d}.checkpoint.{1:010d}.{2:010d}.parquet", "junk"
    )
    # clean the covered commits: replay MUST use the complete v2
    for v in (0, 1, 2):
        fs.delete(f"{log}/{v:020d}.json", recursive=False)
    assert _rows(delta_scan(spark, delta_table)) == _expected_latest()
    # bound check uses checkpoint head when the JSON tail is short
    with pytest.raises(NameError, match="not in Delta log"):
        delta_scan(spark, delta_table, version=99)


def test_delta_scan_changes_cdf(spark, tmp_path):
    """r14 Change Data Feed: explicit cdc files rule their commit
    (the remove+add pair in the same commit is ignored); commits
    without cdc synthesize inserts from dataChange adds and deletes
    from the still-retained removed file; dataChange=false actions
    are invisible; version/timestamp ride every row."""
    from pandabase_spark.sources.delta_fixture import make_delta_cdf_fixture
    from pandabase_spark.sources.delta_reader import delta_scan_changes

    table = str(tmp_path / "cdf")
    make_delta_cdf_fixture(spark, table)
    df = delta_scan_changes(spark, table, 0)
    assert df.columns == [
        "id", "v", "_change_type", "_commit_version",
        "_commit_timestamp",
    ]
    got = {
        (r["id"], r["v"], r["_change_type"], r["_commit_version"],
         int(r["_commit_timestamp"].timestamp() * 1000))
        for r in df.collect()
    }
    want = (
        {(i, 1.0 * i, "insert", 0, 1000) for i in range(10)}
        | {(i, 1.0 * i, "update_preimage", 1, 2000) for i in range(5)}
        | {(i, 10.0 * i, "update_postimage", 1, 2000)
           for i in range(5)}
        | {(i, 1.0 * i, "insert", 2, 3000) for i in range(100, 105)}
        | {(i, 1.0 * i, "delete", 3, 4000) for i in range(100, 105)}
    )
    assert got == want
    # sub-ranges
    v1 = delta_scan_changes(spark, table, 1, 1)
    assert {r["_change_type"] for r in v1.collect()} == {
        "update_preimage", "update_postimage",
    }
    v23 = delta_scan_changes(spark, table, 2, 3)
    assert v23.count() == 10
    # deletes whose file was vacuumed raise instead of under-reporting
    from pandabase_spark.fs import HadoopFS as _FS

    _FS(spark).delete(f"{table}/f2.parquet", recursive=False)
    with pytest.raises(NameError, match="vacuumed"):
        delta_scan_changes(spark, table, 3, 3)
    # range below the retained tail raises
    _FS(spark).delete(
        f"{table}/_delta_log/{0:020d}.json", recursive=False
    )
    with pytest.raises(NameError, match="outside the retained log"):
        delta_scan_changes(spark, table, 0, 1)
