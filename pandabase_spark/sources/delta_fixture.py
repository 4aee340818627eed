"""Synthetic Delta-table fixture (gate/test support).

Writes a small Delta table BY HAND per the public protocol — JSON
commits, partitionValues carried in the log, a real checkpoint
parquet + ``_last_checkpoint`` — with a deliberately FLAT data file
layout (no hive-style directories), so a reader that lists
directories instead of replaying the log cannot produce the right
answer. Content is arithmetic in the row id (exactly oracle-able).

History written:
  v0  metaData/protocol; add a.parquet (p=0, ids 0..99,  v=id*1)
                         add b.parquet (p=1, ids 100..199, v=id*1)
  v1  remove b; add c.parquet (p=1, ids 100..149, v=id*2)
  v2  add d.parquet (p=2, ids 200..249, v=id*3)  + CHECKPOINT at 2
  v3  remove d; add e.parquet (p=2, ids 200..219, v=id*5)

Live at latest: a + c + e = 170 rows.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pandabase_spark.fs import HadoopFS

SCHEMA_STRING = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
    ],
})


def _write_data_file(spark, fs, table, name, lo, hi, mult):
    df = spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * float(mult)).alias("v")
    )
    tmp = f"{table}/_tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in fs.list_files(tmp) if f.endswith(".parquet")
    )
    fs.rename_dir(f"{tmp}/{part}", f"{table}/{name}")
    fs.delete(tmp)


def _add(path, p, extra=None):
    act = {
        "add": {
            "path": path,
            "partitionValues": {"p": str(p)},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
            **(extra or {}),
        }
    }
    return json.dumps(act)


def make_delta_fixture(spark, table: str) -> None:
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    fs.mkdirs(log)
    _write_data_file(spark, fs, table, "a.parquet", 0, 100, 1)
    _write_data_file(spark, fs, table, "b.parquet", 100, 200, 1)
    _write_data_file(spark, fs, table, "c.parquet", 100, 150, 2)
    _write_data_file(spark, fs, table, "d.parquet", 200, 250, 3)
    _write_data_file(spark, fs, table, "e.parquet", 200, 220, 5)
    meta = json.dumps({
        "metaData": {
            "id": "fixture-0001",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_STRING,
            "partitionColumns": ["p"],
            "configuration": {},
            "createdTime": 0,
        }
    })
    proto = json.dumps(
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    )
    ci = lambda op: json.dumps({"commitInfo": {"operation": op}})
    fs.write_text_atomic(f"{log}/{0:020d}.json", "\n".join([
        ci("CREATE"), proto, meta,
        _add("a.parquet", 0), _add("b.parquet", 1),
    ]))
    fs.write_text_atomic(f"{log}/{1:020d}.json", "\n".join([
        ci("OVERWRITE"),
        json.dumps({"remove": {"path": "b.parquet",
                               "deletionTimestamp": 1, "dataChange": True}}),
        _add("c.parquet", 1),
    ]))
    fs.write_text_atomic(f"{log}/{2:020d}.json", "\n".join([
        ci("APPEND"), _add("d.parquet", 2),
    ]))
    # checkpoint at v2: net state only (adds A, C, D + meta + proto)
    rows = [
        (None, None,
         {"path": "a.parquet", "partitionValues": {"p": "0"},
          "size": 1, "modificationTime": 0, "dataChange": False}),
        (None, None,
         {"path": "c.parquet", "partitionValues": {"p": "1"},
          "size": 1, "modificationTime": 0, "dataChange": False}),
        (None, None,
         {"path": "d.parquet", "partitionValues": {"p": "2"},
          "size": 1, "modificationTime": 0, "dataChange": False}),
        ({"minReaderVersion": 1, "minWriterVersion": 2}, None, None),
        (None, {"id": "fixture-0001", "schemaString": SCHEMA_STRING,
                "partitionColumns": ["p"], "configuration": {}}, None),
    ]
    ck_schema = (
        "protocol struct<minReaderVersion:int,minWriterVersion:int>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>, "
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:long,modificationTime:long,dataChange:boolean>"
    )
    tmp = f"{table}/_tmp_ckpt"
    from pandabase_spark.localframe import local_frame

    local_frame(spark, rows, ck_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = next(
        f for f in HadoopFS(spark).list_files(tmp)
        if f.endswith(".parquet")
    )
    fs.rename_dir(f"{tmp}/{part}", f"{log}/{2:020d}.checkpoint.parquet")
    fs.delete(tmp)
    fs.write_text_atomic(
        f"{log}/_last_checkpoint", json.dumps({"version": 2, "size": 5})
    )
    fs.write_text_atomic(f"{log}/{3:020d}.json", "\n".join([
        ci("REPLACE"),
        json.dumps({"remove": {"path": "d.parquet",
                               "deletionTimestamp": 3, "dataChange": True}}),
        _add("e.parquet", 2),
    ]))


# --------------------------------------------------------------------------
# column-mapping (name mode) fixture
# --------------------------------------------------------------------------

# physical spellings deliberately unlike the logical ones — a reader
# that resolves by logical name against the files cannot pass
CM_PHYS = {"id": "col-9f1a", "v": "col-2b7c", "p": "col-55ee"}

CM_SCHEMA_STRING = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": CM_PHYS["id"]}},
        {"name": "v", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": CM_PHYS["v"]}},
        {"name": "p", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": CM_PHYS["p"]}},
    ],
})


def _write_physical_file(path: str, lo: int, hi: int, mult: float) -> int:
    """One parquet data file with PHYSICAL column names (id, v) via
    pyarrow — Delta data files under name-mode column mapping carry
    the physical spellings. Returns the file size in bytes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = list(range(lo, hi))
    tbl = pa.table({
        CM_PHYS["id"]: pa.array(ids, pa.int64()),
        CM_PHYS["v"]: pa.array([i * mult for i in ids], pa.float64()),
    })
    pq.write_table(tbl, path)
    return os.path.getsize(path)


def make_delta_cm_fixture(spark, table: str) -> None:
    """Name-mode column-mapping table, hand-written per PROTOCOL.md:
    protocol (2, 5) — the legacy column-mapping version pair — with
    ``delta.columnMapping.mode=name`` in metaData.configuration,
    physical names in the schema field metadata, data files speaking
    physical names, and add.partitionValues keyed by the PHYSICAL
    partition column name (what the protocol prescribes under column
    mapping).

    History: v0 adds cm_a (p=0, ids 0..49, v=id*1) and cm_b (p=1,
    ids 50..79, v=id*2); v1 removes cm_b and adds cm_c (p=1, ids
    50..69, v=id*4). Live: cm_a + cm_c = 70 rows."""
    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    fs.mkdirs(log)
    sizes = {
        "cm_a.parquet": _write_physical_file(
            f"{table}/cm_a.parquet", 0, 50, 1.0
        ),
        "cm_b.parquet": _write_physical_file(
            f"{table}/cm_b.parquet", 50, 80, 2.0
        ),
        "cm_c.parquet": _write_physical_file(
            f"{table}/cm_c.parquet", 50, 70, 4.0
        ),
    }

    def add(name, p):
        return json.dumps({"add": {
            "path": name,
            "partitionValues": {CM_PHYS["p"]: str(p)},
            "size": sizes[name], "modificationTime": 0,
            "dataChange": True,
        }})

    fs.write_text_atomic(f"{log}/{0:020d}.json", "\n".join([
        json.dumps({"commitInfo": {"operation": "CREATE"}}),
        json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5,
        }}),
        json.dumps({"metaData": {
            "id": "fixture-cm-01",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": CM_SCHEMA_STRING,
            "partitionColumns": ["p"],
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "3",
            },
            "createdTime": 0,
        }}),
        add("cm_a.parquet", 0), add("cm_b.parquet", 1),
    ]))
    fs.write_text_atomic(f"{log}/{1:020d}.json", "\n".join([
        json.dumps({"commitInfo": {"operation": "OVERWRITE"}}),
        json.dumps({"remove": {"path": "cm_b.parquet",
                               "deletionTimestamp": 1, "dataChange": True}}),
        add("cm_c.parquet", 1),
    ]))


# --------------------------------------------------------------------------
# many-partition-tuples fixture (plan-shape scale test)
# --------------------------------------------------------------------------

def make_delta_many_tuples_fixture(
    spark, table: str, *, n_tuples: int = 1000
) -> None:
    """One live file per partition tuple, ``n_tuples`` tuples across
    (d, h) — the date×hour lake-table shape whose tuple count blows
    up any one-scan-per-tuple plan. Each file holds one row: id = i,
    v = i * 1.0, partitioned by d = i // 24, h = i % 24. A single v0
    commit carries every add. Data files are written with pyarrow
    (1000 Spark write jobs would dominate the test)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    fs.mkdirs(log)
    acts = [
        json.dumps({"commitInfo": {"operation": "CREATE"}}),
        json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2,
        }}),
        json.dumps({"metaData": {
            "id": "fixture-many-01",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "long",
                     "nullable": True, "metadata": {}},
                    {"name": "v", "type": "double",
                     "nullable": True, "metadata": {}},
                    {"name": "d", "type": "integer",
                     "nullable": True, "metadata": {}},
                    {"name": "h", "type": "integer",
                     "nullable": True, "metadata": {}},
                ],
            }),
            "partitionColumns": ["d", "h"],
            "configuration": {},
            "createdTime": 0,
        }}),
    ]
    import os

    for i in range(n_tuples):
        name = f"f{i:05d}.parquet"
        pq.write_table(
            pa.table({
                "id": pa.array([i], pa.int64()),
                "v": pa.array([i * 1.0], pa.float64()),
            }),
            f"{table}/{name}",
        )
        acts.append(json.dumps({"add": {
            "path": name,
            "partitionValues": {"d": str(i // 24), "h": str(i % 24)},
            "size": os.path.getsize(f"{table}/{name}"),
            "modificationTime": 0, "dataChange": True,
        }}))
    fs.write_text_atomic(f"{log}/{0:020d}.json", "\n".join(acts))




# --------------------------------------------------------------------------
# deletion-vector fixture
# --------------------------------------------------------------------------

def make_delta_dv_fixture(spark, table: str) -> None:
    """Hand-written deletion-vector table per PROTOCOL.md's DV format:
    protocol (3, 7) with reader+writer feature ``deletionVectors``;
    two partitioned data files; v1 re-adds both with DVs attached —
    file dva via a SIDECAR ``ab/deletion_vector_<uuid>.bin``
    (storageType ``u``, Z85 uuid with a random prefix, the blob
    framed [size BE][data][crc BE] and the data a 64-bit roaring
    bitmap) deleting the odd row positions below 20, and file dvb via
    an INLINE descriptor (storageType ``i``, Z85 payload padded to a
    4-byte multiple) deleting row positions 0..4.

    Live rows: dva ids {0..99} minus odd ids < 20 (90 rows, p=0) +
    dvb ids {105..179} (75 rows, p=1) = 165."""
    import os
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pandabase_spark.sources.dv import (
        build_dv_file, encode_dv_data, z85_encode,
    )

    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    fs.mkdirs(log)

    def write_data(name, lo, hi):
        ids = list(range(lo, hi))
        pq.write_table(
            pa.table({
                "id": pa.array(ids, pa.int64()),
                "v": pa.array([i * 1.0 for i in ids], pa.float64()),
            }),
            f"{table}/{name}",
        )
        return os.path.getsize(f"{table}/{name}")

    sizes = {
        "dva.parquet": write_data("dva.parquet", 0, 100),
        "dvb.parquet": write_data("dvb.parquet", 100, 180),
    }

    # sidecar DV for dva: row positions 1,3,...,19
    blob_a = encode_dv_data(list(range(1, 20, 2)))
    dv_bytes, offsets = build_dv_file([blob_a])
    u = _uuid.uuid4()
    fs.mkdirs(f"{table}/ab")
    with open(f"{table}/ab/deletion_vector_{u}.bin", "wb") as fh:
        fh.write(dv_bytes)
    dv_a = {
        "storageType": "u",
        "pathOrInlineDv": "ab" + z85_encode(u.bytes),
        "offset": offsets[0],
        "sizeInBytes": len(blob_a),
        "cardinality": 10,
    }
    # inline DV for dvb: row positions 0..4 (ids 100..104)
    blob_b = encode_dv_data([0, 1, 2, 3, 4])
    padded = blob_b + b"\x00" * (-len(blob_b) % 4)
    dv_b = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(blob_b),
        "cardinality": 5,
    }

    def add(name, p, dv=None):
        act = {
            "path": name,
            "partitionValues": {"p": str(p)},
            "size": sizes[name], "modificationTime": 0,
            "dataChange": True,
        }
        if dv is not None:
            act["deletionVector"] = dv
        return json.dumps({"add": act})

    meta = json.dumps({"metaData": {
        "id": "fixture-dv-01",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": ["p"],
        "configuration": {},
        "createdTime": 0,
    }})
    fs.write_text_atomic(f"{log}/{0:020d}.json", "\n".join([
        json.dumps({"commitInfo": {"operation": "CREATE"}}),
        json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }}),
        meta,
        add("dva.parquet", 0), add("dvb.parquet", 1),
    ]))
    fs.write_text_atomic(f"{log}/{1:020d}.json", "\n".join([
        json.dumps({"commitInfo": {"operation": "DELETE"}}),
        add("dva.parquet", 0, dv_a), add("dvb.parquet", 1, dv_b),
    ]))


# --------------------------------------------------------------------------
# change-data-feed fixture
# --------------------------------------------------------------------------

def make_delta_cdf_fixture(spark, table: str) -> None:
    """Change-data-feed table, hand-written per PROTOCOL.md's "Add
    CDC File": v1 carries an explicit ``cdc`` action whose
    ``_change_data/`` parquet stores per-row ``_change_type``
    (update_preimage/update_postimage) — and ALSO a remove+add pair
    that a conformant CDF reader must IGNORE (commits with cdc
    actions are described exclusively by them); v0/v2 synthesize
    inserts from dataChange adds; v3 synthesizes deletes from the
    still-retained removed file. commitInfo timestamps are pinned so
    the change feed is exactly oracle-able.

    History (unpartitioned; id long, v double):
      v0 @1000ms  add f0 (ids 0..9, v=id)          -> insert x10
      v1 @2000ms  cdc cdc-0 (ids 0..4 pre id*1 / post id*10)
                  + remove f0 + add f0b             -> 10 cdc rows
      v2 @3000ms  add f2 (ids 100..104, v=id)       -> insert x5
      v3 @4000ms  remove f2                         -> delete x5
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    fs = HadoopFS(spark)
    log = f"{table}/_delta_log"
    fs.mkdirs(log)
    fs.mkdirs(f"{table}/_change_data")

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {}},
        ],
    })

    def data_file(name, rows):
        pq.write_table(
            pa.table({
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "v": pa.array([r[1] for r in rows], pa.float64()),
            }),
            f"{table}/{name}",
        )
        return os.path.getsize(f"{table}/{name}")

    f0 = data_file("f0.parquet", [(i, float(i)) for i in range(10)])
    f0b = data_file(
        "f0b.parquet",
        [(i, 10.0 * i) for i in range(5)]
        + [(i, float(i)) for i in range(5, 10)],
    )
    f2 = data_file(
        "f2.parquet", [(i, float(i)) for i in range(100, 105)]
    )
    cdc_rows = (
        [(i, 1.0 * i, "update_preimage") for i in range(5)]
        + [(i, 10.0 * i, "update_postimage") for i in range(5)]
    )
    pq.write_table(
        pa.table({
            "id": pa.array([r[0] for r in cdc_rows], pa.int64()),
            "v": pa.array([r[1] for r in cdc_rows], pa.float64()),
            "_change_type": pa.array(
                [r[2] for r in cdc_rows], pa.string()
            ),
        }),
        f"{table}/_change_data/cdc-0.parquet",
    )
    cdc_size = os.path.getsize(f"{table}/_change_data/cdc-0.parquet")

    def add(name, size, data_change=True):
        return json.dumps({"add": {
            "path": name, "partitionValues": {}, "size": size,
            "modificationTime": 0, "dataChange": data_change,
        }})

    def ci(op, ts):
        return json.dumps(
            {"commitInfo": {"operation": op, "timestamp": ts}}
        )

    fs.write_text_atomic(f"{log}/{0:020d}.json", "\n".join([
        ci("CREATE", 1000),
        json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4,
        }}),
        json.dumps({"metaData": {
            "id": "fixture-cdf-01",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {"delta.enableChangeDataFeed": "true"},
            "createdTime": 1000,
        }}),
        add("f0.parquet", f0),
    ]))
    fs.write_text_atomic(f"{log}/{1:020d}.json", "\n".join([
        ci("UPDATE", 2000),
        json.dumps({"cdc": {
            "path": "_change_data/cdc-0.parquet",
            "partitionValues": {}, "size": cdc_size,
            "dataChange": False,
        }}),
        json.dumps({"remove": {"path": "f0.parquet",
                               "deletionTimestamp": 2000,
                               "dataChange": True,
                               "partitionValues": {}}}),
        add("f0b.parquet", f0b),
    ]))
    fs.write_text_atomic(f"{log}/{2:020d}.json", "\n".join([
        ci("WRITE", 3000), add("f2.parquet", f2),
    ]))
    fs.write_text_atomic(f"{log}/{3:020d}.json", "\n".join([
        ci("DELETE", 4000),
        json.dumps({"remove": {"path": "f2.parquet",
                               "deletionTimestamp": 4000,
                               "dataChange": True,
                               "partitionValues": {}}}),
    ]))
