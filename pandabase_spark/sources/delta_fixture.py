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
    spark.createDataFrame(rows, ck_schema).coalesce(1).write.mode(
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


