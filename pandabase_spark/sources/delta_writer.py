"""Write Delta Lake tables WITHOUT delta-spark — the export half of
the interop story (:mod:`delta_reader` is the import half): publish a
DataFrame as a Delta table any protocol-conformant engine (Spark +
delta-spark, DuckDB's delta extension, Trino, Polars) can read.

Protocol conformance (PROTOCOL.md, reader version 1 / writer 2):

- data files are plain parquet WITHOUT partition columns; partition
  values ride the log's per-file ``partitionValues`` (string-typed),
  exactly what partitioned Spark writes produce when the partition
  directories are stripped;
- each commit is one ``{v:020d}.json`` of newline-delimited actions
  (``commitInfo`` / ``protocol`` / ``metaData`` / ``add`` /
  ``remove``), claimed with PUT-IF-ABSENT — the same atomic
  primitive the keyed-table OCC uses (``HadoopFS
  .write_text_if_absent``: link(2) locally, create-no-overwrite on
  HDFS), which IS Delta's LogStore contract;
- concurrent writers: an append that loses the claim race RETRIES at
  the next version (appends are non-conflicting by definition); an
  overwrite recomputes its remove set against the NEW head before
  retrying — overwrite semantics are "replace whatever is live at
  commit time", so re-resolving is the correct conflict resolution,
  not an error;
- :func:`delta_checkpoint` writes the net-state checkpoint parquet +
  ``_last_checkpoint`` so long histories read in O(checkpoint +
  tail) — the same recovery path :func:`delta_reader.delta_scan`
  consumes, and what allows Delta's log cleanup.

Subset: no deletion vectors, no column mapping, no generated
columns — the writer never claims features it does not write
(``minWriterVersion`` 2, no feature lists), so conformant readers
accept the output without capability negotiation.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from pandabase_spark.sources.delta_reader import (
    LOG_SUBDIR,
    _replay,
)


def _fs(spark: SparkSession):
    from pandabase_spark.fs import HadoopFS

    return HadoopFS(spark)


def _unescape_hive(name: str) -> str:
    """Decode hive-style ``%XX`` escaping in a partition directory
    value — the log's partitionValues carry the RAW string."""
    import re

    return re.sub(
        r"%([0-9A-Fa-f]{2})",
        lambda m: chr(int(m.group(1), 16)),
        name,
    )


def _stage_data_files(
    df: DataFrame, table: str, partition_by: "Sequence[str]"
) -> "list[dict]":
    """Write ``df``'s data as protocol-shaped parquet files under a
    unique commit directory and return their add-action dicts
    (root-relative paths, string partitionValues). A partitioned
    write drops the partition columns from the files (the Delta
    shape) and encodes their values in hive directories, which are
    parsed into partitionValues and kept — readers never rely on
    them, but path-style layout keeps the table human-navigable."""
    fs = _fs(df.sparkSession)
    sub = f"c-{uuid.uuid4().hex[:12]}"
    staged = f"{table}/{sub}"
    w = df.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staged)
    adds: "list[dict]" = []
    now = int(time.time() * 1000)

    def walk(rel_dir: str, pvals: "dict[str, str]") -> None:
        full = f"{table}/{rel_dir}"
        for d in fs.list_dirs(full):
            if "=" in d:
                k, _, v = d.partition("=")
                walk(f"{rel_dir}/{d}", {**pvals, k: _unescape_hive(v)})
        for f_ in fs.list_files(full):
            if not f_.endswith(".parquet"):
                continue
            adds.append({
                "path": f"{rel_dir}/{f_}",
                "partitionValues": dict(pvals),
                "size": int(fs.du(f"{full}/{f_}")),
                "modificationTime": now,
                "dataChange": True,
            })

    walk(sub, {})
    return adds


def _claim(fs, log_dir: str, actions: "list[dict]", v: int) -> bool:
    text = "\n".join(json.dumps(a) for a in actions)
    return fs.write_text_if_absent(f"{log_dir}/{v:020d}.json", text)


def _latest_version(fs, log_dir: str) -> int:
    best = -1
    for n in fs.list_files(log_dir):
        if n.endswith(".json") and n[:-5].isdigit():
            best = max(best, int(n[:-5]))
    return best


def delta_create(
    df: DataFrame,
    table: str,
    *,
    partition_by: "Sequence[str] | None" = None,
) -> None:
    """Create a NEW Delta table at ``table`` from ``df`` (version 0:
    protocol + metaData + the initial adds). Raises if a Delta log
    already exists there."""
    spark = df.sparkSession
    fs = _fs(spark)
    log_dir = f"{table}/{LOG_SUBDIR}"
    if fs.exists(log_dir) and fs.list_files(log_dir):
        raise FileExistsError(f"Delta table already exists at {table}")
    partition_by = list(partition_by or [])
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise NameError(f"partition columns not in frame: {missing}")
    fs.mkdirs(log_dir)
    adds = _stage_data_files(df, table, partition_by)
    actions = [
        {"commitInfo": {"operation": "CREATE TABLE AS SELECT",
                        "timestamp": int(time.time() * 1000)}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": uuid.uuid4().hex,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": partition_by,
            "configuration": {},
            "createdTime": int(time.time() * 1000),
        }},
        *({"add": a} for a in adds),
    ]
    if not _claim(fs, log_dir, actions, 0):
        raise FileExistsError(
            f"lost the version-0 claim race at {table}"
        )


def _commit_with_retry(
    spark: SparkSession,
    table: str,
    build: "callable",
    *,
    max_attempts: int = 30,
) -> int:
    """Claim the next version with ``build(state) -> [actions]``
    re-evaluated against the FRESH head on every attempt — Delta's
    optimistic-commit loop over the put-if-absent LogStore
    primitive."""
    fs = _fs(spark)
    log_dir = f"{table}/{LOG_SUBDIR}"
    for _ in range(max_attempts):
        state = _replay(spark, table, None)
        v = max(
            int(state["version"]), _latest_version(fs, log_dir)
        ) + 1
        if _claim(fs, log_dir, build(state), v):
            return v
    raise RuntimeError(
        f"could not claim a Delta commit at {table} after "
        f"{max_attempts} attempts"
    )


def delta_append(df: DataFrame, table: str) -> int:
    """Append ``df`` to an existing Delta table (blind adds — the
    non-conflicting operation; a lost claim race simply retries at
    the next version). Returns the committed version."""
    spark = df.sparkSession
    state = _replay(spark, table, None)
    pcols = state["partition_columns"]
    if [f.name for f in state["schema"].fields] != df.columns:
        df = df.select(*[f.name for f in state["schema"].fields])
    adds = _stage_data_files(df, table, pcols)
    actions_tail = [
        {"commitInfo": {"operation": "WRITE",
                        "timestamp": int(time.time() * 1000)}},
        *({"add": a} for a in adds),
    ]
    return _commit_with_retry(spark, table, lambda _s: actions_tail)


def delta_overwrite(df: DataFrame, table: str) -> int:
    """Replace the table's contents with ``df``: remove everything
    live AT COMMIT TIME, add the new files. On a lost claim race the
    remove set is recomputed against the new head — overwrite means
    "replace whatever is there", so re-resolution is the semantics,
    not a conflict. Returns the committed version."""
    spark = df.sparkSession
    state = _replay(spark, table, None)
    pcols = state["partition_columns"]
    if [f.name for f in state["schema"].fields] != df.columns:
        df = df.select(*[f.name for f in state["schema"].fields])
    adds = _stage_data_files(df, table, pcols)

    def build(fresh: dict) -> "list[dict]":
        now = int(time.time() * 1000)
        return [
            {"commitInfo": {"operation": "WRITE", "timestamp": now,
                            "operationParameters": {"mode": "Overwrite"}}},
            *(
                {"remove": {"path": p, "deletionTimestamp": now,
                            "dataChange": True}}
                for p in sorted(fresh["files"])
            ),
            *({"add": a} for a in adds),
        ]

    return _commit_with_retry(spark, table, build)


def delta_checkpoint(spark: SparkSession, table: str) -> int:
    """Write the classic checkpoint for the table's LATEST version
    (net state: protocol + metaData + live adds) plus
    ``_last_checkpoint`` — after which commits at or below it may be
    cleaned up and readers pay O(checkpoint + tail). Returns the
    checkpointed version."""
    fs = _fs(spark)
    state = _replay(spark, table, None)
    v = int(state["version"])
    log_dir = f"{table}/{LOG_SUBDIR}"
    rows = [
        ({"minReaderVersion": 1, "minWriterVersion": 2}, None, None),
        (None, {
            "id": uuid.uuid4().hex,
            "schemaString": state["schema"].json(),
            "partitionColumns": list(state["partition_columns"]),
            "configuration": {},
        }, None),
    ]
    for add in state["files"].values():
        rows.append((None, None, {
            "path": add["path"],
            "partitionValues": dict(add.get("partitionValues") or {}),
            "size": int(add.get("size") or 1),
            "modificationTime": int(add.get("modificationTime") or 0),
            "dataChange": False,
        }))
    ck_schema = (
        "protocol struct<minReaderVersion:int,minWriterVersion:int>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>, "
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:long,modificationTime:long,dataChange:boolean>"
    )
    tmp = f"{table}/_ckpt_tmp_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame(rows, ck_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = next(
        f for f in fs.list_files(tmp) if f.endswith(".parquet")
    )
    dest = f"{log_dir}/{v:020d}.checkpoint.parquet"
    fs.delete(dest, recursive=False)
    fs.rename_dir(f"{tmp}/{part}", dest)
    fs.delete(tmp)
    fs.write_text_atomic(
        f"{log_dir}/_last_checkpoint",
        json.dumps({"version": v, "size": len(rows)}),
    )
    return v
