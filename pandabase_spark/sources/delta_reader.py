"""Read Delta Lake tables WITHOUT delta-spark — log-replay reader.

Interop surface: a migration onto this engine usually starts next to
an existing lakehouse, and the most common ask is "read the Delta
table we already have". This module implements the READ side of the
public Delta transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) directly
over the Hadoop FileSystem API:

- ``_delta_log/_last_checkpoint`` -> newest checkpoint (parquet,
  struct columns ``add`` / ``remove`` / ``metaData`` / ``protocol``),
  then the JSON commit tail replays on top — exactly the recovery
  path the protocol prescribes, so a 10^5-commit table costs one
  checkpoint read + the tail, not 10^5 JSON reads.
- action replay builds the LIVE file set (add wins, remove deletes;
  later versions override earlier ones), the current ``metaData``
  (schema + partition columns) and ``protocol``.
- data files are opened with an EXPLICIT schema (Delta data files do
  NOT contain partition columns); partition values come from the
  log's per-file ``partitionValues`` map and are attached as typed
  literal columns — one read per live partition tuple, unioned.
- ``partition_filter=`` prunes AT PLANNING TIME against the log's
  partition values: unmatched files never reach a Spark scan (the
  log IS the index — no directory listing at all, the property that
  matters on object stores).
- ``version=`` pins time travel: replay stops at that commit.

Deliberate subset (raise, never silently misread):

- deletion vectors (reader feature ``deletionVectors``) — a file
  with a DV attached must not be served unfiltered;
- column mapping (``columnMapping`` in name/id mode) — physical
  names diverge from logical ones;
- ``minReaderVersion`` > 3 or unknown reader features.

The reference has no lake interop at all (pandas + SQLAlchemy,
reference:pandabase/pandabase.py); this is engine extension surface.
Everything here derives from the public protocol document and the
Spark/DuckDB-visible on-disk format.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

LOG_SUBDIR = "_delta_log"

_BLOCKED_READER_FEATURES = {
    "deletionVectors": "deletion vectors (rows would resurrect)",
    "columnMapping": "column mapping (physical names diverge)",
    "v2Checkpoint": "v2 checkpoints (sidecar manifest layout)",
    "typeWidening": "type widening (file/logical types diverge)",
}
_KNOWN_OK_FEATURES = {
    # write-side features a reader may ignore per the protocol
    "appendOnly", "invariants", "checkConstraints", "generatedColumns",
    "changeDataFeed", "identityColumns", "rowTracking", "domainMetadata",
    "timestampNtz", "vacuumProtocolCheck", "allowColumnDefaults",
    "icebergCompatV1", "icebergCompatV2",
}


class DeltaProtocolError(ValueError):
    """The table needs a reader capability this subset refuses."""


def _fs(spark: SparkSession):
    from pandabase_spark.fs import HadoopFS

    return HadoopFS(spark)


def _commit_version(name: str) -> "int | None":
    """Version of a JSON commit file name (``{v:020d}.json``)."""
    if not name.endswith(".json"):
        return None
    stem = name[:-5]
    return int(stem) if stem.isdigit() else None


def _checkpoint_files(fs, log_dir: str, upto: "int | None") -> (
    "tuple[int, list[str]] | None"
):
    """Newest usable checkpoint at or below ``upto``: prefer
    ``_last_checkpoint`` (one read), fall back to listing. Returns
    (version, [checkpoint parquet paths]) — multi-part checkpoints
    (``{v}.checkpoint.{i}.{n}.parquet``) return every part."""
    names = fs.list_files(log_dir)
    best: "tuple[int, list[str]] | None" = None
    lc = f"{log_dir}/_last_checkpoint"
    if fs.exists(lc):
        try:
            meta = json.loads(fs.read_text(lc))
            v = int(meta["version"])
            if upto is None or v <= upto:
                parts = int(meta.get("parts", 0) or 0)
                if parts:
                    cand = [
                        f"{log_dir}/{v:020d}.checkpoint."
                        f"{i + 1:010d}.{parts:010d}.parquet"
                        for i in range(parts)
                    ]
                else:
                    cand = [f"{log_dir}/{v:020d}.checkpoint.parquet"]
                if all(fs.exists(c) for c in cand):
                    best = (v, cand)
        except Exception:
            best = None  # corrupt hint: fall back to the listing
    if best is None:
        singles: "dict[int, list[str]]" = {}
        multis: "dict[int, dict[int, tuple[int, str]]]" = {}
        for n in names:
            if not n.endswith(".parquet") or ".checkpoint" not in n:
                continue
            stem = n.split(".checkpoint", 1)[0]
            if not stem.isdigit():
                continue
            v = int(stem)
            if upto is not None and v > upto:
                continue
            tail = n.split(".checkpoint", 1)[1]
            if tail == ".parquet":
                singles.setdefault(v, []).append(f"{log_dir}/{n}")
            else:
                bits = tail.strip(".").split(".")
                if len(bits) == 3 and bits[0].isdigit() and bits[1].isdigit():
                    multis.setdefault(v, {})[int(bits[0])] = (
                        int(bits[1]), f"{log_dir}/{n}"
                    )
        # newest COMPLETE checkpoint wins — an incomplete (crashed)
        # newer multi-part must not mask an older complete one
        for v in sorted(singles, reverse=True):
            best = (v, singles[v])
            break
        for v in sorted(multis, reverse=True):
            if best is not None and v <= best[0]:
                break
            parts = multis[v]
            n_total = next(iter(parts.values()))[0]
            if len(parts) == n_total:
                best = (v, [parts[i][1] for i in sorted(parts)])
                break
    return best


def _replay(spark: SparkSession, path: str, version: "int | None") -> dict:
    """Replay the log into the table STATE at ``version`` (or latest):
    ``{"version", "schema", "partition_columns", "files": {path:
    add-action-dict}, "protocol", "history": [...]}``."""
    fs = _fs(spark)
    log_dir = f"{path}/{LOG_SUBDIR}"
    if not fs.exists(log_dir):
        raise NameError(f"not a Delta table (no {LOG_SUBDIR}): {path}")
    names = fs.list_files(log_dir)
    commit_vs = sorted(
        v for v in (_commit_version(n) for n in names) if v is not None
    )
    if not commit_vs and not any(".checkpoint" in n for n in names):
        raise NameError(f"empty Delta log at {path}")
    if version is not None:
        head_ckpt = _checkpoint_files(fs, log_dir, None)
        latest = max(
            commit_vs[-1] if commit_vs else -1,
            head_ckpt[0] if head_ckpt is not None else -1,
        )
        if version > latest:
            raise NameError(
                f"version {version} not in Delta log (max {latest})"
            )

    live: "dict[str, dict]" = {}
    meta: "dict | None" = None
    protocol: "dict | None" = None
    history: "list[dict]" = []
    start_after = -1

    ckpt = _checkpoint_files(fs, log_dir, version)
    if (
        version is not None
        and ckpt is None
        and (not commit_vs or min(commit_vs) > version)
    ):
        # commits at or below the pinned version were cleaned up and
        # no checkpoint covers it: the snapshot is unreconstructable
        raise NameError(
            f"Delta version {version} is outside the retained log "
            f"(history truncated below "
            f"{min(commit_vs) if commit_vs else 'the checkpoint'})"
        )
    if ckpt is not None:
        ckpt_v, parts = ckpt
        rows = spark.read.parquet(*parts)
        cols = set(rows.columns)
        for r in rows.collect():
            d = r.asDict(recursive=True)
            if "add" in cols and d.get("add"):
                live[d["add"]["path"]] = d["add"]
            elif "remove" in cols and d.get("remove"):
                live.pop(d["remove"]["path"], None)
            elif "metaData" in cols and d.get("metaData") and d[
                "metaData"
            ].get("schemaString"):
                meta = d["metaData"]
            elif "protocol" in cols and d.get("protocol") and d[
                "protocol"
            ].get("minReaderVersion") is not None:
                protocol = d["protocol"]
        start_after = ckpt_v

    for v in commit_vs:
        if v <= start_after:
            continue
        if version is not None and v > version:
            break
        ops = []
        for line in fs.read_text(
            f"{log_dir}/{v:020d}.json"
        ).splitlines():
            line = line.strip()
            if not line:
                continue
            act = json.loads(line)
            if "add" in act:
                live[act["add"]["path"]] = act["add"]
            elif "remove" in act:
                live.pop(act["remove"]["path"], None)
            elif "metaData" in act:
                meta = act["metaData"]
            elif "protocol" in act:
                protocol = act["protocol"]
            elif "commitInfo" in act:
                ops.append(act["commitInfo"].get("operation"))
        history.append({"version": v, "operation": ops[0] if ops else None})

    if meta is None:
        raise DeltaProtocolError(
            f"no metaData action found in Delta log at {path}"
        )
    _check_protocol(protocol, meta)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    return {
        "version": (
            version if version is not None
            else (commit_vs[-1] if commit_vs else start_after)
        ),
        "schema": schema,
        "partition_columns": list(meta.get("partitionColumns") or []),
        "files": live,
        "protocol": protocol or {},
        "metadata_raw": meta,
        "history": history,
    }


def _check_protocol(protocol: "dict | None", meta: dict) -> None:
    if protocol is None:
        return
    feats = set(protocol.get("readerFeatures") or [])
    for f_, why in _BLOCKED_READER_FEATURES.items():
        if f_ in feats:
            raise DeltaProtocolError(
                f"Delta reader feature {f_!r} not supported: {why}"
            )
    unknown = feats - set(_BLOCKED_READER_FEATURES) - _KNOWN_OK_FEATURES
    if unknown:
        raise DeltaProtocolError(
            f"unknown Delta reader features {sorted(unknown)!r} — "
            "refusing to misread"
        )
    mrv = int(protocol.get("minReaderVersion") or 1)
    if mrv > 3:
        raise DeltaProtocolError(
            f"minReaderVersion {mrv} above the supported protocol"
        )
    conf = meta.get("configuration") or {}
    if str(conf.get("delta.columnMapping.mode", "none")) not in (
        "none", "None",
    ):
        raise DeltaProtocolError(
            "column mapping mode "
            f"{conf['delta.columnMapping.mode']!r} not supported"
        )


def _partition_literal(value: "str | None", dtype) -> Any:
    """A typed Column for one partition value, per the protocol's
    partition-value serialization (strings; null encoded as JSON
    null / missing key; __HIVE_DEFAULT_PARTITION__ also null)."""
    if value is None or value == "__HIVE_DEFAULT_PARTITION__":
        return F.lit(None).cast(dtype)
    return F.lit(value).cast(dtype)


def delta_scan(
    spark: SparkSession,
    path: str,
    *,
    version: "int | None" = None,
    partition_filter: "Callable[[dict], bool] | None" = None,
) -> DataFrame:
    """Read a Delta table at ``path`` into a DataFrame — log replay,
    no delta-spark, no directory listing. ``version=`` time-travels;
    ``partition_filter`` receives each live file's partitionValues
    dict (string-typed, as the log stores them) and prunes files at
    PLANNING time — the pruned files never reach any Spark scan.

    An empty live set returns an empty frame with the table schema.
    Raises :class:`DeltaProtocolError` on tables needing reader
    features outside the supported subset (deletion vectors, column
    mapping, v2 checkpoints), and NameError for missing tables /
    versions outside the retained log."""
    state = _replay(spark, path, version)
    schema: StructType = state["schema"]
    pcols: "list[str]" = state["partition_columns"]
    data_schema = StructType(
        [f_ for f_ in schema.fields if f_.name not in pcols]
    )
    files = list(state["files"].values())
    for add in files:
        if add.get("deletionVector"):
            raise DeltaProtocolError(
                "file with a deletion vector attached "
                f"({add['path']!r}) — refusing to serve unfiltered rows"
            )
    if partition_filter is not None:
        files = [
            add for add in files
            if partition_filter(dict(add.get("partitionValues") or {}))
        ]
    if not files:
        return spark.createDataFrame([], schema)

    ptype = {f_.name: f_.dataType for f_ in schema.fields}

    def _full(p: str) -> str:
        # add.path is table-root-relative and URL-encoded per protocol
        from urllib.parse import unquote

        return p if "://" in p else f"{path}/{unquote(p)}"

    # group by partition tuple: one scan per live tuple, partition
    # columns attached as typed literals (Delta data files do not
    # store them), then one union — column order restored to the
    # logical schema
    groups: "dict[tuple, list[str]]" = {}
    for add in files:
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in pcols)
        groups.setdefault(key, []).append(_full(add["path"]))
    out: "DataFrame | None" = None
    for key, paths in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(data_schema).parquet(*paths)
        for c, val in zip(pcols, key):
            df = df.withColumn(c, _partition_literal(val, ptype[c]))
        df = df.select(*[f_.name for f_ in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out


def delta_table_version(spark: SparkSession, path: str) -> int:
    """Newest version of the Delta table at ``path`` — from the JSON
    tail when one exists, else the checkpoint (a fully-cleaned log is
    still a readable table)."""
    fs = _fs(spark)
    vs = [
        v
        for v in (
            _commit_version(n)
            for n in fs.list_files(f"{path}/{LOG_SUBDIR}")
        )
        if v is not None
    ]
    if vs:
        return max(vs)
    return int(_replay(spark, path, None)["version"])


def delta_history(spark: SparkSession, path: str) -> "list[dict]":
    """Commit history from the retained JSON tail (newest last):
    [{"version", "operation"}]."""
    return _replay(spark, path, None)["history"]
