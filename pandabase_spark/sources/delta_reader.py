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
  (schema + partition columns) and ``protocol``. Within-retention
  ``remove`` tombstones are kept alongside (``state["tombstones"]``)
  so a later checkpoint can carry them, per the protocol's checkpoint
  requirements.
- data files are opened as ONE Spark scan with an EXPLICIT schema
  (Delta data files do NOT contain partition columns); partition
  values come from the log's per-file ``partitionValues`` map and
  are attached by broadcast-joining ``_metadata.file_path`` against
  the log's file -> partitionValues mapping — one scan and one
  broadcast join for ANY number of live partition tuples (an earlier
  revision unioned one scan per tuple, which blows up driver plan
  analysis at the 10^4–10^5 tuples of a real date×hour table).
- ``partition_filter=`` prunes AT PLANNING TIME against the log's
  partition values: unmatched files never reach a Spark scan (the
  log IS the index — no directory listing at all, the property that
  matters on object stores).
- ``version=`` pins time travel: replay stops at that commit.
- column mapping in NAME mode is supported: data files carry
  physical column names (``delta.columnMapping.physicalName`` field
  metadata), the scan reads physical and aliases back to logical —
  the same evolved-read shape the keyed-table format uses for its
  own renames (io.py ``assemble``). ID mode stays refused.

Driver memory: replay holds (path, partitionValues, size) per LIVE
file — the same O(live files) planning state Spark's own FileIndex
(and delta-spark's) materializes on the driver; checkpoint rows are
trimmed to those fields before collect so tombstoned history and
stats strings never cross the wire.

Deliberate subset (raise, never silently misread):

- deletion vectors (reader feature ``deletionVectors``) — a file
  with a DV attached must not be served unfiltered;
- column mapping in ID mode (physical ids live in parquet field
  ids, a different resolution path than names);
- ``minReaderVersion`` > 3 or unknown reader features.

The reference has no lake interop at all (pandas + SQLAlchemy,
reference:pandabase/pandabase.py); this is engine extension surface.
Everything here derives from the public protocol document and the
Spark/DuckDB-visible on-disk format.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

LOG_SUBDIR = "_delta_log"

_BLOCKED_READER_FEATURES = {
    "deletionVectors": "deletion vectors (rows would resurrect)",
    "v2Checkpoint": "v2 checkpoints (sidecar manifest layout)",
    "typeWidening": "type widening (file/logical types diverge)",
}
_KNOWN_OK_FEATURES = {
    # write-side features a reader may ignore per the protocol, plus
    # columnMapping which _check_protocol gates on the MODE (name ok)
    "appendOnly", "invariants", "checkConstraints", "generatedColumns",
    "changeDataFeed", "identityColumns", "rowTracking", "domainMetadata",
    "timestampNtz", "vacuumProtocolCheck", "allowColumnDefaults",
    "icebergCompatV1", "icebergCompatV2", "columnMapping",
}

# files above this count skip the broadcast hint on the
# partition-value mapping join and let AQE pick the strategy — a
# 10^7-file mapping is shuffle-join territory, not a driver broadcast
_BROADCAST_MAPPING_MAX = 2_000_000

PHYSICAL_NAME_KEY = "delta.columnMapping.physicalName"


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


def _trim_add(d: dict) -> dict:
    """An add action reduced to what planning needs — stats strings
    and tags can be arbitrarily large and never cross to the driver."""
    out = {
        "path": d["path"],
        "partitionValues": dict(d.get("partitionValues") or {}),
        "size": int(d.get("size") or 0),
        "modificationTime": int(d.get("modificationTime") or 0),
    }
    if d.get("deletionVector"):
        out["deletionVector"] = dict(d["deletionVector"])
    return out


def _collect_checkpoint(spark: SparkSession, parts: "list[str]") -> (
    "tuple[list[dict], list[dict], dict | None, dict | None]"
):
    """(adds, removes, metaData, protocol) from the checkpoint parquet,
    with add/remove rows TRIMMED executor-side before collect — the
    driver never holds stats/tags, only (path, partitionValues, size,
    modificationTime[, deletionVector])."""
    rows = spark.read.parquet(*parts)
    cols = set(rows.columns)
    adds: "list[dict]" = []
    removes: "list[dict]" = []
    if "add" in cols:
        a = rows.where(F.col("add.path").isNotNull())
        sel = [
            F.col("add.path").alias("path"),
            F.col("add.partitionValues").alias("partitionValues"),
            F.col("add.size").alias("size"),
            F.col("add.modificationTime").alias("modificationTime"),
        ]
        add_fields = {
            f_.name for f_ in rows.schema["add"].dataType.fields
        }
        has_dv = "deletionVector" in add_fields
        if has_dv:
            sel.append(F.to_json(F.col("add.deletionVector")).alias("dv"))
        for r in a.select(*sel).collect():
            d = {
                "path": r["path"],
                "partitionValues": dict(r["partitionValues"] or {}),
                "size": int(r["size"] or 0),
                "modificationTime": int(r["modificationTime"] or 0),
            }
            if has_dv and r["dv"]:
                d["deletionVector"] = json.loads(r["dv"])
            adds.append(d)
    if "remove" in cols:
        rm = rows.where(F.col("remove.path").isNotNull())
        rm_fields = {
            f_.name for f_ in rows.schema["remove"].dataType.fields
        }
        sel = [F.col("remove.path").alias("path")]
        if "deletionTimestamp" in rm_fields:
            sel.append(
                F.col("remove.deletionTimestamp").alias("deletionTimestamp")
            )
        for r in rm.select(*sel).collect():
            removes.append({
                "path": r["path"],
                "deletionTimestamp": int(
                    (r["deletionTimestamp"] if "deletionTimestamp" in r
                     else 0) or 0
                ),
                "dataChange": False,
            })
    meta = None
    if "metaData" in cols:
        got = rows.where(
            F.col("metaData.schemaString").isNotNull()
        ).select(F.to_json("metaData").alias("j")).collect()
        if got:
            meta = json.loads(got[0]["j"])
    protocol = None
    if "protocol" in cols:
        got = rows.where(
            F.col("protocol.minReaderVersion").isNotNull()
        ).select(F.to_json("protocol").alias("j")).collect()
        if got:
            protocol = json.loads(got[0]["j"])
    return adds, removes, meta, protocol


def _replay(spark: SparkSession, path: str, version: "int | None") -> dict:
    """Replay the log into the table STATE at ``version`` (or latest):
    ``{"version", "schema", "partition_columns", "files": {path:
    trimmed-add-dict}, "tombstones": {path: remove-dict}, "protocol",
    "history": [...]}``. Tombstones are removes not later re-added —
    what a conformant checkpoint must carry inside the retention
    window."""
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
    tombstones: "dict[str, dict]" = {}
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
        adds, removes, meta, protocol = _collect_checkpoint(spark, parts)
        # a checkpoint is NET state: its adds are the live set, its
        # removes are retention tombstones only (the protocol forbids
        # the same path appearing as both)
        for d in adds:
            live[d["path"]] = d
        for d in removes:
            tombstones[d["path"]] = d
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
                live[act["add"]["path"]] = _trim_add(act["add"])
                tombstones.pop(act["add"]["path"], None)
            elif "remove" in act:
                p = act["remove"]["path"]
                live.pop(p, None)
                tombstones[p] = {
                    "path": p,
                    "deletionTimestamp": int(
                        act["remove"].get("deletionTimestamp") or 0
                    ),
                    "dataChange": False,
                }
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
        "tombstones": tombstones,
        "protocol": protocol or {},
        "metadata_raw": meta,
        "history": history,
    }


def _mapping_mode(meta: dict) -> str:
    conf = meta.get("configuration") or {}
    return str(conf.get("delta.columnMapping.mode", "none") or "none")


def _check_protocol(protocol: "dict | None", meta: dict) -> None:
    mode = _mapping_mode(meta)
    if mode not in ("none", "None", "name"):
        raise DeltaProtocolError(
            f"column mapping mode {mode!r} not supported (name mode is; "
            "id mode resolves via parquet field ids)"
        )
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


def _partition_literal(value: "str | None", dtype) -> Any:
    """A typed Column for one partition value, per the protocol's
    partition-value serialization (strings; null encoded as JSON
    null / missing key; __HIVE_DEFAULT_PARTITION__ also null)."""
    if value is None or value == "__HIVE_DEFAULT_PARTITION__":
        return F.lit(None).cast(dtype)
    return F.lit(value).cast(dtype)


def _physical_name(field: StructField, mode: str) -> str:
    """The column name as DATA FILES spell it: the
    ``delta.columnMapping.physicalName`` field metadata under name
    mode, the logical name otherwise."""
    if mode == "name":
        md = field.metadata or {}
        return str(md.get(PHYSICAL_NAME_KEY, field.name))
    return field.name


def _pv_get(pv: dict, logical: str, physical: str) -> "str | None":
    """A file's partition value for one column: under column mapping
    the log keys partitionValues by PHYSICAL name; accept the logical
    spelling as a fallback for writers that predate their own mapping
    (observed in the wild, harmless to accept)."""
    if physical in pv:
        return pv[physical]
    return pv.get(logical)


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
    dict (string-typed, keyed by LOGICAL column name) and prunes
    files at PLANNING time — the pruned files never reach any Spark
    scan.

    The plan is ONE parquet scan of every live file; partition
    columns (absent from Delta data files) are attached by joining
    ``_metadata.file_path`` against a broadcast mapping built from
    the log's per-file partitionValues. Any count of live partition
    tuples costs one scan + one broadcast join, not one union leg per
    tuple. When the table is unpartitioned — or every live file
    shares one partition tuple — the join is skipped entirely and
    the values are typed literals.

    An empty live set returns an empty frame with the table schema.
    Raises :class:`DeltaProtocolError` on tables needing reader
    features outside the supported subset (deletion vectors, id-mode
    column mapping, v2 checkpoints), and NameError for missing
    tables / versions outside the retained log."""
    state = _replay(spark, path, version)
    schema: StructType = state["schema"]
    pcols: "list[str]" = state["partition_columns"]
    mode = _mapping_mode(state["metadata_raw"])
    phys = {f_.name: _physical_name(f_, mode) for f_ in schema.fields}
    ptype = {f_.name: f_.dataType for f_ in schema.fields}
    data_fields = [f_ for f_ in schema.fields if f_.name not in pcols]
    # the scan schema speaks PHYSICAL names (what the files contain);
    # the final select aliases back to logical
    data_schema = StructType([
        StructField(phys[f_.name], f_.dataType, f_.nullable)
        for f_ in data_fields
    ])
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
            if partition_filter({
                c: _pv_get(
                    dict(add.get("partitionValues") or {}), c, phys[c]
                )
                for c in pcols
            })
        ]
    if not files:
        return spark.createDataFrame([], _logical_schema(schema))

    from urllib.parse import unquote

    # add.path is table-root-relative and URL-encoded per protocol
    rels = [
        None if "://" in add["path"] else unquote(add["path"])
        for add in files
    ]
    full_paths = [
        add["path"] if rel is None else f"{path}/{rel}"
        for rel, add in zip(rels, files)
    ]
    scan = spark.read.schema(data_schema).parquet(*full_paths)
    out_data = [
        F.col(phys[f_.name]).alias(f_.name) for f_ in data_fields
    ]
    if not pcols:
        return scan.select(*out_data)

    tuples = {
        tuple(
            _pv_get(dict(add.get("partitionValues") or {}), c, phys[c])
            for c in pcols
        )
        for add in files
    }
    if len(tuples) == 1:
        vals = next(iter(tuples))
        return scan.select(*out_data, *[
            _partition_literal(v, ptype[c]).alias(c)
            for c, v in zip(pcols, vals)
        ]).select(*[f_.name for f_ in schema.fields])

    # mapping rows join on the file's table-root-relative RAW path.
    # Spark spells _metadata.file_path as the URI-encoded qualified
    # path; url_decode() recovers the raw spelling, and stripping the
    # (once-computed) qualified root leaves exactly our rel string.
    # java.net.URLDecoder also folds '+' to space, so a literal '+'
    # in a file name would miss the mapping — that MUST fail loudly
    # (raise_error below), never serve null partition values.
    root_raw = _qualified_root(spark, path)
    mrows = []
    for rel, add in zip(rels, files):
        if rel is None:
            raise DeltaProtocolError(
                "absolute add.path on a partitioned multi-tuple table "
                f"({add['path']!r}) — cannot derive a root-relative "
                "join key"
            )
        pv = dict(add.get("partitionValues") or {})
        mrows.append(tuple(
            [rel] + [_pv_get(pv, c, phys[c]) for c in pcols]
        ))
    mschema = StructType(
        [StructField("__pb_rel", StringType(), False)]
        + [StructField(f"__pb_{c}", StringType(), True) for c in pcols]
    )
    mapping = spark.createDataFrame(mrows, mschema)
    if len(mrows) <= _BROADCAST_MAPPING_MAX:
        mapping = F.broadcast(mapping)
    rel_col = F.expr(
        f"substring(url_decode(_metadata.file_path), {len(root_raw) + 2})"
    )

    def _pcol(c: str) -> Column:
        raw = F.col(f"__pb_{c}")
        typed = F.when(
            raw.isNull() | (raw == "__HIVE_DEFAULT_PARTITION__"),
            F.lit(None).cast(ptype[c]),
        ).otherwise(raw.cast(ptype[c]))
        # __pb_rel is non-null on the scan side, so a null join key
        # marker means the file missed the mapping (encoding drift)
        return F.when(
            F.col("__pb_m").isNull(),
            F.raise_error(F.lit(
                "delta_scan: scanned file missing from the log's "
                "partition-value mapping (non-URI-safe file name?)"
            )).cast(ptype[c]),
        ).otherwise(typed).alias(c)

    mapping_marked = mapping.withColumn("__pb_m", F.lit(1))
    joined = scan.withColumn("__pb_rel", rel_col).join(
        mapping_marked, on="__pb_rel", how="left"
    )
    return joined.select(*[
        _pcol(f_.name) if f_.name in pcols
        else F.col(phys[f_.name]).alias(f_.name)
        for f_ in schema.fields
    ])


def _logical_schema(schema: StructType) -> StructType:
    """The user-facing schema: logical names, field metadata (mapping
    ids/physical names) stripped."""
    return StructType([
        StructField(f_.name, f_.dataType, f_.nullable)
        for f_ in schema.fields
    ])


def _qualified_root(spark: SparkSession, path: str) -> str:
    """The table root as Spark's file index spells it BEFORE URI
    encoding: ``FileSystem.makeQualified(Path(path)).toString()`` —
    scheme + authority + raw path, computed ONCE per scan (py4j round
    trips must not scale with file count)."""
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.makeQualified(jp).toString()


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
