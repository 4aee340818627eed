"""Structured Streaming surface: incremental keyed-table maintenance.

The reference's "time series" support is batch tables with datetime keys
(reference:README.md:24-25); it has no streaming at all (SURVEY.md §2
Table B). This module is the extension surface that keeps a keyed table
continuously up to date:

- :func:`stream_upsert` — readStream → ``foreachBatch`` → the SAME
  batch upsert plan as :meth:`KeyedCatalog.to_table` (one manifest
  commit per micro-batch, so every micro-batch is atomic and the table
  is always readable at a consistent snapshot);
- :func:`windowed_counts` — watermarked tumbling-window aggregation
  (late data beyond the watermark is dropped, the standard contract);
- :func:`stream_dedup` — ``dropDuplicatesWithinWatermark`` keyed
  dedup, the streaming twin of the batch exact-dedup operator;
- :func:`sessionize` — custom stateful operator via
  ``applyInPandasWithState`` (gap-based sessions), the pattern for
  semantics the built-in operators cannot express.

Scale notes: foreachBatch inherits the batch upsert's pruning (a
micro-batch touching B of N buckets rewrites B buckets); watermark
state is per-window-per-key in the state store — size the window and
watermark so state stays bounded.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from pandabase_spark.io import KeyedCatalog


def stream_upsert(
    catalog: KeyedCatalog,
    stream_df: DataFrame,
    table_name: str,
    *,
    keys: Sequence[str],
    checkpoint: str,
    trigger_available_now: bool = True,
    dedup_within_batch: bool = True,
    txn_app_id: "str | None" = None,
) -> StreamingQuery:
    """Continuously upsert a stream into a keyed table.

    Each micro-batch runs the batch MERGE plan (pruned bucket read +
    anti-join + new segment + manifest commit) — exactly-once per batch
    at the table level: the manifest commit is atomic, re-processing a
    batch upserts the same keys idempotently, AND every batch commits
    with ``txn=(app_id, batch_id)`` (Delta's txnAppId/txnVersion
    contract), so a replayed micro-batch — lost checkpoint, foreachBatch
    retry after a committed-but-unacknowledged epoch — is skipped
    outright instead of re-applied. ``txn_app_id`` defaults to the
    checkpoint path (one stream = one app id); set it explicitly when
    a rebuilt stream with a FRESH checkpoint must continue the same
    idempotence domain.

    ``dedup_within_batch`` keeps the last row per key inside a
    micro-batch (source retractions/duplicates would otherwise trip the
    unique-key check).
    """
    app = txn_app_id or f"stream:{checkpoint}"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        b = batch_df
        if dedup_within_batch:
            b = b.dropDuplicates(list(keys))
        if catalog.has_table(table_name):
            catalog.to_table(
                b, table_name, keys=keys, how="upsert",
                txn=(app, batch_id),
            )
        else:
            catalog.to_table(
                b, table_name, keys=keys, txn=(app, batch_id)
            )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    stream_df: DataFrame,
    *,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per group.

    Append-mode-compatible: a window finalizes (and its state is freed)
    once the watermark passes its end — bounded state at any scale.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "value_sum",
        )
    )


def stream_dedup(
    stream_df: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first row per key wins within the
    watermark horizon (state for a key is dropped once the watermark
    passes — bounded memory, the batch operator's streaming twin)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    bounds_seconds: tuple[int, int] = (-600, 0),
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval (event-time range) join.

    Matches a left row with right rows of the same ``on`` key whose
    timestamp lies in ``[left.ts + lo, left.ts + hi]`` seconds
    (``bounds_seconds = (lo, hi)``, e.g. ``(-600, 0)`` = right events
    in the 10 minutes BEFORE the left event — the attribution shape).

    Both sides get the watermark and the join condition bounds both
    event times, which is exactly what Spark needs to EVICT state: a
    buffered right row can be dropped once the watermark passes
    ``ts + hi`` bound relative to any future left row. Without the
    time bound the state store grows forever; with it, state is
    bounded by (rate × window × watermark) regardless of stream
    length — the 100 TB/day-safe configuration.

    Columns come out under ``l``/``r`` aliases — select with
    ``F.col("l.x")`` / ``F.col("r.y")``. Works identically on batch
    DataFrames (the watermark is a no-op there), which is how the SQL
    oracle states the same semantics.
    """
    lo, hi = bounds_seconds
    if lo > hi:
        raise ValueError(f"bounds_seconds lower > upper: {bounds_seconds}")
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    lts, rts = F.col(f"l.{ts_col}"), F.col(f"r.{ts_col}")
    # CalendarInterval LITERALS, not make_interval() calls: Spark's
    # streaming-join state analyzer (StreamingJoinHelper) only derives
    # state-eviction watermarks from literal interval arithmetic, and
    # OUTER stream-stream joins are rejected outright when it cannot —
    # "not supported without ... an appropriate range condition".
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rts >= lts + F.expr(f"INTERVAL '{int(lo)}' SECOND"))
        & (rts <= lts + F.expr(f"INTERVAL '{int(hi)}' SECOND"))
    )
    return l.join(r, cond, how)


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int"
)
_STATE_SCHEMA = "start long, end long, n int"


def sessionize(
    stream_df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator.

    ``applyInPandasWithState``: state per user is (start, end, count) in
    epoch-micros; an event further than ``gap_minutes`` from the
    session end closes the session (emitted) and opens a new one; state
    times out via the event-time watermark, flushing the final session.
    This is the escape hatch for semantics Spark's built-in streaming
    operators cannot express — Arrow-batched, not row-at-a-time.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            if state.exists:
                start, end, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user],
                        "session_start": [pd.Timestamp(start, unit="us")],
                        "session_end": [pd.Timestamp(end, unit="us")],
                        "n_events": [n],
                    }
                )
            return
        times: list[int] = []
        for pdf in pdf_iter:
            ts = pd.to_datetime(pdf[ts_col])
            times.extend(int(v) for v in ts.astype("int64") // 1000)
        times.sort()
        out_rows = []
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = times[0], times[0], 0
        for t in times:
            if t - end > gap_us:
                out_rows.append((user, start, end, n))
                start, end, n = t, t, 1
            else:
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        state.setTimeoutTimestamp(end // 1000 + gap_minutes * 60 * 1000)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out_rows],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in out_rows],
                    "n_events": [r[3] for r in out_rows],
                }
            )

    return (
        stream_df.withWatermark(ts_col, f"{gap_minutes} minutes")
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _running_agg_out(stream_df: DataFrame, key_col: str) -> str:
    """Output schema for the running-agg processors, derived from the
    actual key column so ``key_col`` values other than ``user_id``
    emit a correctly-named, correctly-typed key instead of a
    mis-labeled hard-coded one."""
    types = {f.name: f.dataType.simpleString() for f in stream_df.schema}
    for req in (key_col, "value_c", "event_id"):
        if req not in types:
            raise NameError(
                f"running_agg input lacks required column {req!r} "
                f"(has: {sorted(types)})"
            )
    return (
        f"{key_col} {types[key_col]}, n_events BIGINT, "
        "value_c BIGINT, max_evid BIGINT"
    )


def running_agg(
    stream_df: DataFrame,
    *,
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key running aggregate as a custom stateful operator with an
    EXACT batch-equivalent end state.

    Input must carry ``(key_col, value_c, event_id)`` with integer
    ``value_c`` (pre-rounded JVM-side so no float ever accumulates in
    Python). State per key is one fixed-width (n, value_sum, max_id)
    tuple; each micro-batch updates it and emits the cumulative row,
    so the LAST emission per key (max n_events — strictly monotone)
    equals the batch GROUP BY exactly: integer sums are
    arrival-order-free, which is what makes a custom stateful
    streaming operator hash-checkable against a declarative SQL
    aggregate. At 100 TB the state store holds one fixed-width row
    per key, RocksDB-backed, partitioned by the same hash shuffle as
    a batch groupBy.

    Runs on ``applyInPandasWithState`` (Arrow-only runtime). The
    modern Spark 4 form of the same processor is
    :func:`running_agg_tws` — this sandbox lacks protobuf, which the
    transformWithState Python state client requires, so that twin is
    import-gated and skip-tested (same seam policy as the multimodal
    codecs).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:  # NoTimeout: never fires
            return
        n, vc, me = state.get if state.exists else (0, 0, -1)
        for pdf in pdf_iter:
            n += len(pdf)
            vc += int(pdf["value_c"].sum())
            me = max(me, int(pdf["event_id"].max()))
        state.update((n, vc, me))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "value_c": [vc],
                "max_evid": [me],
            }
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=_running_agg_out(stream_df, key_col),
        stateStructType="n BIGINT, vc BIGINT, me BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_agg_tws(
    stream_df: DataFrame,
    *,
    key_col: str = "user_id",
) -> DataFrame:
    """:func:`running_agg` on ``transformWithStateInPandas`` — Spark
    4's arbitrary-stateful-processing API (typed state handles, TTL,
    timers; successor to applyInPandasWithState). Identical state,
    emissions, and output schema; parity with the Arrow-only form is
    asserted in tests/test_streaming.py (skipped where the runtime's
    protobuf dependency is unavailable, as in this sandbox)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    class Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n BIGINT, vc BIGINT, me BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, vc, me = (
                self._agg.get() if self._agg.exists() else (0, 0, -1)
            )
            for pdf in rows:
                n += len(pdf)
                vc += int(pdf["value_c"].sum())
                me = max(me, int(pdf["event_id"].max()))
            self._agg.update((n, vc, me))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "value_c": [vc],
                    "max_evid": [me],
                }
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=Proc(),
        outputStructType=_running_agg_out(stream_df, key_col),
        outputMode="Update",
        timeMode="None",
    )


def stream_merge(
    catalog: KeyedCatalog,
    stream_df: DataFrame,
    table_name: str,
    *,
    checkpoint: str,
    when_matched_update="all",
    when_matched_delete=None,
    when_not_matched_insert: bool = True,
    trigger_available_now: bool = True,
    dedup_within_batch: bool = True,
    txn_app_id: "str | None" = None,
) -> StreamingQuery:
    """Continuous MERGE: each micro-batch runs the full clause MERGE
    (:meth:`KeyedCatalog.merge_table`) against the keyed table — the
    CDC-apply pattern (upstream change feed carrying update/delete
    markers folds into the table incrementally, one atomic manifest
    commit per micro-batch). :func:`stream_upsert` is the
    whole-row-wins special case of this. The table must already exist
    (clauses need its key/schema metadata). ``dedup_within_batch``
    keeps the LAST row per key inside a micro-batch, so a key that
    changed twice in one batch applies its final state.

    Exactly-once under replay: every batch commits with
    ``txn=(app_id, batch_id)``, so a re-delivered micro-batch is
    skipped rather than re-merged — this matters MORE here than for
    plain upsert, because a replayed ``when_matched_delete`` or an
    assignment like ``t.n + s.n`` is NOT key-idempotent.
    ``txn_app_id`` defaults to the checkpoint path.
    """
    m = catalog.meta(table_name)
    app = txn_app_id or f"stream:{checkpoint}"

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        b = batch_df
        if dedup_within_batch:
            b = b.dropDuplicates(list(m.keys))
        catalog.merge_table(
            b,
            table_name,
            when_matched_update=when_matched_update,
            when_matched_delete=when_matched_delete,
            when_not_matched_insert=when_not_matched_insert,
            txn=(app, batch_id),
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_table_changes(
    catalog: KeyedCatalog,
    table_name: str,
    apply_fn,
    *,
    checkpoint: str,
    starting_version: int = 0,
    trigger_available_now: bool = True,
    with_range: bool = False,
) -> StreamingQuery:
    """Continuous CDC consumption — the Delta change-data-feed +
    foreachBatch shape. The stream itself is the table's COMMIT LOG
    (``sources.kt_stream`` ``commits=true``: one metadata row per
    commit, so a micro-batch moves a handful of tuples however large
    the table is); for each micro-batch the EXACT change set for its
    version range is computed JVM-side by the batch CDC diff
    (:meth:`KeyedCatalog.table_changes` — the same Catalyst
    full-outer plan, nothing row-sized ever crosses Python) and
    handed to ``apply_fn(changes_df, batch_id)``. Offsets are
    manifest versions persisted in the checkpoint, so a restarted
    stream resumes diffing from the last consumed version; per-key
    net changes within a range collapse (insert-then-delete never
    surfaces), which is what makes resumption safe at any batch
    boundary. Unlike the data-row stream, rewrites/DML/compaction
    are first-class here — snapshots are diffed, not tailed."""
    from pandabase_spark.sources.kt_stream import stream_read_commits

    ev = stream_read_commits(
        catalog, table_name, starting_version=starting_version
    )

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select("v").collect()  # O(commits in batch)
        if not rows:
            return
        vs = [r["v"] for r in rows]
        lo, hi = min(vs) - 1, max(vs)
        changes = catalog.table_changes(table_name, lo, hi)
        if with_range:
            # consumers that need pre-images (e.g. incremental view
            # maintenance) get the diffed version range too
            apply_fn(changes, batch_id, lo, hi)
        else:
            apply_fn(changes, batch_id)

    writer = (
        ev.writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_replicate(
    catalog: KeyedCatalog,
    source_table: str,
    replica_table: str,
    *,
    checkpoint: str,
    starting_version: int = 0,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """CDC replication: keep ``replica_table`` an exact, continuously
    maintained copy of ``source_table`` by applying its change feed —
    one MERGE per micro-batch (inserts/updates via whole-row upsert
    clauses, deletes via a source-only ``_del`` flag that never lands
    in the replica — Delta MERGE clause scoping), committed with
    ``txn=(app, batch_id)`` so a replayed batch after a lost
    checkpoint neither double-applies nor trips constraints. The
    replica is created on the first non-empty batch with the source's
    keys."""
    m = catalog.meta(source_table)
    app = f"cdc_replica:{checkpoint}"

    def _apply(changes: DataFrame, batch_id: int) -> None:
        src = changes.withColumn(
            "_del", F.col("_change_type") == "delete"
        ).drop("_change_type")
        if not catalog.has_table(replica_table):
            # bootstrap: the first feed from version 0 is all inserts
            catalog.to_table(
                src.where(~F.col("_del")).drop("_del"),
                replica_table,
                keys=list(m.keys),
                num_buckets=m.num_buckets,
                txn=(app, batch_id),
            )
            return
        catalog.merge_table(
            src,
            replica_table,
            when_matched_update="all",
            when_matched_delete="s._del",
            when_not_matched_insert=True,
            metrics=False,  # counts re-execute the diff; unused here
            txn=(app, batch_id),
        )

    return stream_table_changes(
        catalog,
        source_table,
        _apply,
        checkpoint=checkpoint,
        starting_version=starting_version,
        trigger_available_now=trigger_available_now,
    )


def stream_incremental_agg(
    catalog: KeyedCatalog,
    source_table: str,
    view_table: str,
    *,
    group_col: str,
    value_col: str,
    checkpoint: str,
    starting_version: int = 0,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuously-maintained MATERIALIZED VIEW: ``view_table`` holds
    ``GROUP BY group_col -> (agg_sum = SUM(value_col), n_rows)`` over
    ``source_table`` and is updated from the CDC feed with ONLY the
    changed keys — per micro-batch:

        delta(group) = Σ post-images − Σ pre-images

    where post-images ride on the diff itself and pre-images are the
    from-version snapshot pruned to the changed keys (a keyed semi
    read). The delta folds into the view with one expression-MERGE
    (``t.agg_sum + s.d_sum``); groups whose row count reaches zero are
    deleted. ``txn=(app, batch_id)`` makes a replayed batch a no-op —
    essential here, since the relative fold is not key-idempotent. At
    100 TB this maintains an aggregate over a mutating table by
    reprocessing deltas, never the table. NULL groups are not
    supported (the view is keyed by ``group_col``); sums of floats
    accumulate in fold order, so compare downstream with a rounding
    tolerance as usual for float aggregation."""
    app = f"ivm:{checkpoint}"
    src_keys = list(catalog.meta(source_table).keys)

    def _apply(changes: DataFrame, batch_id: int, lo: int, hi: int) -> None:
        post = changes.where(
            F.col("_change_type").isin("insert", "update")
        )
        post_d = post.groupBy(group_col).agg(
            F.sum(value_col).alias("_p"),
            F.count(F.lit(1)).alias("_pn"),
        )
        if lo == 0:
            delta = post_d.select(
                F.col(group_col),
                F.col("_p").alias("d_sum"),
                F.col("_pn").alias("d_n"),
            )
        else:
            pre = catalog.read_table(source_table, version=lo).join(
                changes.select(*src_keys), on=src_keys, how="left_semi"
            )
            pre_d = pre.groupBy(group_col).agg(
                F.sum(value_col).alias("_q"),
                F.count(F.lit(1)).alias("_qn"),
            )
            delta = (
                post_d.join(pre_d, on=group_col, how="full_outer")
                .fillna(0, ["_p", "_pn", "_q", "_qn"])
                .select(
                    F.col(group_col),
                    (F.col("_p") - F.col("_q")).alias("d_sum"),
                    (F.col("_pn") - F.col("_qn")).alias("d_n"),
                )
            )
        delta = delta.where(
            (F.col("d_sum") != 0) | (F.col("d_n") != 0)
        )
        src = delta.select(
            group_col, "d_sum", "d_n",
            F.col("d_sum").alias("agg_sum"),
            F.col("d_n").alias("n_rows"),
        )
        if not catalog.has_table(view_table):
            catalog.to_table(
                src.where(F.col("d_n") != 0).select(
                    group_col, "agg_sum", "n_rows"
                ),
                view_table, keys=[group_col], txn=(app, batch_id),
            )
            return
        catalog.merge_table(
            src, view_table,
            when_matched_delete="t.n_rows + s.d_n = 0",
            when_matched_update={
                "agg_sum": "t.agg_sum + s.d_sum",
                "n_rows": "t.n_rows + s.d_n",
            },
            when_not_matched_insert=True,
            metrics=False,  # counts re-execute the delta; unused here
            txn=(app, batch_id),
        )

    return stream_table_changes(
        catalog, source_table, _apply,
        checkpoint=checkpoint, starting_version=starting_version,
        trigger_available_now=trigger_available_now, with_range=True,
    )
