"""Streaming surface tests: file-source micro-batches with availableNow.

The events parquet is re-sharded into several files so
maxFilesPerTrigger produces genuinely incremental micro-batches.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.streaming import (
    interval_join,
    sessionize,
    stream_dedup,
    stream_upsert,
    windowed_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """events re-sharded into 4 files + its schema (ts as timestamp)."""
    from pandabase_spark.workload import load

    d = tmp_path_factory.mktemp("events_shards")
    ev = load(spark, SF_DIR, "events")
    ev.repartition(4).write.mode("overwrite").parquet(str(d / "data"))
    return str(d / "data"), ev.schema


def test_stream_upsert_matches_batch(spark, catalog, events_stream_dir, tmp_path):
    src_dir, schema = events_stream_dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_upsert(
        catalog, stream, "ev_live",
        keys=["event_id"], checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    batch = spark.read.parquet(src_dir)
    got = catalog.read_table("ev_live")
    assert got.count() == batch.count()
    a = got.agg(F.sum("value")).collect()[0][0]
    b = batch.agg(F.sum("value")).collect()[0][0]
    assert abs(a - b) < 1e-6
    # micro-batches committed incrementally: manifest version advanced
    # once per non-empty batch (4 shards -> create + 3 upserts)
    assert catalog._manifest("ev_live")["v"] >= 2


def test_stream_upsert_overwrites_matched_keys(spark, catalog, tmp_path):
    """Second run with patched values updates rows, not duplicates."""
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"),
        F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
    )
    d = tmp_path / "src1"
    base.write.parquet(str(d))
    schema = base.schema
    q = stream_upsert(
        catalog,
        spark.readStream.schema(schema).parquet(str(d)),
        "patch_t", keys=["k"], checkpoint=str(tmp_path / "c1"),
    )
    q.awaitTermination(120)
    patched = spark.range(50).select(
        F.col("id").alias("k"), F.lit(7.0).alias("v"),
        F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
    )
    d2 = tmp_path / "src2"
    patched.write.parquet(str(d2))
    q2 = stream_upsert(
        catalog,
        spark.readStream.schema(schema).parquet(str(d2)),
        "patch_t", keys=["k"], checkpoint=str(tmp_path / "c2"),
    )
    q2.awaitTermination(120)
    out = catalog.read_table("patch_t")
    assert out.count() == 100
    assert out.where(F.col("v") == 7.0).count() == 50


def test_windowed_counts_with_watermark(spark, events_stream_dir, tmp_path):
    src_dir, schema = events_stream_dir
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = windowed_counts(stream, window="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("win_counts")
    batch = spark.read.parquet(src_dir)
    expect = (
        batch.groupBy(
            F.window("ts", "6 hours").alias("w"), "event_type"
        ).count()
    )
    assert got.agg(F.sum("n_events")).collect()[0][0] == batch.count()
    assert got.count() == expect.count()


def test_stream_dedup(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:05",
                 "2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 10:00"]
            ),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    d = tmp_path / "dupsrc"
    spark.createDataFrame(pdf).write.parquet(str(d))
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    dd = stream_dedup(stream, ["k"], watermark="1 hour")
    q = (
        dd.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckd"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.table("dedup_out")
    assert out.count() == 3
    assert sorted(r["k"] for r in out.select("k").collect()) == [1, 2, 3]


def test_interval_join_planted(spark, tmp_path):
    from pandabase_spark.streaming import interval_join

    # user 1: click 09:55 then purchase 10:00 (in window); click 08:00
    # is outside the 10-min bound; user 2's click belongs to user 2 only
    left = pd.DataFrame(
        {
            "user_id": [1, 2],
            "event_id": [100, 200],
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:00"]),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "event_id": [10, 11, 20],
            "ts": pd.to_datetime(
                ["2024-01-01 09:55", "2024-01-01 08:00", "2024-01-01 09:59"]
            ),
        }
    )
    ld, rd = tmp_path / "ijl", tmp_path / "ijr"
    spark.createDataFrame(left).write.parquet(str(ld))
    spark.createDataFrame(right).write.parquet(str(rd))
    schema = spark.read.parquet(str(ld)).schema
    ls = spark.readStream.schema(schema).parquet(str(ld))
    rs = spark.readStream.schema(schema).parquet(str(rd))
    joined = interval_join(
        ls, rs, on="user_id", bounds_seconds=(-600, 0), watermark="1 hour"
    ).select(
        F.col("l.event_id").alias("lid"), F.col("r.event_id").alias("rid")
    )
    q = (
        joined.writeStream.format("memory").queryName("ij_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckij"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["lid"], r["rid"]) for r in spark.table("ij_out").collect()}
    assert got == {(100, 10), (200, 20)}
    # batch DataFrames run through the same operator (watermark no-op)
    bl = spark.createDataFrame(left)
    br = spark.createDataFrame(right)
    batch = interval_join(
        bl, br, on="user_id", bounds_seconds=(-600, 0)
    ).select(
        F.col("l.event_id").alias("lid"), F.col("r.event_id").alias("rid")
    )
    assert {(r["lid"], r["rid"]) for r in batch.collect()} == got
    with pytest.raises(ValueError, match="bounds"):
        interval_join(bl, br, on="user_id", bounds_seconds=(5, -5))


def test_outer_interval_join_emits_null_rows(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: an unmatched left row
    must emit a NULL-padded row once the watermark (driven by a later
    sentinel event) passes its join window; matched rows behave as in
    the inner form."""
    from pandabase_spark.streaming import interval_join

    left = pd.DataFrame(
        {
            "user_id": [1, 3, 9],
            "event_id": [100, 300, 999],
            "ts": pd.to_datetime(
                # user 3's purchase has NO click; the user-9 sentinel
                # 10 hours later drags the watermark past both windows
                ["2024-01-01 10:00", "2024-01-01 10:00", "2024-01-01 20:00"]
            ),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [1, 9],
            "event_id": [10, 90],
            "ts": pd.to_datetime(["2024-01-01 09:55", "2024-01-01 20:00"]),
        }
    )
    ld, rd = tmp_path / "oijl", tmp_path / "oijr"
    spark.createDataFrame(left).write.parquet(str(ld))
    spark.createDataFrame(right).write.parquet(str(rd))
    schema = spark.read.parquet(str(ld)).schema
    ls = spark.readStream.schema(schema).parquet(str(ld))
    rs = spark.readStream.schema(schema).parquet(str(rd))
    joined = interval_join(
        ls, rs, on="user_id", bounds_seconds=(-600, 0),
        watermark="1 hour", how="left_outer",
    ).select(
        F.col("l.event_id").alias("lid"), F.col("r.event_id").alias("rid")
    )
    q = (
        joined.writeStream.format("memory").queryName("oij_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckoij"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["lid"], r["rid"]) for r in spark.table("oij_out").collect()}
    # user 1 matched; user 3 null-padded at eviction; sentinel matched
    assert (100, 10) in got
    assert (300, None) in got
    assert all(rid is not None for lid, rid in got if lid == 100)


def test_sessionize_stateful(spark, tmp_path):
    rows = []
    for u, times in {
        7: ["10:00", "10:10", "10:20", "12:00", "12:05"],   # 2 sessions
        8: ["09:00", "11:00", "13:00"],                      # 3 sessions
    }.items():
        rows += [(u, pd.Timestamp(f"2024-01-01 {t}")) for t in times]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    d = tmp_path / "sess_src"
    spark.createDataFrame(pdf).write.parquet(str(d))
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    sess = sessionize(stream, gap_minutes=30)
    q = (
        sess.writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cks"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.table("sessions").toPandas()
    # sessions whose close was proven by a later event are emitted; the
    # final open session per user may stay in state at end-of-stream
    by_user = out.groupby("user_id").size().to_dict()
    assert by_user.get(7, 0) >= 1 and by_user.get(8, 0) >= 2
    s7 = out[out.user_id == 7].sort_values("session_start").iloc[0]
    assert s7["n_events"] == 3


def _write_running_agg_src(spark, tmp_path, n_users=5, n_events=40):
    rows = [
        (i % n_users, (i * 37) % 1000 - 500, i)  # value_c spans negatives
        for i in range(n_events)
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "value_c", "event_id"])
    d = tmp_path / "runagg_src"
    spark.createDataFrame(pdf).selectExpr(
        "CAST(user_id AS LONG) user_id",
        "CAST(value_c AS LONG) value_c",
        "CAST(event_id AS LONG) event_id",
    ).write.parquet(str(d))
    return d


def _drain_running_agg(spark, src, out, ckpt, impl):
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        impl(stream)
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(str(out))
        )
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    assert q.awaitTermination(120)
    return (
        spark.read.parquet(str(out))
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_c", "n_events").alias("value_c"),
            F.max_by("max_evid", "n_events").alias("max_evid"),
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )


def test_running_agg_end_state_equals_batch(spark, tmp_path):
    """The stateful running aggregate's final emission per key must
    equal the batch GROUP BY — the exact-oracle contract the gate
    query relies on."""
    from pandabase_spark.streaming import running_agg

    src = _write_running_agg_src(spark, tmp_path)
    got = _drain_running_agg(
        spark, src, tmp_path / "out", tmp_path / "ck", running_agg
    )
    want = (
        spark.read.parquet(str(src))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_c").alias("value_c"),
            F.max("event_id").alias("max_evid"),
        )
        .toPandas()
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state client requires protobuf, "
    "absent in this sandbox (documented seam; Arrow-only twin covers "
    "the semantics)",
)
def test_running_agg_tws_parity(spark, tmp_path):
    """transformWithStateInPandas twin produces the identical end
    state as the applyInPandasWithState form."""
    from pandabase_spark.streaming import running_agg, running_agg_tws

    src = _write_running_agg_src(spark, tmp_path)
    a = _drain_running_agg(
        spark, src, tmp_path / "out_a", tmp_path / "ck_a", running_agg
    )
    b = _drain_running_agg(
        spark, src, tmp_path / "out_b", tmp_path / "ck_b", running_agg_tws
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_full_outer_interval_join(spark, tmp_path):
    """FULL OUTER stream-stream interval join: unmatched rows on BOTH
    sides emit null-padded at watermark eviction."""
    from pandabase_spark.streaming import interval_join

    left = pd.DataFrame(
        {
            "user_id": [1, 3, 9],
            "event_id": [100, 300, 999],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:00", "2024-01-01 20:00"]
            ),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [1, 7, 9],
            "event_id": [10, 70, 90],
            "ts": pd.to_datetime(
                ["2024-01-01 09:55", "2024-01-01 09:58", "2024-01-01 20:00"]
            ),
        }
    )
    ld, rd = tmp_path / "fojl", tmp_path / "fojr"
    spark.createDataFrame(left).write.parquet(str(ld))
    spark.createDataFrame(right).write.parquet(str(rd))
    schema = spark.read.parquet(str(ld)).schema
    ls = spark.readStream.schema(schema).parquet(str(ld))
    rs = spark.readStream.schema(schema).parquet(str(rd))
    joined = interval_join(
        ls, rs, on="user_id", bounds_seconds=(-600, 0),
        watermark="1 hour", how="full_outer",
    ).select(
        F.col("l.event_id").alias("lid"), F.col("r.event_id").alias("rid")
    )
    q = (
        joined.writeStream.format("memory").queryName("foj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckfoj"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["lid"], r["rid"]) for r in spark.table("foj_out").collect()}
    assert (100, 10) in got      # matched
    assert (300, None) in got    # left-unmatched evicted as null row
    assert (None, 70) in got     # right-unmatched evicted as null row


def test_stream_merge_cdc_apply(spark, catalog, tmp_path):
    """foreachBatch MERGE: a change feed with update/delete markers
    folds into the keyed table — deletes remove, updates apply, new
    keys insert, one commit per micro-batch."""
    from pandabase_spark.streaming import stream_merge

    base = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    catalog.to_table(base, "cdc_t", keys=["k"])
    feed = spark.createDataFrame(
        # k=1 update, k=2 delete, k=99 insert
        [(1, 100.0, "u"), (2, 0.0, "d"), (99, 9.0, "u")],
        ["k", "v", "op"],
    )
    d = tmp_path / "cdc_src"
    feed.write.parquet(str(d))
    stream = spark.readStream.schema(feed.schema).parquet(str(d))
    q = stream_merge(
        catalog, stream, "cdc_t",
        checkpoint=str(tmp_path / "cdc_ck"),
        when_matched_update={"v": "s.v"},
        when_matched_delete="s.op = 'd'",
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in catalog.read_table("cdc_t").collect()}
    assert got[1] == 100.0 and 2 not in got and got[99] == 9.0
    assert len(got) == 10  # 10 - 1 deleted + 1 inserted
