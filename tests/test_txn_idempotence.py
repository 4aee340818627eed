"""Transactional write idempotence (Delta txnAppId/txnVersion shape).

``to_table(txn=)`` / ``merge_table(txn=)`` record an (app_id, version)
watermark in the manifest; a replayed write at or below the watermark
is skipped. This is what upgrades Structured Streaming's at-least-once
micro-batch delivery to exactly-once TABLE state even for
non-idempotent batches: a replayed strict append neither duplicates
rows nor trips the PK check, and a replayed increment-merge does not
double-apply. The reference has no transaction surface at all
(SQLAlchemy autocommit per statement); this is engine extension
surface modeled on the Delta protocol's SetTransaction action.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pandabase_spark.streaming import stream_merge


def _mk(spark, lo, hi, v=1.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).alias("v")
    )


def test_append_replay_is_skipped(spark, catalog):
    catalog.to_table(_mk(spark, 0, 10), "tx_a", keys=["k"])
    catalog.to_table(
        _mk(spark, 10, 20), "tx_a", keys=["k"], how="append",
        txn=("loader", 1),
    )
    v_after = catalog._manifest("tx_a")["v"]
    # replay: same txn — must neither duplicate nor raise IntegrityError
    catalog.to_table(
        _mk(spark, 10, 20), "tx_a", keys=["k"], how="append",
        txn=("loader", 1),
    )
    assert catalog.read_table("tx_a").count() == 20
    assert catalog._manifest("tx_a")["v"] == v_after
    assert catalog.last_txn_version("tx_a", "loader") == 1


def test_higher_version_applies_lower_skips(spark, catalog):
    catalog.to_table(_mk(spark, 0, 5), "tx_b", keys=["k"])
    catalog.to_table(
        _mk(spark, 5, 10), "tx_b", keys=["k"], how="append", txn=("l", 3)
    )
    # lower and equal versions skip
    catalog.to_table(
        _mk(spark, 50, 60), "tx_b", keys=["k"], how="append", txn=("l", 2)
    )
    catalog.to_table(
        _mk(spark, 60, 70), "tx_b", keys=["k"], how="append", txn=("l", 3)
    )
    assert catalog.read_table("tx_b").count() == 10
    # higher version applies; a DIFFERENT app id is independent
    catalog.to_table(
        _mk(spark, 10, 15), "tx_b", keys=["k"], how="append", txn=("l", 4)
    )
    catalog.to_table(
        _mk(spark, 15, 18), "tx_b", keys=["k"], how="append",
        txn=("other", 1),
    )
    assert catalog.read_table("tx_b").count() == 18
    assert catalog.last_txn_version("tx_b", "l") == 4
    assert catalog.last_txn_version("tx_b", "other") == 1
    assert catalog.last_txn_version("tx_b", "never") is None


def test_watermark_survives_compaction_and_dml(spark, catalog):
    catalog.to_table(_mk(spark, 0, 30), "tx_c", keys=["k"])
    catalog.to_table(
        _mk(spark, 30, 40), "tx_c", keys=["k"], how="append", txn=("l", 7)
    )
    catalog.delete_rows("tx_c", "k < 5")
    catalog.compact("tx_c")
    # maintenance commits must CARRY the watermark forward
    catalog.to_table(
        _mk(spark, 30, 40), "tx_c", keys=["k"], how="append", txn=("l", 7)
    )
    assert catalog.read_table("tx_c").count() == 35
    assert catalog.last_txn_version("tx_c", "l") == 7


def test_create_records_txn_for_later_replay(spark, catalog):
    catalog.to_table(_mk(spark, 0, 8), "tx_d", keys=["k"], txn=("l", 0))
    assert catalog.last_txn_version("tx_d", "l") == 0
    # the replayed first batch reroutes to upsert (table now exists)
    # and must skip on the watermark, not double-apply
    catalog.to_table(
        _mk(spark, 0, 8, v=99.0), "tx_d", keys=["k"], how="upsert",
        txn=("l", 0),
    )
    assert catalog.read_table("tx_d").agg(F.max("v")).first()[0] == 1.0


def test_merge_increment_replay_not_double_applied(spark, catalog):
    catalog.to_table(_mk(spark, 0, 10, v=1.0), "tx_e", keys=["k"])
    inc = _mk(spark, 0, 10, v=5.0)
    # t.v + s.v is NOT key-idempotent — the exact case txn= exists for
    res = catalog.merge_table(
        inc, "tx_e", when_matched_update={"v": "t.v + s.v"},
        txn=("cdc", 1),
    )
    assert res["updated"] == 10
    res2 = catalog.merge_table(
        inc, "tx_e", when_matched_update={"v": "t.v + s.v"},
        txn=("cdc", 1),
    )
    assert res2 == {"updated": 0, "deleted": 0, "inserted": 0}
    vals = {r.v for r in catalog.read_table("tx_e").collect()}
    assert vals == {6.0}


def test_delete_and_update_replay_skipped(spark, catalog):
    catalog.to_table(_mk(spark, 0, 40, v=1.0), "tx_f", keys=["k"])
    n = catalog.delete_rows("tx_f", "k >= 30", txn=("cdc", 1))
    assert n == 10
    assert catalog.delete_rows("tx_f", "k >= 20", txn=("cdc", 1)) == 0
    assert catalog.read_table("tx_f").count() == 30
    # relative assignment: replay would double-apply without the guard
    n = catalog.update_rows(
        "tx_f", "k < 10", {"v": "v + 1"}, txn=("cdc", 2)
    )
    assert n == 10
    assert catalog.update_rows(
        "tx_f", "k < 10", {"v": "v + 1"}, txn=("cdc", 2)
    ) == 0
    got = dict(
        (r.k, r.v) for r in catalog.read_table("tx_f").collect()
    )
    assert all(got[k] == 2.0 for k in range(10))
    assert all(got[k] == 1.0 for k in range(10, 30))
    # DV strategies honor the watermark too
    n = catalog.delete_rows(
        "tx_f", "k = 5", strategy="dv", txn=("cdc", 3)
    )
    assert n == 1
    assert catalog.delete_rows(
        "tx_f", "k = 6", strategy="dv", txn=("cdc", 3)
    ) == 0
    assert catalog.read_table("tx_f").count() == 29
    assert catalog.last_txn_version("tx_f", "cdc") == 3


def test_stream_merge_replay_with_fresh_checkpoint_is_noop(
    spark, catalog, tmp_path
):
    """Lost-checkpoint replay, end to end: the same source replays from
    batch 0 under a FRESH checkpoint but the SAME txn app id — the
    increment merge must not double-apply."""
    catalog.to_table(_mk(spark, 0, 20, v=1.0), "tx_s", keys=["k"])
    src = tmp_path / "src"
    _mk(spark, 0, 20, v=2.0).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    def run(ckpt):
        q = stream_merge(
            catalog,
            spark.readStream.schema(schema).parquet(str(src)),
            "tx_s",
            checkpoint=str(tmp_path / ckpt),
            when_matched_update={"v": "t.v + s.v"},
            txn_app_id="replayable",
        )
        q.awaitTermination(120)

    run("ckpt1")
    assert {r.v for r in catalog.read_table("tx_s").collect()} == {3.0}
    run("ckpt2")  # fresh checkpoint, batch ids restart at 0 -> skipped
    assert {r.v for r in catalog.read_table("tx_s").collect()} == {3.0}
