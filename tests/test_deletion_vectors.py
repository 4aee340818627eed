"""Deletion-vector (merge-on-read) DML guarantees.

The property under test: a point DELETE/UPDATE commits WITHOUT
rewriting any data file — the manifest gains a ``dvs`` entry scoping a
tombstone key-set to the exact (segment, bucket) leaves that held the
keys — and every read path (scans, time travel, clones, write-path
probes) sees the post-delete state; rewrites of a covered bucket fold
the deletion into data and retire the DV. The reference has no
row-level DML at all (only ``drop_db_table``,
reference:pandabase/util.py:5-20); this is the Delta deletion-vector
shape re-expressed over the segment store.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.io import DV_DIR, KeyedCatalog


def _mk(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )


def _data_files(catalog, table):
    """Every parquet data file of the table's live segments."""
    files = []
    for d in catalog.fs.list_dirs(catalog._path(table)):
        if d.startswith("seg-"):
            seg_dir = f"{catalog._path(table)}/{d}"
            for sub in catalog.fs.list_dirs(seg_dir):
                files += [
                    f"{d}/{sub}/{f}"
                    for f in catalog.fs.list_files(f"{seg_dir}/{sub}")
                    if f.endswith(".parquet")
                ]
    return sorted(files)


def test_point_delete_rewrites_zero_data_files(spark, catalog):
    catalog.to_table(_mk(spark), "dv_t", keys=["k"], num_buckets=8)
    before_files = _data_files(catalog, "dv_t")
    before_segments = catalog._manifest("dv_t")["segments"]
    assert catalog.delete_rows("dv_t", "k = 42") == 1
    man = catalog._manifest("dv_t")
    # zero data files written or dropped; segment set untouched
    assert _data_files(catalog, "dv_t") == before_files
    assert man["segments"] == before_segments
    assert man["op"] == "delete_dv"
    (dv,) = man["dvs"].values()
    assert dv["n"] == 1
    # the DV covers exactly the one bucket leaf the key hashed into
    (leaf_buckets,) = dv["leaves"].values()
    assert len(leaf_buckets) == 1
    # reads exclude the key; everything else intact
    out = catalog.read_table("dv_t")
    assert out.count() == 999
    assert out.where("k = 42").count() == 0
    # range read and point read agree
    assert catalog.read_table("dv_t", lowest=40, highest=44).count() == 4


def test_reinsert_after_dv_delete_is_visible(spark, catalog):
    """A key re-inserted AFTER its DV delete lives in a new, uncovered
    segment — the tombstone must not touch it (leaf scoping, not
    global key suppression)."""
    catalog.to_table(_mk(spark, 100), "dv_re", keys=["k"])
    catalog.delete_rows("dv_re", "k = 7")
    assert catalog.read_table("dv_re").where("k = 7").count() == 0
    patch = spark.createDataFrame(
        pd.DataFrame({"k": [7], "v": [777.0]})
    )
    # append succeeds: the PK probe reads through the DV
    catalog.to_table(patch, "dv_re", keys=["k"], how="append")
    got = catalog.read_table("dv_re").where("k = 7").collect()
    assert len(got) == 1 and got[0]["v"] == 777.0
    assert catalog.read_table("dv_re").count() == 100


def test_cross_dv_keys_scoped_to_own_leaves(spark, catalog):
    """Two DVs sharing a bucket must each apply ONLY to the leaves
    they cover: delete k=7 (DV-A, base segment), re-insert k=7 (new
    segment DV-A does not cover), delete k=27 (DV-B, which covers
    BOTH segments' leaf) — the re-inserted k=7 row must survive reads
    AND any subsequent rewrite. A pooled union-of-keysets anti-join
    over the union of covered leaves silently loses it."""
    catalog.to_table(_mk(spark, 100), "dv_x", keys=["k"], num_buckets=1)
    catalog.delete_rows("dv_x", "k = 7")                      # DV-A
    catalog.to_table(
        spark.createDataFrame(pd.DataFrame({"k": [7], "v": [777.0]})),
        "dv_x", keys=["k"], how="append",
    )
    catalog.delete_rows("dv_x", "k = 27")                     # DV-B
    man = catalog._manifest("dv_x")
    assert len(man["dvs"]) == 2
    # DV-B covers both segments' single bucket — the contamination trap
    (dv_b,) = [d for d in man["dvs"].values() if d["n"] == 1 and
               len(d["leaves"]) == 2] or [None]
    assert dv_b is not None
    out = catalog.read_table("dv_x")
    got = out.where("k = 7").collect()
    assert len(got) == 1 and got[0]["v"] == 777.0
    assert out.where("k = 27").count() == 0
    assert out.count() == 99
    # a rewrite must persist the correct state, not a contaminated read
    catalog.compact("dv_x")
    out2 = catalog.read_table("dv_x")
    assert out2.where("k = 7").collect()[0]["v"] == 777.0
    assert out2.where("k = 27").count() == 0
    assert out2.count() == 99


def test_dv_update_writes_only_updated_rows(spark, catalog):
    catalog.to_table(_mk(spark), "dv_u", keys=["k"], num_buckets=8)
    (base_seg,) = catalog._manifest("dv_u")["segments"]
    n = catalog.update_rows("dv_u", "k in (5, 10)", {"v": "v + 0.5"})
    assert n == 2
    man = catalog._manifest("dv_u")
    assert man["op"] == "update_dv"
    # old segment fully intact; new segment holds ONLY the 2 new rows
    assert sorted(man["segments"][base_seg]) == list(range(8))
    new_seg = next(s for s in man["segments"] if s != base_seg)
    new_rows = spark.read.parquet(
        f"{catalog._path('dv_u')}/{new_seg}"
    )
    assert new_rows.count() == 2
    got = {
        r["k"]: r["v"]
        for r in catalog.read_table("dv_u")
        .where("k in (4, 5, 10)")
        .collect()
    }
    assert got == {4: 8.0, 5: 10.5, 10: 20.5}
    assert catalog.read_table("dv_u").count() == 1000


def test_compact_folds_dv_and_vacuum_reclaims_sidecar(spark, catalog):
    catalog.to_table(_mk(spark, 500), "dv_c", keys=["k"])
    # fragment so compact has >1 segment to merge
    catalog.to_table(
        _mk(spark, 100).withColumn("k", F.col("k") + 10_000),
        "dv_c", keys=["k"], how="append",
    )
    catalog.delete_rows("dv_c", "k = 3")
    catalog.delete_rows("dv_c", "k = 10001")
    assert len(catalog._manifest("dv_c")["dvs"]) == 2
    dv_root = f"{catalog._path('dv_c')}/{DV_DIR}"
    assert len(catalog.fs.list_dirs(dv_root)) == 2
    catalog.compact("dv_c")
    man = catalog._manifest("dv_c")
    # deletions folded into the rewritten segment; DV entries retired
    assert "dvs" not in man
    assert catalog.read_table("dv_c").count() == 598
    # vacuum (run by compact) reclaimed the sidecars
    assert catalog.fs.list_dirs(dv_root) == []


def test_bucket_rewrite_retires_covered_leaf(spark, catalog):
    """An upsert that rewrites a DV-covered bucket folds the deletion
    for that leaf; leaves in untouched buckets stay covered."""
    catalog.to_table(_mk(spark), "dv_up", keys=["k"], num_buckets=8)
    catalog.delete_rows("dv_up", "k in (0, 1, 2, 3, 4, 5, 6, 7)")
    (dv,) = catalog._manifest("dv_up")["dvs"].values()
    covered0 = sorted(b for bs in dv["leaves"].values() for b in bs)
    # upsert k=0 -> rewrites exactly its bucket, folding the deletion
    # for that leaf and reviving the key with the batch value
    b0 = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(0).cast("bigint")), F.lit(8)).cast("int")
    ).collect()[0][0]
    assert b0 in covered0
    catalog.to_table(
        spark.range(1).select(
            F.lit(0).cast("bigint").alias("k"), F.lit(0.5).alias("v")
        ),
        "dv_up", keys=["k"], how="upsert",
    )
    man = catalog._manifest("dv_up")
    (dv2,) = man["dvs"].values()
    left = sorted(b for bs in dv2["leaves"].values() for b in bs)
    assert left == [b for b in covered0 if b != b0]
    # keys whose leaves are still covered stay deleted; k=0 revived
    assert catalog.read_table("dv_up").where(
        "k between 1 and 7"
    ).count() == 0
    assert (
        catalog.read_table("dv_up").where("k = 0").collect()[0]["v"]
        == 0.5
    )
    assert catalog.read_table("dv_up").count() == 993


def test_dv_time_travel_and_restore(spark, catalog):
    catalog.to_table(_mk(spark, 50), "dv_tt", keys=["k"])      # v1
    catalog.delete_rows("dv_tt", "k = 9")                      # v2 (dv)
    assert catalog.read_table("dv_tt", version=1).count() == 50
    assert catalog.read_table("dv_tt", version=2).count() == 49
    catalog.restore_table("dv_tt", 1)                          # v3
    assert catalog.read_table("dv_tt").count() == 50
    # restoring FORWARD to the post-delete snapshot re-applies the DV
    catalog.restore_table("dv_tt", 2)                          # v4
    assert catalog.read_table("dv_tt").count() == 49
    assert "dvs" in catalog._manifest("dv_tt")


def test_clone_carries_dv_and_stays_isolated(spark, catalog):
    catalog.to_table(_mk(spark, 60), "dv_src", keys=["k"], num_buckets=8)
    catalog.delete_rows("dv_src", "k = 5")
    catalog.clone_table("dv_src", "dv_dst")
    assert catalog.read_table("dv_dst").count() == 59
    assert catalog.read_table("dv_dst").where("k = 5").count() == 0
    # the clone owns a LOCAL copy of the sidecar (no "/" = local)
    (dv,) = catalog._manifest("dv_dst")["dvs"].values()
    assert "/" not in dv["file"]
    # a delete on the clone must not touch the source
    catalog.delete_rows("dv_dst", "k = 6")
    assert catalog.read_table("dv_dst").count() == 58
    assert catalog.read_table("dv_src").count() == 59
    assert catalog.read_table("dv_src").where("k = 6").count() == 1
    # the SOURCE retiring + vacuuming its DV must not break the
    # clone's reads (sidecars are copied, not externally referenced):
    # upsert k=5 on the source rewrites the covered bucket, retiring
    # the DV; vacuum then reclaims the sidecar the clone once saw
    catalog.to_table(
        spark.createDataFrame(pd.DataFrame({"k": [5], "v": [5.5]})),
        "dv_src", keys=["k"], how="upsert",
    )
    assert "dvs" not in catalog._manifest("dv_src")
    catalog.vacuum("dv_src")
    assert catalog.fs.list_dirs(
        f"{catalog._path('dv_src')}/{DV_DIR}"
    ) == []
    assert catalog.read_table("dv_dst").count() == 58
    assert catalog.read_table("dv_dst").where("k = 5").count() == 0


def test_sketch_tables_refuse_dv_and_auto_falls_back(spark, catalog):
    catalog.to_table(
        _mk(spark, 300), "dv_sk", keys=["k"], sketch_columns=["v"]
    )
    with pytest.raises(ValueError, match="sketch_columns"):
        catalog.delete_rows("dv_sk", "k = 1", strategy="dv")
    with pytest.raises(ValueError, match="sketch_columns"):
        catalog.update_rows(
            "dv_sk", "k = 1", {"v": "v + 1"}, strategy="dv"
        )
    # auto silently takes the rewrite path; sketches stay exact
    assert catalog.delete_rows("dv_sk", "k = 1") == 1
    man = catalog._manifest("dv_sk")
    assert man["op"] == "delete" and "dvs" not in man
    stats = catalog.table_sketch_stats("dv_sk", "v", quantiles=())
    assert stats.collect()[0]["n_rows"] == 299


def test_dv_survives_column_rename(spark, catalog):
    """Metadata-only column rename after a DV delete: the DV sidecar
    holds only KEY columns (which can never be renamed), so the
    anti-join is rename-proof by construction; the renamed value
    column still reads through the covered-leaf assembly."""
    catalog.to_table(_mk(spark, 40), "dv_rn", keys=["k"])
    catalog.delete_rows("dv_rn", "k = 11")
    catalog.rename_column("dv_rn", "v", "val")
    out = catalog.read_table("dv_rn")
    assert out.count() == 39
    assert out.where("k = 11").count() == 0
    assert out.where("k = 12").collect()[0]["val"] == 24.0


def test_dv_accrual_budget_auto_folds_oldest(spark, catalog, monkeypatch):
    """Point deletes accruing past DV_MAX_LIVE trigger an in-commit
    fold of the oldest DVs: live sidecar count stays bounded (the
    read cost is O(DV_MAX_LIVE) opens forever, no manual compact
    needed), deletions below the budget still rewrite zero data
    files, and every deleted key stays deleted through the folds."""
    import pandabase_spark.io as io_mod

    monkeypatch.setattr(io_mod, "DV_MAX_LIVE", 3)
    catalog.to_table(_mk(spark, 200), "dv_b", keys=["k"], num_buckets=4)
    before_files = _data_files(catalog, "dv_b")
    for k in (1, 2):
        catalog.delete_rows("dv_b", f"k = {k}")
    # below budget: zero-rewrite property intact
    assert _data_files(catalog, "dv_b") == before_files
    assert len(catalog._manifest("dv_b")["dvs"]) == 2
    for k in (3, 4, 5, 6, 7):
        catalog.delete_rows("dv_b", f"k = {k}")
    man = catalog._manifest("dv_b")
    assert len(man.get("dvs", {})) <= 3
    out = catalog.read_table("dv_b")
    assert out.count() == 193
    assert out.where("k between 1 and 7").count() == 0
    # vacuum reclaims exactly the retired sidecars
    catalog.vacuum("dv_b")
    live = {
        dv["file"]
        for dv in catalog._manifest("dv_b").get("dvs", {}).values()
    }
    assert set(
        catalog.fs.list_dirs(f"{catalog._path('dv_b')}/{DV_DIR}")
    ) == live


def test_dv_fold_scopes_io_to_covered_leaves(spark, catalog, monkeypatch):
    """The accrual fold rewrites EXACTLY the folded DVs' covered
    (segment, bucket) leaves: an uncovered segment that happens to
    share a bucket id is neither read nor rewritten — fold IO is
    proportional to covered data, not to every segment holding that
    bucket."""
    import pandabase_spark.io as io_mod

    monkeypatch.setattr(io_mod, "DV_MAX_LIVE", 1)
    catalog.to_table(_mk(spark, 50), "dv_sc", keys=["k"], num_buckets=1)
    (base_seg,) = catalog._manifest("dv_sc")["segments"]
    catalog.delete_rows("dv_sc", "k = 1")       # DV-A covers (base, 0)
    catalog.to_table(
        _mk(spark, 50).withColumn("k", F.col("k") + 1000),
        "dv_sc", keys=["k"], how="append",      # uncovered, bucket 0
    )
    new_seg = next(
        s for s in catalog._manifest("dv_sc")["segments"]
        if s != base_seg
    )
    seg_dir = f"{catalog._path('dv_sc')}/{new_seg}"
    files_before = {
        f"{d}/{f}"
        for d in catalog.fs.list_dirs(seg_dir)
        for f in catalog.fs.list_files(f"{seg_dir}/{d}")
    }
    catalog.delete_rows("dv_sc", "k = 2")       # exceeds budget: fold
    man = catalog._manifest("dv_sc")
    assert man["op"].endswith("+fold")
    # the uncovered segment survives the fold byte-identically
    assert new_seg in man["segments"]
    assert man["segments"][new_seg] == [0]
    files_after = {
        f"{d}/{f}"
        for d in catalog.fs.list_dirs(seg_dir)
        for f in catalog.fs.list_files(f"{seg_dir}/{d}")
    }
    assert files_after == files_before
    # the base segment's covered leaf was folded away
    assert base_seg not in man["segments"]
    out = catalog.read_table("dv_sc")
    assert out.count() == 98
    assert out.where("k in (1, 2)").count() == 0


def test_dv_budget_fold_under_update_path(spark, catalog, monkeypatch):
    """The accrual fold also fires on the UPDATE merge-on-read path:
    the commit that would exceed DV_MAX_LIVE folds the oldest DVs,
    lands the updated rows as their own (uncovered) segment, and
    every earlier delete/update stays applied."""
    import pandabase_spark.io as io_mod

    monkeypatch.setattr(io_mod, "DV_MAX_LIVE", 2)
    catalog.to_table(_mk(spark, 120), "dv_uf", keys=["k"], num_buckets=4)
    catalog.delete_rows("dv_uf", "k = 10")                     # DV 1
    catalog.update_rows("dv_uf", "k = 20", {"v": "111.0"})     # DV 2
    # third DV-commit exceeds the budget of 2 → folds the oldest
    catalog.update_rows("dv_uf", "k = 30", {"v": "222.0"})
    man = catalog._manifest("dv_uf")
    assert len(man.get("dvs", {})) <= 2
    out = catalog.read_table("dv_uf")
    assert out.count() == 119
    got = {r["k"]: r["v"] for r in out.where("k in (10,20,30)").collect()}
    assert got == {20: 111.0, 30: 222.0}
    # updates keep exactly one live version per key through the folds
    assert out.groupBy("k").count().where("count > 1").count() == 0


def test_wide_delete_auto_takes_rewrite_path(spark, catalog, monkeypatch):
    import pandabase_spark.io as io_mod

    monkeypatch.setattr(io_mod, "DV_AUTO_MAX_ROWS", 10)
    catalog.to_table(_mk(spark, 200), "dv_wide", keys=["k"])
    assert catalog.delete_rows("dv_wide", "k < 100") == 100
    man = catalog._manifest("dv_wide")
    assert man["op"] == "delete" and "dvs" not in man
    assert catalog.read_table("dv_wide").count() == 100


def test_dv_commit_race_cleans_sidecar(spark, catalog, monkeypatch):
    """A rival commit landing between the DV's snapshot pin and its
    publish trips ConcurrentWriteError AND removes the orphan sidecar
    (same no-litter discipline as the crashed-writer paths)."""
    from pandabase_spark.io import ConcurrentWriteError

    df = _mk(spark, 30)
    catalog.to_table(df, "dv_race", keys=["k"])                 # v1
    orig = KeyedCatalog._delete_dv
    fired = {}

    def hooked(self, table_name, m, man, hits, touched, **kw):
        if table_name == "dv_race" and not fired.get("x"):
            fired["x"] = True
            self.to_table(
                df.withColumn("k", F.col("k") + 1000),
                "dv_race", keys=["k"], how="append",
            )
        return orig(self, table_name, m, man, hits, touched, **kw)

    monkeypatch.setattr(KeyedCatalog, "_delete_dv", hooked)
    with pytest.raises(ConcurrentWriteError):
        catalog.delete_rows("dv_race", "k = 2")
    # rival intact, no DV committed, no sidecar orphaned
    assert catalog.read_table("dv_race").count() == 60
    assert "dvs" not in catalog._manifest("dv_race")
    dv_root = f"{catalog._path('dv_race')}/{DV_DIR}"
    assert (
        not catalog.fs.exists(dv_root)
        or catalog.fs.list_dirs(dv_root) == []
    )
    # retried on the fresh snapshot it lands
    assert catalog.delete_rows("dv_race", "k = 2") == 1
    assert catalog.read_table("dv_race").count() == 59


def test_clone_refuses_missing_dv_sidecar_cleanly(spark, catalog):
    """Cloning a snapshot whose DV sidecar file is gone (a vacuum
    that crashed between the sidecar delete and the manifest prune)
    refuses up front (ValueError, like restore) — no half-built
    destination directory. A completed vacuum prunes the manifest
    itself, which already refuses with NameError at lookup."""
    catalog.to_table(_mk(spark, 40), "dv_cv", keys=["k"], num_buckets=4)
    catalog.delete_rows("dv_cv", "k = 5")                     # v2 (DV)
    (dv,) = catalog._manifest("dv_cv")["dvs"].values()
    catalog.fs.delete(
        f"{catalog._path('dv_cv')}/{DV_DIR}/{dv['file']}"
    )
    with pytest.raises(ValueError, match="vacuum"):
        catalog.clone_table("dv_cv", "dv_cv2", version=2)
    assert not catalog.has_table("dv_cv2")
    assert not catalog.fs.exists(catalog._path("dv_cv2"))
