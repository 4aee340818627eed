"""register_view: keyed tables as spark.sql temp views.

The reference exposes tables to raw SQL through the SQLAlchemy engine
(reference:pandabase/pandabase.py — every helper takes con= and users
can always drop to engine.execute). Our SQL front door is a temp view
over the same lazy plan read_table builds, so pruning, DV filtering,
column mapping, and predicate pushdown all survive the SQL boundary.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.plans import plan_audit


def _mk(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )


def test_register_view_basic_and_default_name(spark, catalog):
    catalog.to_table(_mk(spark), "vt", keys=["k"])
    name = catalog.register_view("vt")
    assert name == "kt_vt"
    got = spark.sql(f"SELECT count(*) AS n, sum(v) AS s FROM {name}").first()
    exp = catalog.read_table("vt").agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).first()
    assert (got.n, got.s) == (exp.n, exp.s)


def test_register_view_pins_snapshot_until_reregistered(spark, catalog):
    catalog.to_table(_mk(spark, 40), "vp", keys=["k"])
    catalog.register_view("vp", "vp_live")
    # append AFTER registration — the view is a lazy plan over the
    # manifest read at registration time, so it must NOT see the new
    # rows until re-registered (documented Delta-like semantics)
    extra = _mk(spark, 80).where(F.col("k") >= 40)
    catalog.to_table(extra, "vp", keys=["k"], how="append")
    assert spark.sql("SELECT count(*) AS n FROM vp_live").first().n == 40
    catalog.register_view("vp", "vp_live")
    assert spark.sql("SELECT count(*) AS n FROM vp_live").first().n == 80


def test_register_view_time_travel_version(spark, catalog):
    catalog.to_table(_mk(spark, 30), "vv", keys=["k"])
    patch = _mk(spark, 30).withColumn("v", F.col("v") + 100.0)
    catalog.to_table(patch, "vv", keys=["k"], how="upsert")
    catalog.register_view("vv", "vv_v1", version=1)
    catalog.register_view("vv", "vv_cur")
    joined = spark.sql(
        "SELECT sum(c.v - o.v) AS delta FROM vv_cur c JOIN vv_v1 o USING (k)"
    ).first()
    assert joined.delta == pytest.approx(100.0 * 30)


def test_register_view_respects_dv_deletes(spark, catalog):
    catalog.to_table(_mk(spark, 50), "vd", keys=["k"])
    catalog.delete_rows("vd", "k % 5 = 0", strategy="dv")
    catalog.register_view("vd", "vd_v")
    rows = spark.sql("SELECT k FROM vd_v WHERE k < 10 ORDER BY k").collect()
    assert [r.k for r in rows] == [1, 2, 3, 4, 6, 7, 8, 9]


def test_catalog_sql_joins_bare_names(spark, catalog):
    catalog.to_table(_mk(spark, 30), "left_t", keys=["k"])
    dim = spark.createDataFrame(
        [(g, f"g{g}") for g in range(7)], "grp bigint, label string"
    )
    catalog.to_table(dim, "dim_t", keys=["grp"])
    got = catalog.sql(
        "SELECT d.label, count(*) AS n FROM left_t l "
        "JOIN dim_t d USING (grp) GROUP BY d.label ORDER BY d.label"
    ).collect()
    assert len(got) == 7
    assert sum(r.n for r in got) == 30


def test_catalog_sql_repins_current_snapshot_each_call(spark, catalog):
    catalog.to_table(_mk(spark, 10), "fresh_t", keys=["k"])
    assert catalog.sql("SELECT count(*) AS n FROM fresh_t").first().n == 10
    catalog.to_table(
        _mk(spark, 25).where(F.col("k") >= 10),
        "fresh_t", keys=["k"], how="append",
    )
    # unlike a manually-registered view, sql() re-pins per call
    assert catalog.sql("SELECT count(*) AS n FROM fresh_t").first().n == 25


def test_catalog_sql_namespaced(spark, catalog):
    catalog.to_table(_mk(spark, 12), "ns_t", keys=["k"], schema="s1")
    n = catalog.sql("SELECT count(*) AS n FROM ns_t", schema="s1").first().n
    assert n == 12


def test_catalog_sql_view_hygiene(spark, catalog):
    """catalog.sql never clobbers a user temp view (raises on the name
    conflict) and drops its own pinned views before returning — a
    later plain spark.sql against the bare name can't read a stale
    snapshot, while the returned DataFrame keeps its resolved plan."""
    catalog.to_table(_mk(spark, 10), "hyg_t", keys=["k"])
    df = catalog.sql("SELECT count(*) AS n FROM hyg_t")
    # pinned view dropped after the call, DataFrame still executes
    assert not spark.catalog.tableExists("hyg_t")
    assert df.first().n == 10
    # a pre-existing user temp view under the table's name raises
    spark.range(3).createOrReplaceTempView("hyg_t")
    with pytest.raises(ValueError, match="shadow"):
        catalog.sql("SELECT count(*) AS n FROM hyg_t")
    # the user's view survived the refusal
    assert spark.table("hyg_t").count() == 3
    spark.catalog.dropTempView("hyg_t")


def test_catalog_sql_unknown_relation_still_raises(spark, catalog):
    catalog.to_table(_mk(spark, 5), "known_t", keys=["k"])
    with pytest.raises(Exception, match="no_such_t|NOT_FOUND"):
        catalog.sql("SELECT * FROM known_t JOIN no_such_t USING (k)")


def test_sql_predicate_pushes_through_view(spark, catalog):
    catalog.to_table(_mk(spark, 200), "vq", keys=["k"])
    catalog.register_view("vq", "vq_v")
    df = spark.sql("SELECT k, v FROM vq_v WHERE grp = 3")
    a = plan_audit(df)
    assert any("grp" in f for f in a.pushed_filters)
    assert a.python_free
