"""Join-operator semantics: as-of, range, salted, semi/anti.

Ground truth for asof/range comes from the naive (fan-out) formulation
on small data; the operators must match it exactly while keeping the
scalable plan shape.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandabase_spark.operators.joins import (
    anti_join,
    asof_join,
    range_join,
    salted_join,
    semi_join,
)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = []
    for u in (1, 2):
        for m, px in ((0, 10.0), (10, 11.0), (25, 12.5), (60, 9.0)):
            rows.append((u, pd.Timestamp("2024-01-01 09:00") + pd.Timedelta(minutes=m), px + u))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["uid", "ts", "px"]))


@pytest.fixture(scope="module")
def trades(spark):
    rows = []
    for u in (1, 2):
        for m in (5, 10, 30, 59, 120):
            rows.append((u, pd.Timestamp("2024-01-01 09:00") + pd.Timedelta(minutes=m), 100 + m))
    rows.append((3, pd.Timestamp("2024-01-01 09:30"), 999))  # no quotes for uid 3
    return spark.createDataFrame(pd.DataFrame(rows, columns=["uid", "ts", "qty"]))


def test_asof_join_matches_naive(spark, quotes, trades):
    got = asof_join(
        trades, quotes, on=["uid"], left_ts="ts", right_ts="ts",
        right_cols=["px"],
    )
    naive = (
        trades.alias("t")
        .join(quotes.alias("q"), (F.col("t.uid") == F.col("q.uid")) & (F.col("q.ts") <= F.col("t.ts")), "left")
        .groupBy("t.uid", "t.ts", "t.qty")
        .agg(F.max_by("q.px", "q.ts").alias("px_naive"),
             F.max("q.ts").alias("ts_naive"))
    )
    j = got.join(
        naive,
        (got.uid == naive["uid"]) & (got.ts == naive["ts"]),
        "inner",
    )
    assert j.count() == trades.count()
    bad = j.where(
        ~F.col("px_asof").eqNullSafe(F.col("px_naive"))
        | ~F.col("ts_asof").eqNullSafe(F.col("ts_naive"))
    )
    assert bad.count() == 0
    # uid 3 has no quotes → NULL match
    r3 = got.where(F.col("uid") == 3).collect()[0]
    assert r3["px_asof"] is None
    # equal timestamps match inclusively (trade at 09:10 sees the 09:10 quote)
    r10 = got.where((F.col("uid") == 1) & (F.col("qty") == 110)).collect()[0]
    assert r10["px_asof"] == 12.0  # px 11.0 + uid 1


def test_asof_join_tolerance(spark, quotes, trades):
    got = asof_join(
        trades, quotes, on=["uid"], left_ts="ts", right_ts="ts",
        right_cols=["px"], tolerance_seconds=15 * 60,
    )
    # trade at +120min: last quote at +60min → 60min old → outside 15min
    r = got.where((F.col("uid") == 1) & (F.col("qty") == 220)).collect()[0]
    assert r["px_asof"] is None
    # trade at +59min: quote at +25min → 34min → also dropped
    r = got.where((F.col("uid") == 1) & (F.col("qty") == 159)).collect()[0]
    assert r["px_asof"] is None
    # trade at +30min: quote at +25min → 5min old → kept
    r = got.where((F.col("uid") == 1) & (F.col("qty") == 130)).collect()[0]
    assert r["px_asof"] == 13.5


def test_asof_plan_is_single_shuffle_window(spark, quotes, trades):
    got = asof_join(
        trades, quotes, on=["uid"], left_ts="ts", right_ts="ts", right_cols=["px"]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join node at all — union + window
    assert plan.count("Window") >= 1


def test_range_join_matches_naive(spark, quotes, trades):
    got = range_join(
        trades, quotes, on=["uid"], left_ts="ts", right_ts="ts",
        lower_seconds=0.0, upper_seconds=30 * 60.0,
    )
    naive = trades.alias("t").join(
        quotes.alias("q"),
        (F.col("t.uid") == F.col("q.uid"))
        & (F.col("q.ts") >= F.col("t.ts"))
        & (F.col("q.ts") <= F.col("t.ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    assert got.count() == naive.count()
    # no nested-loop join in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_salted_join_matches_plain(spark, lineitem):
    li = lineitem.limit(5000).select("l_orderkey", "l_quantity")
    dims = (
        li.select("l_orderkey").distinct().limit(200)
        .withColumn("flagged", F.lit(True))
    )
    got = salted_join(li, dims, on=["l_orderkey"], salt=8)
    plain = li.join(dims, on=["l_orderkey"])
    assert got.count() == plain.count()
    assert got.columns == plain.columns
    a = got.agg(F.sum("l_quantity")).collect()[0][0]
    b = plain.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_semi_anti_partition(spark, quotes, trades):
    s = semi_join(trades, quotes, on=["uid"])
    a = anti_join(trades, quotes, on=["uid"])
    assert s.count() + a.count() == trades.count()
    assert a.select("uid").distinct().collect()[0]["uid"] == 3
