"""Mergeable-sketch accuracy pins (operators/sketches.py).

Sketch estimates are implementation-specific, so these operators take
the rows-only driver check; the accuracy contract lives here, asserted
against exact answers at test scale with bounds looser than the
published DataSketches guarantees (HLL lgk=12 ≈ 1.6 % RSE, KLL k=200
≈ 1.3 % rank error) to keep the tests deterministic-in-practice.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandabase_spark import workload
from pandabase_spark.operators.sketches import (
    hll_distinct_rollup,
    hll_merge_rollup,
    kll_quantile_rollup,
    theta_overlap_estimate,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return workload.load(spark, SF_DIR, "events")


def test_hll_rollup_within_error_and_mergeable(spark, events):
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    per_type = hll_distinct_rollup(events, ["event_type"], "user_id")
    got = {r["event_type"]: r["distinct_est"] for r in per_type.collect()}
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] <= 0.05, (k, est, exact[k])

    # merge path: global distinct from the per-type sketches alone must
    # match sketching the raw column directly (HLL union is lossless)
    merged = hll_merge_rollup(per_type, []).collect()[0]["distinct_est"]
    direct = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("d")
    ).collect()[0]["d"]
    assert merged == direct
    exact_global = events.select("user_id").distinct().count()
    assert abs(merged - exact_global) / exact_global <= 0.05


def test_kll_quantiles_within_rank_error(spark, events):
    got = kll_quantile_rollup(
        events, ["event_type"], "value", quantiles=(0.5, 0.9)
    ).collect()
    assert got
    for row in got:
        sub = events.where(F.col("event_type") == row["event_type"])
        n = sub.count()
        for q, col in ((0.5, "q_50"), (0.9, "q_90")):
            # rank-error contract: the estimate's true rank is within
            # 3 % of the requested rank (KLL k=200 guarantees ~1.3 %)
            rank = sub.where(F.col("value") <= row[col]).count() / n
            assert abs(rank - q) <= 0.03, (row["event_type"], col, rank)


def test_theta_overlap_tracks_exact_containment(spark, events):
    # two user populations with known overlap: users 1-100 vs 51-150
    a = events.where(F.col("user_id").between(1, 100)).select("user_id")
    b = events.where(F.col("user_id").between(51, 150)).select("user_id")
    exact_a = a.distinct().count()
    exact_overlap = (
        a.intersect(b).count()
    )
    got = theta_overlap_estimate(a, b, "user_id").collect()[0]
    assert abs(got["est_left"] - exact_a) / exact_a <= 0.05
    # inclusion-exclusion compounds three estimates; allow 10 %
    assert abs(got["est_overlap"] - exact_overlap) <= max(
        0.1 * exact_overlap, 3
    )
    assert 0.0 <= got["overlap_frac_of_left"] <= 1.0


def test_cms_bounds(spark):
    """CMS guarantee: never undercounts, overcounts by at most eps*N
    (at the test's confidence; deterministic for the fixed seed)."""
    from pandabase_spark.operators.sketches import cms_frequencies
    from pandabase_spark.workload import load
    from tests.conftest import SF_DIR

    ev = load(spark, SF_DIR, "events")
    n = ev.count()
    probes = list(range(1, 21))
    true = {
        r["user_id"]: r["count"]
        for r in ev.groupBy("user_id").count().collect()
    }
    got = {
        r["user_id"]: r["est_count"]
        for r in cms_frequencies(ev, "user_id", probes, eps=0.001).collect()
    }
    for u in probes:
        t = true.get(u, 0)
        assert got[u] >= t, f"user {u} undercounted"
        assert got[u] <= t + 0.001 * n + 1, f"user {u} over bound"


def test_bloom_no_false_negatives(spark):
    """Every true member reports might_contain=True; a disjoint probe
    set reports mostly False (fpp-bounded)."""
    from pandabase_spark.operators.sketches import bloom_membership
    from pandabase_spark.workload import load
    from tests.conftest import SF_DIR

    ev = load(spark, SF_DIR, "events")
    members = [r["user_id"] for r in ev.select("user_id").distinct().limit(50).collect()]
    absent = [10_000_000 + i for i in range(200)]
    got = {
        r["user_id"]: r["might_contain"]
        for r in bloom_membership(
            ev, "user_id", members + absent, expected_items=10000, fpp=0.01
        ).collect()
    }
    assert all(got[m] for m in members), "false negative"
    fp = sum(1 for a in absent if got[a])
    assert fp <= 0.05 * len(absent), f"fp rate too high: {fp}/200"
