"""Skyline (Pareto frontier) queries, Spark-first.

A row is in the 2-D skyline when no other row is ≤ in both criteria
and < in at least one (both dimensions minimized; negate a column to
maximize it). The textbook formulations — a NOT EXISTS self-join or a
block-nested loop — are O(n²) and explode at scale; published Spark
integrations (e.g. "Integration of Skyline Queries into Spark SQL",
EDBT 2023) grid-partition to bound the pairwise work. For TWO
dimensions there is a stronger reduction this module uses: sort by x
and the skyline is exactly the strictly-decreasing prefix-minimum
envelope of y — no pairwise comparison anywhere.

That prefix minimum is computed with the same two-phase distributed
pattern as the sweep-line concurrency, KS and equi-depth operators
(per-x-group mins → range-bucket local cumulative mins → tiny
bucket-total offsets), so the only shuffles are one hash aggregate on
x and the final broadcast semi-join of the (skyline-sized) frontier
back onto the input. No global ORDER BY window, no n² join.

The reference has no skyline surface; extension component mapped to
the TPC-H-ish tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bucket_width: float = 10.0,
) -> DataFrame:
    """Exact 2-D skyline with both ``x_col`` and ``y_col`` MINIMIZED.

    Semantics: keep row r unless some row s has ``s.x <= r.x AND
    s.y <= r.y`` with strict inequality in at least one coordinate.
    Exact duplicates of a frontier point are all kept (neither
    dominates the other). NULLs in either criterion are excluded — a
    NULL never dominates and is never ranked.

    Correctness of the envelope reduction: group rows by x and let
    ymin(x) be the group minimum. A row survives iff (a) its y equals
    ymin(x) — otherwise the same-x minimum dominates it — and (b)
    every strictly-smaller x has ymin > ymin(x) — otherwise that
    (x' < x, y' <= y) point dominates. (b) is "prefix min over x' < x
    is strictly greater than ymin(x)", the strictly-decreasing
    envelope. Returns the input schema filtered to frontier rows.

    ``bucket_width`` sizes the range buckets of the prefix phase (in
    x units); any positive value is correct, it only balances the
    per-bucket local sorts.
    """
    from pyspark.sql.window import Window

    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    x, y = F.col(x_col), F.col(y_col)
    rows = df.where(x.isNotNull() & y.isNotNull())
    gmin = (
        rows.groupBy(x.alias("_x"))
        .agg(F.min(y).alias("_ymin"))
        .withColumn(
            "_bkt", F.floor(F.col("_x") / F.lit(float(bucket_width)))
        )
    )
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = gmin.withColumn("_lmin", F.min("_ymin").over(w_local))
    totals = gmin.groupBy("_bkt").agg(F.min("_ymin").alias("_bmin"))
    w_off = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bkt", F.min("_bmin").over(w_off).alias("_omin")
    )
    frontier = (
        local.join(F.broadcast(offsets), on="_bkt")
        .withColumn("_pmin", F.least("_lmin", "_omin"))
        # NULL _pmin = no strictly-smaller x exists → never dominated
        .where(F.col("_pmin").isNull() | (F.col("_pmin") > F.col("_ymin")))
        .select("_x", "_ymin")
    )
    # no broadcast hint: the frontier is usually tiny (O(log n) for
    # independent dims) and AQE will broadcast it from its runtime
    # size — but an anti-correlated worst case makes it input-sized,
    # and a forced hint would OOM instead of falling back
    return rows.join(
        frontier,
        (x == F.col("_x")) & (y == F.col("_ymin")),
        "left_semi",
    )
