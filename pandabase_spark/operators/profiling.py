"""Distribution profiling: the pre-flight checks for shuffle-heavy ops.

Skew is the dominant failure mode of large joins/aggregations — one hot
key turns a 1000-task stage into a 999-idle-tasks stage. These
operators measure it BEFORE the expensive job so the pipeline can pick
a strategy (broadcast, salting via ``operators.joins.salted_join``, AQE
skew-join) from data, not from folklore.

The reference has no profiling surface beyond per-table min/max/count
(``describe_database``, reference:pandabase/util.py:45-80); this is
extension surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def key_skew_report(
    df: DataFrame, key_cols: Sequence[str], *, top_k: int = 5
) -> DataFrame:
    """Heavy-hitter report per candidate shuffle key.

    For each column: its ``top_k`` most frequent values with count,
    share of all rows, and the skew ratio (count / mean group size) —
    a ratio ≫ 1 on the join key predicts straggler tasks and argues
    for salting or a broadcast of the other side.

    Plan: one hash aggregation per column (map-side combined, shuffle
    carries one row per distinct value), then a rank-limit top-k —
    never a global sort, never a collect. Columns are profiled
    independently and unioned; at 100 TB profile a hash-sample of rows
    instead (`pmod(xxhash64(...), m) = 0`) — the heavy hitters that
    matter survive any uniform sample.

    Returns (key_col, value [string], n_rows, share_pct, skew_ratio,
    rank) with deterministic (count desc, value asc) ranking.
    """
    from pyspark.sql.window import Window

    parts = []
    for c in key_cols:
        counts = (
            df.select(F.col(c).cast("string").alias("value"))
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        stats = counts.agg(
            F.sum("n_rows").alias("_total"),
            F.avg("n_rows").alias("_mean"),
        )
        # orderBy+limit plans as TakeOrderedAndProject — a distributed
        # partial top-k, NOT a global sort; the rank window then runs
        # over only the top_k survivors (O(k) single partition)
        w = Window.orderBy(F.col("n_rows").desc(), F.col("value").asc())
        top = (
            counts.orderBy(F.col("n_rows").desc(), F.col("value").asc())
            .limit(top_k)
            .withColumn("rank", F.row_number().over(w).cast("int"))
        )
        parts.append(
            top.crossJoin(F.broadcast(stats)).select(
                F.lit(c).alias("key_col"),
                "value",
                F.col("n_rows").cast("long").alias("n_rows"),
                F.round(100.0 * F.col("n_rows") / F.col("_total"), 4).alias(
                    "share_pct"
                ),
                F.round(F.col("n_rows") / F.col("_mean"), 4).alias(
                    "skew_ratio"
                ),
                "rank",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
