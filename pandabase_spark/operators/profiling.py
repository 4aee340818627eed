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


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    *,
    bucket_width: float = 10.0,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic, distributed —
    the drift check between two cohorts' value distributions (train
    vs serve, this week vs last week) that decides whether a pipeline
    needs re-calibration.

    D = max over observed values v of |F_a(v) − F_b(v)| needs the
    running counts of both samples over the GLOBAL value order — the
    textbook form is one ``ORDER BY value`` window, a single total
    order no cluster should execute. This is the same two-phase
    distributed prefix sum as the sweep-line concurrency operator:

      1. per distinct value: (count_a, count_b) — one hash aggregate
         (ties collapse here, so the CDF is evaluated once per
         distinct value, right-continuous);
      2. per range-bucket (``floor(value / bucket_width)``) local
         running sums — each partition sorts only its bucket;
      3. exclusive prefix over per-bucket TOTALS (thousands of rows,
         one tiny exchange) broadcast back as offsets.

    Exactness discipline: the returned row is pure integers —
    ``ks_num = max |c_a·n_b − c_b·n_a|`` with ``n_a``/``n_b`` the
    sample sizes, so D = ks_num / (n_a·n_b) with zero float
    accumulation (products stay < 2^63 up to ~3·10^9 rows per side;
    beyond that, pre-scale counts). NULL values are excluded (a NULL
    has no place on the real line)."""
    from pyspark.sql.window import Window

    v = F.col(value_col)
    per = (
        df.where(F.col(group_col).isin(group_a, group_b) & v.isNotNull())
        .groupBy(v.alias("_v"))
        .agg(
            F.sum(
                F.when(F.col(group_col) == group_a, 1).otherwise(0)
            ).alias("_da"),
            F.sum(
                F.when(F.col(group_col) == group_b, 1).otherwise(0)
            ).alias("_db"),
        )
        .withColumn(
            "_bkt", F.floor(F.col("_v") / F.lit(float(bucket_width)))
        )
    )
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = per.withColumn("_ca", F.sum("_da").over(w_local)).withColumn(
        "_cb", F.sum("_db").over(w_local)
    )
    totals = per.groupBy("_bkt").agg(
        F.sum("_da").alias("_ta"), F.sum("_db").alias("_tb")
    )
    w_off = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_ta").over(w_off), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_tb").over(w_off), F.lit(0)).alias("_ob"),
    )
    tot = per.agg(
        F.sum("_da").cast("long").alias("n_a"),
        F.sum("_db").cast("long").alias("n_b"),
    )
    return (
        local.join(F.broadcast(offsets), on="_bkt")
        .crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    (F.col("_ca") + F.col("_oa")) * F.col("n_b")
                    - (F.col("_cb") + F.col("_ob")) * F.col("n_a")
                )
            )
            .cast("long")
            .alias("ks_num")
        )
        .select("ks_num", "n_a", "n_b")
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 8,
    bucket_width: float = 10.0,
) -> DataFrame:
    """Exact equi-depth (equi-height) histogram, distributed — the
    optimizer-statistics / data-profiling shape: ``n_buckets`` ranges
    each holding ~N/n rows regardless of how skewed the values are
    (where equi-WIDTH bins collapse under skew).

    Definition is rank-based on DISTINCT values, so it is fully
    deterministic and tie-stable: a value v lands in bucket
    ``floor(rows_before_v * n / N)`` — every duplicate of v stays in
    one bucket (no arbitrary NTILE tie-splitting), which also makes
    the result reproducible across engines in pure integer
    arithmetic.

    The global running count never materializes as a global window:
    same two-phase distributed prefix sum as :func:`ks_two_sample`
    (per-distinct-value counts → range-bucket local cumsums → tiny
    bucket-total offsets). Output: (bucket, lo, hi, n_rows,
    n_distinct) per non-empty bucket. NULLs are excluded."""
    from pyspark.sql.window import Window

    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    v = F.col(value_col)
    per = (
        df.where(v.isNotNull())
        .groupBy(v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_bkt", F.floor(F.col("_v") / F.lit(float(bucket_width)))
        )
    )
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = per.withColumn(
        "_cb_local", F.coalesce(F.sum("_c").over(w_local), F.lit(0))
    )
    totals = per.groupBy("_bkt").agg(F.sum("_c").alias("_t"))
    w_off = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off")
    )
    tot = per.agg(F.sum("_c").alias("_n"))
    return (
        local.join(F.broadcast(offsets), on="_bkt")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "bucket",
            F.expr(
                f"CAST((_cb_local + _off) * {int(n_buckets)} AS BIGINT) "
                "DIV _n"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
            F.sum("_c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
    )
