"""Time-series operators: resampling and gap-filling.

The reference's identity is "ML / time-series datasets that grow over
time" (reference:README.md:24-25), but its only time-series affordance
is a datetime primary key. These are the operations such a table
actually needs, Spark-first:

- :func:`resample` — fixed-interval binning + aggregation (one
  partial-aggregated shuffle; bins computed with integer epoch
  arithmetic, no timezone traps);
- :func:`fill_gaps` — densify per group: each group generates its own
  min..max bin range with ``sequence`` + ``explode`` and left-joins the
  observed bins (missing bins get configurable fill values). The
  explode is bounded by (range/interval) per group — at 100 TB you gap-
  fill per entity, never globally.

Bins are exposed as epoch seconds (long): unambiguous across engines
and timezones; render to timestamps at the presentation edge.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _bin_epoch(ts_col: str, interval_seconds: int) -> Column:
    # floor division (not cast-truncation) so pre-1970 negative epochs
    # bin toward -inf, matching SQL floor() oracles
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    sec = F.floor(us / 1_000_000).cast("long")
    return F.floor(sec / interval_seconds).cast("long") * interval_seconds


def resample(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    interval_seconds: int = 900,
    group_cols: Sequence[str] = (),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Aggregate into fixed ``interval_seconds`` bins (epoch-aligned).

    ``aggs`` maps output name → aggregate Column; default counts rows.
    """
    aggs = dict(aggs) if aggs else {"n": F.count(F.lit(1))}
    out = (
        df.withColumn("bin_epoch", _bin_epoch(ts_col, interval_seconds))
        .groupBy(*group_cols, "bin_epoch")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    return out


def fill_gaps(
    binned: DataFrame,
    *,
    interval_seconds: int,
    group_cols: Sequence[str] = (),
    fill: Mapping[str, object] | None = None,
) -> DataFrame:
    """Densify a resampled frame: emit every bin between each group's
    first and last observation, filling absent bins with ``fill``
    values (default 0 for every non-group, non-bin column).

    Plan: per-group min/max (one agg) → ``sequence`` + ``explode``
    builds the dense spine distributed per group → left join observed
    bins back. No driver-side loops, no cross joins.
    """
    group_cols = list(group_cols)
    value_cols = [
        c for c in binned.columns if c not in group_cols and c != "bin_epoch"
    ]
    fill = dict(fill) if fill else {c: 0 for c in value_cols}

    spans = binned.groupBy(*group_cols).agg(
        F.min("bin_epoch").alias("_lo"), F.max("bin_epoch").alias("_hi")
    )
    spine = spans.select(
        *group_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval_seconds))
        ).alias("bin_epoch"),
    )
    out = spine.join(binned, on=group_cols + ["bin_epoch"], how="left")
    for c in value_cols:
        if c in fill and fill[c] is not None:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(fill[c])))
    return out


def forward_fill(
    df: DataFrame,
    *,
    ts_col: str,
    value_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Pandas-style ``ffill`` per group: each null value takes the most
    recent non-null observation at or before its timestamp.

    One window per group ordered by event time — ``last(col,
    ignorenulls=True)`` over an unbounded-preceding frame, fully
    codegen'd, no UDF and no self-join. Leading nulls (no prior
    observation) stay null, exactly like pandas. Pass
    ``order_tiebreak`` columns to make fills deterministic when
    timestamps collide.

    The reference's whole domain is datetime-keyed pandas tables
    (reference:README.md:24-25) where ``df.ffill()`` is the idiomatic
    gap repair; this is that operator made distributed. At 100 TB the
    cost is one hash shuffle on the group key + an in-partition sort —
    the same shape as any sessionization pass.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(ts_col, *order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def linear_interpolate(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Pandas-style ``interpolate(method='time')`` per group: each null
    value becomes the time-weighted blend of its nearest non-null
    neighbors, ``prev + (next - prev) * (t - t_prev) / (t_next -
    t_prev)``; rows before the first (after the last) observation take
    the first (last) one — pandas' edge behavior under
    ``limit_direction='both'``.

    TWO windows over one hash shuffle on the group key: an unbounded-
    preceding ``last(ignorenulls)`` pass carries (prev value, prev ts)
    forward and an unbounded-following ``first(ignorenulls)`` pass
    carries (next value, next ts) backward — no self-joins, no UDF,
    fully codegen'd. ``ts_col`` must be numeric (epoch); keep it
    integral so the blend weights are exact ratios of longs.
    """
    out_col = out_col or value_col
    prev_w = (
        Window.partitionBy(*group_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    next_w = (
        Window.partitionBy(*group_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col(ts_col))
    prev_v = F.last(v, ignorenulls=True).over(prev_w)
    prev_t = F.last(obs_ts, ignorenulls=True).over(prev_w)
    next_v = F.first(v, ignorenulls=True).over(next_w)
    next_t = F.first(obs_ts, ignorenulls=True).over(next_w)
    blend = prev_v + (next_v - prev_v) * (
        (F.col(ts_col) - prev_t).cast("double")
        / (next_t - prev_t).cast("double")
    )
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)       # before first observation
        .when(next_v.isNull(), prev_v)       # after last observation
        .otherwise(blend)
    )
    return df.withColumn(out_col, interp)


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    *,
    alpha: float = 0.5,
    span: int = 8,
    group_cols: Sequence[str] = (),
    tiebreak_col: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Bounded-window exponentially weighted moving average per group:
    the pandas ``ewm(alpha=..).mean()`` recurrence truncated to the
    last ``span`` observations,

        ewma_t = Σ_{j<span} (1-α)^j · v_{t-j}  /  Σ_{j<span} (1-α)^j

    with missing lags (series head) dropped from BOTH sums — exactly
    pandas' finite-history normalization. The truncation is what makes
    the operator scale-safe AND engine-exact: the weights are span
    compile-time constants, the whole expression is one Window node of
    ``span`` ``lag`` reads (single hash shuffle on the group key,
    fully codegen'd, no carried state), and the same finite float
    expression evaluates bit-identically in any engine — none of the
    infinite-recurrence forms ((1-α)^(-i) rescaling) that overflow or
    reorder floating point at scale. (1-α)^span < 0.4% of the weight
    at the defaults, the standard truncation argument.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    b = 1.0 - alpha
    v = F.col(value_col).cast("double")
    terms = [v] + [
        F.lag(v, j).over(w) * F.lit(b**j) for j in range(1, span)
    ]
    weights = [F.lit(1.0)] + [
        F.when(
            F.lag(v, j).over(w).isNotNull(), F.lit(b**j)
        ).otherwise(F.lit(0.0))
        for j in range(1, span)
    ]
    num = terms[0]
    for t in terms[1:]:
        num = num + F.coalesce(t, F.lit(0.0))
    den = weights[0]
    for t in weights[1:]:
        den = den + t
    return df.withColumn(out_col, num / den)


def scd2_history(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 history from an event stream:
    collapse consecutive duplicate states per key, then emit one
    validity interval per surviving state change —
    ``(key, state, valid_from, valid_to, version)`` with ``valid_to``
    NULL on the current row — the warehouse dimension-build shape
    (Kimball SCD2), derived here instead of maintained by triggers.

    Plan: two Window passes over the SAME hash partitioning on the
    key (lag for change detection, then lead/row_number on the
    filtered survivors for intervals + version) — one shuffle total,
    no self-joins. ``tiebreak_col`` makes the order total when event
    times can tie.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = df.withColumn(
        "_prev", F.lag(state_col).over(w)
    ).where(
        F.col("_prev").isNull()
        | ~F.col(state_col).eqNullSafe(F.col("_prev"))
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return changed.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
    )
