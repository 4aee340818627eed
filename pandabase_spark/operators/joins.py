"""Join operators beyond Spark's built-ins: as-of, range, skew-salted.

The reference has NO joins at all (SURVEY.md §2 Table B — its upsert
key-match is a degenerate row-at-a-time equality probe,
reference:pandabase/sql.py:336-346). These are the join shapes a
time-series / training-data pipeline actually needs, each implemented
with an explicit 100 TB story:

- :func:`asof_join` — "latest right row at or before the left row's
  time, per key". NOT implemented as an inequality join (which fans out
  to left×right per key): instead the classic union-sort-window shape —
  tag both sides, union, one window per key ordered by time carrying
  the last seen right row forward. ONE shuffle on the key, state is a
  single row per partition stream. This is how kdb/Flink/QuestDB do it.
- :func:`range_join` — "right rows within [left.ts + lower, left.ts +
  upper]". Implemented as a time-bin equi-join: both sides bucket to
  ``ceil(window)`` bins, left probes its bin ± neighbors, then the
  exact predicate filters. Turns a nested-loop inequality join into an
  equi-shuffle with bounded fan-out (bins_touched ≤ 2 + window/bin).
- :func:`salted_join` — equi-join under key skew: the hot side is
  salted into ``salt`` sub-keys, the small side replicated ``salt``
  times (explode of a literal range — no driver loop), restoring even
  partition sizes when AQE's runtime skew split isn't available (e.g.
  disabled or non-AQE plans).
- :func:`semi_join` / :func:`anti_join` — thin readable wrappers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``left`` with at least one key match in ``right``."""
    return left.join(right.select(*on).distinct(), on=list(on), how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``left`` with no key match in ``right``."""
    return left.join(right.select(*on).distinct(), on=list(on), how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row: the most recent right row with
    ``right_ts <= left_ts`` within the same key group.

    Union-sort-window plan (one shuffle on ``on``): right rows carry
    their payload, left rows carry NULLs; a window ordered by (ts,
    right-first tie-break) runs ``last(payload, ignoreNulls=True)`` so
    each left row picks up the latest right payload at or before its
    timestamp. Ties (equal timestamps) match the right row, mirroring
    DuckDB/pandas ``merge_asof`` inclusive semantics.

    ``tolerance_seconds`` drops matches older than the horizon
    (NULL-fills instead). Output: all left columns + ``right_cols``
    suffixed, + ``{right_ts}{suffix}`` (the matched time).
    """
    from pyspark.sql.window import Window

    on = list(on)
    payload = [c for c in right_cols if c not in on]
    rtypes = dict(right.dtypes)
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_is_left"),
        F.col(left_ts).alias("_t"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in payload],
        F.lit(None).cast(rtypes[right_ts]).alias("__r_ts"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in on],
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at the same timestamp → inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in payload
    ]
    carried_ts = F.last("__r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}")
    out = (
        unioned.select("*", *carried, carried_ts)
        .where(F.col("_is_left") == 1)
        .drop("_is_left", "_t", "__r_ts", *[f"__r_{c}" for c in payload])
    )
    if tolerance_seconds is not None:
        horizon = F.col(left_ts).cast("double") - F.col(f"{right_ts}{suffix}").cast(
            "double"
        )
        keep = horizon <= F.lit(float(tolerance_seconds))
        for c in payload:
            out = out.withColumn(
                f"{c}{suffix}", F.when(keep, F.col(f"{c}{suffix}"))
            )
        out = out.withColumn(
            f"{right_ts}{suffix}", F.when(keep, F.col(f"{right_ts}{suffix}"))
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    bin_seconds: float | None = None,
) -> DataFrame:
    """Inner join of right rows with
    ``left_ts + lower <= right_ts <= left_ts + upper`` per key.

    A naive inequality join degenerates to a per-key nested loop; here
    both sides are bucketed into time bins of ``bin_seconds`` (default:
    the window width) and the left side probes every bin its window can
    overlap — an EQUI-join on (key, bin) with bounded replication
    (window/bin + 2 probes), then the exact range predicate filters.
    Catalyst executes it as a hash join; no BroadcastNestedLoopJoin.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    width = upper_seconds - lower_seconds
    bin_s = float(bin_seconds or max(width, 1.0))
    n_probes = int(width // bin_s) + 2

    l_bin0 = F.floor((F.col(left_ts).cast("double") + lower_seconds) / bin_s)
    probes = F.array(*[(l_bin0 + i).cast("long") for i in range(n_probes)])
    l_exp = left.select(
        "*", F.explode(probes).alias("_bin")
    )
    r_binned = right.select(
        *[F.col(c).alias(f"__r_{c}") if c not in on else F.col(c) for c in right.columns],
        F.floor(F.col(right_ts).cast("double") / bin_s).cast("long").alias("_bin"),
    )
    rts = f"__r_{right_ts}"
    cond = (
        (F.col(rts).cast("double") >= F.col(left_ts).cast("double") + lower_seconds)
        & (F.col(rts).cast("double") <= F.col(left_ts).cast("double") + upper_seconds)
    )
    joined = l_exp.join(r_binned, on=[*on, "_bin"]).where(cond).drop("_bin")
    return joined


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to heavy key skew.

    The (large, skewed) left side gets a random-ish salt derived from a
    row hash — ``pmod(xxhash64(all left columns), salt)`` — appended to
    the join key; the right side is replicated across all ``salt``
    values via an exploded literal range. Each hot key's rows now
    spread over ``salt`` reducers. Deterministic (hash salt, no rand()),
    so retries/speculative tasks agree.

    Prefer AQE's skew-join handling when it applies; this is for plans
    AQE cannot split (e.g. join followed by a bucketed write, or AQE
    off) and as the explicit, testable form of the technique.
    Evidence that AQE does handle the plain-shuffle-join case at
    runtime (final plan marked ``skew=true``):
    tests/test_plan_shapes.py::test_aqe_splits_skewed_join_at_runtime
    and the ``aqe_skew_join_split`` bench fact. Manual salting wins
    exactly when the split must be IN the plan: a bucketed/partitioned
    write downstream (AQE's split breaks the output partitioning
    requirement), stream-stream joins (no runtime re-plan), or
    engines/paths with AQE disabled.

    Only left-preserving join types are allowed: the right side is
    replicated ``salt`` times, so 'right'/'full' would emit each
    unmatched right row once per salt value (silently wrong).
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti",
               "leftsemi", "leftanti", "leftouter"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins {sorted(allowed)}; "
            f"got how={how!r} (right rows are replicated {salt}x)"
        )
    on = list(on)
    l_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l = left.withColumn("_salt", l_salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on=on + ["_salt"], how=how).drop("_salt")
