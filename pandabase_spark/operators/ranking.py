"""Distributed global ranking — row_number / ntile WITHOUT the
single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole table through one task (Spark's WindowExec warns about exactly
this); at 10^9 rows that is THE scale killer of any query built on a
global rank. This module computes the identical numbers with the
two-phase distributed prefix pattern already used by
:func:`pandabase_spark.operators.profiling.ks_two_sample` and
:func:`pandabase_spark.operators.skyline.skyline2d`, generalized to
ANY orderable key tuple:

1. range-shuffle the frame into ``num_buckets`` ORDERED buckets
   (``repartitionByRange`` — partition i holds keys <= partition
   i+1's; Spark's RangePartitioner samples with partition-index-
   seeded RNG, so recomputation reproduces the same boundaries);
2. ``row_number`` within each bucket (a PARTITIONED window —
   balanced tasks, no warning);
3. exclusive prefix offsets of the per-bucket counts via a tiny
   bucket x bucket self-join (``num_buckets^2`` pairs — thousands,
   not rows), broadcast back.

global rank = local rank + offset. Exact, deterministic whenever
``order_cols`` is a TOTAL order (callers append a tiebreak key,
exactly as they would for the window form).

The reference has no ranking surface (pandas ``sort_index`` is its
only global order, reference:pandabase/companda.py:89-91); this backs
the engine's rfm quartiles and companda's positional mode.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_BKT = "__pbrk_bkt"
_LRN = "__pbrk_lrn"
_OFF = "__pbrk_off"
_CNT = "__pbrk_cnt"
_TOT = "__pbrk_tot"


def _ranked(
    df: DataFrame, order_cols: "Sequence[str]", num_buckets: int
) -> DataFrame:
    """``df`` + ``_LRN+_OFF`` global 1-based rank ingredients +
    ``_TOT`` total row count, all attached in ONE plan (the range
    exchange is shared by the rank and count branches)."""
    from pyspark.sql.window import Window

    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive: {num_buckets}")
    cols = [F.col(c) for c in order_cols]
    parts = df.repartitionByRange(int(num_buckets), *cols).withColumn(
        _BKT, F.spark_partition_id()
    )
    w = Window.partitionBy(_BKT).orderBy(*cols)
    local = parts.withColumn(_LRN, F.row_number().over(w))
    totals = parts.groupBy(_BKT).agg(F.count(F.lit(1)).alias(_CNT))
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(b, F.col(f"b.{_BKT}") < F.col(f"a.{_BKT}"), "left")
        .groupBy(F.col(f"a.{_BKT}").alias(_BKT))
        .agg(
            F.coalesce(F.sum(f"b.{_CNT}"), F.lit(0)).alias(_OFF)
        )
    )
    tot = totals.agg(F.sum(_CNT).alias(_TOT))
    return (
        local.join(F.broadcast(offsets), on=_BKT)
        .crossJoin(F.broadcast(tot))
    )


def global_row_number(
    df: DataFrame,
    order_cols: "Sequence[str]",
    out_col: str,
    *,
    num_buckets: int = 64,
) -> DataFrame:
    """``df`` + ``out_col`` = 1-based row number over the global
    ``order_cols`` order — the distributed replacement for
    ``row_number() OVER (ORDER BY ...)``. Pass a tiebreak column if
    the leading keys can repeat (rank among EQUAL keys is otherwise
    tied to physical order, same as the window form)."""
    ranked = _ranked(df, order_cols, num_buckets)
    return ranked.withColumn(
        out_col, (F.col(_LRN) + F.col(_OFF)).cast("long")
    ).drop(_BKT, _LRN, _OFF, _CNT, _TOT)


def ntile_distributed(
    df: DataFrame,
    n: int,
    order_cols: "Sequence[str]",
    out_col: str,
    *,
    num_buckets: int = 64,
) -> DataFrame:
    """``df`` + ``out_col`` = ``ntile(n) OVER (ORDER BY ...)`` with
    SQL ntile semantics (the first ``N mod n`` tiles hold one extra
    row), computed from the distributed global rank — bit-identical
    to the window form on a total order, minus the single-task
    sort."""
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    ranked = _ranked(df, order_cols, num_buckets)
    k0 = (F.col(_LRN) + F.col(_OFF) - 1).cast("long")  # 0-based rank
    q = (F.col(_TOT) / F.lit(n)).cast("long")  # floor: both positive
    r = F.col(_TOT) % F.lit(n)
    fat = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    tile = F.when(
        k0 < fat, (k0 / (q + 1)).cast("long") + 1
    ).otherwise(r + ((k0 - fat) / q).cast("long") + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        _BKT, _LRN, _OFF, _CNT, _TOT
    )
