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
   i+1's);
2. ``row_number`` within each bucket (a PARTITIONED window —
   balanced tasks, no warning);
3. per-bucket COUNTS collected to the driver (<= ``num_buckets``
   rows — bounded, the same contract as the ANN stack's
   centroid collects) and folded into exclusive prefix offsets
   embedded as a LITERAL map.

global rank = local rank + offsets[bucket]. Embedding the offsets as
literals keeps the main plan LINEAR — one pass over the input, no
self-join branches — where an in-plan offsets computation clones the
whole upstream subtree per branch (column pruning defeats
ReusedExchange), which showed up as 10 source scans in the first r14
cut of rfm_segments. The bucketed frame is frozen with a lazy
``localCheckpoint`` before the counts collect, so the counts job and
the consumer query read ONE materialization: cross-job bucket
agreement holds by construction — RangePartitioner's boundary sample
depends on row order within upstream partitions, which a cluster
shuffle does not reproduce across independent executions (executor
loss fails the job loudly instead of recomputing, the standard
localCheckpoint trade). Agreement with the window form is pinned in
tests/test_pipeline_ops.py.

Exact and deterministic whenever ``order_cols`` is a TOTAL order
(callers append a tiebreak key, exactly as they would for the window
form).

The reference has no ranking surface (pandas ``sort_index`` is its
only global order, reference:pandabase/companda.py:89-91); this backs
the engine's rfm quartiles and companda's positional mode.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_BKT = "__pbrk_bkt"
_LRN = "__pbrk_lrn"


def _ranked(
    df: DataFrame, order_cols: "Sequence[str]", num_buckets: int
) -> "tuple[DataFrame, list[int], int]":
    """``df`` + ``_BKT``/``_LRN`` columns (bucket id, 1-based local
    rank) plus (exclusive prefix offsets per bucket, total rows).
    One bounded driver collect (<= num_buckets rows); the returned
    frame reads the checkpointed bucketing (one linear pass over the
    input, materialized once)."""
    from pyspark.sql.window import Window

    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive: {num_buckets}")
    cols = [F.col(c) for c in order_cols]
    parts = df.repartitionByRange(int(num_buckets), *cols).withColumn(
        _BKT, F.spark_partition_id()
    )
    # freeze ONE materialization of the bucketed frame: the counts
    # job below and the caller's main query must see the SAME bucket
    # assignment, and RangePartitioner's boundary sample depends on
    # row order within upstream partitions — nondeterministic after a
    # shuffle on a real cluster, so two independent executions could
    # bucket differently and corrupt the offsets (r14 review
    # finding). The lazy local checkpoint materializes on the counts
    # collect and the main plan reads those blocks; it also saves the
    # second computation of everything upstream.
    parts = parts.localCheckpoint(eager=False)
    counts = {
        r[_BKT]: r["cnt"]
        for r in parts.groupBy(_BKT)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets = [0] * int(num_buckets)
    running = 0
    for b in range(int(num_buckets)):
        offsets[b] = running
        running += int(counts.get(b, 0))
    w = Window.partitionBy(_BKT).orderBy(*cols)
    local = parts.withColumn(_LRN, F.row_number().over(w))
    return local, offsets, running


def _offset_col(offsets: "list[int]"):
    """Literal bucket -> exclusive-prefix-offset lookup (an array
    literal indexed by bucket id — pure codegen, no join)."""
    return F.element_at(
        F.array(*[F.lit(int(o)) for o in offsets]), F.col(_BKT) + 1
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
    local, offsets, _n = _ranked(df, order_cols, num_buckets)
    return local.withColumn(
        out_col, (F.col(_LRN) + _offset_col(offsets)).cast("long")
    ).drop(_BKT, _LRN)


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
    to the window form on a total order, minus the single-task sort.
    The tile thresholds are Python-literal arithmetic (N is known
    from the bounded totals collect), so the whole assignment stays
    inside whole-stage codegen."""
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    local, offsets, total = _ranked(df, order_cols, num_buckets)
    q, r = divmod(int(total), int(n))
    k0 = (F.col(_LRN) + _offset_col(offsets) - 1).cast("long")
    fat = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    if q == 0:
        # fewer rows than tiles: every row is its own tile
        tile = k0 + 1
    else:
        tile = F.when(
            k0 < fat, (k0 - (k0 % (q + 1))) / (q + 1) + 1
        ).otherwise(
            r + ((k0 - fat) - ((k0 - fat) % q)) / q + 1
        )
    return local.withColumn(out_col, tile.cast("int")).drop(_BKT, _LRN)
