"""Z-order (Morton) multi-dimensional clustering — pure Catalyst.

Sorting a table by ONE column gives parquet min/max data skipping on
that column only; predicates on any other column still scan every
file. Interleaving the bits of two (or more) key columns into a
Morton key and range-clustering by IT bounds EVERY interleaved
dimension within each file — the Delta/Iceberg ``OPTIMIZE ZORDER BY``
technique, here as a plain column expression + ``repartitionByRange``
so the layout works on any parquet sink.

Everything is integer bit arithmetic (shift/and/or), so a z-value is
bit-identical across engines — the gate query oracle replays the same
expression in SQL. No UDFs, no sampling, no data-dependent state.

The reference has no physical-layout surface at all
(reference:pandabase/sql.py delegates layout to the backing SQL
engine); this module is part of the 100 TB extension build-out.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _widths(cols: Sequence, bits: int | Sequence[int]) -> list[int]:
    ws = [bits] * len(cols) if isinstance(bits, int) else list(bits)
    if len(ws) != len(cols):
        raise ValueError(f"{len(cols)} cols but {len(ws)} bit widths")
    if min(ws) < 1 or max(ws) * len(cols) > 62:
        raise ValueError(f"bit widths must fit a BIGINT: {ws}")
    return ws


def zvalue(
    cols: Sequence[str | Column], bits: int | Sequence[int] = 20
) -> Column:
    """Morton key over non-negative integer columns.

    ``bits`` is one width, or one per column — size each to its
    column's domain. Narrower columns are left-shifted up to the
    widest width before interleaving, so the TOP bits of the key
    alternate between every dimension regardless of domain size; a
    skinny dimension interleaved raw would sit entirely below a wide
    one and never influence coarse splits (clustering would silently
    degrade to a single-column sort). Values are masked to their
    width first: out-of-domain keys wrap onto the curve — coarser
    clustering, never wrong results.

    All shift/and/or on BIGINT — bit-identical across engines
    (:func:`zvalue_sql` replays it), codegen'd, no UDF.
    """
    if not cols:
        raise ValueError("zvalue needs at least one column")
    ws = _widths(cols, bits)
    w, n = max(ws), len(cols)
    parts = []
    for j, (c, wj) in enumerate(zip(cols, ws)):
        col = F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        norm = F.shiftleft(
            col.bitwiseAND(F.lit((1 << wj) - 1)), w - wj
        )
        for i in range(w):
            parts.append(
                F.shiftleft(
                    F.shiftright(norm, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zvalue")


def zvalue_sql(cols: Sequence[str], bits: int | Sequence[int] = 20) -> str:
    """The identical Morton expression as ANSI SQL (oracle twin)."""
    ws = _widths(cols, bits)
    w, n = max(ws), len(cols)
    parts = []
    for j, (c, wj) in enumerate(zip(cols, ws)):
        norm = f"((({c}) & {(1 << wj) - 1}) << {w - wj})"
        parts += [
            f"((({norm} >> {i}) & 1) << {i * n + j})" for i in range(w)
        ]
    return " | ".join(parts)


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int | Sequence[int] = 20,
    num_partitions: int = 32,
) -> DataFrame:
    """Range-partition + locally sort by the Morton key: each output
    partition (→ parquet file) covers one contiguous z-range, so its
    min/max footer stats are tight on EVERY clustered column and a
    predicate on any of them prunes files. One range exchange (sampled
    boundaries), local sorts only — no global sort, no skew pile-up
    (the curve spreads hot key prefixes across partitions)."""
    z = zvalue(cols, bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
