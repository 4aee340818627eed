"""Driver-local DataFrames that stay out of Python at execution time.

``spark.createDataFrame(list_of_rows, schema)`` in classic PySpark
plans as a ``LogicalRDD`` over a *pickled Python RDD*: every action
that consumes the frame ships the rows through a Python worker again
(serialize → launch/attach worker → unpickle → re-serialize to the
JVM). Measured on the bench box: a noop write of a one-row list frame
costs ~5-7 s per action, where the identical frame built through
pandas + Arrow plans as a pure-JVM ``LocalRelation`` and costs ~0.05 s
(see OPTIMIZATION_r14.md, Finding 1). The Arrow path is also the right
100 TB shape (guide §4/§6): LocalRelations constant-fold, broadcast
without a Python stage, and never schedule Python workers for what is
driver-side metadata.

:func:`local_frame` is the drop-in replacement used everywhere the
engine materializes driver-held rows (index sidecars, Delta log
actions, probes, sketches, empty baselines). Values are preserved
exactly — Arrow carries IEEE doubles, bytes, decimals, timestamps and
nested rows bit-faithfully, and the explicit ``schema`` pins the types
(verified value- and schema-identical against the classic path in
tests/test_localframe.py).

Empty inputs take a JVM-only construction (``range(0)`` + typed null
casts): the Arrow path falls back to the pickled-RDD plan for 0-row
pandas inputs. The one observable difference: every field of an empty
frame comes back nullable — fine for every call site (joins, unions,
empty query results), none of which relies on a non-null flag of a
frame with no rows.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def _as_struct(schema: "T.StructType | str") -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T.StructType.fromDDL(schema)


def local_frame(
    spark: SparkSession,
    rows: "Sequence[tuple] | Iterable[tuple]",
    schema: "T.StructType | str",
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that plans as a JVM
    ``LocalRelation`` (Arrow transfer) instead of a Python-evaluated
    ``LogicalRDD``. ``rows`` are tuples (or Rows) in schema field
    order; ``schema`` is a StructType or DDL string and is applied
    verbatim. Falls back to the classic path if the Arrow conversion
    refuses the data (exotic nesting), so behavior is never worse."""
    struct = _as_struct(schema)
    rows = list(rows)
    if not rows:
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in struct.fields
            ]
        )
    try:
        import pandas as pd

        cols = list(zip(*rows))
        pdf = pd.DataFrame(
            {
                name: pd.Series(col, dtype=object)
                for name, col in zip(struct.fieldNames(), cols)
            }
        )
        # pandas collapses a dict of same-length Series by index; with
        # object dtype and positional construction the row order is
        # preserved. The explicit schema pins every column's Spark type.
        df = spark.createDataFrame(pdf, schema=struct)
    except Exception:
        return spark.createDataFrame(rows, struct)
    return df
