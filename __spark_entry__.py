"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All definitions live in :mod:`pandabase_spark.workload`; this file only
adapts them to the driver's entry-point shape. Approximate operators
(MinHash-LSH, SimHash, LSH-ANN) intentionally have no oracle entry —
they get the rows-only check; their accuracy is asserted against exact
counterparts in tests/test_operators.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandabase_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-pipeline extension surface)."""
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted for the
    approximate operators → driver records a rows-only check)."""
    return dict(workload.ORACLE)
