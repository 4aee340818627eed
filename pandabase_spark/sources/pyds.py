"""Spark 4 Python Data Source API: a deterministic synthetic source.

PySpark 4 lets a pure-Python class plug into ``spark.read.format(...)``
as a first-class batch source with its own partition planning
(SPARK-44076). This module registers ``pb_synth`` — a deterministic
synthetic-events generator — to exercise that seam end to end:
schema declaration, option handling, split planning
(``partitions()``), and per-partition iteration on executors.

Determinism contract (the same discipline as the sampling family):
row ``i`` derives every field from ``md5(str(i))``, so any engine can
replay the stream bit-for-bit — the DuckDB oracle regenerates it from
``range(n)`` with the same md5 arithmetic. Python-row generation is
the SLOW path by construction (the API ships rows through Python);
the source exists to prove the integration seam, not to compete with
the JVM scan path — production data flows through the parquet/ORC/
JSONL/binaryFile readers.

At scale the split planning is the part that matters: ``parts``
becomes genuine executor parallelism (one ``InputPartition`` each,
ranges non-overlapping), so a custom Python source still scans
corpus-wide instead of single-threaded.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql import types as T


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, n: int, parts: int):
        self._n = n
        self._parts = parts

    def partitions(self):
        n, parts = self._n, self._parts
        if n <= 0:
            # Spark substitutes [None] for an empty partition list and
            # read(None) would crash — one empty range yields no rows
            return [_RangePartition(0, 0)]
        step = max(1, (n + parts - 1) // parts)
        return [
            _RangePartition(lo, min(lo + step, n))
            for lo in range(0, n, step)
        ]

    def read(self, partition: _RangePartition):
        kinds = ("view", "click", "purchase")
        for i in range(partition.start, partition.end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            yield (
                i,
                kinds[int(h[:8], 16) % 3],
                float(int(h[8:16], 16) % 10000) / 100.0,
            )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("pb_synth").option("n", ...).option(
    "parts", ...)`` — deterministic (event_id, kind, amount) rows."""

    @classmethod
    def name(cls) -> str:
        return "pb_synth"

    def schema(self):
        return T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("kind", T.StringType(), False),
                T.StructField("amount", T.DoubleType(), False),
            ]
        )

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(
            int(self.options.get("n", 1000)),
            int(self.options.get("parts", 4)),
        )


def register(spark) -> None:
    """Idempotent registration of the ``pb_synth`` format."""
    spark.dataSource.register(SyntheticEventsDataSource)
