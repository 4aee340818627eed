#!/usr/bin/env python
"""Subprocess worker for the multi-process OCC stress test
(tests/test_storage_v2.py::test_occ_two_driver_race).

Each invocation is an INDEPENDENT Spark driver (its own JVM, its own
KeyedCatalog object) committing to a shared warehouse — the actual
100 TB contention mode the in-process hook tests can't exercise (real
filesystem visibility, no shared Python state). Ops retry on
ConcurrentWriteError with a bounded backoff, Delta-style.

Usage: occ_worker.py <warehouse> <table> <worker_id> <n_ops>
Prints one JSON line: {"worker": id, "applied": [...], "conflicts": n}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    warehouse, table, wid, n_ops = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"occ-worker-{wid}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pandabase_spark.io import ConcurrentWriteError, KeyedCatalog

    cat = KeyedCatalog(spark, warehouse, default_buckets=4)
    applied: list[str] = []
    conflicts = 0

    for i in range(n_ops):
        # disjoint key ranges per worker: model-checkable afterwards
        base = 100_000 * wid + 100 * i
        batch = spark.range(base, base + 50).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0 + wid).alias("v"),
        )
        op = ("append", "upsert", "delete", "compact")[i % 4]
        for attempt in range(30):
            try:
                if op == "append":
                    cat.to_table(batch, table, keys=["k"], how="append")
                elif op == "upsert":
                    cat.to_table(batch, table, keys=["k"], how="upsert")
                elif op == "delete":
                    # delete a slice of THIS worker's own earlier keys
                    cat.delete_rows(
                        table,
                        f"k >= {100_000 * wid} AND k < {100_000 * wid + 10}",
                    )
                else:
                    # vacuum=False: immediate segment reclaim under a
                    # concurrent reader is outside the retention
                    # contract (Delta needs a retention window too)
                    cat.compact(table, vacuum=False)
                applied.append(f"{op}:{base}")
                break
            except ConcurrentWriteError:
                conflicts += 1
                time.sleep(0.05 * (attempt + 1))
        else:
            print(json.dumps({"worker": wid, "error": f"gave up on {op}"}))
            sys.exit(2)

    print(json.dumps(
        {"worker": wid, "applied": applied, "conflicts": conflicts}
    ))


if __name__ == "__main__":
    main()
