#!/usr/bin/env python
"""Phase-level job attribution for the delta_export bench entry (r14).

Usage: python scripts/delta_jobtrace_r14.py [sf_dir]   # default sf0.01
"""

from __future__ import annotations

import inspect
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pandabase_spark.session import get_spark
    from pandabase_spark import workload
    from pandabase_spark.sources import delta_writer as dw
    from pyspark.sql import functions as F

    spark = get_spark("delta_jobtrace_r14")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    phase_jobs: dict[str, int] = {}
    phase_sec: dict[str, float] = {}
    stack: list[str] = []

    def wrap(mod, name):
        raw = inspect.getattr_static(mod, name)
        if not callable(raw):
            return
        orig = getattr(mod, name)

        def inner(*a, **kw):
            stack.append(name)
            group = "/".join(stack)
            sc.setJobGroup(group, group)
            t0 = time.time()
            try:
                return orig(*a, **kw)
            finally:
                dt = time.time() - t0
                stack.pop()
                prev = "/".join(stack) if stack else None
                sc.setJobGroup(prev, prev)
                jids = sc.statusTracker().getJobIdsForGroup(group)
                phase_jobs[group] = len(jids)
                phase_sec[group] = phase_sec.get(group, 0.0) + dt

        setattr(mod, name, inner)

    for fn in [
        "_stage_data_files", "_collect_staged_stats", "_commit_with_retry",
        "delta_create", "delta_append", "delta_checkpoint", "_latest_version",
        "_claim", "_check_writer_protocol", "_align_frame",
    ]:
        if hasattr(dw, fn):
            wrap(dw, fn)

    orders_df = workload.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    cat = workload._catalog(spark, sf_dir)
    dl_path = cat._path("jt_delta_orders")
    if cat.fs.exists(dl_path):
        cat.fs.delete(dl_path)

    t0 = time.time()
    dw.delta_create(orders_df, dl_path, partition_by=["o_orderpriority"])
    for i in range(4):
        dw.delta_append(
            orders_df.where(F.col("o_orderkey") % 4 == i).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            ),
            dl_path,
        )
    dw.delta_checkpoint(spark, dl_path)
    dw.delta_append(
        orders_df.limit(1000).withColumn(
            "o_orderkey", F.col("o_orderkey") + 50_000_000
        ),
        dl_path,
    )
    total = time.time() - t0
    cat.fs.delete(dl_path)
    out = {
        g: {"n_jobs": phase_jobs[g], "sec": round(phase_sec[g], 2)}
        for g in sorted(phase_jobs)
    }
    print(json.dumps({"total_sec": round(total, 2), "phases": out}, indent=1))


if __name__ == "__main__":
    main()
