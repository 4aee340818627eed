#!/usr/bin/env python
"""Phase-level Spark job attribution for the kt write paths (r14).

Monkeypatches job groups around each internal phase of
create/append/upsert so the status tracker attributes every job to the
phase that ran it. Usage:

    python scripts/write_jobtrace_r14.py [sf_dir]   # default sf0.01
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pandabase_spark.session import get_spark
    from pandabase_spark import workload
    from pandabase_spark import io as kio
    from pyspark.sql import functions as F

    spark = get_spark("write_jobtrace_r14")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    phase_jobs: dict[str, list[int]] = {}
    stack: list[str] = []

    Cat = kio.KeyedCatalog if hasattr(kio, "KeyedCatalog") else None

    def wrap(cls, name):
        import inspect
        raw = inspect.getattr_static(cls, name)
        if isinstance(raw, (staticmethod, classmethod)):
            return
        orig = getattr(cls, name)

        def inner(self, *a, **kw):
            label = name
            stack.append(label)
            group = "phase-" + "/".join(stack)
            sc.setJobGroup(group, group)
            try:
                return orig(self, *a, **kw)
            finally:
                stack.pop()
                prev = "phase-" + "/".join(stack) if stack else None
                sc.setJobGroup(prev, prev)
                jids = sc.statusTracker().getJobIdsForGroup(group)
                phase_jobs.setdefault(group, [])
                for j in jids:
                    if j not in phase_jobs[group]:
                        phase_jobs[group].append(j)

        setattr(cls, name, inner)

    cat = workload._catalog(spark, sf_dir)
    cls = type(cat)
    for m in [
        "_manifest", "_batch_probe", "_write_segment", "_commit",
        "_maybe_auto_compact", "_create", "_append", "_upsert",
        "_normalize_input", "_read_raw", "_write_meta", "meta",
        "_check_constraints", "_resolve_nb",
    ]:
        if hasattr(cls, m):
            wrap(cls, m)

    li = workload._li_unique(spark, sf_dir).cache()
    li_rows = li.count()
    if cat.has_table("jt_lineitem"):
        cat.drop_table("jt_lineitem")

    results = {}

    def run(op, fn):
        phase_jobs.clear()
        before = sc.statusTracker().getJobIdsForGroup(None) or []
        t0 = time.time()
        fn()
        dt = time.time() - t0
        # total jobs this op: everything new since `before` across groups
        detail = {}
        for g, jids in phase_jobs.items():
            detail[g] = len(jids)
        results[op] = {"sec": round(dt, 2), "phases": detail}

    run("create", lambda: cat.to_table(li, "jt_lineitem", keys=workload.LI_KEYS))
    patch = li.limit(li_rows // 10).withColumn(
        "l_orderkey", F.col("l_orderkey") + 100_000_000)
    run("append", lambda: cat.to_table(
        patch, "jt_lineitem", keys=workload.LI_KEYS, how="append"))
    up = li.limit(li_rows // 10).withColumn(
        "l_quantity", F.col("l_quantity") + 1.0)
    run("upsert", lambda: cat.to_table(
        up, "jt_lineitem", keys=workload.LI_KEYS, how="upsert"))

    cat.drop_table("jt_lineitem")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
