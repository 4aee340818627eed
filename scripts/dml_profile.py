#!/usr/bin/env python
"""Per-op Spark JOB COUNT + wall for the keyed-table maintenance/DML
path — the noise-immune facts behind bench.py's wall-clock entries
(job counts are deterministic for a fixed code path + data; wall time
on this shared VM varies 2-5x).

Replicates bench.py's b_lineitem preamble (create, append, upsert,
4-fragment appends), then times compact / point delete / point update
with each op in its own Spark job group so the tracker attributes jobs
exactly. Usage:

    python scripts/dml_profile.py [sf_dir]    # default sf0.01
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
    from pyspark.sql import functions as F

    spark = get_spark("dml_profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    li = workload._li_unique(spark, sf_dir).cache()
    li_rows = li.count()
    cat = workload._catalog(spark, sf_dir)
    if cat.has_table("b_lineitem"):
        cat.drop_table("b_lineitem")

    facts: dict[str, dict] = {}

    def run(name: str, fn) -> None:
        group = f"dmlprof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        facts[name] = {"sec": round(dt, 3), "n_jobs": len(jobs)}

    run("kt_create", lambda: cat.to_table(
        li, "b_lineitem", keys=workload.LI_KEYS))
    patch = li.limit(li_rows // 10).withColumn(
        "l_orderkey", F.col("l_orderkey") + 100_000_000)
    run("kt_append", lambda: cat.to_table(
        patch, "b_lineitem", keys=workload.LI_KEYS, how="append"))
    up = li.limit(li_rows // 10).withColumn(
        "l_quantity", F.col("l_quantity") + 1.0)
    run("kt_upsert", lambda: cat.to_table(
        up, "b_lineitem", keys=workload.LI_KEYS, how="upsert"))
    for i in range(4):
        frag = li.where(F.col("l_orderkey") <= 1500).withColumn(
            "l_orderkey", F.col("l_orderkey") + (200 + i) * 1_000_000)
        cat.to_table(frag, "b_lineitem", keys=workload.LI_KEYS,
                     how="append")
    run("kt_compact", lambda: cat.compact("b_lineitem"))
    run("kt_delete_point", lambda: cat.delete_rows(
        "b_lineitem", "l_orderkey = 1042"))
    run("kt_update_point", lambda: cat.update_rows(
        "b_lineitem", "l_orderkey = 2042",
        {"l_quantity": "l_quantity + 1.0"}))
    # full-key equality: the arithmetic-bucket fast-path shape
    row = cat.read_table("b_lineitem").where("l_orderkey = 3001").select(
        *workload.LI_KEYS).limit(1).collect()
    if row:
        r = row[0]
        pred = " AND ".join(
            f"{k} = {r[k]}" for k in workload.LI_KEYS)
        run("kt_delete_fullkey", lambda: cat.delete_rows(
            "b_lineitem", pred))

    print(json.dumps({"sf_dir": sf_dir, "rows": li_rows, "ops": facts},
                     indent=1))


if __name__ == "__main__":
    main()
