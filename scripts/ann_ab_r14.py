#!/usr/bin/env python
"""A/B harness for the ANN index-build paths (r14 optimization).

Times write_ivfpq_index / write_ivf_index / ivf_centroids exactly as
bench.py invokes them (warm session, repeat with min), and records the
Spark job count per invocation so a structural change (fewer jobs)
is visible independent of host noise.

Usage: python scripts/ann_ab_r14.py [label] [sf_dir] [n_runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "ab"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pandabase_spark.session import get_spark
    from pandabase_spark import workload
    from pandabase_spark.operators.similarity import (
        ivf_centroids, write_ivf_index, write_ivfpq_index,
    )

    spark = get_spark("ann_ab_r14")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    emb = workload.load(spark, sf_dir, "embeddings")

    # warm the session: one throwaway build
    shutil.rmtree("/tmp/_ann_ab_warm", ignore_errors=True)
    write_ivfpq_index(
        emb, "/tmp/_ann_ab_warm", n_cells=16, m=8, n_codes=16,
        iters=2, sample_mod=2,
    )

    def jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None))

    out: dict = {"label": label, "sf_dir": sf_dir, "n_runs": n_runs}

    def ab(name, fn):
        walls, jcounts = [], []
        for i in range(n_runs):
            path = f"/tmp/_ann_ab_{name}_{i}"
            shutil.rmtree(path, ignore_errors=True)
            sc.setJobGroup(f"{name}:{i}", name)
            t0 = time.time()
            fn(path)
            walls.append(round(time.time() - t0, 3))
            jcounts.append(
                len(sc.statusTracker().getJobIdsForGroup(f"{name}:{i}"))
            )
            sc.setJobGroup(None, None)
        out[name] = {"min": min(walls), "walls": walls, "jobs": jcounts}

    ab("ivfpq_index_write", lambda p: write_ivfpq_index(
        emb, p, n_cells=16, m=8, n_codes=16, iters=2, sample_mod=2))
    ab("ann_index_write", lambda p: write_ivf_index(
        emb, p, n_cells=16, iters=6, tol=0.4, sample_mod=2))
    ab("ann_ivf_index_build", lambda p: ivf_centroids(
        emb, n_cells=16, iters=2, sample_mod=2))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
