#!/usr/bin/env python
"""Time a list of declared queries through the noop sink, min-of-N.

Usage: python scripts/ab_time_r14.py <label> [sf_dir] [n_runs] [q ...]
Prints one JSON line {label, sf_dir, timings:{q: sec}}.
Run from the repo root whose code should be timed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

DEFAULT = [
    "minhash_lsh_neardup",
    "fuzzy_match_pairs",
    "contamination_report",
    "repetition_signals",
    "training_corpus_manifest_v2",
    "corpus_quality_funnel",
    "simhash_neardup",
    "neardup_canonical_keep",
]


def main() -> None:
    label = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    names = sys.argv[4:] or DEFAULT

    import __spark_entry__ as e
    from pandabase_spark.session import get_spark

    spark = get_spark("ab_time_r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    # warm the session (JIT, codegen cache) on an unrelated query
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        best = None
        for _ in range(n_runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    print(json.dumps({"label": label, "sf_dir": sf_dir, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
