#!/usr/bin/env python
"""Dump .explain('formatted') for the round-14-touched queries into
plans/r14/<query>_<tag>.txt.

Usage: python scripts/dump_r14_plans.py <tag> <out_dir> [sf_dir] [q ...]

Run from the repo root whose code should be dumped (the r14 worktree
for 'before', the live tree for 'after'). Write-path entries have no
single DataFrame to explain; their evidence is the job/stage facts in
BENCH_DETAIL.json (dml_facts / query_facts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

DEFAULT_QUERIES = [
    # shingle consumers (r14 _shingle_rows rewrite)
    "minhash_lsh_neardup",
    "fuzzy_match_pairs",
    "contamination_report",
    "repetition_signals",
    "training_corpus_manifest_v2",
    "corpus_quality_funnel",
    "tfidf_top_terms",
    # localframe consumers (r14 Arrow local frames)
    "delta_scan_replay",
    "bpe_train_merges",
]


def main() -> None:
    tag = sys.argv[1]
    out_dir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:] or DEFAULT_QUERIES

    import io as _io
    from contextlib import redirect_stdout

    import __spark_entry__ as e

    qs = e.queries()
    spark = None
    from pandabase_spark.session import get_spark

    spark = get_spark("dump_r14_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in roster")
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = _io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR building {name}: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_exch = txt.count("Exchange")
        n_win = txt.count("Window")
        n_py = txt.count("BatchEvalPython") + txt.count("ArrowEvalPython")
        n_rdd = txt.count("Scan ExistingRDD")
        print(
            f"{name}_{tag}: exchanges={n_exch} windows={n_win} "
            f"python_nodes={n_py} rdd_scans={n_rdd}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
