#!/usr/bin/env python
"""BPE trainer scale evidence (r11 verdict watch-item #1 / ask #2).

The trainer's scale axis is N_MERGES, not corpus rows: each learned
merge adds one `_merge_fold` to the sequence expression, so without
lineage truncation iteration k re-evaluates all k prior folds —
O(merges²) work and unbounded Catalyst analysis depth, fine at the
gated n_merges=8, fatal at a production 32k vocab. The fix
(localCheckpoint every `checkpoint_every` merges) bounds both; this
script MEASURES it instead of arguing it:

  - trains a hash-derived rich-vocabulary corpus (the sf0.1 documents
    table exhausts its mergeable pairs at ~89 merges, so it cannot
    exercise 256) at n_merges in {32, 64, 128, 256} with the default
    window (16), recording wall seconds and per-merge cost — ~flat
    per-merge cost = linear total = scale-safe — plus the PREFIX
    property (a longer run's merges extend a shorter run's exactly);
  - A/Bs n_merges=64 with the cap (window 16) vs WITHOUT
    (checkpoint_every=10**9, the pre-r12 shape) — same merges out,
    diverging cost.

Usage: python scripts/bpe_trainer_scale.py [sf_dir]
Writes scripts/bpe_scale_r12.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from pandabase_spark.session import get_spark
    from pandabase_spark.operators.bpe import bpe_learn_merges

    spark = get_spark(app_name="bpe_trainer_scale")
    # the sf0.1 documents corpus draws from a ~100-word vocabulary and
    # EXHAUSTS its mergeable pairs after ~89 merges (measured; the
    # trainer's early-stop fires) — it cannot exercise a 256-merge
    # run. The curve therefore trains on a hash-derived corpus with a
    # rich hex-token vocabulary (JVM-only generation, deterministic):
    # ~15 tokens/doc of length 3-10 over a 16-char alphabet gives
    # adjacent-pair structure deep enough for thousands of merges,
    # while the word-frequency frame stays small enough that the
    # measured per-merge cost is the ITERATION shape (one aggregation
    # + bounded fold window), not corpus-size noise.
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(15)),
                lambda i: F.substring(
                    F.md5(F.concat_ws("_", F.col("id"), i)),
                    1,
                    F.pmod(F.hash(F.col("id"), i), F.lit(8)) + F.lit(3),
                ),
            ),
        ).alias("text"),
    )
    out: dict = {
        "corpus": "hash-derived hex tokens (see header comment)",
        "doc_rows": docs.count(),
        "sf01_note": "sf0.1 documents exhaust at 89 merges (min_count=1)",
    }

    # total-cost curve: per-merge cost must stay ~flat as merges grow
    # (the quadratic failure mode doubles sec_per_merge with n); the
    # runs also pin the PREFIX property — a longer training run's merge
    # list extends a shorter run's exactly (greedy determinism)
    curve = []
    prefix: "list[dict]" = []
    for n in (32, 64, 128, 256):
        t0 = time.time()
        merges = bpe_learn_merges(docs, n_merges=n, min_count=1)
        sec = round(time.time() - t0, 2)
        assert merges[: len(prefix)] == prefix, "prefix property broken"
        prefix = merges
        curve.append(
            {
                "n_merges": n,
                "learned": len(merges),
                "sec": sec,
                "sec_per_merge": round(sec / max(len(merges), 1), 4),
            }
        )
        print(f"n_merges={n}: {sec}s ({curve[-1]['sec_per_merge']}s/merge)")
    out["curve_window16"] = curve
    out["prefix_property_held"] = True

    # A/B: capped vs uncapped fold depth at n_merges=64, same answers
    t0 = time.time()
    capped = bpe_learn_merges(
        docs, n_merges=64, min_count=1, checkpoint_every=16
    )
    capped_sec = round(time.time() - t0, 2)
    t0 = time.time()
    uncapped = bpe_learn_merges(
        docs, n_merges=64, min_count=1, checkpoint_every=10**9
    )
    uncapped_sec = round(time.time() - t0, 2)
    assert capped == uncapped, "fold-depth cap changed the merges"
    out["ab_64_merges"] = {
        "capped_window16_sec": capped_sec,
        "uncapped_sec": uncapped_sec,
        "identical_merges": True,
    }

    path = os.path.join(os.path.dirname(__file__), "bpe_scale_r12.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
