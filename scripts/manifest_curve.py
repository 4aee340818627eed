#!/usr/bin/env python
"""Measure manifest size vs leaf count (the 100 TB metadata question).

Skipping metadata (per-(segment,bucket) min/max stats + bloom sidecars
+ per-segment sketches) grows with the LEAF count, not the table size.
This script builds tables at increasing leaf counts (segments x
buckets), records the committed manifest's on-disk bytes, the sidecar's
bytes once the SKIP_INLINE_MAX offload engages, and prints the curve —
the evidence behind the `manifest_bytes_per_leaf` bench fact and the
SURVEY.md §8 scaling note.

Usage: python scripts/manifest_curve.py [leaves ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandabase_spark import io as pio  # noqa: E402
from pandabase_spark.io import KeyedCatalog  # noqa: E402
from pandabase_spark.session import get_spark  # noqa: E402


def main() -> None:
    targets = [int(a) for a in sys.argv[1:]] or [8, 64, 256, 1024]
    spark = get_spark()
    wh = tempfile.mkdtemp(prefix="pb_manifest_curve_")
    cat = KeyedCatalog(spark, wh)
    print(f"{'leaves':>8} {'segments':>9} {'manifest_B':>11} "
          f"{'sidecar_B':>10} {'B_per_leaf':>10} {'offloaded':>9}")
    for nb in targets:
        # leaf count scales with the bucket count: ONE commit per
        # target (each commit pays stats+bloom+sketch jobs, so
        # segment-count scaling would take minutes for no extra
        # information — per-leaf entry size is what's being measured)
        name = f"curve_{nb}"
        if cat.has_table(name):
            cat.drop_table(name)
        df = spark.range(4 * nb).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("v"),
            F.concat(F.lit("u"), F.col("id")).alias("tag"),
        )
        cat.to_table(
            df, name, keys=["k"], num_buckets=nb,
            stats_columns=["v"], bloom_columns=["tag"],
            sketch_columns=["v"],
        )
        man = cat._manifest(name)
        leaves = len(cat._live_paths(name))
        man_b = len(json.dumps(man))
        side_b = 0
        if man.get("skip"):
            side_b = len(
                cat.fs.read_text(
                    f"{cat._path(name)}/{pio.LOG_DIR}/{man['skip']}"
                )
            )
        total = man_b + side_b
        print(f"{leaves:>8} {len(man['segments']):>9} {man_b:>11} "
              f"{side_b:>10} {total / max(leaves, 1):>10.1f} "
              f"{str(bool(man.get('skip'))):>9}")
        cat.drop_table(name)


if __name__ == "__main__":
    main()
