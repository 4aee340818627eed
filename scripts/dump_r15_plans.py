#!/usr/bin/env python
"""Dump the r15-touched plans to plans/r15/<name>_<tag>.txt.

Covers:
- kt_merge_clauses / kt_merge_by_source / kt_upsert_fullouter: the
  STAGED segment-write plan (captured by wrapping _write_segment) —
  the co-partitioned bucket-join restructure's evidence;
- minhash_lsh_neardup: the declared query plan (NULL-token filter);
- delta_stats_agg: the per-file stats aggregation plan (post-agg
  path decode).

Usage: python scripts/dump_r15_plans.py <tag> [sf_dir]
(tag = "before" on the pre-change commit, "after" on HEAD)
"""

from __future__ import annotations

import contextlib
import os
import sys
from io import StringIO

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(df) -> str:
    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)

    from pandabase_spark.session import get_spark
    from pandabase_spark import workload
    from pyspark.sql import functions as F

    spark = get_spark("dump_r15_plans")
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: str, text: str) -> None:
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as fh:
            fh.write(text)
        print("wrote", p)

    # ---- staged write plans for the DML merge paths ----
    li = workload._li_unique(spark, sf_dir).cache()
    n = li.count()
    cat = workload._catalog(spark, sf_dir)
    for t in ("r15_plans_li",):
        if cat.has_table(t):
            cat.drop_table(t)
    cat.to_table(li, "r15_plans_li", keys=workload.LI_KEYS)

    captured: dict = {}
    orig = type(cat)._write_segment

    def spy(self, sdf, table_name, m, pre_bucketed=False):
        # reproduce exactly what _write_segment executes: when the
        # caller did not pre-bucket, the write itself attaches the
        # bucket column and repartitions on it — that exchange is part
        # of the op's real plan and must appear in the dump
        from pandabase_spark.io import PART_DIR, _bucket_expr

        staged = (
            sdf
            if pre_bucketed
            else sdf.withColumn(
                PART_DIR, _bucket_expr(m.keys, m.num_buckets)
            ).repartition(PART_DIR)
        )
        captured["plan"] = fmt(staged)
        captured["pre_bucketed"] = pre_bucketed
        return orig(self, sdf, table_name, m, pre_bucketed)

    type(cat)._write_segment = spy
    try:
        m_upd = li.limit(n // 10).select(
            *workload.LI_KEYS,
            (F.col("l_quantity") + 2.0).alias("l_quantity"),
            (F.col("l_orderkey") % 97 == 0).alias("drop_it"),
        )
        m_ins = li.limit(n // 20).withColumn(
            "l_orderkey", F.col("l_orderkey") + 300_000_000
        ).withColumn("drop_it", F.lit(False))
        m_src = m_upd.unionByName(m_ins, allowMissingColumns=True)
        cat.merge_table(
            m_src, "r15_plans_li",
            when_matched_update={"l_quantity": "s.l_quantity"},
            when_matched_delete="s.drop_it",
            when_not_matched_insert=True,
        )
        dump(
            "kt_merge_clauses_staged_write",
            f"pre_bucketed={captured['pre_bucketed']}\n"
            + captured["plan"],
        )

        mbs = li.where(F.col("l_orderkey") <= 30_000).select(
            *workload.LI_KEYS,
            (F.col("l_quantity") + 3.0).alias("l_quantity"),
        )
        cat.merge_table(
            mbs, "r15_plans_li",
            when_matched_update={"l_quantity": "s.l_quantity"},
            when_not_matched_insert=False,
            when_not_matched_by_source_delete="t.l_orderkey >= 300000000",
        )
        dump(
            "kt_merge_by_source_staged_write",
            f"pre_bucketed={captured['pre_bucketed']}\n"
            + captured["plan"],
        )

        # partial-column batch forces the fullouter upsert shape
        up_part = li.limit(n // 10).select(
            *workload.LI_KEYS,
            (F.col("l_quantity") + 1.0).alias("l_quantity"),
        )
        cat.to_table(
            up_part, "r15_plans_li", keys=workload.LI_KEYS, how="upsert"
        )
        dump(
            "kt_upsert_fullouter_staged_write",
            f"pre_bucketed={captured['pre_bucketed']}"
            f" shape={cat._last_upsert_shape}\n" + captured["plan"],
        )
    finally:
        type(cat)._write_segment = orig
        cat.drop_table("r15_plans_li")

    # ---- declared query plans touched this round ----
    dump(
        "minhash_lsh_neardup",
        fmt(workload.QUERIES["minhash_lsh_neardup"](spark, sf_dir)),
    )

    # ---- delta per-file stats aggregation ----
    import tempfile
    import shutil

    from pandabase_spark.sources import delta_writer as dw

    orders = workload.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    d = tempfile.mkdtemp()
    tbl = f"{d}/tbl"
    stats_plan: dict = {}
    orig_collect = dw._collect_staged_stats.__wrapped__ if hasattr(
        dw._collect_staged_stats, "__wrapped__"
    ) else dw._collect_staged_stats

    def stats_spy(df, table, sub, data_cols):
        from pandabase_spark.sources.delta_reader import _qualified_root
        from pyspark.sql.types import StructField, StructType

        # rebuild the exact frame the function aggregates, for explain
        sp = df.sparkSession
        cols = [(f_.name, f_.dataType) for f_ in data_cols]
        schema = StructType([StructField(nm, dt, True) for nm, dt in cols])
        frame = sp.read.schema(schema).parquet(f"{table}/{sub}")
        stats_plan.setdefault("scan", fmt(frame))
        return orig_collect(df, table, sub, data_cols)

    dw.delta_create(orders, tbl, partition_by=["o_orderpriority"])
    # dump the aggregation plan as the stats pass builds it: re-run the
    # helper over the staged dir and explain the same frame shape
    sub = [x for x in os.listdir(tbl) if x.startswith("c-")][0]
    from pandabase_spark.sources.delta_reader import _qualified_root
    from pyspark.sql.types import StructField, StructType

    data_cols = [
        f_ for f_ in orders.schema.fields if f_.name != "o_orderpriority"
    ]
    cols = [(f_.name, f_.dataType) for f_ in data_cols]
    schema = StructType([StructField(nm, dt, True) for nm, dt in cols])
    root_raw = _qualified_root(spark, tbl)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for nm, dt in cols:
        aggs.append(
            (F.count(F.lit(1)) - F.count(F.col(nm))).alias(f"__z_{nm}")
        )
        if dw._statable(dt):
            aggs.append(F.min(nm).alias(f"__mn_{nm}"))
            aggs.append(F.max(nm).alias(f"__mx_{nm}"))
    if tag == "before":
        frame = (
            spark.read.schema(schema).parquet(f"{tbl}/{sub}")
            .withColumn(
                "__rel",
                F.expr(
                    "substring(url_decode(_metadata.file_path), "
                    f"{len(root_raw) + 2})"
                ),
            )
            .groupBy("__rel")
            .agg(*aggs)
        )
    else:
        frame = (
            spark.read.schema(schema).parquet(f"{tbl}/{sub}")
            .groupBy(F.col("_metadata.file_path").alias("__fp"))
            .agg(*aggs)
            .withColumn(
                "__rel",
                F.expr(
                    f"substring(url_decode(__fp), {len(root_raw) + 2})"
                ),
            )
        )
    dump("delta_stats_agg", fmt(frame))
    shutil.rmtree(d)


if __name__ == "__main__":
    main()
