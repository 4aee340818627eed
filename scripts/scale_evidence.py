#!/usr/bin/env python
"""Scale-up evidence for the heavy operators (the r8 judge's #5).

The driver's testdata tops out at sf0.1 (documents: 5k rows,
embeddings: 2k). This script synthesizes a corpus N_SCALE x larger —
JVM-side generation only (hash-derived words/vectors, zero Python in
the generator plan), written as documents.parquet / embeddings.parquet
into a scratch dir whose other tables symlink to sf0.1 — then runs the
heavy document/embedding operators at BOTH scales and records:

  - wall seconds at 1x and Nx, and the ratio (linear-ish = scale-safe;
    the LSH/inverted-index/IVF designs bound candidates, so a
    super-linear blowup here would falsify the 100 TB story),
  - JVM driver heap in use after each op (collect()-shaped driver
    materialization would grow with the input; these operators must
    not),
  - result row counts (sanity: the Nx corpus has planted near-dup
    structure, so dedup finds proportional work).

~5% of synthetic docs share a text seed with a neighbor (near-dup
pairs for dedup/LSH to find); embeddings derive from hash bits.

r10 adds the keyed-table WRITE path (create + adaptive upsert): the
round changed the upsert merge shape, so the scale claim needs the
same 1x-vs-Nx wall + heap evidence as the read-side operators.

r11 adds the TPC-H analytic headliners (q1/q5/q9/q21) at Nx LINEITEM
+ ORDERS (facts replicated with shifted orderkeys, multi-row-group
layout; dimension tables stay 1x — facts scale, dims don't, which is
exactly the regime where the broadcast-dim plans must hold): the join
plans' scale story measured, not argued from plan shape.

Usage: python scripts/scale_evidence.py [scale] [sf_dir]
Writes scripts/scale_evidence_r12.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
WORDS = [
    "the", "of", "and", "to", "in", "is", "for", "on", "with", "as",
    "data", "model", "train", "learn", "spark", "query", "table",
    "join", "scan", "shuffle", "file", "byte", "text", "word", "line",
    "code", "test", "time", "year", "people", "world", "system",
    "value", "state", "result", "report", "market", "price", "trade",
    "river", "mountain", "city", "music", "light", "energy", "field",
]


def main() -> None:
    from pandabase_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("scale_evidence")
    spark.sparkContext.setLogLevel("ERROR")

    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs = base_docs.count() * N_SCALE
    n_emb = base_emb.count() * N_SCALE

    scratch = f"/tmp/pb_scale_{os.getpid()}"
    os.makedirs(scratch, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = f"{scratch}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{t}.parquet", dst)

    words_arr = (
        "array(" + ",".join(f"'{w}'" for w in WORDS) + ")"
    )
    # ~5% of docs share a text seed with doc_id-7 => planted near-dups
    seed = (
        "CASE WHEN id % 20 = 0 AND id >= 7 THEN id - 7 ELSE id END"
    )
    text_expr = (
        "array_join(transform(sequence(1, 50 + pmod(xxhash64({s}), 200)),"
        f" i -> element_at({words_arr},"
        " cast(pmod(xxhash64({s}, i), " + str(len(WORDS)) + ") + 1 as int))), ' ')"
    ).format(s=seed)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(text_expr).alias("text"),
        F.expr(
            "element_at(array('en','en','en','de','fr','es','other'),"
            " cast(pmod(xxhash64(id, 'lang'), 7) + 1 as int))"
        ).alias("lang"),
        F.expr(
            "element_at(array('web','book','code'),"
            " cast(pmod(xxhash64(id, 'src'), 3) + 1 as int))"
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{scratch}/documents.parquet"
    )
    emb = spark.range(n_emb).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> cast(pmod(xxhash64(id, i),"
            " 2000) / 1000.0 - 1.0 as float))"
        ).alias("embedding"),
        F.expr("cast(pmod(xxhash64(id, 'lb'), 10) as int)").alias("label"),
    )
    emb.repartition(16).write.mode("overwrite").parquet(
        f"{scratch}/embeddings.parquet"
    )

    # Nx FACT tables for the TPC-H headliners: lineitem and orders
    # replicated with disjoint shifted orderkeys (every replica keeps
    # the join keys consistent between the two facts), written
    # repartition(32) => multi-row-group multi-file layout at Nx.
    # Dimensions are NOT scaled: at 100 TB facts grow, dims don't.
    rep = F.explode(F.expr(f"sequence(0, {N_SCALE - 1})")).alias("rep")
    base_li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    base_ord = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    shift = (F.col("rep").cast("long") * 100_000_000)
    (
        base_li.select("*", rep)
        .withColumn("l_orderkey", F.col("l_orderkey") + shift)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{scratch}/lineitem_nx.parquet")
    )
    (
        base_ord.select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + shift)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{scratch}/orders_nx.parquet")
    )
    # analytic runs read from a second scratch whose facts are the Nx
    # versions and whose dims symlink to sf0.1
    scratch_tpch = f"{scratch}/tpch_nx"
    os.makedirs(scratch_tpch, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "events"):
        dst = f"{scratch_tpch}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{t}.parquet", dst)
    for t, src in (("lineitem", "lineitem_nx"), ("orders", "orders_nx")):
        dst = f"{scratch_tpch}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{scratch}/{src}.parquet", dst)

    def jvm_heap_mb() -> int:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        return int((rt.totalMemory() - rt.freeMemory()) / (1 << 20))

    from pandabase_spark import workload
    from pandabase_spark.operators.dedup import (
        dedup_by_content_hash, minhash_lsh_pairs,
    )
    from pandabase_spark.operators.similarity import (
        ann_topk_indexed, ann_topk_ivfpq_indexed, append_ivf_index,
        append_ivfpq_index, write_ivf_index, write_ivfpq_index,
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def ops_for(sf_dir: str, tag: str) -> "dict[str, dict]":
        d = workload.load(spark, sf_dir, "documents")
        e = workload.load(spark, sf_dir, "embeddings")
        idx = f"{scratch}/_ivf_{tag}"
        out: dict[str, dict] = {}

        def run(name, fn):
            t0 = time.time()
            n = fn()
            out[name] = {
                "sec": round(time.time() - t0, 2),
                "rows": n,
                "jvm_heap_mb": jvm_heap_mb(),
            }

        run("exact_dedup_groups", lambda: dedup_by_content_hash(
            d, "text", "doc_id", hash="xxhash64").count())
        run("minhash_lsh_pairs", lambda: minhash_lsh_pairs(
            d, "doc_id", "text", threshold=0.7).count())
        run("span_dedup_reconstruct", lambda: (
            force(workload.QUERIES["span_dedup_reconstruct"](spark, sf_dir)),
            0,
        )[1])
        run("training_corpus_manifest_v2", lambda: (
            force(workload.QUERIES["training_corpus_manifest_v2"](
                spark, sf_dir)),
            0,
        )[1])
        run("ann_index_build", lambda: (
            write_ivf_index(e, idx, n_cells=16, iters=2, sample_mod=2),
            0,
        )[1])
        run("ann_topk_indexed", lambda: ann_topk_indexed(
            spark, idx, e.where("vec_id < 8"), k=10, nprobe=4).count())
        # r11: incremental index append — per-batch cost must track
        # the BATCH (a fixed 10% slice here), not the corpus
        batch = e.where("vec_id % 10 = 0").withColumn(
            "vec_id", F.col("vec_id") + 10_000_000
        )
        run("ann_index_append_10pct", lambda: (
            append_ivf_index(batch, idx), 0,
        )[1])
        # r11: BPE application (Catalyst-only tokenize over the corpus)
        run("bpe_apply_fixed", lambda: (
            force(workload.QUERIES["bpe_apply_fixed"](spark, sf_dir)), 0,
        )[1])
        # r12: the persisted IVFADC artifact — build (ingest-time
        # encode + cell-partitioned codes), probe (pruned cells, ADC
        # over stored codes: the 100 TB query shape whose index IO is
        # ~nprobe/n_cells of the COMPRESSED corpus), and O(batch)
        # frozen-artifact append
        pq_idx = f"{scratch}/_ivfpq_{tag}"
        run("ivfpq_index_build", lambda: (
            write_ivfpq_index(
                e, pq_idx, n_cells=16, m=8, n_codes=16, iters=2,
                sample_mod=2,
            ),
            0,
        )[1])
        run("ann_topk_ivfpq_indexed", lambda: ann_topk_ivfpq_indexed(
            spark, pq_idx, e.where("vec_id < 8"), k=10, nprobe=4).count())
        pq_batch = e.where("vec_id % 10 = 1").withColumn(
            "vec_id", F.col("vec_id") + 20_000_000
        )
        run("ivfpq_index_append_10pct", lambda: (
            append_ivfpq_index(pq_batch, pq_idx, txn=("se", 0)), 0,
        )[1])
        return out

    def writes_for(n_rows: int, tag: str) -> "dict[str, dict]":
        """Keyed-table write path at scale: create n_rows, then the
        adaptive upsert over a deterministic 10% key slice (full
        column — at 1x the batch key frame broadcasts; at Nx the
        dispatch re-decides from the probe count, which is the point:
        the shape must follow the data, not the test size)."""
        from pandabase_spark.io import KeyedCatalog

        out: dict[str, dict] = {}
        cat = KeyedCatalog(spark, f"{scratch}/wh_{tag}")
        base = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") * 0.5).alias("v"),
            F.concat(F.lit("s-"), F.col("id")).alias("s"),
        )

        def run(name, fn):
            t0 = time.time()
            fn()
            out[name] = {
                "sec": round(time.time() - t0, 2),
                "rows": n_rows,
                "jvm_heap_mb": jvm_heap_mb(),
            }

        run("kt_create", lambda: cat.to_table(base, "t", keys=["k"]))
        batch = base.where(F.pmod(F.xxhash64("k"), F.lit(10)) == 0)
        batch = batch.withColumn("v", F.col("v") + 1.0)
        run("kt_upsert_10pct", lambda: cat.to_table(
            batch, "t", keys=["k"], how="upsert"))
        return out

    def analytics_for(sf_dir: str) -> "dict[str, dict]":
        """The TPC-H headline shapes over the given table dir: q1
        (scan+agg), q5 (6-table broadcast-dim star join), q9
        (part-filtered profit join), q21 (semi/anti self-joins on the
        fact). Min-of-2 wall (same rationale as bench.py) + heap."""
        out: dict[str, dict] = {}
        for name in ("q1_pricing_summary", "q5_nation_revenue",
                     "q9_product_profit", "q21_waiting_suppliers"):
            best, rows = None, 0
            for _ in range(2):
                t0 = time.time()
                df = workload.QUERIES[name](spark, sf_dir)
                force(df)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rows = workload.QUERIES[name](spark, sf_dir).count()
            out[name] = {
                "sec": round(best, 2),
                "rows": rows,
                "jvm_heap_mb": jvm_heap_mb(),
            }
        return out

    report = {
        "scale": N_SCALE,
        "docs_rows": {"1x": n_docs // N_SCALE, "Nx": n_docs},
        "emb_rows": {"1x": n_emb // N_SCALE, "Nx": n_emb},
        "at_1x": ops_for(SF_DIR, "1x"),
        "at_Nx": ops_for(scratch, "nx"),
    }
    report["at_1x"].update(writes_for(500_000, "1x"))
    report["at_Nx"].update(writes_for(500_000 * N_SCALE, "nx"))
    report["at_1x"].update(analytics_for(SF_DIR))
    report["at_Nx"].update(analytics_for(scratch_tpch))
    for name, rec in report["at_Nx"].items():
        base = report["at_1x"][name]["sec"]
        rec["ratio_vs_1x"] = round(rec["sec"] / max(base, 0.01), 1)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "scale_evidence_r12.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
