#!/usr/bin/env python
"""Round-14 optimization profiling: phase-level timing of the most
expensive bench entries (guide §1 — measure first, isolate with the
noop sink, label jobs). Prints a JSON dict of phase timings.

Usage: python scripts/profile_r14.py [target ...]   (default: ivfpq)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandabase_spark.session import get_spark
from pandabase_spark import workload
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

out: dict[str, float] = {}


def phase(name: str):
    class _P:
        def __enter__(self):
            spark.sparkContext.setJobDescription(name)
            self.t0 = time.time()
            return self

        def __exit__(self, *a):
            out[name] = round(time.time() - self.t0, 3)
            spark.sparkContext.setJobDescription(None)

    return _P()


def force(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark("profile_r14")
spark.sparkContext.setLogLevel("ERROR")


def prof_ivfpq():
    from pandabase_spark.operators.similarity import (
        ivf_centroids, ivf_assign, pq_codebooks, pq_encode,
        _centroids_literal_df,
    )

    emb = workload.load(spark, SF_DIR, "embeddings")
    path = "/tmp/_prof_ivfpq"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    with phase("ivfpq.total"):
        with phase("ivfpq.centroids"):
            cents = ivf_centroids(
                emb, n_cells=16, iters=2, sample_mod=2
            )
        with phase("ivfpq.codebooks"):
            staged = ivf_assign(emb, cents)
            books = pq_codebooks(
                staged, m=8, k=16, iters=2, sample_mod=2
            )
        with phase("ivfpq.sidecar_writes"):
            cdf = _centroids_literal_df(spark, cents)
            cdf.coalesce(1).write.mode("overwrite").parquet(
                f"{path}/centroids"
            )
            book_rows = [
                (j, c, [float(x) for x in vec])
                for j, book in enumerate(books)
                for c, vec in enumerate(book)
            ]
            spark.createDataFrame(
                book_rows, "j int, code int, cvec array<double>"
            ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
            spark.createDataFrame(
                [(False,)], "residual boolean"
            ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
        with phase("ivfpq.encode_write"):
            encoded = pq_encode(staged, books).select(
                F.col("vec_id"), "cell", "pq_code"
            )
            (
                encoded.withColumn("txn", F.lit("base"))
                .repartition("cell")
                .write.mode("overwrite")
                .partitionBy("cell", "txn")
                .parquet(f"{path}/data")
            )


def prof_ivfpq_sub():
    """Inside ivf_centroids: seed vs lloyd iterations."""
    from pandabase_spark.operators import similarity as S

    emb = workload.load(spark, SF_DIR, "embeddings")
    train = emb.select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")
    ).where(F.pmod(F.xxhash64("_id"), F.lit(2)) == 0)
    train = train.repartition(
        spark.sparkContext.defaultParallelism
    ).persist()
    with phase("cent.seed_collect"):
        seeds = (
            train.orderBy(F.xxhash64(F.col("_id").cast("string")))
            .limit(16).select("_v").collect()
        )

    def _unit(vec):
        n = sum(x * x for x in vec) ** 0.5
        return [x / n for x in vec] if n > 0 else list(vec)

    centroids = [_unit([float(x) for x in r["_v"]]) for r in seeds]
    for it in range(2):
        with phase(f"cent.lloyd_{it}"):
            assigned = S._with_cell(
                train, "_v", centroids, out="_cell"
            ).select("_cell", F.posexplode("_v").alias("_pos", "_x"))
            means = (
                assigned.groupBy("_cell", "_pos")
                .agg(F.avg("_x").alias("_m"))
                .collect()
            )
            by_cell = {}
            for r in means:
                by_cell.setdefault(r["_cell"], {})[r["_pos"]] = r["_m"]
            centroids = [
                _unit([by_cell[c][p] for p in sorted(by_cell[c])])
                if c in by_cell else centroids[c]
                for c in range(16)
            ]
    train.unpersist()


def prof_delta():
    from pandabase_spark.sources.delta_writer import (
        delta_append, delta_checkpoint, delta_create,
    )

    import shutil

    orders_df = workload.load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    dl = "/tmp/_prof_delta"
    shutil.rmtree(dl, ignore_errors=True)
    with phase("delta.total"):
        with phase("delta.create"):
            delta_create(orders_df, dl, partition_by=["o_orderpriority"])
        for i in range(4):
            with phase(f"delta.append_{i}"):
                delta_append(
                    orders_df.where(F.col("o_orderkey") % 4 == i)
                    .withColumn(
                        "o_orderkey", F.col("o_orderkey") + 10_000_000
                    ),
                    dl,
                )
        with phase("delta.checkpoint"):
            delta_checkpoint(spark, dl)
        with phase("delta.append_tail"):
            delta_append(
                orders_df.limit(1000).withColumn(
                    "o_orderkey", F.col("o_orderkey") + 50_000_000
                ),
                dl,
            )


def prof_kt():
    cat = workload._catalog(spark, SF_DIR)
    li = workload._li_unique(spark, SF_DIR).cache()
    li_rows = li.count()
    for t in ("p_lineitem",):
        if cat.has_table(t):
            cat.drop_table(t)
    with phase("kt.create"):
        cat.to_table(li, "p_lineitem", keys=workload.LI_KEYS)
    patch = li.limit(li_rows // 10).withColumn(
        "l_orderkey", F.col("l_orderkey") + 100_000_000
    )
    with phase("kt.append"):
        cat.to_table(patch, "p_lineitem", keys=workload.LI_KEYS,
                     how="append")
    up = li.limit(li_rows // 10).withColumn(
        "l_quantity", F.col("l_quantity") + 1.0
    )
    with phase("kt.upsert"):
        cat.to_table(up, "p_lineitem", keys=workload.LI_KEYS, how="upsert")
    cat.drop_table("p_lineitem")
    li.unpersist()


def prof_bigram():
    docs = workload.load(spark, SF_DIR, "documents")
    from pandabase_spark.operators.text_analysis import bigram_lm_score

    with phase("bigram.call_plus_force"):
        force(bigram_lm_score(docs))
    with phase("bigram.second"):
        force(bigram_lm_score(docs))


def prof_queries():
    for q in ("training_corpus_manifest_v2", "corpus_quality_funnel",
              "minhash_lsh_neardup", "fuzzy_match_pairs",
              "multimodal_decode_jpeg", "char_entropy_docs",
              "training_shard_manifest", "q8_market_share",
              "multimodal_embed_topk_mixed"):
        f = workload.QUERIES[q]
        with phase(f"q.{q}.run1"):
            force(f(spark, SF_DIR))
        with phase(f"q.{q}.run2"):
            force(f(spark, SF_DIR))


def prof_bpe():
    with phase("bpe.train"):
        force(workload.QUERIES["bpe_train_merges"](spark, SF_DIR))


TARGETS = {
    "ivfpq": prof_ivfpq,
    "ivfpq_sub": prof_ivfpq_sub,
    "delta": prof_delta,
    "kt": prof_kt,
    "bigram": prof_bigram,
    "queries": prof_queries,
    "bpe": prof_bpe,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["ivfpq"]
    out["_load_start"] = list(os.getloadavg())
    for n in names:
        TARGETS[n]()
    out["_load_end"] = list(os.getloadavg())
    print(json.dumps(out, indent=1))
