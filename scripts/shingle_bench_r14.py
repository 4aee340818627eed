#!/usr/bin/env python
"""A/B the word-shingle formulations (r14): window-lead (old) vs
explode(position)+slice+array_join (new), on the real documents table.

Checks bit-exact multiset equality of (id, sh) rows, then times the
minhash-signature consumer (the heaviest shingle consumer) through the
noop sink, min-of-3.

Usage: python scripts/shingle_bench_r14.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pandabase_spark.session import get_spark
    from pandabase_spark import workload
    from pandabase_spark.functions.text import tokenize
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = get_spark("shingle_bench_r14")
    spark.sparkContext.setLogLevel("ERROR")
    docs = workload.load(spark, sf_dir, "documents")

    def old_form(df, id_col, text_col, n):
        toks = df.select(
            F.col(id_col), F.posexplode(tokenize(text_col)).alias("pos", "tok")
        )
        w = Window.partitionBy(id_col).orderBy("pos")
        parts = [F.col("tok")] + [F.lead("tok", k).over(w) for k in range(1, n)]
        sh = toks.select(
            F.col(id_col),
            F.col("pos"),
            F.concat_ws(" ", *parts).alias("sh"),
            F.lead("tok", n - 1).over(w).isNotNull().alias("_full"),
        )
        return sh.where(F.col("_full") | (F.col("pos") == 0)).select(id_col, "sh")

    def new_form(df, id_col, text_col, n):
        toks = df.select(F.col(id_col), tokenize(text_col).alias("_tk"))
        pos = toks.select(
            F.col(id_col),
            F.col("_tk"),
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_tk") - (n - 1), F.lit(1))
                )
            ).alias("_pos"),
        )
        return pos.select(
            F.col(id_col),
            F.array_join(F.slice("_tk", F.col("_pos"), n), " ").alias("sh"),
        )

    # 1. bit-exact multiset equality for n in {2, 3, 5, 8}
    for n in (2, 3, 5, 8):
        a = old_form(docs, "doc_id", "text", n).groupBy("doc_id", "sh").count()
        b = new_form(docs, "doc_id", "text", n).groupBy("doc_id", "sh").count()
        bad = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"n={n}: multiset_diff_rows={bad}")
        assert bad == 0, f"shingle mismatch at n={n}"

    # 2. timing: minhash-style consumer (64 min-aggregates per doc)
    def consumer(form, n=3, num_perm=64):
        from pandabase_spark.operators.dedup import _perm_constants, _M31

        sh = form(docs, "doc_id", "text", n)
        h = sh.select(
            "doc_id", F.pmod(F.xxhash64(F.col("sh")), F.lit(_M31)).alias("h")
        )
        aggs = []
        for i in range(num_perm):
            aa, bb = _perm_constants(i)
            aggs.append(
                F.min((F.col("h") * F.lit(aa) + F.lit(bb)) % F.lit(_M31)).alias(
                    f"_s{i}"
                )
            )
        return h.groupBy("doc_id").agg(*aggs)

    def t(df) -> float:
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    print("warm-up:", t(consumer(new_form)))
    print("old (window-lead) minhash consumer, min-of-3: "
          f"{t(consumer(old_form)):.2f}s")
    print("new (slice/array_join) minhash consumer, min-of-3: "
          f"{t(consumer(new_form)):.2f}s")

    # 3. plan shape: the new form must have NO Exchange before the agg
    plan = consumer(new_form)._jdf.queryExecution().executedPlan().toString()
    n_exch = plan.count("Exchange")
    print(f"new-form consumer plan Exchange count: {n_exch}")
    spark.stop()


if __name__ == "__main__":
    main()
