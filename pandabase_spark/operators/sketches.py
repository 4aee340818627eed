"""Mergeable-sketch rollups: the sublinear summary layer at 100 TB.

Exact distinct counts and quantiles need a shuffle carrying every
distinct value; a 1000-executor corpus scan can instead emit one
KILOBYTE-scale sketch per partition/group and merge them — the
re-aggregation pattern behind every warehouse "distinct users by
<any dimension rollup>" dashboard. Spark 4 ships Apache DataSketches
aggregates natively (``hll_sketch_agg``, ``kll_sketch_agg_*``,
``theta_sketch_agg`` — JVM-side, codegen'd, no UDF), so the whole
layer is a Catalyst plan:

- build once per fine-grained group,
- merge (``hll_union_agg``) to any coarser rollup WITHOUT rescanning
  the data — sketches are the materialized-view currency,
- estimate at read time.

Error bounds are the published DataSketches guarantees (HLL lgk=12 →
~1.6 % relative standard error; KLL k=200 → ~1.3 % rank error) and are
pinned against exact answers in tests/test_sketches.py.

The reference has no approximate surface (SURVEY.md §2 Table B —
SQLAlchemy delegates everything to the backing engine); this module is
part of the 100 TB extension build-out. No DuckDB oracle by nature
(sketch estimates are implementation-specific), so the driver records
the rows-only check; accuracy is asserted in pytest instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from pandabase_spark.localframe import local_frame


def _probe_type(values: "list") -> "T.DataType | None":
    """The type classic createDataFrame would infer for the probe
    column (int→long, str→string, float→double, bool→boolean) —
    preserved exactly so the Arrow-local fast path returns the same
    schema; unknown OR MIXED probe types fall back to the classic
    path (r15 advisory fix: classic inference merges e.g. [1, 2.5]
    to double, so pinning the first value's type would make the
    fallback createDataFrame(rows, struct) raise a type-verification
    error instead)."""
    seen: "set[type]" = set()
    for v in values:
        if v is None:
            continue
        if not isinstance(v, (bool, int, float, str)):
            return None
        seen.add(type(v))
    if len(seen) != 1:
        return None
    t = seen.pop()
    if t is bool:
        return T.BooleanType()
    if t is int:
        return T.LongType()
    if t is float:
        return T.DoubleType()
    if t is str:
        return T.StringType()
    return None  # exotic subclass of a scalar type: classic path


def hll_distinct_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Per-group approximate distinct count, sketch retained for
    further merging: (group_cols..., n_rows, distinct_est, sketch).

    One hash shuffle on the group keys; each reducer's state is a
    2^lgk-register HLL regardless of group cardinality — contrast an
    exact count_distinct, whose shuffle carries every distinct value.
    Keep the ``sketch`` column in any materialized rollup: a coarser
    dimension later is ``hll_merge_rollup`` over this result, never a
    rescan of the fact table.
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col), F.lit(lgk))
        ).alias("distinct_est"),
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch"),
    )


def hll_merge_rollup(
    sketched: DataFrame,
    group_cols: Sequence[str],
    *,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate retained sketches to a coarser grouping —
    (group_cols..., distinct_est) — touching only the sketch rows.

    ``hll_union_agg`` merges registers; the estimate is identical to
    sketching the raw union directly (HLL union is lossless), so a
    per-(day, country) materialization answers per-country, per-day,
    and global questions without ever rereading the corpus."""
    grouped = (
        sketched.groupBy(*group_cols) if group_cols else sketched.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).alias("distinct_est"),
    )


def kll_quantile_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    *,
    k: int = 200,
) -> DataFrame:
    """Per-group streaming quantiles from a KLL sketch:
    (group_cols..., n, q_50, q_90, ... one column per requested
    quantile, named by percent).

    Exact percentiles need a per-group sort; the KLL sketch is a fixed
    ~k·log(n) state with a proven rank-error bound, mergeable across
    partitions — the latency-dashboard aggregate. The value column is
    cast to double once; quantile columns come from the same single
    sketch per group."""
    sk = F.kll_sketch_agg_double(F.col(col).cast("double"), F.lit(k))
    cols = [F.count(F.lit(1)).alias("n")]
    for q in quantiles:
        pct = int(round(q * 100))
        cols.append(
            F.kll_sketch_get_quantile_double(sk, F.lit(float(q))).alias(
                f"q_{pct}"
            )
        )
    return df.groupBy(*group_cols).agg(*cols)


def theta_overlap_estimate(
    left: DataFrame,
    right: DataFrame,
    col: str,
) -> DataFrame:
    """Approximate set overlap between two corpora on ``col`` via theta
    sketches: one row (est_left, est_right, est_union, est_overlap,
    overlap_frac_of_left).

    The sketch-speed form of decontamination triage: estimate how much
    of an eval set's n-gram space a training corpus covers BEFORE
    paying for the exact join (operators/decontamination.py is the
    exact follow-up on flagged shards). Intersection is
    inclusion-exclusion over union sketches — |A∩B| ≈ |A|+|B|−|A∪B| —
    because unions are the only lossless theta merge; the union sketch
    is built by sketching the tagged union of both sides in one pass.
    """
    tagged = left.select(F.col(col).alias("_v"), F.lit(1).alias("_l")).unionByName(
        right.select(F.col(col).alias("_v"), F.lit(0).alias("_l"))
    )
    sk = tagged.agg(
        F.theta_sketch_estimate(
            F.expr("theta_sketch_agg(CASE WHEN _l = 1 THEN _v END)")
        ).alias("est_left"),
        F.theta_sketch_estimate(
            F.expr("theta_sketch_agg(CASE WHEN _l = 0 THEN _v END)")
        ).alias("est_right"),
        F.theta_sketch_estimate(F.theta_sketch_agg(F.col("_v"))).alias(
            "est_union"
        ),
    )
    est_overlap = F.greatest(
        F.col("est_left") + F.col("est_right") - F.col("est_union"),
        F.lit(0),
    )
    return sk.select(
        "est_left",
        "est_right",
        "est_union",
        est_overlap.alias("est_overlap"),
        F.round(est_overlap / F.col("est_left"), 4).alias(
            "overlap_frac_of_left"
        ),
    )


def cms_frequencies(
    df: DataFrame,
    col: str,
    probe_values: "list",
    *,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-min-sketch frequency estimates for a probe set of heavy
    keys — the sublinear answer to "how often does each of THESE
    values occur" over a corpus too big to group exactly.

    The sketch builds distributed (``F.count_min_sketch`` — a
    mergeable JVM aggregate, one pass, O(1/eps · ln 1/confidence)
    space — exactly the structure you would persist per shard and
    merge at 100 TB); the serialized bytes deserialize driver-side
    (``CountMinSketch.readFrom``) and probing a handful of keys is
    O(probe set). CMS guarantee: estimate ≥ true count, and ≤ true +
    eps·N with the given confidence — overcounts only, pinned in
    pytest. Deterministic for a fixed seed.
    """
    row = df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("_sk")
    ).first()
    spark = df.sparkSession
    sk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(row["_sk"])
    )
    rows = [(v, int(sk.estimateCount(v))) for v in probe_values]
    vt = _probe_type(probe_values)
    if vt is None:
        return spark.createDataFrame(rows, [col, "est_count"])
    return local_frame(
        spark,
        rows,
        T.StructType(
            [T.StructField(col, vt), T.StructField("est_count", T.LongType())]
        ),
    )


def bloom_membership(
    df: DataFrame,
    col: str,
    probe_values: "list",
    *,
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """Bloom-filter membership of a candidate list against ``df[col]``
    — the pre-join existence filter: build once over the big side,
    ship the compact bitset (not the key set), and drop candidates
    that provably do not exist before any expensive join or lookup.

    The filter builds distributed (the JVM ``stat.bloomFilter``
    mergeable aggregate — Spark's own runtime-filter structure made
    explicit); candidates probe driver-side. No false NEGATIVES ever
    (every true member reports True, pinned in pytest); false
    positives ≤ ``fpp``. Returns (value, might_contain).
    """
    bf = df._jdf.stat().bloomFilter(col, int(expected_items), float(fpp))
    spark = df.sparkSession
    rows = [(v, bool(bf.mightContain(v))) for v in probe_values]
    vt = _probe_type(probe_values)
    if vt is None:
        return spark.createDataFrame(rows, [col, "might_contain"])
    return local_frame(
        spark,
        rows,
        T.StructType(
            [
                T.StructField(col, vt),
                T.StructField("might_contain", T.BooleanType()),
            ]
        ),
    )
