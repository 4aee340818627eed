"""Deterministic corpus sampling for training-data assembly.

A data mixture is specified per stratum (language, source, domain …) as
either a fraction or a token budget; selection must be deterministic
(reproducible across runs/retries, no RNG state) and order-free (no
"first N rows of the file"). Both operators order each stratum by a
content-independent hash of the id — ``md5(cast(id as string))``, a
stable total order that DuckDB reproduces bit-for-bit for the oracles —
and keep a prefix of that order.

Scale notes: one hash-partitioned window per stratum (the per-stratum
sort is the irreducible cost of a budgeted prefix); no driver-side
state, no collect. Strata counts are typically ≤ thousands, so the
window partitions are coarse — at 100 TB pre-partition by the strata
columns at ingest and the window sort becomes partition-local.

The reference has no sampling surface; the semantics follow standard
data-mixture practice (per-source token budgets).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _hash_order(id_col: str) -> list[Column]:
    # md5 hex of the decimal id: engine-portable deterministic order;
    # id itself breaks (impossible) ties for total-order stability
    return [F.md5(F.col(id_col).cast("string")), F.col(id_col)]


def stratified_sample(
    df: DataFrame,
    *,
    strata: Sequence[str],
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of each stratum (ceil of
    fraction × stratum size, so no stratum with ≥1 row empties)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    w = Window.partitionBy(*strata).orderBy(*_hash_order(id_col))
    wc = Window.partitionBy(*strata)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .where(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rn", "_n")
    )


def interleave_shards(
    df: DataFrame,
    *,
    strata: Sequence[str],
    n_shards: int,
    id_col: str,
) -> DataFrame:
    """Mixture-balanced shard assignment: within each stratum, rows are
    hash-ordered and dealt round-robin across ``n_shards``, so every
    shard receives an equal (±1) slice of every stratum — the
    interleave step that fixes a training run's data mixture per shard.

    Output adds ``shard`` (0-based) and ``pos_in_shard`` (0-based rank
    within the shard's slice of the stratum). Deterministic: same
    input → same assignment, no RNG.

    Scale notes: one window per stratum (hash-partitioned on the strata
    columns, parallel across them) — there is NO global sort. Skewed
    strata make skewed windows; at 100 TB pre-partition by the strata
    columns at ingest (the keyed-table layout already does) and the
    window sort is partition-local.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    w = Window.partitionBy(*strata).orderBy(*_hash_order(id_col))
    rn = F.row_number().over(w) - 1
    return (
        df.withColumn("shard", (rn % n_shards).cast("long"))
        .withColumn("pos_in_shard", F.floor(rn / n_shards).cast("long"))
    )


def sample_to_token_budget(
    df: DataFrame,
    *,
    strata: Sequence[str],
    budget_tokens: int,
    id_col: str,
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Keep the hash-ordered prefix of each stratum whose cumulative
    token count stays within ``budget_tokens`` — the per-source token
    budget of a data-mixture spec.

    Tokens come from ``token_col`` if given, else a whitespace token
    count of ``text_col``. Output adds ``n_tokens`` and the running
    ``cum_tokens`` (≤ budget) for auditability. A document that would
    cross the budget is excluded (strict prefix; budgets are ceilings,
    not targets).
    """
    from pandabase_spark.functions.text import token_count

    toks = (
        F.col(token_col)
        if token_col is not None
        else token_count(text_col)
    ).cast("long")
    w = (
        Window.partitionBy(*strata)
        .orderBy(*_hash_order(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", toks)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= budget_tokens)
    )


def sample_fixed_per_stratum(
    df: DataFrame,
    *,
    strata: Sequence[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """Keep a deterministic fixed ``k`` rows per stratum (hash-ordered
    prefix — the distributed stand-in for per-group reservoir
    sampling). Strata smaller than ``k`` keep all rows. One window per
    stratum, no global sort; use over ``stratified_sample`` when
    downstream wants uniform per-class counts (eval slices, few-shot
    pools) rather than proportional representation."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*strata).orderBy(*_hash_order(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Deterministic weighted sampling: row i survives with probability
    ``min(1, fraction * w_i / mean(w))`` — overall keep rate ≈
    ``fraction`` with inclusion odds proportional to weight (the
    quality-weighted corpus sampling pattern: upsample what scores
    well instead of hard-thresholding).

    The coin is ``md5(id)``'s first 8 hex digits scaled to [0,1) — the
    same reproducible, engine-portable uniform the stratified samplers
    use, so reruns and oracle checks see identical draws. The mean
    weight is a 1-row aggregate broadcast as a cross join (never
    collected); non-positive weights never survive.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    mean_w = df.agg(F.avg(weight_col).alias("_mean_w"))
    p = F.least(
        F.lit(1.0),
        F.lit(fraction) * F.col(weight_col) / F.col("_mean_w"),
    )
    return (
        df.crossJoin(F.broadcast(mean_w))
        .where((F.col(weight_col) > 0) & (u < p))
        .drop("_mean_w")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    *,
    fractions: "tuple[float, float, float]" = (0.8, 0.1, 0.1),
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Attach a deterministic ``train``/``val``/``test`` label.

    The assignment is a pure function of the row id (+ optional salt):
    ``md5(id:salt)``'s first 8 hex digits → integer → percent bucket
    0-99, cut at the cumulative fraction boundaries. Properties a
    training pipeline needs and RNG-based splits lack: reproducible
    across runs/engines (no seed state), STABLE under corpus growth
    (a document's split never changes when other documents arrive —
    the anti-leakage property), and re-derivable from the id alone.
    ``salt`` yields independent re-splits (cross-validation folds).
    One narrow projection — no shuffle, no state.

    Fractions are rounded to whole percents (the bucket granularity);
    they must sum to 1.
    """
    pcts = [round(f * 100) for f in fractions]
    if sum(pcts) != 100 or any(p < 0 for p in pcts):
        raise ValueError(
            f"fractions must be non-negative whole percents summing to 1, "
            f"got {fractions}"
        )
    key = F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"), F.lit(100)
    )
    label = (
        F.when(bucket < pcts[0], F.lit("train"))
        .when(bucket < pcts[0] + pcts[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out, label)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int,
    n_shards: int = 16,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins (sequence
    packing): documents are sharded by id hash, ordered inside each
    shard by the same hash, and bin k of a shard holds the documents
    whose running token offset falls in ``[k·budget, (k+1)·budget)``
    — the offset-packing scheme (a document may straddle its bin's
    tail; the trainer's loader splits at the boundary, which is why
    the byte offset is emitted). Deterministic end to end and stable
    per shard.

    Plan: one hash-partitioned window per shard (running SUM over the
    md5 order) — the irreducible cost of sequential packing, made
    parallel by sharding; no global sort, no driver state. Emits
    (group_cols…, id, shard, bin_id, bin_offset, n_tokens).

    ``group_cols`` scopes packing (shards AND bins) within each group
    — e.g. ``["split"]`` so train bins never mix validation documents.
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError(f"budget and n_shards must be positive")
    h = F.md5(F.col(id_col).cast("string"))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    staged = df.select(
        *group_cols,
        F.col(id_col),
        F.col(token_col).cast("long").alias("_tok"),
        shard.alias("shard"),
        h.alias("_h"),
    )
    w = (
        Window.partitionBy(*group_cols, "shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum("_tok").over(w) - F.col("_tok")  # offset BEFORE this doc
    return (
        staged.withColumn("_off", run)
        .select(
            *group_cols,
            id_col,
            "shard",
            F.floor(F.col("_off") / budget).cast("long").alias("bin_id"),
            F.pmod(F.col("_off"), F.lit(budget)).alias("bin_offset"),
            F.col("_tok").alias("n_tokens"),
        )
    )


def mixture_report(
    df: DataFrame,
    strata: Sequence[str],
    token_col: str,
    *,
    target: "dict[tuple, float] | None" = None,
) -> DataFrame:
    """Per-stratum corpus composition + the resampling factor that
    reaches a target mixture — the bookkeeping every training-data
    assembly starts from. Emits (strata…, n_docs, n_tokens,
    token_share, resample_factor) where resample_factor =
    target_share / actual_share (default target: uniform over the
    observed strata). Factors >1 mean upsample, <1 downsample; feed
    them to :func:`weighted_sample` or repeat-count expansion.

    One hash aggregate + a 1-row total broadcast back as a cross join
    — no collect, no second scan of the corpus.
    """
    per = df.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_tot"),
        F.count(F.lit(1)).alias("_n_strata"),
    )
    out = per.crossJoin(F.broadcast(tot)).withColumn(
        "token_share", F.col("n_tokens") / F.col("_tot")
    )
    if target is None:
        tgt = 1.0 / F.col("_n_strata")
    else:
        expr = None
        for key, share in target.items():
            cond = None
            key_t = key if isinstance(key, tuple) else (key,)
            for c, v in zip(strata, key_t):
                piece = F.col(c) == v
                cond = piece if cond is None else (cond & piece)
            expr = (
                F.when(cond, F.lit(share))
                if expr is None
                else expr.when(cond, F.lit(share))
            )
        tgt = expr.otherwise(F.lit(0.0))
    return out.withColumn(
        "resample_factor", tgt / F.col("token_share")
    ).drop("_tot", "_n_strata")


def temperature_sample(
    df: DataFrame,
    *,
    strata: Sequence[str],
    id_col: str,
    total: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture sampling: draw a deterministic sample
    of ~``total`` rows whose stratum proportions follow
    ``n_s ** alpha`` instead of the raw counts — the multilingual-
    corpus rebalancing rule (alpha-sampling, e.g. mBERT/XLM-R's
    exponent-smoothed language mixture): ``alpha=1`` preserves the
    natural distribution, ``alpha=0`` is uniform over strata, and the
    usual ``alpha≈0.3–0.7`` lifts low-resource strata without letting
    any single giant stratum dominate.

    Determinism discipline (same as every sampler here): per-stratum
    take counts use INTEGER arithmetic end to end —
    ``t_s = (total * w_s) div sum(w_s)`` with
    ``w_s = floor(sqrt(n_s))`` for the default ``alpha=0.5`` (IEEE
    sqrt is correctly rounded, so both engines floor the same value;
    other alphas go through ``pow``, which is 1-ulp and therefore
    exact-replay only per-engine) — and each stratum keeps the
    ``t_s``-prefix of the md5-hash order. Floor loss means the sample
    is ≤ ``total`` by at most one row per stratum.

    Plan: one stratum-count aggregate, a 1-row total broadcast, a
    broadcast join of take counts back onto the corpus (strata
    cardinality ≪ corpus), and the per-stratum window prefix — no
    collect, no RNG state.
    """
    if total <= 0:
        raise ValueError(f"total must be positive, got {total}")
    n = F.col("_n_s").cast("double")
    weight = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    per = (
        df.groupBy(*strata)
        .agg(F.count(F.lit(1)).alias("_n_s"))
        .withColumn("_w_s", F.floor(weight).cast("long"))
    )
    tot = per.agg(F.sum("_w_s").alias("_w_tot"))
    takes = (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "_t_s",
            F.expr(f"CAST({int(total)} * _w_s AS BIGINT) DIV _w_tot"),
        )
        .select(*strata, "_t_s")
    )
    w = Window.partitionBy(*strata).orderBy(*_hash_order(id_col))
    return (
        df.join(F.broadcast(takes), on=list(strata))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("_t_s"))
        .drop("_rn", "_t_s")
    )
