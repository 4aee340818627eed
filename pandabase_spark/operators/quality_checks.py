"""Declarative data-quality checks — violations counted in one pass.

The expectations pattern (assert properties of a table, report
violation counts) folded into a single aggregation: every rule becomes
a conditional sum over the same scan, so N rules cost one job, not N.
The reference's validation surface is write-time errors on bad input
(unnamed/NaN/duplicate keys, reference:pandabase/sql.py:96-136); this
generalizes it to arbitrary column predicates at any pipeline stage.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate named boolean rules; one output row per rule.

    ``rules`` maps rule name → Column predicate that should be TRUE
    for every row. NULL predicate results count as violations (a rule
    that cannot be evaluated did not pass — the conservative read).

    Plan: one scan, one partial-aggregated job for ALL rules — each
    rule compiles to `sum(case when not coalesce(pred, false) ...)`
    inside the same Aggregate node. At 100 TB this is the difference
    between one pass and a pass per rule. The per-rule rows come from
    unpivoting the single aggregate row (an Expand over 1 row —
    driver-free, still one job).

    Returns (rule, n_rows, n_violations, violation_pct) sorted output
    left to the caller.
    """
    if not rules:
        raise ValueError("rules must not be empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v_{name}")
        )
    one = df.agg(*aggs)
    stacked = one.unpivot(
        ["_n"],
        [f"_v_{name}" for name in rules],
        "rule",
        "n_violations",
    )
    return stacked.select(
        F.expr("substring(rule, 4)").alias("rule"),
        F.col("_n").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(100.0 * F.col("n_violations") / F.col("_n"), 4).alias(
            "violation_pct"
        ),
    )


def fk_violation_report(
    pairs: "list[tuple[str, DataFrame, str, DataFrame, str]]",
) -> DataFrame:
    """Referential-integrity audit across a schema: one row per
    declared foreign key with its orphan count (child rows whose key
    has no parent). ``pairs`` is a list of
    ``(name, child_df, child_key, parent_df, parent_key)``.

    Each relationship is a LEFT ANTI join (NULL child keys are not
    orphans — SQL FK semantics ignore NULLs) aggregated to one count;
    the per-FK plans union into a single job. The anti join ships
    only the child's key column and the parent's distinct keys —
    broadcastable whenever the parent's key set fits, AQE's call
    otherwise. The batch-audit twin of the write-time CHECK/PK
    enforcement on keyed tables: run it per ingest to catch drift
    between independently-loaded fact and dimension tables before a
    100 TB join silently drops or duplicates rows.
    """
    out = None
    for name, child, ckey, parent, pkey in pairs:
        orphans = (
            child.select(F.col(ckey).alias("_k"))
            .where(F.col("_k").isNotNull())
            .join(
                parent.select(F.col(pkey).alias("_k")).distinct(),
                on="_k",
                how="left_anti",
            )
            .agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).alias("n_orphans"),
            )
        )
        out = orphans if out is None else out.unionByName(orphans)
    if out is None:
        raise ValueError("no foreign-key pairs given")
    return out
