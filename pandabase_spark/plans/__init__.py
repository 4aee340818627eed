"""Physical-plan auditing: make "is this the plan you'd want?" testable.

The engine's performance contract is a set of plan-shape invariants
(filters pushed to parquet, dims broadcast, no nested-loop joins, no
Python in the hot path, no single-partition exchanges). This module
extracts those facts from the executed plan string so tests and the
bench can assert them instead of eyeballing ``.explain()`` output.

The reference has no optimizer to audit (SURVEY.md §4 — it delegates to
the backing SQL engine); this is Spark-engine tooling.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    shuffles: int = 0
    hash_exchanges: int = 0
    single_partition_exchanges: int = 0
    codegen_stages: int = 0
    python_eval_nodes: int = 0
    window_nodes: int = 0
    parquet_scans: int = 0
    take_ordered: int = 0
    filter_lines: list[str] = field(default_factory=list)
    # AQE runtime facts — only populated after the df has EXECUTED
    # (AQE finalizes the plan at runtime; audit a pre-execution frame
    # and these read 0/False)
    aqe_final: bool = False
    skew_joins: int = 0
    aqe_shuffle_reads: int = 0

    @property
    def python_free(self) -> bool:
        return self.python_eval_nodes == 0

    def filters_free_of(self, needle: str) -> bool:
        """True when no Filter node's expression contains ``needle`` —
        guards against the optimizer re-inlining an expensive staged
        expression (regex, hash arrays) into a pushed-down predicate."""
        return not any(needle in ln for ln in self.filter_lines)

    @property
    def join_safe(self) -> bool:
        """No nested-loop/cartesian join anywhere in the plan."""
        return self.nested_loop_joins == 0 and self.cartesian_products == 0


def plan_audit(df: DataFrame) -> PlanAudit:
    """Parse the executed (AQE-final where available) plan of ``df``."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return PlanAudit(
        # toString() truncates long filter lists mid-entry ("...," with
        # no closing bracket) — stop at the bracket OR at the next
        # field header, so a truncated list still reports its prefix
        pushed_filters=[
            m
            for m in re.findall(
                r"PushedFilters: \[(.*?)(?:\]|(?=, ReadSchema))", plan
            )
            if m
        ],
        partition_filters=[
            m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if m
        ],
        read_schemas=re.findall(r"ReadSchema: (\S+)", plan),
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        shuffles=plan.count("Exchange"),
        hash_exchanges=plan.count("Exchange hashpartitioning"),
        single_partition_exchanges=plan.count("SinglePartition"),
        codegen_stages=plan.count("WholeStageCodegen"),
        python_eval_nodes=plan.count("EvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("MapInPandas"),
        window_nodes=plan.count("Window"),
        parquet_scans=plan.count("Scan parquet"),
        take_ordered=plan.count("TakeOrderedAndProject"),
        filter_lines=[
            ln for ln in plan.splitlines() if re.search(r"\bFilter\b", ln)
        ],
        aqe_final="isFinalPlan=true" in plan,
        skew_joins=plan.count("skew=true"),
        aqe_shuffle_reads=plan.count("AQEShuffleRead"),
    )
