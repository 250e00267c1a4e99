"""Physical-plan inspection: machine-readable summary of the properties
that matter at 100 TB — shuffle count, join strategies, parquet pushdown,
codegen coverage. Used by tests/test_plans.py to pin plan shapes in CI
and by humans as `plan_report(df)` while iterating on an operator.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


@dataclass
class PlanReport:
    n_shuffles: int = 0
    joins: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    codegen_stages: int = 0
    has_take_ordered: bool = False
    has_partial_agg: bool = False
    text: str = ""

    @property
    def scan_reads_only(self) -> set[str]:
        """Union of column names that actually reach a parquet reader."""
        cols: set[str] = set()
        for schema in self.read_schemas:
            cols.update(re.findall(r"(\w+):", schema))
        return cols


def plan_string(df: DataFrame, *, execute: bool = False) -> str:
    """The physical plan; with execute=True, runs the query first so
    AQE's final (runtime-adapted) plan is reported."""
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — keep only the final plan or every node
    # double-counts
    return plan.split("== Initial Plan ==", 1)[0]


def plan_report(df: DataFrame, *, execute: bool = False) -> PlanReport:
    plan = plan_string(df, execute=execute)
    r = PlanReport(text=plan)
    r.n_shuffles = len(re.findall(r"\bExchange (?:hash|range|SinglePartition)", plan))
    for node in _JOIN_NODES:
        r.joins += [node] * plan.count(node)
    r.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    r.read_schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    r.partition_filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    r.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", plan)))
    r.has_take_ordered = "TakeOrderedAndProject" in plan
    r.has_partial_agg = "partial_" in plan
    return r
