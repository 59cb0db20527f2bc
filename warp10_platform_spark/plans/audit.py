"""Physical-plan audit helpers — the engine's "is this the plan I want"
tooling (SURVEY §4: what Catalyst gives us, and what to check it gave).

Used by tests/test_plans.py to assert the properties that matter at
100 TB: predicate pushdown reached the scan, partition pruning happened,
no accidental cartesian products, broadcast where expected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain string (what `.explain('formatted')` prints)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffle_hash_joins: int = 0
    cartesian_products: int = 0
    exchanges: int = 0
    python_evals: int = 0

    def scan_columns(self) -> set[str]:
        cols: set[str] = set()
        for s in self.read_schemas:
            cols.update(re.findall(r"(\w+):", s))
        return cols


def plan_report(df: DataFrame) -> PlanReport:
    plan = explain_formatted(df)
    r = PlanReport()
    r.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    r.partition_filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    r.read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    r.broadcast_joins = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
    r.sortmerge_joins = len(re.findall(r"SortMergeJoin", plan))
    r.shuffle_hash_joins = len(re.findall(r"ShuffledHashJoin", plan))
    r.cartesian_products = len(re.findall(r"CartesianProduct", plan))
    r.exchanges = len(re.findall(r"\bExchange\b", plan))
    r.python_evals = len(re.findall(r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas", plan))
    return r
