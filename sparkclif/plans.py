"""Physical-plan introspection shared by the plan-regression tests
(tests/test_plans.py) and the plan audit (probes/plan_audit.py) —
one home for the JVM explainString call and the plan-text metrics, so
a Spark upgrade that moves PythonSQLUtils or reshapes the formatted
plan is fixed in one place.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The 'formatted'-mode physical plan text for a DataFrame."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_metrics(plan: str) -> dict:
    """Scale-relevant metrics parsed from a formatted plan. Static
    exchange counts are UPPER bounds: the executed adaptive plan
    dedupes identical subtrees via ReusedExchange."""
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "python_eval": bool(re.search(r"BatchEvalPython|ArrowEvalPython", plan)),
        "arrow_pandas": bool(
            re.search(r"MapInPandas|FlatMapGroupsInPandas|AggregateInPandas", plan)
        ),
        "bnlj": len(re.findall(r"\) BroadcastNestedLoopJoin", plan)),
        "cartesian": "CartesianProduct" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "sort_merge_joins": len(re.findall(r"\) SortMergeJoin", plan)),
        "broadcast_joins": len(re.findall(r"\) BroadcastHashJoin", plan)),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
    }
