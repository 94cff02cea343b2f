"""Fleet-wide physical-plan audit.

The per-query plan gates in tests/test_plans.py pin specific shapes;
this module gives the complementary whole-inventory view: walk every
registered query, execute-plan it once, and report the operators that
matter at 100 TB (shuffle exchanges, scans, broadcast joins, explodes,
Python eval nodes, cartesian products) as a DataFrame an engineer can
sort. Two invariants must hold for the WHOLE fleet and are enforced by
tests/test_plans.py::test_fleet_no_cartesian_no_row_python:

  1. no CartesianProduct anywhere (a broadcast nested-loop against a
     1-row/scalar or tiny grid side is acceptable and reported
     separately);
  2. no BatchEvalPython (row-at-a-time Python) anywhere — Python runs
     only in Arrow-batched FlatMapGroupsInPandas / MapInPandas stages.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

_SHUFFLE_KINDS = ("hashpartitioning", "rangepartitioning", "SinglePartition")


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_row(name: str, plan: str) -> dict:
    return {
        "query": name,
        "n_shuffles": sum(plan.count(f"Exchange {k}") for k in _SHUFFLE_KINDS),
        "n_scans": plan.count("FileScan parquet"),
        "n_broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "n_broadcast_nl_joins": plan.count("BroadcastNestedLoopJoin"),
        "n_sort_merge_joins": plan.count("SortMergeJoin"),
        "has_generate": "Generate" in plan,
        "has_arrow_python": ("FlatMapGroupsInPandas" in plan)
        or ("MapInPandas" in plan),
        "has_row_python": "BatchEvalPython" in plan,
        "has_cartesian": "CartesianProduct" in plan,
    }


def plan_audit(
    spark: SparkSession,
    sf_dir: str,
    queries: Mapping[str, Callable[[SparkSession, str], DataFrame]],
) -> DataFrame:
    """One row per query with its plan-operator census."""
    rows = [
        audit_row(name, physical_plan(fn(spark, sf_dir)))
        for name, fn in queries.items()
    ]
    return spark.createDataFrame(rows)
