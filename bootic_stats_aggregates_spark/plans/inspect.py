"""Helpers to assert physical-plan properties.

The 100 TB contract is not "the answer is right" but "the plan is the one
you'd want on a cluster": filters pushed into the scan, columns pruned,
dims broadcast, per-group top-k pre-pruned below the shuffle, codegen
covering the hot path. tests/test_plans.py pins these so a regression in
how a query is written (e.g. a cast that blocks pushdown) fails loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    """Which of the given substrings appear in the formatted plan."""
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}
