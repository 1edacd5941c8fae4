"""Physical-plan inspection utilities (SURVEY.md §4).

The engine's optimizer IS Catalyst — these helpers make its decisions
observable and assertable: tests pin the plan shapes that matter at
100 TB (pushdown reached the scan, dims broadcast, top-k avoided a
global sort, aggregation is partial+final), so a regression that
silently de-optimizes a query fails CI, not the cluster bill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text ``df.explain(mode)`` would print, as a string."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    """Assert every needle appears in the plan; returns the plan."""
    plan = explain_str(df, mode)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(
            f"plan is missing {missing}; got:\n{plan}"
        )
    return plan


def assert_not_in_plan(
    df: DataFrame, *needles: str, mode: str = "formatted"
) -> str:
    plan = explain_str(df, mode)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(
            f"plan unexpectedly contains {present}; got:\n{plan}"
        )
    return plan
