"""Physical-plan assertions — the 100 TB design is enforced here, not just
described: tests fail if a filter stops pushing down, a dimension join
stops broadcasting, or a top-k degenerates into a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in physical plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for n in needles:
        assert n not in plan, f"did not expect {n!r} in physical plan:\n{plan}"
