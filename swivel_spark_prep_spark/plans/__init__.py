"""Plan inspection helpers — used by plan tests to pin the physical
strategies the engine relies on at scale (SURVEY.md §4.2): parquet filter
pushdown, column pruning, broadcast-vs-sort-merge joins, TakeOrdered
top-k, whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan is missing {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def codegen_stage_count(df: DataFrame) -> int:
    return physical_plan(df).count("WholeStageCodegen")
