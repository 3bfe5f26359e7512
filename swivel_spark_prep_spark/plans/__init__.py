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


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of physical Window(/GroupLimit) nodes with an EMPTY
    partition spec — each one forces Exchange SinglePartition + a
    one-task sort over its whole input, the 100×-scale killer the
    two-pass prefix sum exists to avoid (round-9 verdict #1). Walks the
    pre-AQE physical plan, so the count is stable under adaptive
    re-planning."""
    plan = df._jdf.queryExecution().sparkPlan()
    count = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                count += 1
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    return count
