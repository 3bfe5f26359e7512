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


def _leaf_ids(node, acc: set, crossed_reducer: bool) -> None:
    """Collect identities of data-backed leaves reachable from ``node``,
    split by whether the path crossed a cardinality REDUCER (Aggregate /
    GlobalLimit — after one of those, per-key multiplicity is bounded
    and a join back to the same relation cannot fan out quadratically).
    Bounded literal leaves (LocalRelation / Range / OneRowRelation) are
    ignored. InMemoryRelation leaves are NOT treated as opaque: the walk
    descends into the cached physical plan, continuing the reducer
    tracking, so persisting a subtree never changes what the guardrail
    counts — an aggregated view joined back to its base stays exempt
    whether or not the aggregate sits inside a cache."""
    name = node.getClass().getSimpleName()
    if name in ("Aggregate", "GlobalLimit", "Deduplicate"):
        crossed_reducer = True
    if name == "InMemoryRelation":
        try:
            _phys_leaf_ids(
                node.cacheBuilder().cachedPlan(), acc, crossed_reducer
            )
        except Exception:  # opaque cache: fall back to plan-hash identity
            acc.add((("cache", node.semanticHash()), crossed_reducer))
        return
    n = node.children().size()
    if n == 0:
        ident = None
        if name == "LogicalRelation":
            try:
                ident = ("file", node.relation().location().rootPaths().toString())
            except Exception:  # non-file relation: fall back to class id
                ident = ("rel", node.semanticHash())
        if ident is not None:
            acc.add((ident, crossed_reducer))
        return
    for i in range(n):
        _leaf_ids(node.children().apply(i), acc, crossed_reducer)


#: physical counterparts of the logical reducers above (the cached plan
#: inside an InMemoryRelation is a SparkPlan, not a logical plan)
_PHYS_REDUCERS = (
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
    "GlobalLimitExec",
    "CollectLimitExec",
    "TakeOrderedAndProjectExec",
)


def _phys_leaf_ids(node, acc: set, crossed_reducer: bool) -> None:
    """`_leaf_ids` over a PHYSICAL plan — used to see through
    InMemoryRelation into its cached plan. File scans map to the same
    ("file", rootPaths) identity the logical walk produces, so a join of
    a cached projection of table T against T itself still matches."""
    name = node.getClass().getSimpleName()
    if name in _PHYS_REDUCERS:
        crossed_reducer = True
    if name == "AdaptiveSparkPlanExec":
        _phys_leaf_ids(node.inputPlan(), acc, crossed_reducer)
        return
    if name == "ReusedExchangeExec":
        _phys_leaf_ids(node.child(), acc, crossed_reducer)
        return
    if name == "InMemoryTableScanExec":  # nested cache: keep descending
        _phys_leaf_ids(
            node.relation().cacheBuilder().cachedPlan(), acc, crossed_reducer
        )
        return
    n = node.children().size()
    if n == 0:
        if name == "FileSourceScanExec":
            try:
                ident = ("file", node.relation().location().rootPaths().toString())
            except Exception:
                ident = ("rel", node.canonicalized().hashCode())
            acc.add((ident, crossed_reducer))
        # LocalTableScanExec / RangeExec / RDDScanExec of literals are
        # the bounded leaves the logical walk ignores too
        return
    for i in range(n):
        _phys_leaf_ids(node.children().apply(i), acc, crossed_reducer)


def pair_self_join_count(df: DataFrame) -> int:
    """Number of PAIR self-joins in the optimized logical plan: joins
    where BOTH sides reach the same data-backed leaf relation at row
    scale (no Aggregate/GlobalLimit between the join and the leaf).
    That is the quadratic-fan-out shape — per key with n_k rows, the
    join emits O(n_k²) pairs — the round-11 verdict's third invariant
    (fdr_bh's triangular join and theil_sen's uncapped pair join were
    both this). Joins of an AGGREGATED view back onto its own base
    (fraction-of-total, per-group normalize) are not counted: the
    reduced side carries at most one row per key, so fan-out is linear.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    count = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Join":
            left: set = set()
            right: set = set()
            _leaf_ids(node.children().apply(0), left, False)
            _leaf_ids(node.children().apply(1), right, False)
            row_left = {i for i, crossed in left if not crossed}
            row_right = {i for i, crossed in right if not crossed}
            if row_left & row_right:
                count += 1
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    return count


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


def replicate_explode_sizes(df: DataFrame) -> list[int]:
    """Sizes of literal replicate explodes — ``explode(sequence(lo, hi))``
    with BOTH bounds constant — in the ANALYZED plan (the optimizer
    constant-folds literal sequences into opaque array literals, so the
    pre-optimization plan is the last place the bound is readable).
    Each site multiplies its input by (hi−lo+1): the Monte-Carlo shape
    (bootstrap/randomization replicates) that is fine at B=100 and a
    silent 100× cost at B=10⁴. The fourth registry guardrail
    (round-12 verdict Next #6) caps every site's B via an allowlist in
    tests/test_plan_guardrail.py. Data-dependent sequences
    (``sequence(0, size(col))`` — n-gram/chunk generation) are bounded
    by the column's own contract and are not this detector's target."""
    import re

    text = df._jdf.queryExecution().analyzed().toString()
    sizes = []
    for lo, hi in re.findall(
        r"explode\(sequence\((-?\d+), (-?\d+)[,)]", text
    ):
        sizes.append(int(hi) - int(lo) + 1)
    return sizes


def plan_report(df: DataFrame) -> dict:
    """One-call physical-plan health report — the numbers a plan review
    actually reads, extracted so users (and the `explain-query` CLI)
    can audit a query without eyeballing explain output:

    - ``pushed_filters``: PushedFilters entries reaching the parquet
      scans (predicate pushdown worked)
    - ``read_schemas``: the pruned per-scan ReadSchema strings (column
      pruning worked — a 2-column projection must not scan 6 columns)
    - ``codegen_stages``: WholeStageCodegen span count (JVM-side)
    - ``exchanges``: shuffle Exchange count (each is a stage boundary)
    - ``broadcast_joins`` / ``sortmerge_joins`` / ``hash_joins``: join
      strategy mix (small dims should be broadcast)
    - ``has_cartesian`` / ``unpartitioned_windows`` /
      ``pair_self_joins``: the three guardrail invariants
    """
    import re

    # Static analysis wants the NON-adaptive plan: under AQE the
    # pre-execution tree is a bare AdaptiveSparkPlan skeleton with no
    # WholeStageCodegen wrapping (stages codegen only as they run), so
    # re-plan the same logical plan with AQE off for the report.
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # queryExecution is a lazy val per Dataset, so re-plan the same
        # logical plan on a FRESH Dataset under the new conf
        replanned = df.select("*")
        plan = formatted_plan(replanned)
        cg = replanned._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "codegen"
            )
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    df = replanned  # downstream helpers read the non-AQE plan too
    # noqa: the reassignment is deliberate — every helper below must see
    # the re-planned Dataset
    return {
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schemas": schemas,
        "codegen_stages": int(m.group(1)) if m else codegen_stage_count(df),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "hash_joins": len(re.findall(r"ShuffledHashJoin", plan)),
        "has_cartesian": "CartesianProduct" in plan,
        "unpartitioned_windows": unpartitioned_window_count(df),
        "pair_self_joins": pair_self_join_count(df),
    }
