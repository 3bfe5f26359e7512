"""Scale-safe ordered prefix sums — the public primitive behind every
"running total over a globally-ordered relation" in this engine.

A naive ``SUM() OVER (ORDER BY ...)`` with no PARTITION BY forces Spark
to collapse the whole relation into ONE task (Exchange SinglePartition +
Sort) — correct at test scale, a single-executor sort at 100 TB. The
two-pass scheme here (the X46/X90 pattern born in packing/dedup, promoted
to a public operator per the round-9 verdict) computes the identical
values with no single-task data stage:

1. range-partition by the order columns (equal keys land together, so
   partition-local order is a contiguous slice of the global order) and
   sort within partitions;
2. partition-local prefix sums in parallel (a window PARTITIONED by the
   physical partition id — never a global window);
3. add per-partition offsets computed from the partition TOTALS — a
   control relation of at most ``#partitions`` rows (ungrouped: a
   driver-side cumsum over #partitions numbers; grouped: a per-group
   window over the totals relation, whose partition spec is non-empty so
   no single-partition exchange appears anywhere in the plan).

Grouped form: with ``group_cols`` the running sum RESETS per group and
rows are range-partitioned by (group, order) — each group occupies a
contiguous run of partitions, so the totals relation has at most
``#partitions + #groups`` rows and is broadcast back. Use the grouped
form when group cardinality is control-plane-sized (sources, languages,
shards); a per-group window is the right tool only when groups are
numerous AND individually small.

Determinism contract: ``order_cols`` must totally order the rows within
each group (build the relation with a groupBy on the order key first, as
binary_auc/ks_test do, or use a unique key). With duplicate order keys
the split of ties across the exclusive/inclusive boundary is
tie-order-dependent — exactly as it is under a raw running window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "partitioned_prefix_sum",
    "partitioned_prefix_extremum",
    "weighted_quantile",
]


def partitioned_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_cols,
    out_cols=None,
    *,
    group_cols: list | None = None,
    inclusive: bool = False,
) -> DataFrame:
    """Append running-sum columns over the total order ``order_cols``
    (within ``group_cols`` if given) without any single-partition data
    stage. ``inclusive=False`` sums rows strictly BEFORE each row
    (exclusive prefix, 0 for the first row); ``inclusive=True`` includes
    the row itself. Multiple ``value_cols`` share one pass. All input
    columns are preserved; ``out_cols`` default to ``<value>_cum``.
    """
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    out_cols = list(out_cols) if out_cols else [f"{v}_cum" for v in value_cols]
    if len(out_cols) != len(value_cols):
        raise ValueError("out_cols must match value_cols in length")
    group_cols = list(group_cols or [])
    order_cols = list(order_cols)

    # NOT df.rdd.getNumPartitions() (plan-to-RDD conversion; single-file
    # inputs would collapse the range exchange to one partition) —
    # shuffle.partitions is the knob deployments size to their data.
    spark = df.sparkSession
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        spark.sparkContext.defaultParallelism,
        2,
    )
    ranged = df.repartitionByRange(
        n_part, *group_cols, *order_cols
    ).sortWithinPartitions(*group_cols, *order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    bound = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, bound)
    )
    if not group_cols:
        # Driver-side cumsum over #partitions numbers (never data) — the
        # packing/_exclusive_prefix_sum scheme verbatim, so the main
        # plan carries NO single-partition exchange at all. The ranged
        # relation is persisted so the totals pass and the main plan
        # share one upstream computation (released via cache.py).
        from swivel_spark_prep_spark.cache import track_persist

        with_pid = track_persist(with_pid)
        local = with_pid.select(
            "*",
            *[
                F.coalesce(F.sum(v).over(w_local), F.lit(0)).alias(f"_loc_{v}")
                for v in value_cols
            ],
        )
        totals = {
            r["_pid"]: tuple(r[f"_t_{v}"] for v in value_cols)
            for r in with_pid.groupBy("_pid")
            .agg(*[F.sum(v).alias(f"_t_{v}") for v in value_cols])
            .collect()
        }
        offsets, acc = {}, [0] * len(value_cols)
        for pid in sorted(totals):
            offsets[pid] = tuple(acc)
            acc = [a + (t or 0) for a, t in zip(acc, totals[pid])]
        if len(offsets) <= 64:
            out = local
            for i, (v, o) in enumerate(zip(value_cols, out_cols)):
                off = F.coalesce(
                    *[
                        F.when(F.col("_pid") == p, F.lit(offs[i]))
                        for p, offs in offsets.items()
                    ]
                    or [F.lit(0)],
                    F.lit(0),
                )
                out = out.withColumn(o, F.col(f"_loc_{v}") + off)
        else:
            off_df = spark.createDataFrame(
                [(int(p),) + tuple(offs) for p, offs in offsets.items()],
                ["_pid"] + [f"_off_{v}" for v in value_cols],
            )
            out = local.join(F.broadcast(off_df), "_pid")
            for v, o in zip(value_cols, out_cols):
                out = out.withColumn(o, F.col(f"_loc_{v}") + F.col(f"_off_{v}"))
            out = out.drop(*[f"_off_{v}" for v in value_cols])
    else:
        # Grouped: offsets come from a window over the TOTALS relation
        # (≤ n_part + #groups rows, broadcast back). The window's
        # partition spec is the group — non-empty, so no
        # Exchange SinglePartition anywhere, and the whole plan stays
        # lazy (no driver-side pass).
        local = with_pid.select(
            "*",
            *[
                F.coalesce(F.sum(v).over(w_local), F.lit(0)).alias(f"_loc_{v}")
                for v in value_cols
            ],
        )
        totals = with_pid.groupBy("_pid", *group_cols).agg(
            *[F.sum(v).alias(f"_t_{v}") for v in value_cols]
        )
        w_off = (
            Window.partitionBy(*group_cols)
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        off_df = totals.select(
            "_pid",
            *group_cols,
            *[
                F.coalesce(F.sum(f"_t_{v}").over(w_off), F.lit(0)).alias(
                    f"_off_{v}"
                )
                for v in value_cols
            ],
        )
        out = local.join(F.broadcast(off_df), ["_pid", *group_cols])
        for v, o in zip(value_cols, out_cols):
            out = out.withColumn(o, F.col(f"_loc_{v}") + F.col(f"_off_{v}"))
        out = out.drop(*[f"_off_{v}" for v in value_cols])

    return out.drop("_pid", *[f"_loc_{v}" for v in value_cols])


def partitioned_prefix_extremum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str | None = None,
    *,
    group_cols: list | None = None,
    inclusive: bool = False,
    agg: str = "max",
) -> DataFrame:
    """Running MAX/MIN over the total order ``order_cols`` (within
    ``group_cols``), same two-pass scheme as
    :func:`partitioned_prefix_sum` — range-partition + partition-local
    window + per-partition extremum offsets — so no single-partition
    data stage appears anywhere. ``order_cols`` may contain descending
    Column expressions (``F.col("x").desc()``); the range partitioner,
    the local sort and the local window all honor them.

    Rows whose prefix is empty (the global/group first row under
    ``inclusive=False``) get NULL — the honest "no preceding value"
    answer (there is no additive identity for max the way 0 is for
    sum). Downstream, ``F.greatest``/``F.least`` skip NULLs, which is
    exactly how the offsets are merged here.

    The skyline/Pareto operator is the motivating consumer: the
    2-D front is "keep x-groups whose best y beats the running max of
    all better-x groups" — a prefix max over the distinct-x relation.
    """
    if agg not in ("max", "min"):
        raise ValueError(f"agg must be 'max' or 'min', got {agg!r}")
    agg_fn = F.max if agg == "max" else F.min
    comb = F.greatest if agg == "max" else F.least
    out_col = out_col or f"{value_col}_{agg}"
    group_cols = list(group_cols or [])
    order_cols = list(order_cols)

    spark = df.sparkSession
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        spark.sparkContext.defaultParallelism,
        2,
    )
    ranged = df.repartitionByRange(
        n_part, *group_cols, *order_cols
    ).sortWithinPartitions(*group_cols, *order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    bound = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, bound)
    )
    if not group_cols:
        # driver-side running extremum over <= n_part partition totals
        from swivel_spark_prep_spark.cache import track_persist

        with_pid = track_persist(with_pid)
        local = with_pid.select(
            "*", agg_fn(value_col).over(w_local).alias("_loc")
        )
        totals = {
            r["_pid"]: r["_t"]
            for r in with_pid.groupBy("_pid")
            .agg(agg_fn(value_col).alias("_t"))
            .collect()
        }
        offsets: dict[int, object] = {}
        acc = None
        py_comb = max if agg == "max" else min
        for pid in sorted(totals):
            offsets[pid] = acc
            t = totals[pid]
            if t is not None:
                acc = t if acc is None else py_comb(acc, t)
        # only pids with a non-empty prefix need an offset; the rest
        # keep their local extremum (NULL offset would be skipped by
        # greatest/least anyway, but an empty when-chain cannot type)
        nonnull = {p: o for p, o in offsets.items() if o is not None}
        if nonnull:
            off = F.when(F.lit(False), F.lit(None))
            for p, o in nonnull.items():
                off = off.when(F.col("_pid") == p, F.lit(o))
            out = local.withColumn(out_col, comb(F.col("_loc"), off))
        else:
            out = local.withColumn(out_col, F.col("_loc"))
    else:
        local = with_pid.select(
            "*", agg_fn(value_col).over(w_local).alias("_loc")
        )
        totals = with_pid.groupBy("_pid", *group_cols).agg(
            agg_fn(value_col).alias("_t")
        )
        w_off = (
            Window.partitionBy(*group_cols)
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        off_df = totals.select(
            "_pid", *group_cols, agg_fn("_t").over(w_off).alias("_off")
        )
        out = local.join(F.broadcast(off_df), ["_pid", *group_cols]).withColumn(
            out_col, comb(F.col("_loc"), F.col("_off"))
        )
        out = out.drop("_off")
    return out.drop("_pid", "_loc")


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs,
    *,
    group_cols: list | None = None,
) -> DataFrame:
    """Weighted quantiles per group: the left-continuous inverse CDF
    v(q) = min{ v : Σ_{v' ≤ v} w(v') ≥ q·W } — the quantile a
    sample-weighted survey, an importance-weighted corpus mix, or a
    token-budget allocation actually needs (plain percentile_/median
    treats every row as weight 1). With all weights 1 it reduces to the
    "lower" quantile of the unweighted values (pinned in tests).

    Scale design: collapse to the per-(group, value) weight relation
    (hash aggregate, value-cardinality), one INCLUSIVE
    :func:`partitioned_prefix_sum` in value order for the running
    weight, then for each requested q one filter + min-aggregate
    against the broadcast per-group totals — no window over data, no
    sort of the corpus, one prefix pass shared by ALL requested qs.
    Zero/negative weights are rejected upstream of the CDF (a zero
    weight cannot move a quantile; negatives make the CDF non-monotone
    — refused loudly). NULL values are excluded. Output: one row per
    (group, q): (group..., q, value).
    """
    qs = [qs] if isinstance(qs, (int, float)) else list(qs)
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"each q must be in (0, 1], got {qs}")
    group_cols = list(group_cols or [])
    base = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.col(weight_col).cast("double").alias("_w"),
    ).filter(F.col("_v").isNotNull() & F.col("_w").isNotNull())
    # negative weights: refuse loudly. The guard must be LOAD-BEARING —
    # a dropped assert_true column gets pruned by Catalyst and never
    # evaluates — so the weight itself is routed through the check:
    # assert_true returns NULL on success, raises on violation.
    base = base.select(
        *group_cols,
        "_v",
        F.when(
            F.assert_true(
                F.col("_w") >= 0, F.lit("weighted_quantile: negative weight")
            ).isNull(),
            F.col("_w"),
        ).alias("_w"),
    ).filter(F.col("_w") > 0)
    dv = base.groupBy(*group_cols, "_v").agg(F.sum("_w").alias("_wsum"))
    cum = partitioned_prefix_sum(
        dv,
        ["_v"],
        "_wsum",
        ["_cw"],
        group_cols=group_cols or None,
        inclusive=True,
    )
    totals = dv.groupBy(*group_cols).agg(F.sum("_wsum").alias("_W"))
    if group_cols:
        joined = cum.join(F.broadcast(totals), group_cols)
    else:
        joined = cum.crossJoin(F.broadcast(totals))
    # ALL qs from ONE aggregate (round-16 optimization): the previous
    # form ran filter + min-aggregate once per q and unioned the
    # results, so the whole CDF lineage (collapse + prefix pass) was
    # replicated — and re-executed — |qs| times per call (measured: a
    # 9-q call over the same relation carried 9 copies of the prefix
    # pass in the plan; qq_drift's two calls made it 18). A conditional
    # min per q over the SAME prefix relation is the identical
    # left-continuous inverse CDF — min over {v : cw ≥ q·W} — computed
    # in one pass, then unpivoted to the same (group..., q, value) rows.
    agg = joined.groupBy(*group_cols).agg(
        *[
            F.min(
                F.when(
                    F.col("_cw") >= F.lit(float(q)) * F.col("_W"), F.col("_v")
                )
            ).alias(f"_q_{i}")
            for i, q in enumerate(qs)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"), F.col(f"_q_{i}").alias("value")
            )
            for i, q in enumerate(qs)
        ]
    )
    return agg.select(*group_cols, F.explode(pairs).alias("_p")).select(
        *group_cols, F.col("_p.q").alias("q"), F.col("_p.value").alias("value")
    )
