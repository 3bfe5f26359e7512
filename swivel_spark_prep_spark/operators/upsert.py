"""Batch upsert (MERGE semantics) for incremental pipelines.

Plain Spark over parquet has no transactional MERGE (that is the lakehouse
formats' job); what an incremental pipeline needs from the ENGINE is the
relational core: apply a changes batch to a base snapshot — update rows
whose key matches, insert rows whose key is new, optionally delete — and
write the result as the next snapshot. That core is one full-outer join
on the key, expressed declaratively. Multi-writer commit safety on top
of this core lives in operators/versioned.py (put-if-absent commit log
with optimistic rebase).

Scale note: Spark cannot BROADCAST a full-outer join (both sides may
produce unmatched rows, so both must be complete at every task — the
plan is a sort-merge/shuffled-hash join regardless of side sizes;
verified in this repo's plans). The scale lever is therefore
CO-LOCATION, not broadcast: bucket the base snapshot on the key
(sinks.write_bucketed) and write each new snapshot bucketed the same
way, so successive upserts sort-merge without re-shuffling the big
side — the same pattern as dedup.exact_dedup_incremental's seen-hash
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    evolve_schema: bool = False,
    full_row: bool = False,
) -> DataFrame:
    """Next snapshot: base rows overwritten by matching ``changes`` rows
    (matched on ``key_cols``), plus brand-new changes rows appended.

    Value columns are taken from the changes side when present
    (``coalesce(change.col, base.col)`` — a changes batch may carry a
    subset of value columns; missing ones keep the base value). That
    partial-update default cannot set a value TO NULL; pass
    ``full_row=True`` for CDC-style semantics where a matched change
    row replaces every carried column verbatim, NULLs included (the
    mode snapshot_diff's round-trip law needs). When ``delete_col``
    names a boolean column on ``changes``, rows flagged true are
    dropped instead of upserted.

    With ``evolve_schema=True``, change columns missing from the base
    schema are ADDED (base rows get NULL) instead of rejected — the
    lakehouse mergeSchema behavior; the default stays strict because a
    typo'd column name silently evolving is worse than an error.

    ``changes`` must carry at most ONE row per key (one action per key —
    the usual contract of a change batch; a multi-action batch must be
    pre-collapsed, e.g. keep the latest by a version column). Duplicate
    change keys would fan out the join. Key columns must be NON-NULL on
    both sides: the join uses plain equality, not ``<=>`` — null-safe
    equality disables bucketed co-location (measured: 0 exchanges with
    ``=`` on bucketed tables, 2 with ``<=>``), and a NULL merge key is a
    data bug better surfaced than silently matched.
    """
    val_cols = [c for c in base.columns if c not in key_cols]
    ch_vals = [c for c in changes.columns if c not in key_cols and c != delete_col]
    unknown = set(ch_vals) - set(val_cols)
    if unknown:
        if not evolve_schema:
            raise ValueError(
                f"changes columns not in base schema: {sorted(unknown)} "
                "(pass evolve_schema=True to add them)"
            )
        # schema evolution (the lakehouse mergeSchema behavior): new
        # change columns join the snapshot schema; pre-existing base rows
        # carry NULL. Column order = base columns then new ones, so
        # successive snapshots only ever append columns.
        for c in changes.select(*sorted(unknown)).schema.fields:
            base = base.withColumn(c.name, F.lit(None).cast(c.dataType))
            val_cols.append(c.name)
    ch = changes.select(
        *[F.col(c).alias(f"__c_{c}") for c in key_cols],
        *[F.col(c).alias(f"__v_{c}") for c in ch_vals],
        *(
            [F.col(delete_col).alias("__del")]
            if delete_col is not None
            else [F.lit(False).alias("__del")]
        ),
        F.lit(True).alias("__hit"),
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (base[c] == F.col(f"__c_{c}"))
    joined = base.join(ch, cond, "full_outer")
    out_keys = [
        F.coalesce(base[c], F.col(f"__c_{c}")).alias(c) for c in key_cols
    ]
    if full_row:
        out_vals = [
            F.when(F.col("__hit"), F.col(f"__v_{c}")).otherwise(base[c]).alias(c)
            if c in ch_vals
            else base[c].alias(c)
            for c in val_cols
        ]
    else:
        out_vals = [
            F.coalesce(F.col(f"__v_{c}"), base[c]).alias(c)
            if c in ch_vals
            else base[c].alias(c)
            for c in val_cols
        ]
    return (
        joined.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        .select(*out_keys, *out_vals)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    op_col: str = "_op",
) -> DataFrame:
    """Change-data feed between two snapshots — the inverse of
    :func:`upsert`: one row per changed key with ``op_col`` ∈
    {'I','U','D'}. Inserts/updates carry the NEW values, deletes carry
    the OLD values (CDC convention: consumers need the key, and the
    last-known row is more useful than nulls). Unchanged keys emit
    nothing. Value comparison is null-safe per column.

    Round-trip law (test-pinned): applying the diff back with
    ``upsert(old, diff, keys, delete_col=(op=='D'), full_row=True)``
    reproduces ``new`` exactly (full_row because an update may set a
    column to NULL). One declarative full-outer join on the keys — same
    co-location lever as upsert (bucket both snapshots on the key).

    Key columns must be NON-NULL in both snapshots — the same contract
    (and for the same reasons) as :func:`upsert`: the join uses plain
    equality, so a key NULL in both snapshots would never match itself
    and would surface as a spurious D+I pair; and ``<=>`` would disable
    bucketed co-location. A NULL snapshot key is a data bug better
    surfaced upstream than silently diffed.
    """
    val_cols = [c for c in old.columns if c not in key_cols]
    if set(new.columns) != set(old.columns):
        raise ValueError(
            f"snapshots must share a schema: {sorted(old.columns)} vs "
            f"{sorted(new.columns)}"
        )
    o = old.select(
        *[F.col(c).alias(f"__ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in val_cols],
        F.lit(True).alias("__o_hit"),
    )
    nw = new.select(
        *[F.col(c).alias(f"__nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"__nv_{c}") for c in val_cols],
        F.lit(True).alias("__n_hit"),
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (F.col(f"__ok_{c}") == F.col(f"__nk_{c}"))
    j = o.join(nw, cond, "full_outer")
    same_vals = F.lit(True)
    for c in val_cols:
        same_vals = same_vals & F.col(f"__nv_{c}").eqNullSafe(F.col(f"__ov_{c}"))
    op = (
        F.when(F.col("__o_hit").isNull(), F.lit("I"))
        .when(F.col("__n_hit").isNull(), F.lit("D"))
        .when(~same_vals, F.lit("U"))
    )  # both present & equal → NULL → filtered out
    out_keys = [
        F.coalesce(F.col(f"__ok_{c}"), F.col(f"__nk_{c}")).alias(c)
        for c in key_cols
    ]
    out_vals = [
        F.when(F.col(op_col) == "D", F.col(f"__ov_{c}"))
        .otherwise(F.col(f"__nv_{c}"))
        .alias(c)
        for c in val_cols
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*out_keys, *out_vals, op_col)
    )


def refresh_agg(
    agg: DataFrame,
    old: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
    op_col: str = "_op",
) -> DataFrame:
    """Incremental maintenance of a grouped COUNT/SUM aggregate — the
    materialized-view delta-refresh (Gupta & Mumick, "Maintenance of
    Materialized Views: Problems, Techniques, and Applications"): given
    the current aggregate ``agg`` (``group_cols`` + ``count_col`` +
    one ``sum_<c>`` per sum col), the OLD base snapshot, and a change
    feed in :func:`snapshot_diff` convention (I/U rows carry NEW values,
    D rows carry OLD values), produce the aggregate of the new snapshot
    WITHOUT rescanning it.

    Contributions: positive = I and U rows (new values); negative =
    D rows (their old values travel in the feed) plus the OLD base rows
    of the U keys (one semi-join against ``old`` — the only base-table
    access, proportional to the update keys, not the table). The group
    delta is a full-outer merge into ``agg``; groups whose count reaches
    zero disappear (SQL GROUP BY semantics). Cost is O(changes), which
    is the entire point at 100 TB: a million-row change feed refreshes a
    billion-row table's aggregate without touching it.

    Equality with the from-scratch aggregate over the new snapshot is
    oracle-checked (X78). Sums are doubles, so incremental and direct
    results agree to float accumulation order (round before hashing,
    as everywhere else).
    """
    pos = (
        changes.filter(F.col(op_col).isin("I", "U"))
        .groupBy(*group_cols)
        .agg(F.count("*").alias("__pc"), *[
            F.sum(c).alias(f"__ps_{c}") for c in sum_cols
        ])
    )
    u_keys = changes.filter(F.col(op_col) == "U").select(*key_cols).distinct()
    neg_rows = old.join(u_keys, key_cols, "left_semi").select(
        *group_cols, *sum_cols
    ).unionByName(
        changes.filter(F.col(op_col) == "D").select(*group_cols, *sum_cols)
    )
    neg = neg_rows.groupBy(*group_cols).agg(
        F.count("*").alias("__nc"),
        *[F.sum(c).alias(f"__ns_{c}") for c in sum_cols],
    )
    # GROUP BY treats NULL as one group, so the merges must use
    # NULL-SAFE equality — a plain full-outer on group_cols would leave
    # the NULL group's aggregate row unmatched with its delta (stale
    # count + an orphan delta), silently diverging from a re-aggregate.
    def _nullsafe_outer(left, right, lprefix, rprefix):
        lt = left.select(
            *[F.col(c).alias(f"{lprefix}{c}") for c in group_cols],
            *[c for c in left.columns if c not in group_cols],
        )
        rt = right.select(
            *[F.col(c).alias(f"{rprefix}{c}") for c in group_cols],
            *[c for c in right.columns if c not in group_cols],
        )
        cond = F.lit(True)
        for c in group_cols:
            cond = cond & F.col(f"{lprefix}{c}").eqNullSafe(F.col(f"{rprefix}{c}"))
        j = lt.join(rt, cond, "full_outer")
        return j.select(
            *[
                F.coalesce(F.col(f"{lprefix}{c}"), F.col(f"{rprefix}{c}")).alias(c)
                for c in group_cols
            ],
            *[c for c in left.columns if c not in group_cols],
            *[c for c in right.columns if c not in group_cols],
        )

    delta = _nullsafe_outer(pos, neg, "__pg_", "__ng_").select(
        *group_cols,
        (F.coalesce("__pc", F.lit(0)) - F.coalesce("__nc", F.lit(0))).alias(
            "__dc"
        ),
        *[
            (
                F.coalesce(f"__ps_{c}", F.lit(0.0))
                - F.coalesce(f"__ns_{c}", F.lit(0.0))
            ).alias(f"__ds_{c}")
            for c in sum_cols
        ],
    )
    merged = _nullsafe_outer(agg, delta, "__ag_", "__dg_").select(
        *group_cols,
        (
            F.coalesce(count_col, F.lit(0)) + F.coalesce("__dc", F.lit(0))
        ).alias(count_col),
        *[
            (
                F.coalesce(f"sum_{c}", F.lit(0.0))
                + F.coalesce(f"__ds_{c}", F.lit(0.0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return merged.filter(F.col(count_col) > 0)


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    attr_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change feed — the
    warehouse-side consumer of the CDC feeds snapshot_diff (X63) and
    VersionedTable.read_changes (X66) produce.

    ``changes`` holds one row per (key, version) with ``op_col`` in
    {'I','U','D'} and the attribute values as of that version. Each
    I/U change opens an interval ``[version, next-change-version)``;
    the successor change (any op) closes it; a D closes its
    predecessor's interval without opening one. The open interval per
    key has ``valid_to`` NULL and ``is_current`` true.

    Plan: ONE window (lead over the per-key version order) — the
    partition key is the dimension key, so the shuffle is the same
    hash-on-key every upsert already does; no global sort. Versions
    must be unique per key (assert upstream; CDC feeds are).

    Output: key_cols + (valid_from, valid_to, is_current) + attr_cols.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).asc())
    with_next = changes.withColumn("__next_v", F.lead(version_col).over(w))
    return with_next.filter(F.col(op_col) != "D").select(
        *key_cols,
        F.col(version_col).alias("valid_from"),
        F.col("__next_v").alias("valid_to"),
        F.col("__next_v").isNull().alias("is_current"),
        *attr_cols,
    )
