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
) -> DataFrame:
    """Next snapshot: base rows overwritten by matching ``changes`` rows
    (matched on ``key_cols``), plus brand-new changes rows appended.

    Value columns are taken from the changes side when present
    (``coalesce(change.col, base.col)`` — a changes batch may carry a
    subset of value columns; missing ones keep the base value). When
    ``delete_col`` names a boolean column on ``changes``, rows flagged
    true are dropped instead of upserted.

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
