"""Engine operators — library functions over public DataFrame APIs.

Design decision (SURVEY.md §4.3): operators are composable functions, not
custom Catalyst rules — simpler, version-stable, and the declared contract
never requires plan-level hooks.
"""

from swivel_spark_prep_spark.operators.swivel import SwivelPrepResult, prep  # noqa: F401
from swivel_spark_prep_spark.operators.asof import asof_join  # noqa: F401


def nullsafe_broadcast_join(rows, agg_df, key_cols, prefix="__k_"):
    """Broadcast join ``agg_df`` (a small per-group relation) back onto
    ``rows`` with NULL-SAFE key equality — groupBy and window
    partitioning both treat NULL as a group, so a plain equi-join-back
    silently drops NULL-keyed rows (the bug class fixed in
    mad_outliers and stratified_split; this is the shared helper).
    With no keys, a plain broadcast crossJoin (1-row aggregates)."""
    from pyspark.sql import functions as F

    if not key_cols:
        return rows.crossJoin(F.broadcast(agg_df))
    a = agg_df
    for c in key_cols:
        a = a.withColumnRenamed(c, f"{prefix}{c}")
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"{prefix}{c}"))
    return rows.join(F.broadcast(a), cond).drop(
        *[f"{prefix}{c}" for c in key_cols]
    )
