"""Per-key statistical normalization — the skew-proof two-pass form.

Q44 (queries/declared.py) normalizes per-user via applyInPandas on a
salted user bucket — deliberately, to exercise the Arrow grouped-map
surface. Bucketing amortizes per-group Python overhead, but it cannot
SPLIT a key: one Zipf-hot user whose rows alone exceed an executor
partition still serializes through a single Arrow batch (the round-4/5
scale watch-item on Q44).

This module is the formulation that survives that case: per-key moments
via a hash aggregate — partial aggregation (map-side combine) absorbs
hot keys before the shuffle, so no single task ever holds a whole key's
rows — joined back and applied as a pure projection. Zero Python, two
narrow shuffles (agg + join, both on the key, AQE-splittable), identical
results to the grouped-map form (pinned by test_normalize_two_pass_
equals_q44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_per_key"]


def normalize_per_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "v_norm",
) -> DataFrame:
    """z-score `value_col` within each `key_col` group: (v - mean) / stddev_samp.

    NULL when the group has fewer than 2 rows (stddev_samp undefined) or
    zero variance — the same semantics as the window-SQL formulation.
    """
    stats = df.groupBy(key_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sd"),
    )
    return (
        df.join(stats, key_col)
        .withColumn(out_col, (F.col(value_col) - F.col("_mu")) / F.col("_sd"))
        .drop("_mu", "_sd")
    )
