"""Z-order (Morton) layout — multi-dimensional data skipping.

Range-partitioning sorts on ONE leading column, so parquet min/max
stats prune scans filtered on that column only; a filter on the second
dimension reads everything. Interleaving the bits of k bucketized
columns into one Morton value and range-partitioning on THAT gives
every dimension locality: each output file covers a small rectangle of
the key space, so min/max stats prune on ANY filtered dimension — the
standard lakehouse OPTIMIZE ZORDER BY technique, reduced to its core.
At 100 TB this is the difference between scanning one dimension's
stripe and scanning ~sqrt-of-corpus per 2-dim point lookup.

The z-value is a pure integer expression (shift/mask/sum), generated
once as SQL text and evaluated identically by Spark and DuckDB —
the same generated-twin trick as operators/bpe.py, so the X65 oracle
pins the bit layout itself. Columns must already be non-negative ints
below 2^n_bits (bucketize first: ``col % 2^n_bits`` or a width_bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_sql", "zorder_value", "zorder_layout"]


def zorder_sql(cols: list[str], n_bits: int = 16) -> str:
    """Morton-interleave SQL for ``cols`` (dimension j contributes bit i
    to output bit i*k + j). Valid Spark SQL and DuckDB SQL verbatim."""
    if not cols or n_bits * len(cols) > 62:
        raise ValueError(f"need 1+ cols and n_bits*k <= 62, got {cols} {n_bits}")
    k = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * k + j})"
        for i in range(n_bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_value(cols: list[str], n_bits: int = 16) -> Column:
    return F.expr(zorder_sql(cols, n_bits)).cast("long")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_bits: int = 16,
    n_files: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` so every output file covers a compact hyper-
    rectangle of the (bucketized) ``cols`` space: range-partition +
    sort on the Morton value, then drop it. Write the result with any
    parquet writer; per-file min/max stats become selective on every
    z-ordered dimension (locality property pinned by test)."""
    buck = [
        F.pmod(F.col(c).cast("long"), F.lit(1 << n_bits)).alias(f"__zb_{i}")
        for i, c in enumerate(cols)
    ]
    with_z = df.select("*", *buck).withColumn(
        "__z", zorder_value([f"__zb_{i}" for i in range(len(cols))], n_bits)
    )
    # default file count from the session's parallelism — NOT df.rdd
    # (touching .rdd forces a full plan-to-RDD conversion just to read a
    # partition count)
    n = n_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    return (
        with_z.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__zb_{i}" for i in range(len(cols))])
    )
