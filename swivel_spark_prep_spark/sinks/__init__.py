"""Sinks: parquet (native), text (native), TFRecord (pure-Python writer),
partitioned and bucketed table writers.

Bucketing is the 100 TB co-location primitive: two tables bucketed (and
sorted) on the same join key with the same bucket count join with NO
exchange and NO sort — the scan partitioning already satisfies the join's
distribution requirement (asserted by tests/test_plans.py). Partitioned
writes give partition pruning on read for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet — reads with an equality/IN filter
    on the partition columns prune directories before any IO."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    num_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+ optionally sorted) parquet table, registered in the
    session catalog with an explicit external `path`. Joins/aggregations
    keyed on `bucket_cols` between tables with matching bucketing read
    co-located data: no exchange, and with `sort_cols` no sort either
    (sort-merge join directly on the scan)."""
    writer = df.write.mode(mode).format("parquet").option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
