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


def compact(
    spark,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    out_path: str | None = None,
) -> int:
    """Rewrite a parquet dataset into ~target-sized files and return the
    new file count. Small-file proliferation is the classic failure mode
    of incremental pipelines at scale (every micro-batch/increment leaves
    a shard; a 100 TB table with 10⁷ tiny files is unreadable): compaction
    sizes output files from the dataset's actual bytes, never a fixed
    partition count. Writes to `out_path` (default: alongside as
    `<path>__compacted`) — the caller swaps directories; an in-place
    rewrite that fails mid-way would destroy data."""
    import math

    from py4j.java_gateway import java_import

    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    hadoop_path = jvm.Path(path)
    fs = hadoop_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    out = out_path or f"{path.rstrip('/')}__compacted"
    df = spark.read.parquet(path)
    # coalesce, not repartition: no shuffle — each output task reads a
    # contiguous set of input files
    df.coalesce(n_files).write.mode("overwrite").parquet(out)
    return n_files


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort by `cluster_cols` before writing: every
    output file holds a contiguous key range, so parquet row-group min/max
    statistics let filtered scans skip whole files (data skipping without
    a table format). The complement of `write_bucketed`: bucketing
    co-locates equal keys for joins; clustering orders keys for range
    predicates."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


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
