"""SparkSession factory with the engine's required configuration.

Required confs (SURVEY.md §1.3):
- ``spark.sql.session.timeZone=UTC`` — keeps TIMESTAMP_NTZ comparisons
  aligned with the DuckDB oracle.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — events.parquet stores
  INT64 TIMESTAMP(NANOS) which Spark 4.1 otherwise refuses to read
  ([PARQUET_TYPE_ILLEGAL]); the catalog converts the long back to
  timestamp_ntz.
- AQE on — runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast: the scale levers we rely on at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe to set at runtime on an existing session.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalesces most shuffles anyway, but streaming state shuffles are
    # not AQE-planned — a vanilla 200-partition session pays 6× overhead on
    # local[32]; at cluster scale this is sized per deployment.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # bigger Arrow batches cut driver-fetch conversion ~20% on wide
    # results (measured Q28 sf0.1); also the pandas-UDF batch size — at
    # cluster scale balance against per-task memory
    "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
    # InferFiltersFromGenerate rewrites explode(f(x)) into
    # Filter(size(f(x)) > 0 AND isnotnull(f(x))) + explode(f(x)) — the
    # FULL generator-input expression is duplicated into the filter, which
    # then pushes below exchanges down to the scan. For cheap column
    # references that prunes empty arrays early; for computed inputs
    # (shingle/n-gram/signature pipelines, any transform(...) feeding an
    # explode) it evaluates the expensive expression TWICE per row, the
    # first time before any repartition can parallelize it. Measured on
    # the shingle path (sf0.1, 5000 docs): 5.9 s → 0.4 s scan+explode,
    # X38 contamination 8.5 s → 1.3 s end-to-end. Generator inputs in
    # this engine are always computed arrays, so the rule is globally
    # excluded.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}

#: Confs that must be set before the JVM starts.
STARTUP_CONFS = {
    "spark.driver.memory": "12g",
    "spark.ui.enabled": "false",
}


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (e.g. one the
    verify driver created without our settings)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this build — session factory already set it
    return spark


def get_session(
    app_name: str = "swivel-spark-prep-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (``local[*]`` if the
    env var is unset) — the bench contract (TESTDATA.md / BASELINE.md).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**STARTUP_CONFS, **RUNTIME_CONFS, **(conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return configure_runtime(spark)
