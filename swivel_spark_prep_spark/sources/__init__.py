"""Sources: corpus text, JSONL, CSV, and the fixture parquet catalog.

The reference consumes a line-oriented text corpus (one document/sentence
per line, whitespace tokens — SURVEY.md §1.1 D1). ``read_corpus_text``
reproduces that contract on Spark's distributed text reader; the other
readers round out the engine's ingestion surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_all, load_table, register_views  # noqa: F401
from swivel_spark_prep_spark.session import configure_runtime


def read_corpus_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented corpus → (doc_id, text). doc_id is unique but not
    dense (monotonically_increasing_id) — swivel semantics only need
    line-locality, never global line numbers, so no zipWithIndex pass is
    spent on it."""
    configure_runtime(spark)
    return (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("value").alias("text"),
        )
        .filter(F.length("text") > 0)
    )


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    configure_runtime(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True
) -> DataFrame:
    configure_runtime(spark)
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar/vectorized/pushdown properties as parquet
    (Spark's native OrcFileFormat); schema always comes from the files."""
    configure_runtime(spark)
    return spark.read.orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    configure_runtime(spark)
    return spark.read.parquet(path)


def read_tfrecord_records(spark: SparkSession, path: str) -> DataFrame:
    """Distributed TFRecord source: (file, record_idx, payload) — one row
    per framed record, both CRCs verified executor-side.

    Built on Spark's binaryFile source (one task per file; TFRecord shard
    files are bounded by the writer's shard size, so a whole file per
    task is the right granularity) + a mapInPandas framing parser
    (sinks.tfrecord.parse_tfrecord_stream). Pair with
    sinks.tfrecord.decode_example to get feature dicts back — the exact
    inverse of the shard writer, round-trip-tested.
    """
    from collections.abc import Iterator

    import pandas as pd

    from swivel_spark_prep_spark.sinks.tfrecord import parse_tfrecord_stream

    configure_runtime(spark)
    bf = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for idx, payload in enumerate(
                    parse_tfrecord_stream(bytes(content))
                ):
                    rows.append((fpath, idx, payload))
            yield pd.DataFrame(
                rows, columns=["file", "record_idx", "payload"]
            )

    return bf.mapInPandas(
        _parse, schema="file string, record_idx long, payload binary"
    )
