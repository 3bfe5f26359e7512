"""swivel_spark_prep_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference `src-d/swivel-spark-prep` (the Spark
preparation stage of the Swivel embedding pipeline — see SURVEY.md §1),
extended with a full relational surface and LLM-data-pipeline operators
(dedup, similarity search, text analysis) designed for 100 TB scale.

Layout:
- ``session``   — configured SparkSession factory (UTC, nanos adapter, AQE).
- ``catalog``   — fixture loader (parquet → DataFrames / temp views).
- ``queries``   — the declared query registry (SURVEY.md §2) + extras.
- ``operators`` — as-of join, dedup (exact / MinHash-LSH / SimHash),
                  similarity search, text stats, swivel prep pipeline.
- ``sources``   — readers (parquet with ns-timestamp adapter, text, JSON).
- ``sinks``     — writers (parquet, text, TFRecord via pure-Python encoder).
- ``streaming`` — Structured Streaming wrappers for windowed aggregates.
- ``plans``     — explain/plan-assertion helpers used by plan tests.
"""

from swivel_spark_prep_spark.session import get_session  # noqa: F401
from swivel_spark_prep_spark.catalog import load_table, register_views  # noqa: F401

__version__ = "0.1.0"
