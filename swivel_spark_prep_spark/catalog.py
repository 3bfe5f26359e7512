"""Fixture catalog: load the driver-generated parquet tables.

Tables (FIXTURES.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

Loading contract (FIXTURES.md "Loading contract", verified by the survey):
``events.ts`` is INT64 TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as LongType and we
convert ns → µs → TIMESTAMP_NTZ. ``o_orderdate`` / ``l_shipdate`` are µs
and already read as TIMESTAMP_NTZ — the conversion is conditional on the
*read dtype*, never the column name alone.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from swivel_spark_prep_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns that are logically timestamps; only converted when they arrive
#: as LongType (the nanos case).
TS_COLS = frozenset({"ts", "o_orderdate", "l_shipdate"})


#: Per-session memo of loaded fixture tables. Every ``spark.read.parquet``
#: re-reads the footer and rebuilds the file index (~100 ms/table at sf1)
#: and the downstream query pays a fresh analysis pass — measured 0.4–0.6 s
#: per *rebuilt* Q13 vs 53 ms re-executing the same DataFrame. Fixture
#: parquet is immutable and DataFrames are immutable, so sharing the
#: analyzed base relation across queries is safe; it is the same metadata
#: reuse a registered catalog table (or DuckDB's CREATE VIEW) gets. Keyed
#: weakly on the session so a stopped session's handles are collectable.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, applying the conditional ns→µs adapter.

    Memoized per (session, sf_dir, table): the base relation handle is
    reused so repeated query construction skips footer/schema re-reads.
    """
    per = _TABLE_MEMO.get(spark)
    if per is None:
        per = {}
        _TABLE_MEMO[spark] = per
        configure_runtime(spark)
    key = (os.path.abspath(sf_dir), name)
    cached = per.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name in TS_COLS and isinstance(field.dataType, LongType):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(
                    (F.col(field.name) / F.lit(1000)).cast("long")
                ).cast("timestamp_ntz"),
            )
    per[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view (for spark.sql)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
