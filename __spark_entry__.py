"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``swivel_spark_prep_spark`` (SURVEY.md §2 is the
contract; queries/declared.py maps every declared operator to an
idiomatic-Spark plan).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from swivel_spark_prep_spark.queries.declared import (  # noqa: E402
    DECLARED_ORACLES,
    DECLARED_QUERIES,
)

try:  # extras are optional at import time so a broken extra never takes
    # down the declared contract
    from swivel_spark_prep_spark.queries.extra import (  # noqa: E402
        EXTRA_ORACLES,
        EXTRA_QUERIES,
    )
except Exception:  # pragma: no cover
    EXTRA_QUERIES, EXTRA_ORACLES = {}, {}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full swivel-prep pipeline (vocab → ids → cooc →
    modulo shards → per-shard nnz/mass) on sf0.001 — the reference's whole
    reason to exist, end-to-end (SURVEY.md §2 Q35)."""
    return DECLARED_QUERIES["Q35_shard_marginals"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(DECLARED_QUERIES)
    out.update(EXTRA_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(DECLARED_ORACLES)
    out.update(EXTRA_ORACLES)
    return out
