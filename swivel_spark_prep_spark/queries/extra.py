"""Extra queries beyond the declared 44 — LLM-data-pipeline operators.

Populated as operators land (MinHash-LSH, SimHash, ANN, language-ID,
quality scoring, token counting, fingerprinting, multimodal plumbing).
Keys are X-prefixed so they sort after the declared contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

EXTRA_QUERIES: dict[str, QueryFn] = {}
EXTRA_ORACLES: dict[str, str] = {}


def _declare(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        EXTRA_QUERIES[name] = fn
        if oracle is not None:
            EXTRA_ORACLES[name] = oracle
        return fn

    return deco
