"""Exact distributed top-k frequent items with bounded memory — the
Misra-Gries two-pass recipe (Misra & Gries "Finding Repeated Elements";
merge rule from Agarwal et al., "Mergeable Summaries").

Why not just ``groupBy(item).count().orderBy(...).limit(k)``? That
shuffles EVERY distinct item — for n-grams over a 100 TB corpus the
distinct set is itself terabytes. Here:

- **Pass 1 (candidates, shuffle-free):** each partition folds its Arrow
  batches into a Misra-Gries summary of capacity ``cap`` (vectorized
  ``value_counts`` per batch + the mergeable-summaries compaction:
  subtract the (cap+1)-th largest weight, drop non-positives). A
  partition emits ≤ cap rows, so the stage output is ≤ partitions × cap
  regardless of data size. Guarantee: an item whose partition frequency
  exceeds n_p/(cap+1) survives that partition's summary, so any item
  with GLOBAL frequency > N/(cap+1) survives in ≥ 1 partition.
- **Pass 2 (exact recount):** broadcast-semi-join the data against the
  candidate set and aggregate exactly — the shuffle now carries only the
  bounded candidate key set.

The result is EXACT (not approximate) whenever the observed k-th
candidate count t satisfies t > N/(cap+1): every item with true
frequency ≥ t is then guaranteed to be a candidate, so the candidate
top-k IS the true top-k. ``certify=True`` (default) checks that
condition and raises if the capacity was too small for this data —
an approximate answer silently labeled exact is worse than an error.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, batch: pd.Series, cap: int) -> dict:
    """Merge one batch's value_counts into a Misra-Gries summary of
    capacity ``cap`` (Agarwal et al. merge: add, then subtract the
    (cap+1)-th largest and drop non-positives — at most cap survivors)."""
    for w, c in batch.items():
        counters[w] = counters.get(w, 0) + int(c)
    if len(counters) > cap:
        sub = sorted(counters.values(), reverse=True)[cap]
        counters = {w: c - sub for w, c in counters.items() if c > sub}
    return counters


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    k: int = 10,
    capacity: int = 1024,
    certify: bool = True,
) -> DataFrame:
    """Exact top-k most frequent values of ``item_col`` (ties broken by
    item ascending), computed with the two-pass Misra-Gries recipe above.
    Returns ``(item_col, n)`` with exact counts, ordered ``n`` desc then
    item asc, limited to k.

    With ``certify`` (default) the exactness condition is verified
    against the data (one extra count aggregate) and a ``ValueError``
    asks for a larger ``capacity`` when it fails. NULL items are ignored
    (SQL aggregate convention).
    """
    col = items.select(F.col(item_col).alias("__it")).filter(
        F.col("__it").isNotNull()
    )
    cap = capacity

    def _sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters = _mg_fold(counters, pdf["__it"].value_counts(), cap)
        if counters:
            yield pd.DataFrame({"__it": list(counters.keys())})

    candidates = col.mapInPandas(_sketch, col.schema).distinct()
    exact = (
        col.join(F.broadcast(candidates), "__it", "left_semi")
        .groupBy("__it")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "__it")
        .limit(k)
        .select(F.col("__it").alias(item_col), "n")
    )
    if certify:
        rows = exact.collect()
        total = col.count()
        if len(rows) == k and rows[-1]["n"] * (cap + 1) <= total:
            raise ValueError(
                f"top-{k} not certifiable at capacity {cap}: k-th count "
                f"{rows[-1]['n']} ≤ N/(cap+1) = {total / (cap + 1):.1f}; "
                "raise capacity"
            )
        if len(rows) < k and col.distinct().count() != len(rows):
            # fewer candidates than k but more distinct items exist —
            # something was pruned everywhere; the "top-k" would be
            # silently incomplete. (The distinct shuffle only runs in
            # this degenerate branch, never on the certified fast path.)
            raise ValueError(
                f"only {len(rows)} candidates survived capacity {cap} "
                f"but more distinct items exist; raise capacity"
            )
        spark = items.sparkSession
        return spark.createDataFrame(rows, schema=exact.schema)
    return exact


# --- count-min sketch -------------------------------------------------------
# Cormode & Muthukrishnan 2005 (public): a depth x width counter grid;
# est(x) = min_d grid[d][h_d(x)] >= true(x) always (one-sided error,
# overcount <= eps*N w.h.p. for width = e/eps). Complements the exact
# Misra-Gries path above: CMS answers point queries for ANY item from
# O(depth*width) state and MERGES by cell-wise addition — the shape for
# sharded corpora and streaming accumulation.


def _cms_col(token, d: int, width: int, salt: str):
    """Row-d bucket for a token: first 8 md5 hex chars of (salt|d|token)
    as an int mod width — engine-independent, so DuckDB replays it."""
    h = F.md5(F.concat(F.lit(f"{salt}{d}|"), token.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias("col")


def cms_build(
    df: DataFrame,
    token_col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch relation (d, col, cnt) from a token stream.

    ONE scan of the token stream (the depth hashes are computed side by
    side and posexploded, not unioned — a union would re-read the
    stream per row); the shuffle key space is bounded by depth*width
    cells (map-side partials collapse each partition to at most that
    many rows), so state is O(depth*width) regardless of corpus size.
    Merge two sketches built with the same (width, depth, salt) by
    unionAll + re-aggregate."""
    cells = df.select(
        F.posexplode(
            F.array(
                *[_cms_col(F.col(token_col), d, width, salt) for d in range(depth)]
            )
        ).alias("d", "col")
    )
    return cells.groupBy("d", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    token_col: str,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for the tokens in ``queries``:
    est = min over rows d of the cell count, with absent cells counting
    as 0 (an unseen, collision-free token estimates 0). The sketch is
    at most depth*width rows — broadcast onto the query relation, so
    estimation never shuffles the corpus. Output: (token_col, est)."""
    q = queries.select(F.col(token_col)).distinct()
    probes = q.select(
        token_col,
        F.posexplode(
            F.array(
                *[_cms_col(F.col(token_col), d, width, salt) for d in range(depth)]
            )
        ).alias("d", "col"),
    )
    return (
        probes.join(F.broadcast(cms), ["d", "col"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
