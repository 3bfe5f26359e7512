"""Consistent shard routing — rendezvous (highest-random-weight)
hashing (Thaler & Ravishankar 1998), the assignment rule whose defining
property is MINIMAL MOVEMENT under resharding: growing from n to n+1
shards moves only the keys the NEW shard wins, an expected 1/(n+1)
fraction, where naive ``hash(key) % n`` reshuffles n/(n+1) of the
corpus. At 100 TB that is the difference between rewriting ~11% of a
table and rewriting ~89% of it when a bucket count changes.

Execution is purely NARROW: each row scores every candidate shard with
a 60-bit md5 hash (the profile.py KMV idiom, so DuckDB replays the
arithmetic bit-for-bit) inside one ``transform`` over a
``sequence(0, n−1)`` literal and takes ``array_max`` of (score, shard)
structs — no shuffle, no UDF, no groupBy. Candidate count n is
control-plane-sized (shard counts are dozens-to-thousands); the O(n)
per-row cost is the standard HRW trade and is vectorized end-to-end in
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rendezvous_assign", "resharding_report"]


def _hrw_score(key_col: F.Column, shard: F.Column, salt: str) -> F.Column:
    # 60-bit md5 score of "salt:key:shard" — replayable in DuckDB as
    # ('0x' || substr(md5(...), 1, 15))::BIGINT
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(salt), key_col.cast("string"), shard)
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "hrw",
    out_col: str = "shard",
) -> DataFrame:
    """Append the rendezvous shard id (0..n_shards−1) for ``key_col``.
    Map-only; deterministic (the (score, shard) struct max is a total
    order — a score tie between two shards of one key cannot produce
    ambiguity because the shard id breaks it)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            _hrw_score(F.col(key_col), s, salt).alias("h"),
            s.cast("int").alias("s"),
        ),
    )
    return df.withColumn(out_col, F.array_max(scored)["s"])


def resharding_report(
    df: DataFrame,
    key_col: str,
    n_from: int,
    n_to: int,
    salt: str = "hrw",
) -> DataFrame:
    """One-row movement audit for growing ``n_from`` → ``n_to`` shards:
    how many keys move under rendezvous hashing vs under ``hash % n``
    — the quantitative case for consistent routing. Output:
    (n_keys, hrw_moved, hrw_moved_frac, mod_moved, mod_moved_frac);
    expected fractions ≈ 1 − n_from/n_to and ≈ 1 − 1/n_to. Distinct
    keys are assigned once (one distinct-aggregate, then map-only
    scoring; the report is a single global aggregate to one row)."""
    if not 1 <= n_from < n_to:
        raise ValueError(f"need 1 <= n_from < n_to, got {n_from}, {n_to}")
    keys = df.select(F.col(key_col).alias("k")).distinct()
    a = rendezvous_assign(keys, "k", n_from, salt=salt, out_col="s_a")
    b = rendezvous_assign(a, "k", n_to, salt=salt, out_col="s_b")
    # mod-hash strawman on the same 60-bit key hash (shard-independent
    # score: one hash per key, mod by the bucket count)
    kh = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col("k").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    both = b.withColumn("m_a", kh % n_from).withColumn("m_b", kh % n_to)
    return both.agg(
        F.count("*").alias("n_keys"),
        F.sum((F.col("s_a") != F.col("s_b")).cast("long")).alias("hrw_moved"),
        F.round(
            F.avg((F.col("s_a") != F.col("s_b")).cast("double")), 6
        ).alias("hrw_moved_frac"),
        F.sum((F.col("m_a") != F.col("m_b")).cast("long")).alias("mod_moved"),
        F.round(
            F.avg((F.col("m_a") != F.col("m_b")).cast("double")), 6
        ).alias("mod_moved_frac"),
    )
