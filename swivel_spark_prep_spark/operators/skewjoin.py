"""Hybrid skew join — the classic hot/cold split for joins whose key
distribution is Zipf (the join-side twin of normalize.py's skew-proof
aggregation): shuffle joins hash-partition by key, so one hot key lands
its entire row set on one task; at 100 TB a single viral key stalls the
stage. The standard fix (and what AQE's skew-join split approximates at
runtime) is to route the hot keys through a broadcast join — broadcast
joins never shuffle the probe side, so hot rows stay where they are —
and let the well-distributed remainder take the normal shuffle join.

Hot keys are DETECTED, not guessed, with the certified Misra-Gries
heavy-hitter pass (operators/heavyhitters.py): exact top-k frequent
keys in bounded memory, no full groupBy over the key space. The split
is two filters against a broadcast hot-key list (k values), the hot
path joins against the (tiny, hot-keys-only) slice of the build side
with an explicit ``broadcast()``, and the union of both paths is
EXACTLY the plain join — oracle-checked (X81), plan-shape-tested (the
hot path must show BroadcastHashJoin, the cold path an exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.heavyhitters import heavy_hitters


def skew_hybrid_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    how: str = "inner",
    hot_keys: list | None = None,
    n_hot: int = 10,
    capacity: int = 1024,
) -> DataFrame:
    """``big JOIN small ON key_col`` with hot keys routed around the
    shuffle. ``hot_keys`` may be passed explicitly (e.g. known viral
    ids); otherwise the certified heavy-hitter pass detects the top
    ``n_hot`` keys of ``big``. Supports ``inner`` and ``left`` — the
    two shapes where a row belongs to exactly one path and the union
    is trivially exact."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    if hot_keys is None:
        # certify=False: exactness of the top-k is irrelevant here — ANY
        # plausible hot-key list keeps the union exact (the split is by
        # membership, not rank), and a roughly-uniform key distribution
        # must not make the JOIN fail with an uncertifiable-top-k error.
        hot_keys = [
            r[key_col]
            for r in heavy_hitters(
                big, key_col, k=n_hot, capacity=capacity, certify=False
            ).collect()
        ]
    if not hot_keys:
        return big.join(small, key_col, how)
    is_hot = F.col(key_col).isin(hot_keys)
    hot_small = small.filter(is_hot)
    hot = big.filter(is_hot).join(F.broadcast(hot_small), key_col, how)
    cold = big.filter(~is_hot | F.col(key_col).isNull()).join(
        small, key_col, how
    )
    return hot.unionByName(cold)


def join_diagnosis(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
) -> DataFrame:
    """Pre-flight join health report — the checks a data engineer runs
    before an expensive join, in ONE pass over each side's key-count
    table (never the join itself): row/null counts, distinct keys,
    key-overlap split (matched / left-only / right-only), the EXACT
    inner-join output cardinality Σ lc·rc (what decides whether the
    join is even feasible), and the worst per-key fanout on each side
    (the skew signal — a max_fanout in the millions says use
    skew_hybrid_join). Returns a single row; at 100 TB the cost is two
    grouped counts plus a full-outer join of two key tables, orders of
    magnitude below running the join to find out it explodes."""
    rk = right_key or left_key
    # NULL keys ride the same grouped counts (one NULL group per side)
    # so the whole report really is one key-count pass per side — no
    # extra full-table scans, and nothing is eager until the caller
    # acts on the returned DataFrame.
    lc = (
        left.select(F.col(left_key).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("lc"))
    )
    rc = (
        right.select(F.col(rk).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("rc"))
    )
    j = lc.join(rc, lc["k"].eqNullSafe(rc["k"]), "full_outer").select(
        F.coalesce(lc["k"], rc["k"]).alias("k"),
        (lc["k"].isNull() & rc["k"].isNull()).alias("is_null_key"),
        "lc",
        "rc",
    )
    nn = ~F.col("is_null_key")
    return j.agg(
        F.coalesce(F.sum(F.when(nn, F.col("lc"))), F.lit(0)).alias("left_rows"),
        F.coalesce(F.sum(F.when(nn, F.col("rc"))), F.lit(0)).alias("right_rows"),
        F.count(F.when(nn, F.col("lc"))).alias("left_keys"),
        F.count(F.when(nn, F.col("rc"))).alias("right_keys"),
        F.coalesce(
            F.sum(
                F.when(
                    nn & F.col("lc").isNotNull() & F.col("rc").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("matched_keys"),
        F.coalesce(
            F.sum(F.when(nn & F.col("rc").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("left_only_keys"),
        F.coalesce(
            F.sum(F.when(nn & F.col("lc").isNull(), 1).otherwise(0)), F.lit(0)
        ).alias("right_only_keys"),
        F.coalesce(
            F.sum(F.when(nn, F.col("lc") * F.col("rc"))), F.lit(0)
        ).alias("inner_join_rows"),
        F.coalesce(F.max(F.when(nn, F.col("lc"))), F.lit(0)).alias(
            "max_left_fanout"
        ),
        F.coalesce(F.max(F.when(nn, F.col("rc"))), F.lit(0)).alias(
            "max_right_fanout"
        ),
        F.coalesce(
            F.sum(F.when(F.col("is_null_key"), F.col("lc"))), F.lit(0)
        ).alias("left_null_keys"),
        F.coalesce(
            F.sum(F.when(F.col("is_null_key"), F.col("rc"))), F.lit(0)
        ).alias("right_null_keys"),
    )
