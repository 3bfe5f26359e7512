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
        hot_keys = [
            r[key_col]
            for r in heavy_hitters(
                big, key_col, k=n_hot, capacity=capacity
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
