"""Skyline (Pareto-front) selection — the classic multi-criteria
"best tradeoffs" operator (Börzsönyi, Kossmann & Stocker, ICDE 2001):
keep every row not DOMINATED by another, where row s dominates row r
iff s is ≥ r on every criterion and > on at least one. The
training-data use: pick the documents no other document beats on both
quality and length, the checkpoints no other beats on both accuracy
and throughput — the candidate set a curation pass hand-reviews.

Scale design (2-D): the textbook block-nested-loop skyline is the
quadratic all-pairs shape the plan guardrail bans. In two dimensions
the front has a closed relational form:

1. collapse to the DISTINCT-x relation with each x's best y
   (``y_max(x)``) — a hash aggregate, value-cardinality;
2. running maximum ``M(x) = max{y_max(x') : x' > x}`` over that
   relation ordered by x DESCENDING — the exclusive prefix extremum,
   computed by :func:`~swivel_spark_prep_spark.operators.ranks.
   partitioned_prefix_extremum` (range-partition + local window +
   per-partition offsets; no single-partition stage, no self-join);
3. an x-group is on the front iff ``y_max(x) > M(x)`` (NULL M = no
   better-x group = automatically on the front); a ROW is on the
   front iff its group is and ``y == y_max(x)`` (exact duplicates of
   a front point are all kept — dominance requires one STRICT
   inequality, so equal points never dominate each other).

The whole plan is two hash aggregates, one prefix-extremum pass and
one broadcastable semi-join of the front x-groups back onto the data —
O(n log n) work, shuffle on x only.

Direction is per-column: ``maximize=False`` on either axis flips it by
negating internally (the front of (-x) maximization is the x
minimization front).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_extremum

__all__ = ["pareto_front_2d"]


def pareto_front_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    maximize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """All rows of ``df`` on the 2-D Pareto front of (x_col, y_col).
    Rows with a NULL in either criterion are excluded (they can neither
    dominate nor be ranked). Input columns pass through unchanged.
    """
    x = F.col(x_col) if maximize_x else -F.col(x_col)
    y = F.col(y_col) if maximize_y else -F.col(y_col)
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    # distinct-x relation with each group's best y
    gx = base.groupBy(x.alias("_sx")).agg(F.max(y).alias("_ymax"))
    # M(x) = best y among strictly-better x: exclusive running max in
    # x-DESC order (better x sorts first)
    pm = partitioned_prefix_extremum(
        gx, [F.col("_sx").desc()], "_ymax", "_m", inclusive=False, agg="max"
    )
    front_x = pm.filter(F.col("_m").isNull() | (F.col("_ymax") > F.col("_m")))
    # equi-join on (x-group, best-y): front-sized right side — usually
    # tiny (AQE broadcasts it), but worst-case (anti-correlated data)
    # it is distinct-x-sized, so no FORCED broadcast: a shuffle join on
    # _sx is scale-safe either way
    return base.join(
        front_x.select("_sx", "_ymax"),
        (x == F.col("_sx")) & (y == F.col("_ymax")),
        "inner",
    ).drop("_sx", "_ymax")
