"""Crowd/ensemble label aggregation — Dawid–Skene EM (Dawid & Skene,
JRSS-C 1979): infer per-item true-label posteriors AND per-rater
confusion matrices jointly from (item, rater, label) votes, so a
systematically-wrong rater gets DOWN-weighted instead of out-voted one
item at a time. This is the canonical step between raw multi-rater
judgments (human annotation, LLM-judge ensembles, weak-supervision
rules) and a training label; majority vote is its 0-iteration special
case, Fleiss' kappa (evalmetrics.fleiss_kappa) is its agreement audit.

Relational shape, built for the 100 TB contract:
- the ratings corpus R(item, rater, label) is touched once per
  EM half-step as a stream into hash aggregates — never sorted, never
  windowed;
- the posterior relation q(item, class) is items x K rows, the model
  relations are priors (K rows, broadcast) and confusion
  theta(rater, label, class) (observed rater-label pairs x K rows) —
  all joins are equi-joins on those keys with map-side-combinable
  aggregates on top;
- each EM round is a fixed DAG of 2 joins + 4 aggregates, and q is
  checkpoint_truncate'd per round (plan-tree truncation + inherited-
  statistics reset — see cache.checkpoint_truncate for why both).

Everything is deterministic IEEE arithmetic (log-space E-step with a
per-item max shift), so a DuckDB oracle replays the full EM trajectory
CTE-by-CTE: :func:`dawid_skene_oracle_sql` generates it from the same
parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dawid_skene",
    "dawid_skene_rater_quality",
    "dawid_skene_oracle_sql",
]


def _em(
    ratings: DataFrame,
    item_col: str,
    rater_col: str,
    label_col: str,
    iterations: int,
    smoothing: float,
):
    """Run EM; return (r, q, n_classes) — r the cleaned ratings
    relation, q the final (item, class, q) posterior relation."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (zero cells break the log E-step)")
    from swivel_spark_prep_spark.cache import (
        checkpoint_truncate,
        fan_out,
        track_persist,
    )

    r = ratings.select(
        F.col(item_col).alias("_i"),
        F.col(rater_col).cast("string").alias("_r"),
        F.col(label_col).cast("string").alias("_l"),
    ).filter(
        F.col("_i").isNotNull() & F.col("_r").isNotNull() & F.col("_l").isNotNull()
    )
    # fan_out before the persist: every EM half-step streams this cached
    # relation into joins + hash aggregates; a single-split scan would
    # leave each round's map side on one core (guide §2.5)
    r = track_persist(fan_out(r))
    classes = track_persist(r.select(F.col("_l").alias("_c")).distinct())
    n_classes = classes.count()  # bounded: the label alphabet
    if n_classes == 0:
        raise ValueError("ratings relation is empty")
    lam = float(smoothing)

    # init: soft majority vote q0(i, c) = votes(i, c) / votes(i)
    per_item = r.groupBy("_i").agg(F.count("*").cast("double").alias("_m"))
    votes = r.groupBy("_i", F.col("_l").alias("_c")).agg(
        F.count("*").cast("double").alias("_n")
    )
    q = (
        per_item.crossJoin(F.broadcast(classes))
        .join(votes, ["_i", "_c"], "left")
        .select(
            "_i", "_c", (F.coalesce(F.col("_n"), F.lit(0.0)) / F.col("_m")).alias("_q")
        )
    )
    q = checkpoint_truncate(q)

    def m_step(qrel):
        pri = qrel.groupBy("_c").agg(F.avg("_q").alias("_p"))
        # persisted: tn feeds BOTH its own denominator roll-up and the
        # theta join — without the persist the corpus-sized r ⋈ q
        # aggregate runs twice per reference (guide §5), and the
        # E-step's own double-references below compound that to ~8×
        # per iteration. (r, l, c)-relation sized, bounded.
        tn = track_persist(
            r.join(qrel, "_i")
            .groupBy("_r", "_l", "_c")
            .agg(F.sum("_q").alias("_s"))
        )
        td = tn.groupBy("_r", "_c").agg(F.sum("_s").alias("_d"))
        th = tn.join(td, ["_r", "_c"]).select(
            "_r",
            "_l",
            "_c",
            ((F.col("_s") + F.lit(lam)) / (F.col("_d") + F.lit(lam * n_classes))).alias(
                "_th"
            ),
        )
        return pri, tn, td, th

    for _ in range(iterations):
        pri, _tn, _td, th = m_step(q)
        # persisted: s feeds the per-item max AND the softmax join; e
        # feeds the normalizer AND the q join — each an agg-over-self +
        # re-join pattern that doubles its upstream (which here includes
        # the corpus-sized r ⋈ th aggregate) without the persist
        # (guide §5). (item, class)-relation sized, bounded.
        s = track_persist(
            r.join(th, ["_r", "_l"])
            .groupBy("_i", "_c")
            .agg(F.sum(F.log("_th")).alias("_sl"))
            .join(F.broadcast(pri), "_c")
            .select("_i", "_c", (F.col("_sl") + F.log("_p")).alias("_s"))
        )
        mx = s.groupBy("_i").agg(F.max("_s").alias("_mx"))
        e = track_persist(
            s.join(mx, "_i").select(
                "_i", "_c", F.exp(F.col("_s") - F.col("_mx")).alias("_e")
            )
        )
        z = e.groupBy("_i").agg(F.sum("_e").alias("_z"))
        q = e.join(z, "_i").select("_i", "_c", (F.col("_e") / F.col("_z")).alias("_q"))
        # q feeds the next round's M-step twice (priors + theta): cut
        # the doubling plan tree AND the inherited size statistics —
        # without the stats reset the estimate squares per round and
        # Catalyst hangs in BigInteger arithmetic (cache.checkpoint_truncate)
        q = checkpoint_truncate(q)

    return r, q, n_classes, m_step


def dawid_skene(
    ratings: DataFrame,
    item_col: str,
    rater_col: str,
    label_col: str,
    iterations: int = 3,
    smoothing: float = 0.01,
) -> DataFrame:
    """Per-item Dawid–Skene consensus labels. ``iterations=0`` is soft
    majority vote. Ties on the max posterior break to the smallest
    class string (deterministic). Output (one row per item):
    (item, ds_label, posterior)."""
    _r, q, _k, _m = _em(ratings, item_col, rater_col, label_col, iterations, smoothing)
    fm = q.groupBy("_i").agg(F.max("_q").alias("_mq"))
    return (
        q.join(fm, "_i")
        .filter(F.col("_q") == F.col("_mq"))
        .groupBy("_i")
        .agg(
            F.min("_c").alias("ds_label"),
            F.round(F.max("_q"), 6).alias("posterior"),
        )
        .select(F.col("_i").alias("item"), "ds_label", "posterior")
    )


def dawid_skene_rater_quality(
    ratings: DataFrame,
    item_col: str,
    rater_col: str,
    label_col: str,
    iterations: int = 3,
    smoothing: float = 0.01,
) -> DataFrame:
    """Per-rater quality from the fitted confusion matrices: accuracy =
    Σ_c π(c)·θ_r(c|c) — the prior-weighted diagonal, i.e. "how often is
    this rater right about an average item". The diagonal grid comes
    from the (rater, class) denominator relation so a rater who NEVER
    emits some class still gets its smoothed θ(c|c). Output (one row
    per rater): (rater, n_ratings, accuracy)."""
    r, q, n_classes, m_step = _em(
        ratings, item_col, rater_col, label_col, iterations, smoothing
    )
    lam = float(smoothing)
    pri, tn, td, _th = m_step(q)
    diag = td.join(
        tn.filter(F.col("_l") == F.col("_c")).select("_r", "_c", "_s"),
        ["_r", "_c"],
        "left",
    ).select(
        "_r",
        "_c",
        (
            (F.coalesce(F.col("_s"), F.lit(0.0)) + F.lit(lam))
            / (F.col("_d") + F.lit(lam * n_classes))
        ).alias("_th"),
    )
    nr = r.groupBy("_r").agg(F.count("*").alias("n_ratings"))
    return (
        diag.join(F.broadcast(pri), "_c")
        .groupBy("_r")
        .agg(F.round(F.sum(F.col("_p") * F.col("_th")), 6).alias("accuracy"))
        .join(nr, "_r")
        .select(F.col("_r").alias("rater"), "n_ratings", "accuracy")
    )


def dawid_skene_oracle_sql(
    ratings_sql: str,
    iterations: int = 3,
    smoothing: float = 0.01,
    mode: str = "items",
) -> str:
    """DuckDB twin: the identical EM trajectory unrolled into one
    MATERIALIZED CTE chain per half-step (without MATERIALIZED the
    multiply-referenced q CTEs re-expand exponentially — the
    bradley_terry/k_core precedent). ``ratings_sql`` must yield
    (i, rt, l). ``mode='items'`` emits per-item labels,
    ``mode='raters'`` per-rater accuracies."""
    if mode not in ("items", "raters"):
        raise ValueError(f"mode must be 'items' or 'raters', got {mode}")
    lam = float(smoothing)
    parts = [
        f"WITH r AS MATERIALIZED ({ratings_sql})",
        "k AS MATERIALIZED (SELECT DISTINCT l AS c FROM r)",
        "kk AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS kcnt FROM k)",
        "cnt AS MATERIALIZED (SELECT i, COUNT(*)::DOUBLE AS m FROM r GROUP BY 1)",
        "vt AS MATERIALIZED (SELECT i, l AS c, COUNT(*)::DOUBLE AS n"
        " FROM r GROUP BY 1, 2)",
        "q0 AS MATERIALIZED (SELECT cnt.i, k.c, COALESCE(vt.n, 0) / cnt.m AS q"
        " FROM cnt CROSS JOIN k LEFT JOIN vt ON vt.i = cnt.i AND vt.c = k.c)",
    ]

    def m_parts(t, qname):
        return [
            f"pi{t} AS MATERIALIZED (SELECT c, AVG(q) AS p FROM {qname} GROUP BY 1)",
            f"tn{t} AS MATERIALIZED (SELECT r.rt, r.l, q.c, SUM(q.q) AS s"
            f" FROM r JOIN {qname} q USING (i) GROUP BY 1, 2, 3)",
            f"td{t} AS MATERIALIZED (SELECT rt, c, SUM(s) AS d FROM tn{t}"
            " GROUP BY 1, 2)",
            f"th{t} AS MATERIALIZED (SELECT tn.rt, tn.l, tn.c,"
            f" (tn.s + {lam!r}) / (td.d + {lam!r} * kk.kcnt) AS th"
            f" FROM tn{t} tn JOIN td{t} td ON tn.rt = td.rt AND tn.c = td.c,"
            " kk)",
        ]

    for t in range(1, iterations + 1):
        parts += m_parts(t, f"q{t - 1}")
        parts += [
            f"s{t} AS MATERIALIZED (SELECT r.i, th.c,"
            f" SUM(ln(th.th)) AS sl FROM r JOIN th{t} th"
            " ON r.rt = th.rt AND r.l = th.l GROUP BY 1, 2)",
            f"sp{t} AS MATERIALIZED (SELECT s.i, s.c, s.sl + ln(pi.p) AS s"
            f" FROM s{t} s JOIN pi{t} pi USING (c))",
            f"mx{t} AS MATERIALIZED (SELECT i, MAX(s) AS m FROM sp{t} GROUP BY 1)",
            f"e{t} AS MATERIALIZED (SELECT sp.i, sp.c, exp(sp.s - mx.m) AS e"
            f" FROM sp{t} sp JOIN mx{t} mx USING (i))",
            f"z{t} AS MATERIALIZED (SELECT i, SUM(e) AS z FROM e{t} GROUP BY 1)",
            f"q{t} AS MATERIALIZED (SELECT e.i, e.c, e.e / z.z AS q"
            f" FROM e{t} e JOIN z{t} z USING (i))",
        ]
    last = f"q{iterations}"
    if mode == "items":
        return (
            ",\n".join(parts)
            + f""",
fm AS MATERIALIZED (SELECT i, MAX(q) AS mq FROM {last} GROUP BY 1)
SELECT q.i AS item, MIN(q.c) AS ds_label, ROUND(MAX(q.q), 6) AS posterior
FROM {last} q JOIN fm ON q.i = fm.i AND q.q = fm.mq
GROUP BY q.i;"""
        )
    t = iterations + 1
    parts += m_parts(t, last)
    return (
        ",\n".join(parts)
        + f""",
diag AS MATERIALIZED (SELECT td.rt, td.c,
  (COALESCE(tn.s, 0) + {lam!r}) / (td.d + {lam!r} * kk.kcnt) AS th
  FROM td{t} td LEFT JOIN tn{t} tn
    ON tn.rt = td.rt AND tn.c = td.c AND tn.l = td.c, kk),
nr AS MATERIALIZED (SELECT rt, COUNT(*)::BIGINT AS n_ratings FROM r GROUP BY 1)
SELECT diag.rt AS rater, MAX(nr.n_ratings) AS n_ratings,
       ROUND(SUM(pi{t}.p * diag.th), 6) AS accuracy
FROM diag JOIN pi{t} ON diag.c = pi{t}.c JOIN nr ON nr.rt = diag.rt
GROUP BY diag.rt;"""
    )


def icc_2_1(
    ratings: DataFrame,
    item_col: str,
    rater_col: str,
    value_col: str,
) -> DataFrame:
    """ICC(2,1) — intraclass correlation, two-way random effects,
    single rater, absolute agreement (Shrout & Fleiss 1979): the
    CONTINUOUS-label reliability companion to the categorical
    agreement family (Cohen κ X151, Fleiss κ X225, Dawid–Skene
    X235/X236). Requires a complete item × rater matrix::

        ICC(2,1) = (MSR − MSE) /
                   (MSR + (k−1)·MSE + k·(MSC − MSE)/n)

    with the mean squares from the two-way ANOVA decomposition
    SS_total = SS_items + SS_raters + SS_error. Plan: one scan for the
    cell moments, item means re-aggregate to an n-row relation, rater
    means to a k-row relation; every SS is an aggregate, the ICC is
    1-row arithmetic. Completeness is VALIDATED (n·k must equal the
    cell count — a ragged matrix silently biases the decomposition,
    so it raises instead). Output: (n_items, k_raters, msr, msc, mse,
    icc2_1).
    """
    x = F.col(value_col).cast("double")
    base = ratings.select(
        F.col(item_col).alias("_i"), F.col(rater_col).alias("_r"), x.alias("_x")
    ).filter(F.col("_x").isNotNull())
    dims = base.agg(
        F.countDistinct("_i").alias("_n"),
        F.countDistinct("_r").alias("_k"),
        F.count("*").alias("_cells"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_ss"),
    ).collect()[0]
    n, k, cells = dims["_n"], dims["_k"], dims["_cells"]
    if n * k != cells:
        raise ValueError(
            f"icc_2_1 needs a complete item x rater matrix: "
            f"{n} items x {k} raters != {cells} cells"
        )
    if n < 2 or k < 2:
        raise ValueError(f"need >= 2 items and >= 2 raters, got {n} x {k}")
    grand = dims["_s"] / cells
    ss_total = dims["_ss"] - cells * grand * grand
    item_means = base.groupBy("_i").agg(F.avg("_x").alias("_mi"))
    ss_rows = (
        item_means.agg(
            F.sum((F.col("_mi") - grand) * (F.col("_mi") - grand)).alias("v")
        ).collect()[0]["v"]
        * k
    )
    rater_means = base.groupBy("_r").agg(F.avg("_x").alias("_mr"))
    ss_cols = (
        rater_means.agg(
            F.sum((F.col("_mr") - grand) * (F.col("_mr") - grand)).alias("v")
        ).collect()[0]["v"]
        * n
    )
    ss_err = ss_total - ss_rows - ss_cols
    msr = ss_rows / (n - 1)
    msc = ss_cols / (k - 1)
    mse = ss_err / ((n - 1) * (k - 1))
    denom = msr + (k - 1) * mse + k * (msc - mse) / n
    icc = (msr - mse) / denom if denom > 0 else None
    spark = ratings.sparkSession
    return spark.createDataFrame(
        [(
            int(n), int(k), round(msr, 6), round(msc, 6), round(mse, 6),
            round(icc, 6) if icc is not None else None,
        )],
        "n_items long, k_raters long, msr double, msc double, mse double, "
        "icc2_1 double",
    )
