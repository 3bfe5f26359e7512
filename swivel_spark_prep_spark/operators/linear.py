"""Distributed linear-model training — the model-in-the-loop curation
step (train a quality/language classifier on labels, score the corpus,
filter on the score; the CCNet / fastText-filter pattern, public).

Logistic regression by FULL-BATCH gradient descent in pure relational
algebra: features are a sparse ``(doc, bucket, cnt)`` relation (hashed
bag-of-words via the md5 bucket idiom of sampling.hash_bucket, so the
DuckDB oracle replays the featurization bit-for-bit), the weight vector
is a ≤ ``dim``-row relation, and one GD step is

    margin_d = Σ_b cnt_{d,b} · w_b          (join on bucket + per-doc sum)
    grad_b   = Σ_d cnt_{d,b} · (σ(margin_d) − y_d) / N   (join + per-bucket sum)
    w_b     ← w_b − lr · grad_b

— two broadcast joins and two aggregates per iteration; the weights
relation is control-plane-sized and broadcast, the big (doc, bucket)
relation is never reshuffled. Deterministic by construction (fixed
iteration count, no sampling, double-precision sums), so the training
LOOP itself is DuckDB-replayable as an unrolled CTE chain
(:func:`logreg_oracle_sql` — the pagerank_oracle_sql idiom applied to
model fitting). Per-iteration ``localCheckpoint`` cuts the doubling
plan lineage exactly as pagerank does.

At 100 TB the feature relation is the corpus-sized side and stays
partitioned by doc; every model-sized relation (weights, gradients)
flows through broadcast. Full-batch GD is the deliberately simple,
exactly-reproducible choice — swap the step rule for minibatch/Adam on
a cluster where exact replay is not a requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swivel_spark_prep_spark.cache import track_persist
from swivel_spark_prep_spark.operators.sampling import hash_bucket


def hashed_word_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 512,
    salt: str = "lr",
    binary: bool = False,
) -> DataFrame:
    """Sparse hashed unigram features: (id, bucket, cnt). Lower-cased
    whitespace tokens, md5-bucketed so both engines agree.
    ``binary=True`` records presence (cnt=1) instead of counts — the
    better-conditioned choice for gradient training (count features
    give the shared high-frequency tokens outsized curvature and GD
    oscillates; measured on the fixture: raw counts diverge at lr 0.5
    while binary+intercept converges at lr 1.0)."""
    from swivel_spark_prep_spark.cache import fan_out

    # fan_out before the tokenize explode + md5 bucketing (guide §2.5):
    # the single-file corpus scans as one task, so featurization — the
    # setup CPU of every fit/score — otherwise runs on one core
    toks = fan_out(docs).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    agg = F.lit(1.0) if binary else F.count("*").cast("double")
    return (
        toks.withColumn("bucket", hash_bucket(F.col("w"), dim, salt=salt))
        .groupBy("id", "bucket")
        .agg(F.max(agg).alias("cnt") if binary else agg.alias("cnt"))
    )


def logreg_fit(
    features: DataFrame,
    labels: DataFrame,
    lr: float = 1.0,
    iterations: int = 24,
    intercept: bool = True,
) -> DataFrame:
    """Fit logistic-regression weights on ``features`` (id, bucket, cnt)
    against ``labels`` (id, y ∈ {0,1}) from a zero initialization.
    Returns the (bucket, weight) relation; with ``intercept`` a virtual
    always-on feature at bucket −1 absorbs the class prior (without it
    the shared-token weights carry the prior and converge far slower).
    N is the LABELED-doc count; docs without a label are ignored
    (semi-supervised scoring happens in :func:`logreg_score`).

    Execution is the broadcast-the-model shape MLlib's own
    LogisticRegression uses (model flows driver→literal, data stays
    partitioned): the labeled corpus is densified ONCE into cached
    per-doc sparse arrays, then each GD step is a single map-side
    margin/residual evaluation against the weight vector embedded as a
    ≤(dim+1)-element array LITERAL, followed by one dim-bounded
    groupBy(bucket) gradient aggregate whose shuffle volume is
    #partitions × #buckets rows thanks to partial aggregation. The
    weight update itself happens on the driver over a model-sized list
    (a bounded control table — never corpus data). One job per
    iteration — half the stages of the earlier two-joins-per-step
    relational form, identical weights. At fixture scale the wall is
    FLOOR-BOUND, not plan-bound: a bare ``count()`` on the cached
    docvecs costs ~0.3 s on local[32] and the gradient job ~0.5 s
    (measured sf0.1), so 24 sequential barriers ≈ 12 s regardless of
    plan — the per-job floor a real cluster amortizes against
    corpus-sized per-iteration work, exactly the Q13 adjudication."""
    feats = features.join(
        labels.select("id", F.col("y").cast("double").alias("y")), "id"
    )
    if intercept:
        feats = feats.unionByName(
            feats.select("id", "y")
            .distinct()
            .withColumn("bucket", F.lit(-1).cast("long"))
            .withColumn("cnt", F.lit(1.0))
        )
    # Densify once: (id, y, bs, cs) with arrays in a fixed (cached)
    # order so per-doc float sums are reproducible across iterations.
    # fan_out AFTER the agg (array contents untouched): AQE coalesces
    # the tiny groupBy output to one partition, which would run every
    # iteration's margin/residual/gradient evaluation — 24 sequential
    # jobs, the whole fit — on one core (guide §2.5).
    from swivel_spark_prep_spark.cache import fan_out

    docvecs = track_persist(
        fan_out(
            feats.groupBy("id", "y").agg(
                F.collect_list("bucket").alias("bs"),
                F.collect_list("cnt").alias("cs"),
            )
        )
    )
    n = docvecs.count()  # bounded: one long (also materializes the cache)
    if n == 0:
        docvecs.unpersist()
        raise ValueError("no labeled documents")
    # Weight-vector support == feature-bucket support (absent bucket ==
    # weight 0, exactly as the relational form kept it). Bounded collect:
    # ≤ dim+1 longs — the model, not the data. bounded_distinct raises
    # past the cap (a model literal beyond 2^16 buckets would not fit a
    # broadcast array literal anyway) instead of flooding the driver.
    from swivel_spark_prep_spark.cache import bounded_distinct

    support = sorted(bounded_distinct(feats, "bucket", cap=65536))
    lo = support[0]
    idx = {b: i for i, b in enumerate(support)}
    dense = lo == support[-1] - len(support) + 1  # contiguous bucket range
    w = [0.0] * len(support)
    for _ in range(iterations):
        warr = F.lit(w)
        # element_at is 1-based; contiguous support maps bucket→b−lo+1
        # directly, otherwise go through a bucket→slot literal map.
        if dense:
            slot = lambda b: b - F.lit(lo) + 1  # noqa: E731
        else:
            m = F.create_map(
                *[x for b in support for x in (F.lit(b), F.lit(idx[b] + 1))]
            )
            slot = lambda b: F.element_at(m, b)  # noqa: E731
        margin = F.aggregate(
            F.zip_with(
                F.col("cs"),
                F.transform(F.col("bs"), lambda b: F.element_at(warr, slot(b))),
                lambda c, wv: c * wv,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)) - F.col("y")).alias("r")
        grads = (
            docvecs.select(resid, F.explode(F.arrays_zip("bs", "cs")).alias("z"))
            .groupBy(F.col("z.bs").alias("bucket"))
            .agg((F.sum(F.col("z.cs") * F.col("r")) / F.lit(float(n))).alias("g"))
            .collect()  # bounded: ≤ dim+1 rows — the gradient IS model-sized
        )
        for row in grads:
            w[idx[row["bucket"]]] -= lr * row["g"]
    docvecs.unpersist()
    spark = features.sparkSession
    return spark.createDataFrame(
        [(b, w[idx[b]]) for b in support], "bucket long, weight double"
    )


def logreg_score(
    features: DataFrame,
    weights: DataFrame,
    out_col: str = "p",
    intercept: bool = True,
) -> DataFrame:
    """Per-doc probability σ(Σ cnt·w) from the fitted weight relation
    (broadcast). ``intercept`` must match the fit: it re-attaches the
    virtual always-on bucket −1 so the intercept weight participates in
    every margin (without it, scores are systematically shifted by the
    class prior). Docs whose buckets all miss the weight support score
    exactly 0.5 (zero margin)."""
    if intercept:
        features = features.unionByName(
            features.select("id")
            .distinct()
            .withColumn("bucket", F.lit(-1).cast("long"))
            .withColumn("cnt", F.lit(1.0))
        )
    return (
        features.join(F.broadcast(weights), "bucket", "left")
        .groupBy("id")
        .agg(
            F.coalesce(F.sum(F.col("cnt") * F.col("weight")), F.lit(0.0)).alias(
                "__m"
            )
        )
        .select(
            "id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))).alias(out_col),
        )
    )


def logreg_oracle_sql(
    docs_sql: str,
    label_expr: str,
    dim: int = 512,
    salt: str = "lr",
    lr: float = 1.0,
    iterations: int = 24,
) -> str:
    """DuckDB twin of featurize→fit with the GD loop UNROLLED — parity
    proves the whole training trajectory, not just the final sums.
    ``docs_sql`` must yield (doc_id, text, …); ``label_expr`` is a SQL
    boolean over those columns. CTEs are MATERIALIZED (the k-core
    lesson: re-expansion is exponential in the unroll depth)."""
    sql = f"""WITH base AS MATERIALIZED (
  SELECT doc_id AS id, ({label_expr})::INT::DOUBLE AS y,
         ('0x' || substr(md5('{salt}' || w), 1, 8))::BIGINT % {dim} AS bucket
  FROM ({docs_sql}), UNNEST(string_split(lower(text), ' ')) AS u(w)
  WHERE w <> '' GROUP BY 1, 2, 3),
feats AS MATERIALIZED (
  SELECT id, y, bucket, 1.0 AS cnt FROM base
  UNION ALL
  SELECT DISTINCT id, y, -1 AS bucket, 1.0 AS cnt FROM base),
n AS (SELECT COUNT(DISTINCT id)::DOUBLE AS n FROM feats),
w0 AS MATERIALIZED (SELECT bucket, 0.0 AS weight FROM feats GROUP BY 1)"""
    prev = "w0"
    for i in range(1, iterations + 1):
        sql += f""",
m{i} AS MATERIALIZED (
  SELECT f.id, f.y, COALESCE(SUM(f.cnt * w.weight), 0.0) AS margin
  FROM feats f LEFT JOIN {prev} w USING (bucket) GROUP BY 1, 2),
w{i} AS MATERIALIZED (
  SELECT f.bucket,
         ANY_VALUE(w.weight) - {lr!r} * SUM(f.cnt * (1.0 / (1.0 + exp(-m.margin)) - f.y)) / ANY_VALUE(n.n) AS weight
  FROM feats f JOIN m{i} m USING (id) JOIN {prev} w USING (bucket), n
  GROUP BY 1)"""
        prev = f"w{i}"
    sql += f"""
SELECT bucket, ROUND(weight, 6) AS weight FROM {prev} ORDER BY bucket;"""
    return sql


def ols_fit(
    df: DataFrame,
    feature_cols: list,
    label_col: str,
) -> DataFrame:
    """Multi-feature ordinary least squares by SUFFICIENT STATISTICS —
    the one-pass distributed form of the normal equations: a single
    aggregate computes every raw moment (Σxᵢxⱼ, Σxᵢy, Σy, Σy², n) —
    (d+1)(d+2)/2 + 2 doubles, the MODEL not the data — then the
    (d+1)×(d+1) solve happens on the driver (numpy when available, a
    pure-Python Gauss–Jordan otherwise; d is feature count, never
    corpus size). R² falls out in closed form — SSE = y'y − b'X'y —
    so there is NO second residual pass over the data.

    The same sufficient-statistics shape MLlib's own linear regression
    normal-equation solver uses; at 100 TB the aggregate is one
    map-side-combined pass and nothing else touches the corpus.
    Rows with any NULL feature/label are excluded. Output relation:
    (term, value) with one row per feature, plus 'intercept', 'r2',
    'n' — a bounded model table callers broadcast-join or collect.
    Raises on singular designs (constant feature, duplicated column).
    """
    d = len(feature_cols)
    if d == 0:
        raise ValueError("feature_cols must be non-empty")
    cols = [F.col(c).cast("double").alias(f"_x{i}") for i, c in enumerate(feature_cols)]
    base = df.select(*cols, F.col(label_col).cast("double").alias("_y"))
    cond = F.col("_y").isNotNull()
    for i in range(d):
        cond = cond & F.col(f"_x{i}").isNotNull()
    base = base.filter(cond)
    # augmented design: x_d == 1 (intercept); aggregate every moment once
    names = [f"_x{i}" for i in range(d)]
    terms = {}
    for i in range(d + 1):
        xi = F.col(names[i]) if i < d else F.lit(1.0)
        for j in range(i, d + 1):
            xj = F.col(names[j]) if j < d else F.lit(1.0)
            terms[f"xx_{i}_{j}"] = F.sum(xi * xj)
        terms[f"xy_{i}"] = F.sum(xi * F.col("_y"))
    terms["yy"] = F.sum(F.col("_y") * F.col("_y"))
    row = base.agg(*[v.alias(k) for k, v in terms.items()]).collect()[0]
    n = row[f"xx_{d}_{d}"]  # Σ 1·1
    if n is None or n < d + 1:
        raise ValueError(f"need more than {d + 1} complete rows, got {n or 0}")
    a = [
        [row[f"xx_{min(i, j)}_{max(i, j)}"] for j in range(d + 1)]
        for i in range(d + 1)
    ]
    b = [row[f"xy_{i}"] for i in range(d + 1)]
    try:
        import numpy as np

        beta = np.linalg.solve(np.array(a), np.array(b)).tolist()
    except ImportError:  # pragma: no cover — numpy is baked in here
        beta = _gauss_solve(a, b)
    sse = row["yy"] - sum(bi * yi for bi, yi in zip(beta, b))
    sy = b[d]  # Σ 1·y
    sst = row["yy"] - sy * sy / n
    r2 = 1.0 - sse / sst if sst > 0 else None
    out = [(feature_cols[i], float(beta[i])) for i in range(d)]
    out.append(("intercept", float(beta[d])))
    out.append(("r2", None if r2 is None else float(r2)))
    out.append(("n", float(n)))
    return df.sparkSession.createDataFrame(out, "term string, value double")


def _gauss_solve(a: list, b: list) -> list:
    """Partial-pivot Gauss–Jordan for the (d+1)-sized normal equations
    — model-sized, driver-side."""
    m = [row[:] + [bi] for row, bi in zip(a, b)]
    k = len(m)
    for col in range(k):
        piv = max(range(col, k), key=lambda r: abs(m[r][col]))
        if abs(m[piv][col]) < 1e-12:
            raise ValueError("singular design matrix (constant/duplicate feature?)")
        m[col], m[piv] = m[piv], m[col]
        pv = m[col][col]
        m[col] = [v / pv for v in m[col]]
        for r in range(k):
            if r != col and m[r][col] != 0.0:
                f = m[r][col]
                m[r] = [v - f * w for v, w in zip(m[r], m[col])]
    return [m[r][k] for r in range(k)]


def simpsons_check(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Simpson's-paradox detector for a bivariate trend: the sign of the
    x→y association in the POOLED data versus within each stratum —
    the aggregation trap (Simpson 1951) where a relationship reverses
    once a confounding stratum is controlled. Flags every stratum whose
    OLS slope sign contradicts the pooled slope's (zero-variance strata
    surface with NULL slope, never flagged).

    One grouped moment aggregate is the only corpus pass: the pooled
    moments are EXACTLY the column sums of the per-group moments, so
    the pooled slope folds in as a 1-row broadcast of the same relation
    re-aggregated — no second scan. Output per stratum:
    (group, n, slope, pooled_slope, reversed).
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    per = base.groupBy("_g").agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )

    def _slope(n, sx, sy, sxy, sxx):
        den = n * sxx - sx * sx
        return F.when(den > 0, (n * sxy - sx * sy) / den)

    pooled = per.agg(
        F.sum("_n").alias("_pn"),
        F.sum("_sx").alias("_psx"),
        F.sum("_sy").alias("_psy"),
        F.sum("_sxy").alias("_psxy"),
        F.sum("_sxx").alias("_psxx"),
    ).select(
        _slope(
            F.col("_pn"), F.col("_psx"), F.col("_psy"),
            F.col("_psxy"), F.col("_psxx"),
        ).alias("_pooled")
    )
    g_slope = _slope(
        F.col("_n"), F.col("_sx"), F.col("_sy"), F.col("_sxy"), F.col("_sxx")
    )
    return per.crossJoin(F.broadcast(pooled)).select(
        F.col("_g").alias(group_col),
        F.col("_n").cast("long").alias("n"),
        F.round(g_slope, 6).alias("slope"),
        F.round("_pooled", 6).alias("pooled_slope"),
        F.when(
            g_slope.isNotNull() & F.col("_pooled").isNotNull(),
            F.signum(g_slope) * F.signum(F.col("_pooled")) < 0,
        ).alias("reversed"),
    )


def _simple_ols(df: DataFrame, x_col: str, y_col: str, gcols: list) -> DataFrame:
    """Per-group simple-OLS sufficient statistics and closed-form
    coefficients (slope/intercept): one grouped moments aggregate —
    the shared first pass of the regression-diagnostics family
    (breusch_pagan / durbin_watson / cooks_distance_topk / chow_test).
    Returns per group: (_n, _mx, _my, _sxx, _sxy, _syy, _b, _a)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    agg = df.filter(x.isNotNull() & y.isNotNull()).groupBy(*gcols).agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(x).alias("_mx"),
        F.avg(y).alias("_my"),
        F.sum(x * x).alias("_xx"),
        F.sum(x * y).alias("_xy"),
        F.sum(y * y).alias("_yy"),
    )
    sxx = F.col("_xx") - F.col("_n") * F.col("_mx") * F.col("_mx")
    sxy = F.col("_xy") - F.col("_n") * F.col("_mx") * F.col("_my")
    syy = F.col("_yy") - F.col("_n") * F.col("_my") * F.col("_my")
    return agg.select(
        *gcols,
        "_n",
        "_mx",
        "_my",
        sxx.alias("_sxx"),
        sxy.alias("_sxy"),
        syy.alias("_syy"),
        (sxy / F.nullif(sxx, F.lit(0.0))).alias("_b"),
        (
            F.col("_my") - (sxy / F.nullif(sxx, F.lit(0.0))) * F.col("_mx")
        ).alias("_a"),
    )


def breusch_pagan(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Breusch–Pagan heteroscedasticity test (Breusch & Pagan 1979,
    Koenker's studentized LM form) for the per-group simple regression
    y ~ x: regress the SQUARED residuals on x; LM = n·R²_aux ~ χ²₁
    under homoscedasticity. The check that decides whether X191-style
    OLS standard errors can be trusted — heteroscedastic residuals
    (e.g. variance growing with the hour of day) silently break them.

    Scale design: two sequential grouped moments aggregates — pass 1
    fits the coefficients (closed form, _simple_ols), broadcast back;
    pass 2 computes corr(e², x) from conditional sums (for a single
    regressor R²_aux = corr²). No windows, no driver math. Output per
    group: (n, slope, intercept, lm_stat) — compare to 3.841 (α=.05).
    """
    gcols = [group_col] if group_col else []
    coefs = _simple_ols(df, x_col, y_col, gcols).select(
        *gcols, "_a", "_b"
    )
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull())
    j = (
        base.join(F.broadcast(coefs), gcols)
        if gcols
        else base.crossJoin(F.broadcast(coefs))
    )
    e2 = (y - F.col("_a") - F.col("_b") * x) * (
        y - F.col("_a") - F.col("_b") * x
    )
    out = j.groupBy(*gcols).agg(
        F.count("*").cast("double").alias("_n"),
        F.first("_b").alias("_slope"),
        F.first("_a").alias("_icpt"),
        F.corr(e2, x).alias("_r"),
    )
    return out.select(
        *gcols,
        F.col("_n").cast("long").alias("n"),
        F.round("_slope", 6).alias("slope"),
        F.round("_icpt", 6).alias("intercept"),
        F.round(F.col("_n") * F.col("_r") * F.col("_r"), 6).alias("lm_stat"),
    )


def durbin_watson(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ts_col: str,
    group_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Durbin–Watson serial-correlation statistic (Durbin & Watson
    1950) of the per-group simple-regression residuals in time order:
    DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² ∈ [0,4]; ≈2 means independent residuals,
    →0 positive autocorrelation (the regression is missing a temporal
    structure; its SEs are fictions), →4 negative. The time-series
    sibling of breusch_pagan in the diagnostics family.

    Scale design: pass 1 closed-form coefficients broadcast back;
    pass 2 one lag window PARTITIONED by group ordered by
    (ts, tiebreak) + one grouped aggregate. Output per group:
    (n, dw_stat).
    """
    gcols = [group_col] if group_col else []
    coefs = _simple_ols(df, x_col, y_col, gcols).select(*gcols, "_a", "_b")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull() & F.col(ts_col).isNotNull()
    )
    j = (
        base.join(F.broadcast(coefs), gcols)
        if gcols
        else base.crossJoin(F.broadcast(coefs))
    )
    from pyspark.sql.window import Window

    ocols = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*gcols).orderBy(*ocols)
    e = (y - F.col("_a") - F.col("_b") * x).alias("_e")
    keep = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    lagged = j.select(*gcols, *keep, e).withColumn(
        "_ep", F.lag("_e").over(w)
    )
    return (
        lagged.groupBy(*gcols)
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("_e") - F.col("_ep")) * (F.col("_e") - F.col("_ep"))
            ).alias("_num"),
            F.sum(F.col("_e") * F.col("_e")).alias("_den"),
        )
        .select(
            *gcols,
            "n",
            F.round(F.col("_num") / F.nullif(F.col("_den"), F.lit(0.0)), 6).alias(
                "dw_stat"
            ),
        )
    )


def cooks_distance_topk(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    group_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Top-k most influential observations per group by Cook's distance
    (Cook 1977) under the simple regression y ~ x — "which single rows
    are steering this fit": with leverage hᵢ = 1/n + (xᵢ−x̄)²/Sxx and
    s² = SSR/(n−2),

        Dᵢ = eᵢ²·hᵢ / (p·s²·(1−hᵢ)²),   p = 2

    Points with D > 4/n are the classic review set; the top-k cut keeps
    the output bounded regardless of corpus size.

    Scale design: coefficients + Sxx + SSR all come from the ONE
    closed-form moments pass (SSR = Syy − b·Sxy, no residual re-scan
    for s²); pass 2 computes each row's D in codegen and takes the
    per-group top-k via a partitioned row_number. Output:
    (group, id, x, y, leverage, cooks_d).
    """
    gcols = [group_col] if group_col else []
    coefs = _simple_ols(df, x_col, y_col, gcols)
    prm = coefs.select(
        *gcols,
        "_a",
        "_b",
        "_n",
        "_mx",
        "_sxx",
        ((F.col("_syy") - F.col("_b") * F.col("_sxy")) / (F.col("_n") - 2)).alias(
            "_s2"
        ),
    )
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull())
    j = (
        base.join(F.broadcast(prm), gcols)
        if gcols
        else base.crossJoin(F.broadcast(prm))
    )
    h = 1 / F.col("_n") + (x - F.col("_mx")) * (x - F.col("_mx")) / F.col("_sxx")
    e = y - F.col("_a") - F.col("_b") * x
    d = (e * e * h) / (2 * F.col("_s2") * (1 - h) * (1 - h))
    scored = j.select(
        *gcols,
        F.col(id_col),
        x.alias("x"),
        y.alias("y"),
        h.alias("_h"),
        d.alias("_d"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*gcols).orderBy(F.desc("_d"), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            *gcols,
            id_col,
            F.round("x", 6).alias("x"),
            F.round("y", 6).alias("y"),
            F.round("_h", 6).alias("leverage"),
            F.round("_d", 6).alias("cooks_d"),
        )
    )


def chow_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ts_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Chow structural-break test (Chow 1960) at each group's temporal
    midpoint: fit y ~ x pooled, then separately on the first and second
    halves of the time range, and test whether the two regimes share
    coefficients,

        F = ((SSR_p − SSR₁ − SSR₂)/k) / ((SSR₁+SSR₂)/(n−2k)),  k = 2

    — the regression-level complement to the CUSUM/Page–Hinkley mean
    detectors: those find WHERE the level moved; Chow says whether the
    RELATIONSHIP (slope) changed across the split.

    Scale design: the midpoint needs one (min,max) pass broadcast
    back; all three SSRs come from ONE conditional-moments aggregate
    (SSR = Syy − Sxy²/Sxx per regime, closed form) — no residual
    re-scan, no windows. Output per group: (n, n_1, n_2, f_stat).
    """
    gcols = [group_col] if group_col else []
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    t = F.col(ts_col).cast("timestamp").cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull() & F.col(ts_col).isNotNull()
    )
    mid = base.groupBy(*gcols).agg(
        ((F.min(t) + F.max(t)) / 2).alias("_mid")
    )
    j = (
        base.join(F.broadcast(mid), gcols)
        if gcols
        else base.crossJoin(F.broadcast(mid))
    )
    first = t <= F.col("_mid")

    def _moments(cond, tag):
        c = cond.cast("double")
        return [
            F.sum(c).alias(f"_n{tag}"),
            F.sum(F.when(cond, x)).alias(f"_sx{tag}"),
            F.sum(F.when(cond, y)).alias(f"_sy{tag}"),
            F.sum(F.when(cond, x * x)).alias(f"_xx{tag}"),
            F.sum(F.when(cond, x * y)).alias(f"_xy{tag}"),
            F.sum(F.when(cond, y * y)).alias(f"_yy{tag}"),
        ]

    agg = j.groupBy(*gcols).agg(
        *_moments(F.lit(True), "p"), *_moments(first, "1"), *_moments(~first, "2")
    )

    def _ssr(tag):
        n = F.col(f"_n{tag}")
        sxx = F.col(f"_xx{tag}") - F.col(f"_sx{tag}") * F.col(f"_sx{tag}") / n
        sxy = F.col(f"_xy{tag}") - F.col(f"_sx{tag}") * F.col(f"_sy{tag}") / n
        syy = F.col(f"_yy{tag}") - F.col(f"_sy{tag}") * F.col(f"_sy{tag}") / n
        return syy - sxy * sxy / F.nullif(sxx, F.lit(0.0))

    ssr_p, ssr_1, ssr_2 = _ssr("p"), _ssr("1"), _ssr("2")
    # ssr_1 + ssr_2 = 0 means both regimes fit PERFECTLY — F is
    # unbounded and reported NULL (the break, if any, is visible in the
    # coefficients themselves at that point)
    fstat = F.when(
        (F.col("_n1") >= 3) & (F.col("_n2") >= 3),
        ((ssr_p - ssr_1 - ssr_2) / 2)
        / (F.nullif(ssr_1 + ssr_2, F.lit(0.0)) / (F.col("_np") - 4)),
    )
    return agg.select(
        *gcols,
        F.col("_np").cast("long").alias("n"),
        F.col("_n1").cast("long").alias("n_1"),
        F.col("_n2").cast("long").alias("n_2"),
        F.round(fstat, 6).alias("f_stat"),
    )


def chow_sweep(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ts_col: str,
    fractions: tuple = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8),
) -> DataFrame:
    """Chow break-point SWEEP (Quandt 1960's sup-F idea over a bounded
    candidate grid): :func:`chow_test` asks "did the y~x relationship
    change at the midpoint"; this asks WHERE — the same F statistic
    evaluated at each candidate time fraction, with the argmax flagged.
    A bounded grid (not every observation) keeps the scan single-pass
    and the multiple-testing story honest: sup-F critical values
    (Andrews 1993) are grid-size constants the caller looks up.

    Scale design: one (min,max) pass broadcast back; ONE
    conditional-moments aggregate per candidate via a bounded literal
    explode (|fractions| rows per input row — the X342 period-probe
    shape); F is row arithmetic on the |fractions|-row relation and
    the argmax a 1-row broadcast. Output per candidate: (frac, n_1,
    n_2, f_stat) + best_frac (max F, ties toward the earlier break).
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(not 0.0 < f < 1.0 for f in fractions):
        raise ValueError(f"fractions must be in (0, 1), got {fractions}")
    y = F.col(y_col).cast("double")
    t = F.col(ts_col).cast("timestamp").cast("double")
    # x_col == ts_col is the trend-break sweep (y ~ t with a break in
    # trend); TIMESTAMP_NTZ needs the two-step cast either way
    x = t if x_col == ts_col else F.col(x_col).cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull() & F.col(ts_col).isNotNull()
    ).select(x.alias("_x"), y.alias("_y"), t.alias("_t"))
    rng = base.agg(F.min("_t").alias("_lo"), F.max("_t").alias("_hi"))
    fr = F.array(*[F.lit(float(f)) for f in sorted(fractions)])
    e = (
        base.crossJoin(F.broadcast(rng))
        .select("_x", "_y", "_t", "_lo", "_hi", F.explode(fr).alias("_f"))
        .withColumn(
            "_cut", F.col("_lo") + F.col("_f") * (F.col("_hi") - F.col("_lo"))
        )
    )
    first = F.col("_t") <= F.col("_cut")

    def _moments(cond, tag):
        xx, yy = F.col("_x"), F.col("_y")
        return [
            F.sum(cond.cast("double")).alias(f"_n{tag}"),
            F.sum(F.when(cond, xx)).alias(f"_sx{tag}"),
            F.sum(F.when(cond, yy)).alias(f"_sy{tag}"),
            F.sum(F.when(cond, xx * xx)).alias(f"_xx{tag}"),
            F.sum(F.when(cond, xx * yy)).alias(f"_xy{tag}"),
            F.sum(F.when(cond, yy * yy)).alias(f"_yy{tag}"),
        ]

    agg = e.groupBy("_f").agg(
        *_moments(F.lit(True), "p"),
        *_moments(first, "1"),
        *_moments(~first, "2"),
    )

    def _ssr(tag):
        n = F.col(f"_n{tag}")
        sxx = F.col(f"_xx{tag}") - F.col(f"_sx{tag}") * F.col(f"_sx{tag}") / n
        sxy = F.col(f"_xy{tag}") - F.col(f"_sx{tag}") * F.col(f"_sy{tag}") / n
        syy = F.col(f"_yy{tag}") - F.col(f"_sy{tag}") * F.col(f"_sy{tag}") / n
        return syy - sxy * sxy / F.nullif(sxx, F.lit(0.0))

    ssr_p, ssr_1, ssr_2 = _ssr("p"), _ssr("1"), _ssr("2")
    fstat = F.when(
        (F.col("_n1") >= 3) & (F.col("_n2") >= 3),
        ((ssr_p - ssr_1 - ssr_2) / 2)
        / (F.nullif(ssr_1 + ssr_2, F.lit(0.0)) / (F.col("_np") - 4)),
    )
    scored = agg.select(
        F.round("_f", 6).alias("frac"),
        F.col("_n1").cast("long").alias("n_1"),
        F.col("_n2").cast("long").alias("n_2"),
        F.round(fstat, 6).alias("f_stat"),
    )
    best = scored.agg(
        F.min_by(
            "frac", F.struct(-F.coalesce(F.col("f_stat"), F.lit(-1.0)),
                             F.col("frac"))
        ).alias("best_frac")
    )
    return (
        scored.crossJoin(F.broadcast(best)).orderBy("frac")
    )
