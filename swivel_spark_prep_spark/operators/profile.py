"""Table profiling: per-column stats in a single scan (ANALYZE-style).

The first thing anyone runs against an unfamiliar 100 TB table: null
counts, cardinalities, numeric ranges per column. One DataFrame
aggregate computes every statistic for every column in a single pass;
the 1-row result is pivoted to long format (one row per column) with
an explode over an in-row struct array — no second scan, no driver
loop over columns.

NDV default is ``approx_count_distinct`` (HLL++, mergeable, one pass).
``exact_ndv=True`` runs one column-pruned partial-aggregated
per-column distinct pass instead: P single-column scans read ~1×
the table's bytes total (columnar pruning), which measured 4–6×
faster than the multi-distinct EXPAND plan (a P-fold blow-up of
every row through one scan) and is the same shape DuckDB uses.
Exact mode still costs P aggregation jobs — keep HLL for routine
profiling at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact_ndv: bool = False
) -> DataFrame:
    """Long-format profile: (column, n_nulls, n_distinct, min_value,
    max_value) — min/max as double for numeric columns, NULL otherwise
    (cross-type min/max stringification is engine-specific and lies
    about collation; keep the typed lanes honest). Row order follows
    the input column order."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in by_name]
    if unknown:
        raise ValueError(f"columns not in schema: {unknown}")
    null_d = F.lit(None).cast("double")
    aggs, fields = [], []
    for i, c in enumerate(cols):
        numeric = isinstance(by_name[c], NumericType)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_n{i}"),
            (F.min(F.col(c)).cast("double") if numeric else null_d).alias(f"_lo{i}"),
            (F.max(F.col(c)).cast("double") if numeric else null_d).alias(f"_hi{i}"),
        ]
        if not exact_ndv:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"_d{i}"))
        fields.append(
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(f"_n{i}"), F.lit(0)).alias("n_nulls"),
                (
                    F.col(f"_d{i}")
                    if not exact_ndv
                    else F.lit(None).cast("long")
                ).alias("n_distinct"),
                F.col(f"_lo{i}").alias("min_value"),
                F.col(f"_hi{i}").alias("max_value"),
            )
        )
    base = (
        df.agg(*aggs)
        .select(F.explode(F.array(*fields)).alias("_p"))
        .select("_p.*")
    )
    if not exact_ndv:
        return base
    # exact NDVs: one column-pruned distinct aggregate per column,
    # unioned — ~1× the table's bytes in total across all scans,
    # measured 4-6× faster than the multi-distinct EXPAND plan
    ndv = None
    for c in cols:
        one = (
            df.select(c)
            .agg(F.count_distinct(F.col(c)).alias("_ndv"))
            .select(F.lit(c).alias("_col"), "_ndv")
        )
        ndv = one if ndv is None else ndv.unionByName(one)
    return (
        base.drop("n_distinct")
        .join(F.broadcast(ndv), F.col("column") == F.col("_col"))
        .select(
            "column",
            "n_nulls",
            F.col("_ndv").alias("n_distinct"),
            "min_value",
            "max_value",
        )
    )


def equidepth_histogram(
    df: DataFrame, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram: bins hold ~equal row
    counts, the complement of the fixed-width ``width_bucket`` binning.
    Cut points are the exact 1/n..(n-1)/n percentiles (linear
    interpolation) from ONE 1-row aggregate broadcast back; each row's
    bin is the count of cuts strictly below it — a codegen'd comparison
    chain, no window, no second shuffle beyond the final tiny
    per-bin aggregate. Returns (bin, n_rows, lo, hi) where lo/hi are
    the bin's cut bounds (NULL at the open ends). NULL values are
    EXCLUDED — they have no quantile position (percentile ignores them
    on the fit side already; binning them would manufacture a phantom
    NULL bin)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    probs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    vals = df.select(value_col).filter(F.col(value_col).isNotNull())
    cuts = vals.agg(
        F.expr(f"percentile({value_col}, array({probs}))").alias("_cuts")
    )
    binned = vals.crossJoin(F.broadcast(cuts)).select(
        F.aggregate(
            "_cuts",
            F.lit(0).cast("long"),
            lambda acc, c: acc + (F.col(value_col) > c).cast("long"),
        ).alias("bin"),
        F.col("_cuts"),
    )
    return (
        binned.groupBy("bin", "_cuts")
        .agg(F.count("*").alias("n_rows"))
        .select(
            "bin",
            "n_rows",
            F.when(F.col("bin") > 0, F.element_at("_cuts", F.col("bin").cast("int")))
            .alias("lo"),
            F.when(
                F.col("bin") < n_bins - 1,
                F.element_at("_cuts", F.col("bin").cast("int") + 1),
            ).alias("hi"),
        )
    )


def approx_distinct_rollup(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Mergeable distinct-count sketches: one HLL (Datasketches
    HllSketch via Spark's hll_sketch_agg) per group, PLUS the grand
    total obtained by UNIONING the per-group sketches — never
    rescanning the data. This is the sketch-partitioned pattern that
    makes distinct counts composable across shards/days at 100 TB:
    per-partition sketches are tiny (2^lg_k registers), re-aggregable,
    and the union is exact over the sketch algebra (estimate error
    ~1.04/sqrt(2^lg_k), ±1.6% at the default lg_k=12).

    Returns (group, n_approx) per group plus a '__total__' row from the
    sketch union. Estimates are engine-specific (no DuckDB oracle);
    error bounds are property-tested against exact counts."""
    sk = df.groupBy(F.col(group_col).alias("g")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("_sk")
    )
    per_group = sk.select(
        "g", F.hll_sketch_estimate("_sk").cast("long").alias("n_approx")
    )
    total = sk.agg(F.hll_union_agg("_sk").alias("_u")).select(
        F.lit("__total__").alias("g"),
        F.hll_sketch_estimate("_u").cast("long").alias("n_approx"),
    )
    return per_group.unionByName(total)


# --- mergeable quantile sketch (DDSketch) ------------------------------------
# Masson, Rim & Lee 2019, "DDSketch: A Fast and Fully-Mergeable Quantile
# Sketch with Relative-Error Guarantees" (VLDB, public): values bucket
# into geometrically-spaced bins (gamma = (1+alpha)/(1-alpha)); the
# sketch IS the (bucket -> count) map, merging is cell-wise count
# addition, and any quantile read back from the merged map has relative
# error <= alpha on the value. Chosen over KLL/t-digest because the
# bucket map is PURELY relational in Spark — groupBy(bucket).count()
# with map-side partials, no per-item UDF state — and the arithmetic is
# deterministic, so a DuckDB oracle can replay it exactly. This is the
# percentile twin of approx_distinct_rollup's HLL pattern: per-shard
# sketches compose by re-aggregation, never rescanning 100 TB.


def _dd_gamma(alpha: float) -> float:
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def ddsketch_build(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """Build the sketch relation (g, sign, bucket, cnt) — one narrow
    aggregate whose key space is O(log_gamma(value range)) per group.

    sign in {-1,0,1} mirrors negative magnitudes into their own bucket
    axis and gives zero its own cell (the paper stores these as
    separate stores; one relation with a sign column is the relational
    encoding). Bucket for |x|>0 is ceil(ln|x|/ln gamma - 1e-11) — the
    ε-nudge keeps engines that differ in the last ulp of ln() on the
    same side of exact powers (the X142 convention, applied on BOTH
    sides). NULLs are excluded: they have no quantile position."""
    import math

    lg = math.log(_dd_gamma(alpha))
    x = F.col(value_col).cast("double")
    g = (F.col(group_col) if group_col else F.lit("__all__")).alias("g")
    sign = F.when(x > 0, 1).when(x < 0, -1).otherwise(0).alias("sign")
    bucket = (
        F.when(x == 0, F.lit(0))
        .otherwise(F.ceil(F.log(F.abs(x)) / F.lit(lg) - F.lit(1e-11)))
        .cast("long")
        .alias("bucket")
    )
    return (
        df.filter(x.isNotNull())
        .select(g, sign, bucket)
        .groupBy("g", "sign", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def ddsketch_merge(sketch: DataFrame, total_label: str = "__total__") -> DataFrame:
    """Merge every group's sketch into one by cell-wise count addition —
    the rollup is EXACT over the sketch algebra (merging loses nothing
    beyond what bucketing already lost), so merge-then-query equals
    sketch-the-whole-table, a property the tests pin as relation
    equality. Input/output schema: (g, sign, bucket, cnt)."""
    return (
        sketch.groupBy("sign", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.lit(total_label).alias("g"), "sign", "bucket", "cnt")
    )


def ddsketch_quantiles(
    sketch: DataFrame, qs: list, alpha: float = 0.01
) -> DataFrame:
    """Read quantiles out of a sketch relation: per group, buckets sort
    by true value order (sign, sign*bucket), a running count finds the
    bucket holding rank floor(q*(n-1)), and the estimate is the bucket
    midpoint 2*gamma^b/(gamma+1) (sign-adjusted; 0 for the zero cell).
    The window runs over per-group bucket GRIDS (log-bounded, never
    data-sized). Output: (g, q, est)."""
    from pyspark.sql import Window

    gamma = _dd_gamma(alpha)
    w = Window.partitionBy("g").orderBy("sign", F.col("sign") * F.col("bucket"))
    cum = sketch.withColumn("_cum", F.sum("cnt").over(w)).withColumn(
        "_n", F.sum("cnt").over(Window.partitionBy("g"))
    )
    probes = cum.select(
        "g",
        "sign",
        "bucket",
        "_cum",
        "_n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    est = (
        F.when(F.col("sign") == 0, F.lit(0.0))
        .otherwise(
            F.col("sign")
            * 2.0
            * F.pow(F.lit(gamma), F.col("bucket"))
            / F.lit(gamma + 1.0)
        )
        .alias("_est")
    )
    return (
        probes.filter(F.col("_cum") > F.floor(F.col("q") * (F.col("_n") - 1)))
        .select("g", "q", est, "_cum")
        .groupBy("g", "q")
        .agg(F.min_by("_est", "_cum").alias("est"))
    )


# --- KMV (bottom-k) distinct sketch -------------------------------------------
# Bar-Yossef et al. 2002 "Counting distinct elements in a data stream"
# (public; the k-minimum-values estimator): keep the k smallest hash
# values of the distinct items; merging two sketches = union then keep
# the k smallest again (lossless over the sketch algebra, like the
# DDSketch merge above); the distinct-count estimate is (k-1)/h_k with
# h_k the k-th smallest hash mapped to (0,1]. Relative error
# ~1/sqrt(k-2). Everything is deterministic md5 arithmetic, so the
# DuckDB oracle replays it exactly — and the sketch doubles as a
# REPLAYABLE uniform sample of the distinct values (hash-order is a
# random order fixed across engines and runs).

#: hash space: first 15 md5 hex chars = 60 bits, comfortably inside
#: int64 and exactly replayable as ('0x'||substr(md5(v),1,15))::BIGINT
_KMV_BITS = 60


def _kmv_hash(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_build(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    k: int = 256,
) -> DataFrame:
    """Build the sketch relation (g, pos, hv): the ``k`` smallest
    60-bit hashes of the group's DISTINCT values, pos = 1-based rank.
    One distinct-aggregate plus a window over per-group DISTINCT-HASH
    relations — the window input is already collapsed to distinct
    hashes, never raw rows. NULL values are excluded (they are not an
    item; count them separately if needed)."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = (F.col(group_col) if group_col else F.lit("__all__")).alias("g")
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(g, _kmv_hash(F.col(value_col)).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("hv")
    return (
        hashes.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("g", "pos", "hv")
    )


def kmv_merge(
    sketch: DataFrame, k: int = 256, total_label: str = "__total__"
) -> DataFrame:
    """Merge every group's sketch into one: union the hash sets, keep
    the k smallest — identical to sketching the union of the groups
    (relation-equality is test-pinned). Same schema as kmv_build."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1)).orderBy("hv")
    return (
        sketch.select("hv")
        .distinct()
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(F.lit(total_label).alias("g"), "pos", "hv")
    )


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimates per group: if the group has fewer than
    k hashes the count is EXACT (the sketch holds every distinct hash);
    otherwise ndv ≈ (k-1) / (h_k / 2^60). Output: (g, n_approx)."""
    agg = sketch.groupBy("g").agg(
        F.count("*").alias("_n"), F.max("hv").alias("_hk")
    )
    scale = float(2**_KMV_BITS)
    return agg.select(
        "g",
        F.when(F.col("_n") < k, F.col("_n"))
        .otherwise(
            F.round((k - 1) / (F.col("_hk") / F.lit(scale))).cast("long")
        )
        .alias("n_approx"),
    )


# --- join-key skew report ------------------------------------------------------


def skew_report(
    df: DataFrame, key_col: str, top: int = 10
) -> DataFrame:
    """Pre-flight skew profile for a prospective join/groupBy key: the
    ``top`` heaviest keys with their counts and share of all rows, plus
    one '__stats__' row carrying the distribution-level signals — key
    count, max/mean ratio (the straggler factor: how much longer the
    hottest reducer runs than the average), and the p50/p99/max key
    sizes. All computed on the (key, cnt) relation — one aggregate over
    the data, everything after is vocabulary-sized. A max/mean ratio in
    the hundreds is the "salt this key or enable AQE skew join" signal.
    Output: (kind, key, cnt, share, n_keys, max_over_mean, p50, p99)."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    from swivel_spark_prep_spark.cache import track_persist

    counts = track_persist(counts)
    total = counts.agg(
        F.sum("cnt").alias("_tot"),
        F.count("*").alias("_nk"),
        F.max("cnt").alias("_mx"),
        F.avg("cnt").alias("_mean"),
        F.expr("percentile(cnt, 0.5)").alias("_p50"),
        F.expr("percentile(cnt, 0.99)").alias("_p99"),
    )
    hot = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top)
        .select(
            F.lit("hot_key").alias("kind"),
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_tot"), 6).alias("share"),
            F.lit(None).cast("long").alias("n_keys"),
            F.lit(None).cast("double").alias("max_over_mean"),
            F.lit(None).cast("double").alias("p50"),
            F.lit(None).cast("double").alias("p99"),
        )
    )
    stats = total.select(
        F.lit("__stats__").alias("kind"),
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("long").alias("cnt"),
        F.lit(None).cast("double").alias("share"),
        F.col("_nk").alias("n_keys"),
        F.round(F.col("_mx") / F.col("_mean"), 4).alias("max_over_mean"),
        F.round("_p50", 4).alias("p50"),
        F.round("_p99", 4).alias("p99"),
    )
    return hot.unionByName(stats)


def kmv_jaccard(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Pairwise Jaccard estimates between all group sketches in a
    (g, pos, hv) relation from :func:`kmv_build` — the k-minimum-values
    set-resemblance estimator (Bar-Yossef et al. 2002; Beyer et al.
    2007): for groups A, B take S = the k smallest hashes of A ∪ B
    (computable from the two sketches alone — every union-bottom-k hash
    is in one of the input bottom-ks) and estimate

        J(A, B) ≈ |S ∩ sketch(A) ∩ sketch(B)| / |S|

    which is EXACT over the hashed distinct sets whenever |A ∪ B| ≤ k.
    Everything here is sketch-sized: the pair frame is #groups² rows
    (group cardinality is control-plane — sources, languages, shards),
    each pair's union ≤ 2k hashes, and the ranking window is PARTITIONED
    by the pair. Output: (g1, g2, union_k, j_est), g1 < g2.
    """
    from pyspark.sql import Window

    gs = sketch.select("g").distinct()
    pairs = (
        gs.select(F.col("g").alias("g1"))
        .crossJoin(gs.select(F.col("g").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    side_a = sketch.select(F.col("g").alias("g1"), "hv")
    side_b = sketch.select(F.col("g").alias("g2"), "hv")
    union = (
        pairs.join(side_a, "g1")
        .select("g1", "g2", "hv")
        .unionByName(pairs.join(side_b, "g2").select("g1", "g2", "hv"))
        .distinct()
    )
    w = Window.partitionBy("g1", "g2").orderBy("hv")
    bottom = union.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= k
    )
    flagged = (
        bottom.join(
            side_a.withColumn("__a", F.lit(1)), ["g1", "hv"], "left"
        ).join(side_b.withColumn("__b", F.lit(1)), ["g2", "hv"], "left")
    )
    return (
        flagged.groupBy("g1", "g2")
        .agg(
            F.count("*").alias("union_k"),
            F.sum(
                (F.col("__a").isNotNull() & F.col("__b").isNotNull()).cast(
                    "long"
                )
            ).alias("__inter"),
        )
        .select(
            "g1",
            "g2",
            "union_k",
            F.round(F.col("__inter") / F.col("union_k"), 6).alias("j_est"),
        )
    )


def join_size_estimate(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    k: int = 256,
) -> DataFrame:
    """Pre-flight equi-join cardinality estimate from KMV sketches —
    answer "how big is A ⋈ B going to be?" WITHOUT running the join,
    the sizing question every 100 TB shuffle plan should ask first
    (pick broadcast vs sort-merge, provision shuffle partitions, catch
    an accidental many-to-many blow-up). One scan per side builds the
    two bottom-k sketches; everything after is sketch-sized:

        ndv_inter ≈ J(A, B) · ndv(A ∪ B)        (the X179 estimator)
        est_rows  ≈ ndv_inter · (rows_a / ndv_a) · (rows_b / ndv_b)

    — the standard uniform-multiplicity (containment) assumption of
    textbook join estimation; a heavy-hitter key budget beyond it is
    what :func:`skew_report` is for. Keys are hashed via their string
    form (the module's 60-bit md5 idiom), so any engine replays the
    arithmetic exactly. Output is ONE row: (rows_a, rows_b, ndv_a,
    ndv_b, ndv_union, j_est, ndv_inter, est_rows). ndv values are
    EXACT whenever a side (or the union) has fewer than k distinct
    keys — at fixture scale the estimate is then exact too, which is
    what the oracle pins; the test separately bounds the estimator
    against the true join size.
    """
    from swivel_spark_prep_spark.cache import track_persist

    fa = a.filter(F.col(a_key).isNotNull()).select(
        F.col(a_key).cast("string").alias("v")
    )
    fb = b.filter(F.col(b_key).isNotNull()).select(
        F.col(b_key).cast("string").alias("v")
    )
    rows = (
        fa.agg(F.count("*").alias("rows_a"))
        .crossJoin(fb.agg(F.count("*").alias("rows_b")))
    )
    sk = track_persist(
        kmv_build(
            fa.withColumn("g", F.lit("a")).unionByName(
                fb.withColumn("g", F.lit("b"))
            ),
            "v",
            group_col="g",
            k=k,
        )
    )
    ndv = (
        kmv_estimate(sk, k)
        .groupBy()
        .pivot("g", ["a", "b"])
        .sum("n_approx")
        .select(F.col("a").alias("ndv_a"), F.col("b").alias("ndv_b"))
    )
    merged = kmv_merge(sk, k, total_label="__u__")
    union_est = kmv_estimate(merged, k).select(
        F.col("n_approx").alias("ndv_union")
    )
    side_a = sk.filter(F.col("g") == "a").select("hv", F.lit(1).alias("__a"))
    side_b = sk.filter(F.col("g") == "b").select("hv", F.lit(1).alias("__b"))
    j = (
        merged.join(side_a, "hv", "left")
        .join(side_b, "hv", "left")
        .agg(
            (
                F.sum((F.col("__a").isNotNull() & F.col("__b").isNotNull()).cast("long"))
                / F.count("*")
            ).alias("j_est")
        )
    )
    return (
        rows.crossJoin(F.broadcast(ndv))
        .crossJoin(F.broadcast(union_est))
        .crossJoin(F.broadcast(j))
        .select(
            "rows_a",
            "rows_b",
            "ndv_a",
            "ndv_b",
            "ndv_union",
            F.round("j_est", 6).alias("j_est"),
            F.round(F.col("j_est") * F.col("ndv_union")).cast("long").alias("ndv_inter"),
            F.round(
                F.col("j_est")
                * F.col("ndv_union")
                * (F.col("rows_a") / F.col("ndv_a"))
                * (F.col("rows_b") / F.col("ndv_b"))
            )
            .cast("long")
            .alias("est_rows"),
        )
    )


def json_schema_profile(
    df: DataFrame,
    json_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Schema profile of a JSON-in-string column: per top-level key, the
    observed VALUE TYPE distribution — the semi-structured twin of
    profile_table and the first audit against schema drift in event
    streams (a producer that starts sending "42" instead of 42, or
    null-ing a field, shows up as a new (key, type) row).

    Plan: parse once to map<string,string> (one JVM from_json per row),
    explode the map (fan-out = keys per object — the document's OWN
    size, never corpus-squared), classify the value text by literal
    pattern (JSON scalars keep their lexical form, so int/float/bool/
    null are decidable by regex; nested objects/arrays keep their
    braces), one hash aggregate. Malformed rows surface as key
    '__invalid__' rather than vanishing. Output: (key, value_type, n
    [, n_distinct]) per optional grouping.
    """
    from pyspark.sql.types import MapType, StringType

    gcols = list(group_cols or [])
    parsed = F.from_json(F.col(json_col), MapType(StringType(), StringType()))
    rows = df.select(
        *gcols,
        F.when(parsed.isNull() & F.col(json_col).isNotNull(), True)
        .otherwise(False)
        .alias("_bad"),
        parsed.alias("_m"),
    )
    kv = rows.select(
        *gcols,
        F.explode(
            F.when(
                F.col("_bad"),
                F.create_map(F.lit("__invalid__"), F.lit(None).cast("string")),
            ).otherwise(F.col("_m"))
        ).alias("key", "value"),
    )
    v = F.col("value")
    vtype = (
        F.when(F.col("key") == "__invalid__", F.lit("invalid"))
        .when(v.isNull(), F.lit("null"))
        .when(v.rlike("^-?[0-9]+$"), F.lit("integer"))
        .when(
            v.rlike("^-?[0-9]+\\.[0-9]+([eE][+-]?[0-9]+)?$"), F.lit("number")
        )
        .when((v == "true") | (v == "false"), F.lit("boolean"))
        .when(v.rlike("^\\{"), F.lit("object"))
        .when(v.rlike("^\\["), F.lit("array"))
        .otherwise(F.lit("string"))
    )
    return (
        kv.select(*gcols, "key", vtype.alias("value_type"))
        .groupBy(*gcols, "key", "value_type")
        .agg(F.count("*").alias("n"))
    )


def fd_histogram(
    df: DataFrame,
    value_col: str,
    max_bins: int = 200,
) -> DataFrame:
    """Auto-binned histogram with the Freedman–Diaconis rule (1981):
    bin width = 2·IQR/n^(1/3) — the robust default that neither
    over-smooths (Sturges on big n) nor lets outliers dictate the
    shape (equal-width over the full range). Statistics (n, IQR,
    min/max) come from ONE exact-percentile aggregate; bin assignment
    is one in-row floor; counts are one hash aggregate. ``max_bins``
    clamps pathological outlier ranges (clamped runs surface via the
    returned bin width growing, never by dropping data — the top bin
    absorbs the tail). Degenerate inputs (IQR = 0) collapse to one
    bin. Output: (bin, lo, hi, n) with lo/hi the bin's value bounds.
    """
    if max_bins < 1:
        raise ValueError(f"max_bins must be >= 1, got {max_bins}")
    v = F.col(value_col).cast("double")
    base = df.select(v.alias("_v")).filter(F.col("_v").isNotNull())
    stats = base.agg(
        F.count("*").alias("_n"),
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.percentile("_v", F.lit(0.75)).alias("_q3"),
        F.percentile("_v", F.lit(0.25)).alias("_q1"),
    ).select(
        "_n",
        "_lo",
        "_hi",
        (
            F.lit(2.0)
            * (F.col("_q3") - F.col("_q1"))
            / F.pow(F.col("_n").cast("double"), 1.0 / 3.0)
        ).alias("_w"),
    ).select(
        "_n",
        "_lo",
        "_hi",
        F.when(
            (F.col("_w") > 0) & (F.col("_hi") > F.col("_lo")),
            F.least(
                F.ceil((F.col("_hi") - F.col("_lo")) / F.col("_w")).cast(
                    "int"
                ),
                F.lit(int(max_bins)),
            ),
        )
        .otherwise(F.lit(1))
        .alias("_k"),
    )
    binned = base.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("_hi") > F.col("_lo"),
            F.least(
                F.floor(
                    (F.col("_v") - F.col("_lo"))
                    / ((F.col("_hi") - F.col("_lo")) / F.col("_k"))
                ).cast("int"),
                F.col("_k") - 1,
            ),
        ).otherwise(F.lit(0)).alias("bin"),
        "_lo",
        "_hi",
        "_k",
    )
    return (
        binned.groupBy("bin", "_lo", "_hi", "_k")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(
                F.col("_lo")
                + F.col("bin") * (F.col("_hi") - F.col("_lo")) / F.col("_k"),
                6,
            ).alias("lo"),
            F.round(
                F.col("_lo")
                + (F.col("bin") + 1)
                * (F.col("_hi") - F.col("_lo"))
                / F.col("_k"),
                6,
            ).alias("hi"),
            "n",
        )
    )
