"""Property/behavior tests for the round-9 operators: DDSketch mergeable
quantiles (X144) and the CMS-backed bounded-state running top-k stream."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_table
from swivel_spark_prep_spark.operators.profile import (
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantiles,
)

ALPHA = 0.05
QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


# --- DDSketch: merge exactness ------------------------------------------------


def test_ddsketch_merge_equals_whole_table_sketch(spark, sf_dir):
    """Rollup-by-merge is EXACT over the sketch algebra: merging the
    per-source sketches must yield the identical (sign, bucket, cnt)
    relation as sketching the whole table in one pass — the property
    that makes per-shard profiling of a 100 TB corpus composable."""
    docs = load_table(spark, sf_dir, "documents")
    per_group = ddsketch_build(docs, "n_chars", "source", alpha=ALPHA)
    merged = {
        (r.sign, r.bucket): r.cnt
        for r in ddsketch_merge(per_group).collect()
    }
    whole = {
        (r.sign, r.bucket): r.cnt
        for r in ddsketch_build(docs, "n_chars", alpha=ALPHA).collect()
    }
    assert merged == whole


# --- DDSketch: relative-error guarantee ---------------------------------------


@pytest.mark.parametrize("alpha", [0.01, 0.05])
def test_ddsketch_relative_error_bound(spark, sf_dir, alpha):
    """The paper's guarantee: for each q, the estimate is within alpha
    relative error of the TRUE rank-floor(q*(n-1)) item. Checked
    against the exact order statistics (numpy sort of the fixture
    column — test-scale only)."""
    docs = load_table(spark, sf_dir, "documents")
    sk = ddsketch_build(docs, "n_chars", alpha=alpha)
    got = {
        round(r.q, 4): r.est
        for r in ddsketch_quantiles(sk, QS, alpha=alpha).collect()
    }
    vals = np.sort(
        np.array([r.n_chars for r in docs.select("n_chars").collect()], dtype=float)
    )
    n = len(vals)
    for q in QS:
        exact = vals[int(np.floor(q * (n - 1)))]
        est = got[round(q, 4)]
        assert abs(est - exact) <= alpha * abs(exact) + 1e-9, (
            f"q={q}: est {est} vs exact {exact} exceeds alpha={alpha}"
        )


def test_ddsketch_handles_negatives_zero_and_nulls(spark):
    """Sign-mirrored buckets: negatives, zero and NULLs all land where
    the value order puts them; NULLs are excluded entirely."""
    pdf = [(-100.0,), (-1.0,), (0.0,), (0.5,), (2.0,), (300.0,), (None,)]
    df = spark.createDataFrame(pdf, "x double")
    sk = ddsketch_build(df, "x", alpha=0.05)
    assert sk.agg(F.sum("cnt")).first()[0] == 6  # NULL excluded
    qs = {
        round(r.q, 4): r.est
        for r in ddsketch_quantiles(sk, [0.0, 0.5, 1.0], alpha=0.05).collect()
    }
    # rank 0 item is -100 -> estimate within 5% and negative
    assert qs[0.0] < 0 and abs(qs[0.0] + 100) <= 5 + 1e-9
    # median rank item is 0.5 (ranks: -100,-1,0,0.5,2,300 -> floor(0.5*5)=2 -> 0)
    assert qs[0.5] == 0.0
    assert abs(qs[1.0] - 300) <= 15 + 1e-9


def test_ddsketch_alpha_validation():
    with pytest.raises(ValueError):
        from swivel_spark_prep_spark.operators.profile import _dd_gamma

        _dd_gamma(1.5)


# --- CMS-backed running top-k stream ------------------------------------------


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_stream_running_topk_cms_matches_exact(spark, tmp_path, docs):
    """The bounded-state CMS variant must read back the SAME cumulative
    top-k as the exact-count stream on the fixture (at 4096x4 the
    fixture vocabulary has no colliding heavy hitters), while its state
    stays O(depth*width) cells + O(k*pool) candidates per batch."""
    import glob
    import shutil

    from swivel_spark_prep_spark.streaming import stream_running_topk_terms_cms

    stage = tmp_path / "stage"
    drops = tmp_path / "drops"
    drops.mkdir()
    half = docs.select("doc_id", "text")
    parts = [
        half.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    for i, part in enumerate(parts):
        part.coalesce(1).write.parquet(str(stage / f"b{i}"))
        f = glob.glob(str(stage / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(drops / f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drops))
    )
    k, depth, width, pool = 5, 4, 4096, 4
    q = stream_running_topk_terms_cms(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        k=k,
        width=width,
        depth=depth,
        pool=pool,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    last = max(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(str(tmp_path / "out" / "batch_id=*"))
    )
    got = [
        (r.token, r.est)
        for r in spark.read.parquet(str(tmp_path / "out" / f"batch_id={last}"))
        .orderBy(F.desc("est"), F.asc("token"))
        .collect()
    ]
    want = [
        (r.token, r.cnt)
        for r in half.select(
            F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
        .collect()
    ]
    assert got == want
    # bounded state: every batch's CMS grid and candidate list obey caps
    for b in range(last + 1):
        cms_rows = spark.read.parquet(
            str(tmp_path / "state" / "cms" / f"batch_id={b}")
        ).count()
        assert cms_rows <= depth * width
        cand_rows = spark.read.parquet(
            str(tmp_path / "state" / "cand" / f"batch_id={b}")
        ).count()
        assert cand_rows <= k * pool


# --- KMV sketch ----------------------------------------------------------------


def test_kmv_merge_equals_whole_sketch(spark, docs):
    from swivel_spark_prep_spark.operators.profile import kmv_build, kmv_merge

    toks = docs.select(
        F.col("source").alias("g"),
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    ).filter(F.col("t") != "")
    per = kmv_build(toks, "t", "g", k=64)
    merged = {(r.pos, r.hv) for r in kmv_merge(per, k=64).collect()}
    whole = {
        (r.pos, r.hv) for r in kmv_build(toks, "t", k=64).collect()
    }
    assert merged == whole


def test_kmv_exact_below_k_and_error_bound(spark, docs):
    from swivel_spark_prep_spark.operators.profile import kmv_build, kmv_estimate

    toks = docs.select(
        F.col("source").alias("g"),
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    ).filter(F.col("t") != "")
    exact = {
        r.g: r.n
        for r in toks.groupBy("g").agg(F.countDistinct("t").alias("n")).collect()
    }
    # k larger than any group's ndv -> every estimate is EXACT
    big = kmv_estimate(kmv_build(toks, "t", "g", k=100000), k=100000)
    for r in big.collect():
        assert r.n_approx == exact[r.g], (r.g, r.n_approx, exact[r.g])
    # small k -> within the ~1/sqrt(k-2) relative-error envelope (x4 slack)
    k = 64
    small = kmv_estimate(kmv_build(toks, "t", "g", k=k), k=k)
    for r in small.collect():
        if exact[r.g] <= k:
            assert r.n_approx == exact[r.g]
        else:
            rel = abs(r.n_approx - exact[r.g]) / exact[r.g]
            assert rel <= 4.0 / (k - 2) ** 0.5, (r.g, r.n_approx, exact[r.g])


def test_kmv_k_validation():
    import pytest as _pytest

    from swivel_spark_prep_spark.operators.profile import kmv_build

    with _pytest.raises(ValueError):
        kmv_build(None, "x", k=1)


# --- skew report ----------------------------------------------------------------


def test_skew_report_shapes_and_shares(spark):
    from swivel_spark_prep_spark.operators.profile import skew_report

    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 10 + [(c,) for c in "cdefg"], "k string"
    )
    rows = skew_report(df, "k", top=3).collect()
    hot = [r for r in rows if r.kind == "hot_key"]
    stats = [r for r in rows if r.kind == "__stats__"]
    assert len(hot) == 3 and len(stats) == 1
    assert hot[0].key == "a" and hot[0].cnt == 50
    assert abs(hot[0].share - 50 / 65) < 1e-6  # share is ROUND(.., 6)
    s = stats[0]
    assert s.n_keys == 7
    # max/mean = 50 / (65/7)
    assert abs(s.max_over_mean - 50 / (65 / 7)) < 1e-3


# --- funnel ----------------------------------------------------------------------


def test_funnel_monotone_and_order_respecting(spark):
    from swivel_spark_prep_spark.operators.timeseries import funnel

    rows = [
        # u1 completes in order
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "buy"),
        # u2 clicks BEFORE viewing -> must not count past step 1
        (2, "2024-01-01 01:00:00", "click"),
        (2, "2024-01-01 02:00:00", "view"),
        # u3 views only
        (3, "2024-01-01 00:00:00", "view"),
        # u4 completes but outside the horizon
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-03 00:00:00", "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, event_type string")
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        r.step: r.n_keys
        for r in funnel(
            ev, ["view", "click", "buy"], horizon_seconds=86400
        ).collect()
    }
    assert got == {1: 4, 2: 1, 3: 1}
    counts = [got[i] for i in sorted(got)]
    assert counts == sorted(counts, reverse=True)  # monotone non-increasing


def test_funnel_rejects_empty_steps(spark):
    import pytest as _pytest

    from swivel_spark_prep_spark.operators.timeseries import funnel

    with _pytest.raises(ValueError):
        funnel(spark.range(1), [])


# --- quantile normalization -------------------------------------------------------


def test_quantile_normalize_uniform_fractions(spark):
    """The normalized threshold keeps the same FRACTION of every group
    regardless of the groups' raw scales — the property the operator
    exists for (a raw threshold would keep all of the large-scale group
    and none of the small one)."""
    from swivel_spark_prep_spark.operators.quality import quantile_normalize

    rows = [("big", float(1000 + i)) for i in range(100)] + [
        ("small", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    n = quantile_normalize(df, "x", "g")
    kept = (
        n.filter(F.col("q_norm") >= 0.75)
        .groupBy("g")
        .count()
        .collect()
    )
    by_g = {r.g: r["count"] for r in kept}
    # percent_rank >= .75 keeps exactly 25 of each 100-row group
    assert by_g == {"big": 25, "small": 25}
    # raw threshold at the global p75 would keep ONLY the big group
    raw_kept = df.filter(F.col("x") >= 1000).groupBy("g").count().collect()
    assert {r.g for r in raw_kept} == {"big"}


# --- eval metrics ----------------------------------------------------------------


def test_binary_auc_hand_computed_with_ties(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import binary_auc

    # scores: pos {3, 2}, neg {2, 1} -> pairs: (3>2)+(3>1)+(2=2: .5)+(2>1)
    # = 3.5 / 4 = 0.875
    df = spark.createDataFrame(
        [(3.0, True), (2.0, True), (2.0, False), (1.0, False)],
        "s double, y boolean",
    )
    r = binary_auc(df, "s", "y").first()
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert abs(r.auc - 0.875) < 1e-12
    # perfect separation -> 1.0; inverted -> 0.0
    perfect = spark.createDataFrame(
        [(2.0, True), (1.0, False)], "s double, y boolean"
    )
    assert binary_auc(perfect, "s", "y").first().auc == 1.0
    # single-class input -> NULL (undefined), not 0
    onecls = spark.createDataFrame([(1.0, True)], "s double, y boolean")
    assert binary_auc(onecls, "s", "y").first().auc is None


def test_cohens_kappa_bounds(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import cohens_kappa

    agree = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x")], "a string, b string"
    )
    r = cohens_kappa(agree, "a", "b").first()
    assert r.po == 1.0 and abs(r.kappa - 1.0) < 1e-12
    # statistically independent labels -> kappa ~ 0
    indep = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")], "a string, b string"
    )
    r2 = cohens_kappa(indep, "a", "b").first()
    assert abs(r2.kappa) < 1e-12
    # degenerate single-label pair -> NULL (pe = 1)
    degen = spark.createDataFrame([("x", "x")], "a string, b string")
    assert cohens_kappa(degen, "a", "b").first().kappa is None


def test_calibration_ece_perfectly_calibrated(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import calibration_report

    # bin 0.25: 1 of 4 positive; bin 0.75: 3 of 4 positive -> ECE 0
    rows = [(0.25, i == 0) for i in range(4)] + [
        (0.75, i != 0) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "p double, y boolean")
    out = {r.kind: r for r in calibration_report(df, "p", "y", bins=2).collect()
           if r.kind == "__ece__"}
    assert abs(out["__ece__"].gap) < 1e-12
    bins = [
        r
        for r in calibration_report(df, "p", "y", bins=2).collect()
        if r.kind == "bin"
    ]
    assert {b.bin for b in bins} == {0, 1}
    for b in bins:
        assert abs(b.conf - b.acc) < 1e-12


# --- duplicated-span burden (X153 composition) -----------------------------------


def test_dup_span_burden_rolls_up_x72(spark, sf_dir):
    """X153 is the per-source rollup of duplicate_ngram_spans (X72's
    operator) — totals must reconcile exactly with the per-doc output."""
    from swivel_spark_prep_spark.catalog import load_table as _lt
    from swivel_spark_prep_spark.operators.dedup import duplicate_ngram_spans
    from swivel_spark_prep_spark.queries.extra import EXTRA_QUERIES

    docs = _lt(spark, str(sf_dir), "documents")
    per_doc = duplicate_ngram_spans(docs, n=10)
    want_cov = per_doc.agg(F.sum("covered_tokens")).first()[0]
    got = EXTRA_QUERIES["X153_dup_span_burden"](spark, str(sf_dir)).collect()
    assert sum(r.covered_tokens for r in got) == want_cov
    assert all(0.0 <= r.dup_frac <= 1.0 for r in got)


# --- streaming running quantiles ------------------------------------------------


def test_stream_running_quantiles_matches_batch_sketch(spark, tmp_path):
    """Per-batch cumulative snapshots must equal the batch DDSketch of
    ALL rows seen so far (merge is lossless over the sketch algebra),
    and state stays bucket-grid-sized."""
    import glob
    import shutil

    from swivel_spark_prep_spark.operators.profile import (
        ddsketch_build,
        ddsketch_quantiles,
    )
    from swivel_spark_prep_spark.streaming import stream_running_quantiles

    stage = tmp_path / "stage"
    drops = tmp_path / "drops"
    drops.mkdir()
    full = spark.range(0, 3000).select(
        (F.col("id") % 700).cast("double").alias("v"), F.col("id")
    )
    parts = [full.filter(F.col("id") % 3 == i).select("v") for i in range(3)]
    for i, part in enumerate(parts):
        part.coalesce(1).write.parquet(str(stage / f"b{i}"))
        f = glob.glob(str(stage / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(drops / f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drops))
    )
    q = stream_running_quantiles(
        stream,
        "v",
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        qs=(0.5, 0.9, 0.99),
        alpha=0.05,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    last = max(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(str(tmp_path / "out" / "batch_id=*"))
    )
    got = {
        (r.g, round(r.q, 4)): r.est
        for r in spark.read.parquet(
            str(tmp_path / "out" / f"batch_id={last}")
        ).collect()
    }
    want = {
        (r.g, round(r.q, 4)): r.est
        for r in ddsketch_quantiles(
            ddsketch_build(full.select("v"), "v", alpha=0.05),
            [0.5, 0.9, 0.99],
            alpha=0.05,
        ).collect()
    }
    assert got == want
    # bounded state: the cumulative sketch is a bucket grid, not values
    rows = spark.read.parquet(
        str(tmp_path / "state" / "sketch" / f"batch_id={last}")
    ).count()
    assert rows < 200


# --- CLI quantiles ---------------------------------------------------------------


def test_cli_quantiles(spark, sf_dir, capsys):
    """quantiles prints per-group rows plus the '__total__' merge row;
    the total median must be within alpha of the exact percentile."""
    import numpy as np  # noqa: F811

    from swivel_spark_prep_spark import cli
    from swivel_spark_prep_spark.catalog import load_table

    src = str(sf_dir) + "/documents.parquet"
    assert (
        cli.main(
            [
                "quantiles",
                "--input", src,
                "--column", "n_chars",
                "--by", "source",
                "--q", "0.5,0.99",
                "--alpha", "0.05",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if "\t" in ln]
    assert any(ln.startswith("__total__") for ln in lines)
    med = next(
        float(ln.split("\t")[2])
        for ln in lines
        if ln.startswith("__total__") and "\tq0.5\t" in ln
    )
    vals = np.array(
        [
            r.n_chars
            for r in load_table(spark, str(sf_dir), "documents")
            .select("n_chars")
            .collect()
        ],
        dtype=float,
    )
    exact = np.sort(vals)[int(np.floor(0.5 * (len(vals) - 1)))]
    assert abs(med - exact) <= 0.05 * exact + 1e-9


# --- sorted-merge as-of join ------------------------------------------------------


def test_asof_join_sorted_semantics(spark):
    """Inclusive match at equal ts, LEFT semantics on no-match, and the
    deterministic largest-value tie-break on tied right timestamps."""
    from swivel_spark_prep_spark.operators.asof import asof_join_sorted

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 5, 101), (2, 7, 102), (3, 1, 103)],
        "k long, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 4, 5), (2, 7, 8), (2, 7, 9)],
        "k long, ts long, rid long",
    )
    got = {
        r.lid: r.rid_asof
        for r in asof_join_sorted(
            left, right, ["k"], "ts", "ts", "rid"
        ).collect()
    }
    # lid 100: right at ts=10 matches INCLUSIVELY -> 7
    # lid 101: only ts=4 is earlier -> 5
    # lid 102: two right rows tied at ts=7 -> deterministic max rid = 9
    # lid 103: nothing earlier -> NULL
    assert got == {100: 7, 101: 5, 102: 9, 103: None}
    fwd = {
        r.lid: r.rid_asof
        for r in asof_join_sorted(
            left, right, ["k"], "ts", "ts", "rid", direction="forward"
        ).collect()
    }
    # lid 101 (ts=5): earliest later right is ts=10 -> 7; lid 103: none later in k=3
    assert fwd[101] == 7 and fwd[103] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join_sorted(left, right, ["k"], "ts", "ts", "rid", direction="both")


# --- streaming running distinct (HLL) --------------------------------------------


def test_stream_running_distinct_converges_to_batch(spark, tmp_path):
    """Cumulative per-group estimates after the last batch must equal
    the one-shot batch HLL estimate over all rows (sketch-union algebra
    is associative), and at this cardinality the estimate is exact."""
    import glob
    import shutil

    from swivel_spark_prep_spark.streaming import stream_running_distinct

    stage = tmp_path / "stage"
    drops = tmp_path / "drops"
    drops.mkdir()
    full = spark.range(0, 3000).select(
        (F.col("id") % 2 == 0).cast("string").alias("g"),
        # group 'true': 500 distinct values; 'false': 300 (overlapping
        # across batches, so naive per-batch-count summation would be
        # wrong and only the union algebra gives the right answer)
        F.when(F.col("id") % 2 == 0, F.col("id") % 500)
        .otherwise(F.col("id") % 300)
        .alias("v"),
        F.col("id"),
    )
    parts = [full.filter(F.col("id") % 3 == i).select("g", "v") for i in range(3)]
    for i, part in enumerate(parts):
        part.coalesce(1).write.parquet(str(stage / f"b{i}"))
        f = glob.glob(str(stage / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(drops / f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drops))
    )
    q = stream_running_distinct(
        stream,
        "v",
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        group_col="g",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    last = max(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(str(tmp_path / "out" / "batch_id=*"))
    )
    got = {
        r.g: r.n_approx
        for r in spark.read.parquet(
            str(tmp_path / "out" / f"batch_id={last}")
        ).collect()
    }
    want = {
        r.g: r.n
        for r in full.groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    assert got == want  # HLL at lg_k=12 is exact at this cardinality
    # state = ONE sketch row per group per batch
    rows = spark.read.parquet(
        str(tmp_path / "state" / "hll" / f"batch_id={last}")
    ).count()
    assert rows == 2


# --- priority sampling / FD audit / Benford ---------------------------------------


def test_priority_sample_estimator_reconciles(spark, docs):
    """The total-sum estimate from the sample must land near the true
    total (unbiased over the hash draw; the fixed-hash realization
    should still be within a loose envelope), every estimator weight
    >= its raw weight, and k bounds the sample size."""
    from swivel_spark_prep_spark.operators.sampling import priority_sample

    k = 64
    out = priority_sample(docs, "n_chars", k).collect()
    assert len(out) == k
    assert all(r.est >= r.weight - 1e-9 for r in out)
    est_total = sum(r.est for r in out)
    true_total = docs.agg(F.sum("n_chars")).first()[0]
    assert abs(est_total - true_total) / true_total < 0.5
    # k >= population -> exact passthrough (est == weight, all rows)
    small = docs.limit(10)
    allrows = priority_sample(small, "n_chars", 100).collect()
    assert len(allrows) == 10
    assert all(r.est == r.weight for r in allrows)


def test_fd_violations_detects_and_respects_clean_fd(spark):
    from swivel_spark_prep_spark.operators.quality import fd_violations

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (2, "c"), (3, None), (3, "x")],
        "k long, v string",
    )
    got = {r.k: r for r in fd_violations(df, ["k"], "v").collect()}
    assert set(got) == {1, 3}  # k=2 is consistent; NULL vs 'x' IS a violation
    assert got[1].n_distinct_rhs == 2
    clean = spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string")
    assert fd_violations(clean, ["k"], "v").count() == 0


def test_benford_on_benford_distributed_data(spark):
    """A column sampled from an actual Benford distribution (powers
    spread uniformly in log space) must score a SMALL chi2; digits
    cover 1..9 and observed shares track log10(1+1/d)."""
    import math

    from swivel_spark_prep_spark.operators.quality import benford_deviation

    # x = 10^u for u uniform on [0,3) is exactly Benford-distributed
    df = spark.range(0, 9000).select(
        F.pow(F.lit(10.0), (F.col("id") % 3000) / 1000.0).alias("x")
    )
    rows = benford_deviation(df, "x").collect()
    digits = {r.digit: r for r in rows if r.kind == "digit"}
    assert set(digits) == set(range(1, 10))
    for d in range(1, 10):
        assert abs(digits[d].obs_p - math.log10(1 + 1 / d)) < 0.01
    chi = next(r for r in rows if r.kind == "__chi2__")
    assert chi.chi2 < 20  # uniform data scores in the thousands


# --- KS test ----------------------------------------------------------------------


def test_ks_test_identical_and_disjoint(spark):
    from swivel_spark_prep_spark.operators.quality import ks_test

    same = spark.createDataFrame(
        [("a", float(i % 10)) for i in range(100)]
        + [("b", float(i % 10)) for i in range(100)],
        "g string, v double",
    )
    r = ks_test(same, "v", "g", "a", "b").first()
    assert r.n_a == 100 and r.n_b == 100
    assert abs(r.d_stat) < 1e-12  # identical distributions -> D = 0
    disjoint = spark.createDataFrame(
        [("a", float(i)) for i in range(50)]
        + [("b", float(i + 1000)) for i in range(50)],
        "g string, v double",
    )
    r2 = ks_test(disjoint, "v", "g", "a", "b").first()
    assert abs(r2.d_stat - 1.0) < 1e-12  # fully separated -> D = 1
    assert abs(r2.ks_stat - (50 * 50 / 100) ** 0.5) < 1e-9
