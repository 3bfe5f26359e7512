"""Round-13 continuation operators (X292-X310): property tests beyond
the DuckDB-oracle parity that tests/test_llm_operators.py already runs
at both SFs — each op gets the behavioral pins its SURVEY row names."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.evalmetrics import (
    bowker_test,
    friedman_test,
    g_test,
    hosmer_lemeshow,
    krippendorff_alpha,
    mantel_haenszel,
    ratio_metric_ci,
    welch_ttest,
    yuen_trimmed_t,
)
from swivel_spark_prep_spark.operators.linear import (
    breusch_pagan,
    chow_test,
    cooks_distance_topk,
    durbin_watson,
)
from swivel_spark_prep_spark.operators.quality import (
    empirical_bernstein_bounds,
    holm_adjust,
    inequality_indices,
)
from swivel_spark_prep_spark.operators.timeseries import (
    ad_uniform_time_of_day,
    gumbel_block_maxima,
    page_hinkley,
)

BASE = datetime.datetime(2024, 1, 1)


def _ts(day: int, sec_of_day: float) -> datetime.datetime:
    return BASE + datetime.timedelta(days=day, seconds=sec_of_day)


# ------------------------------------------------- ad_uniform_time_of_day
def test_ad_uniform_accepts_uniform_rejects_gap(spark):
    # near-uniform: a low-discrepancy grid over the day; gapped: all
    # events inside a 2-hour window. AD alpha=.05 critical value 2.492.
    n = 500
    rows = [("u", _ts(0, 86400.0 * ((i * 0.6180339887) % 1.0))) for i in range(n)]
    rows += [("g", _ts(0, 3600.0 * (10 + 2 * ((i * 0.7) % 1.0)))) for i in range(n)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {r["g"]: r["a2_stat"] for r in ad_uniform_time_of_day(df, "ts", "g").collect()}
    assert out["u"] < 2.492
    assert out["g"] > 100.0


# ------------------------------------------------------- mantel_haenszel
def test_mantel_haenszel_recovers_common_or_and_null(spark):
    # two strata with identical within-stratum OR = (30*40)/(10*20) = 6
    # but very different exposure mixes; OR_MH must be exactly 6.
    rows = []
    for s, scale in (("s1", 1), ("s2", 3)):
        rows += [(s, True, True)] * (30 * scale)
        rows += [(s, True, False)] * (10 * scale)
        rows += [(s, False, True)] * (20 * scale)
        rows += [(s, False, False)] * (40 * scale)
    df = spark.createDataFrame(rows, "s string, e boolean, o boolean")
    out = mantel_haenszel(df, "s", "e", "o").collect()
    assert all(abs(r["or_mh"] - 6.0) < 1e-6 for r in out)
    assert all(abs(r["or_stratum"] - 6.0) < 1e-6 for r in out)
    # null table: exposure independent of outcome -> OR_MH = 1
    null_rows = [("s1", e, o) for e in (True, False) for o in (True, False)] * 25
    ndf = spark.createDataFrame(null_rows, "s string, e boolean, o boolean")
    nout = mantel_haenszel(ndf, "s", "e", "o").collect()
    assert abs(nout[0]["or_mh"] - 1.0) < 1e-9
    # CI covers the point estimate
    r = out[0]
    assert r["or_lo95"] < 6.0 < r["or_hi95"]


# --------------------------------------------------------- friedman_test
def test_friedman_planted_preference_and_w(spark):
    # 30 blocks, 3 treatments, treatment 'c' always largest, 'a' always
    # smallest: every block ranks identically -> W = 1 and
    # chi2 = n*(k-1)*W = 30*2 = 60.
    rows = []
    for b in range(30):
        rows += [(b, "a", 1.0 + b), (b, "b", 2.0 + b), (b, "c", 3.0 + b)]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    out = {r["treatment"]: r for r in friedman_test(df, "b", "t", "v").collect()}
    assert abs(out["a"]["kendall_w"] - 1.0) < 1e-9
    assert abs(out["a"]["chi2_f"] - 60.0) < 1e-9
    assert out["a"]["mean_rank"] == 1.0 and out["c"]["mean_rank"] == 3.0


def test_friedman_drops_incomplete_blocks(spark):
    rows = [(0, "a", 1.0), (0, "b", 2.0), (1, "a", 1.0)]  # block 1 incomplete
    df = spark.createDataFrame(rows, "b long, t string, v double")
    out = friedman_test(df, "b", "t", "v").collect()
    assert all(r["n_blocks"] == 1 for r in out)


# ------------------------------------------------------- ratio_metric_ci
def test_ratio_metric_ci_zero_variance_and_point(spark):
    # every unit has identical (sum, count) -> delta-method variance 0
    rows = [(u, 10.0) for u in range(50) for _ in range(4)]
    df = spark.createDataFrame(rows, "u long, v double")
    r = ratio_metric_ci(df, "u", "v").collect()[0]
    assert abs(r["ratio"] - 10.0) < 1e-9
    assert r["se"] == 0.0 and r["lo95"] == r["hi95"] == 10.0


# ---------------------------------------------------------------- g_test
def test_g_test_independence_zero_association_positive(spark):
    ind = [(a, b) for a in "xy" for b in "pq"] * 25
    df = spark.createDataFrame(ind, "a string, b string")
    r = g_test(df, "a", "b").collect()[0]
    assert abs(r["g_stat"]) < 1e-9 and r["df"] == 1
    dep = [("x", "p")] * 50 + [("y", "q")] * 50
    r2 = g_test(spark.createDataFrame(dep, "a string, b string"), "a", "b").collect()[0]
    assert r2["g_stat"] > 50.0
    assert abs(r2["mi_nats"] - math.log(2)) < 1e-6  # perfect 1-bit association


# ---------------------------------------------------- inequality_indices
def test_inequality_zero_for_equal_and_positive_for_skew(spark):
    eq = spark.createDataFrame([("g", 5.0)] * 100, "g string, x double")
    r = inequality_indices(eq, "x", "g").collect()[0]
    assert r["theil_t"] == 0.0 and r["theil_l"] == 0.0 and r["atkinson_1"] == 0.0
    sk = spark.createDataFrame(
        [("g", 1.0)] * 99 + [("g", 10000.0)], "g string, x double"
    )
    r2 = inequality_indices(sk, "x", "g").collect()[0]
    assert r2["theil_t"] > 1.0 and 0 < r2["atkinson_1"] < 1
    # non-positive values are excluded and counted
    np_ = spark.createDataFrame(
        [("g", 0.0), ("g", -3.0), ("g", 5.0), ("g", 5.0)], "g string, x double"
    )
    r3 = inequality_indices(np_, "x", "g").collect()[0]
    assert r3["n_nonpos"] == 2 and r3["n"] == 2 and r3["theil_t"] == 0.0


# ------------------------------------------------ empirical_bernstein
def test_bernstein_variance_adaptive_beats_hoeffding(spark):
    # low-variance group: values in {49, 51} over range plug-in R=2
    # Hoeffding bound at the same delta uses R*sqrt(ln(2/d)/(2n)).
    rows = [("lo", 49.0 + 2 * (i % 2)) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = empirical_bernstein_bounds(df, "x", "g", delta=0.05).collect()[0]
    hoeffding = r["range_r"] * math.sqrt(math.log(2 / 0.05) / (2 * r["n"]))
    assert r["bound"] < 3 * hoeffding  # same order; EB pays the 7R/3(n-1) tail
    # and the CLT-rate term dominates: bound shrinks ~sqrt(4x) with 4x n
    rows4 = [("lo", 49.0 + 2 * (i % 2)) for i in range(1600)]
    r4 = empirical_bernstein_bounds(
        spark.createDataFrame(rows4, "g string, x double"), "x", "g"
    ).collect()[0]
    assert r4["bound"] < r["bound"]
    # n < 2 -> NULL bound
    one = spark.createDataFrame([("g", 1.0)], "g string, x double")
    assert empirical_bernstein_bounds(one, "x", "g").collect()[0]["bound"] is None


def test_bernstein_rejects_bad_delta(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, x double")
    with pytest.raises(ValueError):
        empirical_bernstein_bounds(df, "x", "g", delta=1.5)


# ---------------------------------------------------------- page_hinkley
def test_page_hinkley_alarms_on_shift_quiet_on_stationary(spark):
    rows = [("shift", _ts(0, 60.0 * i), 10.0) for i in range(200)]
    rows += [("shift", _ts(0, 60.0 * (200 + i)), 30.0) for i in range(200)]
    rows += [("flat", _ts(0, 60.0 * i), 10.0) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, x double")
    out = {r["g"]: r for r in page_hinkley(df, "ts", "x", "g", lam=100.0).collect()}
    assert out["shift"]["n_alarms"] > 0 and out["shift"]["first_alarm_ts"] is not None
    assert out["flat"]["max_ph"] == 0.0 and out["flat"]["n_alarms"] == 0


# ----------------------------------------------------------- holm_adjust
def test_holm_vs_bonferroni_and_monotone(spark):
    ps = [0.001, 0.011, 0.02, 0.04, 0.5]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    out = {r["p"]: r for r in holm_adjust(df, "p", alpha=0.05).collect()}
    m = len(ps)
    # textbook: adjusted_i = max_j<=i (m-j+1)*p_j (capped at 1)
    expected, run = {}, 0.0
    for i, p in enumerate(sorted(ps)):
        run = max(run, min(1.0, (m - i) * p))
        expected[p] = run
    for p in ps:
        assert abs(out[p]["p_holm"] - round(expected[p], 6)) < 1e-9
        # Holm never exceeds Bonferroni
        assert out[p]["p_holm"] <= min(1.0, m * p) + 1e-9
    # monotone in p
    sorted_adj = [out[p]["p_holm"] for p in sorted(ps)]
    assert sorted_adj == sorted(sorted_adj)
    # rejection set: 0.001 yes (5*0.001=.005<.05); 0.011 yes (4*.011=.044);
    # 0.02 no (3*0.02=.06)
    assert out[0.001]["rejected"] and out[0.011]["rejected"]
    assert not out[0.02]["rejected"] and not out[0.5]["rejected"]


def test_holm_null_p_passes_through(spark):
    df = spark.createDataFrame([(0.01,), (None,)], "p double")
    out = holm_adjust(df, "p", alpha=0.05).collect()
    nul = [r for r in out if r["p"] is None][0]
    assert nul["p_holm"] is None and not nul["rejected"]
    assert all(r["m_tests"] == 1 for r in out)


# ------------------------------------------------------ hosmer_lemeshow
def test_hosmer_lemeshow_exact_calibration_is_zero(spark):
    # in every bin, observed positives == expected exactly:
    # p constant per bin block, y true for exactly p fraction
    rows, rid = [], 0
    for b in range(10):
        p = (b + 0.5) / 10
        for i in range(20):
            rows.append((p, i < round(20 * p), rid))
            rid += 1
    df = spark.createDataFrame(rows, "p double, y boolean, id long")
    out = hosmer_lemeshow(df, "p", "y", "id", bins=10).collect()
    assert len(out) == 10
    assert all(abs(r["hl_stat"]) < 1e-6 for r in out)
    assert all(r["df"] == 8 for r in out)


def test_hosmer_lemeshow_miscalibrated_rejects(spark):
    # model says 0.9 everywhere but only half are positive
    rows = [(0.9 if i % 2 else 0.8, i % 4 == 0, i) for i in range(200)]
    df = spark.createDataFrame(rows, "p double, y boolean, id long")
    out = hosmer_lemeshow(df, "p", "y", "id", bins=10).collect()
    assert out[0]["hl_stat"] > 15.507  # chi2(8) alpha=.05


# --------------------------------------------------------- breusch_pagan
def test_breusch_pagan_heteroscedastic_vs_homoscedastic(spark):
    # residual magnitude grows with x in group 'h'; constant in 'c'
    rows = []
    for i in range(500):
        x = (i % 100) / 10.0
        noise = (1 if i % 2 else -1) * (0.1 + x)
        rows.append(("h", x, 2.0 + 3.0 * x + noise))
        rows.append(("c", x, 2.0 + 3.0 * x + (1 if i % 2 else -1)))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in breusch_pagan(df, "x", "y", "g").collect()}
    assert out["h"]["lm_stat"] > 3.841
    assert out["c"]["lm_stat"] < 3.841
    assert abs(out["c"]["slope"] - 3.0) < 0.05


# --------------------------------------------------------- durbin_watson
def test_durbin_watson_alternating_4_trending_0(spark):
    rows = []
    for i in range(400):
        x = (i % 7) / 7.0  # no real trend in x
        rows.append(("alt", _ts(0, 60.0 * i), i, x, (1.0 if i % 2 else -1.0)))
        rows.append(("trend", _ts(0, 60.0 * i), i, x, float(i)))
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long, x double, y double")
    out = {r["g"]: r for r in durbin_watson(df, "x", "y", "ts", "g", "id").collect()}
    assert out["alt"]["dw_stat"] > 3.5
    assert out["trend"]["dw_stat"] < 0.5


# --------------------------------------------------- cooks_distance_topk
def test_cooks_distance_planted_outlier_dominates(spark):
    rows = [("g", float(i), float(i), 2.0 * i + (1 if i % 2 else -1)) for i in range(100)]
    rows.append(("g", 100.0, 100.0, 500.0))  # high-leverage, huge residual
    df = spark.createDataFrame(rows, "g string, id double, x double, y double")
    out = cooks_distance_topk(df, "x", "y", "id", "g", k=3).collect()
    assert len(out) == 3
    top = max(out, key=lambda r: r["cooks_d"])
    assert top["id"] == 100.0
    assert top["cooks_d"] > 10 * min(r["cooks_d"] for r in out)


# ------------------------------------------------------------- chow_test
def test_chow_detects_slope_flip(spark):
    rows = []
    for i in range(200):
        x = (i % 24) / 2.0
        # first half slope +2, second half slope -2 (tiny noise keeps
        # the within-regime SSRs nonzero — perfect fits report NULL F)
        eps = 0.01 if i % 2 else -0.01
        rows.append(("flip", _ts(0, 60.0 * i), x, 2.0 * x + eps))
        rows.append(("flip", _ts(0, 60.0 * (200 + i)), x, -2.0 * x + eps))
        rows.append(("stable", _ts(0, 60.0 * i), x, 2.0 * x + (0.01 if i % 2 else -0.01)))
        rows.append(("stable", _ts(0, 60.0 * (200 + i)), x, 2.0 * x + (0.01 if i % 2 else -0.01)))
    df = spark.createDataFrame(rows, "g string, ts timestamp, x double, y double")
    out = {r["g"]: r for r in chow_test(df, "x", "y", "ts", "g").collect()}
    assert out["flip"]["f_stat"] > 100.0
    assert out["stable"]["f_stat"] < 5.0
    assert out["flip"]["n_1"] + out["flip"]["n_2"] == out["flip"]["n"]


# ----------------------------------------------------------- bowker_test
def test_bowker_directional_vs_symmetric(spark):
    sym = [("a", "b")] * 20 + [("b", "a")] * 20 + [("a", "c")] * 5 + [("c", "a")] * 5
    r = bowker_test(spark.createDataFrame(sym, "f string, l string"), "f", "l").collect()
    assert all(x["bowker_stat"] == 0.0 for x in r)
    dire = [("a", "b")] * 40 + [("b", "a")] * 2
    r2 = bowker_test(spark.createDataFrame(dire, "f string, l string"), "f", "l").collect()[0]
    assert r2["bowker_stat"] > 30.0 and r2["df"] == 1
    assert r2["n_fwd"] == 40 and r2["n_rev"] == 2


# ---------------------------------------------------- krippendorff_alpha
def test_krippendorff_perfect_agreement_is_one(spark):
    rows = [(i, "yes") for i in range(50) for _ in range(3)]
    rows += [(i, "no") for i in range(50, 100) for _ in range(3)]
    df = spark.createDataFrame(rows, "item long, c string")
    r = krippendorff_alpha(df, "item", "c").collect()[0]
    assert abs(r["alpha"] - 1.0) < 1e-9 and r["d_o"] == 0.0


def test_krippendorff_hand_example_with_varying_raters(spark):
    # 2 items: item 0 rated (a,a,b) m=3; item 1 rated (a,b) m=2.
    # D_o = (1/5)*[ (9-5)/2 + (4-2)/1 ] = (1/5)*(2+2) = 0.8
    # n_a=3, n_b=2 -> D_e = (25-13)/(5*4) = 0.6 -> alpha = 1-0.8/0.6 = -1/3
    rows = [(0, "a"), (0, "a"), (0, "b"), (1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, "item long, c string")
    r = krippendorff_alpha(df, "item", "c").collect()[0]
    assert r["n_items"] == 2 and r["n_ratings"] == 5
    assert abs(r["alpha"] - round(1 - 0.8 / 0.6, 6)) < 1e-9
    # single-rating items are excluded as unpairable
    df2 = spark.createDataFrame(rows + [(2, "a")], "item long, c string")
    r2 = krippendorff_alpha(df2, "item", "c").collect()[0]
    assert r2["n_items"] == 2 and r2["n_ratings"] == 5


# -------------------------------------------------------- yuen_trimmed_t
def test_yuen_trim_zero_equals_welch(spark):
    rows = [("a", float(10 + (i * 7) % 13), i) for i in range(60)]
    rows += [("b", float(12 + (i * 5) % 11), 1000 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, x double, id long")
    y = yuen_trimmed_t(df, "x", "g", "a", "b", "id", trim=0.0).collect()[0]
    w = welch_ttest(df, "x", "g", "a", "b").collect()[0]
    assert abs(y["t_stat"] - w["t_stat"]) < 1e-6
    assert y["h_a"] == y["n_a"] and y["h_b"] == y["n_b"]


def test_yuen_outlier_immunity(spark):
    base = [("a", 10.0 + (i % 5), i) for i in range(50)]
    base += [("b", 11.0 + (i % 5), 1000 + i) for i in range(50)]
    poisoned = base + [("a", 1e6, 9999)]
    clean = yuen_trimmed_t(
        spark.createDataFrame(base, "g string, x double, id long"),
        "x", "g", "a", "b", "id", trim=0.2,
    ).collect()[0]
    dirty = yuen_trimmed_t(
        spark.createDataFrame(poisoned, "g string, x double, id long"),
        "x", "g", "a", "b", "id", trim=0.2,
    ).collect()[0]
    # trimmed mean of the poisoned arm moves by < 0.2 despite the 1e6 point
    assert abs(dirty["tmean_a"] - clean["tmean_a"]) < 0.2
    with pytest.raises(ValueError):
        yuen_trimmed_t(
            spark.createDataFrame(base, "g string, x double, id long"),
            "x", "g", "a", "b", "id", trim=0.5,
        )


# --------------------------------------------------- gumbel_block_maxima
def test_gumbel_recovers_planted_parameters(spark):
    # deterministic Gumbel sample via inverse CDF on a low-discrepancy
    # grid: x = mu - beta*ln(-ln(u)), mu=100, beta=5; one block per day
    mu, beta = 100.0, 5.0
    rows = []
    for i in range(730):
        u = (i + 0.5) / 730
        x = mu - beta * math.log(-math.log(u))
        rows.append(("g", _ts(i, 10.0), x))
        rows.append(("g", _ts(i, 20.0), x - 1.0))  # non-max row same day
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = gumbel_block_maxima(df, "ts", "v", "g", return_period=100).collect()[0]
    assert r["n_blocks"] == 730
    assert abs(r["mu"] - mu) < 1.0
    assert abs(r["beta"] - beta) < 0.5
    # 100-block return level exceeds the location by ~ beta*ln(99.5)
    assert r["ret_level"] > r["mu"] + 3 * r["beta"]
    with pytest.raises(ValueError):
        gumbel_block_maxima(df, "ts", "v", "g", return_period=1)


# ------------------------------------------------------ margin_neighbors
def test_margin_neighbors_matches_numpy_replay(spark):
    import numpy as np

    rng = [(i, [math.sin(i * k + 0.1 * k * k) for k in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    from swivel_spark_prep_spark.operators.similarity import margin_neighbors

    got = {r["x"]: (r["y"], r["margin"]) for r in margin_neighbors(df, k=4).collect()}
    vecs = {i: np.array(v) for i, v in rng}
    a_ids = [i for i in vecs if i % 2 == 0]
    b_ids = [i for i in vecs if i % 2 == 1]
    sims = {
        (a, b): float(
            vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
        )
        for a in a_ids
        for b in b_ids
    }
    ak = {
        a: np.mean(sorted((sims[(a, b)] for b in b_ids), reverse=True)[:4])
        for a in a_ids
    }
    bk = {
        b: np.mean(sorted((sims[(a, b)] for a in a_ids), reverse=True)[:4])
        for b in b_ids
    }
    for a in a_ids:
        margins = {b: sims[(a, b)] / ((ak[a] + bk[b]) / 2) for b in b_ids}
        best = max(sorted(margins), key=lambda b: (margins[b], -b))
        got_y, got_m = got[a]
        assert got_y == best
        assert abs(got_m - round(margins[best], 4)) < 2e-4


# --------------------------------------------------- survival-report CLI
def test_cli_survival_report(spark, tmp_path, capsys):
    import json

    from swivel_spark_prep_spark import cli

    rows = [("a", 2.0, 1), ("a", 6.0, 1), ("a", 10.0, 0), ("a", 10.0, 0),
            ("b", 1.0, 1), ("b", 2.0, 1), ("b", 3.0, 1), ("b", 10.0, 0)]
    src = str(tmp_path / "cohort")
    spark.createDataFrame(rows, "g string, duration double, event int").write.parquet(src)
    out = str(tmp_path / "km")
    rc = cli.main(["survival-report", "--input", src, "--by", "g",
                   "--tau", "10.0", "--output", out])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_event_times"] == 4  # pooled event times 1,2,3,6
    assert rep["rmst"]["tau"] == 10.0
    assert 0 < rep["rmst"]["rmst"] < 10.0
    ks = {r["g"]: r for r in rep["logrank_k"]}
    assert ks["b"]["observed"] == 3 and ks["a"]["observed"] == 2
    assert rep["logrank_k"][0]["df"] == 1
    assert spark.read.parquet(out).count() == 4


def test_cli_survival_report_no_usable_rows(spark, tmp_path, capsys):
    """All-null durations (or an empty cohort) must exit 2 with a clear
    message, not crash in float(None) or rmst(tau<=0) — round-13
    ADVICE item (cli.py survival-report guard)."""
    from swivel_spark_prep_spark import cli

    src = str(tmp_path / "empty_cohort")
    spark.createDataFrame(
        [(None, 1), (None, 0)], "duration double, event int"
    ).write.parquet(src)
    rc = cli.main(["survival-report", "--input", src,
                   "--duration", "duration", "--event", "event"])
    assert rc == 2
    assert "no usable rows" in capsys.readouterr().err


# -------------------------------------------------------- session_stats
def test_session_stats_hand_counts(spark):
    import datetime

    from swivel_spark_prep_spark.operators.timeseries import session_stats

    b = datetime.datetime(2024, 5, 1)

    def at(minute):
        return b + datetime.timedelta(minutes=minute)

    # user 1: two sessions (gap 45 > 30): [0,10,20] and [65]
    # user 2: one bounce session: [0]
    rows = [(1, at(0), 1), (1, at(10), 2), (1, at(20), 3), (1, at(65), 4),
            (2, at(0), 5)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long")
    r = session_stats(df, "u", "ts", gap_minutes=30.0, tiebreak_col="id").collect()[0]
    assert r["n_keys"] == 2 and r["n_sessions"] == 3 and r["n_events"] == 5
    assert abs(r["bounce_rate"] - 2 / 3) < 1e-6
    assert r["p50_events"] == 1.0  # session sizes 3,1,1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        session_stats(df, "u", "ts", gap_minutes=0)


# ------------------------------------------------------ script_mix_audit
def test_script_mix_flags_homoglyph_salting(spark):
    from swivel_spark_prep_spark.operators.textstats import script_mix_audit

    rows = [
        ("clean", "plain english text only"),
        ("clean", "another ascii document"),
        # Latin salted with Cyrillic а (U+0430) and Greek ο (U+03BF)
        ("spoofy", "pаypal lοgin verify account"),
        ("spoofy", "中文 mixed with english"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in script_mix_audit(df).collect()}
    assert out["clean"]["mixed_docs"] == 0 and out["clean"]["mixed_share"] == 0.0
    assert out["spoofy"]["mixed_docs"] == 2 and out["spoofy"]["mixed_share"] == 1.0
    assert out["spoofy"]["cyrillic_docs"] == 1 and out["spoofy"]["cjk_docs"] == 1
