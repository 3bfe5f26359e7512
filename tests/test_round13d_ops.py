"""Round-13 continuation operators (X319-X323): property tests beyond
the DuckDB-oracle parity in tests/test_llm_operators.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.evalmetrics import (
    brunner_munzel,
    did_estimate,
    quantile_order_ci,
)
from swivel_spark_prep_spark.operators.sampling import target_encode_oof
from swivel_spark_prep_spark.operators.timeseries import logrank_k


# ---------------------------------------------------------- did_estimate
def test_did_recovers_planted_effect(spark):
    # both arms trend +2 between periods; arm 'a' gets an extra +5.
    # every unit: 3 pre rows, 3 post rows
    rows = []
    for u in range(40):
        arm = "a" if u % 2 == 0 else "b"
        base = 10.0 + (u % 7)
        lift = 5.0 if arm == "a" else 0.0
        for i in range(3):
            rows.append((u, arm, False, base + i * 0.1))
            rows.append((u, arm, True, base + 2.0 + lift + i * 0.1))
    df = spark.createDataFrame(rows, "u long, arm string, post boolean, x double")
    r = did_estimate(df, "u", "arm", "post", "x", "a", "b").collect()[0]
    assert abs(r["did"] - 5.0) < 1e-9
    assert abs(r["delta_a"] - 7.0) < 1e-9 and abs(r["delta_b"] - 2.0) < 1e-9
    assert r["n_dropped"] == 0 and r["se"] == 0.0


def test_did_drops_single_period_units(spark):
    rows = [(1, "a", False, 1.0), (1, "a", True, 2.0),
            (2, "a", True, 9.0),  # post only -> dropped
            (3, "b", False, 1.0), (3, "b", True, 1.5),
            (4, "b", False, 1.0), (4, "b", True, 1.5)]
    df = spark.createDataFrame(rows, "u long, arm string, post boolean, x double")
    r = did_estimate(df, "u", "arm", "post", "x", "a", "b").collect()[0]
    assert r["n_a"] == 1 and r["n_b"] == 2 and r["n_dropped"] == 1


# -------------------------------------------------------------- logrank_k
def test_logrank_k_identical_vs_doomed(spark):
    same = []
    for g in ("g1", "g2", "g3"):
        same += [(g, float(t), 1) for t in (2, 4, 6, 8)]
        same += [(g, 10.0, 0)] * 4
    out = logrank_k(
        spark.createDataFrame(same, "g string, t double, ev int"), "t", "ev", "g"
    ).collect()
    assert all(abs(r["oe_ratio"] - 1.0) < 1e-9 for r in out)
    assert out[0]["chi2"] == 0.0 and out[0]["df"] == 2
    doomed = [("live", 10.0, 0)] * 20 + [("dead", float(t % 5 + 1), 1) for t in range(20)]
    out2 = {r["g"]: r for r in logrank_k(
        spark.createDataFrame(doomed, "g string, t double, ev int"), "t", "ev", "g"
    ).collect()}
    assert out2["dead"]["chi2"] > 10.0
    assert out2["dead"]["oe_ratio"] > 1.0 and out2["live"]["observed"] == 0


# --------------------------------------------------------- brunner_munzel
def test_brunner_munzel_null_and_dominant(spark):
    rows = [("a", float(i % 20), i) for i in range(200)]
    rows += [("b", float(i % 20), 1000 + i) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, x double, id long")
    r = brunner_munzel(df, "x", "g", "a", "b").collect()[0]
    assert abs(r["p_hat"] - 0.5) < 1e-9 and abs(r["bm_stat"]) < 1e-6
    shift = [("a", float(i % 20), i) for i in range(200)]
    shift += [("b", float(i % 20) + 30.0, 1000 + i) for i in range(200)]
    r2 = brunner_munzel(
        spark.createDataFrame(shift, "g string, x double, id long"),
        "x", "g", "a", "b",
    ).collect()[0]
    assert r2["p_hat"] == 1.0  # complete separation: P(a < b) = 1
    assert r2["bm_stat"] is None or r2["bm_stat"] > 10  # zero variance -> NULL


# ------------------------------------------------------ quantile_order_ci
def test_quantile_ci_hand_ranks_on_permutation(spark):
    # x = 1..100: n=100, p=.5 -> r = floor(50 - 1.959964*5) = 40,
    # s = ceil(50 + 9.79982) + 1 = 61, q = x_(50) = 50
    rows = [("g", float(1 + (i * 37) % 100)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = quantile_order_ci(df, "x", "g", p=0.5).collect()[0]
    assert (r["lo_rank"], r["hi_rank"]) == (40, 61)
    assert (r["lo"], r["q"], r["hi"]) == (40.0, 50.0, 61.0)
    assert r["lo"] <= r["q"] <= r["hi"]
    with pytest.raises(ValueError):
        quantile_order_ci(df, "x", "g", p=1.5)


def test_quantile_ci_handles_heavy_ties(spark):
    df = spark.createDataFrame([("g", 5.0)] * 50, "g string, x double")
    r = quantile_order_ci(df, "x", "g", p=0.5).collect()[0]
    assert r["lo"] == r["q"] == r["hi"] == 5.0


# ----------------------------------------------------- target_encode_oof
def test_target_encode_oof_is_leak_free(spark):
    rows = [(i, "c%d" % (i % 3), float(i)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    enc = target_encode_oof(df, "cat", "y", "id", n_folds=4, salt="t").collect()
    import collections

    sums = collections.defaultdict(float)
    cnts = collections.defaultdict(int)
    for r in enc:
        sums[(r["cat"], r["fold"])] += r["y"]
        cnts[(r["cat"], r["fold"])] += 1
    cat_sum = collections.defaultdict(float)
    cat_cnt = collections.defaultdict(int)
    for (c, f), s in sums.items():
        cat_sum[c] += s
        cat_cnt[c] += cnts[(c, f)]
    for r in enc:
        c, f = r["cat"], r["fold"]
        oof_n = cat_cnt[c] - cnts[(c, f)]
        expected = (cat_sum[c] - sums[(c, f)]) / oof_n
        assert abs(r["target_enc"] - expected) < 1e-9
        # leak-free: own row's y removed along with its whole fold
        assert oof_n < cat_cnt[c]


def test_target_encode_fallbacks(spark):
    # category 'solo' appears once: its single fold excludes everything
    # -> global mean; unlabeled rows still get their cell's encoding
    rows = [(1, "big", 10.0), (2, "big", 20.0), (3, "big", 30.0),
            (4, "solo", 99.0), (5, "big", None)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = {r["id"]: r for r in
           target_encode_oof(df, "cat", "y", "id", n_folds=2, salt="t").collect()}
    gm = (10.0 + 20.0 + 30.0 + 99.0) / 4
    assert abs(out[4]["target_enc"] - gm) < 1e-9
    assert out[5]["target_enc"] is not None  # null-target row still encoded
    with pytest.raises(ValueError):
        target_encode_oof(df, "cat", "y", "id", n_folds=1)


# ------------------------------------------------- negative_binomial_fit
def test_nb_fit_formulas_and_poisson_null(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        negative_binomial_fit,
    )

    rows = [(0.0,)] * 60 + [(1.0,)] * 20 + [(5.0,)] * 20
    df = spark.createDataFrame(rows, "c double")
    r = negative_binomial_fit(df, "c").collect()[0]
    m = 1.2
    v = (60 * m**2 + 20 * (1 - m) ** 2 + 20 * (5 - m) ** 2) / 99
    assert abs(r["mean"] - m) < 1e-6 and abs(r["var"] - round(v, 6)) < 1e-5
    assert abs(r["r"] - round(m * m / (v - m), 6)) < 1e-5
    assert r["zero_obs"] == 0.6
    # equidispersed (variance ~ mean): NB degenerates, NULL r
    pois = spark.createDataFrame([(1.0,), (1.0,), (1.0,)], "c double")
    assert negative_binomial_fit(pois, "c").collect()[0]["r"] is None


# --------------------------------------------------- post_stratified_mean
def test_post_stratified_repairs_drifted_mix(spark):
    from swivel_spark_prep_spark.operators.sampling import (
        post_stratified_mean,
    )

    pop = spark.createDataFrame(
        [("a", 0.0)] * 50 + [("b", 0.0)] * 50, "s string, y double"
    )
    # drifted sample: 90% stratum a (mean 10), 10% stratum b (mean 20)
    samp = spark.createDataFrame(
        [("a", 10.0 + (i % 3 - 1)) for i in range(90)]
        + [("b", 20.0 + (i % 2) * 2 - 1) for i in range(10)],
        "s string, y double",
    )
    r = post_stratified_mean(pop, samp, "s", "y").collect()[0]
    assert abs(r["ybar_srs"] - 11.0) < 1e-9
    assert abs(r["ybar_post"] - 15.0) < 1e-9
    assert r["n_missing_strata"] == 0 and r["missing_weight"] == 0.0
    # a population stratum absent from the sample is surfaced
    pop2 = spark.createDataFrame(
        [("a", 0.0)] * 50 + [("b", 0.0)] * 25 + [("c", 0.0)] * 25,
        "s string, y double",
    )
    r2 = post_stratified_mean(pop2, samp, "s", "y").collect()[0]
    assert r2["n_missing_strata"] == 1 and abs(r2["missing_weight"] - 0.25) < 1e-9
    # a SAMPLE stratum absent from the population is counted, not
    # silently dropped: n_sample covers all sampled rows and the
    # stratum is surfaced in n_sample_only_strata
    samp3 = spark.createDataFrame(
        [("a", 10.0 + (i % 3 - 1)) for i in range(90)]
        + [("b", 20.0 + (i % 2) * 2 - 1) for i in range(10)]
        + [("zz", 99.0), ("zz", 101.0)],
        "s string, y double",
    )
    r3 = post_stratified_mean(pop, samp3, "s", "y").collect()[0]
    assert r3["n_sample"] == 102
    assert r3["n_sample_only_strata"] == 1
    assert r3["n_strata"] == 2 and r3["n_missing_strata"] == 0
    # post-stratified mean still uses only population weights
    assert abs(r3["ybar_post"] - 15.0) < 1e-9


# --------------------------------------------------------- cronbach_alpha
def test_cronbach_perfect_vs_independent(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import cronbach_alpha

    # identical items -> alpha = 1
    rows = [(float(i % 2), float(i % 2), float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "i1 double, i2 double, i3 double")
    assert cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]["alpha"] == 1.0
    # independent items -> alpha near 0 (can be negative)
    rows2 = [
        (float(i % 2), float((i // 2) % 2), float((i // 4) % 2))
        for i in range(64)
    ]
    df2 = spark.createDataFrame(rows2, "i1 double, i2 double, i3 double")
    a = cronbach_alpha(df2, ["i1", "i2", "i3"]).collect()[0]["alpha"]
    assert abs(a) < 0.2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cronbach_alpha(df, ["i1"])


# --------------------------------------------------- mahalanobis_outliers
def test_mahalanobis_whitens_per_dimension(spark):
    from swivel_spark_prep_spark.operators.similarity import (
        mahalanobis_outliers,
    )

    # dim0 noisy (sd ~ 10), dim1 tight (sd ~ 0.1). Two planted deviants
    # of equal L2 size 15: the dim1 deviant must outrank the dim0 one.
    rows = [(i, [float((i * 37) % 21 - 10), float(((i * 13) % 21 - 10) / 100.0)])
            for i in range(100)]
    rows.append((1000, [15.0, 0.0]))   # big in the NOISY dim
    rows.append((1001, [0.0, 15.0]))   # big in the TIGHT dim
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mahalanobis_outliers(df, k=3).collect()
    assert out[0]["vec_id"] == 1001
    d2 = {r["vec_id"]: r["d2"] for r in out}
    # the tight-dim deviant dominates even though the outlier itself
    # inflates that dimension's variance (masking caps the gap at ~17x
    # here; without masking it would be ~10^4x)
    assert 1000 in d2 and d2[1001] > 10 * d2[1000]
    assert all(r["chi2_cut"] == out[0]["chi2_cut"] for r in out)


# ---------------------------------------------------------- ab-report CLI
def test_cli_ab_report(spark, tmp_path, capsys):
    import json

    from swivel_spark_prep_spark import cli

    rows = []
    for u in range(40):
        arm = "a" if u % 2 == 0 else "b"
        lift = 5.0 if arm == "a" else 0.0
        for i in range(3):
            rows.append((u, arm, 10.0 + (u % 7) + lift + i * 0.1))
    src = str(tmp_path / "ab")
    spark.createDataFrame(rows, "unit long, arm string, value double").write.parquet(src)
    rc = cli.main(["ab-report", "--input", src])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["welch"]["n_a"] == 60 and rep["welch"]["n_b"] == 60
    assert rep["welch"]["t_stat"] > 2  # planted +5 lift
    assert rep["mann_whitney"]["cliffs_delta"] > 0.5
    assert [q["p"] for q in rep["qte"]] == [0.25, 0.5, 0.75, 0.9]
    assert all(q["qte"] >= 4.0 for q in rep["qte"])
    arms = {r["arm"]: r for r in rep["ratio_by_arm"]}
    assert arms["a"]["n_units"] == 20 and arms["b"]["n_units"] == 20
    assert arms["a"]["ratio"] > arms["b"]["ratio"]


# ---------------------------------------------------------------- pacf3
def test_pacf_ar1_signature(spark):
    from swivel_spark_prep_spark.operators.timeseries import pacf3

    # AR(1)-like deterministic series: x_t = 0.8*x_{t-1} + bounded
    # pseudo-noise; PACF must be large at lag 1 and ~0 at lags 2-3.
    import random

    rng = random.Random(7)
    rows, x = [], 0.0
    for t in range(400):
        x = 0.8 * x + (rng.random() - 0.5)
        rows.append(("s", t, x))
    df = spark.createDataFrame(rows, "g string, t long, x double")
    r = pacf3(df, "g", "t", "x").collect()[0]
    assert r["pacf1"] > 0.6
    assert abs(r["pacf2"]) < r["band"] * 2
    assert abs(r["pacf3"]) < r["band"] * 2
    assert abs(r["r1"] - r["pacf1"]) < 1e-12  # phi_11 = r1 by definition


# -------------------------------------------------------- kendall_tau_daily
def test_kendall_tau_monotone_and_inverse(spark):
    import datetime

    from swivel_spark_prep_spark.operators.timeseries import kendall_tau_daily

    b = datetime.datetime(2024, 2, 1)
    rows = []
    for d in range(20):
        ts = b + datetime.timedelta(days=d)
        rows.append((ts, "p", float(d)))          # increasing
        rows.append((ts, "c", float(100 - d)))    # decreasing
    df = spark.createDataFrame(rows, "ts timestamp, s string, x double")
    r = kendall_tau_daily(df, "ts", "x", "s", "p", "c").collect()[0]
    assert r["n_days"] == 20
    assert r["tau_b"] == -1.0 and r["concordant"] == 0
    r2 = kendall_tau_daily(df, "ts", "x", "s", "p", "p").collect()[0]
    assert r2["tau_b"] == 1.0 and r2["discordant"] == 0


# -------------------------------------------------------- poisson_rate_test
def test_poisson_rate_detects_ramp(spark):
    import datetime

    from swivel_spark_prep_spark.operators.timeseries import poisson_rate_test

    b = datetime.datetime(2024, 2, 1)
    rows = []
    # 'ramp': 100 events in the first half-range, 400 in the second;
    # 'flat': uniform spacing
    for i in range(100):
        rows.append(("ramp", b + datetime.timedelta(minutes=i * 10)))
    for i in range(400):
        rows.append(("ramp", b + datetime.timedelta(minutes=1000 + i * 2.5)))
    for i in range(500):
        rows.append(("flat", b + datetime.timedelta(minutes=i * 4)))
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {r["g"]: r for r in poisson_rate_test(df, "ts", "g").collect()}
    assert out["ramp"]["z"] < -5 and out["ramp"]["rate_ratio"] < 0.5
    assert abs(out["flat"]["z"]) < 2
    assert out["flat"]["c_1"] + out["flat"]["c_2"] == 500


# -------------------------------------------------------- novelty_timeline
def test_novelty_first_bucket_is_all_new_and_recrawl_is_zero(spark):
    import datetime

    from swivel_spark_prep_spark.operators.textstats import novelty_timeline

    w0 = datetime.date(2024, 1, 1)   # a Monday
    w1 = datetime.date(2024, 1, 8)
    w2 = datetime.date(2024, 1, 15)
    rows = [
        (w0, "alpha beta gamma"),
        (w1, "alpha beta delta"),      # delta is new
        (w2, "alpha beta gamma delta"),  # pure re-crawl
    ]
    df = spark.createDataFrame(rows, "ts date, text string")
    out = {str(r["bucket"]): r for r in
           novelty_timeline(df, "ts", "text", "week").collect()}
    assert out[str(w0)]["novelty_share"] == 1.0
    assert abs(out[str(w1)]["novelty_share"] - 1 / 3) < 1e-6
    assert out[str(w2)]["novelty_share"] == 0.0 and out[str(w2)]["new_types"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        novelty_timeline(df, "ts", "text", "hour")


# ------------------------------------------------------- anisotropy_score
def test_anisotropy_cone_vs_symmetric(spark):
    from swivel_spark_prep_spark.operators.similarity import anisotropy_score

    # cone: all vectors near one direction -> anisotropy near 1
    cone = [(i, [10.0, 0.1 * (i % 5 - 2)]) for i in range(50)]
    r = anisotropy_score(
        spark.createDataFrame(cone, "vec_id long, embedding array<double>")
    ).collect()[0]
    assert r["anisotropy"] > 0.95 and r["dim"] == 2
    # symmetric: +/- pairs cancel the mean -> anisotropy 0
    sym = [(i, [1.0, 2.0]) for i in range(25)] + [
        (100 + i, [-1.0, -2.0]) for i in range(25)
    ]
    r2 = anisotropy_score(
        spark.createDataFrame(sym, "vec_id long, embedding array<double>")
    ).collect()[0]
    assert r2["anisotropy"] == 0.0
    assert r2["sd_norm"] == 0.0  # all norms equal


# ------------------------------------------------------------- burstiness
def test_burstiness_metronome_vs_bursty(spark):
    import datetime

    from swivel_spark_prep_spark.operators.timeseries import burstiness

    b = datetime.datetime(2024, 3, 1)
    rows = []
    # metronome: constant 60 s gaps -> sd 0 -> B = -1
    for i in range(60):
        rows.append(("tick", 1, b + datetime.timedelta(seconds=60 * i), i))
    # bursty with memory: mostly 1-second gaps plus one contiguous run
    # of six 2000-second gaps (heavy tail -> sigma >> mu -> B > 0;
    # the huge gaps adjoin each other -> positive lag-1 memory)
    t = 0.0
    for i in range(120):
        gap = 2000.0 if 100 <= i < 106 else 1.0
        t += gap
        rows.append(("burst", 1, b + datetime.timedelta(seconds=t), 1000 + i))
    df = spark.createDataFrame(rows, "g string, k long, ts timestamp, id long")
    out = {r["g"]: r for r in burstiness(df, "k", "ts", "g", "id").collect()}
    assert out["tick"]["b_burst"] == -1.0
    assert out["tick"]["m_memory"] is None  # zero variance -> NULL corr
    assert out["burst"]["b_burst"] > 0.5
    assert out["burst"]["m_memory"] > 0.5  # long gaps follow long gaps
    assert out["tick"]["mean_gap_s"] == 60.0


# ------------------------------------------------ variance_decomposition
def test_variance_decomposition_extremes(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        variance_decomposition,
    )

    # groups fully determine the value -> eta2 = 1, ICC -> 1
    det = [("a", 1.0)] * 30 + [("b", 5.0)] * 30 + [("c", 9.0)] * 30
    r = variance_decomposition(
        spark.createDataFrame(det, "g string, x double"), "x", "g"
    ).collect()[0]
    assert r["eta2"] == 1.0 and r["icc1"] > 0.99
    assert r["n0"] == 30.0  # equal groups: n0 = group size
    # identical distributions across groups -> eta2 ~ 0
    mix = [(g, float(i % 10)) for g in "abc" for i in range(30)]
    r2 = variance_decomposition(
        spark.createDataFrame(mix, "g string, x double"), "x", "g"
    ).collect()[0]
    assert r2["eta2"] < 0.01 and r2["icc1"] < 0.05


# ------------------------------------------------- beta_binomial_shrink
def test_beta_binomial_small_group_shrinks_more(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        beta_binomial_shrink,
    )

    rows = []
    rows += [("big_lo", i < 100) for i in range(1000)]   # 10%
    rows += [("big_hi", i < 900) for i in range(1000)]   # 90%
    rows += [("tiny", True) for _ in range(3)]           # 100% on n=3
    df = spark.createDataFrame(rows, "g string, y boolean")
    out = {r["g"]: r for r in beta_binomial_shrink(df, "y", "g").collect()}
    pbar = (100 + 900 + 3) / 2003
    # tiny's perfect rate is pulled hard toward the pool; big groups move little
    assert out["tiny"]["rate_shrunk"] < out["tiny"]["rate_raw"] == 1.0
    assert abs(out["big_hi"]["rate_shrunk"] - 0.9) < 0.02
    assert abs(out["big_lo"]["rate_shrunk"] - 0.1) < 0.02
    assert (out["tiny"]["rate_raw"] - out["tiny"]["rate_shrunk"]) > (
        out["big_hi"]["rate_raw"] - out["big_hi"]["rate_shrunk"]
    )
    # no between-group signal -> everything collapses to pbar
    null = [("a", i % 2 == 0) for i in range(100)] + [
        ("b", i % 2 == 0) for i in range(100)
    ]
    nr = beta_binomial_shrink(
        spark.createDataFrame(null, "g string, y boolean"), "y", "g"
    ).collect()
    assert all(r["rate_shrunk"] == 0.5 for r in nr)


# --------------------------------------------------------------- qini_curve
def test_qini_perfect_score_beats_random(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import qini_curve

    rows = []
    # treated units convert iff score > 150 (top quartile); control
    # never converts: all uplift lives in the top deciles
    for i in range(200):
        score = float(i)
        treated = i % 2 == 0
        converted = treated and score > 150
        rows.append((i, treated, converted, score))
    df = spark.createDataFrame(rows, "id long, t boolean, y boolean, s double")
    out = qini_curve(df, "t", "y", "s", "id").orderBy("decile").collect()
    assert [r["decile"] for r in out] == list(range(1, 11))
    # monotone non-decreasing cumulative counts
    assert all(
        out[i]["n_treated"] <= out[i + 1]["n_treated"] for i in range(9)
    )
    # early deciles: every treated unit above the cut converts -> qini
    # far above the random diagonal
    assert out[2]["qini"] > out[2]["qini_random"] * 1.5
    # final decile equals the global uplift = random diagonal endpoint
    assert abs(out[-1]["qini"] - out[-1]["qini_random"]) < 1e-6


# ------------------------------------------------------- pocock_monitor
def test_pocock_crossing_and_alpha_discipline(spark):
    import datetime

    from swivel_spark_prep_spark.operators.evalmetrics import pocock_monitor

    b = datetime.datetime(2024, 4, 1)
    rows = []
    # arm 'a' shifted +3 throughout: z grows with accrual and crosses
    for i in range(500):
        ts = b + datetime.timedelta(minutes=i)
        arm = "a" if i % 2 == 0 else "b"
        val = 10.0 + (i % 7) + (3.0 if arm == "a" else 0.0)
        rows.append((ts, i, arm, val))
    df = spark.createDataFrame(rows, "ts timestamp, id long, arm string, x double")
    out = pocock_monitor(
        df, "ts", "arm", "x", "a", "b", looks=5, tiebreak_col="id"
    ).orderBy("look").collect()
    assert [r["look"] for r in out] == [1, 2, 3, 4, 5]
    assert out[-1]["crossed"] and out[0]["first_crossed_look"] is not None
    # cumulative ns are monotone and end at the full sample
    assert out[-1]["n_a"] == 250 and out[-1]["n_b"] == 250
    # a 1.96-peeker would call look 1; the Pocock bound demands 2.413
    assert all(r["pocock_bound"] == 2.413 for r in out)
    # null: identical arms never cross
    null = [(b + datetime.timedelta(minutes=i), i,
             "a" if i % 2 == 0 else "b", 10.0 + (i % 7)) for i in range(500)]
    nout = pocock_monitor(
        spark.createDataFrame(null, "ts timestamp, id long, arm string, x double"),
        "ts", "arm", "x", "a", "b", looks=5, tiebreak_col="id",
    ).collect()
    assert all(not r["crossed"] for r in nout)
    assert nout[0]["first_crossed_look"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pocock_monitor(df, "ts", "arm", "x", "a", "b", looks=1)


# -------------------------------------------------- dim_correlation_pairs
def test_dim_correlation_finds_planted_redundancy(spark):
    from swivel_spark_prep_spark.operators.similarity import (
        dim_correlation_pairs,
    )

    rows = []
    for i in range(100):
        base = float((i * 37) % 50)
        noise = float((i * 13) % 11)
        # dim0 and dim2 are exact copies; dim1 independent-ish
        rows.append((i, [base, noise, base, float((i * 7) % 23)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dim_correlation_pairs(df, k=2).collect()
    assert (out[0]["dim_i"], out[0]["dim_j"]) == (0, 2)
    assert out[0]["r"] == 1.0
    assert abs(out[1]["r"]) < 0.9


# -------------------------------------------------------------- risk_table
def test_risk_table_hand_2x2(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import risk_table

    rows = (
        [(True, True)] * 30 + [(True, False)] * 70
        + [(False, True)] * 10 + [(False, False)] * 90
    )
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = risk_table(df, "e", "o").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (30, 70, 10, 90)
    assert abs(r["rd"] - 0.2) < 1e-9
    assert abs(r["rr"] - 3.0) < 1e-9
    assert abs(r["odds_ratio"] - (30 * 90) / (70 * 10)) < 1e-6
    assert r["rd_lo"] < 0.2 < r["rd_hi"]
    assert r["rr_lo"] < 3.0 < r["rr_hi"]
    # zero cell -> ratio CIs NULL, RD still defined
    z = spark.createDataFrame(
        [(True, True)] * 10 + [(False, True)] * 0 + [(False, False)] * 10,
        "e boolean, o boolean",
    )
    rz = risk_table(z, "e", "o").collect()[0]
    assert rz["rr"] is None and rz["odds_ratio"] is None
    assert rz["rd"] == 1.0
