"""Round-12 survival-family additions: Nelson–Aalen cumulative hazard
(X215) and the two-sample log-rank test (X216), both riding the
kaplan_meier plan shape (per-distinct-duration counts + the
partitioned prefix-sum primitive — no global window, no subject-level
work past the first aggregate). References here are brute-force
python loops over tiny cohorts plus the estimators' published
identities (exp(−H) ≥ S, group-swap antisymmetry, textbook worked
example)."""

from __future__ import annotations

import math

import pytest

from swivel_spark_prep_spark.operators.timeseries import (
    kaplan_meier,
    logrank_test,
    nelson_aalen,
)


def _subjects(spark, rows):
    return spark.createDataFrame(rows, "t double, ev int, grp int")


COHORT = [
    # (duration, event, group) — ties, censoring, both groups
    (1.0, 1, 1),
    (1.0, 0, 0),
    (2.0, 1, 0),
    (2.0, 1, 1),
    (2.0, 0, 1),
    (3.0, 0, 0),
    (4.0, 1, 0),
    (4.0, 1, 1),
    (5.0, 0, 1),
    (6.0, 1, 0),
]


def _brute_nelson_aalen(rows):
    """Loop reference: H(t) = Σ d/n, Var = Σ d(n−d)/n³ over distinct
    event times, risk set = subjects with duration ≥ t."""
    out = {}
    times = sorted({t for t, ev, _ in rows if ev == 1})
    h = v = 0.0
    for t in times:
        n = sum(1 for tt, _, _ in rows if tt >= t)
        d = sum(1 for tt, ev, _ in rows if tt == t and ev == 1)
        h += d / n
        v += d * (n - d) / n**3
        out[t] = (n, d, h, v)
    return out


def test_nelson_aalen_matches_brute_force(spark):
    got = {
        r.duration: (r.n_risk, r.d_events, r.cum_hazard, r.var_hazard)
        for r in nelson_aalen(_subjects(spark, COHORT), "t", "ev").collect()
    }
    want = _brute_nelson_aalen(COHORT)
    assert set(got) == set(want)
    for t, (n, d, h, v) in want.items():
        gn, gd, gh, gv = got[t]
        assert (gn, gd) == (n, d)
        assert gh == pytest.approx(h, abs=1e-6)
        assert gv == pytest.approx(v, abs=1e-9)


def test_nelson_aalen_exp_neg_h_bounds_km(spark):
    """exp(−H(t)) ≥ S_KM(t) pointwise (since −ln(1−x) ≥ x), with
    equality only in the no-event limit — the standard consistency
    relation between the two estimators."""
    subj = _subjects(spark, COHORT)
    na = {r.duration: r.cum_hazard for r in nelson_aalen(subj, "t", "ev").collect()}
    km = {r.duration: r.survival for r in kaplan_meier(subj, "t", "ev").collect()}
    assert set(na) == set(km)
    for t in na:
        assert math.exp(-na[t]) >= km[t] - 1e-9


def test_nelson_aalen_all_events_single_time(spark):
    """Everyone dies at t=2: H = 1, Var = 0 (d = n)."""
    rows = [(2.0, 1, 0)] * 5
    out = nelson_aalen(_subjects(spark, rows), "t", "ev").collect()
    assert len(out) == 1
    assert out[0].duration == 2.0
    assert out[0].n_risk == 5 and out[0].d_events == 5
    assert out[0].cum_hazard == pytest.approx(1.0)
    assert out[0].var_hazard == pytest.approx(0.0)


def _brute_logrank(rows, a_val, b_val):
    times = sorted({t for t, ev, _ in rows if ev == 1})
    oa = ea = vv = 0.0
    na_tot = sum(1 for _, _, g in rows if g == a_val)
    nb_tot = sum(1 for _, _, g in rows if g == b_val)
    for t in times:
        na = sum(1 for tt, _, g in rows if tt >= t and g == a_val)
        nb = sum(1 for tt, _, g in rows if tt >= t and g == b_val)
        da = sum(1 for tt, ev, g in rows if tt == t and ev == 1 and g == a_val)
        db = sum(1 for tt, ev, g in rows if tt == t and ev == 1 and g == b_val)
        d, n = da + db, na + nb
        oa += da
        ea += na * d / n
        if n > 1:
            vv += na * nb * d * (n - d) / (n * n * (n - 1))
    z = (oa - ea) / math.sqrt(vv) if vv > 0 else None
    return na_tot, nb_tot, oa, ea, vv, z


def test_logrank_matches_brute_force(spark):
    row = logrank_test(_subjects(spark, COHORT), "t", "ev", "grp", 1, 0).collect()[0]
    na, nb, oa, ea, vv, z = _brute_logrank(COHORT, 1, 0)
    assert (row.n_a, row.n_b, row.observed_a) == (na, nb, oa)
    assert row.expected_a == pytest.approx(ea, abs=1e-6)
    assert row.z == pytest.approx(z, abs=1e-6)
    assert row.chi2 == pytest.approx(z * z, abs=1e-5)


def test_logrank_group_swap_negates_z(spark):
    subj = _subjects(spark, COHORT)
    ab = logrank_test(subj, "t", "ev", "grp", 1, 0).collect()[0]
    ba = logrank_test(subj, "t", "ev", "grp", 0, 1).collect()[0]
    assert ba.z == pytest.approx(-ab.z, abs=1e-6)
    assert ba.chi2 == pytest.approx(ab.chi2, abs=1e-5)


def test_logrank_identical_groups_z_zero(spark):
    """The same cohort duplicated into both groups: O = E exactly at
    every time, so z = 0 and chi2 = 0."""
    rows = [(t, ev, 1) for t, ev, _ in COHORT] + [(t, ev, 0) for t, ev, _ in COHORT]
    row = logrank_test(_subjects(spark, rows), "t", "ev", "grp", 1, 0).collect()[0]
    assert row.z == pytest.approx(0.0, abs=1e-9)
    assert row.chi2 == pytest.approx(0.0, abs=1e-9)


def test_logrank_separated_groups_signs(spark):
    """Group A events all early, group B all late ⇒ A observed > expected
    (positive z, A churns faster)."""
    rows = [(1.0, 1, 1), (1.5, 1, 1), (2.0, 1, 1), (8.0, 1, 0), (9.0, 1, 0), (10.0, 1, 0)]
    row = logrank_test(_subjects(spark, rows), "t", "ev", "grp", 1, 0).collect()[0]
    assert row.z > 0
    assert row.observed_a == 3


def test_logrank_other_group_values_excluded(spark):
    """Rows whose group is neither A nor B must not enter the risk set."""
    rows = COHORT + [(1.0, 1, 7), (2.0, 0, 7)]
    with_junk = logrank_test(_subjects(spark, rows), "t", "ev", "grp", 1, 0).collect()[0]
    clean = logrank_test(_subjects(spark, COHORT), "t", "ev", "grp", 1, 0).collect()[0]
    assert with_junk == clean


# ---- round-12 batch B: Kruskal–Wallis / Brier decomposition / McNemar


def _kw(spark, rows):
    from swivel_spark_prep_spark.operators.evalmetrics import kruskal_wallis

    df = spark.createDataFrame(rows, "g string, x double")
    return kruskal_wallis(df, "x", "g").collect()[0]


def test_kruskal_wallis_matches_brute_force(spark):
    import pandas as pd

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
        ("b", 2.0), ("b", 3.0), ("b", 7.0),
        ("c", 4.0), ("c", 4.0), ("c", 9.0), ("c", 1.0),
    ]
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    pdf["r"] = pdf["x"].rank(method="average")
    N = len(pdf)
    rr = sum(
        grp["r"].sum() ** 2 / len(grp) for _, grp in pdf.groupby("g")
    )
    h = 12.0 / (N * (N + 1)) * rr - 3.0 * (N + 1)
    tie3 = sum(t**3 - t for t in pdf.groupby("x").size())
    h_adj = h / (1 - tie3 / (N**3 - N))
    row = _kw(spark, rows)
    assert row.k == 3 and row.n == N
    assert row.h == pytest.approx(h, abs=1e-6)
    assert row.h_adj == pytest.approx(h_adj, abs=1e-6)
    assert row.epsilon_sq == pytest.approx(h / (N - 1), abs=1e-6)


def test_kruskal_wallis_identical_groups_h_zero(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    rows = [(g, v) for g in ("a", "b", "c") for v in vals]
    row = _kw(spark, rows)
    assert row.h == pytest.approx(0.0, abs=1e-9)


def test_kruskal_wallis_all_tied_h_adj_null(spark):
    rows = [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)]
    row = _kw(spark, rows)
    assert row.h_adj is None  # C = 0: every value tied


def _brier(spark, rows, bins=10):
    from swivel_spark_prep_spark.operators.evalmetrics import brier_decomposition

    df = spark.createDataFrame(rows, "p double, y int")
    return brier_decomposition(df, "p", "y", bins=bins).collect()[0]


def test_brier_matches_brute_force(spark):
    import numpy as np

    rows = [
        (0.05, 0), (0.12, 0), (0.18, 1), (0.33, 0), (0.41, 1),
        (0.47, 0), (0.63, 1), (0.71, 1), (0.88, 1), (0.95, 1), (0.97, 0),
    ]
    p = np.array([r[0] for r in rows])
    y = np.array([float(r[1]) for r in rows])
    bs = float(np.mean((p - y) ** 2))
    b = np.clip(np.floor(p * 10).astype(int), 0, 9)
    rel = res = 0.0
    obar = y.mean()
    for k in np.unique(b):
        m = b == k
        rel += m.sum() * (p[m].mean() - y[m].mean()) ** 2
        res += m.sum() * (y[m].mean() - obar) ** 2
    rel /= len(p)
    res /= len(p)
    unc = obar * (1 - obar)
    row = _brier(spark, rows)
    assert row.n == len(rows)
    assert row.brier == pytest.approx(bs, abs=1e-6)
    assert row.reliability == pytest.approx(rel, abs=1e-6)
    assert row.resolution == pytest.approx(res, abs=1e-6)
    assert row.uncertainty == pytest.approx(unc, abs=1e-6)
    assert row.residual == pytest.approx(bs - (rel - res + unc), abs=1e-5)


def test_brier_perfect_forecaster_all_zero(spark):
    rows = [(1.0, 1), (0.0, 0), (1.0, 1), (0.0, 0)]
    row = _brier(spark, rows)
    assert row.brier == pytest.approx(0.0)
    assert row.reliability == pytest.approx(0.0)
    assert row.residual == pytest.approx(0.0)
    assert row.resolution == pytest.approx(row.uncertainty, abs=1e-9)


def test_brier_constant_base_rate_forecast(spark):
    """Forecasting the base rate everywhere: RES = 0 (one bin, ō_k = ō)
    and REL = 0, so BS = UNC + residual (within-bin variance of a
    constant forecast is 0 ⇒ residual 0 too)."""
    rows = [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)]
    row = _brier(spark, rows)
    assert row.resolution == pytest.approx(0.0, abs=1e-9)
    assert row.reliability == pytest.approx(0.0, abs=1e-9)
    assert row.brier == pytest.approx(row.uncertainty, abs=1e-6)


def _mcnemar(spark, rows):
    from swivel_spark_prep_spark.operators.evalmetrics import mcnemar_test

    df = spark.createDataFrame(rows, "ca boolean, cb boolean")
    return mcnemar_test(df, "ca", "cb").collect()[0]


def test_mcnemar_hand_counts(spark):
    rows = (
        [(True, True)] * 5 + [(True, False)] * 7
        + [(False, True)] * 2 + [(False, False)] * 3
    )
    row = _mcnemar(spark, rows)
    assert (row.both_correct, row.a_only, row.b_only, row.both_wrong) == (5, 7, 2, 3)
    assert row.chi2 == pytest.approx((abs(7 - 2) - 1) ** 2 / 9.0, abs=1e-6)


def test_mcnemar_balanced_discordance_chi2_zero(spark):
    """b = c: the clamped continuity correction must give 0, not 1/(b+c)."""
    rows = [(True, False)] * 4 + [(False, True)] * 4
    assert _mcnemar(spark, rows).chi2 == pytest.approx(0.0)


def test_mcnemar_no_discordant_pairs_null(spark):
    rows = [(True, True)] * 3 + [(False, False)] * 2
    assert _mcnemar(spark, rows).chi2 is None


# ---- round-12 batch C: WOE/IV, Cochran–Armitage, pairwise distances


def test_woe_iv_matches_brute_force(spark):
    import math as m

    from swivel_spark_prep_spark.operators.quality import woe_iv

    rows = [(float(x), x % 3 == 0) for x in range(1, 31)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    out = {r.bin: r for r in woe_iv(df, "x", "y", bins=5).collect() if r.kind == "bin"}
    lo, hi = 1.0, 30.0
    w = (hi - lo) / 5
    G = sum(1 for _, y in rows if y)
    B = len(rows) - G
    iv_tot = 0.0
    for k in range(5):
        xs = [
            (x, y)
            for x, y in rows
            if min(4, max(0, int((x - lo) // w))) == k
        ]
        g = sum(1 for _, y in xs if y)
        b = len(xs) - g
        woe = m.log((g + 0.5) / G) - m.log((b + 0.5) / B)
        iv = (g / G - b / B) * woe
        iv_tot += round(iv, 6)
        assert out[k].goods == g and out[k].bads == b
        assert out[k].woe == pytest.approx(woe, abs=1e-6)
        assert out[k].iv == pytest.approx(iv, abs=1e-6)
    summary = [
        r
        for r in woe_iv(df, "x", "y", bins=5).collect()
        if r.kind == "__iv__"
    ][0]
    assert summary.iv == pytest.approx(iv_tot, abs=1e-6)


def test_woe_iv_constant_feature_single_bin(spark):
    from swivel_spark_prep_spark.operators.quality import woe_iv

    df = spark.createDataFrame([(5.0, True), (5.0, False)] * 3, "x double, y boolean")
    rows = woe_iv(df, "x", "y", bins=10).collect()
    bins = [r for r in rows if r.kind == "bin"]
    assert len(bins) == 1 and bins[0].bin == 0
    total = [r for r in rows if r.kind == "__iv__"][0]
    assert total.iv == pytest.approx(0.0)  # one bin carries no information


def test_woe_iv_uninformative_feature_iv_zero(spark):
    from swivel_spark_prep_spark.operators.quality import woe_iv

    # every bin has the same good:bad ratio → WOE identical, IV ≈ 0
    rows = []
    for k in range(10):
        rows += [(k + 0.5, True), (k + 0.5, True), (k + 0.5, False)]
    df = spark.createDataFrame(rows, "x double, y boolean")
    total = [
        r for r in woe_iv(df, "x", "y", bins=10).collect() if r.kind == "__iv__"
    ][0]
    assert abs(total.iv) < 1e-3


def test_cochran_armitage_matches_brute_force(spark):
    import math as m

    from swivel_spark_prep_spark.operators.evalmetrics import cochran_armitage

    # rate rises with the score: clear positive trend
    cells = {1.0: (30, 3), 2.0: (30, 9), 3.0: (30, 15), 4.0: (30, 24)}
    rows = []
    for s, (n, r) in cells.items():
        rows += [(s, True)] * r + [(s, False)] * (n - r)
    df = spark.createDataFrame(rows, "s double, y boolean")
    row = cochran_armitage(df, "s", "y").collect()[0]
    N = sum(n for n, _ in cells.values())
    R = sum(r for _, r in cells.values())
    pbar = R / N
    t = sum(s * (r - n * pbar) for s, (n, r) in cells.items())
    var = pbar * (1 - pbar) * (
        sum(s * s * n for s, (n, _) in cells.items())
        - sum(s * n for s, (n, _) in cells.items()) ** 2 / N
    )
    assert row.k == 4 and row.n == N and row.successes == R
    assert row.z == pytest.approx(t / m.sqrt(var), abs=1e-6)
    assert row.z > 3  # the planted trend is strong
    assert row.chi2 == pytest.approx(row.z * row.z, abs=1e-4)


def test_cochran_armitage_flat_rate_z_near_zero(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import cochran_armitage

    rows = []
    for s in (1.0, 2.0, 3.0):
        rows += [(s, True)] * 10 + [(s, False)] * 20
    row = cochran_armitage(
        spark.createDataFrame(rows, "s double, y boolean"), "s", "y"
    ).collect()[0]
    assert row.z == pytest.approx(0.0, abs=1e-9)


def test_cochran_armitage_constant_outcome_null(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import cochran_armitage

    rows = [(1.0, True), (2.0, True), (3.0, True)]
    row = cochran_armitage(
        spark.createDataFrame(rows, "s double, y boolean"), "s", "y"
    ).collect()[0]
    assert row.z is None and row.chi2 is None


def _pairdist(spark, rows):
    from swivel_spark_prep_spark.operators.textstats import (
        pairwise_distribution_distances,
    )

    df = spark.createDataFrame(rows, "g string, w string, c double")
    return {
        (r.g1, r.g2): r
        for r in pairwise_distribution_distances(df, "g", "w", "c").collect()
    }


def test_pairwise_distances_identical_distributions(spark):
    rows = [("a", "x", 2.0), ("a", "y", 3.0), ("b", "x", 4.0), ("b", "y", 6.0)]
    r = _pairdist(spark, rows)[("a", "b")]
    assert r.bc == pytest.approx(1.0, abs=1e-6)
    assert r.hellinger == pytest.approx(0.0, abs=1e-3)
    assert r.tv == pytest.approx(0.0, abs=1e-6)


def test_pairwise_distances_disjoint_supports(spark):
    """Zero-overlap pair must still appear: bc = 0, hellinger = 1, tv = 1."""
    rows = [("a", "x", 1.0), ("a", "y", 1.0), ("b", "u", 1.0), ("b", "v", 3.0)]
    r = _pairdist(spark, rows)[("a", "b")]
    assert r.n_common == 0
    assert r.bc == pytest.approx(0.0)
    assert r.hellinger == pytest.approx(1.0)
    assert r.tv == pytest.approx(1.0)


def test_pairwise_distances_partial_overlap_brute_force(spark):
    import math as m

    rows = [
        ("a", "x", 1.0), ("a", "y", 3.0),
        ("b", "y", 1.0), ("b", "z", 1.0),
        ("c", "x", 5.0),
    ]
    dists = {"a": {"x": 0.25, "y": 0.75}, "b": {"y": 0.5, "z": 0.5}, "c": {"x": 1.0}}
    got = _pairdist(spark, rows)
    for (g1, g2), r in got.items():
        p1, p2 = dists[g1], dists[g2]
        keys = set(p1) | set(p2)
        bc = sum(m.sqrt(p1.get(k, 0) * p2.get(k, 0)) for k in keys)
        tv = 0.5 * sum(abs(p1.get(k, 0) - p2.get(k, 0)) for k in keys)
        assert r.bc == pytest.approx(bc, abs=1e-6), (g1, g2)
        assert r.tv == pytest.approx(tv, abs=1e-6), (g1, g2)
        assert r.hellinger == pytest.approx(m.sqrt(1 - bc), abs=1e-6), (g1, g2)
    assert len(got) == 3  # all pairs from the 3-group grid


# ---- round-12 batch D: Wasserstein-1, Cramér–von Mises, Fleiss kappa


def _two_sample(spark, a_vals, b_vals):
    rows = [(float(v), "a") for v in a_vals] + [(float(v), "b") for v in b_vals]
    return spark.createDataFrame(rows, "v double, g string")


def test_wasserstein_matches_brute_force(spark):
    from swivel_spark_prep_spark.operators.quality import wasserstein_1d

    a = [1.0, 2.0, 2.0, 5.0, 7.0]
    b = [2.0, 3.0, 6.0, 6.0]
    row = wasserstein_1d(_two_sample(spark, a, b), "v", "g", "a", "b").collect()[0]
    vals = sorted(set(a) | set(b))
    w1 = 0.0
    for i in range(1, len(vals)):
        fa = sum(1 for x in a if x <= vals[i - 1]) / len(a)
        fb = sum(1 for x in b if x <= vals[i - 1]) / len(b)
        w1 += abs(fa - fb) * (vals[i] - vals[i - 1])
    assert (row.n_a, row.n_b) == (5, 4)
    assert row.w1 == pytest.approx(w1, abs=1e-6)


def test_wasserstein_shift_identity(spark):
    """W1 between X and X+c is exactly |c| — the signature EMD property
    KS does not have (KS saturates at 1 for any disjoint shift)."""
    from swivel_spark_prep_spark.operators.quality import wasserstein_1d

    a = [1.0, 3.0, 4.0, 8.0]
    for c in (0.5, 10.0):
        b = [x + c for x in a]
        row = wasserstein_1d(
            _two_sample(spark, a, b), "v", "g", "a", "b"
        ).collect()[0]
        assert row.w1 == pytest.approx(c, abs=1e-6), c


def test_wasserstein_identical_zero(spark):
    from swivel_spark_prep_spark.operators.quality import wasserstein_1d

    a = [1.0, 2.0, 9.0]
    row = wasserstein_1d(_two_sample(spark, a, a), "v", "g", "a", "b").collect()[0]
    assert row.w1 == pytest.approx(0.0)


def test_cramer_von_mises_matches_brute_force(spark):
    from swivel_spark_prep_spark.operators.quality import cramer_von_mises

    a = [1.0, 2.0, 2.0, 5.0, 7.0]
    b = [2.0, 3.0, 6.0, 6.0]
    row = cramer_von_mises(_two_sample(spark, a, b), "v", "g", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    pooled = a + b
    t = sum(
        (
            sum(1 for x in a if x <= v) / na
            - sum(1 for x in b if x <= v) / nb
        )
        ** 2
        for v in pooled
    )
    want = na * nb / (na + nb) ** 2 * t
    assert row.t == pytest.approx(want, abs=1e-6)


def test_cramer_von_mises_identical_zero_and_disjoint_positive(spark):
    from swivel_spark_prep_spark.operators.quality import cramer_von_mises

    a = [1.0, 2.0, 3.0]
    same = cramer_von_mises(_two_sample(spark, a, a), "v", "g", "a", "b").collect()[0]
    assert same.t == pytest.approx(0.0)
    b = [10.0, 11.0, 12.0]
    far = cramer_von_mises(_two_sample(spark, a, b), "v", "g", "a", "b").collect()[0]
    assert far.t > 0.3  # fully separated samples: large CvM


def _ratings(spark, rows):
    return spark.createDataFrame(rows, "item long, cat string")


def test_fleiss_kappa_matches_published_worked_example(spark):
    """Fleiss 1971-style hand check on a tiny table: 4 items × 3
    raters, 2 categories; brute-force python replication."""
    from swivel_spark_prep_spark.operators.evalmetrics import fleiss_kappa

    table = {
        1: ["x", "x", "x"],
        2: ["x", "x", "y"],
        3: ["y", "y", "x"],
        4: ["y", "y", "y"],
    }
    rows = [(i, c) for i, cs in table.items() for c in cs]
    row = fleiss_kappa(_ratings(spark, rows), "item", "cat").collect()[0]
    n, N = 3, 4
    p_i = []
    cat_tot = {}
    for cs in table.values():
        counts = {c: cs.count(c) for c in set(cs)}
        p_i.append((sum(v * v for v in counts.values()) - n) / (n * (n - 1)))
        for c, v in counts.items():
            cat_tot[c] = cat_tot.get(c, 0) + v
    pbar = sum(p_i) / N
    pe = sum((v / (N * n)) ** 2 for v in cat_tot.values())
    kappa = (pbar - pe) / (1 - pe)
    assert row.n_items == N and row.n_raters == n
    assert row.p_bar == pytest.approx(pbar, abs=1e-6)
    assert row.p_e == pytest.approx(pe, abs=1e-6)
    assert row.kappa == pytest.approx(kappa, abs=1e-6)


def test_fleiss_kappa_perfect_agreement_one(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import fleiss_kappa

    rows = [(i, c) for i, c in ((1, "x"), (2, "y"), (3, "x")) for _ in range(3)]
    row = fleiss_kappa(_ratings(spark, rows), "item", "cat").collect()[0]
    assert row.kappa == pytest.approx(1.0)


def test_fleiss_kappa_single_category_null(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import fleiss_kappa

    rows = [(i, "x") for i in (1, 2, 3) for _ in range(3)]
    row = fleiss_kappa(_ratings(spark, rows), "item", "cat").collect()[0]
    assert row.kappa is None  # P_e = 1: vacuous


def test_fleiss_kappa_varying_raters_raises(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import fleiss_kappa

    rows = [(1, "x"), (1, "y"), (1, "x"), (2, "x"), (2, "y")]  # 3 vs 2 raters
    with pytest.raises(ValueError, match="constant rater count"):
        fleiss_kappa(_ratings(spark, rows), "item", "cat").collect()


# ---- round-12 batch E: randomization test, MMR selection, RBO


def _rt(spark, rows, replicates=100):
    from swivel_spark_prep_spark.operators.sampling import randomization_test

    df = spark.createDataFrame(rows, "id string, g string, x double")
    return randomization_test(
        df, "x", "id", "g", "a", "b", replicates=replicates
    ).collect()[0]


def test_randomization_matches_numpy_replay(spark):
    """Replicate the operator's exact md5 + Weyl assignment in python
    and check b_used / n_extreme / p_value bit-for-bit."""
    import hashlib
    import math as m

    rows = [(f"r{i}", "a" if i % 3 else "b", float((i * 7) % 11)) for i in range(40)]
    B = 50
    na = sum(1 for _, g, _ in rows if g == "a")
    nb = len(rows) - na
    q = na / (na + nb)
    ma = sum(x for _, g, x in rows if g == "a") / na
    mb = sum(x for _, g, x in rows if g == "b") / nb
    diffs = []
    hs = []
    for rid, _, x in rows:
        d = hashlib.md5(f"perm:{rid}".encode()).hexdigest()
        h = int(d[0:15], 16) / 2**60
        s = m.fmod(0.6180339887498949 * (1.0 + h), 1.0)
        hs.append((h, s, x))
    for b in range(1, B + 1):
        sa = wa = sb = wb = 0.0
        for h, s, x in hs:
            u = m.fmod(h + b * s, 1.0)
            if u < q:
                sa += x
                wa += 1
            else:
                sb += x
                wb += 1
        if wa > 0 and wb > 0:
            diffs.append(sa / wa - sb / wb)
    n_ext = sum(1 for d in diffs if abs(d) >= abs(ma - mb))
    row = _rt(spark, rows, replicates=B)
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.b_used == len(diffs)
    assert row.n_extreme == n_ext
    assert row.p_value == pytest.approx((1 + n_ext) / (len(diffs) + 1), abs=1e-6)


def test_randomization_null_data_large_p(spark):
    """Identical distributions (interleaved constant + noise-free
    pattern): the observed diff is tiny, so most relabelings beat it —
    p must be large."""
    rows = [(f"r{i}", "a" if i % 2 else "b", float(i % 5)) for i in range(60)]
    row = _rt(spark, rows)
    assert row.p_value > 0.2


def test_randomization_separated_groups_small_p(spark):
    """a-values ≫ b-values: almost no relabeling reproduces the gap."""
    rows = [(f"a{i}", "a", 100.0 + i) for i in range(25)] + [
        (f"b{i}", "b", float(i)) for i in range(25)
    ]
    row = _rt(spark, rows, replicates=200)
    assert row.p_value < 0.05
    # mean(a) = 100 + 12 = 112, mean(b) = 12 -> diff = 100
    assert abs(row.diff_obs - 100.0) < 1.0


def _brute_mmr(vecs, query, k, lam):
    import math as m

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        return d / m.sqrt(sum(a * a for a in u) * sum(b * b for b in v))

    rel = {i: cos(v, query) for i, v in vecs.items()}
    chosen = []
    for _ in range(min(k, len(vecs))):
        best = None
        for i, v in vecs.items():
            if i in [c for c, _ in chosen]:
                continue
            ms = max((cos(v, vecs[c]) for c, _ in chosen), default=0.0)
            sc = lam * rel[i] - (1 - lam) * ms
            # tiebreak by id, matching the operator
            if best is None or sc > best[1] + 1e-12 or (
                abs(sc - best[1]) <= 1e-12 and i < best[0]
            ):
                best = (i, sc)
        chosen.append(best)
    return [c for c, _ in chosen]


def test_mmr_matches_brute_force(spark):
    from swivel_spark_prep_spark.operators.similarity import mmr_select

    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.98, 0.1, 0.0],   # near-dup of 1: plain top-k would take it
        3: [0.7, 0.7, 0.0],
        4: [0.5, 0.0, 0.8],
        5: [0.0, 1.0, 0.0],
        6: [0.9, 0.05, 0.05],  # another near-dup of 1
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        r.vec_id
        for r in mmr_select(df, [1.0, 0.0, 0.0], k=4, lam=0.6)
        .orderBy("step")
        .collect()
    ]
    assert got == _brute_mmr(vecs, [1.0, 0.0, 0.0], 4, 0.6)


def test_mmr_lambda_one_is_plain_topk(spark):
    from swivel_spark_prep_spark.operators.similarity import cosine_topk, mmr_select

    import random

    rng = random.Random(7)
    rowsv = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    df = spark.createDataFrame(rowsv, "vec_id long, embedding array<float>")
    q = [1.0] + [0.0] * 7
    mmr_ids = [
        r.vec_id for r in mmr_select(df, q, k=5, lam=1.0).orderBy("step").collect()
    ]
    topk_ids = [r.vec_id for r in cosine_topk(df, query_vec=q, k=5).collect()]
    assert mmr_ids == topk_ids


def test_mmr_avoids_near_duplicates(spark):
    """With λ < 1 the second pick must NOT be the planted near-dup of
    the first even though it has the second-highest relevance.

    The query must NOT be collinear with the first pick: if q == s₁
    then rel(c) == sim(c, s₁) for every candidate and all λ=0.5
    scores are identically zero (a mathematical tie, not a diversity
    decision). q = [0.9, 0.1] keeps 2 the top-relevance pick while
    its near-dup 1 scores rel − sim ≈ −0.003 < candidate 3's ≈ +0.08.
    """
    from swivel_spark_prep_spark.operators.similarity import mmr_select

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.001]),  # near-dup of 1, slightly q-closer
            (3, [0.6, 0.8]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = [
        r.vec_id
        for r in mmr_select(df, [0.9, 0.1], k=2, lam=0.5).orderBy("step").collect()
    ]
    assert got == [2, 3]


def _rbo(spark, a_ranks, b_ranks, k, p=0.9):
    from swivel_spark_prep_spark.operators.evalmetrics import rank_biased_overlap

    a = spark.createDataFrame(list(a_ranks.items()), "id string, r long")
    b = spark.createDataFrame(list(b_ranks.items()), "id string, r long")
    return rank_biased_overlap(a, b, "id", "r", k=k, p=p).collect()[0]


def test_rbo_identical_lists_truncation_mass(spark):
    """Two identical k-lists: RBO@k = Σ_{d≤k} (1−p)p^{d−1} = 1 − p^k
    (every depth overlap is d/d = 1)."""
    ranks = {f"d{i}": i for i in range(1, 11)}
    row = _rbo(spark, ranks, ranks, k=10, p=0.9)
    assert row.rbo == pytest.approx(1 - 0.9**10, abs=1e-6)
    assert row.n_common == 10


def test_rbo_disjoint_lists_zero(spark):
    a = {f"a{i}": i for i in range(1, 6)}
    b = {f"b{i}": i for i in range(1, 6)}
    row = _rbo(spark, a, b, k=5)
    assert row.rbo == pytest.approx(0.0)
    assert row.n_common == 0


def test_rbo_matches_depth_loop_brute_force(spark):
    a = {"w": 1, "x": 2, "y": 3, "z": 4}
    b = {"x": 1, "w": 2, "q": 3, "y": 4}
    k, p = 4, 0.8
    rbo = 0.0
    for d in range(1, k + 1):
        ad = {i for i, r in a.items() if r <= d}
        bd = {i for i, r in b.items() if r <= d}
        rbo += (1 - p) * p ** (d - 1) * len(ad & bd) / d
    row = _rbo(spark, a, b, k=k, p=p)
    assert row.rbo == pytest.approx(rbo, abs=1e-6)


def test_rbo_top_weighting(spark):
    """Agreement at depth 1 must outweigh the same single agreement
    buried at depth k."""
    base = {f"a{i}": i for i in range(2, 6)}
    top_match = dict({"s": 1}, **base)                      # shares rank-1 doc
    a1 = dict({"s": 1}, **{f"x{i}": i for i in range(2, 6)})
    deep_match = {f"y{i}": i for i in range(1, 5)}
    deep_match["s"] = 5
    a2 = {f"z{i}": i for i in range(1, 5)}
    a2["s"] = 5                                             # shares rank-5 doc
    hi = _rbo(spark, a1, top_match, k=5).rbo
    lo = _rbo(spark, a2, deep_match, k=5).rbo
    assert hi > lo > 0
