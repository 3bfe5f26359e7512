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
