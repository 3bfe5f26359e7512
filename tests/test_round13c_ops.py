"""Round-13 continuation operators (X311-X318): property tests beyond
the DuckDB-oracle parity in tests/test_llm_operators.py."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.evalmetrics import (
    quantile_treatment_effects,
)
from swivel_spark_prep_spark.operators.textstats import chapman_vocab_estimate
from swivel_spark_prep_spark.operators.timeseries import (
    aalen_johansen,
    kaplan_meier,
    ljung_box,
    mann_kendall,
    rmst,
    runs_test,
    seasonal_strength,
)

BASE = datetime.datetime(2024, 1, 1)


def _ts(day: int, sec: float = 0.0) -> datetime.datetime:
    return BASE + datetime.timedelta(days=day, seconds=sec)


# ------------------------------------------------------------------ rmst
def test_rmst_hand_example(spark):
    # 10 subjects, one event at t=5 (S drops 1 -> 0.9), nine censored
    # at t=10: RMST(10) = 1*5 + 0.9*5 = 9.5
    rows = [(5.0, 1)] + [(10.0, 0)] * 9
    df = spark.createDataFrame(rows, "t double, ev int")
    r = rmst(df, "t", "ev", tau=10.0).collect()[0]
    assert r["n_subjects"] == 10 and r["n_events_used"] == 1
    assert abs(r["rmst"] - 9.5) < 1e-9
    # no events at all -> S = 1 everywhere -> RMST = tau
    cens = spark.createDataFrame([(10.0, 0)] * 5, "t double, ev int")
    assert rmst(cens, "t", "ev", tau=8.0).collect()[0]["rmst"] == 8.0
    with pytest.raises(ValueError):
        rmst(df, "t", "ev", tau=0.0)


def test_rmst_consistent_with_km_steps(spark):
    # two events: t=2 (1/4) and t=6 (1/3 of remaining):
    # S = 1 on [0,2), 0.75 on [2,6), 0.5 on [6,10)
    rows = [(2.0, 1), (6.0, 1), (10.0, 0), (10.0, 0)]
    df = spark.createDataFrame(rows, "t double, ev int")
    km = {r["duration"]: r["survival"] for r in kaplan_meier(df, "t", "ev").collect()}
    assert km[2.0] == 0.75 and km[6.0] == 0.5
    r = rmst(df, "t", "ev", tau=10.0).collect()[0]
    assert abs(r["rmst"] - (1 * 2 + 0.75 * 4 + 0.5 * 4)) < 1e-9


# -------------------------------------------------------- aalen_johansen
def test_aj_single_cause_equals_one_minus_km(spark):
    rows = [(2.0, 1), (4.0, 1), (6.0, 0), (8.0, 1), (9.0, 0)]
    df = spark.createDataFrame(rows, "t double, k int")
    aj = {r["duration"]: r for r in aalen_johansen(df, "t", "k").collect()}
    km = {
        r["duration"]: r["survival"]
        for r in kaplan_meier(
            df.select("t", (F.col("k") == 1).cast("int").alias("ev")), "t", "ev"
        ).collect()
    }
    for t, row in aj.items():
        assert abs(row["cif_cause1"] - round(1 - km[t], 6)) < 1e-6
        assert row["cif_cause2"] == 0.0


def test_aj_cifs_sum_below_one_and_split_mass(spark):
    rows = [(1.0, 1), (2.0, 2), (3.0, 1), (4.0, 2), (5.0, 0), (6.0, 0)]
    df = spark.createDataFrame(rows, "t double, k int")
    out = aalen_johansen(df, "t", "k").orderBy("duration").collect()
    last = out[-1]
    assert last["cif_cause1"] + last["cif_cause2"] <= 1.0 + 1e-9
    assert last["cif_cause1"] > 0 and last["cif_cause2"] > 0
    # CIFs are monotone non-decreasing in t
    for col in ("cif_cause1", "cif_cause2"):
        vals = [r[col] for r in out]
        assert vals == sorted(vals)


# ---------------------------------------------------------- mann_kendall
def test_mann_kendall_trend_and_flat(spark):
    rows = []
    for d in range(20):
        rows.append(("up", _ts(d), float(d)))
        rows.append(("flat", _ts(d), 7.0))
    df = spark.createDataFrame(rows, "g string, ts timestamp, x double")
    out = {r["g"]: r for r in mann_kendall(df, "ts", "x", "g").collect()}
    n = 20
    assert out["up"]["s_stat"] == n * (n - 1) // 2
    assert out["up"]["z"] > 1.96
    assert out["flat"]["s_stat"] == 0
    # all-tied days: tie correction zeroes the variance -> z NULL
    assert out["flat"]["var_s"] == 0.0 and out["flat"]["z"] is None


# ----------------------------------------------------- seasonal_strength
def test_seasonal_strength_pure_vs_none(spark):
    rows = []
    for d in range(5):
        for h in range(24):
            t = _ts(d, 3600.0 * h + 30)
            rows.append(("pure", t, 10.0 + (h % 12)))
            rows.append(("none", t, 10.0 + ((d * 24 + h) * 0.618) % 1.0))
    df = spark.createDataFrame(rows, "g string, ts timestamp, x double")
    out = {r["g"]: r for r in seasonal_strength(df, "ts", "x", "g").collect()}
    assert out["pure"]["strength"] == 1.0 and out["pure"]["var_resid"] == 0.0
    assert out["none"]["strength"] < 0.2


# --------------------------------------------------------------- runs_test
def test_runs_test_alternating_vs_blocked(spark):
    rows = []
    for i in range(100):
        rows.append(("alt", _ts(0, 60.0 * i), i, 1.0 if i % 2 else -1.0))
        rows.append(("blk", _ts(0, 60.0 * i), i, 1.0 if i < 50 else -1.0))
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long, x double")
    out = {r["g"]: r for r in runs_test(df, "ts", "x", "g", "id").collect()}
    assert out["alt"]["runs"] == 100 and out["alt"]["z"] > 5
    assert out["blk"]["runs"] == 2 and out["blk"]["z"] < -5
    assert out["alt"]["n_plus"] == out["alt"]["n_minus"] == 50


# --------------------------------------------------------------- ljung_box
def test_ljung_box_white_vs_periodic(spark):
    import random

    rng = random.Random(42)
    rows = []
    for t in range(200):
        rows.append(("white", t, rng.random()))
        rows.append(("per", t, math.sin(2 * math.pi * t / 7.0)))
    df = spark.createDataFrame(rows, "g string, t long, x double")
    out = {r["g"]: r for r in ljung_box(df, "g", "t", "x", max_lag=7).collect()}
    # chi2(7) alpha=.05 critical value = 14.067
    assert out["per"]["q_stat"] > 100.0
    assert out["white"]["q_stat"] < 14.067
    assert out["white"]["h"] == 7
    with pytest.raises(ValueError):
        ljung_box(df, "g", "t", "x", max_lag=0)


# ------------------------------------------------- chapman_vocab_estimate
def test_chapman_identical_and_disjoint_halves(spark):
    docs_a = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    same = chapman_vocab_estimate(docs_a, docs_a).collect()[0]
    assert same["n_types_a"] == same["m_shared"] == 4
    assert abs(same["chapman_n"] - 4.0) < 1e-9 and same["se"] == 0.0
    docs_b = spark.createDataFrame(
        [(1, "epsilon zeta eta theta")], "doc_id long, text string"
    )
    disj = chapman_vocab_estimate(docs_a, docs_b).collect()[0]
    assert disj["m_shared"] == 0 and disj["union_observed"] == 8
    assert abs(disj["chapman_n"] - (5 * 5 - 1)) < 1e-9


# ------------------------------------------- quantile_treatment_effects
def test_qte_constant_shift_recovered_at_every_quantile(spark):
    rows = []
    for i in range(200):
        v = float((i * 37) % 100)
        rows.append(("a", v + 10.0, i))
        rows.append(("b", v, i))
    df = spark.createDataFrame(rows, "arm string, x double, id long")
    out = quantile_treatment_effects(df, "arm", "x", "a", "b").collect()
    assert [r["p"] for r in sorted(out, key=lambda r: r["p"])] == [
        0.25,
        0.5,
        0.75,
        0.9,
    ]
    assert all(abs(r["qte"] - 10.0) < 1e-9 for r in out)
    with pytest.raises(ValueError):
        quantile_treatment_effects(df, "arm", "x", "a", "b", probs=(0.0, 0.5))
