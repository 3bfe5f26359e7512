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
