"""Round-13 operators: Neyman allocation, threshold ROI, encoding
audit, JSON schema profile, rolling-origin splits — property tests
beyond the DuckDB-oracle parity that tests/test_llm_operators.py
already runs at both SFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.profile import json_schema_profile
from swivel_spark_prep_spark.operators.quality import threshold_roi
from swivel_spark_prep_spark.operators.sampling import neyman_allocation
from swivel_spark_prep_spark.operators.textstats import encoding_audit
from swivel_spark_prep_spark.operators.timeseries import rolling_origin_splits


# ------------------------------------------------------- neyman_allocation
def _strata(spark):
    # three strata: big+noisy, big+quiet, small+noisy, plus a
    # zero-variance stratum
    rows = []
    for i in range(100):
        rows.append(("big_noisy", float((i * 37) % 100)))
    for i in range(100):
        rows.append(("big_quiet", 50.0 + (i % 2)))
    for i in range(20):
        rows.append(("small_noisy", float((i * 53) % 100)))
    for i in range(30):
        rows.append(("constant", 7.0))
    return spark.createDataFrame(rows, "s string, v double")


def test_neyman_sums_to_budget_and_caps(spark):
    df = _strata(spark)
    out = {r["s"]: r for r in neyman_allocation(df, "s", "v", 120.0).collect()}
    assert len(out) == 4
    # allocations respect caps and sum to the budget
    for r in out.values():
        assert r["alloc"] <= r["n_rows"] + 1e-9
    assert sum(r["alloc"] for r in out.values()) == pytest.approx(120.0, abs=0.05)
    # zero-variance stratum gets nothing and never saturates
    assert out["constant"]["alloc"] == 0.0 and not out["constant"]["saturated"]
    # Neyman monotonicity: bigger N*sd gets more (before saturation)
    assert out["big_noisy"]["alloc"] > out["big_quiet"]["alloc"]
    assert out["big_noisy"]["alloc"] > out["small_noisy"]["alloc"]


def test_neyman_saturation_branch(spark):
    df = _strata(spark)
    # budget exceeding every nonzero-variance stratum's size: all of
    # them saturate at N_s (constant stays at 0)
    out = {r["s"]: r for r in neyman_allocation(df, "s", "v", 500.0).collect()}
    for s in ("big_noisy", "big_quiet", "small_noisy"):
        assert out[s]["saturated"] and out[s]["alloc"] == out[s]["n_rows"]
    assert out["constant"]["alloc"] == 0.0


def test_neyman_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        neyman_allocation(_strata(spark), "s", "v", 0.0)


# ---------------------------------------------------------- threshold_roi
def test_threshold_roi_monotone_and_exact(spark):
    df = spark.createDataFrame(
        [(float(i), 10.0) for i in range(1, 11)], "score double, w double"
    )
    rows = threshold_roi(df, "score", [0.0, 5.0, 11.0], weight_col="w").orderBy(
        "threshold"
    ).collect()
    by_t = {r["threshold"]: r for r in rows}
    assert by_t[0.0]["n_kept"] == 10 and by_t[0.0]["frac_rows"] == 1.0
    assert by_t[5.0]["n_kept"] == 6  # scores 5..10
    assert by_t[11.0]["n_kept"] == 0 and by_t[11.0]["w_kept"] == 0.0
    kept = [r["n_kept"] for r in rows]
    assert kept == sorted(kept, reverse=True)


def test_threshold_roi_rejects_empty(spark):
    df = spark.createDataFrame([(1.0,)], "score double")
    with pytest.raises(ValueError):
        threshold_roi(df, "score", [])


# ---------------------------------------------------------- encoding_audit
def test_encoding_audit_counts_exactly(spark):
    docs = spark.createDataFrame(
        [
            (1, "clean ascii text", "a"),
            (2, "bad � decode � here", "a"),
            (3, "ctrl\x01\x02chars", "a"),
            (4, "café naïve", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in encoding_audit(docs).collect()}
    a, b = out["a"], out["b"]
    assert a["docs_replacement"] == 1
    # 2 control chars over the slice's total chars
    total_a = len("clean ascii text") + len("bad � decode � here") + len(
        "ctrl\x01\x02chars"
    )
    assert a["ctrl_char_ratio"] == pytest.approx(2 / total_a, abs=1e-6)
    # slice b: 2 non-ascii chars (é, ï) in 10 chars
    assert b["non_ascii_share"] == pytest.approx(2 / len("café naïve"), abs=1e-6)
    assert b["ascii_frac_docs"] == 0.0 and a["ascii_frac_docs"] == pytest.approx(
        2 / 3, abs=1e-6
    )


# ----------------------------------------------------- json_schema_profile
def test_json_schema_profile_types_and_invalid(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": 2.5, "c": true, "d": null, "e": "x", '
                '"f": {"g": 1}, "h": [1,2]}'),
            (2, '{"a": 7}'),
            (3, "not json at all {"),
            (4, None),
        ],
        "id long, js string",
    )
    rows = json_schema_profile(df.filter("js IS NOT NULL"), "js").collect()
    got = {(r["key"], r["value_type"]): r["n"] for r in rows}
    assert got[("a", "integer")] == 2
    assert got[("b", "number")] == 1
    assert got[("c", "boolean")] == 1
    assert got[("d", "null")] == 1
    assert got[("e", "string")] == 1
    assert got[("f", "object")] == 1
    assert got[("h", "array")] == 1
    assert got[("__invalid__", "invalid")] == 1


# -------------------------------------------------- rolling_origin_splits
def test_rolling_origin_no_future_leakage(spark):
    # 60 evenly spaced timestamps -> 6 slices of 10 each
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 28) + 1:02d} {i % 24:02d}:00:00") for i in range(60)],
        "i long, raw string",
    ).select("i", F.to_timestamp("raw").alias("ts"))
    rows = rolling_origin_splits(df, "ts", n_folds=5).orderBy("fold").collect()
    assert len(rows) == 5
    n_train = [r["n_train"] for r in rows]
    # expanding window: train sets strictly grow and train+test never
    # exceeds the corpus
    assert n_train == sorted(n_train) and n_train[0] > 0
    for r in rows:
        assert r["n_train"] + r["n_test"] <= 60
        assert r["frac_train"] == pytest.approx(r["n_train"] / 60, abs=1e-6)
    # every fold's test rows are exactly the rows after its train cut
    assert sum(r["n_test"] for r in rows) + n_train[0] <= 60 + 1


def test_rolling_origin_exact_uniform_slices(spark):
    # timestamps at exactly 0..59 seconds from an epoch-aligned start:
    # slice k covers [10k, 10(k+1)) seconds -> 10 rows each, exact
    df = spark.createDataFrame(
        [(i,) for i in range(60)], "i long"
    ).select(F.timestamp_seconds(F.col("i") + 1_700_000_000).alias("ts"))
    rows = rolling_origin_splits(df, "ts", n_folds=5).orderBy("fold").collect()
    assert [r["n_train"] for r in rows] == [10, 20, 30, 40, 50]
    assert [r["n_test"] for r in rows] == [10, 10, 10, 10, 10]


def test_rolling_origin_rejects_bad_folds(spark):
    df = spark.createDataFrame([(1,)], "i long").select(
        F.timestamp_seconds(F.col("i")).alias("ts")
    )
    with pytest.raises(ValueError):
        rolling_origin_splits(df, "ts", n_folds=0)


# ----------------------------------------------------------- log_odds_terms
def test_log_odds_planted_vocabulary(spark):
    from swivel_spark_prep_spark.operators.textstats import log_odds_terms

    rows = []
    for i in range(30):
        rows.append((i, "common words here alpha alpha alpha", "A"))
        rows.append((100 + i, "common words here beta beta beta", "B"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = log_odds_terms(df, "lang", "A", "B", k=3).collect()
    fav_a = [r["w"] for r in out if r["favors"] == "A"]
    fav_b = [r["w"] for r in out if r["favors"] == "B"]
    assert fav_a[0] == "alpha" and fav_b[0] == "beta"
    za = {r["w"]: r["z"] for r in out if r["favors"] == "A"}
    zb = {r["w"]: r["z"] for r in out if r["favors"] == "B"}
    assert za["alpha"] > 0 and zb["beta"] < 0
    # shared vocabulary is not discriminative: |z| of 'common' far below
    assert abs(za["alpha"]) > 5 * abs(za.get("common", zb.get("common", 0.0)))


def test_log_odds_direction_swap_flips_sign(spark):
    from swivel_spark_prep_spark.operators.textstats import log_odds_terms

    rows = [(1, "x y z z", "A"), (2, "x y w w", "B")] * 10
    df = spark.createDataFrame(
        [(i, t, g) for i, (_, t, g) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )
    ab = {r["w"]: r["z"] for r in log_odds_terms(df, "lang", "A", "B", k=4).collect()}
    ba = {r["w"]: r["z"] for r in log_odds_terms(df, "lang", "B", "A", k=4).collect()}
    for w in set(ab) & set(ba):
        assert ab[w] == pytest.approx(-ba[w], abs=1e-9)


# ------------------------------------------------ cluster_transitivity_audit
def test_transitivity_chain_vs_triangle(spark):
    from swivel_spark_prep_spark.operators.dedup import cluster_transitivity_audit

    clusters = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False), (9, 9, True)],
        "doc_id long, rep_id long, is_rep boolean",
    )
    chain = spark.createDataFrame([(1, 2, 0.9), (2, 3, 0.85)],
                                  "d1 long, d2 long, jac double")
    r = cluster_transitivity_audit(chain, clusters).collect()[0]
    assert r["n_clusters"] == 1 and r["n_docs_clustered"] == 3
    assert r["implied_pairs"] == 3 and r["found_pairs"] == 2
    assert r["transitivity"] == pytest.approx(2 / 3, abs=1e-6)
    triangle = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.85), (1, 3, 0.8)], "d1 long, d2 long, jac double"
    )
    r2 = cluster_transitivity_audit(triangle, clusters).collect()[0]
    assert r2["transitivity"] == 1.0


# ----------------------------------------------------------- l_diversity
def test_l_diversity_flags_homogeneous_groups(spark):
    from swivel_spark_prep_spark.operators.quality import l_diversity_audit

    df = spark.createDataFrame(
        # group (a, 1): 3 rows all sensitive 's1' -> flagged
        # group (b, 2): 2 rows, sensitive s1/s2 -> diverse, ok
        [("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s1"),
         ("b", 2, "s1"), ("b", 2, "s2")],
        "q1 string, q2 int, sens string",
    )
    rows = l_diversity_audit(df, ["q1", "q2"], "sens", l=2).collect()
    flagged = [r for r in rows if r["q1"] == "a"]
    audit = [r for r in rows if r["q1"] == "__audit__"][0]
    assert len(flagged) == 1 and flagged[0]["n"] == 3
    assert flagged[0]["n_sensitive"] == 1
    assert audit["n"] == 3
    with pytest.raises(ValueError):
        l_diversity_audit(df, ["q1"], "sens", l=1)


# --------------------------------------------------------- entity_entropy
def test_entity_entropy_exact_bins(spark):
    from swivel_spark_prep_spark.operators.timeseries import entity_entropy

    rows = []
    rows += [(1, "a")] * 8                      # H = 0.0 exactly
    rows += [(2, "a")] * 4 + [(2, "b")] * 4     # H = 1.0
    rows += [(3, t) for t in "abcd" for _ in range(2)]  # H = 2.0
    df = spark.createDataFrame(rows, "user_id long, et string")
    out = {r["h_bin"]: r["n_entities"] for r in entity_entropy(df, "user_id", "et").collect()}
    assert out == {0.0: 1, 1.0: 1, 2.0: 1}


# ---------------------------------------------------------- simpsons_check
def test_simpsons_planted_reversal(spark):
    from swivel_spark_prep_spark.operators.linear import simpsons_check

    rows = []
    # within each stratum y DECREASES in x; across strata the high-x
    # stratum has much higher y, so the pooled slope is POSITIVE —
    # the classic Simpson construction
    for i in range(50):
        x = i / 50.0
        rows.append(("low", x, 1.0 - 0.5 * x))
        rows.append(("high", 2.0 + x, 10.0 - 0.5 * x))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in simpsons_check(df, "x", "y", "g").collect()}
    assert out["low"]["slope"] < 0 and out["high"]["slope"] < 0
    assert out["low"]["pooled_slope"] > 0
    assert out["low"]["reversed"] and out["high"]["reversed"]


def test_simpsons_no_reversal_and_degenerate(spark):
    from swivel_spark_prep_spark.operators.linear import simpsons_check

    rows = [("a", float(i), 2.0 * i) for i in range(20)]
    rows += [("a", float(i), 2.0 * i + 1) for i in range(20)]
    rows += [("const", 5.0, float(i)) for i in range(10)]  # zero x-variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in simpsons_check(df, "x", "y", "g").collect()}
    assert out["a"]["reversed"] is False and out["a"]["slope"] > 0
    assert out["const"]["slope"] is None and out["const"]["reversed"] is None


# -------------------------------------------------------- ngram_dup_spectrum
def test_dup_spectrum_planted(spark):
    from swivel_spark_prep_spark.operators.textstats import ngram_dup_spectrum

    # "a a a a" is maximally duplicated at every n; a unique-word doc
    # has zero dup at every n > 1
    docs = spark.createDataFrame(
        [(1, "a a a a a a a a"), (2, "u1 u2 u3 u4 u5 u6 u7 u8")],
        "doc_id long, text string",
    )
    out = {r["n"]: r for r in ngram_dup_spectrum(docs, ns=(1, 2, 8)).collect()}
    # n=1: 16 grams, 9 distinct (a + u1..u8)
    assert out[1]["total_grams"] == 16 and out[1]["distinct_grams"] == 9
    # n=8: 1 gram per doc, both distinct -> dup 0
    assert out[8]["total_grams"] == 2 and out[8]["dup_rate"] == 0.0
    # dup rate falls with n
    assert out[1]["dup_rate"] > out[2]["dup_rate"] > out[8]["dup_rate"]
    with pytest.raises(ValueError):
        ngram_dup_spectrum(docs, ns=(0,))


# -------------------------------------------------------- cross_correlation
def test_ccf_planted_lead(spark):
    from swivel_spark_prep_spark.operators.timeseries import cross_correlation

    # B(day) = A(day - 2): the CCF must peak at lag +2 exactly
    rows = []
    base = [5.0, 9.0, 2.0, 8.0, 1.0, 7.0, 3.0, 6.0, 4.0, 10.0,
            2.5, 8.5, 1.5, 9.5, 0.5, 6.5]
    for i, v in enumerate(base):
        rows.append(("A", f"2024-03-{i+1:02d} 12:00:00", v))
    for i, v in enumerate(base):
        if i + 2 < 28:
            rows.append(("B", f"2024-03-{i+3:02d} 12:00:00", v))
    df = spark.createDataFrame(rows, "k string, raw string, v double").select(
        "k", F.to_timestamp("raw").alias("ts"), "v"
    )
    out = {r["lag"]: r for r in cross_correlation(
        df, "ts", "v", "k", "A", "B", max_lag=3).collect()}
    assert out[2]["ccf"] == pytest.approx(1.0, abs=1e-9)
    for lag in (-3, -2, -1, 0, 1, 3):
        if out[lag]["ccf"] is not None:
            assert out[lag]["ccf"] < 0.99
    with pytest.raises(ValueError):
        cross_correlation(df, "ts", "v", "k", "A", "B", max_lag=0)


# ------------------------------------------------------------- psi_timeline
def test_psi_timeline_baseline_zero_and_shift_detected(spark):
    from swivel_spark_prep_spark.operators.quality import psi_timeline

    rows = []
    # one day per week so the epoch-week assignment is unambiguous:
    # baseline dist on Jan 1, identical dist two weeks later, a +50
    # shift four weeks later -> PSI ~0, ~0, large
    for i in range(200):
        v = (i % 100) / 10.0
        rows.append(("2024-01-01 00:00:00", v))
        rows.append(("2024-01-15 00:00:00", v))
        rows.append(("2024-01-29 00:00:00", v + 50))
    df = spark.createDataFrame(rows, "raw string, value double").select(
        F.to_timestamp("raw").alias("ts"), "value"
    )
    out = sorted(psi_timeline(df, "ts", "value").collect(), key=lambda r: r["week"])
    assert out[0]["psi"] == pytest.approx(0.0, abs=1e-9)       # baseline
    assert abs(out[1]["psi"]) < 0.05                            # same dist
    assert out[-1]["psi"] > 1.0                                 # full shift
    with pytest.raises(ValueError):
        psi_timeline(df, "ts", "value", n_bins=1)


# -------------------------------------------------------- quantile_timeline
def test_quantile_timeline_exact(spark):
    from swivel_spark_prep_spark.operators.timeseries import quantile_timeline

    rows = [("2024-02-01 00:00:00", "a", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "raw string, g string, v double").select(
        F.to_timestamp("raw").alias("ts"), "g", "v"
    )
    r = quantile_timeline(df, "ts", "v", "g").collect()[0]
    assert r["n"] == 100
    assert r["p50"] == pytest.approx(50.5, abs=1e-6)   # exact interpolated
    assert r["p90"] == pytest.approx(90.1, abs=1e-6)
    assert r["p99"] == pytest.approx(99.01, abs=1e-6)


# --------------------------------------------------------- hill_tail_index
def test_hill_recovers_planted_pareto(spark):
    from swivel_spark_prep_spark.operators.textstats import hill_tail_index

    # deterministic Pareto(alpha=2) grid: x = u^(-1/2), u on a uniform
    # grid in (0,1) -> Hill over the top tail must estimate xi ~ 0.5
    rows = [(float((i + 0.5) / 5000) ** -0.5,) for i in range(5000)]
    df = spark.createDataFrame(rows, "x double")
    r = hill_tail_index(df, "x", k=200).collect()[0]
    assert r["xi"] == pytest.approx(0.5, rel=0.15)
    assert r["alpha"] == pytest.approx(2.0, rel=0.15)
    with pytest.raises(ValueError):
        hill_tail_index(df, "x", k=1)


# ------------------------------------------------------------ fd_histogram
def test_fd_histogram_partitions_all_rows(spark):
    from swivel_spark_prep_spark.operators.profile import fd_histogram

    df = spark.createDataFrame([(float(i % 1000),) for i in range(5000)], "v double")
    rows = fd_histogram(df, "v").orderBy("bin").collect()
    assert sum(r["n"] for r in rows) == 5000
    # FD on uniform 0..999, n=5000: width = 2*500/17.1 ~ 58 -> ~18 bins
    assert 5 <= len(rows) <= 50
    # bins tile the range contiguously
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] == pytest.approx(b["lo"], abs=1e-6)
    assert rows[0]["lo"] == 0.0 and rows[-1]["hi"] == pytest.approx(999.0, abs=1e-6)


def test_fd_histogram_degenerate_constant(spark):
    from swivel_spark_prep_spark.operators.profile import fd_histogram

    df = spark.createDataFrame([(7.0,)] * 50, "v double")
    rows = fd_histogram(df, "v").collect()
    assert len(rows) == 1 and rows[0]["n"] == 50 and rows[0]["bin"] == 0


# -------------------------------------------------------------- jarque_bera
def test_jarque_bera_uniform_vs_spike(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import jarque_bera

    rows = [("unif", (i + 0.5) / 1000.0) for i in range(1000)]
    rows += [("spike", 0.0)] * 990 + [("spike", 100.0)] * 10
    rows += [("tiny", 1.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in jarque_bera(df, "v", "g").collect()}
    # uniform: skew 0, excess kurtosis -1.2 -> JB = n/6 * (1.2^2/4) = 60
    assert out["unif"]["skewness"] == pytest.approx(0.0, abs=1e-6)
    assert out["unif"]["kurtosis_excess"] == pytest.approx(-1.2, abs=0.01)
    assert out["unif"]["jb"] == pytest.approx(60.0, rel=0.02)
    # the spike is wildly non-normal
    assert out["spike"]["jb"] > 1000
    # n<8 refuses
    assert out["tiny"]["jb"] is None


# ----------------------------------------------------------- brown_forsythe
def test_brown_forsythe_detects_variance_difference(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import brown_forsythe

    same = [("a", float(i % 10)) for i in range(200)]
    same += [("b", float((i + 3) % 10)) for i in range(200)]
    df_same = spark.createDataFrame(same, "g string, v double")
    r_same = brown_forsythe(df_same, "v", "g").collect()[0]
    assert r_same["f_stat"] < 2.0  # identical spreads -> small F

    diff = [("a", float(i % 10)) for i in range(200)]
    diff += [("b", float((i % 10) * 20)) for i in range(200)]
    df_diff = spark.createDataFrame(diff, "g string, v double")
    r_diff = brown_forsythe(df_diff, "v", "g").collect()[0]
    assert r_diff["f_stat"] > 100
    assert r_diff["k"] == 2 and r_diff["df1"] == 1 and r_diff["df2"] == 398


# ------------------------------------------------------------ funnel_latency
def test_funnel_latency_exact(spark):
    from swivel_spark_prep_spark.operators.timeseries import funnel_latency

    rows = [
        (1, "a", "2024-01-01 00:00:00"),   # converts in 100s
        (1, "b", "2024-01-01 00:01:40"),
        (2, "a", "2024-01-01 00:00:00"),   # converts in 200s (first b AFTER a)
        (2, "b", "2024-01-01 00:03:20"),
        (2, "b", "2024-01-01 00:10:00"),   # later b ignored (min)
        (3, "b", "2024-01-01 00:00:00"),   # b BEFORE its a -> not converted
        (3, "a", "2024-01-01 00:05:00"),
        (4, "a", "2024-01-01 00:00:00"),   # never converts
    ]
    df = spark.createDataFrame(rows, "u long, step string, raw string").select(
        "u", "step", F.to_timestamp("raw").alias("ts")
    )
    r = funnel_latency(df, "ts", "u", "step", "a", "b",
                       quantiles=(0.5,)).collect()[0]
    assert r["n_started"] == 4 and r["n_converted"] == 2
    assert r["lat_p50"] == pytest.approx(150.0, abs=1e-6)  # median of 100, 200


# ------------------------------------------------------------ chi2_residuals
def test_chi2_residuals_planted_association(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import chi2_residuals

    rows = [("x", "1")] * 80 + [("x", "2")] * 20
    rows += [("y", "1")] * 20 + [("y", "2")] * 80
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r["a"], r["b"]): r for r in chi2_residuals(df, "a", "b").collect()}
    # diagonal cells over-represented, off-diagonal under — symmetric
    assert out[("x", "1")]["std_residual"] > 2
    assert out[("x", "2")]["std_residual"] < -2
    assert out[("x", "1")]["std_residual"] == pytest.approx(
        -out[("x", "2")]["std_residual"], abs=1e-6
    )
    assert out[("x", "1")]["expected"] == pytest.approx(50.0, abs=1e-6)


def test_chi2_residuals_independent_are_small(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import chi2_residuals

    rows = [(a, b) for a in "xy" for b in "12" for _ in range(50)]
    df = spark.createDataFrame(rows, "a string, b string")
    for r in chi2_residuals(df, "a", "b").collect():
        assert abs(r["std_residual"]) < 1e-9


# --------------------------------------------------------------- lorenz_curve
def test_lorenz_uniform_is_diagonal_and_concentrated_bows(spark):
    from swivel_spark_prep_spark.operators.quality import lorenz_curve

    # 100 keys each holding value 1 -> Lorenz = diagonal
    uni = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "k long, v double"
    )
    pts = {r["p"]: r["cum_value_share"] for r in lorenz_curve(uni, "k", "v").collect()}
    for p, s in pts.items():
        assert s == pytest.approx(p, abs=1e-6)
    # one key holds everything -> curve is 0 until the last point
    conc = spark.createDataFrame(
        [(i, 0.000001 if i else 1000.0) for i in range(100)], "k long, v double"
    )
    pts2 = {r["p"]: r["cum_value_share"] for r in lorenz_curve(conc, "k", "v").collect()}
    assert pts2[0.5] < 0.001 and pts2[1.0] == pytest.approx(1.0, abs=1e-6)
    with pytest.raises(ValueError):
        lorenz_curve(uni, "k", "v", points=1)


# ------------------------------------------------------ stream_rolling_actives
def test_stream_rolling_actives_matches_batch_tail(spark, tmp_path):
    """Final snapshot must equal the batch coverage-island operator on
    the full history, restricted to the live tail (window_end within W
    of the newest day) — including keys whose activity arrived in
    earlier micro-batches and days old enough to have crossed the 2W
    eviction horizon mid-stream."""
    import glob
    import shutil

    from swivel_spark_prep_spark.operators.timeseries import (
        rolling_active_counts,
    )
    from swivel_spark_prep_spark.streaming import stream_rolling_actives

    full = spark.range(0, 1200).select(
        (F.col("id") % 37).alias("k"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-03-"),
                F.lpad(((F.col("id") * 7) % 20 + 1).cast("string"), 2, "0"),
                F.lit(" 12:00:00"),
            )
        ).alias("ts"),
        F.col("id"),
    )
    stage, drops = tmp_path / "stage", tmp_path / "drops"
    drops.mkdir()
    for i in range(3):
        part = full.filter(F.col("id") % 3 == i).select("k", "ts")
        part.coalesce(1).write.parquet(str(stage / f"b{i}"))
        f = glob.glob(str(stage / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(drops / f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drops))
    )
    q = stream_rolling_actives(
        stream, "k", "ts",
        str(tmp_path / "state"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        window_days=7,
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
        str(r.window_end): r.n_active
        for r in spark.read.parquet(
            str(tmp_path / "out" / f"batch_id={last}")
        ).collect()
    }
    batch_full = rolling_active_counts(full, "k", "ts", window_days=7)
    m = "2024-03-20"
    want = {
        str(r.window_end): r.n_active
        for r in batch_full.filter(
            F.col("window_end") > F.date_sub(F.lit(m).cast("date"), 7)
        ).collect()
    }
    assert got == want and len(got) >= 7
    # state is day-horizon bounded: pairs only within 2W of the max day
    state = spark.read.parquet(
        str(tmp_path / "state" / "pairs" / f"batch_id={last}")
    )
    assert state.agg(F.min("d")).collect()[0][0] >= __import__(
        "datetime"
    ).date(2024, 3, 7)


# -------------------------------------------------------- partial_correlation
def test_partial_correlation_removes_confounder(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        partial_correlation,
    )

    # x and y are both driven by z plus independent deterministic
    # noise: raw r_xy is strongly positive, partialling z removes it
    rows = []
    for i in range(500):
        z = (i % 100) / 10.0
        nx = ((i * 7919) % 97) / 97.0 - 0.5
        ny = ((i * 6271) % 89) / 89.0 - 0.5
        rows.append((z + nx, z + ny, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = partial_correlation(df, "x", "y", "z").collect()[0]
    assert r["r_xy"] > 0.9
    assert abs(r["r_xy_given_z"]) < 0.15
    # perfectly collinear conditioning -> NULL
    df2 = spark.createDataFrame(
        [(float(i), float(2 * i), float(i)) for i in range(50)],
        "x double, y double, z double",
    )
    assert partial_correlation(df2, "x", "y", "z").collect()[0][
        "r_xy_given_z"
    ] is None


# ----------------------------------------------------------- topk_coverage
def test_topk_coverage_exact_on_planted_zipf(spark):
    from swivel_spark_prep_spark.operators.textstats import topk_coverage

    # 'a' x 60, 'b' x 30, then 20 singletons -> top-1 covers 60/110,
    # top-2 covers 90/110, top-100 covers everything
    text = " ".join(["a"] * 60 + ["b"] * 30 + [f"s{i}" for i in range(20)])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r["k"]: r for r in topk_coverage(df, ks=(1, 2, 100)).collect()}
    assert out[1]["coverage"] == pytest.approx(60 / 110, abs=1e-6)
    assert out[2]["coverage"] == pytest.approx(90 / 110, abs=1e-6)
    assert out[100]["coverage"] == 1.0 and out[100]["types"] == 22
    assert [out[k]["coverage"] for k in (1, 2, 100)] == sorted(
        out[k]["coverage"] for k in (1, 2, 100)
    )
    with pytest.raises(ValueError):
        topk_coverage(df, ks=(0,))


# --------------------------------------------------- effective_sample_size
def test_ess_uniform_vs_concentrated(spark):
    from swivel_spark_prep_spark.operators.sampling import (
        effective_sample_size,
    )

    rows = [("uni", 1.0)] * 100
    rows += [("conc", 1000.0)] + [("conc", 0.001)] * 99
    rows += [("mixed", 0.0), ("mixed", None), ("mixed", 2.0), ("mixed", 2.0)]
    df = spark.createDataFrame(rows, "g string, w double")
    out = {r["g"]: r for r in effective_sample_size(df, "w", "g").collect()}
    assert out["uni"]["ess"] == pytest.approx(100.0, abs=1e-6)
    assert out["uni"]["ess_ratio"] == pytest.approx(1.0, abs=1e-6)
    # one dominant weight -> ESS collapses toward 1
    assert out["conc"]["ess"] < 1.01
    # zero/NULL weights excluded and counted
    assert out["mixed"]["n"] == 2 and out["mixed"]["n_excluded"] == 2
    assert out["mixed"]["ess"] == pytest.approx(2.0, abs=1e-6)


# ---------------------------------------------------------------- icc_2_1
def test_icc_perfect_and_shifted_agreement(spark):
    from swivel_spark_prep_spark.operators.labeling import icc_2_1

    # identical raters -> ICC(2,1) = 1
    rows = [(i, r, float(i % 17)) for i in range(40) for r in ("a", "b", "c")]
    df = spark.createDataFrame(rows, "i long, r string, x double")
    perfect = icc_2_1(df, "i", "r", "x").collect()[0]
    assert perfect["icc2_1"] == pytest.approx(1.0, abs=1e-9)
    # a constant rater offset is ABSOLUTE disagreement: ICC(2,1) drops
    rows2 = [
        (i, r, float(i % 17) + {"a": 0.0, "b": 8.0, "c": 16.0}[r])
        for i in range(40)
        for r in ("a", "b", "c")
    ]
    df2 = spark.createDataFrame(rows2, "i long, r string, x double")
    shifted = icc_2_1(df2, "i", "r", "x").collect()[0]
    assert shifted["icc2_1"] < 0.5
    # ragged matrix refuses
    with pytest.raises(ValueError):
        icc_2_1(df.filter("NOT (i = 0 AND r = 'a')"), "i", "r", "x")


# ------------------------------------------------- near_dup_threshold_sweep
def test_threshold_sweep_monotone_and_matches_single(spark, sf_dir):
    from swivel_spark_prep_spark.operators.dedup import (
        minhash_near_dups,
        near_dup_threshold_sweep,
    )

    docs = __import__(
        "swivel_spark_prep_spark.catalog", fromlist=["x"]
    ).load_table(spark, sf_dir, "documents")
    rows = near_dup_threshold_sweep(docs).orderBy("threshold").collect()
    pairs = [r["n_pairs"] for r in rows]
    dcs = [r["n_docs"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert dcs == sorted(dcs, reverse=True)
    # the 0.8 grid point must equal the single-threshold operator
    single = minhash_near_dups(docs, jaccard_threshold=0.8).count()
    assert rows[0]["n_pairs"] == single
    with pytest.raises(ValueError):
        near_dup_threshold_sweep(docs, thresholds=(0.5,))


# ---------------------------------------------------------------- vocab_churn
def test_vocab_churn_planted(spark):
    from swivel_spark_prep_spark.operators.textstats import vocab_churn

    a = spark.createDataFrame(
        [(1, "shared shared alpha alpha alpha")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "shared beta")], "doc_id long, text string"
    )
    r = vocab_churn(a, b).collect()[0]
    assert r["types_a"] == 2 and r["types_b"] == 2 and r["types_both"] == 1
    assert r["types_only_a"] == 1 and r["types_only_b"] == 1
    assert r["mass_only_a"] == pytest.approx(3 / 5, abs=1e-6)  # alpha x3 of 5
    assert r["mass_only_b"] == pytest.approx(1 / 2, abs=1e-6)
    assert r["type_jaccard"] == pytest.approx(1 / 3, abs=1e-6)


# -------------------------------------------------------------- circular_stats
def test_circular_stats_wraps_midnight(spark):
    from swivel_spark_prep_spark.operators.timeseries import circular_stats

    # events at 23:00 and 01:00: circular mean is midnight (0h or 24h),
    # never noon; concentration high
    rows = [("w", f"2024-01-0{d} 23:00:00") for d in range(1, 6)]
    rows += [("w", f"2024-01-0{d} 01:00:00") for d in range(1, 6)]
    rows += [("u", f"2024-01-01 {h:02d}:00:00") for h in range(24)]
    df = spark.createDataFrame(rows, "g string, raw string").select(
        "g", F.to_timestamp("raw").alias("ts")
    )
    out = {r["g"]: r for r in circular_stats(df, "ts", "g").collect()}
    wrap = out["w"]["mean_hour"]
    assert min(wrap, 24 - wrap) < 0.01
    assert out["w"]["resultant"] > 0.9
    # 24 evenly spaced hours: resultant ~ 0, Rayleigh accepts uniformity
    assert out["u"]["resultant"] < 1e-6 and out["u"]["rayleigh_z"] < 0.01


# ------------------------------------------------------- ks_uniform_time_of_day
def test_ks_uniform_detects_clustering(spark):
    from swivel_spark_prep_spark.operators.timeseries import (
        ks_uniform_time_of_day,
    )

    # uniform minutes over the day vs everything in one hour
    rows = [("u", f"2024-01-01 {(i * 7) % 24:02d}:{(i * 13) % 60:02d}:00")
            for i in range(200)]
    rows += [("c", f"2024-01-01 09:{i % 60:02d}:{(i * 7) % 60:02d}")
             for i in range(200)]
    df = spark.createDataFrame(rows, "g string, raw string").select(
        "g", F.to_timestamp("raw").alias("ts")
    )
    out = {r["g"]: r for r in ks_uniform_time_of_day(df, "ts", "g").collect()}
    assert out["u"]["sqrt_n_d"] < 1.36    # accept uniformity
    assert out["c"]["sqrt_n_d"] > 5.0     # reject hard
    # all mass inside one hour starting 09:00 -> CDF gap ~ 1 - 10/24 ≈ 0.58
    assert out["c"]["d_stat"] > 0.55


# ----------------------------------------------------------- geometric_median
def test_geometric_median_outlier_robust(spark):
    from swivel_spark_prep_spark.operators.similarity import geometric_median

    # 99 vectors near (1, 0) + one huge outlier at (1e6, 1e6): the mean
    # is dragged to ~(10001, 10000); the geometric median stays near (1, 0)
    rows = [([1.0 + (i % 10) * 0.01, (i % 7) * 0.01],) for i in range(99)]
    rows.append(([1e6, 1e6],))
    df = spark.createDataFrame(rows, "embedding array<double>")
    c = geometric_median(df, "embedding", iterations=8)
    assert abs(c[0] - 1.0) < 0.2 and abs(c[1]) < 0.2
    # fixed point: re-running from the answer stays put
    with pytest.raises(ValueError):
        geometric_median(df, "embedding", iterations=0)


def test_geometric_median_matches_numpy_weiszfeld(spark):
    import numpy as np

    from swivel_spark_prep_spark.operators.similarity import geometric_median

    rng_free = [( [float((i * 13) % 7), float((i * 5) % 11)] ,) for i in range(40)]
    df = spark.createDataFrame(rng_free, "embedding array<double>")
    got = np.array(geometric_median(df, "embedding", iterations=5))
    x = np.array([r[0] for r in rng_free])
    c = x.mean(axis=0)
    for _ in range(5):
        d = np.maximum(np.linalg.norm(x - c, axis=1), 1e-9)
        c = (x / d[:, None]).sum(axis=0) / (1.0 / d).sum()
    assert np.allclose(got, c, atol=1e-9)


# -------------------------------------------------------- precision_coverage
def test_precision_coverage_tradeoff(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        precision_coverage,
    )

    # scores 1..100; positives are exactly the top 30 scores
    rows = [(float(i), i > 70) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = {r["threshold"]: r for r in precision_coverage(
        df, "s", "y", [0.0, 50.0, 71.0, 101.0]).collect()}
    assert out[0.0]["coverage"] == 1.0 and out[0.0]["precision"] == 0.3
    assert out[50.0]["coverage"] == pytest.approx(0.51)
    assert out[71.0]["precision"] == 1.0 and out[71.0]["n_covered"] == 30
    assert out[101.0]["n_covered"] == 0 and out[101.0]["precision"] is None


# ----------------------------------------------------------- dispersion_index
def test_dispersion_poisson_vs_bursty(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import dispersion_index

    # near-constant counts (underdispersed) vs bursty (overdispersed)
    rows = [("reg", float(5 + (i % 2))) for i in range(200)]
    rows += [("burst", 0.0)] * 180 + [("burst", 50.0)] * 20
    df = spark.createDataFrame(rows, "g string, c double")
    out = {r["g"]: r for r in dispersion_index(df, "c", "g").collect()}
    assert out["reg"]["var_mean_ratio"] < 0.1
    assert out["burst"]["var_mean_ratio"] > 5.0


# --------------------------------------------------------- james_stein_means
def test_james_stein_shrinks_small_groups_more(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import james_stein_means

    rows = []
    # two big groups define real between-group spread; a 3-row outlier
    # group must be pulled toward the grand mean harder than big groups
    for i in range(300):
        rows.append(("big_lo", 10.0 + (i % 7)))
        rows.append(("big_hi", 30.0 + (i % 7)))
    rows += [("tiny", 90.0), ("tiny", 95.0), ("tiny", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in james_stein_means(df, "v", "g").collect()}
    assert out["tiny"]["shrinkage"] > out["big_lo"]["shrinkage"]
    # shrunk mean moves toward the grand mean, never past it
    gm = (300 * out["big_lo"]["mean_raw"] + 300 * out["big_hi"]["mean_raw"]
          + 3 * out["tiny"]["mean_raw"]) / 603
    assert gm < out["tiny"]["mean_shrunk"] < out["tiny"]["mean_raw"]
    # big groups barely move
    assert abs(out["big_lo"]["mean_shrunk"] - out["big_lo"]["mean_raw"]) < 0.5


def test_james_stein_collapses_when_no_real_spread(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import james_stein_means

    # identical distributions per group: tau2 clamps to 0 -> shrinkage 1
    rows = [(f"g{i % 5}", float((i * 13) % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = james_stein_means(df, "v", "g").collect()
    for r in out:
        assert r["shrinkage"] > 0.8


# ------------------------------------------------------------ topk_rank_movers
def test_rank_movers_planted(spark):
    from swivel_spark_prep_spark.operators.textstats import topk_rank_movers

    a = spark.createDataFrame(
        [(1, "x x x y y z w")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "y y y x x q")], "doc_id long, text string"
    )
    rows = topk_rank_movers(a, b, k=3).collect()
    by_term = {r["term"]: r for r in rows}
    # x: rank 1 -> 2 (delta -1); y: 2 -> 1 (delta +1)
    assert by_term["x"]["delta"] == -1 and by_term["y"]["delta"] == 1
    assert by_term["q"]["status"] == "entered" and by_term["q"]["rank_a"] is None
    # ties at count 1 break alphabetically: 'w' (not 'z') takes A's rank 3
    assert by_term["w"]["status"] == "exited" and "z" not in by_term
    with pytest.raises(ValueError):
        topk_rank_movers(a, b, k=0)


# --------------------------------------------------------- split_leakage_audit
def test_split_leakage_detects_cross_split_twins(spark):
    from swivel_spark_prep_spark.operators.contamination import (
        split_leakage_audit,
    )
    from swivel_spark_prep_spark.operators.sampling import hash_bucket

    base = ("the quick brown fox jumps over the lazy dog near the old river "
            "bank today with extra words")
    # find two ids that land on OPPOSITE sides of the 80/20 md5 split,
    # then give them identical text — guaranteed cross-split exact dup
    probe = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    ).select("doc_id", (hash_bucket(F.col("doc_id"), 1_000_000) < 800_000)
             .alias("tr")).collect()
    train_id = next(r.doc_id for r in probe if r.tr)
    test_id = next(r.doc_id for r in probe if not r.tr)
    rows = [(train_id, base), (test_id, base)]
    free = [i for i in range(100, 140)]
    for j, i in enumerate(free):
        rows.append((i, f"unique doc {i} " + " ".join(
            f"u{i}w{k}" for k in range(15))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = split_leakage_audit(docs).collect()[0]
    assert r["exact_cross_digests"] == 1 and r["exact_cross_docs"] == 2
    # the identical pair is also a near-dup pair across the split
    assert r["neardup_cross_pairs"] >= 1
    assert r["n_train"] + r["n_test"] == len(rows)
    with pytest.raises(ValueError):
        split_leakage_audit(docs, train_frac=1.0)


def test_split_leakage_clean_after_dedup_then_split(spark):
    from swivel_spark_prep_spark.operators.contamination import (
        split_leakage_audit,
    )

    rows = [(i, f"distinct doc {i} " + " ".join(f"d{i}w{k}" for k in range(15)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = split_leakage_audit(docs).collect()[0]
    assert r["exact_cross_docs"] == 0 and r["neardup_cross_pairs"] == 0
