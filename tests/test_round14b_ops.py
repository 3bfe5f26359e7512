"""Round-14 tranche property pins (X342–X365): classical-test
completeness, corpus diagnostics, and scale-engineering audits. Each
operator's SURVEY row names these pins; the DuckDB oracle parity for
the same queries runs automatically in tests/test_llm_operators.py at
both SFs."""
import datetime
import math

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------ periodogram
def test_periodogram_finds_planted_daily_cycle(spark):
    from swivel_spark_prep_spark.operators.timeseries import periodogram

    b = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t in range(240):  # 10 days of hourly buckets
        n = 10 + round(5 * math.cos(2 * math.pi * t / 24))
        for _ in range(n):
            rows.append((b + datetime.timedelta(hours=t, minutes=1), eid))
            eid += 1
    df = spark.createDataFrame(rows, "ts timestamp, id long")
    out = {
        r["period_hours"]: r["power"]
        for r in periodogram(df, "ts", (24.0, 12.0, 6.0, 5.0)).collect()
    }
    # the planted 24 h harmonic dwarfs every other probe
    assert out[24.0] > 50 * max(out[12.0], out[6.0], out[5.0])
    with pytest.raises(ValueError):
        periodogram(df, "ts", ())
    with pytest.raises(ValueError):
        periodogram(df, "ts", (24.0, -1.0))


# -------------------------------------------------------- kaplan_meier_ci
def test_km_greenwood_hand_computed(spark):
    from swivel_spark_prep_spark.operators.timeseries import (
        kaplan_meier,
        kaplan_meier_ci,
    )

    rows = [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 1)]
    df = spark.createDataFrame(rows, "t double, e int")
    out = {r["duration"]: r for r in kaplan_meier_ci(df, "t", "e").collect()}
    # t=1: n=4, d=1 -> S=.75, gw=1/12, se=.75*sqrt(1/12)
    assert out[1.0]["survival"] == 0.75
    assert abs(out[1.0]["se"] - 0.75 * math.sqrt(1 / 12)) < 1e-6
    # t=2: n=3, d=1 -> S=.5, gw=1/12+1/6=.25, se=.5*.5=.25
    assert out[2.0]["survival"] == 0.5 and out[2.0]["se"] == 0.25
    assert out[2.0]["lo"] == round(0.5 - 1.959964 * 0.25, 6)
    assert out[2.0]["hi"] == round(0.5 + 1.959964 * 0.25, 6)
    # t=4: last subject fails -> exact 0, variance undefined
    assert out[4.0]["survival"] == 0.0
    assert out[4.0]["se"] is None and out[4.0]["lo"] is None
    # the survival column IS kaplan_meier's (same machinery)
    km = {r["duration"]: r["survival"] for r in kaplan_meier(df, "t", "e").collect()}
    assert {d: r["survival"] for d, r in out.items()} == km


# ---------------------------------------------------------- bartlett_test
def test_bartlett_matches_closed_form(spark):
    import numpy as np

    from swivel_spark_prep_spark.operators.evalmetrics import bartlett_test

    ga = [float(x % 5) for x in range(40)]          # var ~2
    gb = [float(3 * (x % 5)) for x in range(60)]    # var ~18
    df = spark.createDataFrame(
        [("a", v) for v in ga] + [("b", v) for v in gb],
        "g string, x double",
    )
    r = bartlett_test(df, "x", "g").collect()[0]
    va, vb = np.var(ga, ddof=1), np.var(gb, ddof=1)
    n1, n2 = len(ga), len(gb)
    nn, k = n1 + n2, 2
    sp2 = ((n1 - 1) * va + (n2 - 1) * vb) / (nn - k)
    num = (nn - k) * math.log(sp2) - (
        (n1 - 1) * math.log(va) + (n2 - 1) * math.log(vb)
    )
    c = 1 + (1 / (n1 - 1) + 1 / (n2 - 1) - 1 / (nn - k)) / (3 * (k - 1))
    assert abs(r["chi2"] - num / c) < 1e-6
    assert r["k"] == 2 and r["n"] == 100 and r["df"] == 1
    # equal variances -> chi2 ~ 0
    df2 = spark.createDataFrame(
        [("a", float(x % 5)) for x in range(40)]
        + [("b", float(x % 5)) for x in range(40)],
        "g string, x double",
    )
    assert abs(bartlett_test(df2, "x", "g").collect()[0]["chi2"]) < 1e-9
    # single-row and constant groups are excluded from k
    df3 = spark.createDataFrame(
        [("a", float(x % 5)) for x in range(40)]
        + [("c", 7.0)] * 10 + [("d", 1.0)],
        "g string, x double",
    )
    assert bartlett_test(df3, "x", "g").collect()[0]["k"] == 1


# ------------------------------------------------------- mood_median_test
def test_mood_median_hand_computed(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import mood_median_test

    # g1 entirely below / g2 entirely above the grand median:
    # a1=0, a2=10, E=5 each -> chi2 = 4 * 25/5 = 20
    df = spark.createDataFrame(
        [("g1", float(i)) for i in range(1, 11)]
        + [("g2", float(i)) for i in range(11, 21)],
        "g string, x double",
    )
    r = mood_median_test(df, "x", "g").collect()[0]
    assert r["chi2"] == 20.0 and r["df"] == 1 and r["n"] == 20
    assert r["grand_median"] == 10.5
    # identical groups -> chi2 == 0
    df2 = spark.createDataFrame(
        [("g1", float(i)) for i in range(10)]
        + [("g2", float(i)) for i in range(10)],
        "g string, x double",
    )
    assert mood_median_test(df2, "x", "g").collect()[0]["chi2"] == 0.0


# --------------------------------------------------- ordinal_association
def test_ordinal_association_extremes_and_brute_force(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        ordinal_association,
    )

    # perfect concordance -> gamma = somers = 1, tau_b = 1
    perf = spark.createDataFrame(
        [(c, c) for c in (1, 2, 3) for _ in range(5)], "a int, b int"
    )
    r = ordinal_association(perf, "a", "b").collect()[0]
    assert r["gamma"] == 1.0 and r["somers_d_ba"] == 1.0 and r["tau_b"] == 1.0
    # perfect discordance -> -1
    disc = spark.createDataFrame(
        [(c, 4 - c) for c in (1, 2, 3) for _ in range(5)], "a int, b int"
    )
    assert ordinal_association(disc, "a", "b").collect()[0]["gamma"] == -1.0
    # brute-force parity on a mixed table
    rows = [(i % 3 + 1, (i * 7 + i // 4) % 3 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = ordinal_association(df, "a", "b").collect()[0]
    C = D = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            da = rows[i][0] - rows[j][0]
            db = rows[i][1] - rows[j][1]
            if da * db > 0:
                C += 1
            elif da * db < 0:
                D += 1
    assert got["concordant"] == C and got["discordant"] == D
    n = len(rows)
    n0 = n * (n - 1) / 2
    from collections import Counter

    ta = sum(v * (v - 1) / 2 for v in Counter(a for a, _ in rows).values())
    tb = sum(v * (v - 1) / 2 for v in Counter(b for _, b in rows).values())
    assert abs(got["gamma"] - (C - D) / (C + D)) < 1e-6
    assert abs(got["somers_d_ba"] - (C - D) / (n0 - ta)) < 1e-6
    assert abs(got["tau_b"] - (C - D) / math.sqrt((n0 - ta) * (n0 - tb))) < 1e-6


# -------------------------------------------------------------------- vif3
def test_vif_flags_planted_collinearity(spark):
    import numpy as np

    from swivel_spark_prep_spark.operators.evalmetrics import vif3

    rng = [(float(i % 13), float((i * 7) % 11)) for i in range(200)]
    rows = [(x1, x2, x1 + x2 + 0.01 * ((i * 3) % 5)) for i, (x1, x2) in enumerate(rng)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double")
    r = vif3(df, "x1", "x2", "x3").collect()[0]
    assert r["vif3"] > 50  # x3 is (almost) x1 + x2
    # numpy cross-check: VIF3 = 1/(1 - R2 of x3 ~ x1 + x2)
    a = np.array(rows)
    X = np.column_stack([np.ones(len(a)), a[:, 0], a[:, 1]])
    beta, *_ = np.linalg.lstsq(X, a[:, 2], rcond=None)
    resid = a[:, 2] - X @ beta
    r2 = 1 - resid.var() / a[:, 2].var()
    assert abs(r["vif3"] - 1 / (1 - r2)) / r["vif3"] < 1e-3
    # near-orthogonal features -> VIFs ~ 1
    ortho = spark.createDataFrame(
        [(float(i % 7), float((i * 5) % 13), float((i * 11) % 17))
         for i in range(300)],
        "x1 double, x2 double, x3 double",
    )
    ro = vif3(ortho, "x1", "x2", "x3").collect()[0]
    assert 0.9 < ro["vif1"] < 1.2 and 0.9 < ro["vif3"] < 1.2


# ------------------------------------------------------ missingness_audit
def test_missingness_audit_recovers_structure(spark):
    from swivel_spark_prep_spark.operators.quality import missingness_audit

    # u,v null in lockstep on rows 0-9; w null on rows 5-14 (half overlap)
    rows = []
    for i in range(40):
        u = None if i < 10 else float(i)
        v = None if i < 10 else float(i * 2)
        w = None if 5 <= i < 15 else float(i * 3)
        rows.append((u, v, w))
    df = spark.createDataFrame(rows, "u double, v double, w double")
    out = {(r["col_a"], r["col_b"]): r for r in missingness_audit(df, ["u", "v", "w"]).collect()}
    uv = out[("u", "v")]
    assert uv["both_null"] == 10 and uv["null_jaccard"] == 1.0
    uw = out[("u", "w")]
    assert uw["both_null"] == 5 and abs(uw["null_jaccard"] - 5 / 15) < 1e-6
    assert all(r["n_rows"] == 40 for r in out.values())
    with pytest.raises(ValueError):
        missingness_audit(df, ["u"])
    with pytest.raises(ValueError):
        missingness_audit(df, ["u", "u"])


# --------------------------------------------- cross_source_ngram_overlap
def test_ngram_overlap_hand_corpus(spark):
    from swivel_spark_prep_spark.operators.textstats import (
        cross_source_ngram_overlap,
    )

    docs = spark.createDataFrame(
        [(1, "a b c", "A"), (2, "b c d", "B"), (3, "x y z", "C")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in cross_source_ngram_overlap(docs, 2).collect()}
    assert out["A"]["n_grams"] == 2 and out["A"]["shared_grams"] == 1
    assert out["A"]["overlap_ratio"] == 0.5
    assert out["B"]["overlap_ratio"] == 0.5
    assert out["C"]["shared_grams"] == 0 and out["C"]["overlap_ratio"] == 0.0
    # unigram mode: shared vocabulary
    uni = {r["source"]: r for r in cross_source_ngram_overlap(docs, 1).collect()}
    assert uni["A"]["n_grams"] == 3 and uni["A"]["shared_grams"] == 2  # b, c
    with pytest.raises(ValueError):
        cross_source_ngram_overlap(docs, 0)


# --------------------------------------------------- dunning_llr_collocations
def test_dunning_llr_brute_force_and_ranking(spark):
    from swivel_spark_prep_spark.operators.lm import dunning_llr_collocations

    # "strong collocation" appears often and exclusively; filler words
    # co-occur by chance
    texts = ["strong collocation filler one", "strong collocation filler two",
             "strong collocation three filler", "one two three filler"] * 5
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    out = dunning_llr_collocations(docs, k=5).collect()
    assert (out[0]["w1"], out[0]["w2"]) == ("strong", "collocation")
    # brute-force G2 replay of the top row
    from collections import Counter

    bigrams = Counter()
    for t in texts:
        w = t.split(" ")
        for i in range(len(w) - 1):
            bigrams[(w[i], w[i + 1])] += 1
    N = sum(bigrams.values())
    c1 = sum(c for (a, _), c in bigrams.items() if a == "strong")
    c2 = sum(c for (_, b), c in bigrams.items() if b == "collocation")
    k11 = bigrams[("strong", "collocation")]

    def term(o, e):
        return o * math.log(o / e) if o > 0 else 0.0

    g2 = 2 * (
        term(k11, c1 * c2 / N)
        + term(c1 - k11, c1 * (N - c2) / N)
        + term(c2 - k11, (N - c1) * c2 / N)
        + term(N - c1 - c2 + k11, (N - c1) * (N - c2) / N)
    )
    assert abs(out[0]["g2"] - g2) < 1e-5
    with pytest.raises(ValueError):
        dunning_llr_collocations(docs, k=0)


# ------------------------------------------------- obrien_fleming_monitor
def test_obf_bounds_and_conservatism(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        obrien_fleming_monitor,
        pocock_monitor,
    )

    b = datetime.datetime(2024, 4, 1)
    rows = []
    for i in range(500):
        ts = b + datetime.timedelta(minutes=i)
        arm = "a" if i % 2 == 0 else "b"
        val = 10.0 + (i % 7) + (1.2 if arm == "a" else 0.0)
        rows.append((ts, i, arm, val))
    df = spark.createDataFrame(rows, "ts timestamp, id long, arm string, x double")
    out = obrien_fleming_monitor(
        df, "ts", "arm", "x", "a", "b", looks=5, tiebreak_col="id"
    ).orderBy("look").collect()
    # the decaying boundary, exactly
    for r in out:
        assert r["obf_bound"] == round(2.04 * math.sqrt(5 / r["look"]), 6)
    assert out[0]["obf_bound"] > 4.5 and out[-1]["obf_bound"] == 2.04
    # same z path as pocock (shared machinery)
    poc = pocock_monitor(
        df, "ts", "arm", "x", "a", "b", looks=5, tiebreak_col="id"
    ).orderBy("look").collect()
    assert [r["z"] for r in out] == [r["z"] for r in poc]
    # a moderate effect: pocock (flat 2.413) calls it no later than OBF
    pfirst = poc[0]["first_crossed_look"]
    ofirst = out[0]["first_crossed_look"]
    if pfirst is not None and ofirst is not None:
        assert pfirst <= ofirst
    # null arms never cross the OBF boundary either
    null = [(b + datetime.timedelta(minutes=i), i,
             "a" if i % 2 == 0 else "b", 10.0 + (i % 7)) for i in range(500)]
    nout = obrien_fleming_monitor(
        spark.createDataFrame(null, "ts timestamp, id long, arm string, x double"),
        "ts", "arm", "x", "a", "b", looks=5, tiebreak_col="id",
    ).collect()
    assert all(not r["crossed"] for r in nout)


# ---------------------------------------------------------------- theils_u
def test_theils_u_determined_vs_independent(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import theils_u

    # b = f(a): knowing a removes ALL of b's entropy -> U = 1
    det = spark.createDataFrame(
        [(a, a * 10) for a in (1, 2, 3) for _ in range(7)], "a int, b int"
    )
    assert theils_u(det, "a", "b").collect()[0]["u_b_a"] == 1.0
    # independent uniform grid -> U = 0 exactly (cells = margins product)
    ind = spark.createDataFrame(
        [(a, b) for a in (1, 2) for b in (1, 2, 3) for _ in range(5)],
        "a int, b int",
    )
    assert theils_u(ind, "a", "b").collect()[0]["u_b_a"] == 0.0
    # constant b -> H(b)=0 -> NULL, not 1
    const = spark.createDataFrame([(a, 9) for a in (1, 2, 3)], "a int, b int")
    assert theils_u(const, "a", "b").collect()[0]["u_b_a"] is None


# --------------------------------------------------------------- coherence
def test_coherence_phase_locked_streams(spark):
    from swivel_spark_prep_spark.operators.timeseries import coherence

    b = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t in range(240):
        nx = 8 + round(4 * math.cos(2 * math.pi * t / 24))
        # y: same 24h cycle shifted 12h (anti-phase) — a FIXED phase
        # relation, which is exactly what coherence = 1 means
        ny = 8 + round(4 * math.cos(2 * math.pi * (t + 12) / 24))
        for _ in range(nx):
            rows.append((b + datetime.timedelta(hours=t), eid, "x")); eid += 1
        for _ in range(ny):
            rows.append((b + datetime.timedelta(hours=t), eid, "y")); eid += 1
    df = spark.createDataFrame(rows, "ts timestamp, id long, et string")
    out = {r["period_hours"]: r for r in
           coherence(df, "ts", "et", "x", "y", (24.0, 5.0)).collect()}
    assert out[24.0]["coherence"] > 0.99
    assert out[24.0]["power_x"] > 100 * max(out[5.0]["power_x"], 1e-9)
    with pytest.raises(ValueError):
        coherence(df, "ts", "et", "x", "y", ())


# ------------------------------------------------------- markov_stationary
def test_markov_stationary_hand_chains(spark):
    from swivel_spark_prep_spark.operators.timeseries import markov_stationary

    b = datetime.datetime(2024, 1, 1)
    # alternating a,b,a,b,... : P(a->b)=P(b->a)=1, pi=(.5,.5), H rate 0
    rows = [(1, b + datetime.timedelta(minutes=i), i,
             "a" if i % 2 == 0 else "b") for i in range(21)]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long, et string")
    out = {r["state"]: r for r in
           markov_stationary(df, "u", "ts", "et", tiebreak_col="id").collect()}
    assert out["a"]["stationary_prob"] == 0.5
    assert out["b"]["stationary_prob"] == 0.5
    assert out["a"]["row_entropy"] == 0.0 and out["a"]["entropy_rate"] == 0.0
    # absorbing state: a -> b, b never leaves -> pi(b) ~ 1
    rows2 = [(1, b, 0, "a"), (1, b + datetime.timedelta(minutes=1), 1, "b")]
    out2 = {r["state"]: r for r in
            markov_stationary(
                spark.createDataFrame(
                    rows2, "u long, ts timestamp, id long, et string"
                ), "u", "ts", "et", tiebreak_col="id").collect()}
    assert out2["b"]["stationary_prob"] > 0.999
    assert out2["a"]["stationary_prob"] < 1e-3
    with pytest.raises(ValueError):
        markov_stationary(df, "u", "ts", "et", iters=0)
    # empty input -> empty relation, not a crash
    empty = spark.createDataFrame([], "u long, ts timestamp, id long, et string")
    assert markov_stationary(empty, "u", "ts", "et").count() == 0


# ------------------------------------------- head_token_profile_similarity
def test_head_profiles_clones_and_disjoint(spark):
    from swivel_spark_prep_spark.operators.textstats import (
        head_token_profile_similarity,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb aa cc", "A"), (2, "aa bb aa cc", "B"),
         (3, "xx yy zz xx", "C")],
        "doc_id long, text string, source string",
    )
    out = {(r["source_a"], r["source_b"]): r["cosine"]
           for r in head_token_profile_similarity(docs, k=10).collect()}
    assert out[("A", "B")] == 1.0      # identical usage profiles
    # zero-overlap pairs are absent by convention (token-keyed join
    # never materializes the zero cells)
    assert ("A", "C") not in out and ("B", "C") not in out
    with pytest.raises(ValueError):
        head_token_profile_similarity(docs, k=0)


# --------------------------------------------------------- shard_skew_audit
def test_shard_skew_hot_key_and_uniform(spark):
    from swivel_spark_prep_spark.operators.quality import shard_skew_audit

    # one key = one shard carries everything: imbalance = n_shards,
    # population cv over loads (N,0,0,0) = sqrt(3)
    hot = spark.createDataFrame([(7,)] * 100, "k long")
    r = shard_skew_audit(hot, "k", n_shards=4).collect()[0]
    assert r["used_shards"] == 1 and r["n_rows"] == 100
    assert r["imbalance"] == 4.0
    assert abs(r["cv"] - math.sqrt(3)) < 1e-6
    # many distinct keys spread out: every shard used, imbalance small
    uni = spark.createDataFrame([(i,) for i in range(4000)], "k long")
    r2 = shard_skew_audit(uni, "k", n_shards=4).collect()[0]
    assert r2["used_shards"] == 4
    assert 1.0 <= r2["imbalance"] < 1.2
    with pytest.raises(ValueError):
        shard_skew_audit(hot, "k", n_shards=0)


# -------------------------------------------------------- join_fanout_audit
def test_join_fanout_hand_fixture(spark):
    from swivel_spark_prep_spark.operators.quality import join_fanout_audit

    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame(
        [(1,), (1,), (3,), (3,), (3,), (3,), (3,)], "k long"
    )
    r = join_fanout_audit(left, right, "k", "k").collect()[0]
    assert r["n_left_keys"] == 3 and r["matched_keys"] == 2
    assert abs(r["match_rate"] - 2 / 3) < 1e-6
    assert r["output_rows"] == 7  # 1*2 + 1*0 + 1*5
    assert r["fo_p50"] == 2.0 and r["fo_max"] == 5
    assert abs(r["fo_mean"] - 7 / 3) < 1e-6


# ------------------------------------------------------------ preflight CLI
def test_cli_preflight(spark, tmp_path, capsys):
    import json

    from swivel_spark_prep_spark import cli

    left = str(tmp_path / "fact")
    right = str(tmp_path / "dim")
    spark.createDataFrame(
        [(i % 5,) for i in range(100)], "k long"
    ).write.parquet(left)
    spark.createDataFrame(
        [(k,) for k in (0, 1, 2) for _ in range(3)], "k long"
    ).write.parquet(right)
    rc = cli.main([
        "preflight", "--input", left, "--key", "k", "--shards", "8",
        "--join-input", right, "--join-key", "k",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["shard_skew"]["n_rows"] == 100
    assert rep["shard_skew"]["n_shards"] == 8
    assert rep["join_fanout"]["n_left_keys"] == 5
    assert rep["join_fanout"]["matched_keys"] == 3
    assert rep["join_fanout"]["output_rows"] == 180  # 3 keys x 20 x 3


# ------------------------------------------------------------ cuzick_trend
def test_cuzick_trend_direction_and_null(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import cuzick_trend

    # values rise with the score -> strongly positive z
    up = spark.createDataFrame(
        [(float(s), float(s * 10 + i)) for s in (0, 1, 2) for i in range(20)],
        "s double, x double",
    )
    r = cuzick_trend(up, "x", "s").collect()[0]
    assert r["z"] > 5 and r["k"] == 3 and r["n"] == 60
    # perfectly separated and DESCENDING -> mirrored z
    down = spark.createDataFrame(
        [(float(s), float(-s * 10 + i)) for s in (0, 1, 2) for i in range(20)],
        "s double, x double",
    )
    r2 = cuzick_trend(down, "x", "s").collect()[0]
    assert abs(r2["z"] + r["z"]) < 1e-6
    # exchangeable groups -> L == E[L] exactly (identical rank mix)
    flat = spark.createDataFrame(
        [(float(s), float(i % 7)) for s in (0, 1, 2) for i in range(21)],
        "s double, x double",
    )
    r3 = cuzick_trend(flat, "x", "s").collect()[0]
    assert abs(r3["l_stat"] - r3["e_l"]) < 1e-6


# --------------------------------------------------------- winsorized_stats
def test_winsorized_clamps_outlier(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import winsorized_stats

    # one wild outlier among 100: plain mean is dragged (~10 050),
    # the winsorized mean is not — the 0.95 quantile sits inside the
    # normal range so the clamp actually bites
    rows = [("g", float(i % 50)) for i in range(99)] + [("g", 1e6)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = winsorized_stats(df, "x", "g", p=0.05).collect()[0]
    assert r["n"] == 100
    assert r["win_mean"] < 50  # plain mean would be ~10 024
    assert r["hi_cap"] < 100 and r["lo_cap"] >= 0.0
    with pytest.raises(ValueError):
        winsorized_stats(df, "x", "g", p=0.5)


# ---------------------------------------------------------------- grubbs
def test_grubbs_finds_planted_outlier(spark):
    import numpy as np

    from swivel_spark_prep_spark.operators.evalmetrics import grubbs_test

    vals = [float(i % 10) for i in range(50)] + [500.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = grubbs_test(df, "x").collect()[0]
    assert r["suspect_value"] == 500.0
    g = max(abs(np.array(vals) - np.mean(vals))) / np.std(vals, ddof=1)
    assert abs(r["g_stat"] - g) < 1e-6
    # constant column -> NULL G
    const = spark.createDataFrame([(3.0,)] * 10, "x double")
    assert grubbs_test(const, "x").collect()[0]["g_stat"] is None


# ----------------------------------------------------------------- fdr_by
def test_fdr_by_harmonic_price_vs_bh(spark):
    from swivel_spark_prep_spark.operators.quality import fdr_bh, fdr_by

    # 10 p-values; the middling ones pass BH but fail BY's stricter cut
    ps = [0.001, 0.002, 0.015, 0.02, 0.03, 0.2, 0.4, 0.6, 0.8, 0.9]
    df = spark.createDataFrame([(p,) for p in ps], "pv double")
    bh = {r["pv"]: r["rejected"] for r in fdr_bh(df, "pv", q=0.05).collect()}
    by_rows = fdr_by(df, "pv", q=0.05).collect()
    by = {r["pv"]: r["rejected"] for r in by_rows}
    hm = sum(1.0 / i for i in range(1, 11))
    assert by_rows[0]["h_m"] == round(hm, 6)
    assert by_rows[0]["m_tests"] == 10
    # BY rejections are a subset of BH's (strictly more conservative)
    assert all(bh[p] for p in ps if by[p])
    assert sum(by.values()) < sum(bh.values())
    # the BY cutoff is exactly the BH rule at q/H_m
    bh_scaled = {r["pv"]: r["rejected"]
                 for r in fdr_bh(df, "pv", q=0.05 / hm).collect()}
    assert by == bh_scaled
    with pytest.raises(ValueError):
        fdr_by(df, "pv", q=1.5)


# --------------------------------------------------------------- ad_ksample
def test_ad_ksample_scholz_stephens_published_example(spark):
    """The paper's worked four-sample example (Scholz & Stephens 1987,
    water-quality data): A2akN = 8.3926, sigma = 1.2038, T = 4.48 —
    the exact published values, midrank/tie-adjusted version."""
    from swivel_spark_prep_spark.operators.evalmetrics import ad_ksample

    t1 = [38.7, 41.5, 43.8, 44.5, 45.5, 46.0, 47.7, 58.0]
    t2 = [39.2, 39.3, 39.7, 41.4, 41.8, 42.9, 43.3, 45.8]
    t3 = [34.0, 35.0, 39.0, 40.0, 43.0, 43.0, 44.0, 45.0]
    t4 = [34.0, 34.8, 34.8, 35.4, 37.2, 37.8, 41.2, 42.8]
    rows = [(f"g{i}", v) for i, s in enumerate([t1, t2, t3, t4]) for v in s]
    df = spark.createDataFrame(rows, "g string, x double")
    r = ad_ksample(df, "x", "g").collect()[0]
    assert r["k"] == 4 and r["n"] == 32
    assert abs(r["a2"] - 8.3926) < 5e-4
    assert abs(r["sigma"] - 1.2038) < 5e-4
    assert abs(r["t_stat"] - 4.4798) < 5e-4
    # identical samples -> A2 near 0, T well negative (no evidence)
    same = spark.createDataFrame(
        [(g, float(i % 10)) for g in ("a", "b") for i in range(30)],
        "g string, x double",
    )
    r2 = ad_ksample(same, "x", "g").collect()[0]
    assert r2["t_stat"] < 0
    with pytest.raises(ValueError):
        ad_ksample(spark.createDataFrame([("a", 1.0)], "g string, x double"),
                   "x", "g")


# --------------------------------------------------------------- haar_energy
def test_haar_energy_localizes_burst_scale(spark):
    from swivel_spark_prep_spark.operators.timeseries import haar_energy

    b = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 16-hour square wave: 8 hours of 20 events, 8 hours of 2 —
    # adjacent 8-hour half-blocks differ maximally at level 4
    # (block_hours 16); level-1 half-blocks (adjacent hours) are
    # mostly equal
    for t in range(256):
        n = 20 if (t // 8) % 2 == 0 else 2
        for _ in range(n):
            rows.append((b + datetime.timedelta(hours=t), eid)); eid += 1
    df = spark.createDataFrame(rows, "ts timestamp, id long")
    out = {r["level"]: r for r in haar_energy(df, "ts", levels=6).collect()}
    assert out[4]["block_hours"] == 16
    shares = {l: out[l]["energy_share"] for l in out}
    assert max(shares, key=shares.get) == 4
    assert shares[4] > 0.8
    assert abs(sum(shares.values()) - 1.0) < 1e-5
    with pytest.raises(ValueError):
        haar_energy(df, "ts", levels=0)


# ------------------------------------------------------------ mcf_recurrent
def test_mcf_recurrent_hand_counts(spark):
    from swivel_spark_prep_spark.operators.timeseries import mcf_recurrent

    b = datetime.datetime(2024, 1, 1)
    # 4 users; day 0: 4 events, day 1: 2, day 2: 6 -> MCF 1, 1.5, 3
    rows = []
    eid = 0
    for day, per_user in [(0, [1, 1, 1, 1]), (1, [2, 0, 0, 0]),
                          (2, [3, 1, 1, 1])]:
        for u, k in enumerate(per_user):
            for _ in range(k):
                rows.append((u, b + datetime.timedelta(days=day, minutes=eid % 60), eid))
                eid += 1
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long")
    out = {r["bucket"]: r for r in mcf_recurrent(df, "u", "ts").collect()}
    buckets = sorted(out)
    assert [out[bk]["d_events"] for bk in buckets] == [4, 2, 6]
    assert [out[bk]["mcf"] for bk in buckets] == [1.0, 1.5, 3.0]
    assert out[buckets[-1]]["se"] == round(math.sqrt(12) / 4, 6)


# ------------------------------------------------------------- chow_sweep
def test_chow_sweep_finds_planted_trend_break(spark):
    from swivel_spark_prep_spark.operators.linear import chow_sweep

    b = datetime.datetime(2024, 1, 1)
    rows = []
    # slope 1 for the first 60% of the window, slope -4 after: the
    # sup-F candidate nearest the break (0.6) must win
    for i in range(500):
        ts = b + datetime.timedelta(minutes=i)
        y = float(i) if i < 300 else 300.0 - 4.0 * (i - 300)
        rows.append((ts, y + (i % 5) * 0.1))
    df = spark.createDataFrame(rows, "ts timestamp, y double")
    out = chow_sweep(df, "ts", "y", "ts").collect()
    assert len(out) == 7
    assert out[0]["best_frac"] == 0.6
    by_frac = {r["frac"]: r["f_stat"] for r in out}
    assert by_frac[0.6] > 10 * by_frac[0.2]
    with pytest.raises(ValueError):
        chow_sweep(df, "ts", "y", "ts", fractions=())
    with pytest.raises(ValueError):
        chow_sweep(df, "ts", "y", "ts", fractions=(0.0, 0.5))
