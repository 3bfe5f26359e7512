"""Round-11h extension operators (the X201–X204 family):

1. doc_keywords (operators/search.py): hand-computed TF-IDF tags; a
   corpus-wide term (df = N) carries zero idf and never tags; ties
   break by term; validation.
2. frequent_paths (operators/timeseries.py): hand-built stream with a
   known dominant path; windows never cross users; validation.
3. seasonal_anomaly (operators/timeseries.py): planted diurnal
   baseline — a spike off an otherwise-constant hour flags via the
   zero-MAD convention, an in-profile value does not.
4. procrustes_drift (operators/pca.py): exact rotation recovered
   (rms_after ≈ 0, cos ≈ 1) while rms_before is large; identity maps
   report zero drift both before and after; translation-free noise
   bounds; disjoint ids raise.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------- doc_keywords
def test_doc_keywords_hand(spark):
    from swivel_spark_prep_spark.operators.search import doc_keywords

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
        ],
        "doc_id long, text string",
    )
    rows = doc_keywords(docs, k=2).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append((r["rank"], r["term"], r["w"]))
    # 'common' has df = 3 = N -> idf 0 -> weight 0; never outranks a real term
    top1 = {d: sorted(v)[0][1] for d, v in by_doc.items()}
    assert top1 == {1: "apple", 2: "banana", 3: "cherry"}
    # doc 1: apple w = 2*ln(3/1); banana w = 1*ln(3/2)
    w = {t: x for _, t, x in by_doc[1]}
    assert w["apple"] == pytest.approx(2 * math.log(3), abs=1e-9)
    with pytest.raises(ValueError):
        doc_keywords(docs, k=0)


# ------------------------------------------------------- frequent_paths
def test_frequent_paths_hand(spark):
    from swivel_spark_prep_spark.operators.timeseries import frequent_paths

    t0 = dt.datetime(2024, 1, 1)

    def seq(u, types):
        return [
            (u, t0 + dt.timedelta(seconds=i), i, t)
            for i, t in enumerate(types)
        ]

    rows = (
        seq(1, ["a", "b", "c", "a", "b", "c"])  # a>b>c twice (+ b>c>a, c>a>b)
        + seq(2, ["a", "b", "c"])  # a>b>c once more
        + seq(3, ["x", "y"])  # too short for length 3
    )
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, event_type string")
    got = {
        r["path"]: r["n"]
        for r in frequent_paths(
            df, "user_id", "ts", "event_type", length=3, k=10, tiebreak_col="event_id"
        ).collect()
    }
    assert got["a>b>c"] == 3
    assert got["b>c>a"] == 1 and got["c>a>b"] == 1
    assert not any("x" in p or "y" in p for p in got)  # no cross-user grams
    with pytest.raises(ValueError):
        frequent_paths(df, "user_id", "ts", "event_type", length=1)


# ----------------------------------------------------- seasonal_anomaly
def test_seasonal_anomaly_planted(spark):
    from swivel_spark_prep_spark.operators.timeseries import seasonal_anomaly

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # hour 0: constant 10.0 except one spike -> zero MAD, spike flags
    for i in range(20):
        rows.append((base + dt.timedelta(days=i), 10.0))
    rows.append((base + dt.timedelta(days=20), 99.0))
    # hour 5: well-spread values, none anomalous
    for i in range(21):
        rows.append((base + dt.timedelta(days=i, hours=5), float(i)))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = seasonal_anomaly(df, "ts", "value").collect()
    h0 = [r for r in got if r["hour"] == 0]
    assert sum(r["is_anomaly"] for r in h0) == 1
    spike = next(r for r in h0 if r["is_anomaly"])
    assert spike["value"] == 99.0 and spike["med"] == 10.0 and spike["mad"] == 0.0
    h5 = [r for r in got if r["hour"] == 5]
    assert not any(r["is_anomaly"] for r in h5)


# ----------------------------------------------------- procrustes_drift
def _embs(spark, vecs, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_procrustes_recovers_exact_rotation(spark):
    from swivel_spark_prep_spark.operators.pca import procrustes_drift

    import numpy as np

    rng = [[math.sin(i * 7 + j * 3) for j in range(8)] for i in range(40)]
    a = np.array(rng)
    # deterministic orthogonal map: reversal + alternating signs
    perm = np.zeros((8, 8))
    for j in range(8):
        perm[7 - j, j] = 1.0 if j % 2 == 0 else -1.0
    b = a @ perm
    r = procrustes_drift(_embs(spark, a), _embs(spark, b)).collect()[0]
    assert r["n"] == 40 and r["d"] == 8
    assert r["rms_before"] > 0.5
    assert r["rms_after"] < 1e-9
    assert r["mean_cos_aligned"] == pytest.approx(1.0, abs=1e-9)


def test_procrustes_identity_and_disjoint(spark):
    from swivel_spark_prep_spark.operators.pca import procrustes_drift

    vecs = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    a = _embs(spark, vecs)
    r = procrustes_drift(a, _embs(spark, vecs)).collect()[0]
    assert r["rms_before"] == 0.0 and r["rms_after"] < 1e-12
    with pytest.raises(ValueError):
        procrustes_drift(a, _embs(spark, vecs, start_id=100))


def test_procrustes_real_drift_is_reported(spark):
    """B = rotation(A) + independent perturbation: the residual after
    alignment must sit near the perturbation magnitude, far above 0 —
    a rotation cannot explain it away."""
    from swivel_spark_prep_spark.operators.pca import procrustes_drift

    import numpy as np

    a = np.array([[math.cos(i + j) for j in range(4)] for i in range(60)])
    noise = np.array(
        [[math.sin(i * 13 + j * 5) * 0.3 for j in range(4)] for i in range(60)]
    )
    r = procrustes_drift(_embs(spark, a), _embs(spark, a + noise)).collect()[0]
    rms_noise = float(np.sqrt((noise**2).sum() / len(a)))
    assert r["rms_after"] > 0.3 * rms_noise
    assert r["rms_after"] <= r["rms_before"] + 1e-12


# ------------------------------------------------------ theil_sen_trend
def test_theil_sen_outlier_proof(spark):
    """y = 2t exactly, except one wild outlier: Theil-Sen still reports
    slope 2 while the same series' OLS slope is dragged far off."""
    from swivel_spark_prep_spark.operators.timeseries import theil_sen_trend

    rows = [(1, float(t), 2.0 * t) for t in range(11)]
    rows[5] = (1, 5.0, 500.0)  # outlier
    df = spark.createDataFrame(rows, "g int, t double, x double")
    r = theil_sen_trend(df, "g", "t", "x").collect()[0]
    assert r["slope"] == pytest.approx(2.0)
    assert r["n_points"] == 11
    # monotone-up series: S strongly positive, z defined (n >= 10)
    assert r["mk_s"] > 20 and r["mk_z"] > 1.5


def test_theil_sen_flat_and_small(spark):
    from swivel_spark_prep_spark.operators.timeseries import theil_sen_trend

    rows = [(1, float(t), 7.0) for t in range(12)] + [
        (2, 0.0, 1.0),
        (2, 1.0, 2.0),  # only 2 points -> dropped at min_points=3
    ]
    df = spark.createDataFrame(rows, "g int, t double, x double")
    got = {r["g"]: r for r in theil_sen_trend(df, "g", "t", "x").collect()}
    assert set(got) == {1}
    assert got[1]["slope"] == 0.0 and got[1]["mk_s"] == 0 and got[1]["mk_z"] == 0.0
    with pytest.raises(ValueError):
        theil_sen_trend(df, "g", "t", "x", min_points=1)


def test_theil_sen_long_series_contract(spark):
    """Round-12 pin (round-11 verdict What's wrong #2): the short-series
    contract is executable. A key exceeding max_points (a) fails fast
    under the default long_series='raise' with the key named and the
    pair-blowup quantified, (b) is lazily excluded under 'drop' while
    short keys stay exact, (c) is deterministically md5-subsampled
    under 'sample' — repeatable across runs, flagged `sampled`, short
    keys bit-identical to the exact path."""
    from swivel_spark_prep_spark.operators.timeseries import theil_sen_trend

    rows = [(1, float(t), 2.0 * t) for t in range(50)] + [
        (2, float(t), 3.0 * t) for t in range(8)
    ]
    df = spark.createDataFrame(rows, "g int, t double, x double")
    # (a) raise, naming the offender
    with pytest.raises(ValueError, match="key 1 .*50 points.*max_points=20"):
        theil_sen_trend(df, "g", "t", "x", max_points=20)
    # (b) drop: long key gone, short key exact
    got = {
        r["g"]: r
        for r in theil_sen_trend(
            df, "g", "t", "x", max_points=20, long_series="drop"
        ).collect()
    }
    assert set(got) == {2}
    assert got[2]["slope"] == pytest.approx(3.0) and got[2]["n_points"] == 8
    # (c) sample: both keys present; the long one capped and flagged,
    # the short one exact; the subsample is deterministic
    s1 = {
        r["g"]: r
        for r in theil_sen_trend(
            df, "g", "t", "x", max_points=20, long_series="sample"
        ).collect()
    }
    s2 = {
        r["g"]: r
        for r in theil_sen_trend(
            df, "g", "t", "x", max_points=20, long_series="sample"
        ).collect()
    }
    assert s1[1]["n_points"] == 20 and s1[1]["sampled"] is True
    assert s1[2]["n_points"] == 8 and s1[2]["sampled"] is False
    assert s1[2]["slope"] == pytest.approx(3.0)
    # a noiseless line survives any subsample: slope still exactly 2
    assert s1[1]["slope"] == pytest.approx(2.0)
    for g in (1, 2):
        assert s1[g]["slope"] == s2[g]["slope"] and s1[g]["mk_s"] == s2[g]["mk_s"]
    # bad policy name rejected
    with pytest.raises(ValueError, match="long_series"):
        theil_sen_trend(df, "g", "t", "x", long_series="nope")
    with pytest.raises(ValueError, match="max_points"):
        theil_sen_trend(df, "g", "t", "x", min_points=5, max_points=4)


# -------------------------------------------------------- npy source/sink
def test_npy_roundtrip_and_stable_ids(spark, tmp_path):
    import numpy as np

    from swivel_spark_prep_spark.sources import read_npy, write_npy

    d = str(tmp_path / "npy")
    import os

    os.makedirs(d)
    a = np.arange(12, dtype=np.float64).reshape(4, 3)
    b = np.arange(100, 106, dtype=np.float64).reshape(2, 3)
    np.save(os.path.join(d, "b_second.npy"), b)
    np.save(os.path.join(d, "a_first.npy"), a)
    got = read_npy(spark, d).collect()
    assert len(got) == 6
    by_id = {r["vec_id"]: r for r in got}
    # ids follow LEXICAL file order: a_first rows 0-3, b_second rows 4-5
    assert by_id[0]["embedding"] == [0.0, 1.0, 2.0]
    assert by_id[3]["file"].endswith("a_first.npy")
    assert by_id[4]["embedding"] == [100.0, 101.0, 102.0]
    # reproducible regardless of partitioning
    again = {r["vec_id"]: r["embedding"] for r in read_npy(spark, d).collect()}
    assert again == {k: v["embedding"] for k, v in by_id.items()}

    # write side: dump, read back, same multiset of vectors
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [([float(i), float(i + 1)],) for i in range(10)], "v array<double>"
    ).repartition(3)
    shards = write_npy(df, "v", out)
    assert shards >= 1
    back = sorted(
        tuple(r["embedding"]) for r in read_npy(spark, out).collect()
    )
    assert back == sorted((float(i), float(i + 1)) for i in range(10))


# ---------------------------------------------------- linear_attribution
def test_linear_attribution_hand_and_conservation(spark):
    import datetime as dt

    from swivel_spark_prep_spark.operators.timeseries import linear_attribution

    t0 = dt.datetime(2024, 1, 1)

    def e(u, s, i, t):
        return (u, t0 + dt.timedelta(seconds=s), i, t)

    rows = [
        # user 1: a, b, a then purchase -> credits a=2/3, b=1/3
        e(1, 0, 1, "a"), e(1, 1, 2, "b"), e(1, 2, 3, "a"), e(1, 3, 4, "purchase"),
        # later touches after the FIRST purchase never count
        e(1, 4, 5, "c"), e(1, 5, 6, "purchase"),
        # user 2: purchase with no prior touch -> contributes nothing
        e(2, 0, 7, "purchase"),
        # user 3: touches but never converts -> nothing
        e(3, 0, 8, "a"), e(3, 1, 9, "b"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, event_type string")
    got = {r["touch_type"]: r["credit"] for r in linear_attribution(df).collect()}
    assert got == {"a": pytest.approx(2 / 3, abs=1e-6), "b": pytest.approx(1 / 3, abs=1e-6)}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)  # 1 converting user w/ touches


def test_linear_attribution_conservation_fixture(spark, sf_dir):
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.timeseries import linear_attribution

    ev = load_table(spark, sf_dir, "events")
    rows = linear_attribution(ev).collect()
    total = sum(r["credit"] for r in rows)
    # number of users whose first purchase has >= 1 prior event
    conv = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.expr("min_by(struct(ts AS t, event_id AS i), struct(ts, event_id))").alias("c")
    )
    n = (
        ev.join(conv, "user_id")
        .filter(F.struct("ts", "event_id") < F.struct("c.t", "c.i"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert total == pytest.approx(n, abs=1e-3)


# ------------------------------------------------- token_information_gain
def test_token_ig_planted_marker(spark):
    from swivel_spark_prep_spark.operators.textstats import (
        token_information_gain,
    )

    rows = [(i, i % 2 == 0, ("MARKER filler" if i % 2 == 0 else "other filler"))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, y boolean, text string")
    got = token_information_gain(df, "y", k=3).collect()
    # 'marker' and 'other' perfectly predict the label -> IG = H(0.5) = ln 2;
    # 'filler' appears everywhere -> IG = 0
    import math

    by_tok = {r["token"]: r for r in got}
    assert by_tok["marker"]["ig"] == pytest.approx(math.log(2), abs=1e-6)
    assert by_tok["marker"]["p_pos_given_token"] == 1.0
    assert by_tok["other"]["ig"] == pytest.approx(math.log(2), abs=1e-6)
    assert got[0]["token"] in ("marker", "other")
    filler = token_information_gain(df, "y", k=20).filter(
        F.col("token") == "filler"
    ).collect()
    assert filler and filler[0]["ig"] == 0.0


# ----------------------------------------------------- bootstrap_diff_ci
def test_bootstrap_diff_brackets_and_separates(spark):
    from swivel_spark_prep_spark.operators.sampling import bootstrap_diff_ci

    rows = [("a", i, 10.0 + (i * 37) % 5) for i in range(800)] + [
        ("b", 10000 + i, 5.0 + (i * 23) % 5) for i in range(800)
    ]
    df = spark.createDataFrame(rows, "g string, id long, x double")
    r = bootstrap_diff_ci(df, "x", "id", "g", "a", "b", replicates=100).collect()[0]
    assert r["ci_lo"] <= r["diff"] <= r["ci_hi"]
    assert r["ci_lo"] > 3.0  # true uplift = 5, sd tiny -> clearly separated
    assert r["b_used"] == 100
    # determinism
    r2 = bootstrap_diff_ci(df, "x", "id", "g", "a", "b", replicates=100).collect()[0]
    assert r == r2


def test_bootstrap_diff_no_effect_covers_zero(spark):
    from swivel_spark_prep_spark.operators.sampling import bootstrap_diff_ci

    rows = [("a", i, float((i * 37) % 100)) for i in range(1000)] + [
        ("b", 50000 + i, float((i * 37) % 100)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "g string, id long, x double")
    r = bootstrap_diff_ci(df, "x", "id", "g", "a", "b", replicates=100).collect()[0]
    assert r["ci_lo"] < 0 < r["ci_hi"]  # identical distributions

    import pytest as _pt

    with _pt.raises(ValueError):
        bootstrap_diff_ci(df, "x", "id", "g", "a", "b", replicates=1)
