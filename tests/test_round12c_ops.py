"""Round-12 batch F operator pins: Bradley-Terry, sliding-window
chunking, simplified silhouette, split-conformal intervals, Wald SPRT,
readability scores."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


# ---- bradley_terry


def _bt(spark, rows, iterations=8):
    from swivel_spark_prep_spark.operators.evalmetrics import bradley_terry

    df = spark.createDataFrame(rows, "w string, l string")
    return {
        r.item: r
        for r in bradley_terry(df, "w", "l", iterations=iterations).collect()
    }


def test_bt_two_items_analytic(spark):
    """w(a>b)=3, w(b>a)=1: the MLE satisfies p_a/p_b = 3; with mean-1
    scaling p_a=1.5, p_b=0.5."""
    rows = [("a", "b")] * 3 + [("b", "a")]
    got = _bt(spark, rows, iterations=30)
    assert got["a"].strength == pytest.approx(1.5, abs=1e-4)
    assert got["b"].strength == pytest.approx(0.5, abs=1e-4)
    assert got["a"].wins == 3 and got["b"].wins == 1
    assert got["a"].games == 4 and got["b"].games == 4


def test_bt_zero_win_item_is_zero(spark):
    rows = [("a", "b"), ("a", "b"), ("b", "c"), ("a", "c")]
    got = _bt(spark, rows)
    assert got["c"].strength == 0.0
    assert got["c"].wins == 0 and got["c"].games == 2


def test_bt_python_mm_replay(spark):
    """Exact MM replay in python (same update, same mean-1 rescale)."""
    rows = [
        ("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"),
        ("b", "a"), ("c", "b"), ("a", "c"), ("a", "c"),
    ]
    T = 8
    wins, games = {}, {}
    for w, l in rows:
        wins[w] = wins.get(w, 0) + 1
        games[(w, l)] = games.get((w, l), 0) + 1
        games[(l, w)] = games.get((l, w), 0) + 1
    items = sorted({i for pair in rows for i in pair})
    p = {i: 1.0 for i in items}
    for _ in range(T):
        den = {
            i: sum(n / (p[i] + p[j]) for (ii, j), n in games.items() if ii == i)
            for i in items
        }
        raw = {i: wins.get(i, 0) / den[i] for i in items}
        tot = sum(raw.values())
        p = {i: raw[i] * len(items) / tot for i in items}
    got = _bt(spark, rows, iterations=T)
    for i in items:
        assert got[i].strength == pytest.approx(p[i], abs=1e-6)


def test_bt_zero_iterations_uniform(spark):
    got = _bt(spark, [("a", "b"), ("b", "a")], iterations=0)
    assert got["a"].strength == 1.0 and got["b"].strength == 1.0


def test_bt_empty_raises(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import bradley_terry

    df = spark.createDataFrame([("a", "a")], "w string, l string")
    with pytest.raises(ValueError, match="empty"):
        bradley_terry(df, "w", "l").collect()


# ---- sliding_window_chunks


def _chunks(spark, texts, window, stride):
    from swivel_spark_prep_spark.operators.chunking import sliding_window_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return (
        sliding_window_chunks(df, window=window, stride=stride)
        .orderBy("id", "chunk_id")
        .collect()
    )


def test_chunks_short_doc_single_chunk(spark):
    rows = _chunks(spark, ["a b c"], window=4, stride=2)
    assert len(rows) == 1
    assert rows[0].chunk == "a b c" and rows[0].n_tokens == 3


def test_chunks_overlap_and_coverage(spark):
    toks = [f"t{i}" for i in range(10)]
    rows = _chunks(spark, [" ".join(toks)], window=4, stride=2)
    # n=10, w=4, s=2 -> 1 + ceil(6/2) = 4 chunks
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk == "t0 t1 t2 t3"
    assert rows[1].chunk == "t2 t3 t4 t5"
    assert rows[3].chunk == "t6 t7 t8 t9"
    assert all(r.n_tokens == 4 for r in rows)
    covered = set()
    for r in rows:
        covered.update(r.chunk.split(" "))
    assert covered == set(toks)


def test_chunks_short_tail(spark):
    toks = [f"t{i}" for i in range(5)]
    rows = _chunks(spark, [" ".join(toks)], window=4, stride=4)
    # n=5 -> 2 chunks, tail has 1 token
    assert len(rows) == 2
    assert rows[1].chunk == "t4" and rows[1].n_tokens == 1


def test_chunks_stride_gt_window_raises(spark):
    from swivel_spark_prep_spark.operators.chunking import sliding_window_chunks

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="skip"):
        sliding_window_chunks(df, window=2, stride=3)


# ---- simplified_silhouette


def test_silhouette_separated_clusters_near_one(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import simplified_silhouette

    rows = [(i, [0.0 + 0.01 * i, 0.0], 0) for i in range(5)] + [
        (10 + i, [10.0 + 0.01 * i, 0.0], 1) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.label: r for r in simplified_silhouette(df).collect()}
    assert got[0].n == 5 and got[1].n == 5
    assert got[0].mean_silhouette > 0.99
    assert got[1].mean_silhouette > 0.99


def test_silhouette_numpy_parity(spark):
    import numpy as np

    from swivel_spark_prep_spark.operators.evalmetrics import simplified_silhouette

    rng = np.random.RandomState(7)
    vecs = rng.rand(30, 4)
    labels = [i % 3 for i in range(30)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], labels[i]) for i in range(30)],
        "vec_id long, embedding array<float>, label int",
    )
    cents = {c: vecs[[i for i in range(30) if labels[i] == c]].mean(axis=0) for c in range(3)}
    sils = {c: [] for c in range(3)}
    for i in range(30):
        d = {c: float(np.sqrt(((vecs[i] - cents[c]) ** 2).sum())) for c in range(3)}
        a = d[labels[i]]
        b = min(v for c, v in d.items() if c != labels[i])
        sils[labels[i]].append((b - a) / max(a, b))
    got = {r.label: r for r in simplified_silhouette(df).collect()}
    for c in range(3):
        assert got[c].mean_silhouette == pytest.approx(
            sum(sils[c]) / len(sils[c]), abs=1e-5
        )


def test_silhouette_single_cluster_empty(spark):
    """k=1: no 'other centroid' exists, silhouette is undefined — the
    operator returns an empty relation rather than an arbitrary score."""
    from swivel_spark_prep_spark.operators.evalmetrics import simplified_silhouette

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [2.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    assert simplified_silhouette(df).count() == 0


# ---- conformal_interval


def _conf(spark, cal_rows, test_rows, alpha):
    from swivel_spark_prep_spark.operators.evalmetrics import conformal_interval

    cal = spark.createDataFrame(cal_rows, "y double, p double")
    te = spark.createDataFrame(test_rows, "y double, p double")
    return conformal_interval(cal, te, "y", "p", alpha=alpha).collect()[0]


def test_conformal_known_order_statistic(spark):
    # cal residuals 1..9; alpha=0.1 -> k = ceil(0.9*10) = 9 -> q_hat = 9
    cal = [(float(r), 0.0) for r in range(1, 10)]
    te = [(5.0, 0.0), (9.5, 0.0), (8.9, 0.0)]
    row = _conf(spark, cal, te, alpha=0.1)
    assert row.q_hat == 9.0
    assert row.n_cal == 9 and row.n_test == 3
    assert row.coverage == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_conformal_small_cal_infinite_interval(spark):
    # n_cal=2, alpha=0.1 -> k = ceil(0.9*3) = 3 > 2 -> q NULL, coverage 1
    row = _conf(spark, [(1.0, 0.0), (2.0, 0.0)], [(100.0, 0.0)], alpha=0.1)
    assert row.q_hat is None
    assert row.coverage == 1.0


def test_conformal_coverage_guarantee(spark):
    """iid residuals: empirical test coverage must be near 1 - alpha
    (split conformal is finite-sample valid for exchangeable data)."""
    import numpy as np

    rng = np.random.RandomState(11)
    cal = [(float(v), 0.0) for v in rng.randn(400)]
    te = [(float(v), 0.0) for v in rng.randn(400)]
    row = _conf(spark, cal, te, alpha=0.2)
    assert 0.72 <= row.coverage <= 0.88


# ---- sprt_test


def _sprt(spark, xs, **kw):
    from swivel_spark_prep_spark.operators.timeseries import sprt_test

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, x int"
    )
    return sprt_test(df, ["t"], "x", **kw).collect()[0]


def test_sprt_all_successes_accepts_h1(spark):
    row = _sprt(spark, [1] * 50, p0=0.15, p1=0.25, alpha=0.05, beta=0.05)
    lp = math.log(0.25 / 0.15)
    a = math.log(0.95 / 0.05)
    assert row.decision == "accept_h1"
    assert row.cross_n == math.ceil(a / lp)
    assert row.n_obs == 50


def test_sprt_all_failures_accepts_h0(spark):
    row = _sprt(spark, [0] * 100, p0=0.15, p1=0.25, alpha=0.05, beta=0.05)
    ln_ = math.log(0.75 / 0.85)
    b = math.log(0.05 / 0.95)
    assert row.decision == "accept_h0"
    assert row.cross_n == math.ceil(b / ln_)


def test_sprt_short_stream_continues(spark):
    row = _sprt(spark, [1, 0, 1, 0], p0=0.15, p1=0.25)
    assert row.decision == "continue"
    assert row.cross_n is None


def test_sprt_python_replay(spark):
    xs = [1 if (i * 7) % 10 < 3 else 0 for i in range(200)]
    p0, p1 = 0.2, 0.4
    lp, ln_ = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    a, b = math.log(0.95 / 0.05), math.log(0.05 / 0.95)
    cum, n1, n0 = 0.0, None, None
    for i, x in enumerate(xs, start=1):
        cum += lp if x else ln_
        if n1 is None and cum >= a:
            n1 = i
        if n0 is None and cum <= b:
            n0 = i
    row = _sprt(spark, xs, p0=p0, p1=p1)
    expect = min(x for x in (n1, n0) if x is not None) if (n1 or n0) else None
    assert row.cross_n == expect
    assert row.llr_final == pytest.approx(round(cum, 6), abs=1e-6)


def test_sprt_validates_params(spark):
    from swivel_spark_prep_spark.operators.timeseries import sprt_test

    df = spark.createDataFrame([(1, 1)], "t long, x int")
    with pytest.raises(ValueError, match="differ"):
        sprt_test(df, ["t"], "x", p0=0.2, p1=0.2)
    with pytest.raises(ValueError, match="p0"):
        sprt_test(df, ["t"], "x", p0=0.0, p1=0.2)


# ---- readability_scores


def test_readability_worked_example(spark):
    from swivel_spark_prep_spark.operators.textstats import readability_scores

    df = spark.createDataFrame(
        [("en", "the cat sat. the dog ran.")], "lang string, text string"
    )
    row = readability_scores(df, group_cols=["lang"]).collect()[0]
    # W=6, S=2, Sy=6: ease = 206.835 - 1.015*3 - 84.6*1 = 119.19
    #                 grade = 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert row.n_docs == 1
    assert row.mean_ease == pytest.approx(119.19, abs=1e-6)
    assert row.mean_grade == pytest.approx(-2.62, abs=1e-6)


def test_readability_unpunctuated_one_sentence(spark):
    from swivel_spark_prep_spark.operators.textstats import readability_scores

    df = spark.createDataFrame(
        [("en", "aa bb cc dd")], "lang string, text string"
    )
    row = readability_scores(df, group_cols=["lang"]).collect()[0]
    # W=4, S=1 (min), Sy=2 ('aa' one run, bb/cc/dd none... 'aa'=1) -> Sy=1
    # vowel runs: 'aa' -> 1 run; others no vowels -> Sy=1
    assert row.avg_words == 4.0
    assert row.mean_ease == pytest.approx(
        206.835 - 1.015 * 4.0 - 84.6 * (1.0 / 4.0), abs=1e-6
    )
