"""Round-12 batch G operator pins: Dawid-Skene label aggregation,
ANN hubness diagnostic, leave-one-group-out influence."""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.usefixtures("spark")


# ---- dawid_skene


def _ratings(spark, rows):
    return spark.createDataFrame(rows, "item long, rater string, label string")


def test_ds_zero_iterations_is_majority_vote(spark):
    from swivel_spark_prep_spark.operators.labeling import dawid_skene

    rows = [(1, "a", "x"), (1, "b", "x"), (1, "c", "y"),
            (2, "a", "y"), (2, "b", "y"), (2, "c", "y")]
    got = {r.item: r for r in dawid_skene(
        _ratings(spark, rows), "item", "rater", "label", iterations=0
    ).collect()}
    assert got[1].ds_label == "x" and got[1].posterior == pytest.approx(2 / 3, abs=1e-6)
    assert got[2].ds_label == "y" and got[2].posterior == 1.0


def test_ds_python_em_replay(spark):
    """Bit-level replay of the full EM trajectory in python."""
    from swivel_spark_prep_spark.operators.labeling import dawid_skene

    rows = []
    for i in range(12):
        true = "x" if i % 2 else "y"
        rows.append((i, "good1", true))
        rows.append((i, "good2", true))
        rows.append((i, "bad", "x"))  # always says x
    T, lam = 3, 0.01
    items = sorted({r[0] for r in rows})
    classes = sorted({r[2] for r in rows})
    K = len(classes)
    # init: majority vote
    q = {}
    for i in items:
        votes = [l for (ii, _, l) in rows if ii == i]
        for c in classes:
            q[(i, c)] = votes.count(c) / len(votes)
    for _ in range(T):
        pri = {c: sum(q[(i, c)] for i in items) / len(items) for c in classes}
        tn = {}
        td = {}
        for (i, r, l) in rows:
            for c in classes:
                tn[(r, l, c)] = tn.get((r, l, c), 0.0) + q[(i, c)]
                td[(r, c)] = td.get((r, c), 0.0) + q[(i, c)]
        th = {
            (r, l, c): (s + lam) / (td[(r, c)] + lam * K)
            for (r, l, c), s in tn.items()
        }
        s = {}
        for (i, r, l) in rows:
            for c in classes:
                s[(i, c)] = s.get((i, c), 0.0) + math.log(th[(r, l, c)])
        for i in items:
            sc = {c: s[(i, c)] + math.log(pri[c]) for c in classes}
            m = max(sc.values())
            e = {c: math.exp(sc[c] - m) for c in classes}
            z = sum(e.values())
            for c in classes:
                q[(i, c)] = e[c] / z
    got = {r.item: r for r in dawid_skene(
        _ratings(spark, rows), "item", "rater", "label", iterations=T
    ).collect()}
    for i in items:
        best = max(classes, key=lambda c: (q[(i, c)], ))
        assert got[i].ds_label == best
        assert got[i].posterior == pytest.approx(q[(i, best)], abs=1e-6)


def test_ds_downweights_bad_rater(spark):
    """Two accurate raters + one 'always x' rater: the rater-quality
    output must rank the adversary last, and the consensus on items
    where truth is y must stay y despite the x vote."""
    from swivel_spark_prep_spark.operators.labeling import (
        dawid_skene,
        dawid_skene_rater_quality,
    )

    rows = []
    for i in range(20):
        true = "x" if i % 2 else "y"
        rows.append((i, "good1", true))
        rows.append((i, "good2", true))
        rows.append((i, "bad", "x"))
    rq = {r.rater: r for r in dawid_skene_rater_quality(
        _ratings(spark, rows), "item", "rater", "label", iterations=3
    ).collect()}
    assert rq["bad"].accuracy < rq["good1"].accuracy
    assert rq["good1"].n_ratings == 20
    labels = {r.item: r.ds_label for r in dawid_skene(
        _ratings(spark, rows), "item", "rater", "label", iterations=3
    ).collect()}
    assert all(labels[i] == ("x" if i % 2 else "y") for i in range(20))


def test_ds_validates(spark):
    from swivel_spark_prep_spark.operators.labeling import dawid_skene

    df = _ratings(spark, [(1, "a", "x")])
    with pytest.raises(ValueError, match="smoothing"):
        dawid_skene(df, "item", "rater", "label", smoothing=0.0)
    with pytest.raises(ValueError, match="iterations"):
        dawid_skene(df, "item", "rater", "label", iterations=-1)


# ---- ann_hubness


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_hubness_mean_is_k(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    df = _emb(spark, rng.randn(30, 8))
    row = ann_hubness_row(df, k=5)
    assert row.n_vectors == 30
    assert row.mean_k_occ == 5.0
    assert row.max_k_occ >= 5


def ann_hubness_row(df, **kw):
    from swivel_spark_prep_spark.operators.similarity import ann_hubness

    return ann_hubness(df, **kw).collect()[0]


def test_hubness_numpy_parity(spark):
    import numpy as np

    rng = np.random.RandomState(9)
    vecs = rng.randn(25, 6)
    df = _emb(spark, vecs)
    k = 4
    sims = vecs @ vecs.T / (
        np.sqrt((vecs ** 2).sum(1))[:, None] * np.sqrt((vecs ** 2).sum(1))[None, :]
    )
    occ = np.zeros(25, dtype=int)
    for a in range(25):
        order = sorted(
            (b for b in range(25) if b != a), key=lambda b: (-sims[a, b], b)
        )
        for b in order[:k]:
            occ[b] += 1
    m1, m2, m3 = occ.mean(), (occ.astype(float) ** 2).mean(), (occ.astype(float) ** 3).mean()
    var = m2 - m1 ** 2
    row = ann_hubness_row(df, k=k)
    assert row.mean_k_occ == pytest.approx(m1, abs=1e-6)
    assert row.std_k_occ == pytest.approx(math.sqrt(var), abs=1e-6)
    assert row.skew_k_occ == pytest.approx(
        (m3 - 3 * m1 * m2 + 2 * m1 ** 3) / var ** 1.5, abs=1e-5
    )
    assert row.max_k_occ == int(occ.max())
    assert row.antihub_frac == pytest.approx((occ == 0).mean(), abs=1e-6)


def test_hubness_sampling_cap(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    df = _emb(spark, rng.randn(60, 4))
    row = ann_hubness_row(df, k=3, max_vectors=30)
    # deterministic md5 threshold: expected ~30, must be well under 60
    assert row.n_vectors < 60
    assert row.mean_k_occ == 3.0  # still n > k inside the sample


def test_hubness_validates(spark):
    from swivel_spark_prep_spark.operators.similarity import ann_hubness

    df = _emb(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError, match="at least 2"):
        ann_hubness(df, k=1)


# ---- group_influence


def test_influence_exact_identity(spark):
    from swivel_spark_prep_spark.operators.quality import group_influence

    rows = [("a", 10.0), ("a", 20.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.group: r for r in group_influence(df, "g", "v").collect()}
    mean_all = 36.0 / 5
    assert got["a"].mean_g == 15.0
    assert got["a"].mean_without == 2.0
    assert got["a"].influence == pytest.approx(mean_all - 2.0, abs=1e-6)
    assert got["b"].influence == pytest.approx(mean_all - 15.0, abs=1e-6)
    # influences weighted by... identity: sum of (N-n_g)*influence over g = 0 iff 2 groups
    assert got["a"].influence > 0 > got["b"].influence


def test_influence_single_group_null(spark):
    from swivel_spark_prep_spark.operators.quality import group_influence

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    row = group_influence(df, "g", "v").collect()[0]
    assert row.mean_without is None and row.influence is None


# ---- checkpoint_truncate (the BigInteger stats-explosion fix)


def test_checkpoint_truncate_stats_bounded(spark):
    """The Bradley-Terry-shaped iteration (state joined twice per
    round) must NOT inherit multiplying size statistics: without the
    reset the estimated sizeInBytes digit count DOUBLES per round
    (measured 56/131/280/577/1173/2364) and Catalyst hangs in
    BigInteger.multiply by ~25 rounds. Pin: digits stay constant."""
    from pyspark.sql import functions as F

    from swivel_spark_prep_spark.cache import checkpoint_truncate

    df = spark.createDataFrame([("a", "b")] * 3 + [("b", "a")], "w string, l string")
    games = df.groupBy("w", "l").agg(F.count("*").cast("double").alias("n"))
    p = games.select(F.col("w").alias("i"), F.lit(1.0).alias("p")).distinct()
    digits = []
    for _ in range(6):
        den = (
            games.join(p.select(F.col("i").alias("l"), F.col("p").alias("pj")), "l")
            .join(p.select(F.col("i").alias("w"), F.col("p").alias("pi")), "w")
            .groupBy("w")
            .agg(F.sum(F.col("n") / (F.col("pi") + F.col("pj"))).alias("d"))
        )
        p = checkpoint_truncate(
            den.select(F.col("w").alias("i"), (F.lit(1.0) / F.col("d")).alias("p"))
        )
        sz = p._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        digits.append(len(str(sz)))
    assert max(digits) <= digits[0], f"stats digits grew: {digits}"
    assert p.count() == 2  # the data survived the RDD rebuild
