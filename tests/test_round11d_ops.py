"""Round-11d extension operators (the X185–X189 family):

1. average_precision (operators/evalmetrics.py): hand-computed step
   curve; perfect ranking gives AP = 1; no positives gives NULL;
   grouped form equals per-slice ungrouped runs.
2. isotonic_calibration (operators/evalmetrics.py): hand-computed PAV
   pooling; output is monotone non-decreasing in score per group;
   weighted calibrated mean preserves the weighted label mean (the PAV
   projection invariant); already-monotone input passes through.
3. interarrival_stats (operators/timeseries.py): exact values on a
   hand series; perfectly periodic series → cv = 0, burstiness = −1;
   min_events filter.
4. lsh_parameter_plan (operators/dedup.py): every row satisfies
   b·r = num_hashes; p_at_threshold replays the closed formula;
   validation errors.
5. heaps_law_fit (operators/textstats.py): bit-exact replication of
   bucketing + regression on a tiny corpus via hashlib; beta in (0, 1)
   on the fixture corpus (sub-linear vocab growth).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------- average_precision
def test_ap_hand_computed(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import average_precision

    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 0), (1.0, 1)], "score double, y int"
    )
    r = average_precision(df, "score", "y").collect()[0]
    assert (r["n_pos"], r["n"]) == (2, 3)
    assert abs(r["ap"] - (1.0 + 2.0 / 3.0) / 2.0) < 1e-12


def test_ap_perfect_and_degenerate(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import average_precision

    perfect = spark.createDataFrame(
        [(5.0, 1), (4.0, 1), (1.0, 0), (0.5, 0)], "score double, y int"
    )
    assert average_precision(perfect, "score", "y").collect()[0]["ap"] == 1.0
    nopos = spark.createDataFrame([(1.0, 0), (2.0, 0)], "score double, y int")
    assert average_precision(nopos, "score", "y").collect()[0]["ap"] is None


def test_ap_grouped_matches_per_slice(spark, sf_dir):
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.evalmetrics import average_precision

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("s"), (F.col("lang") == "en").alias("y")
    )
    grouped = {
        r["source"]: r["ap"]
        for r in average_precision(docs, "s", "y", group_col="source").collect()
    }
    for src in list(grouped)[:3]:
        solo = average_precision(
            docs.filter(F.col("source") == src), "s", "y"
        ).collect()[0]["ap"]
        assert abs(grouped[src] - solo) < 1e-12, src


# ------------------------------------------------ isotonic_calibration
def test_pav_hand_computed(spark):
    """scores 1..4 with rates (0.2, 0.8, 0.4, 0.9), equal weights:
    (0.8, 0.4) violate and pool to 0.6 -> (0.2, 0.6, 0.6, 0.9)."""
    from swivel_spark_prep_spark.operators.evalmetrics import (
        isotonic_calibration,
    )

    rows = (
        [(1.0, 1)] + [(1.0, 0)] * 4  # rate 0.2, n=5
        + [(2.0, 1)] * 4 + [(2.0, 0)]  # rate 0.8
        + [(3.0, 1)] * 2 + [(3.0, 0)] * 3  # rate 0.4
        + [(4.0, 1)] * 9 + [(4.0, 0)]  # rate 0.9 (n=10)
    )
    df = spark.createDataFrame(rows, "score double, y int")
    got = {
        r["score"]: (r["n"], r["y_rate"], r["calibrated"])
        for r in isotonic_calibration(df, "score", "y").collect()
    }
    assert got[1.0] == (5, 0.2, 0.2)
    assert got[2.0][2] == pytest.approx(0.6)
    assert got[3.0][2] == pytest.approx(0.6)
    assert got[4.0] == (10, 0.9, 0.9)


def test_pav_monotone_and_mean_preserving(spark, sf_dir):
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.evalmetrics import (
        isotonic_calibration,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        (F.floor(F.col("n_chars") / 100) * 100).cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    rows = isotonic_calibration(docs, "score", "y", group_col="source").collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["source"], []).append(r)
    assert len(by_g) >= 2
    for g, rs in by_g.items():
        rs.sort(key=lambda r: r["score"])
        cal = [r["calibrated"] for r in rs]
        assert all(a <= b + 1e-12 for a, b in zip(cal, cal[1:])), g
        w_y = sum(r["n"] * r["y_rate"] for r in rs)
        w_c = sum(r["n"] * r["calibrated"] for r in rs)
        assert abs(w_y - w_c) < 1e-6, g


def test_pav_identity_on_monotone_input(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        isotonic_calibration,
    )

    rows = [(1.0, 0)] * 4 + [(1.0, 1)] + [(2.0, 0)] + [(2.0, 1)] + [(3.0, 1)] * 3
    df = spark.createDataFrame(rows, "score double, y int")
    for r in isotonic_calibration(df, "score", "y").collect():
        assert r["calibrated"] == pytest.approx(r["y_rate"])


# ---------------------------------------------------- interarrival
def test_interarrival_hand_and_periodic(spark):
    from swivel_spark_prep_spark.operators.timeseries import interarrival_stats
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = (
        # user 1: gaps 10, 30 -> mean 20, std 10, cv 0.5, B = -1/3
        [(1, t0), (1, t0 + dt.timedelta(seconds=10)), (1, t0 + dt.timedelta(seconds=40))]
        # user 2: perfectly periodic gaps 5,5,5 -> cv 0, B = -1
        + [(2, t0 + dt.timedelta(seconds=5 * i)) for i in range(4)]
        # user 3: only 2 events -> filtered by min_events=3
        + [(3, t0), (3, t0 + dt.timedelta(seconds=1))]
    )
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {r["user_id"]: r for r in interarrival_stats(df, "user_id", "ts").collect()}
    assert set(got) == {1, 2}
    assert got[1]["mean_gap_s"] == 20.0
    assert got[1]["std_gap_s"] == 10.0
    assert got[1]["cv"] == 0.5
    assert got[1]["burstiness"] == pytest.approx(-1 / 3, abs=1e-6)
    assert got[1]["max_gap_s"] == 30.0
    assert got[2]["cv"] == 0.0 and got[2]["burstiness"] == -1.0


# --------------------------------------------------- lsh_parameter_plan
def test_lsh_plan_formula_and_structure(spark):
    from swivel_spark_prep_spark.operators.dedup import lsh_parameter_plan

    rows = lsh_parameter_plan(spark, num_hashes=128, threshold=0.8).collect()
    assert len(rows) == 8  # divisors of 128: r in {1,2,4,8,16,32,64,128}
    for r in rows:
        assert r["b"] * r["r"] == 128
        expect = 1.0 - (1.0 - 0.8 ** r["r"]) ** r["b"]
        assert abs(r["p_at_threshold"] - expect) < 1e-6
        assert abs(r["crossover"] - (1.0 / r["b"]) ** (1.0 / r["r"])) < 1e-6
        assert abs(r["total_mass"] - (r["fp_mass"] + r["fn_mass"])) < 2e-6
    # the classic (16 bands x 8 rows) regime must beat the degenerate ends
    by_r = {r["r"]: r["total_mass"] for r in rows}
    assert by_r[8] < by_r[1] and by_r[8] < by_r[128]


def test_lsh_plan_validation(spark):
    from swivel_spark_prep_spark.operators.dedup import lsh_parameter_plan

    with pytest.raises(ValueError):
        lsh_parameter_plan(spark, 128, 0.0)
    with pytest.raises(ValueError):
        lsh_parameter_plan(spark, 0, 0.5)


# -------------------------------------------------------- heaps_law_fit
def _bucket(doc_id, n, salt="heaps"):
    return int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16) % n + 1


def test_heaps_exact_replication_tiny(spark):
    from swivel_spark_prep_spark.operators.textstats import heaps_law_fit

    docs = [(i, f"w{i % 7} w{i % 5} common") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = heaps_law_fit(df, n_points=4).collect()[0]
    # brute-force replay
    toks = [(_bucket(i, 4), w) for i, t in docs for w in t.split(" ") if w]
    pts = []
    for f in range(1, 5):
        N = sum(1 for b, _ in toks if b <= f)
        V = len({w for b, w in toks if b <= f})
        if N > 0 and V > 0:
            pts.append((math.log(N), math.log(V), N, V))
    m = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts); sxy = sum(p[0] * p[1] for p in pts)
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / m)
    assert r["n_points"] == m
    assert r["total_tokens"] == max(p[2] for p in pts)
    assert r["vocab"] == max(p[3] for p in pts)
    assert abs(r["beta"] - beta) < 1e-5
    assert abs(r["k"] - k) < 1e-4 * max(k, 1.0)


def test_heaps_sublinear_on_fixture(spark, sf_dir):
    """The fixture corpus draws from a small fixed word list, so the
    vocabulary SATURATES within the first prefix — the fit must report
    beta ≈ 0 (no growth), the honest answer for a closed vocabulary."""
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.textstats import heaps_law_fit

    docs = load_table(spark, sf_dir, "documents")
    r = heaps_law_fit(docs).collect()[0]
    assert r["n_points"] == 10
    assert r["total_tokens"] > r["vocab"] > 0
    assert r["beta"] is not None and 0.0 <= r["beta"] < 0.2


def test_heaps_open_vocabulary_growth(spark):
    """Every doc introduces one new word next to one shared word:
    V(N) = N/2 + 1 exactly, so the log-log slope must sit near 1 —
    the open-vocabulary end of the Heaps spectrum."""
    from swivel_spark_prep_spark.operators.textstats import heaps_law_fit

    docs = [(i, f"common w{i}") for i in range(2000)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = heaps_law_fit(df).collect()[0]
    assert r["vocab"] == 2001
    assert 0.9 < r["beta"] <= 1.05
    assert r["r2"] > 0.99


def test_heaps_validation(spark):
    from swivel_spark_prep_spark.operators.textstats import heaps_law_fit

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        heaps_law_fit(df, n_points=1)


# ------------------------------------------------------------ CLI
def test_cli_lsh_plan(spark, capsys):
    from swivel_spark_prep_spark import cli

    rc = cli.main(["lsh-plan", "--num-hashes", "64", "--threshold", "0.7"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln and not ln.startswith(("b\t", "#"))]
    assert len(lines) == 7  # divisors of 64
    assert "# best trade:" in out
