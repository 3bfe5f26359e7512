"""Round-11e extension operators (the X190–X192 family):

1. ols_fit (operators/linear.py): exact coefficient recovery on a
   noiseless synthetic design (R² = 1); the pure-Python solver matches
   numpy; singular designs raise; NULL rows excluded from n.
2. rfm_segments (operators/timeseries.py): hand-built stream pins the
   recency inversion, the strictly-greater tier arithmetic, and the
   segment string; validation.
(X190 is a pure relational query — oracle parity is its test.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- ols_fit
def test_ols_exact_recovery(spark):
    from swivel_spark_prep_spark.operators.linear import ols_fit

    rows = [
        (float(i % 7), float((i * 3) % 5), 2.0 * (i % 7) - 3.0 * ((i * 3) % 5) + 5.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "x0 double, x1 double, y double")
    got = {r["term"]: r["value"] for r in ols_fit(df, ["x0", "x1"], "y").collect()}
    assert got["x0"] == pytest.approx(2.0, abs=1e-9)
    assert got["x1"] == pytest.approx(-3.0, abs=1e-9)
    assert got["intercept"] == pytest.approx(5.0, abs=1e-9)
    assert got["r2"] == pytest.approx(1.0, abs=1e-12)
    assert got["n"] == 200.0


def test_ols_null_rows_excluded_and_noise(spark):
    from swivel_spark_prep_spark.operators.linear import ols_fit

    rows = [(float(i), 1.0 * i + ((-1) ** i) * 0.5) for i in range(50)]
    rows += [(None, 1.0), (1.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {r["term"]: r["value"] for r in ols_fit(df, ["x"], "y").collect()}
    assert got["n"] == 50.0
    assert got["x"] == pytest.approx(1.0, abs=0.01)
    assert 0.99 < got["r2"] <= 1.0


def test_ols_singular_and_validation(spark):
    from swivel_spark_prep_spark.operators.linear import _gauss_solve, ols_fit

    const = spark.createDataFrame(
        [(1.0, 1.0, float(i)) for i in range(10)], "x0 double, x1 double, y double"
    )
    # x0 == x1 == intercept direction -> singular normal equations
    with pytest.raises(Exception):
        ols_fit(const, ["x0", "x1"], "y").collect()
    with pytest.raises(ValueError):
        ols_fit(const, [], "y")
    # pure-Python fallback solves the same system numpy does
    a = [[4.0, 2.0, 0.0], [2.0, 5.0, 1.0], [0.0, 1.0, 3.0]]
    b = [2.0, -1.0, 4.0]
    import numpy as np

    assert _gauss_solve(a, b) == pytest.approx(
        np.linalg.solve(np.array(a), np.array(b)).tolist(), abs=1e-12
    )


# -------------------------------------------------------- rfm_segments
def test_rfm_hand_computed(spark):
    import datetime as dt

    from swivel_spark_prep_spark.operators.timeseries import rfm_segments

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, day, v):
        return (u, t0 + dt.timedelta(days=day), v)

    rows = (
        # user 1: recent (day 9), 4 events, high value
        [ev(1, 6, 50.0), ev(1, 7, 50.0), ev(1, 8, 50.0), ev(1, 9, 50.0)]
        # user 2: middle (day 5), 2 events, middling value
        + [ev(2, 4, 10.0), ev(2, 5, 10.0)]
        # user 3: stale (day 0), 1 event, tiny value
        + [ev(3, 0, 1.0)]
    )
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = {r["user"]: r for r in rfm_segments(df).collect()}
    assert got[1]["recency_days"] == 0.0
    assert got[3]["recency_days"] == 9.0
    assert (got[1]["r"], got[1]["f"], got[1]["m"]) == (3, 3, 3)
    assert got[1]["segment"] == "333"
    assert got[3]["segment"] == "111"
    assert (got[2]["r"], got[2]["f"], got[2]["m"]) == (2, 2, 2)


def test_rfm_validation(spark):
    from swivel_spark_prep_spark.operators.timeseries import rfm_segments

    df = spark.createDataFrame([(1, None, 1.0)], "user_id int, ts timestamp, value double")
    with pytest.raises(ValueError):
        rfm_segments(df, n_tiles=1)


def test_rfm_scores_in_range_fixture(spark, sf_dir):
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.timeseries import rfm_segments

    ev = load_table(spark, sf_dir, "events")
    rows = rfm_segments(ev).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["r"] <= 3 and 1 <= r["f"] <= 3 and 1 <= r["m"] <= 3
        assert r["segment"] == f"{r['r']}{r['f']}{r['m']}"
        assert r["recency_days"] >= 0.0
    # tertile scores must each hit all three levels on a 1000-user stream
    for k in ("r", "f", "m"):
        assert {r[k] for r in rows} == {1, 2, 3}, k
