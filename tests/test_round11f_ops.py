"""Round-11f extension operators (the X193–X196 family):

1. substring_search (operators/search.py): result-identical to the
   naive contains() filter for long, short (<3 char fallback) and
   absent patterns; trigram_index hand-checked.
2. bootstrap_mean_ci (operators/sampling.py): deterministic across
   runs; the CI brackets the sample mean; the interval tightens with
   10x the data; validation.
3. k_anonymity_audit (operators/quality.py): hand-built violators and
   the rows-at-risk audit row; the pass verdict shape; validation.
4. collapse_bursts (operators/timeseries.py): the TRANSITIVE chain
   semantics (pairwise-close events merge even when the burst span
   exceeds the gap); exact boundary (gap == threshold chains);
   validation.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ substring_search
def test_trigram_index_hand(spark):
    from swivel_spark_prep_spark.operators.search import trigram_index

    df = spark.createDataFrame([(1, "AbCd"), (2, "xy")], "doc_id long, text string")
    got = {(r["id"], r["gram"]) for r in trigram_index(df).collect()}
    assert got == {(1, "abc"), (1, "bcd")}  # lower-cased; short text -> none


@pytest.mark.parametrize("pattern", ["merge slow", "zz_nothing_zz", "ag", "data"])
def test_substring_search_equals_naive(spark, sf_dir, pattern):
    """BOTH paths — plain scan and prebuilt-index prefilter+verify —
    must return exactly the naive filter's rows; the index is built
    once and reused across all four patterns (its amortization
    contract)."""
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.search import (
        substring_search,
        trigram_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    if not hasattr(test_substring_search_equals_naive, "_idx"):
        test_substring_search_equals_naive._idx = trigram_index(docs).persist()
    idx = test_substring_search_equals_naive._idx
    want = {
        r["doc_id"]
        for r in docs.filter(
            F.contains(F.lower("text"), F.lit(pattern.lower()))
        ).collect()
    }
    got_plain = {r["doc_id"] for r in substring_search(docs, pattern).collect()}
    got_idx = {
        r["doc_id"] for r in substring_search(docs, pattern, index=idx).collect()
    }
    assert got_plain == want and got_idx == want, pattern


# ------------------------------------------------------ bootstrap_mean_ci
def test_bootstrap_deterministic_and_brackets_mean(spark):
    from swivel_spark_prep_spark.operators.sampling import bootstrap_mean_ci

    rows = [(i, float((i * 37) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x double")
    a = bootstrap_mean_ci(df, "x", "id", replicates=100).collect()[0]
    b = bootstrap_mean_ci(df, "x", "id", replicates=100).collect()[0]
    assert a == b  # fully deterministic resampling
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    assert a["b_used"] == 100 and a["n"] == 2000
    # Poisson-bootstrap CI width ~ 2*1.96*sd/sqrt(n): sd≈28.9, n=2000
    width = a["ci_hi"] - a["ci_lo"]
    assert 0.5 * 2.53 < width < 2.0 * 2.53, width


def test_bootstrap_tightens_with_data(spark):
    from swivel_spark_prep_spark.operators.sampling import bootstrap_mean_ci

    small = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(200)], "id long, x double"
    )
    big = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(20000)], "id long, x double"
    )
    ws = [
        r["ci_hi"] - r["ci_lo"]
        for r in (
            bootstrap_mean_ci(d, "x", "id", replicates=80).collect()
            for d in (small, big)
        )
        for r in [r[0]]
    ]
    assert ws[1] < ws[0] / 3  # ~1/10 expected at 100x the data


def test_bootstrap_validation(spark):
    from swivel_spark_prep_spark.operators.sampling import bootstrap_mean_ci

    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "x", "id", replicates=1)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "x", "id", alpha=1.5)


# ------------------------------------------------------ k_anonymity_audit
def test_k_anonymity_hand(spark):
    from swivel_spark_prep_spark.operators.quality import k_anonymity_audit

    rows = (
        [("en", "a")] * 5  # compliant at k=3
        + [("en", "b")] * 2  # violator (2 rows)
        + [("fr", None)] * 1  # violator incl. NULL quasi value
    )
    df = spark.createDataFrame(rows, "lang string, src string")
    got = k_anonymity_audit(df, ["lang", "src"], k=3).collect()
    viol = {(r["lang"], r["src"]): r["n"] for r in got if r["lang"] != "__audit__"}
    audit = [r for r in got if r["lang"] == "__audit__"]
    assert viol == {("en", "b"): 2, ("fr", None): 1}
    assert len(audit) == 1 and audit[0]["n"] == 3  # rows at risk


def test_k_anonymity_pass_verdict(spark):
    from swivel_spark_prep_spark.operators.quality import k_anonymity_audit

    df = spark.createDataFrame([("x",)] * 10, "q string")
    got = k_anonymity_audit(df, ["q"], k=3).collect()
    assert len(got) == 1 and got[0]["q"] == "__audit__" and got[0]["n"] == 0


def test_k_anonymity_validation(spark):
    from swivel_spark_prep_spark.operators.quality import k_anonymity_audit

    df = spark.createDataFrame([("x",)], "q string")
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["q"], k=1)


# ------------------------------------------------------- collapse_bursts
def test_bursts_transitive_chain(spark):
    """Events at 0, 5, 10s with a 7s gap: pairwise-close events CHAIN —
    one burst spanning 10s (> the gap), which is exactly what pairwise
    'within 7s of the first event' would get wrong."""
    from swivel_spark_prep_spark.operators.timeseries import collapse_bursts

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(seconds=s)) for s in (0, 5, 10)] + [
        (1, t0 + dt.timedelta(seconds=60))  # new burst
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = sorted(
        collapse_bursts(df, ["user_id"], "ts", gap_seconds=7).collect(),
        key=lambda r: r["burst_id"],
    )
    assert len(got) == 2
    assert got[0]["n_events"] == 3 and got[0]["span_s"] == 10.0
    assert got[1]["n_events"] == 1 and got[1]["span_s"] == 0.0


def test_bursts_boundary_gap_chains(spark):
    """gap exactly == threshold stays in the burst (strictly-greater
    starts a new one) — pinned so both engines agree on the boundary."""
    from swivel_spark_prep_spark.operators.timeseries import collapse_bursts

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(seconds=30))], "user_id int, ts timestamp"
    )
    got = collapse_bursts(df, ["user_id"], "ts", gap_seconds=30).collect()
    assert len(got) == 1 and got[0]["n_events"] == 2


def test_bursts_validation(spark):
    from swivel_spark_prep_spark.operators.timeseries import collapse_bursts

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "user_id int, ts timestamp")
    with pytest.raises(ValueError):
        collapse_bursts(df, ["user_id"], "ts", gap_seconds=0)
