"""Round-11 operator pins.

1. interval_overlap_count (sweep-line, asof.py): result parity with the
   pair-materializing interval_overlap_join it replaces in X87, boundary
   semantics of the half-open intervals, zero-count passthrough for
   empty/NULL a-rows, and the scale pins — no single-partition window,
   no cartesian/BNLJ, no pair relation anywhere in the plan.
2. PII scrub family (operators/pii.py): per-category detection hits and
   misses, Luhn checksum truth table, the luhn_cards strict-card filter,
   redaction placeholder order, and scrubbed-text completeness (rescan
   of redacted output finds nothing).
3. Graph census ops (operators/graph.py): triangle counts on K4 /
   triangle-free graphs with canonicalization noise, a no-cartesian
   plan pin, and k-core peeling that provably needs multiple rounds.
4. NDCG@k (evalmetrics) and sample ACF (timeseries): hand-computed
   values, k-cutoff + tie-break determinism, partitioned-window plan
   pin, periodic/constant-series ACF behavior, zero-variance NULL.
5. Spearman rho (evalmetrics): hand-computed tie cases, grouped form,
   no-global-window plan pins.
6. URL/domain ops (operators/urls.py): host/registered-domain shapes
   incl. userinfo/port/malformed, blocklist NULL-survival semantics,
   broadcast-join plan pin.
7. CUSUM (timeseries): closed window form == Page's sequential
   recursion (incl. clamp restarts + slack), constant series all-zero.
8. coverage_select (sampling): strict-before threshold semantics,
   deterministic tie order, grouped form, no-global-window plan pin.
9. stream_cusum (streaming): per-batch outputs bit-match the fixed-mean
   batch operator over the concatenated stream (virtual-element carry),
   silent groups keep state, one state row per group, alarm column.
10. logreg (operators/linear.py): separable data learned to confidence,
    intercept-only model converges to the class prior, binary feature
    flag, empty-label rejection.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_table
from swivel_spark_prep_spark.operators.asof import (
    interval_overlap_count,
    interval_overlap_join,
)
from swivel_spark_prep_spark.plans import (
    physical_plan,
    unpartitioned_window_count,
)


def _ts(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id string, s_start timestamp, s_end timestamp")


@pytest.fixture(scope="module")
def sessions(spark, sf_dir):
    from swivel_spark_prep_spark.streaming import session_agg

    sess = session_agg(load_table(spark, sf_dir, "events"), "30 minutes")
    df = sess.cache()
    yield df
    df.unpersist()


def test_overlap_count_matches_pair_join(spark, sessions):
    """The sweep-line counts must equal COUNT(*) over the bucketized
    pair join, per a-row — the exactness pin that lets X87 ride the
    linear plan (the pair join's wall followed the quadratic pair set:
    440 s at sf1; the sweep is two order statistics per session)."""
    a = sessions.filter(F.col("user_id") % 2 == 0)
    b = sessions.filter(F.col("user_id") % 2 == 1)
    pair = {
        (r["u"], r["st"]): r["n"]
        for r in interval_overlap_join(a, b, bucket_seconds=1800)
        .groupBy(F.col("a_user_id").alias("u"), F.col("a_s_start").alias("st"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    swept = {
        (r["user_id"], r["s_start"]): r["n_overlaps"]
        for r in interval_overlap_count(a, b).collect()
    }
    assert len(swept) == a.count()  # every a-row present, zero-count included
    for key, n in swept.items():
        assert pair.get(key, 0) == n, key
    assert sum(swept.values()) == sum(pair.values())


def test_overlap_count_halfopen_boundaries(spark):
    """[0,10) and [10,20) touch but do not overlap; [9,20) does; an
    interval strictly inside another counts; disjoint-by-far counts 0."""
    a = _frame(
        spark,
        [
            ("touch", _ts(0), _ts(10)),
            ("over", _ts(0), _ts(10)),
            ("inside", _ts(3), _ts(4)),
            ("far", _ts(20), _ts(21)),
        ],
    )
    b = _frame(
        spark,
        [
            ("b1", _ts(10), _ts(20)),  # touches `touch` — NOT an overlap
            ("b2", _ts(9), _ts(9, 30)),  # overlaps [0,10)
            ("b3", _ts(2), _ts(5)),  # contains `inside`
        ],
    )
    got = {r["id"]: r["n_overlaps"] for r in interval_overlap_count(a, b).collect()}
    assert got == {"touch": 2, "over": 2, "inside": 1, "far": 0}


def test_overlap_count_empty_and_null_rows(spark):
    """Empty (end <= start) or NULL-bounded a-rows come back with 0;
    empty/NULL b-rows match nothing."""
    a = _frame(
        spark,
        [
            ("ok", _ts(0), _ts(10)),
            ("empty", _ts(5), _ts(5)),
            ("inverted", _ts(9), _ts(1)),
            ("nullend", _ts(1), None),
        ],
    )
    b = _frame(
        spark,
        [
            ("b1", _ts(1), _ts(2)),
            ("bempty", _ts(1), _ts(1)),  # would sit inside `ok` if non-empty
            ("bnull", None, _ts(4)),
        ],
    )
    got = {r["id"]: r["n_overlaps"] for r in interval_overlap_count(a, b).collect()}
    assert got == {"ok": 1, "empty": 0, "inverted": 0, "nullend": 0}


def test_overlap_count_identical_rows_distinct_contract(spark):
    """Duplicate a-rows collapse (documented contract: attach a key);
    the count for the surviving row is still correct."""
    a = _frame(spark, [("dup", _ts(0), _ts(10)), ("dup", _ts(0), _ts(10))])
    b = _frame(spark, [("b", _ts(5), _ts(6))])
    rows = interval_overlap_count(a, b).collect()
    assert len(rows) == 1 and rows[0]["n_overlaps"] == 1


def test_overlap_count_plan_is_scale_safe(spark, sessions):
    """The plan must carry NO unpartitioned window, NO cartesian/
    broadcast-nested-loop join, and NO join keyed on time buckets —
    the whole point of the sweep is that candidate pairs never exist."""
    a = sessions.filter(F.col("user_id") % 2 == 0)
    b = sessions.filter(F.col("user_id") % 2 == 1)
    out = interval_overlap_count(a, b)
    assert unpartitioned_window_count(out) == 0
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- PII


def _pii_df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")


def test_pii_scan_categories(spark):
    from swivel_spark_prep_spark.operators.pii import pii_scan

    df = _pii_df(
        spark,
        [
            "mail me at a.b+c@sub.example.co and x_1%d@ex.io today",
            "call 555-867-5309 or 555.867.5309 but not 55-867-5309",
            "host 192.168.1.77 gateway 10.0.0.1",
            "ssn 123-45-6789 overlaps nothing else",
            "card 4111111111111111 and short 123456789012 ignored",
            "no pii here at all, just words and 42",
        ],
    )
    rows = {r["id"]: r for r in pii_scan(df).collect()}
    assert rows[0]["pii_email"] == 2 and rows[0]["pii_total"] == 2
    assert rows[1]["pii_phone"] == 2 and rows[1]["pii_ssn"] == 0
    assert rows[2]["pii_ipv4"] == 2
    # the SSN shape must NOT also count as a phone (3-2-4 vs 3-3-4)
    assert rows[3]["pii_ssn"] == 1 and rows[3]["pii_phone"] == 0
    # 12-digit run is below the 13-16 card window
    assert rows[4]["pii_card"] == 1
    assert rows[5]["pii_total"] == 0


def test_luhn_check(spark):
    from swivel_spark_prep_spark.operators.pii import luhn_check

    df = spark.createDataFrame(
        [
            ("4111111111111111", True),   # classic Visa test number
            ("4111111111111112", False),  # off-by-one check digit
            ("79927398713", True),        # canonical Luhn example
            ("79927398710", False),
            ("", False),
            (None, False),
            ("41x1", False),
        ],
        "s string, want boolean",
    )
    import pyspark.sql.functions as F

    bad = df.filter(luhn_check("s") != F.col("want"))
    assert bad.count() == 0, bad.collect()


def test_pii_scan_luhn_cards_filters_random_runs(spark):
    from swivel_spark_prep_spark.operators.pii import pii_scan

    df = _pii_df(spark, ["valid 4111111111111111 invalid 4111111111111112"])
    loose = pii_scan(df).collect()[0]
    strict = pii_scan(df, luhn_cards=True).collect()[0]
    assert loose["pii_card"] == 2 and strict["pii_card"] == 1


def test_pii_redact_order_and_completeness(spark):
    from swivel_spark_prep_spark.operators.pii import pii_redact, pii_scan

    df = _pii_df(
        spark,
        ["reach a@b.io or 555-867-5309, ssn 123-45-6789, ip 10.0.0.1, card 4111111111111111"],
    )
    red = pii_redact(df, out_col="r")
    txt = red.collect()[0]["r"]
    assert "<EMAIL>" in txt and "<PHONE>" in txt and "<SSN>" in txt
    assert "<IPV4>" in txt and "<CARD>" in txt
    # structured hyphen shapes were consumed by their own placeholder,
    # not the bare card digit-run, and nothing detectable remains
    assert "123-45" not in txt and "867-5309" not in txt
    assert pii_scan(red, text_col="r").collect()[0]["pii_total"] == 0


# -------------------------------------------------------------- graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_triangle_stats_k4_and_canonicalization(spark):
    """K4 has 4 triangles / 12 wedges / transitivity 1.0; duplicate,
    reversed, and self-loop edges must collapse in the canonical form."""
    from swivel_spark_prep_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    noisy = k4 + [("b", "a"), ("c", "c"), ("a", "b")]
    r = triangle_stats(_edges(spark, noisy)).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 6, 12, 4)
    assert abs(r["transitivity"] - 1.0) < 1e-12


def test_triangle_stats_triangle_free(spark):
    from swivel_spark_prep_spark.operators.graph import triangle_stats

    path = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    r = triangle_stats(path).collect()[0]
    assert r["n_triangles"] == 0 and r["n_wedges"] == 2
    assert r["transitivity"] == 0.0


def test_triangle_stats_plan_no_cartesian(spark):
    from swivel_spark_prep_spark.operators.graph import triangle_stats
    from swivel_spark_prep_spark.plans import physical_plan

    plan = physical_plan(triangle_stats(_edges(spark, [("a", "b")])))
    assert "CartesianProduct" not in plan


def test_k_core_peels_chain_into_clique(spark):
    """K4 with a pendant chain: the 3-core is exactly the clique, and
    the chain forces MULTI-ROUND peeling (each round exposes the next
    chain node) — the fixpoint loop, not a single degree filter."""
    from swivel_spark_prep_spark.operators.graph import k_core

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    chain = [("d", "e"), ("e", "f"), ("f", "g")]
    got = {r["node"]: r["core_degree"] for r in k_core(_edges(spark, k4 + chain), 3).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # single-round degree filter would have kept e (degree 2 < 3 only
    # after f drops): prove multi-round by checking the 2-core too
    got2 = {r["node"] for r in k_core(_edges(spark, k4 + chain), 2).collect()}
    assert got2 == set("abcd")


def test_k_core_empty_when_k_exceeds_degrees(spark):
    from swivel_spark_prep_spark.operators.graph import k_core

    rows = k_core(_edges(spark, [("a", "b"), ("b", "c")]), 5).collect()
    assert rows == []


# ----------------------------------------------------- ranking / ACF


def test_ndcg_hand_computed(spark):
    """rels [3,2,0] ranked by score as [2,3,0]: DCG = 3/1 + 7/log2(3),
    IDCG = 7/1 + 3/log2(3); perfect ordering scores exactly 1; a group
    with all-zero relevance yields NULL."""
    import math

    from swivel_spark_prep_spark.operators.evalmetrics import ndcg_at_k

    df = spark.createDataFrame(
        [
            ("q1", "i1", 3, 0.5),   # rank 2 by score, rank 1 ideal
            ("q1", "i2", 2, 0.9),   # rank 1 by score
            ("q1", "i3", 0, 0.1),
            ("q2", "i1", 1, 0.9),   # already ideal
            ("q2", "i2", 0, 0.5),
            ("q3", "i1", 0, 0.9),   # no relevant items
        ],
        "q string, item string, rel int, score double",
    )
    got = {r["q"]: r["ndcg"] for r in ndcg_at_k(df, "q", "item", "rel", "score").collect()}
    dcg = 3.0 / 1 + 7.0 / math.log2(3)
    idcg = 7.0 / 1 + 3.0 / math.log2(3)
    assert abs(got["q1"] - dcg / idcg) < 1e-12
    assert got["q2"] == 1.0
    assert got["q3"] is None


def test_ndcg_k_cutoff_and_tie_break(spark):
    """Only the top-k scored items contribute to DCG, and equal scores
    are broken by item id — the metric must be run-deterministic."""
    from swivel_spark_prep_spark.operators.evalmetrics import ndcg_at_k

    df = spark.createDataFrame(
        [("q", f"i{j}", 1 if j == 5 else 0, 0.5) for j in range(6)],
        "q string, item string, rel int, score double",
    )
    # all scores tie -> rank order is item order i0..i5; the single
    # relevant item i5 sits at rank 6, outside k=5 -> DCG@5 = 0
    got = ndcg_at_k(df, "q", "item", "rel", "score", k=5).collect()[0]
    assert got["ndcg"] == 0.0


def test_ndcg_windows_are_partitioned(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import ndcg_at_k
    from swivel_spark_prep_spark.plans import unpartitioned_window_count

    df = spark.createDataFrame(
        [("q", "i", 1, 0.5)], "q string, item string, rel int, score double"
    )
    assert unpartitioned_window_count(ndcg_at_k(df, "q", "item", "rel", "score")) == 0


def test_autocorrelation_periodic_and_constant(spark):
    """A period-2 alternating series has ACF -1 at lag 1 and +1 at
    lag 2; a constant series has zero variance -> NULL ACF; gap
    indexes drop pairs (n_pairs reflects the overlap)."""
    from swivel_spark_prep_spark.operators.timeseries import autocorrelation

    rows = [("alt", t, float(t % 2)) for t in range(10)]
    rows += [("const", t, 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    got = {(r["g"], r["lag"]): r for r in autocorrelation(df, "g", "t", "x", 2).collect()}
    assert abs(got[("alt", 1)]["acf"] + 1.0) < 1e-12
    assert abs(got[("alt", 2)]["acf"] - 1.0) < 1e-12
    assert got[("alt", 1)]["n_pairs"] == 9
    assert got[("const", 1)]["acf"] is None


def test_autocorrelation_rejects_bad_lag(spark):
    from swivel_spark_prep_spark.operators.timeseries import autocorrelation

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, x double")
    with pytest.raises(ValueError):
        autocorrelation(df, "g", "t", "x", 0)


def test_spearman_hand_computed(spark):
    """Monotone (with ties) -> 1; reversed -> -1; the [3,1,2] pattern
    -> -0.5; constant column -> NULL; NULL rows pairwise-excluded."""
    from swivel_spark_prep_spark.operators.evalmetrics import spearman_corr

    def rho(pairs):
        df = spark.createDataFrame(pairs, "a double, b double")
        return spearman_corr(df, "a", "b").collect()[0]["rho"]

    assert abs(rho([(1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)]) - 1.0) < 1e-12
    assert abs(rho([(1.0, 40.0), (2.0, 20.0), (3.0, 10.0)]) + 1.0) < 1e-12
    assert abs(rho([(1.0, 3.0), (2.0, 1.0), (3.0, 2.0)]) + 0.5) < 1e-12
    assert rho([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)]) is None
    assert abs(rho([(1.0, 1.0), (2.0, 2.0), (None, 9.0), (3.0, None)]) - 1.0) < 1e-12


def test_spearman_grouped_and_plan(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import spearman_corr
    from swivel_spark_prep_spark.plans import unpartitioned_window_count

    rows = [("g1", float(i), float(i * i)) for i in range(5)]
    rows += [("g2", float(i), float(-i)) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    out = spearman_corr(df, "a", "b", group_col="g")
    got = {r["g"]: r["rho"] for r in out.collect()}
    assert abs(got["g1"] - 1.0) < 1e-12 and abs(got["g2"] + 1.0) < 1e-12
    assert unpartitioned_window_count(out) == 0
    assert unpartitioned_window_count(spearman_corr(df, "a", "b")) == 0


# ---------------------------------------------------------------- URLs


def test_extract_domain_shapes(spark):
    from swivel_spark_prep_spark.operators.urls import extract_domain

    df = spark.createDataFrame(
        [
            ("https://www.Example.COM/path?q=1", "example.com", "www.example.com"),
            ("http://user:pw@a.b.news.co/x", "news.co", "a.b.news.co"),
            ("ftp://files.example.org", "example.org", "files.example.org"),
            ("https://localhost:8080/admin", "localhost", "localhost"),
            ("no-scheme.example.com/path", None, None),
            ("", None, None),
            (None, None, None),
        ],
        "url string, want_reg string, want_host string",
    )
    bad = df.filter(
        ~(
            extract_domain("url").eqNullSafe(F.col("want_reg"))
            & extract_domain("url", registered=False).eqNullSafe(F.col("want_host"))
        )
    )
    assert bad.count() == 0, bad.collect()


def test_blocklist_filter_and_null_survival(spark):
    from swivel_spark_prep_spark.operators.urls import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "https://spam.bad.com/x"),
            (2, "https://ok.good.org/y"),
            (3, "not a url"),
        ],
        "id int, url string",
    )
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    surv = {r["id"] for r in blocklist_filter(docs, bl).collect()}
    assert surv == {2, 3}  # blocked domain gone, NULL-domain row survives


def test_blocklist_is_broadcast(spark):
    from swivel_spark_prep_spark.operators.urls import blocklist_filter
    from swivel_spark_prep_spark.plans import physical_plan

    docs = spark.createDataFrame([(1, "https://a.com/x")], "id int, url string")
    bl = spark.createDataFrame([("b.com",)], "domain string")
    assert "BroadcastHashJoin" in physical_plan(blocklist_filter(docs, bl))


# ------------------------------------------------- CUSUM / coverage


def test_cusum_matches_sequential_recursion(spark):
    """The closed window form must equal Page's sequential recursion
    exactly, including clamp-to-zero restarts, on a series with a real
    mean shift and nonzero slack."""
    from swivel_spark_prep_spark.operators.timeseries import cusum

    xs = [5.0, 5.2, 4.9, 5.1, 5.0, 7.8, 8.1, 8.0, 7.9, 8.2]
    slack = 0.25
    mu = sum(xs) / len(xs)
    sp = sn = 0.0
    want = []
    for x in xs:
        sp = max(0.0, sp + (x - mu - slack))
        sn = max(0.0, sn - (x - mu + slack))
        want.append((sp, sn))
    df = spark.createDataFrame(
        [("s", t, x) for t, x in enumerate(xs)], "g string, t int, x double"
    )
    got = cusum(df, "g", "t", "x", slack=slack).orderBy("t").collect()
    for r, (wp, wn) in zip(got, want):
        assert abs(r["cusum_pos"] - wp) < 1e-9 and abs(r["cusum_neg"] - wn) < 1e-9
    # the shift at t=5 must dominate the statistic's maximum
    assert max(r["cusum_pos"] for r in got) == got[-1]["cusum_pos"]


def test_cusum_constant_series_is_zero(spark):
    from swivel_spark_prep_spark.operators.timeseries import cusum

    df = spark.createDataFrame(
        [("s", t, 3.0) for t in range(6)], "g string, t int, x double"
    )
    for r in cusum(df, "g", "t", "x").collect():
        assert r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0


def test_coverage_select_threshold_semantics(spark):
    """Keep rows while the share BEFORE is < p: weights [5,3,2] at
    p=0.5 keep exactly [5]; p=0.51 keeps [5,3]; p=1.0 keeps all and the
    last cum_share is exactly 1."""
    from swivel_spark_prep_spark.operators.sampling import coverage_select

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0), ("c", 2.0)], "k string, w double"
    )
    assert [r["k"] for r in coverage_select(df, "w", 0.5, ["k"]).collect()] == ["a"]
    assert [r["k"] for r in coverage_select(df, "w", 0.51, ["k"]).collect()] == ["a", "b"]
    full = coverage_select(df, "w", 1.0, ["k"]).collect()
    assert [r["k"] for r in full] == ["a", "b", "c"]
    assert abs(full[-1]["cum_share"] - 1.0) < 1e-12


def test_coverage_select_grouped_ties_and_plan(spark):
    from swivel_spark_prep_spark.operators.sampling import coverage_select
    from swivel_spark_prep_spark.plans import unpartitioned_window_count

    df = spark.createDataFrame(
        [("g1", "b", 2.0), ("g1", "a", 2.0), ("g1", "c", 1.0), ("g2", "z", 9.0)],
        "g string, k string, w double",
    )
    out = coverage_select(df, "w", 0.6, ["k"], group_col="g")
    rows = [(r["g"], r["k"]) for r in out.collect()]
    # g1: ties 2.0/2.0 break on key — "a" first; before("a")=0 < .6,
    # before("b")=0.4 < .6, before("c")=0.8 stops; g2: single row
    assert rows == [("g1", "a"), ("g1", "b"), ("g2", "z")]
    assert unpartitioned_window_count(out) == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        coverage_select(df, "w", 0.0, ["k"])


# ------------------------------------- randomized brute-force parity
# One seeded batch per operator, a single Spark job each, compared
# element-wise against a pure-Python brute-force reference — the
# Spark-efficient form of a property test (hundreds of cases, one job).


def test_overlap_count_random_brute_force(spark):
    import random

    rng = random.Random(411)
    mk = lambda n: [  # noqa: E731
        (f"i{j}", _ts(0) + datetime.timedelta(minutes=rng.randrange(0, 500)), None)
        for j in range(n)
    ]
    a_rows, b_rows = [], []
    for j in range(120):
        s = rng.randrange(0, 500)
        a_rows.append((f"a{j}", _ts(0) + datetime.timedelta(minutes=s),
                       _ts(0) + datetime.timedelta(minutes=s + rng.randrange(0, 90))))
    for j in range(150):
        s = rng.randrange(0, 500)
        b_rows.append((f"b{j}", _ts(0) + datetime.timedelta(minutes=s),
                       _ts(0) + datetime.timedelta(minutes=s + rng.randrange(0, 90))))
    want = {
        ka: sum(
            1
            for (_, bs, be) in b_rows
            if bs < be and s < be and bs < e  # non-empty + half-open overlap
        ) if s < e else 0
        for (ka, s, e) in a_rows
    }
    got = {
        r["id"]: r["n_overlaps"]
        for r in interval_overlap_count(
            _frame(spark, a_rows), _frame(spark, b_rows)
        ).collect()
    }
    assert got == want


def test_luhn_random_brute_force(spark):
    import random

    from swivel_spark_prep_spark.operators.pii import luhn_check

    rng = random.Random(412)

    def brute(s):
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    cases = ["".join(rng.choice("0123456789") for _ in range(rng.randrange(2, 20)))
             for _ in range(300)]
    df = spark.createDataFrame([(c, brute(c)) for c in cases], "s string, want boolean")
    assert df.filter(luhn_check("s") != F.col("want")).count() == 0


def test_triangle_stats_random_brute_force(spark):
    import itertools
    import random

    from swivel_spark_prep_spark.operators.graph import triangle_stats

    rng = random.Random(413)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = [(u, v) for u, v in itertools.combinations(nodes, 2) if rng.random() < 0.25]
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(
        1
        for u, v, w in itertools.combinations(nodes, 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    r = triangle_stats(_edges(spark, edges)).collect()[0]
    assert r["n_triangles"] == tri and r["n_wedges"] == wedges
    assert r["n_edges"] == len(edges)


def test_coverage_select_random_brute_force(spark):
    import random

    from swivel_spark_prep_spark.operators.sampling import coverage_select

    rng = random.Random(414)
    rows = [(f"k{i:03d}", float(rng.randrange(1, 50))) for i in range(80)]
    p = 0.7
    total = sum(w for _, w in rows)
    order = sorted(rows, key=lambda kw: (-kw[1], kw[0]))
    want, acc = [], 0.0
    for k, w in order:
        if acc / total < p:
            want.append(k)
        acc += w
    df = spark.createDataFrame(rows, "k string, w double")
    got = [r["k"] for r in coverage_select(df, "w", p, ["k"]).collect()]
    assert got == want


def test_stream_cusum_matches_batch_and_carries_state(spark, tmp_path):
    """Concatenating the per-batch outputs of the streaming CUSUM must
    bit-match the batch operator with the same fixed mean over ALL rows
    (the virtual-element carry identity is exact); a group silent in the
    last batch keeps its statistics in state; state is one row per
    group; the threshold produces the alarm column."""
    import glob
    import shutil

    from swivel_spark_prep_spark.operators.timeseries import cusum
    from swivel_spark_prep_spark.streaming import stream_cusum

    mu, slack = 5.0, 0.1
    rows = []
    for t in range(30):
        rows.append(("a", t, 5.0 + (3.0 if t >= 18 else 0.0) + (t % 3) * 0.1))
        if t < 20:  # "b" goes silent in the last third
            rows.append(("b", t, 5.0 - (t % 4) * 0.05))
    full = spark.createDataFrame(rows, "g string, t int, x double")

    stage, drops = tmp_path / "stage", tmp_path / "drops"
    drops.mkdir()
    for i in range(3):  # batches split BY TIME: the fold order matters
        part = full.filter((F.col("t") >= i * 10) & (F.col("t") < (i + 1) * 10))
        part.coalesce(1).write.parquet(str(stage / f"b{i}"))
        f = glob.glob(str(stage / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(drops / f"{i:02d}.parquet"))

    stream = (
        spark.readStream.schema("g string, t int, x double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drops))
    )
    q = stream_cusum(
        stream,
        "g",
        "t",
        "x",
        mu=mu,
        state_dir=str(tmp_path / "state"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        slack=slack,
        threshold=3.0,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["g"], r["t"]): (r["cusum_pos"], r["cusum_neg"], r["alarm"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r["g"], r["t"]): (r["cusum_pos"], r["cusum_neg"])
        for r in cusum(full, "g", "t", "x", slack=slack, mu=mu).collect()
    }
    assert set(got) == set(want)
    for k, (wp, wn) in want.items():
        gp, gn, alarm = got[k]
        assert abs(gp - wp) < 1e-9 and abs(gn - wn) < 1e-9, k
        # the alarm is defined over the EMITTED statistics (comparing
        # against the batch twin's value here would be ulp-flaky when a
        # statistic lands exactly on the threshold)
        assert alarm == (gp >= 3.0 or gn >= 3.0)
    # the shift in "a" must actually alarm
    assert any(al for (g, _), (_, _, al) in got.items() if g == "a")

    last = max(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(str(tmp_path / "state" / "cusum" / "batch_id=*"))
    )
    state = {
        r["g"]: (r["s_pos"], r["s_neg"])
        for r in spark.read.parquet(
            str(tmp_path / "state" / "cusum" / f"batch_id={last}")
        ).collect()
    }
    assert set(state) == {"a", "b"}  # one row per group, silent "b" carried
    assert abs(state["b"][0] - want[("b", 19)][0]) < 1e-9
    assert abs(state["a"][0] - want[("a", 29)][0]) < 1e-9


# ---------------------------------------------------------- logreg


def test_logreg_learns_separable_data(spark):
    """A feature perfectly aligned with the label must be learned to
    high confidence; the intercept path keeps the opposite class low."""
    from swivel_spark_prep_spark.operators.linear import logreg_fit, logreg_score

    feats = spark.createDataFrame(
        [(i, 7, 1.0) for i in range(10)]          # all docs share bucket 7
        + [(i, 3, 1.0) for i in range(5)],        # label-1 docs also have bucket 3
        "id int, bucket long, cnt double",
    )
    labels = spark.createDataFrame(
        [(i, 1 if i < 5 else 0) for i in range(10)], "id int, y int"
    )
    w = logreg_fit(feats, labels, lr=2.0, iterations=40)
    scored = {r["id"]: r["p"] for r in logreg_score(feats, w).collect()}
    assert all(scored[i] > 0.8 for i in range(5))
    assert all(scored[i] < 0.2 for i in range(5, 10))


def test_logreg_intercept_learns_prior(spark):
    """With identical features everywhere, the model can only learn the
    class prior — every score must approach it (and without an
    intercept it would be stuck at 0.5 only when the prior is 0.5)."""
    from swivel_spark_prep_spark.operators.linear import logreg_fit, logreg_score

    feats = spark.createDataFrame(
        [(i, 7, 1.0) for i in range(10)], "id int, bucket long, cnt double"
    )
    labels = spark.createDataFrame(
        [(i, 1 if i < 3 else 0) for i in range(10)], "id int, y int"
    )
    w = logreg_fit(feats, labels, lr=1.0, iterations=60)
    ps = [r["p"] for r in logreg_score(feats, w).collect()]
    assert all(abs(p - 0.3) < 0.05 for p in ps)


def test_hashed_word_features_binary_flag(spark):
    from swivel_spark_prep_spark.operators.linear import hashed_word_features

    docs = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    raw = {r["bucket"]: r["cnt"] for r in hashed_word_features(docs, dim=64).collect()}
    bin_ = {r["bucket"]: r["cnt"] for r in hashed_word_features(docs, dim=64, binary=True).collect()}
    assert sorted(raw.values()) == [1.0, 3.0]
    assert sorted(bin_.values()) == [1.0, 1.0]
    assert set(raw) == set(bin_)


def test_logreg_requires_labels(spark):
    from swivel_spark_prep_spark.operators.linear import logreg_fit

    feats = spark.createDataFrame([(1, 7, 1.0)], "id int, bucket long, cnt double")
    empty = spark.createDataFrame([], "id int, y int")
    with pytest.raises(ValueError):
        logreg_fit(feats, empty, iterations=1)
