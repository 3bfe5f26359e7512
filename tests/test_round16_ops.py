"""Round-16 pins: the X369 BLAS-partials CKA path (round-15 verdict
Next #4 — equality-with-explode at both SFs), the jonckheere_terpstra
k²-column cap (What's wrong #2), the pmod pre-1970 time-of-day wrap
(ADVICE items 2–3), and the WARC BadGzipFile → ValueError contract
(ADVICE item 1; the parser pins live in test_kernel_properties, this
file pins the distributed read path). DuckDB oracle parity for the
same queries still runs in tests/test_llm_operators.py at both SFs."""
import datetime

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------- X369 CKA pandas path
def test_cka_pandas_equals_explode_both_sfs(spark, each_sf):
    """method='pandas' (per-Arrow-batch BLAS sufficient statistics via
    mapInPandas, the procrustes_drift shape) returns the EXACT rounded
    output of the default explode path — same n, d, cka at both smoke
    SFs. This is the executable scale alternative the round-15 verdict
    asked for (the sf1 explode constant is the dominant term at
    20k×4096 cells)."""
    from swivel_spark_prep_spark.operators.similarity import (
        cka_quantization_audit,
    )

    df = spark.read.parquet(f"{each_sf}/embeddings.parquet")
    e = cka_quantization_audit(df).collect()[0].asDict()
    p = cka_quantization_audit(df, method="pandas").collect()[0].asDict()
    assert e == p
    assert 0.0 < p["cka"] <= 1.0  # int8 round-trip keeps structure


def test_cka_rejects_unknown_method(spark):
    from swivel_spark_prep_spark.operators.similarity import (
        cka_quantization_audit,
    )

    df = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match="unknown method"):
        cka_quantization_audit(df, method="blas")


def test_cka_pandas_scale_invariance(spark):
    """CKA is scale-invariant: uniformly shrinking the space changes L2
    error but not CKA — the property that distinguishes it from X50's
    per-dimension error units. Both methods must agree on it."""
    import random

    rng = random.Random(7)
    rows = [([rng.gauss(0, 1) for _ in range(8)],) for _ in range(200)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    from swivel_spark_prep_spark.operators.similarity import (
        cka_quantization_audit,
    )

    base = cka_quantization_audit(df, method="pandas").collect()[0]
    shrunk = df.select(
        F.transform("embedding", lambda x: x * 0.25).alias("embedding")
    )
    s = cka_quantization_audit(shrunk, method="pandas").collect()[0]
    # int8 quantization error differs slightly between the two scales,
    # but the structural score must stay equal to 4 decimals
    assert abs(base["cka"] - s["cka"]) < 1e-4


# ------------------------------------------------- jonckheere k²-column cap
def test_jonckheere_caps_group_count(spark):
    """JT builds k(k-1)/2 pairwise-U aggregate COLUMNS; past 50 groups
    the failure must be a clear raise, not a Catalyst analyzer hang on
    ~500k generated expressions (round-15 verdict, What's wrong #2)."""
    from swivel_spark_prep_spark.operators.evalmetrics import (
        jonckheere_terpstra,
    )

    df = spark.range(102).select(
        (F.col("id") % 51).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(Exception, match="(?i)cap|distinct|50"):
        jonckheere_terpstra(df, "v", "g")


def test_jonckheere_still_exact_at_small_k(spark):
    """The cap change must not move the statistic: Hollander–Wolfe-style
    3-group ordered data, JT = Σ pairwise Mann–Whitney counts, checked
    against a brute-force pair count."""
    from swivel_spark_prep_spark.operators.evalmetrics import (
        jonckheere_terpstra,
    )

    data = {"a": [40.0, 35.0, 38.0, 43.0], "b": [38.0, 42.0, 44.0],
            "c": [48.0, 45.0, 49.0, 47.0]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = jonckheere_terpstra(df, "v", "g").collect()[0]
    groups = sorted(data)
    jt = 0.0
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            for x in data[a]:
                for y in data[b]:
                    jt += 1.0 if y > x else (0.5 if y == x else 0.0)
    assert out["jt"] == pytest.approx(jt)
    assert out["k"] == 3 and out["n"] == 11


# ------------------------------------------------- pmod pre-1970 wrap pins
def test_kuiper_watson_pre1970_wraps_positive(spark):
    """Time-of-day stats must be invariant to shifting every timestamp
    by whole days — including shifts that cross the 1970 epoch, where
    dividend-sign % yields negative fractions (ADVICE item 3)."""
    from swivel_spark_prep_spark.operators.timeseries import (
        kuiper_watson_uniformity,
    )

    base = datetime.datetime(1969, 6, 1, 0, 0, 0)
    rows = [(base + datetime.timedelta(hours=7 * i + 1),) for i in range(40)]
    df = spark.createDataFrame(rows, "ts timestamp")
    shifted = df.select(
        (F.col("ts") + F.expr("INTERVAL 3650 DAYS")).alias("ts")
    )
    a = kuiper_watson_uniformity(df, "ts").collect()[0].asDict()
    b = kuiper_watson_uniformity(shifted, "ts").collect()[0].asDict()
    assert a == b
    assert 0.0 < a["kuiper_v"] <= 2.0  # V is a sum of two sup-gaps in [0,1]


def test_ks_uniform_pre1970_wraps_positive(spark):
    """Same whole-day shift invariance for the X284 KS op, which moved
    to pmod in the same fix."""
    from swivel_spark_prep_spark.operators.timeseries import (
        ks_uniform_time_of_day,
    )

    base = datetime.datetime(1968, 3, 1, 0, 0, 0)
    rows = [
        ("a", base + datetime.timedelta(hours=5 * i + 2)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    shifted = df.select(
        "g", (F.col("ts") + F.expr("INTERVAL 1460 DAYS")).alias("ts")
    )
    a = sorted(
        r.asDict()
        for r in ks_uniform_time_of_day(df, "ts", group_col="g").collect()
    )
    b = sorted(
        r.asDict()
        for r in ks_uniform_time_of_day(shifted, "ts", group_col="g").collect()
    )
    assert a == b


def test_seasonal_strength_twin_pmod_note():
    """The X378 DuckDB twin's hour-of-day phase uses ((bk%24)+24)%24 —
    the positive-mod form matching F.pmod on negative bucket indices
    (ADVICE item 2). Pin the SQL text so a refactor can't silently
    regress to dividend-sign %."""
    from swivel_spark_prep_spark.queries.extra import EXTRA_ORACLES

    sql = EXTRA_ORACLES["X378_seasonal_strength"]
    assert "((bk % 24) + 24) % 24" in sql
    assert "((dt.bk % 24) + 24) % 24" in sql


# ------------------------------------------------- WARC distributed read path
def test_read_warc_malformed_member_is_valueerror(spark, tmp_path):
    """A .warc.gz with trailing garbage after a valid member must
    surface the parser's documented ValueError through the distributed
    read path (gzip.BadGzipFile is an OSError, not a zlib.error — it
    escaped the except tuple before round 16)."""
    from swivel_spark_prep_spark.sinks import warc as wk

    rec = wk.encode_record(
        "resource", "<urn:doc:0>", "2024-01-01T00:00:00Z", b"payload"
    )
    bad = wk.gzip_member(rec) + b"NOTGZIP"
    p = tmp_path / "bad.warc.gz"
    p.write_bytes(bad)
    from swivel_spark_prep_spark.sources import read_warc

    with pytest.raises(Exception, match="malformed gzip member"):
        read_warc(spark, str(p)).collect()


# ===================================================== round-16 tranche pins
def test_chatterjee_xi_brute_force(spark):
    """Tie-general ξ replays the paper's formula exactly on data with
    both x- and y-ties (deterministic x-tie break by ascending y)."""
    import random

    rng = random.Random(3)
    rows = [
        (float(rng.randint(0, 9)), float(rng.randint(0, 5))) for _ in range(60)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    from swivel_spark_prep_spark.operators.evalmetrics import chatterjee_xi

    got = chatterjee_xi(df, "x", "y").collect()[0]
    n = len(rows)
    order = sorted(range(n), key=lambda i: (rows[i][0], rows[i][1]))
    ys = [rows[i][1] for i in range(n)]
    r = [sum(1 for y in ys if y <= rows[i][1]) for i in order]
    l = [sum(1 for y in ys if y >= rows[i][1]) for i in order]
    num = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    den = sum(li * (n - li) for li in l)
    assert got["n"] == n
    # the operator rounds to 6 decimals (oracle convention)
    assert got["xi"] == round(1 - n * num / (2 * den), 6)


def test_chatterjee_xi_detects_nonmonotone_dependence(spark):
    """ξ ≈ 1 for an exact function of x (even nonmonotone), ≈ 0 for an
    x-independent y — the property Spearman cannot deliver."""
    import math as m

    rows = [(i / 100.0, m.sin(6.0 * i / 100.0)) for i in range(400)]
    df = spark.createDataFrame(rows, "x double, y double")
    from swivel_spark_prep_spark.operators.evalmetrics import chatterjee_xi

    assert chatterjee_xi(df, "x", "y").collect()[0]["xi"] > 0.9
    # independent y: RNG draws (a lattice like (i*c) % m is locally
    # linear in i and ξ rightly detects it — seen in review)
    import random

    rng = random.Random(0)
    indep = [(i / 100.0, rng.random()) for i in range(400)]
    df2 = spark.createDataFrame(indep, "x double, y double")
    assert abs(chatterjee_xi(df2, "x", "y").collect()[0]["xi"]) < 0.2


def test_cucconi_brute_force(spark):
    import math as m
    import random

    rng = random.Random(5)
    a = [rng.gauss(0, 1) for _ in range(25)]
    b = [rng.gauss(0.4, 2.0) for _ in range(20)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import cucconi_test

    got = cucconi_test(df, "v", "g", "a", "b").collect()[0]
    pooled = sorted(a + b)
    N, mm, nn = 45, 25, 20
    R = [pooled.index(v) + 1 for v in b]  # continuous draws: no ties
    s = sum(rr * rr for rr in R)
    sc = sum((N + 1 - rr) ** 2 for rr in R)
    den2 = mm * nn * (N + 1) * (2 * N + 1) * (8 * N + 11) / 5
    u = (6 * s - nn * (N + 1) * (2 * N + 1)) / m.sqrt(den2)
    v = (6 * sc - nn * (N + 1) * (2 * N + 1)) / m.sqrt(den2)
    rho = 2 * (N * N - 4) / ((2 * N + 1) * (8 * N + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert got["u"] == pytest.approx(u, abs=1e-6)
    assert got["v"] == pytest.approx(v, abs=1e-6)
    assert got["c_stat"] == pytest.approx(c, abs=1e-6)


def test_lepage_components_match_constituents(spark):
    """Lepage's z_AB equals ansari_bradley's z on the same cut, and D
    is exactly the sum of squared components."""
    import random

    rng = random.Random(7)
    rows = [("a", float(rng.randint(0, 30))) for _ in range(40)] + [
        ("b", float(rng.randint(5, 50))) for _ in range(35)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import (
        ansari_bradley,
        lepage_test,
    )

    got = lepage_test(df, "v", "g", "a", "b").collect()[0]
    ab = ansari_bradley(df, "v", "g", "a", "b").collect()[0]
    assert got["z_ab"] == pytest.approx(ab["z"], abs=1e-9)
    assert got["d_stat"] == pytest.approx(
        got["z_w"] ** 2 + got["z_ab"] ** 2, abs=1e-5
    )


def test_bws_brute_force_with_ties(spark):
    """BWS replays the 1998 formula; tied runs sum invariantly over
    the arbitrary within-run index assignment."""
    import random

    rng = random.Random(11)
    a = [float(rng.randint(0, 15)) for _ in range(30)]
    b = [float(rng.randint(3, 20)) for _ in range(25)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import bws_test

    got = bws_test(df, "v", "g", "a", "b").collect()[0]
    pooled = sorted(a + b)

    def midrank(v):
        import bisect

        lo = bisect.bisect_left(pooled, v)
        hi = bisect.bisect_right(pooled, v)
        return (lo + hi + 1) / 2

    def bstat(sample, other):
        mm, nn = len(sample), len(sample) + len(other)
        tot = 0.0
        for i, v in enumerate(sorted(sample), start=1):
            t = i / (mm + 1)
            tot += (midrank(v) - nn / mm * i) ** 2 / (
                t * (1 - t) * len(other) * nn / mm
            )
        return tot / mm

    ba, bb = bstat(a, b), bstat(b, a)
    assert got["b_a"] == pytest.approx(ba, abs=1e-6)
    assert got["b_b"] == pytest.approx(bb, abs=1e-6)
    assert got["b_stat"] == pytest.approx((ba + bb) / 2, abs=1e-6)


def test_acklam_probit_accuracy_and_sql_twin(spark):
    """The Spark probit matches an erf-bisection inverse to Acklam's
    published 1.15e-9 relative bound — including both sides of the
    central/tail branch switch — and the GENERATED SQL twin produces
    the bit-identical double in DuckDB."""
    import math as m

    import duckdb

    from pyspark.sql import functions as F
    from swivel_spark_prep_spark.operators.evalmetrics import (
        _acklam_probit,
        acklam_probit_sql,
    )

    ps = [0.5001, 0.6, 0.75, 0.9, 0.97574, 0.97575, 0.97576, 0.999,
          0.9999999]
    pdf = spark.createDataFrame([(p,) for p in ps], "p double")
    spark_vals = [
        r["a"]
        for r in pdf.select(_acklam_probit(F.col("p")).alias("a"))
        .orderBy("p")
        .collect()
    ]

    def phi(z):
        return 0.5 * (1 + m.erf(z / m.sqrt(2)))

    for p, v in zip(sorted(ps), spark_vals):
        lo, hi = 0.0, 10.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if phi(mid) < p:
                lo = mid
            else:
                hi = mid
        assert abs(v - lo) < 1.5e-9 * max(1.0, lo), (p, v, lo)
    con = duckdb.connect()
    sql = acklam_probit_sql("p")
    duck_vals = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS p)", [p]).fetchone()[0]
        for p in sorted(ps)
    ]
    assert spark_vals == duck_vals  # bit-identical doubles
    con.close()


def test_fligner_killeen_brute_force(spark):
    import math as m
    import random

    rng = random.Random(13)
    groups = {
        "g1": [rng.gauss(0, 1) for _ in range(30)],
        "g2": [rng.gauss(0, 3) for _ in range(25)],
        "g3": [rng.gauss(1, 1) for _ in range(20)],
    }
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import fligner_killeen

    got = fligner_killeen(df, "v", "g").collect()[0]

    def median(vs):
        s = sorted(vs)
        n = len(s)
        return (s[n // 2 - 1] + s[n // 2]) / 2 if n % 2 == 0 else s[n // 2]

    def phi(z):
        return 0.5 * (1 + m.erf(z / m.sqrt(2)))

    def probit(p):
        lo, hi = 0.0, 10.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if phi(mid) < p:
                lo = mid
            else:
                hi = mid
        return lo

    us = [(g, abs(v - median(vs))) for g, vs in groups.items() for v in vs]
    uvals = sorted(u for _, u in us)
    import bisect

    nn = len(us)
    scores = {}
    allv = []
    for g, u in us:
        r = (bisect.bisect_left(uvals, u) + bisect.bisect_right(uvals, u) + 1) / 2
        a = probit(0.5 + r / (2 * (nn + 1)))
        scores.setdefault(g, []).append(a)
        allv.append(a)
    abar = sum(allv) / nn
    s2 = sum((v - abar) ** 2 for v in allv) / (nn - 1)
    stat = sum(
        len(v) * ((sum(v) / len(v)) - abar) ** 2 for v in scores.values()
    ) / s2
    assert got["k"] == 3 and got["n"] == nn and got["dof"] == 2
    assert got["fk_stat"] == pytest.approx(stat, abs=1e-4)
    # dispersion-shifted g2 should make the screen fire (chi2_2 95% ≈ 6)
    assert got["fk_stat"] > 6.0


def test_energy_distance_brute_force_and_metric_zero(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    a = rng.normal(0, 1, 40)
    b = rng.normal(1, 2, 35)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.quality import energy_distance

    got = energy_distance(df, "v", "g", "a", "b").collect()[0]
    e = (
        2 * np.abs(a[:, None] - b[None, :]).mean()
        - np.abs(a[:, None] - a[None, :]).mean()
        - np.abs(b[:, None] - b[None, :]).mean()
    )
    assert got["e_dist"] == pytest.approx(e, abs=1e-6)
    assert got["t_stat"] == pytest.approx(e * 40 * 35 / 75, abs=1e-4)
    # identical distributions → E = 0 exactly (metric property)
    same = [("a", float(v)) for v in a] + [("b", float(v)) for v in a]
    df2 = spark.createDataFrame(same, "g string, v double")
    got2 = energy_distance(df2, "v", "g", "a", "b").collect()[0]
    assert got2["e_dist"] == pytest.approx(0.0, abs=1e-9)


def test_page_trend_brute_force_and_perfect_trend(spark):
    import math as m
    import random

    rng = random.Random(19)
    k, blocks = 4, 15
    rows = []
    for b in range(blocks):
        for t in range(k):
            rows.append((f"b{b:02d}", t, float(t * 0.7 + rng.gauss(0, 0.5))))
    df = spark.createDataFrame(rows, "b string, t int, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import page_trend

    got = page_trend(df, "v", "b", "t").collect()[0]
    rj = [0.0] * k
    for b in range(blocks):
        vs = [r[2] for r in rows if r[0] == f"b{b:02d}"]
        for t in range(k):
            rj[t] += sorted(vs).index(vs[t]) + 1
    lstat = sum((t + 1) * rj[t] for t in range(k))
    el = blocks * k * (k + 1) ** 2 / 4
    var = blocks * k * k * (k + 1) * (k * k - 1) / 144
    assert got["l_stat"] == pytest.approx(lstat, abs=1e-9)
    assert got["z"] == pytest.approx((lstat - el) / m.sqrt(var), abs=1e-6)
    # a perfect monotone trend attains the maximum L = b·Σ j²
    perfect = [
        (f"b{b}", t, float(t)) for b in range(6) for t in range(k)
    ]
    dfp = spark.createDataFrame(perfect, "b string, t int, v double")
    lmax = 6 * sum((j + 1) ** 2 for j in range(k))
    assert page_trend(dfp, "v", "b", "t").collect()[0]["l_stat"] == lmax


def test_page_trend_drops_incomplete_blocks(spark):
    rows = [("b0", 0, 1.0), ("b0", 1, 2.0), ("b1", 0, 1.0)]
    df = spark.createDataFrame(rows, "b string, t int, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import page_trend

    got = page_trend(df, "v", "b", "t").collect()[0]
    assert got["n_blocks"] == 1  # b1 lacks treatment 1 → dropped


def test_quade_brute_force(spark):
    import random

    rng = random.Random(23)
    k, blocks = 4, 12
    rows = []
    for b in range(blocks):
        scale = rng.uniform(0.5, 3.0)
        for t in range(k):
            rows.append(
                (f"b{b:02d}", t, float(scale * (t + rng.gauss(0, 0.8))))
            )
    df = spark.createDataFrame(rows, "b string, t int, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import quade_test

    got = quade_test(df, "v", "b", "t").collect()[0]
    bl = {}
    for b, t, v in rows:
        bl.setdefault(b, []).append((t, v))
    ranges = {b: max(v for _, v in rs) - min(v for _, v in rs)
              for b, rs in bl.items()}
    rv = sorted(ranges.values())
    q = {b: rv.index(r) + 1 for b, r in ranges.items()}  # floats: no ties
    a = 0.0
    sj = {}
    for b, rs in bl.items():
        vs = [v for _, v in rs]
        for t, v in rs:
            s = q[b] * (sorted(vs).index(v) + 1 - (k + 1) / 2)
            a += s * s
            sj[t] = sj.get(t, 0.0) + s
    bterm = sum(s * s for s in sj.values()) / blocks
    f = (blocks - 1) * bterm / (a - bterm)
    assert got["n_blocks"] == blocks and got["k"] == k
    assert got["f_stat"] == pytest.approx(f, abs=1e-6)


# ============================================ second round-16 tranche pins
def test_kpss_brute_force(spark):
    """KPSS replays the 1992 formulas on a hand-walkable series; a
    strong deterministic trend must exceed the 0.463 critical value, a
    white-noise series must not."""
    import datetime
    import random

    rng = random.Random(29)
    base = datetime.date(2024, 1, 1)
    rows = []
    daily = []
    for t in range(40):
        c = 5 + t  # strong trend: count grows every day
        daily.append(float(c))
        for i in range(c):
            rows.append(
                (datetime.datetime.combine(base, datetime.time(12))
                 + datetime.timedelta(days=t, seconds=i),)
            )
    df = spark.createDataFrame(rows, "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import kpss_test

    got = kpss_test(df, "ts").collect()[0]
    tt = 40
    q = int(4 * (tt / 100.0) ** 0.25)
    ybar = sum(daily) / tt
    e = [y - ybar for y in daily]
    s = []
    acc = 0.0
    for v in e:
        acc += v
        s.append(acc)
    eta = sum(v * v for v in s) / (tt * tt)
    g0 = sum(v * v for v in e) / tt
    lrv = g0
    for lag in range(1, q + 1):
        gl = sum(e[t] * e[t - lag] for t in range(lag, tt)) / tt
        lrv += 2.0 * (1.0 - lag / (q + 1.0)) * gl
    assert got["t"] == tt and got["q"] == q
    assert got["eta"] == pytest.approx(eta, abs=1e-4)
    assert got["lrv"] == pytest.approx(lrv, abs=1e-4)
    assert got["kpss_stat"] == pytest.approx(eta / lrv, abs=1e-4)
    assert got["kpss_stat"] > 0.463  # trend → reject level-stationarity


def test_kpss_stationary_series_passes(spark):
    import datetime
    import random

    rng = random.Random(31)
    base = datetime.date(2024, 1, 1)
    rows = []
    for t in range(60):
        for i in range(rng.randint(8, 12)):  # stationary noise
            rows.append(
                (datetime.datetime.combine(base, datetime.time(6))
                 + datetime.timedelta(days=t, seconds=i),)
            )
    df = spark.createDataFrame(rows, "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import kpss_test

    got = kpss_test(df, "ts").collect()[0]
    assert got["kpss_stat"] < 0.463


def test_cox_stuart_brute_force(spark):
    import datetime
    import math as m
    import random

    rng = random.Random(37)
    base = datetime.date(2024, 3, 1)
    daily = [rng.randint(1, 20) for _ in range(21)]  # odd T: middle drops
    rows = []
    for t, c in enumerate(daily):
        for i in range(c):
            rows.append(
                (datetime.datetime.combine(base, datetime.time(9))
                 + datetime.timedelta(days=t, seconds=i),)
            )
    df = spark.createDataFrame(rows, "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import cox_stuart

    got = cox_stuart(df, "ts").collect()[0]
    tt = 21
    c = (tt + 1) // 2  # 11
    pairs = [(daily[i], daily[i + c]) for i in range(tt - c)]  # 10 pairs
    sp = sum(1 for a, b in pairs if b > a)
    sm = sum(1 for a, b in pairs if b < a)
    assert got["t"] == tt
    assert got["n_pairs"] == sp + sm
    assert got["s_plus"] == sp and got["s_minus"] == sm
    if sp + sm:
        z = (sp - (sp + sm) / 2.0) / m.sqrt((sp + sm) / 4.0)
        assert got["z"] == pytest.approx(z, abs=1e-6)


def test_weighted_kappa_brute_force_and_perfect(spark):
    """QWK replays Cohen 1968 on a contingency with an absent middle
    category (index = rank in sorted order, NOT the raw value) and is
    exactly 1 on perfect agreement."""
    rows = [(0, 0)] * 5 + [(0, 3)] * 2 + [(3, 3)] * 4 + [(3, 1)] * 3 + [
        (1, 1)
    ] * 6 + [(1, 0)] * 1
    df = spark.createDataFrame(rows, "a int, b int")
    from swivel_spark_prep_spark.operators.evalmetrics import weighted_kappa

    got = weighted_kappa(df, "a", "b").collect()[0]
    cats = sorted({a for a, _ in rows} | {b for _, b in rows})  # [0,1,3]
    k = len(cats)
    idx = {c: i for i, c in enumerate(cats)}
    n = len(rows)

    def w(i, j):
        return 1.0 - (i - j) ** 2 / float((k - 1) ** 2)

    po = sum(w(idx[a], idx[b]) for a, b in rows) / n
    ra = {i: sum(1 for a, _ in rows if idx[a] == i) for i in range(k)}
    cb = {j: sum(1 for _, b in rows if idx[b] == j) for j in range(k)}
    pe = sum(
        w(i, j) * ra[i] * cb[j] for i in range(k) for j in range(k)
    ) / (n * n)
    kap = (po - pe) / (1 - pe)
    assert got["k"] == k and got["n"] == n
    assert got["po_w"] == pytest.approx(po, abs=1e-6)
    assert got["pe_w"] == pytest.approx(pe, abs=1e-6)
    assert got["kappa_w"] == pytest.approx(kap, abs=1e-6)
    perfect = spark.createDataFrame(
        [(i % 4, i % 4) for i in range(40)], "a int, b int"
    )
    assert weighted_kappa(perfect, "a", "b").collect()[0]["kappa_w"] == 1.0


def test_weighted_kappa_rejects_unknown_weights(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import weighted_kappa

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="unknown weights"):
        weighted_kappa(df, "a", "b", weights="cubic")


def test_mtld_brute_force_and_length_robustness(spark):
    """MTLD replays the McCarthy–Jarvis walk exactly, and doubling a
    text (concatenating it with itself) must NOT double the score —
    the length-robustness property raw TTR fails."""
    from swivel_spark_prep_spark.operators.textstats import mtld

    def py_dir(ws):
        seen, tf, fac = set(), 0, 0.0
        for w in ws:
            seen.add(w)
            tf += 1
            if len(seen) / tf < 0.72:
                fac += 1.0
                seen, tf = set(), 0
        partial = ((1 - len(seen) / tf) / (1 - 0.72)) if tf > 0 else 0.0
        f = fac + partial
        return len(ws) / f if f > 0 else None

    text = ("the cat sat on the mat and the dog ran to the cat "
            "then the mat moved and the dog sat still again") * 2
    ws = [w for w in text.lower().split(" ") if w]
    fwd, bwd = py_dir(ws), py_dir(list(reversed(ws)))
    df = spark.createDataFrame([("en", text)], "lang string, text string")
    got = mtld(df).collect()[0]
    assert got["n_docs"] == 1
    assert got["mean_mtld"] == pytest.approx((fwd + bwd) / 2, abs=1e-6)
    doubled = spark.createDataFrame(
        [("en", text + " " + text)], "lang string, text string"
    )
    g2 = mtld(doubled).collect()[0]
    # length-robust: the doubled text's MTLD stays within 35% of the
    # original (raw TTR would halve)
    assert abs(g2["mean_mtld"] - got["mean_mtld"]) / got["mean_mtld"] < 0.35


# ----------------------------------------------- X397-X404 round-16 tranche 3
def _daily_rows(counts, base=None):
    """One timestamp row per event: day t gets counts[t] rows."""
    import datetime

    base = base or datetime.date(2024, 3, 1)
    rows = []
    for t, c in enumerate(counts):
        for i in range(int(c)):
            rows.append(
                (datetime.datetime.combine(base, datetime.time(12))
                 + datetime.timedelta(days=t, seconds=i),)
            )
    return rows


def _midranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    r = [0.0] * len(vals)
    i = 0
    while i < len(vals):
        j = i
        while j + 1 < len(vals) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        for k in range(i, j + 1):
            r[order[k]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    return r


def test_pettitt_brute_force_and_step_change(spark):
    """Pettitt's rank formula must equal the textbook double-sum
    U_t = ΣΣ sign(y_j − y_i) (they coincide under midranks), and a
    planted level shift must put τ at the true change point with a
    tiny p."""
    import math
    import random

    rng = random.Random(41)
    counts = [rng.randint(5, 15) for _ in range(20)]
    df = spark.createDataFrame(_daily_rows(counts), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import pettitt_test

    got = pettitt_test(df, "ts").collect()[0]
    T = len(counts)
    U = [
        sum(
            (counts[j] > counts[i]) - (counts[j] < counts[i])
            for i in range(t + 1)
            for j in range(t + 1, T)
        )
        for t in range(T - 1)
    ]
    K = max(abs(u) for u in U)
    tau = next(i + 1 for i, u in enumerate(U) if abs(u) == K)
    p = min(1.0, 2.0 * math.exp(-6.0 * K * K / (T**3 + T**2)))
    assert got["t"] == T and got["k_stat"] == K and got["tau"] == tau
    assert got["p_value"] == pytest.approx(p, abs=1e-6)

    step = [10] * 15 + [30] * 15  # shift after day 15
    got2 = pettitt_test(
        spark.createDataFrame(_daily_rows(step), "ts timestamp"), "ts"
    ).collect()[0]
    assert got2["tau"] == 15 and got2["p_value"] < 0.001


def test_buishand_and_snht_brute_force(spark):
    """Both homogeneity screens replay their textbook formulas, and on
    a planted shift SNHT's argmax lands on the true split."""
    import math
    import random

    rng = random.Random(43)
    counts = [rng.randint(5, 25) for _ in range(24)]
    df = spark.createDataFrame(_daily_rows(counts), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import (
        buishand_range,
        snht_test,
    )

    T = len(counts)
    m = sum(counts) / T
    sd_pop = math.sqrt(sum((y - m) ** 2 for y in counts) / T)
    acc, S = 0.0, []
    for y in counts:
        acc += y - m
        S.append(acc)
    rng_b = (max(S) - min(S)) / sd_pop
    got_b = buishand_range(df, "ts").collect()[0]
    assert got_b["r_range"] == pytest.approx(rng_b, abs=1e-6)
    assert got_b["r_stat"] == pytest.approx(rng_b / math.sqrt(T), abs=1e-6)

    sd_smp = math.sqrt(sum((y - m) ** 2 for y in counts) / (T - 1))
    tks = []
    for k in range(1, T):
        z1 = (sum(counts[:k]) / k - m) / sd_smp
        z2 = (sum(counts[k:]) / (T - k) - m) / sd_smp
        tks.append(k * z1 * z1 + (T - k) * z2 * z2)
    t0 = max(tks)
    got_s = snht_test(df, "ts").collect()[0]
    assert got_s["t0"] == pytest.approx(t0, abs=1e-6)
    assert got_s["k_max"] == tks.index(t0) + 1

    step = [8] * 10 + [20] * 14
    got2 = snht_test(
        spark.createDataFrame(_daily_rows(step), "ts timestamp"), "ts"
    ).collect()[0]
    assert got2["k_max"] == 10  # true split point


def test_bartels_rank_brute_force_and_directions(spark):
    """RVN replays the rank von Neumann ratio; a monotone trend sits
    far below 2 (positive persistence), strict alternation far above."""
    import math
    import random

    rng = random.Random(47)
    counts = [rng.randint(5, 30) for _ in range(25)]
    df = spark.createDataFrame(_daily_rows(counts), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import bartels_rank

    r = _midranks([float(c) for c in counts])
    T = len(counts)
    rvn = sum((r[t] - r[t + 1]) ** 2 for t in range(T - 1)) / sum(
        (v - (T + 1) / 2.0) ** 2 for v in r
    )
    var = (
        4.0 * (T - 2) * (5.0 * T * T - 2 * T - 9)
        / (5.0 * T * (T + 1) * (T - 1) * (T - 1))
    )
    got = bartels_rank(df, "ts").collect()[0]
    assert got["rvn"] == pytest.approx(rvn, abs=1e-6)
    assert got["z"] == pytest.approx((rvn - 2.0) / math.sqrt(var), abs=1e-6)

    trend = bartels_rank(
        spark.createDataFrame(_daily_rows(range(5, 35)), "ts timestamp"), "ts"
    ).collect()[0]
    assert trend["rvn"] < 1.0 and trend["z"] < -3  # persistence
    alt = bartels_rank(
        spark.createDataFrame(
            _daily_rows([5 if t % 2 else 30 for t in range(30)]), "ts timestamp"
        ),
        "ts",
    ).collect()[0]
    assert alt["rvn"] > 3.0 and alt["z"] > 3  # alternation


def test_variance_ratio_brute_force_and_persistence(spark):
    """VR replays Lo–MacKinlay's overlapping estimator; a blocky
    persistent series has VR(5) >> 1, an alternating one << 1."""
    import math
    import random

    rng = random.Random(53)
    counts = [rng.randint(5, 25) for _ in range(30)]
    df = spark.createDataFrame(_daily_rows(counts), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import variance_ratio

    q, n = 5, len(counts)
    mu = sum(counts) / n
    P = [0.0]
    for y in counts:
        P.append(P[-1] + y)
    sq = sum((P[t] - P[t - q] - q * mu) ** 2 for t in range(q, n + 1))
    sigq = sq / (q * (n - q + 1) * (1 - q / n))
    sig1 = sum((y - mu) ** 2 for y in counts) / (n - 1)
    vr = sigq / sig1
    z = (vr - 1.0) / math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * n))
    got = variance_ratio(df, "ts", q=5).collect()[0]
    assert got["n"] == n and got["q"] == q
    assert got["vr"] == pytest.approx(vr, abs=1e-6)
    assert got["z"] == pytest.approx(z, abs=1e-6)

    blocky = [10] * 10 + [40] * 10 + [10] * 10 + [40] * 10
    vb = variance_ratio(
        spark.createDataFrame(_daily_rows(blocky), "ts timestamp"), "ts"
    ).collect()[0]
    assert vb["vr"] > 1.5  # persistent blocks
    alt = [5 if t % 2 else 30 for t in range(40)]
    va = variance_ratio(
        spark.createDataFrame(_daily_rows(alt), "ts timestamp"), "ts"
    ).collect()[0]
    assert va["vr"] < 0.5  # mean reversion

    with pytest.raises(ValueError, match="q must be"):
        variance_ratio(df, "ts", q=1)


def test_spatial_autocorr_brute_force_and_patterns(spark):
    """Moran/Geary replay the numpy lattice brute force, and planted
    patterns point the right way: day-banded intensity clusters
    (I > 0, C < 1), hour-checkerboard alternates (I < 0, C > 1)."""
    import datetime
    import random

    rng = random.Random(59)
    base = datetime.date(2024, 3, 1)

    def build(counts_fn, days):
        rows = []
        grid = {}
        for t in range(days):
            for h in range(24):
                c = counts_fn(t, h)
                grid[(t, h)] = float(c)
                for i in range(c):
                    rows.append(
                        (datetime.datetime.combine(base, datetime.time(h, 30))
                         + datetime.timedelta(days=t, seconds=i),)
                    )
        return rows, grid

    rows, grid = build(lambda t, h: rng.randint(0, 6), 5)
    df = spark.createDataFrame(rows, "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import spatial_autocorr

    got = spatial_autocorr(df, "ts").collect()[0]
    days = 5
    n = days * 24
    m = sum(grid.values()) / n
    z = {k: v - m for k, v in grid.items()}
    edges = [((t, h), (t + 1, h)) for t in range(days - 1) for h in range(24)]
    edges += [((t, h), (t, h + 1)) for t in range(days) for h in range(23)]
    den = sum(v * v for v in z.values())
    szz = sum(z[a] * z[b] for a, b in edges)
    sd2 = sum((z[a] - z[b]) ** 2 for a, b in edges)
    ne = len(edges)
    assert got["n_cells"] == n and got["n_edges"] == ne
    assert got["moran_i"] == pytest.approx(n * szz / (ne * den), abs=1e-6)
    assert got["geary_c"] == pytest.approx(
        (n - 1) * sd2 / (2.0 * ne * den), abs=1e-6
    )

    rows_b, _ = build(lambda t, h: 12 if t % 4 < 2 else 1, 8)  # day bands
    band = spatial_autocorr(
        spark.createDataFrame(rows_b, "ts timestamp"), "ts"
    ).collect()[0]
    assert band["moran_i"] > 0.3 and band["geary_c"] < 0.7

    rows_c, _ = build(lambda t, h: 10 if (t + h) % 2 else 1, 6)  # checkerboard
    chk = spatial_autocorr(
        spark.createDataFrame(rows_c, "ts timestamp"), "ts"
    ).collect()[0]
    assert chk["moran_i"] < -0.5 and chk["geary_c"] > 1.5


def test_mood_dispersion_brute_force_and_direction(spark):
    """Mood's T replays the squared-rank brute force with midrank
    ties, and the wider-spread sample drives z positive."""
    import math
    import random

    rng = random.Random(61)
    a = [round(10 + 6 * (rng.random() - 0.5), 1) for _ in range(40)]  # wide
    b = [round(10 + 2 * (rng.random() - 0.5), 1) for _ in range(35)]  # narrow
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import mood_dispersion

    got = mood_dispersion(df, "v", "g", "a", "b").collect()[0]
    vals = a + b
    r = _midranks(vals)
    N = len(vals)
    m_n = len(a)
    t_stat = sum(
        (r[i] - (N + 1) / 2.0) ** 2 for i in range(m_n)
    )
    E = m_n * (N * N - 1) / 12.0
    V = m_n * len(b) * (N + 1) * (N * N - 4) / 180.0
    assert got["n_a"] == m_n and got["n_b"] == len(b)
    assert got["t_stat"] == pytest.approx(t_stat, abs=1e-6)
    assert got["z"] == pytest.approx((t_stat - E) / math.sqrt(V), abs=1e-6)
    assert got["z"] > 2  # sample a is wider → extreme ranks → large T


def test_dagostino_k2_brute_force_and_gates(spark):
    """K² replays the published three-paper transform chain exactly
    (pinned against an independent float walk), a symmetric light-
    tailed sample keeps K² small, and n < 8 gates to NULL."""
    import math
    import random

    rng = random.Random(67)
    skewed = [round(math.exp(rng.gauss(0, 0.8)), 4) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in skewed], "v double")
    from swivel_spark_prep_spark.operators.evalmetrics import dagostino_k2

    got = dagostino_k2(df, "v").collect()[0]
    n = len(skewed)
    m = sum(skewed) / n
    m2 = sum((v - m) ** 2 for v in skewed) / n
    m3 = sum((v - m) ** 3 for v in skewed) / n
    m4 = sum((v - m) ** 4 for v in skewed) / n
    g1 = m3 / m2**1.5
    b2 = m4 / (m2 * m2)
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = -1 + math.sqrt(2 * (beta2 - 1))
    delta = 1 / math.sqrt(0.5 * math.log(w2))
    alpha = math.sqrt(2.0 / (w2 - 1))
    z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    eb2 = 3.0 * (n - 1) / (n + 1)
    vb2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    xx = (b2 - eb2) / math.sqrt(vb2)
    sb1 = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2.0) * (n - 3)))
    )
    aa = 6.0 + 8.0 / sb1 * (2.0 / sb1 + math.sqrt(1 + 4.0 / (sb1 * sb1)))
    den = 1 + xx * math.sqrt(2 / (aa - 4.0))
    z2 = (
        (1 - 2 / (9.0 * aa))
        - math.copysign(abs((1 - 2.0 / aa) / den) ** (1 / 3.0), den)
    ) / math.sqrt(2 / (9.0 * aa))
    assert got["n"] == n
    assert got["g1"] == pytest.approx(g1, abs=1e-6)
    assert got["b2"] == pytest.approx(b2, abs=1e-6)
    assert got["z_skew"] == pytest.approx(z1, abs=1e-5)
    assert got["z_kurt"] == pytest.approx(z2, abs=1e-5)
    assert got["k2"] == pytest.approx(z1 * z1 + z2 * z2, rel=1e-5)
    assert got["k2"] > 20  # lognormal is decisively non-normal

    flat = [(-1.0,), (-0.5,), (0.0,), (0.5,), (1.0,)] * 20
    near = dagostino_k2(
        spark.createDataFrame(flat, "v double"), "v"
    ).collect()[0]
    assert near["z_skew"] == pytest.approx(0.0, abs=1e-6)  # exact symmetry

    tiny = dagostino_k2(
        spark.createDataFrame([(float(i),) for i in range(7)], "v double"), "v"
    ).collect()[0]
    assert tiny["n"] == 7 and tiny["k2"] is None and tiny["g1"] is None


# ----------------------------------------------- X405-X410 round-16 tranche 4
def _siegel_tukey_scores(n):
    """Textbook outside-in rank assignment (1 lowest; 2,3 two highest;
    4,5 next two lowest; ...) — positional scores a(p), p = 1..n."""
    a = [0.0] * (n + 1)
    for p in range(1, n + 1):
        q = n + 1 - p
        if n % 2 == 1 and p == (n + 1) // 2:
            a[p] = n  # odd N: the lone middle position is visited last
        elif p <= n // 2:
            a[p] = 2 * p if p % 2 == 0 else 2 * p - 1
        else:
            a[p] = 2 * q if q % 2 == 1 else 2 * q - 1
    return a[1:]


def test_siegel_tukey_score_formula_is_the_textbook_zigzag():
    """The closed-form segment sums reproduce the visit-order
    assignment for odd and even n — every score 1..n used once."""
    for n in (1, 2, 3, 4, 5, 6, 7, 10, 11):
        scores = _siegel_tukey_scores(n)
        assert sorted(scores) == list(range(1, n + 1))
        # visit order: bottom 1; top 2; bottom 2; top 2; ...
        expect = {}
        lo_p, hi_p, nxt, take, side = 1, n, 1, 1, "b"
        while lo_p <= hi_p:
            for _ in range(take):
                if lo_p > hi_p:
                    break
                if side == "b":
                    expect[lo_p] = nxt
                    lo_p += 1
                else:
                    expect[hi_p] = nxt
                    hi_p -= 1
                nxt += 1
            side = "t" if side == "b" else "b"
            take = 2
        assert [expect[p] for p in range(1, n + 1)] == scores


def test_siegel_tukey_brute_force_and_direction(spark):
    """Operator T/z replay the tie-averaged brute force, and the
    wider-spread sample gets the SMALL outside-in scores (z < 0)."""
    import math
    import random

    rng = random.Random(71)
    a = [round(10 + 8 * (rng.random() - 0.5), 1) for _ in range(45)]  # wide
    b = [round(10 + 2 * (rng.random() - 0.5), 1) for _ in range(40)]  # narrow
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import siegel_tukey

    got = siegel_tukey(df, "v", "g", "a", "b").collect()[0]
    vals = sorted(a + b)
    n = len(vals)
    pos = _siegel_tukey_scores(n)
    # tie-average positional scores
    score = {}
    i = 0
    while i < n:
        j = i
        while j + 1 < n and vals[j + 1] == vals[i]:
            j += 1
        m = sum(pos[i:j + 1]) / (j - i + 1)
        score[vals[i]] = m
        i = j + 1
    t_stat = sum(score[v] for v in a)
    ls = sum(score[v] for v in vals)
    ls2 = sum(score[v] ** 2 for v in vals)
    na, nb = len(a), len(b)
    et = na * ls / n
    vt = na * nb * (n * ls2 - ls * ls) / (n * n * (n - 1))
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["t_stat"] == pytest.approx(t_stat, abs=1e-6)
    assert got["z"] == pytest.approx((t_stat - et) / math.sqrt(vt), abs=1e-6)
    assert got["z"] < -2  # wide sample holds the extremes → small scores


def test_hodges_lehmann_brute_force(spark):
    """HL shift equals the brute median of all pairwise differences,
    including even-pair-count interpolation, on a planted
    weekend-heavy series."""
    import datetime

    base = datetime.date(2024, 3, 4)  # a Monday
    counts = []
    for t in range(21):  # 3 full weeks
        d = base + datetime.timedelta(days=t)
        counts.append(20 if d.isoweekday() in (6, 7) else 10 + (t % 3))
    df = spark.createDataFrame(_daily_rows(counts, base), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import (
        hodges_lehmann_shift,
    )

    got = hodges_lehmann_shift(df, "ts").collect()[0]
    wd = [c for t, c in enumerate(counts)
          if (base + datetime.timedelta(days=t)).isoweekday() not in (6, 7)]
    we = [c for t, c in enumerate(counts)
          if (base + datetime.timedelta(days=t)).isoweekday() in (6, 7)]
    diffs = sorted(b - a for b in we for a in wd)
    np_ = len(diffs)
    med = (diffs[np_ // 2] if np_ % 2
           else (diffs[np_ // 2 - 1] + diffs[np_ // 2]) / 2)
    assert got["n_a"] == len(wd) and got["n_b"] == len(we)
    assert got["n_pairs"] == np_
    assert got["hl_shift"] == pytest.approx(med, abs=1e-6)
    assert got["hl_shift"] > 5  # weekends planted busier


def test_stuart_maxwell_brute_force_and_null(spark):
    """χ² equals the numpy solve on a hand-built paired table; a
    perfectly symmetric flow has identical margins → χ² = 0."""
    import numpy as np

    pairs = (
        [(0, 1)] * 8 + [(1, 0)] * 2 + [(1, 2)] * 5 + [(2, 1)] * 5
        + [(0, 0)] * 4 + [(2, 2)] * 3 + [(2, 0)] * 1
    )
    df = spark.createDataFrame(pairs, "a int, b int")
    from swivel_spark_prep_spark.operators.evalmetrics import stuart_maxwell

    got = stuart_maxwell(df, "a", "b").collect()[0]
    nm = np.zeros((3, 3))
    for a, b in pairs:
        nm[a, b] += 1
    rs, cs = nm.sum(1), nm.sum(0)
    d = (rs - cs)[:2]
    v = np.zeros((2, 2))
    for i in range(2):
        v[i, i] = rs[i] + cs[i] - 2 * nm[i, i]
        for j in range(2):
            if j != i:
                v[i, j] = -(nm[i, j] + nm[j, i])
    want = float(d @ np.linalg.solve(v, d))
    assert got["k"] == 3 and got["dof"] == 2 and got["n"] == len(pairs)
    assert got["chi2"] == pytest.approx(want, abs=1e-6)

    sym = [(0, 1)] * 5 + [(1, 0)] * 5 + [(1, 2)] * 3 + [(2, 1)] * 3
    got2 = stuart_maxwell(
        spark.createDataFrame(sym, "a int, b int"), "a", "b"
    ).collect()[0]
    assert got2["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_stuart_maxwell_rejects_unbounded_category_column(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import stuart_maxwell

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    with pytest.raises(ValueError, match="bounded_distinct"):
        stuart_maxwell(df, "a", "b", cap=16)


def test_lilliefors_brute_force_and_directions(spark):
    """D replays the two-sided ECDF-vs-polynomial-Φ brute force; a
    genuine Gaussian sample sits under the 5% reference point
    0.886/√n, a uniform sample far above it."""
    import math
    import random

    rng = random.Random(73)
    gauss = [rng.gauss(5, 2) for _ in range(400)]
    df = spark.createDataFrame([(v,) for v in gauss], "v double")
    from swivel_spark_prep_spark.operators.evalmetrics import lilliefors_test

    got = lilliefors_test(df, "v").collect()[0]
    n = len(gauss)
    m = sum(gauss) / n
    s = math.sqrt(sum((v - m) ** 2 for v in gauss) / (n - 1))

    def phi(x):
        ax = abs(x)
        k = 1.0 / (1.0 + 0.2316419 * ax)
        poly = (0.319381530 * k - 0.356563782 * k**2 + 1.781477937 * k**3
                - 1.821255978 * k**4 + 1.330274429 * k**5)
        up = 1.0 - math.exp(-ax * ax / 2.0) / math.sqrt(2 * math.pi) * poly
        return up if x >= 0 else 1.0 - up

    sv = sorted(set(gauss))
    cnt = {v: gauss.count(v) for v in sv}
    d = 0.0
    cl = 0
    for v in sv:
        p = phi((v - m) / s)
        d = max(d, (cl + cnt[v]) / n - p, p - cl / n)
        cl += cnt[v]
    assert got["n"] == n
    assert got["mean"] == pytest.approx(m, abs=1e-6)
    assert got["sd"] == pytest.approx(s, abs=1e-6)
    assert got["d_stat"] == pytest.approx(d, abs=1e-6)
    assert got["d_stat"] < 0.886 / math.sqrt(n)  # Gaussian → accept

    unif = [(rng.random() * 10,) for _ in range(400)]
    got2 = lilliefors_test(
        spark.createDataFrame(unif, "v double"), "v"
    ).collect()[0]
    assert got2["d_stat"] > 0.886 / math.sqrt(400)  # uniform → reject


def test_runs_two_sample_brute_force_and_separation(spark):
    """The cells-composed run count equals the explicit sorted-sequence
    count under the documented tie convention, and fully separated
    samples collapse to 2 runs (decisive z < 0)."""
    import math
    import random

    rng = random.Random(79)
    a = [round(rng.random() * 20, 0) for _ in range(50)]  # coarse → ties
    b = [round(rng.random() * 20, 0) for _ in range(45)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import runs_two_sample

    got = runs_two_sample(df, "v", "g", "a", "b").collect()[0]
    seq = sorted(rows, key=lambda r: (r[1], 0 if r[0] == "a" else 1))
    labels = [r[0] for r in seq]
    runs = 1 + sum(
        1 for i in range(1, len(labels)) if labels[i] != labels[i - 1]
    )
    na, nb = len(a), len(b)
    nn = na + nb
    er = 1 + 2 * na * nb / nn
    vr = 2 * na * nb * (2 * na * nb - nn) / (nn * nn * (nn - 1))
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["runs"] == runs
    assert got["z"] == pytest.approx((runs - er) / math.sqrt(vr), abs=1e-6)

    sep = [("a", float(i)) for i in range(30)] + [
        ("b", float(100 + i)) for i in range(30)
    ]
    got2 = runs_two_sample(
        spark.createDataFrame(sep, "g string, v double"), "v", "g", "a", "b"
    ).collect()[0]
    assert got2["runs"] == 2 and got2["z"] < -7


def test_brown_forsythe_brute_force_and_direction(spark):
    """Full brute-force pin for X273's brown_forsythe (the round-13 op
    had only a direction pin; the round-16 dup-def cleanup donated this
    replay): F matches the |x − median_g| ANOVA exactly, and a group
    with triple the spread drives F decisively above 1."""
    import random
    import statistics

    rng = random.Random(83)
    g1 = [10 + 2 * (rng.random() - 0.5) for _ in range(60)]
    g2 = [10 + 2 * (rng.random() - 0.5) for _ in range(55)]
    g3 = [10 + 12 * (rng.random() - 0.5) for _ in range(50)]  # wide
    rows = ([("g1", v) for v in g1] + [("g2", v) for v in g2]
            + [("g3", v) for v in g3])
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import brown_forsythe

    got = brown_forsythe(df, "v", "g").collect()[0]
    groups = {"g1": g1, "g2": g2, "g3": g3}
    W = {g: [abs(v - statistics.median(xs)) for v in xs]
         for g, xs in groups.items()}
    k = len(W)
    nn = sum(len(w) for w in W.values())
    allw = [w for ws in W.values() for w in ws]
    wbar = sum(allw) / nn
    between = sum(
        len(ws) * (sum(ws) / len(ws) - wbar) ** 2 for ws in W.values()
    )
    within = sum(
        sum((w - sum(ws) / len(ws)) ** 2 for w in ws) for ws in W.values()
    )
    f = (between / (k - 1)) / (within / (nn - k))
    assert got["k"] == k and got["n"] == nn
    assert got["df1"] == k - 1 and got["df2"] == nn - k
    assert got["f_stat"] == pytest.approx(f, abs=1e-6)
    assert got["f_stat"] > 10  # planted heteroscedasticity


# ----------------------------------------------- X411-X416 round-16 tranche 5
def test_lin_ccc_properties(spark):
    """CCC = 1 on perfect agreement, penalizes a pure location shift
    that leaves Pearson r at 1, and replays the moment formula."""
    rows = [(float(i), float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "x double, y double")
    from swivel_spark_prep_spark.operators.evalmetrics import lin_ccc

    assert lin_ccc(df, "x", "y").collect()[0]["ccc"] == pytest.approx(1.0)

    shifted = spark.createDataFrame(
        [(float(i), float(i) + 5) for i in range(1, 21)], "x double, y double"
    )
    got = lin_ccc(shifted, "x", "y").collect()[0]
    # r = 1 but CCC = sxx·2/(2sxx + 25): brute
    import statistics

    xs = list(range(1, 21))
    sxx = statistics.pvariance(xs)
    want = 2 * sxx / (2 * sxx + 25.0)
    assert got["ccc"] == pytest.approx(want, abs=1e-6)
    assert got["ccc"] < 0.8  # the shift costs agreement


def test_deming_recovers_structural_slope_and_beats_ols(spark):
    """With equal noise on both axes, Deming(δ=1) recovers a planted
    slope-2 line that OLS attenuates; closed form pinned by brute."""
    import math
    import random

    rng = random.Random(89)
    pts = []
    for _ in range(500):
        t = rng.random() * 10
        pts.append((t + rng.gauss(0, 1), 2 * t + rng.gauss(0, 1)))
    df = spark.createDataFrame(pts, "x double, y double")
    from swivel_spark_prep_spark.operators.evalmetrics import (
        deming_regression,
    )

    got = deming_regression(df, "x", "y").collect()[0]
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    sxx = sum((p[0] - mx) ** 2 for p in pts) / n
    syy = sum((p[1] - my) ** 2 for p in pts) / n
    sxy = sum((p[0] - mx) * (p[1] - my) for p in pts) / n
    beta = (syy - sxx + math.sqrt((syy - sxx) ** 2 + 4 * sxy**2)) / (2 * sxy)
    assert got["slope"] == pytest.approx(beta, abs=1e-6)
    assert got["intercept"] == pytest.approx(my - beta * mx, abs=1e-6)
    ols = sxy / sxx
    assert abs(got["slope"] - 2.0) < abs(ols - 2.0)  # OLS attenuates
    assert 1.8 < got["slope"] < 2.2


def test_bland_altman_brute_and_calibration(spark):
    """Limits replay the brute force, and on Gaussian differences the
    outside fraction sits near the nominal 5%."""
    import math
    import random

    rng = random.Random(97)
    pts = [(v := rng.random() * 50, v + 3 + rng.gauss(0, 2))
           for _ in range(2000)]
    df = spark.createDataFrame(pts, "x double, y double")
    from swivel_spark_prep_spark.operators.evalmetrics import bland_altman

    got = bland_altman(df, "x", "y").collect()[0]
    ds = [y - x for x, y in pts]
    n = len(ds)
    b = sum(ds) / n
    s = math.sqrt(sum((d - b) ** 2 for d in ds) / (n - 1))
    pct = sum(1 for d in ds if abs(d - b) > 1.96 * s) / n
    assert got["bias"] == pytest.approx(b, abs=1e-6)
    assert got["sd_diff"] == pytest.approx(s, abs=1e-6)
    assert got["loa_lo"] == pytest.approx(b - 1.96 * s, abs=1e-6)
    assert got["loa_hi"] == pytest.approx(b + 1.96 * s, abs=1e-6)
    assert got["pct_outside"] == pytest.approx(pct, abs=1e-9)
    assert 0.02 < got["pct_outside"] < 0.08  # ≈5% under normality
    assert 2.5 < got["bias"] < 3.5  # planted offset


def test_dunn_posthoc_brute_and_separated_group(spark):
    """Pairwise z's replay the tie-corrected formula, every unordered
    pair appears exactly once, and a shifted group is flagged against
    both others."""
    import math
    import random

    rng = random.Random(101)
    rows = (
        [("a", round(rng.random() * 10, 1)) for _ in range(60)]
        + [("b", round(rng.random() * 10, 1)) for _ in range(55)]
        + [("c", round(rng.random() * 10 + 15, 1)) for _ in range(50)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import dunn_posthoc

    got = {(r["g1"], r["g2"]): r for r in dunn_posthoc(df, "v", "g").collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    vals = [v for _, v in rows]
    r = _midranks(vals)
    N = len(vals)
    from collections import Counter

    T = sum(t**3 - t for t in Counter(vals).values())
    stats = {}
    for g in ("a", "b", "c"):
        idx = [i for i, (gg, _) in enumerate(rows) if gg == g]
        stats[g] = (len(idx), sum(r[i] for i in idx) / len(idx))
    for (g1, g2), row in got.items():
        n1, r1 = stats[g1]
        n2, r2 = stats[g2]
        var = (N * (N + 1) / 12.0 - T / (12.0 * (N - 1))) * (1 / n1 + 1 / n2)
        assert row["z"] == pytest.approx((r1 - r2) / math.sqrt(var), abs=1e-6)
        assert row["n_1"] == n1 and row["n_2"] == n2
    assert abs(got[("a", "b")]["z"]) < 2  # same distribution
    assert got[("a", "c")]["z"] < -5 and got[("b", "c")]["z"] < -5


def test_cohens_d_brute_and_known_effect(spark):
    """d replays the pooled-sd formula; a planted 1-sd shift reads
    d ≈ 1 with g < d (the small-sample shrink)."""
    import math
    import random

    rng = random.Random(103)
    a = [rng.gauss(10, 2) for _ in range(80)]
    b = [rng.gauss(8, 2) for _ in range(70)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import cohens_d

    got = cohens_d(df, "v", "g", "a", "b").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    sa2 = sum((v - ma) ** 2 for v in a) / (na - 1)
    sb2 = sum((v - mb) ** 2 for v in b) / (nb - 1)
    sp = math.sqrt(((na - 1) * sa2 + (nb - 1) * sb2) / (na + nb - 2))
    d = (ma - mb) / sp
    jj = 1 - 3.0 / (4 * (na + nb - 2) - 1)
    assert got["d"] == pytest.approx(d, abs=1e-6)
    assert got["g"] == pytest.approx(jj * d, abs=1e-6)
    assert 0.6 < got["d"] < 1.4 and abs(got["g"]) < abs(got["d"])


def test_welch_anova_brute_and_robustness(spark):
    """F* replays Welch's 1951 formulas, and unlike classic ANOVA it
    is calibrated when variances differ wildly but means agree."""
    import math
    import random

    rng = random.Random(107)
    rows = (
        [("a", rng.gauss(10, 1)) for _ in range(100)]
        + [("b", rng.gauss(10, 6)) for _ in range(40)]
        + [("c", rng.gauss(10, 0.3)) for _ in range(200)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import welch_anova

    got = welch_anova(df, "v", "g").collect()[0]
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    W = wm = 0.0
    per = {}
    for g, xs in groups.items():
        ng = len(xs)
        m = sum(xs) / ng
        s2 = sum((v - m) ** 2 for v in xs) / (ng - 1)
        w = ng / s2
        W += w
        wm += w * m
        per[g] = (ng, m, s2, w)
    k = len(per)
    xw = wm / W
    a0 = sum(w * (m - xw) ** 2 for ng, m, s2, w in per.values())
    s_ = sum((1 - w / W) ** 2 / (ng - 1) for ng, m, s2, w in per.values())
    f = (a0 / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * s_)
    assert got["k"] == k and got["df1"] == k - 1
    assert got["f_stat"] == pytest.approx(f, abs=1e-6)
    assert got["df2"] == pytest.approx((k * k - 1) / (3 * s_), abs=1e-4)
    assert got["f_stat"] < 4  # equal means → no rejection despite 20x var


# ----------------------------------------------- X417-X420 round-16 tranche 6
def test_games_howell_brute_and_heteroscedastic_flag(spark):
    """Pairwise q/df replay the Welch–Satterthwaite brute force, and a
    shifted group is flagged while an equal-mean high-variance group
    is not (the case Tukey's HSD miscalibrates)."""
    import math
    import random

    rng = random.Random(109)
    a = [rng.gauss(10, 1) for _ in range(90)]
    b = [rng.gauss(10, 5) for _ in range(40)]   # same mean, 5x sd
    c = [rng.gauss(13, 1) for _ in range(80)]   # shifted
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [
        ("c", v) for v in c
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import games_howell

    got = {(r["g1"], r["g2"]): r for r in
           games_howell(df, "v", "g").collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    groups = {"a": a, "b": b, "c": c}
    for (g1, g2), row in got.items():
        x, y = groups[g1], groups[g2]
        nx, ny = len(x), len(y)
        mx, my = sum(x) / nx, sum(y) / ny
        vx = sum((v - mx) ** 2 for v in x) / (nx - 1) / nx
        vy = sum((v - my) ** 2 for v in y) / (ny - 1) / ny
        q = (mx - my) / math.sqrt((vx + vy) / 2)
        dof = (vx + vy) ** 2 / (vx**2 / (nx - 1) + vy**2 / (ny - 1))
        assert row["q_stat"] == pytest.approx(q, abs=1e-6)
        assert row["df"] == pytest.approx(dof, abs=1e-4)
        assert row["diff"] == pytest.approx(mx - my, abs=1e-6)
    assert abs(got[("a", "b")]["q_stat"]) < 3   # equal means
    assert abs(got[("a", "c")]["q_stat"]) > 10  # shifted


def test_seasonal_mann_kendall_sees_through_weekly_cycle(spark):
    """A pure weekly cycle reads S′ = 0 (plain MK would not); adding a
    trend on top is detected; the per-stratum formula replays a brute
    double loop."""
    import datetime
    import math

    base = datetime.date(2024, 3, 4)  # a Monday
    cycle = [10, 12, 14, 16, 18, 30, 35]  # weekly pattern, no trend
    counts = [cycle[t % 7] for t in range(28)]
    df = spark.createDataFrame(_daily_rows(counts, base), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import (
        seasonal_mann_kendall,
    )

    got = seasonal_mann_kendall(df, "ts").collect()[0]
    assert got["s_stat"] == 0 and got["n_seasons"] == 7

    trended = [cycle[t % 7] + t for t in range(28)]
    got2 = seasonal_mann_kendall(
        spark.createDataFrame(_daily_rows(trended, base), "ts timestamp"),
        "ts",
    ).collect()[0]
    # brute per-stratum replay
    S, V = 0, 0.0
    for s in range(7):
        ys = [trended[t] for t in range(28) if t % 7 == s]
        ng = len(ys)
        S += sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(ng) for j in range(i + 1, ng)
        )
        V += ng * (ng - 1) * (2 * ng + 5) / 18.0  # no ties planted
    cc = S - 1 if S > 0 else (S + 1 if S < 0 else 0)
    assert got2["s_stat"] == S
    assert got2["var_s"] == pytest.approx(V, abs=1e-6)
    assert got2["z"] == pytest.approx(cc / math.sqrt(V), abs=1e-6)
    assert got2["z"] > 3  # strictly increasing within every stratum


def test_conover_squared_ranks_brute_and_direction(spark):
    """T replays the squared-midrank brute force and fires on a planted
    scale difference while staying small under equal spreads."""
    import random

    rng = random.Random(113)
    a = [10 + 2 * (rng.random() - 0.5) for _ in range(70)]
    b = [20 + 2 * (rng.random() - 0.5) for _ in range(65)]  # shift only
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import (
        conover_squared_ranks,
    )

    got = conover_squared_ranks(df, "v", "g").collect()[0]
    groups = {"a": a, "b": b}
    us, labels = [], []
    for g, xs in groups.items():
        m = sum(xs) / len(xs)
        for v in xs:
            us.append(abs(v - m))
            labels.append(g)
    r = _midranks(us)
    N = len(us)
    r2 = [v * v for v in r]
    sbar = sum(r2) / N
    d2 = (sum(v**4 for v in r) - N * sbar * sbar) / (N - 1)
    ssq = 0.0
    for g in groups:
        idx = [i for i, l in enumerate(labels) if l == g]
        sg = sum(r2[i] for i in idx)
        ssq += sg * sg / len(idx)
    t = (ssq - N * sbar * sbar) / d2
    assert got["t_stat"] == pytest.approx(t, abs=1e-5)
    assert got["t_stat"] < 4  # location shift alone is invisible

    wide = [("a", 10 + 1 * (rng.random() - 0.5)) for _ in range(70)] + [
        ("b", 10 + 10 * (rng.random() - 0.5)) for _ in range(65)
    ]
    got2 = conover_squared_ranks(
        spark.createDataFrame(wide, "g string, v double"), "v", "g"
    ).collect()[0]
    assert got2["t_stat"] > 20  # 10x spread fires


def test_spectral_entropy_brute_and_extremes(spark):
    """Entropy replays the DFT brute force; a pure weekly sinusoid
    concentrates the spectrum (low H), white noise flattens it
    (high H)."""
    import math
    import random

    rng = random.Random(127)
    counts = [max(1, round(20 + 15 * math.sin(2 * math.pi * t / 7)))
              for t in range(28)]  # near-pure 7-day cycle
    df = spark.createDataFrame(_daily_rows(counts), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import spectral_entropy

    got = spectral_entropy(df, "ts").collect()[0]
    T = len(counts)
    m = T // 2
    y = [float(c) for c in counts]
    mu = sum(y) / T
    e = [v - mu for v in y]
    P = []
    for k in range(1, m + 1):
        a = sum(e[t] * math.cos(2 * math.pi * k * t / T) for t in range(T))
        b = sum(e[t] * math.sin(2 * math.pi * k * t / T) for t in range(T))
        P.append(a * a + b * b)
    tot = sum(P)
    h = -sum(p / tot * math.log(p / tot) for p in P if p > 0) / math.log(m)
    assert got["t"] == T and got["m"] == m
    assert got["entropy"] == pytest.approx(h, abs=1e-6)
    assert got["entropy"] < 0.35  # concentrated spectrum

    noise = [rng.randint(5, 40) for _ in range(60)]
    got2 = spectral_entropy(
        spark.createDataFrame(_daily_rows(noise), "ts timestamp"), "ts"
    ).collect()[0]
    assert got2["entropy"] > 0.75  # flat spectrum


# ----------------------------------------------- X421-X422 round-16 tranche 7
def test_forecast_baselines_brute_and_seasonal_win(spark):
    """Metrics replay the shifted-difference brute force, and on a
    strongly weekly series the seasonal-naive beats the naive
    (MASE < 1, U₂ < 1) while on a random walk it does not."""
    import math
    import random

    rng = random.Random(131)
    cycle = [10, 12, 30, 16, 18, 45, 35]
    weekly = [cycle[t % 7] + rng.randint(0, 2) for t in range(35)]
    df = spark.createDataFrame(_daily_rows(weekly), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import (
        forecast_baselines,
    )

    got = forecast_baselines(df, "ts", season=7).collect()[0]
    T = len(weekly)
    e1 = [weekly[t] - weekly[t - 1] for t in range(7, T)]
    e7 = [weekly[t] - weekly[t - 7] for t in range(7, T)]
    mae1 = sum(abs(e) for e in e1) / len(e1)
    rmse1 = math.sqrt(sum(e * e for e in e1) / len(e1))
    mae7 = sum(abs(e) for e in e7) / len(e7)
    rmse7 = math.sqrt(sum(e * e for e in e7) / len(e7))
    assert got["n_eval"] == T - 7
    assert got["mae_naive"] == pytest.approx(mae1, abs=1e-6)
    assert got["rmse_naive"] == pytest.approx(rmse1, abs=1e-6)
    assert got["mae_snaive"] == pytest.approx(mae7, abs=1e-6)
    assert got["rmse_snaive"] == pytest.approx(rmse7, abs=1e-6)
    assert got["mase_snaive"] == pytest.approx(mae7 / mae1, abs=1e-6)
    assert got["u2_snaive"] == pytest.approx(rmse7 / rmse1, abs=1e-6)
    assert got["mase_snaive"] < 0.5  # weekly carry wins on weekly data

    walk = [20]
    for _ in range(34):
        walk.append(max(1, walk[-1] + rng.randint(-3, 3)))
    got2 = forecast_baselines(
        spark.createDataFrame(_daily_rows(walk), "ts timestamp"), "ts"
    ).collect()[0]
    assert got2["mase_snaive"] > 1  # on a walk the daily carry wins

    with pytest.raises(ValueError, match="season must be"):
        forecast_baselines(df, "ts", season=1)


def test_dixon_q_brute_and_duplicate_extremes(spark):
    """Q ratios replay the sorted-gap brute force; a planted spike
    dominates Q_high; a DOUBLED minimum zeroes Q_low (the duplicate
    order-statistic rule)."""
    counts = [12, 14, 11, 15, 13, 12, 14, 13, 15, 40]  # one spike
    df = spark.createDataFrame(_daily_rows(counts), "ts timestamp")
    from swivel_spark_prep_spark.operators.timeseries import dixon_q

    got = dixon_q(df, "ts").collect()[0]
    s = sorted(counts)
    ql = (s[1] - s[0]) / (s[-1] - s[0])
    qh = (s[-1] - s[-2]) / (s[-1] - s[0])
    assert got["q_low"] == pytest.approx(ql, abs=1e-6)
    assert got["q_high"] == pytest.approx(qh, abs=1e-6)
    assert got["q_max"] == pytest.approx(max(ql, qh), abs=1e-6)
    assert got["q_high"] > 0.7  # the spike is an extreme outlier

    dup_min = [5, 5, 9, 11, 10, 12, 9, 13]  # doubled minimum
    got2 = dixon_q(
        spark.createDataFrame(_daily_rows(dup_min), "ts timestamp"), "ts"
    ).collect()[0]
    assert got2["q_low"] == 0.0


def test_cochran_c_hartley_brute_and_outlier_flag(spark):
    """C and F-max replay the grouped-variance brute force; one
    inflated-variance group dominates both, equal spreads keep
    C ≈ 1/k and F-max ≈ 1; tiny groups gate to NULL."""
    import random

    rng = random.Random(137)
    groups = {
        "a": [10 + 2 * (rng.random() - 0.5) for _ in range(60)],
        "b": [10 + 2 * (rng.random() - 0.5) for _ in range(55)],
        "c": [10 + 14 * (rng.random() - 0.5) for _ in range(50)],  # outlier
    }
    rows = [(g, v) for g, xs in groups.items() for v in xs]
    df = spark.createDataFrame(rows, "g string, v double")
    from swivel_spark_prep_spark.operators.evalmetrics import (
        cochran_c_hartley,
    )

    got = cochran_c_hartley(df, "v", "g").collect()[0]
    s2 = {}
    for g, xs in groups.items():
        m = sum(xs) / len(xs)
        s2[g] = sum((v - m) ** 2 for v in xs) / (len(xs) - 1)
    smax, smin, ssum = max(s2.values()), min(s2.values()), sum(s2.values())
    assert got["k"] == 3 and got["n"] == len(rows)
    assert got["n_min"] == 50 and got["n_max"] == 60
    assert got["cochran_c"] == pytest.approx(smax / ssum, abs=1e-6)
    assert got["hartley_fmax"] == pytest.approx(smax / smin, abs=1e-6)
    assert got["cochran_c"] > 0.8  # one group carries the variance pool
    assert got["hartley_fmax"] > 20

    flat = [(g, 10 + 2 * (rng.random() - 0.5))
            for g in ("a", "b", "c") for _ in range(40)]
    got2 = cochran_c_hartley(
        spark.createDataFrame(flat, "g string, v double"), "v", "g"
    ).collect()[0]
    assert 0.25 < got2["cochran_c"] < 0.45  # ≈ 1/k under equal spread
    assert got2["hartley_fmax"] < 2

    tiny = [("a", 1.0), ("b", 2.0), ("b", 3.0)]  # group a has n = 1
    got3 = cochran_c_hartley(
        spark.createDataFrame(tiny, "g string, v double"), "v", "g"
    ).collect()[0]
    assert got3["cochran_c"] is None and got3["hartley_fmax"] is None
