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
