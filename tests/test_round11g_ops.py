"""Round-11g extension operators (the X197–X199 family):

1. kaplan_meier (operators/timeseries.py): hand-computed product-limit
   curve with censoring; censor-only times shrink the risk set but are
   not emitted; everyone-dies drives S to exactly 0; filtering.
2. welch_ttest (operators/evalmetrics.py): hand-computed t and
   Welch–Satterthwaite df; degenerate slices give NULLs.
3. fdr_bh (operators/quality.py): the textbook BH example; tied
   p-values share one fate (the tie-safe counting rule); nothing
   rejectable -> cutoff NULL and zero rejections; validation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------- kaplan_meier
def test_km_hand_computed(spark):
    from swivel_spark_prep_spark.operators.timeseries import kaplan_meier

    # durations (event): 1(e), 2(censored), 3(e), 3(e), 4(censored)
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1), (3.0, 1), (4.0, 0)], "t double, ev int"
    )
    rows = {r["duration"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert set(rows) == {1.0, 3.0}  # censor-only times not emitted
    assert rows[1.0]["n_risk"] == 5 and rows[1.0]["d_events"] == 1
    assert rows[1.0]["survival"] == pytest.approx(0.8)
    # at t=3: subjects with duration < 3 are gone (1 and 2) -> n = 3
    assert rows[3.0]["n_risk"] == 3 and rows[3.0]["d_events"] == 2
    assert rows[3.0]["survival"] == pytest.approx(0.8 * (1 / 3), abs=1e-6)


def test_km_everyone_dies_reaches_zero(spark):
    from swivel_spark_prep_spark.operators.timeseries import kaplan_meier

    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "t double, ev int")
    rows = {r["duration"]: r["survival"] for r in kaplan_meier(df, "t", "ev").collect()}
    assert rows[1.0] == pytest.approx(0.5)
    assert rows[2.0] == 0.0


def test_km_filters_bad_rows(spark):
    from swivel_spark_prep_spark.operators.timeseries import kaplan_meier

    df = spark.createDataFrame(
        [(1.0, 1), (-1.0, 1), (None, 1), (2.0, None)], "t double, ev int"
    )
    rows = kaplan_meier(df, "t", "ev").collect()
    assert len(rows) == 1 and rows[0]["n_risk"] == 1


# --------------------------------------------------------- welch_ttest
def test_welch_hand_computed(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import welch_ttest

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("b", v) for v in (2.0, 4.0, 6.0)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    r = welch_ttest(df, "x", "g", "a", "b").collect()[0]
    # a: n=4 mean=2.5 var=5/3 ; b: n=3 mean=4 var=4
    se2 = (5 / 3) / 4 + 4 / 3
    t = (2.5 - 4) / math.sqrt(se2)
    dfw = se2**2 / (((5 / 3) / 4) ** 2 / 3 + (4 / 3) ** 2 / 2)
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["mean_diff"] == pytest.approx(-1.5)
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["df_welch"] == pytest.approx(dfw, abs=1e-5)


def test_welch_degenerate_null(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import welch_ttest

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, x double"
    )
    r = welch_ttest(df, "x", "g", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["df_welch"] is None


# -------------------------------------------------------------- fdr_bh
def test_bh_textbook_example(spark):
    from swivel_spark_prep_spark.operators.quality import fdr_bh

    df = spark.createDataFrame(
        [("h1", 0.01), ("h2", 0.04), ("h3", 0.03), ("h4", 0.005), ("h5", 0.2)],
        "h string, p double",
    )
    got = {r["h"]: r for r in fdr_bh(df, "p", q=0.1).collect()}
    # sorted: .005<=.02, .01<=.04, .03<=.06, .04<=.08, .2>.1 -> cutoff .04
    assert got["h1"]["p_cutoff"] == pytest.approx(0.04)
    assert {h for h, r in got.items() if r["rejected"]} == {"h1", "h2", "h3", "h4"}
    assert all(r["m_tests"] == 5 for r in got.values())


def test_bh_ties_share_fate_and_none_rejected(spark):
    from swivel_spark_prep_spark.operators.quality import fdr_bh

    # tied p = 0.05 at ranks 1,2 with m=2, q=0.1: c(0.05)=2 ->
    # 0.05 <= 2*0.1/2 = 0.1 -> both rejected, identically
    tie = spark.createDataFrame([("a", 0.05), ("b", 0.05)], "h string, p double")
    got = fdr_bh(tie, "p", q=0.1).collect()
    assert all(r["rejected"] for r in got)
    # nothing passes -> NULL cutoff, zero rejections, NULL p not counted
    none = spark.createDataFrame(
        [("a", 0.9), ("b", 0.95), ("c", None)], "h string, p double"
    )
    got2 = fdr_bh(none, "p", q=0.05).collect()
    assert all(not r["rejected"] for r in got2)
    assert all(r["p_cutoff"] is None for r in got2)
    assert all(r["m_tests"] == 2 for r in got2)


def test_bh_prefix_sum_bit_equal_and_large_m(spark):
    """Round-12 rebase pin (round-11 verdict What's wrong #1): c(p) now
    rides partitioned_prefix_sum instead of the triangular p'<=p join.
    (a) On 10^5 CONTINUOUS p-values (all distinct — the worst case for
    the old join, 10^10 pair rows) the operator completes and is
    bit-equal to the textbook sorted-index rule computed exactly on the
    driver. (b) The physical plan contains no nested-loop / non-equi
    join — the quadratic shape is gone, not just fast today."""
    import hashlib

    from swivel_spark_prep_spark.operators.quality import fdr_bh

    m = 100_000
    # deterministic "continuous" p-values: md5-derived uniforms, ~10% of
    # them scaled into the rejectable range so the cutoff is non-trivial
    base = spark.range(m).select(
        F.col("id"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 13), 16, 10)
            .cast("double")
            / float(16**13)
        ).alias("u"),
    )
    df = base.select(
        "id",
        F.when(F.col("id") % 10 == 0, F.col("u") * 0.001)
        .otherwise(F.col("u"))
        .alias("p"),
    )
    out = fdr_bh(df, "p", q=0.05)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the quadratic shape was a LeftOuter non-equi join of the
    # distinct-p relation against ALL p-values; the only nested-loop
    # joins left are Cross joins against broadcast 1-row aggregates
    # (m, cutoff — a pushed filter may ride them). Any outer/inner BNLJ
    # means the triangular join came back.
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line
    # exact driver-side BH on the same values
    pvals = sorted(
        (0.001 if i % 10 == 0 else 1.0)
        * (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) / float(16**13))
        for i in range(m)
    )
    cutoff = max(
        (p for k, p in enumerate(pvals, 1) if p <= k * 0.05 / m), default=None
    )
    n_rej = sum(1 for p in pvals if p <= cutoff)
    got = out.agg(
        F.sum(F.col("rejected").cast("long")).alias("nr"),
        F.max("p_cutoff").alias("cut"),
    ).collect()[0]
    assert got["nr"] == n_rej
    assert got["cut"] == cutoff  # bit-equal, not approx


def test_bh_validation(spark):
    from swivel_spark_prep_spark.operators.quality import fdr_bh

    df = spark.createDataFrame([("a", 0.5)], "h string, p double")
    with pytest.raises(ValueError):
        fdr_bh(df, "p", q=0.0)


# ----------------------------------------------------------- compaction
def test_ffd_plan_properties():
    from swivel_spark_prep_spark.operators.compaction import plan_compaction

    files = [(f"f{i}", s) for i, s in enumerate([90, 10, 40, 40, 30, 5, 60, 55])]
    plan = plan_compaction(files, target_bytes=100, small_fraction=0.5)
    # candidates: sizes < 50 -> 10, 40, 40, 30, 5; FFD: 40+40+10+5=95, 30
    # singleton bin (30) dropped... 30 fits 95? 95+30 > 100 -> own bin,
    # dropped as singleton
    assert len(plan) == 1
    assert plan[0]["bytes"] == 95 and len(plan[0]["paths"]) == 4
    # determinism
    assert plan == plan_compaction(files, 100, 0.5)
    # every bin respects the cap and has >= 2 files
    for b in plan:
        assert b["bytes"] <= 100 and len(b["paths"]) >= 2
    import pytest as _pt

    with _pt.raises(ValueError):
        plan_compaction(files, 0)
    with _pt.raises(ValueError):
        plan_compaction(files, 100, small_fraction=0.0)


def test_compact_table_roundtrip(spark, tmp_path):
    """Write a fragmented table, compact, verify: same rows, fewer
    files, originals gone, no temp dirs left, big files untouched."""
    from swivel_spark_prep_spark.operators.compaction import (
        compact_table,
        list_parquet_files,
    )

    d = str(tmp_path / "t")
    # 6 tiny single-row-group files + content marker per file
    for i in range(6):
        spark.range(i * 100, i * 100 + 50).write.mode(
            "append" if i else "overwrite"
        ).parquet(d)
    before_files = list_parquet_files(spark, d)
    before_rows = sorted(r["id"] for r in spark.read.parquet(d).collect())
    assert len(before_files) >= 4
    target = max(s for _, s in before_files) * 4
    stats = compact_table(spark, d, target_bytes=target, small_fraction=1.0)
    assert stats["bins"] >= 1 and stats["files_removed"] >= 2
    after_files = list_parquet_files(spark, d)
    assert len(after_files) < len(before_files)
    after_rows = sorted(r["id"] for r in spark.read.parquet(d).collect())
    assert after_rows == before_rows  # bit-for-bit row preservation
    assert not [f for f in __import__("os").listdir(d) if f.startswith("_compact_tmp")]
    # idempotence-ish: a second pass finds little-to-nothing to do
    stats2 = compact_table(spark, d, target_bytes=target, small_fraction=1.0)
    assert stats2["files_removed"] <= stats["files_removed"]


def test_cli_compact(spark, tmp_path, capsys):
    from swivel_spark_prep_spark import cli

    d = str(tmp_path / "t2")
    for i in range(4):
        spark.range(i * 10, i * 10 + 5).write.mode(
            "append" if i else "overwrite"
        ).parquet(d)
    rc = cli.main(["compact", "--table", d, "--target-mb", "1",
                   "--small-fraction", "1.0", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bins planned (dry run)" in out
    rc = cli.main(["compact", "--table", d, "--target-mb", "1",
                   "--small-fraction", "1.0"])
    assert rc == 0
    assert "# compacted" in capsys.readouterr().out
    assert sorted(r["id"] for r in spark.read.parquet(d).collect()) == sorted(
        list(range(0, 5)) + list(range(10, 15)) + list(range(20, 25)) + list(range(30, 35))
    )
