"""Property/behavior tests for the round-9 operators: DDSketch mergeable
quantiles (X144) and the CMS-backed bounded-state running top-k stream."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_table
from swivel_spark_prep_spark.operators.profile import (
    ddsketch_build,
    ddsketch_merge,
    ddsketch_quantiles,
)

ALPHA = 0.05
QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


# --- DDSketch: merge exactness ------------------------------------------------


def test_ddsketch_merge_equals_whole_table_sketch(spark, sf_dir):
    """Rollup-by-merge is EXACT over the sketch algebra: merging the
    per-source sketches must yield the identical (sign, bucket, cnt)
    relation as sketching the whole table in one pass — the property
    that makes per-shard profiling of a 100 TB corpus composable."""
    docs = load_table(spark, sf_dir, "documents")
    per_group = ddsketch_build(docs, "n_chars", "source", alpha=ALPHA)
    merged = {
        (r.sign, r.bucket): r.cnt
        for r in ddsketch_merge(per_group).collect()
    }
    whole = {
        (r.sign, r.bucket): r.cnt
        for r in ddsketch_build(docs, "n_chars", alpha=ALPHA).collect()
    }
    assert merged == whole


# --- DDSketch: relative-error guarantee ---------------------------------------


@pytest.mark.parametrize("alpha", [0.01, 0.05])
def test_ddsketch_relative_error_bound(spark, sf_dir, alpha):
    """The paper's guarantee: for each q, the estimate is within alpha
    relative error of the TRUE rank-floor(q*(n-1)) item. Checked
    against the exact order statistics (numpy sort of the fixture
    column — test-scale only)."""
    docs = load_table(spark, sf_dir, "documents")
    sk = ddsketch_build(docs, "n_chars", alpha=alpha)
    got = {
        round(r.q, 4): r.est
        for r in ddsketch_quantiles(sk, QS, alpha=alpha).collect()
    }
    vals = np.sort(
        np.array([r.n_chars for r in docs.select("n_chars").collect()], dtype=float)
    )
    n = len(vals)
    for q in QS:
        exact = vals[int(np.floor(q * (n - 1)))]
        est = got[round(q, 4)]
        assert abs(est - exact) <= alpha * abs(exact) + 1e-9, (
            f"q={q}: est {est} vs exact {exact} exceeds alpha={alpha}"
        )


def test_ddsketch_handles_negatives_zero_and_nulls(spark):
    """Sign-mirrored buckets: negatives, zero and NULLs all land where
    the value order puts them; NULLs are excluded entirely."""
    pdf = [(-100.0,), (-1.0,), (0.0,), (0.5,), (2.0,), (300.0,), (None,)]
    df = spark.createDataFrame(pdf, "x double")
    sk = ddsketch_build(df, "x", alpha=0.05)
    assert sk.agg(F.sum("cnt")).first()[0] == 6  # NULL excluded
    qs = {
        round(r.q, 4): r.est
        for r in ddsketch_quantiles(sk, [0.0, 0.5, 1.0], alpha=0.05).collect()
    }
    # rank 0 item is -100 -> estimate within 5% and negative
    assert qs[0.0] < 0 and abs(qs[0.0] + 100) <= 5 + 1e-9
    # median rank item is 0.5 (ranks: -100,-1,0,0.5,2,300 -> floor(0.5*5)=2 -> 0)
    assert qs[0.5] == 0.0
    assert abs(qs[1.0] - 300) <= 15 + 1e-9


def test_ddsketch_alpha_validation():
    with pytest.raises(ValueError):
        from swivel_spark_prep_spark.operators.profile import _dd_gamma

        _dd_gamma(1.5)


# --- CMS-backed running top-k stream ------------------------------------------


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_stream_running_topk_cms_matches_exact(spark, tmp_path, docs):
    """The bounded-state CMS variant must read back the SAME cumulative
    top-k as the exact-count stream on the fixture (at 4096x4 the
    fixture vocabulary has no colliding heavy hitters), while its state
    stays O(depth*width) cells + O(k*pool) candidates per batch."""
    import glob
    import shutil

    from swivel_spark_prep_spark.streaming import stream_running_topk_terms_cms

    stage = tmp_path / "stage"
    drops = tmp_path / "drops"
    drops.mkdir()
    half = docs.select("doc_id", "text")
    parts = [
        half.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    for i, part in enumerate(parts):
        part.coalesce(1).write.parquet(str(stage / f"b{i}"))
        f = glob.glob(str(stage / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(drops / f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drops))
    )
    k, depth, width, pool = 5, 4, 4096, 4
    q = stream_running_topk_terms_cms(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        k=k,
        width=width,
        depth=depth,
        pool=pool,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    last = max(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(str(tmp_path / "out" / "batch_id=*"))
    )
    got = [
        (r.token, r.est)
        for r in spark.read.parquet(str(tmp_path / "out" / f"batch_id={last}"))
        .orderBy(F.desc("est"), F.asc("token"))
        .collect()
    ]
    want = [
        (r.token, r.cnt)
        for r in half.select(
            F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
        .collect()
    ]
    assert got == want
    # bounded state: every batch's CMS grid and candidate list obey caps
    for b in range(last + 1):
        cms_rows = spark.read.parquet(
            str(tmp_path / "state" / "cms" / f"batch_id={b}")
        ).count()
        assert cms_rows <= depth * width
        cand_rows = spark.read.parquet(
            str(tmp_path / "state" / "cand" / f"batch_id={b}")
        ).count()
        assert cand_rows <= k * pool
