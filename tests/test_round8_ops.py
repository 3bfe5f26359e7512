"""Property/behavior tests for the round-8 operators: PageRank, CMS,
RRF fusion, matryoshka stats, DSIR weights, k-fold assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_table
from swivel_spark_prep_spark.operators.graph import degree_stats, pagerank
from swivel_spark_prep_spark.operators.heavyhitters import cms_build, cms_estimate
from swivel_spark_prep_spark.operators.sampling import (
    dsir_weights,
    kfold_assign,
    negative_samples,
)
from swivel_spark_prep_spark.operators.search import rrf_fuse
from swivel_spark_prep_spark.operators.similarity import matryoshka_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# --- PageRank ---------------------------------------------------------------


def _edges(spark):
    # a -> b -> c, a -> c, d dangling-source into a; c is a sink
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")], "src string, dst string"
    )


def test_pagerank_mass_conserved(spark):
    total = pagerank(_edges(spark), iterations=4).agg(F.sum("pagerank")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_zero_iterations_is_uniform(spark):
    rows = pagerank(_edges(spark), iterations=0).collect()
    assert len(rows) == 4
    assert all(abs(r.pagerank - 0.25) < 1e-12 for r in rows)


def test_pagerank_sink_collects_most_mass(spark):
    ranks = {r.node: r.pagerank for r in pagerank(_edges(spark), iterations=8).collect()}
    # c receives from a, b and has no outlinks — it must dominate
    assert ranks["c"] == max(ranks.values())
    # d has no in-links: it sits at the teleport+dangling floor
    assert ranks["d"] == min(ranks.values())


def test_pagerank_multi_edge_weighting_toggle(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], "src string, dst string"
    )
    dedup = {r.node: r.pagerank for r in pagerank(e, iterations=3).collect()}
    weighted = {
        r.node: r.pagerank
        for r in pagerank(e, iterations=3, dedup_edges=False).collect()
    }
    assert abs(dedup["b"] - dedup["c"]) < 1e-12  # collapsed: b and c equal
    assert weighted["b"] > weighted["c"]  # weighted: b gets 2/3 of a's mass


def test_degree_stats(spark):
    got = {r.node: (r.out_degree, r.in_degree) for r in degree_stats(_edges(spark)).collect()}
    assert got == {"a": (2, 1), "b": (1, 1), "c": (0, 2), "d": (1, 0)}


# --- count-min sketch -------------------------------------------------------


def test_cms_never_undercounts(spark, docs):
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    cms = cms_build(toks, "token", width=256, depth=3)
    exact = toks.groupBy("token").agg(F.count("*").alias("exact"))
    joined = (
        cms_estimate(cms, exact.select("token"), "token", width=256, depth=3)
        .join(exact, "token")
        .select("token", "est", "exact")
        .collect()
    )
    assert joined, "no tokens"
    assert all(r.est >= r.exact for r in joined)


def test_cms_merges_by_reaggregation(spark, docs):
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    full = cms_build(toks, "token", width=128, depth=2)
    a = cms_build(toks.filter(F.col("doc_id") % 2 == 0), "token", width=128, depth=2)
    b = cms_build(toks.filter(F.col("doc_id") % 2 == 1), "token", width=128, depth=2)
    merged = a.unionAll(b).groupBy("d", "col").agg(F.sum("cnt").alias("cnt"))
    assert (
        merged.exceptAll(full).count() == 0 and full.exceptAll(merged).count() == 0
    )


# --- RRF fusion -------------------------------------------------------------


def test_rrf_overlap_beats_single_list(spark):
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.0)], "doc_id long, score double"
    )
    dense = spark.createDataFrame(
        [(2, 0.9), (4, 0.8), (5, 0.7)], "doc_id long, score double"
    )
    rows = {r.doc_id: (r.rrf, r.n_lists) for r in rrf_fuse(
        {"lex": lex, "dense": dense}, k_rrf=60, k=10
    ).collect()}
    assert rows[2][1] == 2 and rows[1][1] == 1
    # doc 2 appears in both lists (ranks 2 and 1): beats every single-list doc
    assert rows[2][0] == max(v[0] for v in rows.values())
    assert abs(rows[2][0] - (1 / 62 + 1 / 61)) < 1e-12


def test_rrf_requires_input(spark):
    with pytest.raises(ValueError):
        rrf_fuse({})


# --- matryoshka -------------------------------------------------------------


def test_matryoshka_ratio_monotone_and_full_dim_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = matryoshka_stats(emb, [8, 32, 64]).collect()
    by_grp: dict = {}
    for r in rows:
        by_grp.setdefault(r.grp, {})[r.trunc_dim] = (r.mean_ratio, r.min_ratio)
    for grp, d in by_grp.items():
        assert d[8][0] <= d[32][0] <= d[64][0] + 1e-12
        assert abs(d[64][0] - 1.0) < 1e-9 and abs(d[64][1] - 1.0) < 1e-9
        assert 0.0 < d[8][1] <= d[8][0]


# --- DSIR -------------------------------------------------------------------


def test_dsir_signal_and_edge_cases(spark):
    rows = [(i, "t", "alpha beta gamma delta") for i in range(20)] + [
        (100 + i, "r", "one two three four") for i in range(20)
    ]
    rows.append((999, "r", "alpha beta gamma delta"))  # target-looking raw doc
    rows.append((998, "r", "solo"))  # no bigram
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    w = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in dsir_weights(df, F.col("grp") == "t", n_buckets=512).collect()
    }
    assert w[998] == (0, 0.0)  # <2 tokens: zero features, zero weight
    assert w[999][1] > 0  # target-like raw doc scores positive
    assert w[100][1] < 0  # raw-typical doc scores negative
    assert w[999][1] > w[100][1]


# --- k-fold -----------------------------------------------------------------


def test_kfold_disjoint_stable_and_bounded(spark, docs):
    a = kfold_assign(docs, "doc_id", k=5).select("doc_id", "fold")
    b = kfold_assign(docs, "doc_id", k=5).select("doc_id", "fold")
    assert a.exceptAll(b).count() == 0  # deterministic
    folds = [r.fold for r in a.select("fold").distinct().collect()]
    assert set(folds) <= set(range(5))
    n = docs.count()
    per = {r.fold: r["count"] for r in a.groupBy("fold").count().collect()}
    assert sum(per.values()) == n  # total partition, no dup/loss
    with pytest.raises(ValueError):
        kfold_assign(docs, "doc_id", k=1)


# --- SCD2 -------------------------------------------------------------------


def test_scd2_intervals_and_delete_semantics(spark):
    from swivel_spark_prep_spark.operators.upsert import scd2_build

    ch = spark.createDataFrame(
        [
            (1, 10, "I", "a"),
            (1, 20, "U", "b"),
            (1, 30, "D", None),
            (2, 5, "I", "x"),
        ],
        "k long, v long, op string, attr string",
    )
    rows = {
        (r.k, r.valid_from): (r.valid_to, r.is_current, r.attr)
        for r in scd2_build(ch, ["k"], "v", ["attr"]).collect()
    }
    assert rows[(1, 10)] == (20, False, "a")   # closed by the update
    assert rows[(1, 20)] == (30, False, "b")   # closed by the delete
    assert (1, 30) not in rows                  # D opens nothing
    assert rows[(2, 5)] == (None, True, "x")    # live row stays open


# --- span corruption --------------------------------------------------------


def test_span_corruption_non_overlapping_and_in_bounds(spark, docs):
    from swivel_spark_prep_spark.operators.chunking import span_corruption_spec

    spec = span_corruption_spec(docs, block=20, span_len=3)
    n_tok = docs.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
    )
    joined = spec.join(n_tok, "doc_id").collect()
    assert joined
    per_doc: dict = {}
    for r in joined:
        assert 0 <= r.start and r.start + r.length <= r.n
        # span stays inside its own block => non-overlap across spans
        assert r.start // 20 == r.span_id
        assert (r.start + r.length - 1) // 20 == r.span_id
        per_doc.setdefault(r.doc_id, []).append(r)
    for rows in per_doc.values():
        assert len({r.span_id for r in rows}) == len(rows)


def test_span_corruption_short_doc_has_no_spans(spark):
    from swivel_spark_prep_spark.operators.chunking import span_corruption_spec

    df = spark.createDataFrame(
        [(1, "only five words right here")], "doc_id long, text string"
    )
    assert span_corruption_spec(df, block=20, span_len=3).count() == 0


# --- negative sampling ------------------------------------------------------


def test_negative_samples_cross_label_and_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = negative_samples(emb, k=3, pool_per_label=20)
    rows = a.collect()
    assert rows
    assert all(r.label != r.neg_label for r in rows)
    per_anchor: dict = {}
    for r in rows:
        per_anchor.setdefault(r.vec_id, set()).add(r.neg_id)
    assert all(len(s) == 3 for s in per_anchor.values())  # k distinct negs
    b = negative_samples(emb, k=3, pool_per_label=20)
    assert a.exceptAll(b).count() == 0  # reproducible


# --- audio energy segmentation ----------------------------------------------


def _wav_df(spark, samples, doc_id=1):
    from swivel_spark_prep_spark.operators import codecs

    return spark.createDataFrame(
        [(doc_id, bytearray(codecs.encode_wav(samples, 8000)))],
        "doc_id long, payload binary",
    )


def test_audio_segments_silence_yields_none(spark):
    import numpy as np

    from swivel_spark_prep_spark.operators.multimodal import audio_energy_segments

    silent = np.zeros(2048, dtype=np.int16)
    assert audio_energy_segments(_wav_df(spark, silent)).count() == 0


def test_audio_segments_bursts_are_located(spark):
    import numpy as np

    from swivel_spark_prep_spark.operators.multimodal import audio_energy_segments

    x = np.zeros(4096, dtype=np.int16)
    t = np.arange(1024)
    tone = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    x[512 : 512 + 1024] = tone      # burst 1
    x[3000 : 3000 + 1024] = tone[:1096]  # burst 2 (clipped at 4024)
    rows = sorted(
        audio_energy_segments(_wav_df(spark, x)).collect(),
        key=lambda r: r.start_ms,
    )
    assert len(rows) == 2
    # 8 kHz => 1 ms per 8 samples; burst 1 spans samples [512, 1536)
    assert abs(rows[0].start_ms - 512 // 8) <= 64 // 8
    assert abs(rows[0].end_ms - 1536 // 8) <= 2 * 64 // 8
    assert rows[0].peak_db > -30 and rows[1].peak_db > -30
    assert rows[0].seg_id == 0 and rows[1].seg_id == 1


# --- streaming drift monitor ------------------------------------------------


def test_stream_drift_monitor_flags_shifted_batch(spark, tmp_path):
    from swivel_spark_prep_spark.streaming import stream_drift_monitor

    baseline = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("value")
    )
    import glob
    import shutil

    stage = tmp_path / "stage"
    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    # batch 0: same distribution; batch 1: shifted by +200 (clear drift)
    baseline.coalesce(1).write.parquet(str(stage / "b0"))
    baseline.select((F.col("value") + 200.0).alias("value")).coalesce(1).write.parquet(
        str(stage / "b1")
    )
    for i, b in enumerate(["b0", "b1"]):
        part = glob.glob(str(stage / b / "part-*.parquet"))[0]
        shutil.copy(part, str(drop_dir / f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drop_dir))
    )
    q = stream_drift_monitor(
        stream,
        baseline,
        ["value"],
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "out")).collect()
    by_batch = {r.batch_id: (r.psi, r.verdict) for r in got}
    assert set(by_batch) == {0, 1}
    assert by_batch[0][1] == "stable"
    assert by_batch[1][1] == "drifted" and by_batch[1][0] > 0.25


# --- CLI select (DSIR) ------------------------------------------------------


def test_cli_select_keeps_target_fraction(spark, tmp_path, sf_dir):
    from swivel_spark_prep_spark import cli

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    src = str(tmp_path / "sel_in")
    docs.write.parquet(src)
    out = str(tmp_path / "sel_out")
    rc = cli.main(
        [
            "select",
            "--input", src,
            "--target-sql", "source IN ('src0','src1','src2','src3')",
            "--output", out,
            "--keep", "0.25",
        ]
    )
    assert rc == 0
    kept = spark.read.parquet(out)
    n_raw = docs.filter(~F.col("source").isin("src0", "src1", "src2", "src3")).count()
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw
    # percentile cut: within ties of the requested quarter
    assert abs(n_kept - 0.25 * n_raw) <= 0.1 * n_raw
    # only raw (non-target) rows are emitted
    assert kept.filter(F.col("source").isin("src0", "src1", "src2", "src3")).count() == 0


# --- cross-validated label audit -------------------------------------------


def test_crossval_audit_equals_separate_training(spark, docs):
    """The fold-difference algebra must give EXACTLY the per-fold
    predictions of training a fresh classifier without that fold."""
    from swivel_spark_prep_spark.operators.lm import (
        nb_char_trigram_classifier,
        nb_crossval_audit,
    )
    from swivel_spark_prep_spark.operators.sampling import kfold_assign

    d = docs.select("doc_id", "lang", "text").limit(200)
    audit = nb_crossval_audit(d, k=3).collect()
    by_doc = {r.doc_id: (r.fold, r.pred) for r in audit}
    folded = kfold_assign(d, "doc_id", k=3)
    for f in [0, 2]:
        train = folded.filter(F.col("fold") != f).drop("fold")
        score = folded.filter(F.col("fold") == f).drop("fold")
        want = {
            r.doc_id: r.pred
            for r in nb_char_trigram_classifier(train, score).collect()
        }
        for doc_id, pred in want.items():
            assert by_doc[doc_id] == (f, pred), (
                f"fold {f} doc {doc_id}: audit {by_doc[doc_id]} vs fresh {pred}"
            )


# --- waterfilling allocator -------------------------------------------------


def test_waterfill_budget_conserved_and_capped(spark, docs):
    from swivel_spark_prep_spark.operators.sampling import token_budget_allocation

    out = token_budget_allocation(docs, budget=20000, temperature=2.0).collect()
    assert abs(sum(r.alloc_tokens for r in out) - 20000) < 1e-6
    assert all(r.alloc_tokens <= r.n_tokens + 1e-9 for r in out)
    assert all((r.alloc_tokens == r.n_tokens) == r.saturated for r in out)
    # a budget beyond the corpus saturates everything
    total = sum(r.n_tokens for r in out)
    full = token_budget_allocation(docs, budget=total * 10, temperature=2.0).collect()
    assert all(r.saturated and r.alloc_tokens == r.n_tokens for r in full)
    with pytest.raises(ValueError):
        token_budget_allocation(docs, budget=0)


def test_hard_negatives_all_cross_label(spark, sf_dir):
    from swivel_spark_prep_spark.operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = hard_negatives(
        emb, (F.col("label") == 0) & (F.col("vec_id") % 5 == 0), k=4
    ).collect()
    assert rows
    for r in rows:
        assert labels[r.anchor_id] == 0
        assert labels[r.neg_id] != 0
        assert r.neg_id != r.anchor_id


# --- retrieval metrics ------------------------------------------------------


def test_retrieval_metrics_hand_example(spark):
    from swivel_spark_prep_spark.operators.search import retrieval_metrics
    import math

    # q1: rel docs {a, b, c}; retrieved ranks: a@1, x@2, b@4 => hits 2
    results = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "x", 2), ("q1", "b", 4), ("q1", "y", 5)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 1), ("q1", "c", 1), ("q2", "z", 1)],
        "query_id string, doc_id string, rel int",
    )
    rows = {r.query_id: r for r in retrieval_metrics(results, qrels, k=5).collect()}
    r1 = rows["q1"]
    assert r1.n_rel == 3
    assert abs(r1.recall - 2 / 3) < 1e-12
    assert abs(r1.mrr - 1.0) < 1e-12  # first relevant at rank 1
    dcg = 1 / math.log2(2) + 1 / math.log2(5)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(r1.ndcg - dcg / idcg) < 1e-12
    # q2 retrieved nothing: zero metrics, not missing
    r2 = rows["q2"]
    assert (r2.recall, r2.mrr, r2.ndcg) == (0.0, 0.0, 0.0)


# --- personalized PageRank --------------------------------------------------


def test_ppr_mass_conserved_and_concentrates_on_seeds(spark):
    rows_u = pagerank(_edges(spark), iterations=6).collect()
    rows_p = pagerank(_edges(spark), iterations=6, seeds=["d"]).collect()
    assert abs(sum(r.pagerank for r in rows_p) - 1.0) < 1e-9
    u = {r.node: r.pagerank for r in rows_u}
    p = {r.node: r.pagerank for r in rows_p}
    # teleporting to d lifts d the most (relative to uniform PR), and d
    # keeps at least its direct teleport share (1-damping)·1
    assert p["d"] > u["d"] and p["d"] >= 0.15
    lifts = {n: p[n] / u[n] for n in p}
    assert max(lifts, key=lifts.get) == "d"
    with pytest.raises(ValueError):
        pagerank(_edges(spark), iterations=2, seeds=[])


# --- running top-k terms stream ---------------------------------------------


def test_stream_running_topk_terms_accumulates(spark, tmp_path, docs):
    import glob
    import shutil

    from swivel_spark_prep_spark.streaming import stream_running_topk_terms

    stage = tmp_path / "stage"
    drops = tmp_path / "drops"
    drops.mkdir()
    half = docs.select("doc_id", "text")
    a = half.filter(F.col("doc_id") % 2 == 0)
    b = half.filter(F.col("doc_id") % 2 == 1)
    for i, part in enumerate([a, b]):
        part.coalesce(1).write.parquet(str(stage / f"b{i}"))
        f = glob.glob(str(stage / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(f, str(drops / f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drops))
    )
    q = stream_running_topk_terms(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        k=5,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the last snapshot must equal the batch top-5 over the FULL corpus
    last = max(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(str(tmp_path / "out" / "batch_id=*"))
    )
    got = [
        (r.token, r.cnt)
        for r in spark.read.parquet(
            str(tmp_path / "out" / f"batch_id={last}")
        )
        .orderBy(F.desc("cnt"), F.asc("token"))
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
        .limit(5)
        .collect()
    ]
    assert got == want


# --- association rules ------------------------------------------------------


def test_association_rules_hand_example(spark):
    from swivel_spark_prep_spark.operators.timeseries import association_rules

    ev = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c")],
        "user_id long, event_type string",
    )
    rows = {
        (r.antecedent, r.consequent): (r.n_both, r.support, r.confidence, r.lift)
        for r in association_rules(ev).collect()
    }
    n_both, sup, conf, lift = rows[("a", "b")]
    # 4 baskets; a in 3, b in 2, both in 2
    assert n_both == 2 and abs(sup - 0.5) < 1e-12
    assert abs(conf - 2 / 3) < 1e-12
    assert abs(lift - (2 / 3) / (2 / 4)) < 1e-12
    assert ("a", "c") not in rows  # never co-occur
    # symmetry of n_both, asymmetry of confidence
    assert rows[("b", "a")][0] == 2 and abs(rows[("b", "a")][2] - 1.0) < 1e-12


# --- trimmed stats ----------------------------------------------------------


def test_trimmed_stats_excludes_extremes(spark):
    from swivel_spark_prep_spark.operators.quality import trimmed_stats

    vals = [(1, "g", float(v)) for v in range(1, 100)] + [
        (100, "g", 1e9)  # one absurd outlier
    ]
    df = spark.createDataFrame(vals, "id long, g string, v double")
    r = trimmed_stats(df, "v", "g", 0.05, 0.95).collect()[0]
    assert r.n_clipped >= 1 and r.trimmed_mean < 100  # outlier excluded
    with pytest.raises(ValueError):
        trimmed_stats(df, "v", "g", 0.9, 0.1)


# --- linear interpolation ---------------------------------------------------


def test_resample_interpolate_lerp_and_edges(spark):
    from swivel_spark_prep_spark.operators.timeseries import resample_interpolate
    import datetime

    # user 1: observed buckets 0 and 3 (values 0 and 30): buckets 1, 2
    # must be 10 and 20; user 2: single observation -> single flat row
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 0.0),
        (1, base + datetime.timedelta(hours=18), 30.0),
        (2, base, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.bucket_idx % 4 if r.user_id == 1 else 0): (
            round(r.value, 6),
            r.interpolated,
        )
        for r in resample_interpolate(df, 21600).collect()
    }
    u1 = sorted(
        (k[1], v) for k, v in got.items() if k[0] == 1
    )
    assert [v for _, v in u1] == [
        (0.0, False),
        (10.0, True),
        (20.0, True),
        (30.0, False),
    ]
    assert len([k for k in got if k[0] == 2]) == 1


# --- CLI drift + pagerank ---------------------------------------------------


def test_cli_drift_and_pagerank(spark, tmp_path, capsys):
    from swivel_spark_prep_spark import cli

    base = spark.range(0, 1000).select((F.col("id") % 50).cast("double").alias("v"))
    cur = base.select((F.col("v") + 100.0).alias("v"))
    bdir, cdir = str(tmp_path / "b"), str(tmp_path / "c")
    base.write.parquet(bdir)
    cur.write.parquet(cdir)
    rc = cli.main(["drift", "--baseline", bdir, "--current", cdir, "--cols", "v"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "drifted" in out

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")], "src string, dst string"
    )
    edir, odir = str(tmp_path / "e"), str(tmp_path / "pr")
    edges.write.parquet(edir)
    rc = cli.main(
        ["pagerank", "--input", edir, "--iterations", "6", "--output", odir]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0].startswith("c\t")  # the sink dominates
    back = spark.read.parquet(odir)
    assert abs(sum(r.pagerank for r in back.collect()) - 1.0) < 1e-9
