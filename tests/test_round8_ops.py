"""Property/behavior tests for the round-8 operators: PageRank, CMS,
RRF fusion, matryoshka stats, DSIR weights, k-fold assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swivel_spark_prep_spark.catalog import load_table
from swivel_spark_prep_spark.operators.graph import degree_stats, pagerank
from swivel_spark_prep_spark.operators.heavyhitters import cms_build, cms_estimate
from swivel_spark_prep_spark.operators.sampling import dsir_weights, kfold_assign
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
