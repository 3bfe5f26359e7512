"""Round-11 extension operators (the X176–X180 family):

1. ewma (operators/timeseries.py): closed rescaled-window form equals
   the exact-recursion grouped-map twin; alpha=1 degenerates to the
   input; validation.
2. rendezvous routing (operators/routing.py): the HRW minimal-movement
   INVARIANT — a key whose assignment changes when a shard is ADDED can
   only have moved TO the new shard; assignments in range and roughly
   balanced.
3. JL random projection (operators/pca.py): seeded matrix is
   deterministic and ±1/√k; squared norms are preserved in expectation
   (the Johnson–Lindenstrauss property, within tolerance on the
   fixture).
4. kmv_jaccard (operators/profile.py): EXACT when every pairwise union
   fits the sketch (|A ∪ B| ≤ k); within the estimator tolerance on
   the corpus otherwise.
5. kneser_ney_bigram (operators/lm.py): hand-computed tiny-corpus
   values; per-context probabilities (observed mass + backoff mass over
   the full continuation vocabulary) sum to 1.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- ewma
def test_ewma_matches_grouped_map_twin(spark, sf_dir):
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.timeseries import (
        ewma,
        ewma_grouped_map,
    )

    ev = load_table(spark, sf_dir, "events")
    closed = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma(ev, "user_id", "ts", "value", alpha=0.3).collect()
    }
    exact = {
        (r["user_id"], r["ts"]): r["ewma"]
        for r in ewma_grouped_map(ev, "user_id", "ts", "value", alpha=0.3).collect()
    }
    assert closed.keys() == exact.keys() and len(closed) > 0
    for key, v in exact.items():
        assert abs(closed[key] - v) < 1e-9, key


def test_ewma_alpha_one_is_identity(spark):
    from swivel_spark_prep_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, i, float(10 + i)) for i in range(5)], "g int, t int, x double"
    )
    rows = ewma(df, "g", "t", "x", alpha=1.0).collect()
    assert all(r["ewma"] == r["x"] for r in rows)


def test_ewma_rejects_bad_alpha(spark):
    from swivel_spark_prep_spark.operators.timeseries import ewma

    df = spark.createDataFrame([(1, 1, 1.0)], "g int, t int, x double")
    with pytest.raises(ValueError):
        ewma(df, "g", "t", "x", alpha=0.0)


# ------------------------------------------------------------- routing
def test_hrw_moves_only_to_new_shard(spark):
    """The rendezvous property itself: adding shard n changes a key's
    assignment ONLY if the new shard wins — every moved key lands on
    the new shard, and the old assignments of unmoved keys are
    untouched."""
    from swivel_spark_prep_spark.operators.routing import rendezvous_assign

    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    a = rendezvous_assign(keys, "k", 7, out_col="s7")
    b = rendezvous_assign(a, "k", 8, out_col="s8").collect()
    moved = [r for r in b if r["s7"] != r["s8"]]
    assert 0 < len(moved) < len(b)  # some movement, never wholesale
    assert all(r["s8"] == 7 for r in moved)
    assert all(0 <= r["s7"] < 7 and 0 <= r["s8"] < 8 for r in b)


def test_hrw_balance(spark):
    from swivel_spark_prep_spark.operators.routing import rendezvous_assign

    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    counts = (
        rendezvous_assign(keys, "k", 4)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert len(counts) == 4
    for r in counts:  # 500 expected; generous 3-sigma-ish band
        assert 380 <= r["count"] <= 620, counts


def test_hrw_validation(spark):
    from swivel_spark_prep_spark.operators.routing import (
        rendezvous_assign,
        resharding_report,
    )

    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        rendezvous_assign(df, "k", 0)
    with pytest.raises(ValueError):
        resharding_report(df, "k", 5, 5)


# ------------------------------------------------------ JL projection
def test_jl_sign_matrix_deterministic():
    from swivel_spark_prep_spark.operators.pca import jl_sign_matrix

    m1 = jl_sign_matrix(8, 4)
    m2 = jl_sign_matrix(8, 4)
    assert m1 == m2
    inv = 1.0 / 2.0
    assert all(v in (inv, -inv) for row in m1 for v in row)
    assert jl_sign_matrix(8, 4, salt="other") != m1


def test_jl_preserves_norms(spark, sf_dir):
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.pca import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        random_projection(emb, k=16)
        .select(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x * x,
            ).alias("n2"),
            F.aggregate(
                "proj", F.lit(0.0), lambda a, x: a + x * x
            ).alias("p2"),
        )
        .collect()
    )
    ratios = [r["p2"] / r["n2"] for r in rows if r["n2"] > 0]
    mean = sum(ratios) / len(ratios)
    # E[ratio] = 1; k=16 gives sd ≈ sqrt(2/k) ≈ 0.35 per vector, so the
    # corpus mean over hundreds of vectors sits well inside ±0.15
    assert abs(mean - 1.0) < 0.15, mean


# -------------------------------------------------------- kmv_jaccard
def test_kmv_jaccard_exact_when_union_fits(spark):
    from swivel_spark_prep_spark.operators.profile import (
        kmv_build,
        kmv_jaccard,
    )

    rows = (
        [("a", f"t{i}") for i in range(40)]
        + [("b", f"t{i}") for i in range(20, 60)]  # |A∩B|=20, |A∪B|=60
        + [("c", f"t{i}") for i in range(100, 120)]  # disjoint from a
    )
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_build(df, "v", group_col="g", k=256)
    j = {
        (r["g1"], r["g2"]): (r["j_est"], r["union_k"])
        for r in kmv_jaccard(sk, k=256).collect()
    }
    assert j[("a", "b")] == (round(20 / 60, 6), 60)
    assert j[("a", "c")] == (0.0, 60)
    assert j[("b", "c")] == (0.0, 60)


def test_kmv_jaccard_estimator_tolerance(spark, sf_dir):
    """Sketch estimate vs exact token Jaccard on the corpus: k=128
    bottom-k resemblance has sd ≈ sqrt(J(1−J)/k) ≤ 0.045; assert every
    source pair is within 4σ + exactness slack."""
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.profile import (
        kmv_build,
        kmv_jaccard,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    sk = kmv_build(toks, "t", group_col="source", k=128)
    est = {
        (r["g1"], r["g2"]): r["j_est"] for r in kmv_jaccard(sk, k=128).collect()
    }
    sets = {
        r["source"]: set(r["ts"])
        for r in toks.groupBy("source")
        .agg(F.collect_set("t").alias("ts"))
        .collect()
    }
    assert len(est) == len(sets) * (len(sets) - 1) // 2
    for (g1, g2), e in est.items():
        a, b = sets[g1], sets[g2]
        exact = len(a & b) / len(a | b)
        assert abs(e - exact) < 4 * math.sqrt(max(exact * (1 - exact), 0.01) / 128) + 1e-6, (
            g1,
            g2,
            e,
            exact,
        )


# --------------------------------------------------------- Kneser–Ney
def test_kneser_ney_tiny_corpus_exact(spark):
    from swivel_spark_prep_spark.operators.lm import kneser_ney_bigram

    docs = spark.createDataFrame(
        [("a b a c",), ("a b c b",)], "text string"
    )
    # bigrams: (a,b)x2 (b,a)x1 (a,c)x1 (b,c)x1 (c,b)x1
    # ctx: a: c1=3 nf=2 | b: c1=2 nf=2 | c: c1=1 nf=1
    # cont: a:1 b:2 c:2 ; n_types=5 ; D=0.75
    got = {
        (r["w1"], r["w2"]): r["p_kn"]
        for r in kneser_ney_bigram(docs).collect()
    }
    D, T = 0.75, 5.0

    def p(c, c1, nf, nprec):
        return max(c - D, 0.0) / c1 + D * nf / c1 * nprec / T

    exp = {
        ("a", "b"): p(2, 3, 2, 2),
        ("a", "c"): p(1, 3, 2, 2),
        ("b", "a"): p(1, 2, 2, 1),
        ("b", "c"): p(1, 2, 2, 2),
        ("c", "b"): p(1, 1, 1, 2),
    }
    assert got.keys() == exp.keys()
    for k_, v in exp.items():
        assert abs(got[k_] - v) < 1e-12, k_


def test_kneser_ney_normalizes_per_context(spark, sf_dir):
    """Σ_{w2∈V} P(w2|w1) = 1 for every context: observed mass from the
    returned rows, unseen mass = λ(w1)·Σ_{unseen w2} P_cont(w2),
    reconstructed from the same relation."""
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.lm import kneser_ney_bigram

    docs = load_table(spark, sf_dir, "documents").limit(100)
    pdf = kneser_ney_bigram(docs, discount=0.75).toPandas()
    n_types = len(pdf)
    cont = pdf.groupby("w2").size()  # n_prec per w2
    pcont = cont / n_types
    ctx = pdf.groupby("w1").agg(c1=("c", "sum"), nf=("c", "size"))
    for w1 in list(ctx.index)[:50]:
        lam = 0.75 * ctx.loc[w1, "nf"] / ctx.loc[w1, "c1"]
        seen = pdf[pdf.w1 == w1]
        observed_mass = seen.p_kn.sum()
        unseen_mass = lam * pcont[~pcont.index.isin(seen.w2)].sum()
        assert abs(observed_mass + unseen_mass - 1.0) < 1e-9, w1
