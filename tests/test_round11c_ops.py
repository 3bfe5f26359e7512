"""Round-11c extension operators (the X181–X184 family):

1. golden_record (operators/dedup.py): per-rule survivorship on a
   hand-built cluster — mode/longest tie-breaks to the LARGEST value,
   NULLs never win, unknown rules and empty specs raise.
2. label_propagation (operators/graph.py): hand-computed spread on a
   path graph; seeds stay clamped against disagreeing neighbors; count
   ties break to the SMALLEST label; conflicting seeds raise; rounds=0
   returns exactly the seeds.
3. join_size_estimate (operators/profile.py): EXACT when both key sets
   fit the sketch and multiplicities are uniform; within estimator
   tolerance of the true join size on the fixture.
4. embedding_class_scatter (operators/evalmetrics.py): hand-computed
   1-D case; the ANOVA identity total_ss = within_ss + between_ss on
   the fixture; degenerate single-label input yields NULL fisher_f.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------- golden_record
def test_golden_record_rules_and_ties(spark):
    from swivel_spark_prep_spark.operators.dedup import golden_record

    rows = [
        # cluster c1: mode(lang) tie en/fr 2-2 -> 'fr' (largest);
        # longest(text) tie at length 4 -> 'zzzz' (largest value)
        ("c1", 3, "en", "aaaa"),
        ("c1", 1, "en", "zzzz"),
        ("c1", 7, "fr", "bb"),
        ("c1", 5, "fr", None),
        # cluster c2: NULL lang rows never win mode even as majority
        ("c2", 9, None, "x"),
        ("c2", 8, None, "xy"),
        ("c2", 4, "de", "q"),
    ]
    df = spark.createDataFrame(rows, "cluster string, id int, lang string, text string")
    got = {
        r["cluster"]: r
        for r in golden_record(
            df, "cluster", {"id": "min", "lang": "mode", "text": "longest"}
        ).collect()
    }
    assert got["c1"]["n_members"] == 4
    assert got["c1"]["id"] == 1
    assert got["c1"]["lang"] == "fr"
    assert got["c1"]["text"] == "zzzz"
    assert got["c2"]["lang"] == "de"
    assert got["c2"]["text"] == "xy"


def test_golden_record_validation(spark):
    from swivel_spark_prep_spark.operators.dedup import golden_record

    df = spark.createDataFrame([("a", 1)], "cluster string, id int")
    with pytest.raises(ValueError):
        golden_record(df, "cluster", {})
    with pytest.raises(ValueError):
        golden_record(df, "cluster", {"id": "median"})


# --------------------------------------------------- label_propagation
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, pairs):
    return spark.createDataFrame(pairs, "node string, label string")


def test_lpa_path_graph_spread(spark):
    """a-b-c-d path, seed a=X: round1 labels b, round2 labels c,
    round3 labels d — the frontier advances one hop per round."""
    from swivel_spark_prep_spark.operators.graph import label_propagation

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    s = _seeds(spark, [("a", "X")])
    for rounds, expect in [(0, {"a"}), (1, {"a", "b"}), (3, {"a", "b", "c", "d"})]:
        got = {r["node"]: r["label"] for r in label_propagation(e, s, rounds).collect()}
        assert set(got) == expect and set(got.values()) == {"X"}


def test_lpa_seed_clamped_and_tie_break(spark):
    """Center node m has neighbors labeled A and B (one each) — the
    count tie breaks to the SMALLEST label A. Seed node sb keeps label
    B even though both of its neighbors say A."""
    from swivel_spark_prep_spark.operators.graph import label_propagation

    e = _edges(spark, [("sa", "m"), ("sb", "m"), ("sa", "sb"), ("sa2", "sb")])
    s = _seeds(spark, [("sa", "A"), ("sa2", "A"), ("sb", "B")])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, s, rounds=2).collect()
    }
    assert got["m"] == "A"  # tie A-vs-B -> smallest
    assert got["sb"] == "B"  # clamped
    assert got["sa"] == "A" and got["sa2"] == "A"


def test_lpa_conflicting_seeds_raise(spark):
    from swivel_spark_prep_spark.operators.graph import label_propagation

    e = _edges(spark, [("a", "b")])
    s = _seeds(spark, [("a", "X"), ("a", "Y")])
    with pytest.raises(ValueError):
        label_propagation(e, s, rounds=1)


# ------------------------------------------------- join_size_estimate
def test_join_size_exact_when_sketch_fits(spark):
    """Both key sets < k and every key has uniform multiplicity: the
    sketch holds the full distinct sets, so ndv/overlap are exact and
    est_rows equals the true join cardinality."""
    from swivel_spark_prep_spark.operators.profile import join_size_estimate

    # A: keys 0..49 x3 rows each; B: keys 25..74 x2 rows each
    a = spark.createDataFrame([(i % 50,) for i in range(150)], "k int")
    b = spark.createDataFrame([(25 + i % 50,) for i in range(100)], "k int")
    r = join_size_estimate(a, "k", b, "k", k=256).collect()[0]
    assert (r["rows_a"], r["rows_b"]) == (150, 100)
    assert (r["ndv_a"], r["ndv_b"], r["ndv_union"]) == (50, 50, 75)
    assert r["ndv_inter"] == 25
    true_join = a.join(b, "k").count()  # 25 keys x 3 x 2 = 150
    assert r["est_rows"] == true_join == 150


def test_join_size_estimate_tolerance_fixture(spark, sf_dir):
    """orders ⋈ customer on custkey at the fixture: the KMV estimate
    must land within the standard bottom-k error envelope of the true
    join size (ndv error ~ 1/sqrt(k) per sketch; 3 sketches compound —
    use a generous 25% band, the operator is a planner hint)."""
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.profile import join_size_estimate

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    est = join_size_estimate(orders, "o_custkey", cust, "c_custkey", k=256).collect()[0]
    true_join = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    assert abs(est["est_rows"] - true_join) <= 0.25 * true_join + 5, (
        est["est_rows"],
        true_join,
    )


# -------------------------------------------- embedding_class_scatter
def test_class_scatter_hand_computed(spark):
    """1-D, two labels: A = {0, 2} (c=1), B = {4, 6} (c=5), g = 3.
    within = (1+1) + (1+1) = 4; between = 2*(1-3)^2 + 2*(5-3)^2 = 16;
    F = (16/1) / (4/2) = 8."""
    from swivel_spark_prep_spark.operators.evalmetrics import (
        embedding_class_scatter,
    )

    df = spark.createDataFrame(
        [("A", [0.0]), ("A", [2.0]), ("B", [4.0]), ("B", [6.0])],
        "label string, embedding array<float>",
    )
    r = embedding_class_scatter(df).collect()[0]
    assert (r["n_docs"], r["n_labels"], r["dim"]) == (4, 2, 1)
    assert r["within_ss"] == 4.0
    assert r["between_ss"] == 16.0
    assert r["fisher_f"] == 8.0


def test_class_scatter_anova_identity(spark, sf_dir):
    """within_ss + between_ss must equal the total sum of squared
    deviations from the global centroid — the exact ANOVA decomposition,
    checked independently on the fixture."""
    from swivel_spark_prep_spark.catalog import load_table
    from swivel_spark_prep_spark.operators.evalmetrics import (
        embedding_class_scatter,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    r = embedding_class_scatter(emb).collect()[0]
    ex = emb.filter(
        F.col("label").isNotNull() & F.col("embedding").isNotNull()
    ).select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "j", "x"
        )
    )
    tot = (
        ex.groupBy("j")
        .agg(
            (F.sum(F.col("x") * F.col("x")) - F.pow(F.sum("x"), 2) / F.count("*")).alias(
                "t"
            )
        )
        .agg(F.sum("t").alias("total"))
        .collect()[0]["total"]
    )
    assert abs((r["within_ss"] + r["between_ss"]) - tot) < 1e-4 * max(abs(tot), 1.0)


def test_class_scatter_single_label_null_f(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import (
        embedding_class_scatter,
    )

    df = spark.createDataFrame(
        [("A", [1.0, 2.0]), ("A", [3.0, 4.0])], "label string, embedding array<float>"
    )
    r = embedding_class_scatter(df).collect()[0]
    assert r["n_labels"] == 1 and r["fisher_f"] is None
