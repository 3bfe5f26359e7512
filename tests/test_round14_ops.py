"""Round-14 operator pins.

Covers the round-13 verdict's Next #3: the ANN candidate path of
margin_neighbors (method="ann") and semantic_dedup's LSH intra-cluster
escape hatch (intra_method="lsh") are now executable code — these tests
pin margin-arithmetic equality against the exact path on a fixture with
enough LSH tables, the recall property at k under leaner parameters,
and the keep-biased approximation direction.
"""
import math

import pytest

from pyspark.sql import functions as F


def _sin_embeddings(spark, n=40, d=8):
    rows = [(i, [math.sin(i * k + 0.1 * k * k) for k in range(d)]) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------- margin_neighbors method="ann"
def test_margin_neighbors_ann_equals_exact_with_enough_tables(spark):
    """With 1-plane × 64-table LSH on the 40×8 fixture every pair that
    matters (each side's top-k and the best-margin candidate) collides
    in some table, so the ANN path — which runs the IDENTICAL
    _margin_from_pairs arithmetic — must reproduce the exact output
    row-for-row (ids, sims, margins). Deterministic: the hyperplanes
    are seeded."""
    from swivel_spark_prep_spark.operators.similarity import margin_neighbors

    _, df = _sin_embeddings(spark)
    exact = sorted(
        margin_neighbors(df, k=4).collect(), key=lambda r: r["x"]
    )
    ann = sorted(
        margin_neighbors(
            df, k=4, method="ann", dim=8, num_planes=1, num_tables=64
        ).collect(),
        key=lambda r: r["x"],
    )
    assert [tuple(r) for r in ann] == [tuple(r) for r in exact]


def test_margin_neighbors_ann_recall_at_k(spark):
    """Leaner index (2 planes × 16 tables): the mined best-candidate
    must agree with the exact path for most sources — the recall@1
    property that makes the ANN swap trustworthy at corpus scale.
    Deterministic pin for this fixture + seed."""
    from swivel_spark_prep_spark.operators.similarity import margin_neighbors

    _, df = _sin_embeddings(spark)
    exact = {r["x"]: r["y"] for r in margin_neighbors(df, k=4).collect()}
    ann = {
        r["x"]: r["y"]
        for r in margin_neighbors(
            df, k=4, method="ann", dim=8, num_planes=2, num_tables=16
        ).collect()
    }
    assert set(ann) <= set(exact)  # sources only ever come from A
    hits = sum(1 for x, y in ann.items() if exact[x] == y)
    assert hits / len(exact) >= 0.75


def test_margin_neighbors_bad_method(spark):
    from swivel_spark_prep_spark.operators.similarity import margin_neighbors

    _, df = _sin_embeddings(spark)
    with pytest.raises(ValueError):
        margin_neighbors(df, method="faiss")


# ------------------------------------- semantic_dedup intra_method="lsh"
def _clustered_embeddings(spark):
    """Three well-separated axis clusters with planted near-dup pairs
    inside each, plus a fixed cluster assignment so the IVF stage is
    out of the picture and only the pair stage differs."""
    rows = []
    for c in range(3):
        base = [0.0] * 6
        base[2 * c] = 1.0
        for m in range(8):
            v = list(base)
            # planted: members 0/1 and 2/3 are near-dups (tiny nudge),
            # members 4..7 spread out within the cluster
            v[2 * c + 1] = 0.02 * (m // 2) + 0.001 * (m % 2)
            v[(2 * c + 2) % 6] += 0.15 * (m // 4)
            rows.append((c * 10 + m, v, c))
    emb = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    assigned = spark.createDataFrame(
        [(i, v, c) for i, v, c in rows],
        "id long, _emb array<double>, list_id int",
    )
    return emb, assigned


def test_semantic_dedup_lsh_equals_exact_with_enough_tables(spark):
    from swivel_spark_prep_spark.operators.similarity import semantic_dedup

    emb, assigned = _clustered_embeddings(spark)
    exact = sorted(
        tuple(r)
        for r in semantic_dedup(
            emb, threshold=0.995, assigned=assigned
        ).collect()
    )
    lsh = sorted(
        tuple(r)
        for r in semantic_dedup(
            emb,
            threshold=0.995,
            assigned=assigned,
            intra_method="lsh",
            dim=6,
            num_planes=1,
            num_tables=64,
        ).collect()
    )
    total = emb.count()
    assert 0 < len(exact) < total  # planted near-dups were removed
    assert lsh == exact


def test_semantic_dedup_lsh_errs_toward_keeping(spark):
    """A starved index (1 table) can only MISS candidate pairs, so the
    LSH survivors are a superset of the exact ones — the approximation
    never deletes extra data. Every cluster still retains a member."""
    from swivel_spark_prep_spark.operators.similarity import semantic_dedup

    emb, assigned = _clustered_embeddings(spark)
    exact = {
        r["vec_id"]
        for r in semantic_dedup(emb, threshold=0.995, assigned=assigned).collect()
    }
    lsh_rows = semantic_dedup(
        emb,
        threshold=0.995,
        assigned=assigned,
        intra_method="lsh",
        dim=6,
        num_planes=4,
        num_tables=1,
    ).collect()
    lsh = {r["vec_id"] for r in lsh_rows}
    assert exact <= lsh
    assert {r["list_id"] for r in lsh_rows} == {0, 1, 2}
    with pytest.raises(ValueError):
        semantic_dedup(emb, assigned=assigned, intra_method="annoy")
