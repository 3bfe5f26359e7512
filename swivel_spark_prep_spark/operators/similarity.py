"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k (the correctness baseline, Q42 as an API);
- all-pairs top-k (self-join, blocked by vec_id to halve work);
- LSH-bucketed ANN (random-hyperplane signatures, deterministic seeds) —
  the scale path: candidates share a bucket in ≥1 table, exact re-rank on
  candidates only.

All vector math is JVM-side (zip_with/aggregate) in double precision — no
Python in the hot path. At 100 TB the brute-force query is a broadcast of
the query vector + a single scan; the ANN index is a narrow projection
(signature per row) joined on bucket keys.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm2(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)


def with_double_embedding(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("_emb", F.col(col).cast("array<double>"))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float] | None = None,
    query_id: int | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the 1-row query vector, scan,
    TakeOrderedAndProject. Exact; O(n·d) work, no shuffle of the corpus."""
    base = with_double_embedding(emb, vec_col)
    if query_vec is not None:
        q = base.sparkSession.createDataFrame(
            [([float(x) for x in query_vec],)], "qv array<double>"
        )
        scan = base
    elif query_id is not None:
        q = base.filter(F.col(id_col) == query_id).select(F.col("_emb").alias("qv"))
        scan = base.filter(F.col(id_col) != query_id)
    else:
        raise ValueError("one of query_vec / query_id is required")
    return (
        scan.crossJoin(F.broadcast(q))
        .withColumn("sim", _dot("_emb", "qv") / F.sqrt(_norm2("_emb") * _norm2("qv")))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "sim")
    )


def all_pairs_topk(
    emb: DataFrame, k: int = 20, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Top-k most similar pairs (i < j) by cosine, brute force. O(n²/2)
    comparisons — the correctness baseline; use `ann_*` beyond ~10⁵ rows.
    Norms are precomputed per side (O(n·d)) so the n² inner loop pays only
    the dot product."""
    base = with_double_embedding(emb, vec_col).select(
        F.col(id_col).alias("i"),
        F.col("_emb").alias("ea"),
        F.sqrt(_norm2("_emb")).alias("na"),
    )
    other = base.select(
        F.col("i").alias("j"), F.col("ea").alias("eb"), F.col("na").alias("nb")
    )
    return (
        base.join(other, F.col("i") < F.col("j"))
        .withColumn("sim", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
        .orderBy(F.col("sim").desc(), "i", "j")
        .limit(k)
        .select("i", "j", "sim")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (Box–Muller over a seeded
    PRNG) — identical across runs and executors."""
    rng = random.Random(seed)
    planes = []
    for _ in range(num_planes):
        v = []
        for _ in range(dim):
            u1 = max(rng.random(), 1e-12)
            u2 = rng.random()
            v.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
        planes.append(v)
    return planes


def ann_index(
    emb: DataFrame,
    dim: int,
    num_planes: int = 4,
    num_tables: int = 24,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table_idx, bucket): random-hyperplane LSH. bucket = the
    num_planes sign bits of ⟨x, h_i⟩ packed into a long. Narrow projection
    — at scale this materializes as a bucketed table joined on
    (table_idx, bucket)."""
    base = with_double_embedding(emb, vec_col)
    tables = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed + 1000 * t)
        bucket = None
        for p_idx, plane in enumerate(planes):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            bit = F.when(_dot("_emb", lit_plane) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            term = F.shiftleft(bit, p_idx)
            bucket = term if bucket is None else bucket.bitwiseOR(term)
        tables.append(
            F.struct(F.lit(t).alias("table_idx"), bucket.alias("bucket"))
        )
    return base.select(
        F.col(id_col).alias("id"), "_emb", F.explode(F.array(*tables)).alias("tb")
    ).select(
        "id",
        "_emb",
        F.col("tb.table_idx").alias("table_idx"),
        F.col("tb.bucket").alias("bucket"),
    )


def ann_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 24,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query in
    ≥1 table; exact cosine re-rank on candidates only.

    The query's buckets are computed driver-side from its single row (the
    hyperplanes are deterministic), so the corpus index expression is
    evaluated exactly once with a direct (table, bucket) IN-filter — no
    second index pass, no join."""
    qrow = (
        with_double_embedding(emb, vec_col)
        .filter(F.col(id_col) == query_id)
        .select("_emb")
        .collect()
    )
    if not qrow:
        raise ValueError(f"query_id {query_id} not found")
    qv = qrow[0][0]

    wanted: set[tuple[int, int]] = set()
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed + 1000 * t)
        bucket = 0
        for p_idx, plane in enumerate(planes):
            if sum(x * y for x, y in zip(qv, plane)) >= 0:
                bucket |= 1 << p_idx
        wanted.add((t, bucket))

    index = ann_index(emb, dim, num_planes, num_tables, seed, id_col, vec_col)
    cond = None
    for t, b in sorted(wanted):
        clause = (F.col("table_idx") == t) & (F.col("bucket") == b)
        cond = clause if cond is None else (cond | clause)
    qv_lit = F.array(*[F.lit(float(x)) for x in qv])
    return (
        index.filter(F.col("id") != query_id)
        .filter(cond)
        .dropDuplicates(["id"])
        .withColumn("qv", qv_lit)
        .withColumn("sim", _dot("_emb", "qv") / F.sqrt(_norm2("_emb") * _norm2("qv")))
        .orderBy(F.col("sim").desc(), "id")
        .limit(k)
        .select(F.col("id").alias(id_col), "sim")
    )
