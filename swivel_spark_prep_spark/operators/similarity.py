"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k (the correctness baseline, Q42 as an API);
- all-pairs top-k (self-join, blocked by vec_id to halve work);
- LSH-bucketed ANN (random-hyperplane signatures, deterministic seeds) —
  candidates share a bucket in ≥1 table, exact re-rank on candidates only;
- IVF (inverted-file) ANN — Lloyd-iterated centroids, per-list inverted
  index, probe the nprobe nearest lists; full probe ≡ brute force;
- embedding-cosine near-dup pairs (exact all-pairs ≥ τ baseline + an
  LSH-candidate scale variant).

All vector math is JVM-side (zip_with/aggregate) in double precision — no
Python in the hot path. At 100 TB the brute-force query is a broadcast of
the query vector + a single scan; the ANN index is a narrow projection
(signature per row) joined on bucket keys; the IVF index partitions the
corpus by list id so a probe touches nprobe/nlist of the data.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


def cosine_topk_many(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k for MANY queries in one corpus scan (the evaluation /
    retrieval batch shape): the query matrix (q × dim, small) broadcasts
    into a mapInPandas closure; each Arrow batch computes one
    (batch × q) matmul and emits only its local top-k per query; a final
    per-query window rank keeps the global top-k. Exact because every
    query's global top-k is a subset of the union of its batch top-ks.
    Corpus work is one scan + n·q·d FLOPs of dense BLAS regardless of q —
    vs q separate scans for repeated `cosine_topk` calls."""
    from pyspark.sql import Window

    base = with_double_embedding(emb, vec_col)
    qrows = (
        base.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("id"), "_emb")
        .collect()
    )
    if len(qrows) != len(set(query_ids)):
        found = {r["id"] for r in qrows}
        raise ValueError(f"query ids not found: {sorted(set(query_ids) - found)}")
    qids = np.array([r["id"] for r in qrows], dtype=np.int64)
    qmat = np.vstack([np.asarray(r["_emb"]) for r in qrows])
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    qmat = qmat / qn[:, None]

    def _scan(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mat = np.vstack(pdf["e"].to_numpy())
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ qmat.T  # (batch, q)
            out_q, out_i, out_s = [], [], []
            for c, qid in enumerate(qids):
                col = sims[:, c]
                valid = ids != qid  # never return the query itself
                vi = np.nonzero(valid)[0]
                top = vi[np.argsort(-col[vi], kind="stable")[:k]]
                out_q.append(np.full(len(top), qid))
                out_i.append(ids[top])
                out_s.append(col[top])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    "id": np.concatenate(out_i),
                    "sim": np.concatenate(out_s),
                }
            )

    local = base.select(
        F.col(id_col).cast("long").alias("id"), F.col("_emb").alias("e")
    ).mapInPandas(_scan, "qid long, id long, sim double")
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id"))
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("qid", F.col("id").alias(id_col), "sim")
    )


def _blocked_pair_sims(
    emb: DataFrame,
    block_size: int,
    id_col: str,
    vec_col: str,
    threshold: float | None,
    per_block_topk: int | None,
) -> DataFrame:
    """All-pairs cosine via blocked matrix multiplication — the scale path
    for brute-force pair similarity. Rows are grouped into blocks of
    `block_size` by id; every block pair (bi ≤ bj) becomes one task that
    computes an (|A|×|B|) similarity matrix with a single numpy matmul in
    mapInPandas (Arrow-batched), emitting only pairs ≥ `threshold` and/or
    each block-pair's local top-k.

    Scale math: n rows → n/B blocks → (n/B)²/2 block pairs; shuffle volume
    is n²/B floats (each block replicated n/B times), compute n²·d/2 FLOPs
    as dense BLAS instead of n²/2 interpreted zip_with expressions. B is
    the knob: bigger blocks = less shuffle, more memory per task
    (B²·8 bytes for the sim matrix)."""

    base = with_double_embedding(emb, vec_col)
    packed = base.groupBy(
        F.floor(F.col(id_col) / block_size).alias("blk")
    ).agg(
        F.collect_list(
            F.struct(F.col(id_col).cast("long").alias("id"), F.col("_emb").alias("e"))
        ).alias("rows")
    )
    a = packed.select(F.col("blk").alias("blka"), F.col("rows").alias("rowsa"))
    b = packed.select(F.col("blk").alias("blkb"), F.col("rows").alias("rowsb"))
    grid = a.join(b, F.col("blka") <= F.col("blkb")).repartition("blka", "blkb")

    def _sims(batches):
        for pdf in batches:
            out_i, out_j, out_s = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.array([r["id"] for r in row["rowsa"]])
                mat_a = np.vstack([np.asarray(r["e"]) for r in row["rowsa"]])
                ids_b = np.array([r["id"] for r in row["rowsb"]])
                mat_b = np.vstack([np.asarray(r["e"]) for r in row["rowsb"]])
                na = np.linalg.norm(mat_a, axis=1)
                nb = np.linalg.norm(mat_b, axis=1)
                na[na == 0] = 1.0
                nb[nb == 0] = 1.0
                sims = (mat_a / na[:, None]) @ (mat_b / nb[:, None]).T
                mask = ids_a[:, None] < ids_b[None, :]
                if threshold is not None:
                    mask &= sims >= threshold
                ii, jj = np.nonzero(mask)
                if per_block_topk is not None and len(ii) > per_block_topk:
                    order = np.argsort(-sims[ii, jj], kind="stable")[:per_block_topk]
                    ii, jj = ii[order], jj[order]
                out_i.append(ids_a[ii])
                out_j.append(ids_b[jj])
                out_s.append(sims[ii, jj])
            if out_i:
                yield pd.DataFrame(
                    {
                        "i": np.concatenate(out_i),
                        "j": np.concatenate(out_j),
                        "sim": np.concatenate(out_s),
                    }
                )

    return grid.mapInPandas(_sims, "i long, j long, sim double")


def all_pairs_topk(
    emb: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 2048,
) -> DataFrame:
    """Top-k most similar pairs (i < j) by cosine, exact. Blocked-matmul
    execution (`_blocked_pair_sims`): each block pair keeps its local
    top-k, then one global TakeOrdered — the global top-k is a subset of
    the union of block-pair top-ks, so this is exact."""
    return (
        _blocked_pair_sims(emb, block_size, id_col, vec_col, None, k)
        .orderBy(F.col("sim").desc(), "i", "j")
        .limit(k)
    )


def cosine_near_dups(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 2048,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (i < j) with cosine ≥
    threshold, exact, via blocked matmul. The deterministic baseline for
    embedding-space dedup; beyond ~10⁶ rows switch to
    `cosine_near_dups_lsh` (bucketed candidates, same verify semantics)."""
    return _blocked_pair_sims(emb, block_size, id_col, vec_col, threshold, None)


def cosine_near_dups_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 24,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate embedding near-dups: candidate pairs share a
    random-hyperplane LSH bucket in ≥1 table, then exact cosine ≥ threshold
    on candidates only. Recall vs `cosine_near_dups` is property-tested
    (high-cosine pairs collide in some table w.h.p. — a pair at angle θ
    agrees per table with prob (1−θ/π)^planes)."""
    index = ann_index(emb, dim, num_planes, num_tables, seed, id_col, vec_col)
    a = index.select(
        F.col("id").alias("i"), F.col("_emb").alias("ea"), "table_idx", "bucket"
    )
    b = index.select(
        F.col("id").alias("j"), F.col("_emb").alias("eb"), "table_idx", "bucket"
    )
    cand = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", "ea", "eb")
        .dropDuplicates(["i", "j"])
    )
    return (
        cand.withColumn("sim", _dot("ea", "eb") / F.sqrt(_norm2("ea") * _norm2("eb")))
        .filter(F.col("sim") >= threshold)
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
    num_planes sign bits of ⟨x, h_i⟩ packed into a long. All
    num_tables·num_planes projections are ONE numpy matmul per Arrow batch
    (a (batch × dim) @ (dim × T·P) product) — compiling them as T·P
    separate zip_with/aggregate expressions made Catalyst analysis, not
    compute, the bottleneck. Narrow projection — at scale this
    materializes as a bucketed table joined on (table_idx, bucket)."""
    # (dim, num_tables*num_planes) projection matrix, deterministic per seed
    proj = np.column_stack(
        [
            np.asarray(plane)
            for t in range(num_tables)
            for plane in _hyperplanes(dim, num_planes, seed + 1000 * t)
        ]
    )
    powers = 1 << np.arange(num_planes, dtype=np.int64)

    @pandas_udf("array<long>")
    def _buckets(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy())
        bits = (mat @ proj >= 0).reshape(len(mat), num_tables, num_planes)
        packed = (bits * powers[None, None, :]).sum(axis=2)
        return pd.Series(list(packed))

    base = with_double_embedding(emb, vec_col)
    return (
        base.select(
            F.col(id_col).alias("id"), "_emb", _buckets("_emb").alias("_bks")
        )
        .select("id", "_emb", F.posexplode("_bks").alias("table_idx", "bucket"))
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

    # same numpy matmul as the ann_index UDF — identical float reduction
    # order, so the query row's buckets exactly match its corpus-side ones
    proj = np.column_stack(
        [
            np.asarray(plane)
            for t in range(num_tables)
            for plane in _hyperplanes(dim, num_planes, seed + 1000 * t)
        ]
    )
    bits = (np.asarray(qv, dtype=float)[None, :] @ proj >= 0).reshape(
        num_tables, num_planes
    )
    powers = 1 << np.arange(num_planes, dtype=np.int64)
    wanted = {(t, int((bits[t] * powers).sum())) for t in range(num_tables)}

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


# --- IVF (inverted-file) ANN ------------------------------------------------

def ivf_fit(
    emb: DataFrame,
    nlist: int = 16,
    iters: int = 3,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Spherical k-means centroids (nlist × dim numpy array), trained
    driver-side on a deterministic hash-ordered sample — the standard IVF
    recipe (a bounded training sample fits the driver even for a 10⁹-row
    corpus; FAISS trains IVF the same way). Deterministic: sample order is
    xxhash64(id), init is the first nlist sample rows, Lloyd updates are
    numpy (fixed reduction order)."""
    sample = (
        with_double_embedding(emb, vec_col)
        .select(F.col(id_col).alias("id"), "_emb")
        .orderBy(F.xxhash64(F.col("id").cast("string")), "id")
        .limit(sample_size)
        .collect()
    )
    mat = np.vstack([np.asarray(r["_emb"]) for r in sample])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    if len(mat) < nlist:
        raise ValueError(f"need ≥ {nlist} vectors to fit {nlist} lists")
    cents = mat[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(nlist):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, _emb): nearest-centroid assignment, vectorized per
    Arrow batch (one numpy matmul per batch — no per-row Python). At scale
    this is the partitioning key: write the corpus bucketed by list_id and
    a probe reads only nprobe/nlist of the files."""
    cents = centroids  # (nlist, dim), unit-norm — captured in the closure

    @pandas_udf("long")
    def _nearest(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy())
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        return pd.Series(np.argmax((mat / norms[:, None]) @ cents.T, axis=1))

    return with_double_embedding(emb, vec_col).select(
        F.col(id_col).alias("id"), "_emb", _nearest("_emb").alias("list_id")
    )


def ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe lists whose centroids are
    nearest the query, exact cosine re-rank on their members only —
    touching ~nprobe/nlist of the corpus. nprobe = nlist degenerates to
    exact brute force (property-tested against `cosine_topk`)."""
    cents = ivf_fit(emb, nlist, iters, id_col=id_col, vec_col=vec_col)
    qrow = (
        with_double_embedding(emb, vec_col)
        .filter(F.col(id_col) == query_id)
        .select("_emb")
        .collect()
    )
    if not qrow:
        raise ValueError(f"query_id {query_id} not found")
    qv = np.asarray(qrow[0][0], dtype=float)
    qn = np.linalg.norm(qv)
    probe = np.argsort(-(cents @ (qv / (qn if qn else 1.0))), kind="stable")[:nprobe]

    assigned = ivf_assign(emb, cents, id_col, vec_col)
    qv_lit = F.array(*[F.lit(float(x)) for x in qv])
    return (
        assigned.filter(
            F.col("list_id").isin([int(c) for c in probe]) & (F.col("id") != query_id)
        )
        .withColumn("qv", qv_lit)
        .withColumn("sim", _dot("_emb", "qv") / F.sqrt(_norm2("_emb") * _norm2("qv")))
        .orderBy(F.col("sim").desc(), "id")
        .limit(k)
        .select(F.col("id").alias(id_col), "sim")
    )


# --- int8 quantization ------------------------------------------------------

def quantize_int8(
    df: DataFrame, col: str = "embedding", scale_col: str = "scale",
    q_col: str = "qvec",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q_i = floor(v_i / scale + 0.5) ∈ [-127, 127] (zero vectors quantize
    to zeros with scale 0). 4× smaller than float32 — at 100 TB of
    embeddings this is the difference between a broadcastable index and
    one that is not; dequantized error is ≤ scale/2 per dimension
    (property-tested). floor(x + 0.5) rather than round(): engine round()
    implementations disagree at representational boundaries, this stays
    reproducible bit-for-bit anywhere.

    Map-side only (two higher-order expressions per row, no shuffle).
    """
    v = F.col(col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(F.col(scale_col) == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v, lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("int")
        )
    )
    return df.withColumn(scale_col, scale).withColumn(q_col, q)


def dequantize(
    df: DataFrame, scale_col: str = "scale", q_col: str = "qvec",
    out_col: str = "deq",
) -> DataFrame:
    """Reconstruct double vectors from (scale, qvec)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda q: q.cast("double") * F.col(scale_col)),
    )


# --- semantic dedup ---------------------------------------------------------


def cluster_centroids(
    assigned: DataFrame,
    list_col: str = "list_id",
    emb_col: str = "_emb",
) -> DataFrame:
    """(list_id, centroid): spherical mean of each cluster's members —
    position-wise average of the UNIT-normalized vectors, computed
    distributively (posexplode → partial-aggregated avg per (cluster,
    dim) → re-assembled array). The 64× row blow-up is map-side-combined
    before the shuffle, and the result is nlist tiny rows — broadcast
    material. Zero vectors contribute zeros (norm guarded to 1)."""
    n = F.sqrt(F.aggregate(emb_col, F.lit(0.0), lambda a, v: a + v * v))
    unit = assigned.withColumn(
        "_n", F.when(n == 0, F.lit(1.0)).otherwise(n)
    ).select(
        list_col,
        F.posexplode(
            F.transform(F.col(emb_col), lambda x: x / F.col("_n"))
        ).alias("pos", "val"),
    )
    return (
        unit.groupBy(list_col, "pos")
        .agg(F.avg("val").alias("cv"))
        .groupBy(list_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pc")
        )
        .select(
            list_col, F.transform("pc", lambda s: s["cv"]).alias("centroid")
        )
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.4,
    nlist: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    intra_method: str = "exact",
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 24,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    technique): cluster the embedding space, find intra-cluster cosine
    near-duplicates, keep per duplicate-neighborhood the vector FARTHEST
    from its cluster centroid (the paper's diversity-preserving choice),
    deterministically.

    Survivor rule (order-free, anti-join expressible): x is REMOVED iff
    some y in the same cluster has cosine(x, y) ≥ threshold and strictly
    better keep-priority — (round(cent_sim, 6), id) lexicographically
    smaller (lower centroid similarity = more diverse = kept; rounding
    makes the FP comparison engine-stable). For every near-dup pair at
    most one side survives, and each near-dup connected component's
    minimum-priority member always survives. Returns (id_col, list_id,
    cent_sim) survivors.

    Scale: pair generation is per-cluster (the SemDeDup point — nlist
    grows with the corpus so cluster sizes stay bounded, never all-pairs
    across the corpus); the centroid table is nlist rows, broadcast both
    times it is joined. Default clustering is :func:`ivf_fit` /
    :func:`ivf_assign` (driver-bounded k-means sample); pass ``assigned``
    (id, _emb, list_id) to use precomputed or exactly-replayable
    assignments — X68 pins parity that way.

    ``intra_method`` picks the intra-cluster pair stage:
    ``"exact"`` (default) is one dense c×c matmul per cluster —
    right while the SemDeDup nlist-scales-with-corpus contract keeps
    c bounded. ``"lsh"`` is the escape hatch for a cluster too big
    for a c×c matrix: candidate pairs must ALSO share a
    random-hyperplane LSH bucket (same :func:`ann_index` as
    ann_topk), so pair work is per-(cluster, table, bucket) and the
    dominance rule is applied relationally (loser side of each
    candidate near-dup pair anti-joined out). Approximation errs
    only toward KEEPING (a missed pair removes nobody); with enough
    tables the two paths are equal on a fixture (test-pinned).
    """
    from swivel_spark_prep_spark.cache import track_persist

    if assigned is None:
        cents = ivf_fit(emb, nlist, iters, id_col=id_col, vec_col=vec_col)
        assigned = ivf_assign(emb, cents, id_col, vec_col)
    # assigned feeds the centroid aggregate AND the similarity relation;
    # cs feeds both pair sides and the final anti-join — without
    # persisting, the IVF assignment re-runs five times (measured
    # 6.4 → 2.1 s at sf0.1)
    assigned = track_persist(assigned)
    cent = cluster_centroids(assigned)
    cs = track_persist(
        assigned.join(F.broadcast(cent), "list_id")
        .withColumn(
            "cent_sim",
            _dot("_emb", "centroid")
            / F.sqrt(_norm2("_emb") * _norm2("centroid")),
        )
        .withColumn("_pri", F.round("cent_sim", 6))
        .select("list_id", "id", "_emb", "cent_sim", "_pri")
    )  # (closes track_persist)
    if intra_method == "lsh":
        thr = float(threshold)
        idx = ann_index(
            cs, dim, num_planes, num_tables, seed, id_col="id", vec_col="_emb"
        )
        meta = cs.select("id", "list_id", "_pri")
        ia = idx.join(meta, "id").select(
            F.col("id").alias("i"),
            F.col("_emb").alias("ea"),
            F.col("list_id").alias("la"),
            F.col("_pri").alias("pa"),
            "table_idx",
            "bucket",
        )
        ib = idx.join(meta, "id").select(
            F.col("id").alias("j"),
            F.col("_emb").alias("eb"),
            F.col("list_id").alias("lb"),
            F.col("_pri").alias("pb"),
            "table_idx",
            "bucket",
        )
        cand = (
            ia.join(ib, ["table_idx", "bucket"])
            .filter((F.col("la") == F.col("lb")) & (F.col("i") < F.col("j")))
            .dropDuplicates(["i", "j"])
            .withColumn(
                "sim", _dot("ea", "eb") / F.sqrt(_norm2("ea") * _norm2("eb"))
            )
            .filter(F.col("sim") >= thr)
        )
        # of each candidate near-dup pair, the side with lexicographically
        # LARGER (_pri, id) is dominated — identical rule to _dom below
        removed = cand.select(
            F.when(
                (F.col("pa") < F.col("pb"))
                | ((F.col("pa") == F.col("pb")) & (F.col("i") < F.col("j"))),
                F.col("j"),
            )
            .otherwise(F.col("i"))
            .alias("id")
        ).distinct()
        return cs.join(removed, "id", "left_anti").select(
            F.col("id").alias(id_col), "list_id", "cent_sim"
        )
    if intra_method != "exact":
        raise ValueError(
            f"intra_method must be 'exact' or 'lsh', got {intra_method!r}"
        )
    # per-cluster pair stage as ONE numpy matmul per cluster group
    # (applyInPandas): the row-pair self-join computed 64-dim dots with
    # interpreted higher-order functions — c² · d interpreted ops per
    # cluster; BLAS does the same work in one X @ X.T (measured
    # 5.3 → 1.3 s at sf0.1). Cluster sizes are bounded by the SemDeDup
    # nlist-scales-with-corpus contract, so the c×c matrix fits.
    import numpy as np
    import pandas as pd

    thr = float(threshold)
    dtypes = dict(cs.dtypes)
    out_schema = (
        f"id {dtypes['id']}, list_id {dtypes['list_id']}, "
        "cent_sim double, _dom boolean"
    )

    def _dom(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["_emb"].tolist(), dtype=np.float64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = xn @ xn.T
        np.fill_diagonal(sims, -1.0)
        pri = pdf["_pri"].to_numpy()
        ids = pdf["id"].to_numpy()
        # better[i, j]: j has strictly better keep-priority than i
        better = (pri[:, None] > pri[None, :]) | (
            (pri[:, None] == pri[None, :]) & (ids[:, None] > ids[None, :])
        )
        out = pdf[["id", "list_id", "cent_sim"]].copy()
        out["_dom"] = ((sims >= thr) & better).any(axis=1)
        return out

    res = cs.groupBy("list_id").applyInPandas(_dom, out_schema)
    return res.filter(~F.col("_dom")).select(
        F.col("id").alias(id_col), "list_id", "cent_sim"
    )


# --- product quantization ---------------------------------------------------


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product-quantization codebooks (Jégou et al., "Product Quantization
    for Nearest Neighbor Search"): split the (unit-normalized) vector into
    ``m`` subspaces and k-means each independently → a ``(m, ksub, dsub)``
    numpy array. Trained driver-side on the same deterministic
    hash-ordered bounded sample as :func:`ivf_fit` (FAISS trains PQ the
    same way — a 4096-row sample is representative regardless of corpus
    size). Vectors are unit-normalized first so squared-L2 is a monotone
    proxy for cosine (|a-b|² = 2 - 2·cosθ on the unit sphere).

    Deterministic: xxhash64 sample order, init = first ksub sample rows
    per subspace, numpy Lloyd updates (fixed reduction order).
    """
    sample = (
        with_double_embedding(emb, vec_col)
        .select(F.col(id_col).alias("id"), "_emb")
        .orderBy(F.xxhash64(F.col("id").cast("string")), "id")
        .limit(sample_size)
        .collect()
    )
    mat = np.vstack([np.asarray(r["_emb"]) for r in sample])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    if len(mat) < ksub:
        raise ValueError(f"need ≥ {ksub} vectors to fit {ksub} codes")
    dsub = dim // m
    codebooks = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cents = sub[:ksub].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        codebooks[j] = cents
    return codebooks


def pq_encode(
    emb: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _emb, codes): per-subspace nearest-centroid code assignment,
    vectorized per Arrow batch (one ``(batch × ksub × dsub)`` distance
    grid per subspace — no per-row Python). ``codes`` is ``array<int>``
    of length m: with m=8, ksub=16 that is 8 bytes per vector vs 256 for
    a float32 64-dim embedding — a 32× smaller index, the representation
    that makes a 100 TB corpus's ANN index broadcastable/cacheable."""
    cb = np.asarray(codebooks)
    m, _, dsub = cb.shape

    @pandas_udf("array<int>")
    def _enc(embs: pd.Series) -> pd.Series:
        mat = np.vstack(embs.to_numpy()).astype(float)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            # |x - c|² = |x|² - 2x·c + |c|²; |x|² constant per row → drop
            d2 = -2.0 * (sub @ cb[j].T) + (cb[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series([c.tolist() for c in codes])

    return with_double_embedding(emb, vec_col).select(
        F.col(id_col).alias("id"), "_emb", _enc("_emb").alias("codes")
    )


def pq_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k via asymmetric distance computation (ADC):
    the query stays exact; each corpus vector's distance is approximated
    as the sum of m lookup-table entries (query-subvector ↔ assigned
    centroid), one ``(m × ksub)`` table built once on the driver and
    captured in the scoring UDF's closure. The best ``k × rerank``
    ADC candidates get an exact cosine re-rank (the standard PQ recipe:
    ADC prunes, exact distance decides). ``rerank`` trades recall for
    the width of the exact stage; recall vs :func:`cosine_topk` is
    property-tested. Scan cost: one pass over the codes column (m bytes
    per row) + exact math on k·rerank rows — at scale the codes column
    is the only thing read."""
    cb = pq_fit(emb, m, ksub, iters, id_col=id_col, vec_col=vec_col)
    dsub = cb.shape[2]
    qrow = (
        with_double_embedding(emb, vec_col)
        .filter(F.col(id_col) == query_id)
        .select("_emb")
        .collect()
    )
    if not qrow:
        raise ValueError(f"query_id {query_id} not found")
    qv = np.asarray(qrow[0][0], dtype=float)
    qn = np.linalg.norm(qv)
    qu = qv / (qn if qn else 1.0)
    lut = np.vstack(
        [
            ((cb[j] - qu[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(axis=1)
            for j in range(cb.shape[0])
        ]
    )  # (m, ksub)
    mm = lut.shape[0]

    @pandas_udf("double")
    def _adc(codes: pd.Series) -> pd.Series:
        cm = np.vstack(codes.to_numpy())
        return pd.Series(lut[np.arange(mm)[None, :], cm].sum(axis=1))

    candidates = (
        pq_encode(emb, cb, id_col, vec_col)
        .filter(F.col("id") != query_id)
        .withColumn("adc", _adc("codes"))
        .orderBy("adc", "id")
        .limit(k * rerank)
    )
    qv_lit = F.array(*[F.lit(float(x)) for x in qv])
    return (
        candidates.withColumn("qv", qv_lit)
        .withColumn("sim", _dot("_emb", "qv") / F.sqrt(_norm2("_emb") * _norm2("qv")))
        .orderBy(F.col("sim").desc(), "id")
        .limit(k)
        .select(F.col("id").alias(id_col), "sim")
    )


# --- distributed k-means ----------------------------------------------------


def kmeans_fit_distributed(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full-corpus spherical k-means — the DISTRIBUTED twin of
    :func:`ivf_fit` (which Lloyd-iterates a bounded driver-side sample).
    Here every iteration touches the whole corpus: assignment is the
    Arrow-batched argmax against broadcast centroids (``ivf_assign``),
    the update is the distributed spherical mean (``cluster_centroids``
    — posexplode + partial-aggregated avg), and the only driver
    materialization per iteration is the k×dim centroid table itself.
    Use when the corpus distribution drifts from any sample — at 100 TB
    each iteration is one scan + one (k·dim)-row shuffle, the textbook
    Spark k-means shape.

    Same deterministic init as ivf_fit (first k rows in xxhash64-of-id
    order), same assignment and update math — on a corpus the sample
    covers entirely, the two converge to the same centroids
    (property-tested to 1e-9). Returns the (k, dim) numpy array.
    """
    init_rows = (
        with_double_embedding(emb, vec_col)
        .select(F.col(id_col).alias("id"), "_emb")
        .orderBy(F.xxhash64(F.col("id").cast("string")), "id")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need ≥ {k} vectors to fit {k} clusters")
    cents = np.vstack([np.asarray(r["_emb"]) for r in init_rows])
    norms = np.linalg.norm(cents, axis=1)
    norms[norms == 0] = 1.0
    cents = cents / norms[:, None]
    for _ in range(iters):
        assigned = ivf_assign(emb, cents, id_col, vec_col)
        rows = cluster_centroids(assigned).collect()
        for r in rows:
            c = np.asarray(r["centroid"], dtype=float)
            n = np.linalg.norm(c)
            if n > 0:
                cents[r["list_id"]] = c / n
        # clusters that lost every member keep their previous centroid
    return cents


def feature_hash_embed(
    docs: DataFrame,
    k: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing ("hashing trick") document vectors (Weinberger
    et al. 2009, the Vowpal Wabbit vectorizer): each token adds ±1 to
    bucket ``md5(token) % k``, the sign drawn from an independent hash
    nibble so collisions cancel in expectation — a fixed-k dense
    embedding with NO vocabulary table, no training, and no driver
    state, usable directly by the cosine/ANN/clustering operators here.

    md5 (not xxhash64) so external engines can reproduce the exact
    vectors. One explode + one (doc, bucket) aggregate (map-side
    partials), then the dense array assembles per doc from the sparse
    pairs with a sequence/transform fill — k stays a per-row constant,
    never a shuffle dimension. Returns (id_col, vec: array<double>)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).filter(F.col("_t") != "")
    hashed = tok.select(
        id_col,
        (F.conv(F.substring(F.md5("_t"), 1, 8), 16, 10).cast("long") % k).alias(
            "_b"
        ),
        F.when(
            F.conv(F.substring(F.md5("_t"), 9, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("_s"),
    )
    sparse = hashed.groupBy(id_col, "_b").agg(F.sum("_s").alias("_w"))
    pairs = sparse.groupBy(id_col).agg(
        F.map_from_arrays(F.collect_list("_b"), F.collect_list("_w")).alias("_m")
    )
    # left join from ALL input ids: a doc whose every token is empty has
    # no sparse rows but still owns a (zero) vector — a per-doc embedding
    # operator may not silently drop rows (element_at on the NULL map
    # yields NULL, coalesced to 0.0)
    ids = docs.select(id_col).distinct()
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda b: F.coalesce(F.element_at("_m", b.cast("long")), F.lit(0.0)),
    )
    return ids.join(pairs, id_col, "left").select(F.col(id_col), dense.alias("vec"))


def matryoshka_stats(
    emb: DataFrame,
    dims: list[int],
    vec_col: str = "embedding",
    group_col: str | None = "label",
) -> DataFrame:
    """Matryoshka-truncation quality accounting (Kusupati et al. 2022,
    public): for each prefix length d' in ``dims``, the cosine between
    the zero-padded d'-prefix and the full vector is exactly
    ``‖e[:d']‖ / ‖e‖`` — the captured-energy ratio that governs how much
    retrieval quality survives truncating stored embeddings to d' dims.

    Emits per (group, d') the mean and min ratio — a pure projection +
    one aggregate (unpivoted via an inline struct array), no shuffle
    wider than |groups|·|dims|. Output: (group, trunc_dim, mean_ratio,
    min_ratio)."""
    if not dims:
        raise ValueError("dims must be non-empty")
    base = with_double_embedding(emb, vec_col)
    full = F.sqrt(_norm2(F.col("_emb")))
    entries = F.array(
        *[
            F.struct(
                F.lit(d).alias("trunc_dim"),
                (F.sqrt(_norm2(F.slice(F.col("_emb"), 1, d))) / full).alias(
                    "ratio"
                ),
            )
            for d in sorted(dims)
        ]
    )
    g = F.col(group_col).alias("grp") if group_col else F.lit("all").alias("grp")
    long = base.select(g, F.explode(entries).alias("e")).select(
        "grp", "e.trunc_dim", "e.ratio"
    )
    return long.groupBy("grp", "trunc_dim").agg(
        F.avg("ratio").alias("mean_ratio"), F.min("ratio").alias("min_ratio")
    )


def hard_negatives(
    emb: DataFrame,
    anchor_cond,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/metric training: for every
    anchor row matching ``anchor_cond``, the ``k`` MOST-similar
    different-label vectors — the negatives that actually move a
    contrastive loss, vs the random ones ``sampling.negative_samples``
    draws.

    Same shape as :func:`cosine_topk_many` (anchors are a bounded
    control matrix broadcast into a mapInPandas closure; one corpus
    scan, one (batch × anchors) BLAS matmul per Arrow batch, local
    top-k then a global per-anchor rank) with the label mask applied
    INSIDE the scan — exactness is preserved because each anchor's
    global top-k over different-label rows is a subset of the union of
    its per-batch top-ks under the same mask. Anchors must be a bounded
    set (an eval slice, a probe batch): the matrix is collected.

    Output: (anchor_id, neg_id, sim, rnk), rnk 1-based by (sim desc,
    id asc)."""
    from pyspark.sql import Window

    base = with_double_embedding(emb, vec_col)
    arows = (
        base.filter(anchor_cond)
        .select(F.col(id_col).alias("id"), F.col(label_col).alias("lb"), "_emb")
        .collect()
    )
    if not arows:
        raise ValueError("anchor_cond matched no rows")
    aids = np.array([r["id"] for r in arows], dtype=np.int64)
    albs = np.array([r["lb"] for r in arows])
    amat = np.vstack([np.asarray(r["_emb"]) for r in arows])
    an = np.linalg.norm(amat, axis=1)
    an[an == 0] = 1.0
    amat = amat / an[:, None]

    def _scan(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            lbs = pdf["lb"].to_numpy()
            mat = np.vstack(pdf["e"].to_numpy())
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ amat.T  # (batch, anchors)
            out_q, out_i, out_s = [], [], []
            for c, (qid, ql) in enumerate(zip(aids, albs)):
                col = sims[:, c]
                valid = lbs != ql  # different label only (self is same-label)
                vi = np.nonzero(valid)[0]
                top = vi[np.argsort(-col[vi], kind="stable")[:k]]
                out_q.append(np.full(len(top), qid))
                out_i.append(ids[top])
                out_s.append(col[top])
            yield pd.DataFrame(
                {
                    "anchor_id": np.concatenate(out_q) if out_q else [],
                    "id": np.concatenate(out_i) if out_i else [],
                    "sim": np.concatenate(out_s) if out_s else [],
                }
            )

    local = base.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(label_col).alias("lb"),
        F.col("_emb").alias("e"),
    ).mapInPandas(_scan, "anchor_id long, id long, sim double")
    w = Window.partitionBy("anchor_id").orderBy(F.col("sim").desc(), F.col("id"))
    return (
        local.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("anchor_id", F.col("id").alias("neg_id"), "sim", "rnk")
    )


def mmr_select(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998) — the diverse top-k: greedily pick the candidate
    maximizing ``λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`` so the
    result covers the space near the query instead of returning k
    near-duplicates (what plain cosine top-k does on a clustered
    corpus; λ=1 reduces to exactly that). rel and sim are cosine.

    Execution: relevance is ONE broadcast-query scan, persisted along
    with each vector's squared norm; then k greedy rounds, each a
    TakeOrdered(1) job over the corpus with the CURRENT selected set
    inlined as array literals (the selected set lives on the driver —
    k vectors, control-plane by the same argument as k-means
    centroids; k ≤ 64 enforced so the literal stays bounded).
    Sequential rounds are inherent to greedy MMR — each choice
    conditions on the last; the per-round cost is one scan with ≤ k
    codegen dot products, no shuffle. Deterministic tiebreak by id.
    Output (k rows, driver-assembled — selection metadata, not data):
    (step, id, rel, score).
    """
    if not 1 <= k <= 64:
        raise ValueError(f"k must be in [1, 64], got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    spark = emb.sparkSession
    base = with_double_embedding(emb, vec_col).select(
        F.col(id_col).alias("_id"), "_emb"
    ).filter(F.col("_id").isNotNull() & F.col("_emb").isNotNull())
    qn2 = float(sum(float(x) * float(x) for x in query_vec))
    if qn2 <= 0:
        raise ValueError("query_vec must be nonzero")
    q = F.lit([float(x) for x in query_vec])
    from swivel_spark_prep_spark.cache import fan_out, track_persist

    # fan_out before the persist: each greedy round scans this relation
    # evaluating up to k interpreted dot products per row — on the raw
    # single-split scan all of that ran on one core (guide §2.5)
    rel = track_persist(
        fan_out(base).select(
            "_id",
            "_emb",
            _norm2("_emb").alias("_n2"),
            (_dot("_emb", q) / F.sqrt(_norm2("_emb") * F.lit(qn2))).alias(
                "_rel"
            ),
        ).filter(F.col("_n2") > 0)
    )
    chosen: list = []  # (id, vec, n2)
    out = []
    for step in range(k):
        cand = rel
        if chosen:
            cand = cand.filter(~F.col("_id").isin([c[0] for c in chosen]))
            # per-chosen array literals as REFERENCES (F.lit(list)), not
            # dim inlined scalars — smaller expression trees per round
            sims = [
                _dot("_emb", F.lit([float(v) for v in vec]))
                / F.sqrt(F.col("_n2") * F.lit(n2))
                for (_, vec, n2) in chosen
            ]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
        else:
            maxsim = F.lit(0.0)
        score = F.lit(float(lam)) * F.col("_rel") - F.lit(
            1.0 - float(lam)
        ) * maxsim
        top = (
            cand.withColumn("_score", score)
            .orderBy(F.col("_score").desc(), F.col("_id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        vec = [float(v) for v in r["_emb"]]
        chosen.append((r["_id"], vec, float(sum(v * v for v in vec))))
        out.append(
            (step + 1, r["_id"], round(float(r["_rel"]), 6),
             round(float(r["_score"]), 6))
        )
    id_type = dict(emb.dtypes).get(id_col, "bigint")
    return spark.createDataFrame(
        out, f"step int, {id_col} {id_type}, rel double, score double"
    )


def ann_hubness(
    emb: DataFrame,
    k: int = 10,
    max_vectors: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "hub",
) -> DataFrame:
    """Hubness diagnostic for an embedding space (Radovanović, Nanopoulos
    & Ivanović, JMLR 2010): the distribution of k-occurrences N_k(x) =
    how many other points have x in their cosine top-k. High skew means
    a few "hub" vectors dominate every neighbor list (ANN recall rots,
    near-dup graphs star-collapse) and many antihubs are never
    retrieved — THE pre-flight check before trusting cosine top-k
    pipelines on a new embedding model.

    Exact k-occurrence needs all-pairs ranks, inherently quadratic — so
    the contract is made EXECUTABLE (the theil_sen max_points
    precedent): when the corpus exceeds ``max_vectors`` the operator
    measures a deterministic md5-thresholded sample (hubness is a
    distributional property; a 2k-point sample pins the skew), and the
    in-sample pair join is bounded at max_vectors² with the sample side
    broadcast (≤ max_vectors rows — never a shuffled cartesian).

    Output (1 row): (n_vectors, k, mean_k_occ, std_k_occ, skew_k_occ,
    max_k_occ, antihub_frac). For n_vectors > k the mean is exactly k
    (every anchor emits k votes); skewness is the population moment
    ratio m3/m2^1.5 so the DuckDB oracle replays it from raw moments.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_vectors < 2:
        raise ValueError(f"max_vectors must be >= 2, got {max_vectors}")
    from pyspark.sql import Window

    base = with_double_embedding(emb, vec_col).select(
        F.col(id_col).alias("_id"), "_emb"
    ).filter(F.col("_id").isNotNull() & F.col("_emb").isNotNull())
    n_total = base.count()  # bounded: one long, sizes the sample gate
    if n_total < 2:
        raise ValueError("need at least 2 vectors")
    if n_total > max_vectors:
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(salt), F.col("_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**60))
        )
        base = base.filter(u < F.lit(float(max_vectors) / float(n_total)))
    from swivel_spark_prep_spark.cache import fan_out, track_persist

    # fan_out before the persist (guide §2.5): the sample arrives as ONE
    # scan task, so the max_vectors² interpreted dot products of the
    # broadcast nested-loop probe below would otherwise all evaluate on
    # one core. The cached relation keeps the fanned width, so the probe
    # side parallelizes; the broadcast build side is unaffected.
    base = track_persist(
        fan_out(base.withColumn("_n2", _norm2("_emb")).filter(F.col("_n2") > 0))
    )
    a = base.select(
        F.col("_id").alias("_a"), F.col("_emb").alias("_ea"), F.col("_n2").alias("_na")
    )
    b = base.select(
        F.col("_id").alias("_b"), F.col("_emb").alias("_eb"), F.col("_n2").alias("_nb")
    )
    # sample side is <= max_vectors rows by construction: broadcast it so
    # the pair generation is a nested-loop over a broadcast relation,
    # never a shuffled cartesian
    pairs = a.join(F.broadcast(b), F.col("_a") != F.col("_b")).select(
        "_a",
        "_b",
        (_dot("_ea", F.col("_eb")) / F.sqrt(F.col("_na") * F.col("_nb"))).alias("_sim"),
    )
    w = Window.partitionBy("_a").orderBy(F.col("_sim").desc(), F.col("_b"))
    topk = pairs.select("_a", "_b", F.row_number().over(w).alias("_rk")).filter(
        F.col("_rk") <= k
    )
    occ = (
        base.select(F.col("_id").alias("_b"))
        .join(topk.groupBy("_b").agg(F.count("*").alias("_c")), "_b", "left")
        .select(F.coalesce(F.col("_c"), F.lit(0)).cast("double").alias("_c"))
    )
    m = occ.agg(
        F.count("*").alias("_n"),
        F.avg("_c").alias("_m1"),
        F.avg(F.col("_c") ** 2).alias("_m2"),
        F.avg(F.col("_c") ** 3).alias("_m3"),
        F.max("_c").alias("_mx"),
        F.avg((F.col("_c") == 0).cast("double")).alias("_ah"),
    )
    var = F.col("_m2") - F.col("_m1") ** 2
    return m.select(
        F.col("_n").cast("long").alias("n_vectors"),
        F.lit(int(k)).cast("long").alias("k"),
        F.round("_m1", 6).alias("mean_k_occ"),
        F.round(F.sqrt(var), 6).alias("std_k_occ"),
        F.round(
            F.when(
                var > 0,
                (F.col("_m3") - 3 * F.col("_m1") * F.col("_m2") + 2 * F.col("_m1") ** 3)
                / var ** 1.5,
            ),
            6,
        ).alias("skew_k_occ"),
        F.col("_mx").cast("long").alias("max_k_occ"),
        F.round("_ah", 6).alias("antihub_frac"),
    )


def embedding_hygiene(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-column hygiene gate — the pre-flight audit before any
    ANN/dedup pipeline trusts a vector column: counts of NULL vectors,
    zero vectors, vectors with NaN/Inf components, and dimensionality
    disagreements against the modal dimension (everything downstream
    assumes ONE d), plus norm distribution stats over the clean rows.

    Two scans: one 2-row-bounded dimension-mode aggregate (grouped by
    size — the dimension alphabet, not the corpus), one stats aggregate
    with the modal d broadcast in; all vector work is JVM higher-order
    expressions, no UDF, no shuffle beyond the tiny group-by.

    Output (1 row): (n_rows, n_null, n_zero, n_nonfinite, dims_mode,
    n_dim_mismatch, norm_mean, norm_std, norm_min, norm_max).
    """
    base = emb.select(
        F.col(vec_col).cast("array<double>").alias("_e")
    )
    dim_mode = (
        base.filter(F.col("_e").isNotNull())
        .groupBy(F.size("_e").alias("_dm"))
        .agg(F.count("*").alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("_dm"))
        .limit(1)
        .select("_dm")
    )
    nonfinite = F.exists("_e", lambda x: x.isNaN() | (F.abs(x) == float("inf")))
    norm = F.sqrt(F.aggregate("_e", F.lit(0.0), lambda acc, v: acc + v * v))
    clean_norm = F.when(F.col("_e").isNotNull() & ~nonfinite, norm)
    var = F.avg(F.col("_cn") ** 2) - F.avg("_cn") ** 2
    return (
        base.crossJoin(F.broadcast(dim_mode))
        .select(
            F.col("_e").isNull().cast("long").alias("_isnull"),
            F.when(F.col("_e").isNotNull(), nonfinite.cast("long"))
            .otherwise(F.lit(0))
            .alias("_nf"),
            clean_norm.alias("_cn"),
            F.when(
                F.col("_e").isNotNull() & (F.size("_e") != F.col("_dm")), 1
            )
            .otherwise(0)
            .cast("long")
            .alias("_dmis"),
            "_dm",
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_isnull").alias("n_null"),
            F.coalesce(
                F.sum((F.col("_cn") == 0).cast("long")), F.lit(0)
            ).alias("n_zero"),
            F.sum("_nf").alias("n_nonfinite"),
            F.max("_dm").cast("long").alias("dims_mode"),
            F.sum("_dmis").alias("n_dim_mismatch"),
            F.round(F.avg("_cn"), 6).alias("norm_mean"),
            F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("norm_std"),
            F.round(F.min("_cn"), 6).alias("norm_min"),
            F.round(F.max("_cn"), 6).alias("norm_max"),
        )
    )


def geometric_median(
    emb: DataFrame,
    vec_col: str = "embedding",
    iterations: int = 5,
    eps: float = 1e-9,
) -> list:
    """Geometric median of an embedding column via Weiszfeld's
    algorithm (1937): the L1-optimal center, robust where the
    coordinate mean is dragged arbitrarily by a single outlier vector —
    the robust-statistics upgrade for centroid-based hygiene checks
    (X41 centroids, X246 norms). Iteration::

        c ← Σ xᵢ/dᵢ / Σ 1/dᵢ,   dᵢ = ‖xᵢ − c‖ (clamped at eps)

    Each iteration is ONE aggregate: the current center is a broadcast
    literal array, the distance is an in-row fold, the per-dim weighted
    sums come from a posexplode hash aggregate; the only driver
    materialization is the dim-sized center itself (a control row).
    Starts from the coordinate mean; ``iterations`` is fixed (Weiszfeld
    converges linearly; 5 rounds lands within float tolerance on
    anything unimodal). Returns the center as a Python list (callers
    broadcast it into downstream expressions).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from swivel_spark_prep_spark.cache import fan_out

    # persist the fanned vector relation ONCE: the mean init plus every
    # Weiszfeld round re-reads it (iterations+1 consumers — without the
    # persist each round re-scans the parquet single-split and evaluates
    # the interpreted distance fold on one core; guide §2.5/§5). The
    # dim-sized collects below are sorted DRIVER-side — an orderBy before
    # a dim-row collect added a range exchange + sort stage per round.
    base = fan_out(
        emb.select(F.col(vec_col).alias("_x")).filter(F.col("_x").isNotNull())
    ).persist()
    mean_row = (
        base.select(F.posexplode("_x").alias("_d", "_v"))
        .groupBy("_d")
        .agg(F.avg("_v").alias("_m"))
        .collect()
    )
    c = [r["_m"] for r in sorted(mean_row, key=lambda r: r["_d"])]
    for _ in range(int(iterations)):
        # one array-literal REFERENCE (not dim inlined scalar literals):
        # keeps the generated code identical across rounds so the Janino
        # cache hits instead of recompiling per iteration (guide §4)
        lit_c = F.lit([float(v) for v in c])
        d = F.sqrt(
            F.aggregate(
                F.zip_with("_x", lit_c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        w = 1.0 / F.greatest(d, F.lit(float(eps)))
        sums = (
            base.select(w.alias("_w"), F.posexplode("_x").alias("_d", "_v"))
            .groupBy("_d")
            .agg(
                F.sum(F.col("_v") * F.col("_w")).alias("_sw"),
                F.sum("_w").alias("_w"),
            )
            .collect()
        )
        c = [
            r["_sw"] / r["_w"] for r in sorted(sums, key=lambda r: r["_d"])
        ]
    base.unpersist()
    return c


def _margin_from_pairs(cross: DataFrame, k: int) -> DataFrame:
    """The Artetxe–Schwenk margin arithmetic over a (x, y, sim) pair
    relation — SHARED by the exact and ANN candidate paths of
    :func:`margin_neighbors`, so swapping the candidate generator
    cannot change the scoring: avgₖ normalizers are top-k windows
    partitioned by x / by y, the final argmax a row_number per x."""
    from pyspark.sql.window import Window

    from swivel_spark_prep_spark.cache import track_persist

    # persisted: the pair relation feeds THREE consumers (both avgₖ
    # normalizers and the margin join) — without the persist the
    # candidate generator behind it (the blocked-matmul grid or the LSH
    # bucket join) executes three times per query (guide §5)
    cross = track_persist(cross)
    wx = Window.partitionBy("x").orderBy(F.desc("sim"), "y")
    wy = Window.partitionBy("y").orderBy(F.desc("sim"), "x")
    ax = (
        cross.withColumn("_rn", F.row_number().over(wx))
        .filter(F.col("_rn") <= k)
        .groupBy("x")
        .agg(F.avg("sim").alias("_ax"))
    )
    ay = (
        cross.withColumn("_rn", F.row_number().over(wy))
        .filter(F.col("_rn") <= k)
        .groupBy("y")
        .agg(F.avg("sim").alias("_ay"))
    )
    m = (
        cross.join(ax, "x")
        .join(ay, "y")
        .withColumn("margin", F.col("sim") / ((F.col("_ax") + F.col("_ay")) / 2))
    )
    wbest = Window.partitionBy("x").orderBy(F.desc("margin"), "y")
    return (
        m.withColumn("_rn", F.row_number().over(wbest))
        .filter(F.col("_rn") == 1)
        .select(
            "x",
            "y",
            F.round("sim", 4).alias("sim"),
            F.round("margin", 4).alias("margin"),
        )
    )


def margin_neighbors(
    emb: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 2048,
    method: str = "exact",
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 24,
    seed: int = 42,
) -> DataFrame:
    """Margin-based neighbor mining (Artetxe & Schwenk, ACL 2019 —
    the BUCC/CCMatrix parallel-corpus mining criterion): split the
    collection into sources A (even id) and targets B (odd id); for
    each x∈A score candidates y∈B by the RATIO margin

        margin(x,y) = cos(x,y) / ((avgₖ(x→B) + avgₖ(y→A)) / 2)

    where avgₖ is the mean similarity to the k nearest neighbors in
    the OTHER set — raw cosine is incomparable across hubs (some
    vectors are near everything), the margin normalizes by each
    side's local density, which is why mined bitext quality jumps
    versus absolute-threshold mining. Returns each source's best
    candidate: (x, y, sim, margin).

    Scale design: ``method="exact"`` reuses the blocked-matmul
    primitive (_blocked_pair_sims: grid of aggregated block pairs,
    dense BLAS per task, never a row-scale self-join) — the exact
    baseline. ``method="ann"`` is the corpus-scale path: the pair
    relation is the random-hyperplane LSH candidate set (the same
    :func:`ann_index` that powers ann_topk, self-joined on
    (table_idx, bucket) — pairs only within buckets, never all-pairs)
    and the IDENTICAL margin arithmetic (:func:`_margin_from_pairs`)
    applies unchanged; with enough tables the two paths are equal on
    a fixture (test-pinned) and the recall-at-k property bounds the
    approximation. Normalizer caveat: under ANN each side's avgₖ is
    over its k best CANDIDATES, the standard FAISS-mined practice.
    """
    if method == "exact":
        pairs = _blocked_pair_sims(emb, block_size, id_col, vec_col, None, None)
    elif method == "ann":
        # all LSH-cobucketed pairs (threshold −1 keeps every candidate);
        # sim is exact cosine on candidates, as in ann_topk's re-rank
        pairs = cosine_near_dups_lsh(
            emb, -1.0, dim, num_planes, num_tables, seed, id_col, vec_col
        )
    else:
        raise ValueError(f"method must be 'exact' or 'ann', got {method!r}")
    cross = pairs.filter((F.col("i") % 2) != (F.col("j") % 2)).select(
        F.when(F.col("i") % 2 == 0, F.col("i")).otherwise(F.col("j")).alias("x"),
        F.when(F.col("i") % 2 == 0, F.col("j")).otherwise(F.col("i")).alias("y"),
        "sim",
    )
    return _margin_from_pairs(cross, k)


def mahalanobis_outliers(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k embedding outliers by DIAGONAL-covariance Mahalanobis
    distance, d² = Σⱼ(xⱼ−μⱼ)²/σ²ⱼ — the per-dimension-standardized
    outlier score a plain L2-to-centroid misses (one high-variance
    dimension swamps L2; Mahalanobis whitens it away). Diagonal Σ by
    design: the full-covariance inverse is a dim² driver object and
    the embedding-hygiene use case (find the garbage vectors before
    they poison k-means/SemDeDup seeds) doesn't need cross-dimension
    rotation. Under approximate normality d² ~ χ²(dim), so
    d² ≫ dim + 3·√(2·dim) is the classic review cut (reported as a
    column, not a filter — the top-k stays inspectable either way).

    Scale design: per-dimension moments via ONE posexplode + groupBy
    (dim groups; map-side partial aggregation collapses executor-side,
    so the tiny group count is not a skew problem), broadcast the
    dim-row stats back, d² as a second posexplode-join-sum, top-k via
    TakeOrdered. Zero-variance dimensions contribute 0 (constant
    dims carry no outlier signal). Output: (id, d2, chi2_cut).
    """
    base = with_double_embedding(emb, vec_col).select(
        F.col(id_col).alias("_id"), "_emb"
    )
    ex = base.select("_id", F.posexplode("_emb").alias("_j", "_x"))
    stats = ex.groupBy("_j").agg(
        F.avg("_x").alias("_mu"), F.var_pop("_x").alias("_s2")
    )
    dim = stats.agg(F.count("*").cast("double").alias("_d"))
    d2 = (
        ex.join(F.broadcast(stats), "_j")
        .groupBy("_id")
        .agg(
            F.sum(
                F.when(
                    F.col("_s2") > 0,
                    (F.col("_x") - F.col("_mu"))
                    * (F.col("_x") - F.col("_mu"))
                    / F.col("_s2"),
                ).otherwise(F.lit(0.0))
            ).alias("_d2")
        )
    )
    return (
        d2.crossJoin(F.broadcast(dim))
        .orderBy(F.desc("_d2"), "_id")
        .limit(k)
        .select(
            F.col("_id").alias(id_col),
            F.round("_d2", 6).alias("d2"),
            F.round(
                F.col("_d") + 3 * F.sqrt(2 * F.col("_d")), 6
            ).alias("chi2_cut"),
        )
    )


def anisotropy_score(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space anisotropy diagnostic (Ethayarajh 2019's
    expected-pairwise-cosine, computed in closed form): for unit-scale
    comparisons the expected cosine between two RANDOM vectors equals
    ‖μ‖²-over-mean-norm structure — an isotropic (direction-uniform)
    space scores ≈ 0, a collapsed "cone" space scores near 1, and cone
    collapse silently breaks every cosine-threshold op downstream
    (near-dup thresholds, SemDeDup epsilon, ANN recall). Reported:

        anisotropy = ‖μ‖² / E[‖x‖²]   (μ = mean embedding)

    plus mean/std of per-vector norms (the other hygiene axis: norm
    spread ruins dot-product ranking). Exactly zero requires centered
    data; the score IS the centering audit.

    Scale design: per-dimension means via one posexplode aggregate
    (dim groups, map-side combine), norms via one codegen aggregate —
    no pair sampling, no joins beyond a 1-row broadcast. Output one
    row: (n, dim, mean_norm, sd_norm, anisotropy).
    """
    base = with_double_embedding(emb, vec_col).select("_emb")
    ex = base.select(F.posexplode("_emb").alias("_j", "_x"))
    mu = ex.groupBy("_j").agg(F.avg("_x").alias("_m"))
    mu2 = mu.agg(F.sum(F.col("_m") * F.col("_m")).alias("_mu2"),
                 F.count("*").cast("long").alias("_dim"))
    norms = base.select(_norm2("_emb").alias("_n2"))
    agg = norms.agg(
        F.count("*").alias("_n"),
        F.avg("_n2").alias("_en2"),
        F.avg(F.sqrt("_n2")).alias("_mn"),
        F.stddev_samp(F.sqrt("_n2")).alias("_sn"),
    )
    return agg.crossJoin(F.broadcast(mu2)).select(
        F.col("_n").cast("long").alias("n"),
        F.col("_dim").alias("dim"),
        F.round("_mn", 6).alias("mean_norm"),
        F.round("_sn", 6).alias("sd_norm"),
        F.round(F.col("_mu2") / F.col("_en2"), 6).alias("anisotropy"),
    )


def dim_correlation_pairs(
    emb: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k most-correlated embedding dimension PAIRS — the redundancy
    audit next to anisotropy_score: two dimensions with |r| → 1 carry
    one dimension of information at two dimensions of storage/compute
    cost, the "should we PCA/whiten before indexing" read (Matryoshka
    truncation and PQ codebooks both degrade under correlated dims).

    Scale design: the (dim × dim) moment matrix from ONE pass — each
    row contributes its dim² products via a posexplode self-zip
    (bounded by dim², never by n), grouped into the dim²-row moments
    relation; Pearson per pair is arithmetic, top-k a TakeOrdered.
    Output: (dim_i, dim_j, r, n).
    """
    base = with_double_embedding(emb, vec_col).select("_emb")
    ex = base.select(F.posexplode("_emb").alias("_i", "_x"), F.col("_emb"))
    pairs = ex.select(
        "_i", "_x", F.posexplode("_emb").alias("_j", "_y")
    ).filter(F.col("_i") < F.col("_j"))
    m = pairs.groupBy("_i", "_j").agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    den2 = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")) * (
        F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    )
    r = F.when(
        den2 > 0,
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        / F.sqrt(den2),
    )
    return (
        m.select(
            F.col("_i").alias("dim_i"),
            F.col("_j").alias("dim_j"),
            F.round(r, 6).alias("r"),
            F.col("_n").cast("long").alias("n"),
        )
        .orderBy(F.desc(F.abs(F.col("r"))), "dim_i", "dim_j")
        .limit(k)
    )


def _pair_moment_cells(base: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Per-dimension-pair second-moment sufficient statistics for the
    MMD/CKA family: one pass producing, for every (i, j) dim pair,
    Σxᵢxⱼ / Σyᵢyⱼ / Σxᵢyⱼ as a d²-row CELL relation (idx = i·d + j).

    Scale design: the per-row fan-out is the d² struct array (d = the
    embedding dimension, SF-INVARIANT — 4096 cells at d=64), and Spark
    partial-aggregates the explode inside the same stage, so shuffle
    volume is #tasks × d² rows — the word-count shape, never
    rows × rows. CPU is the inherent n·d² FLOPs of forming a Gram
    matrix. The cell relation is model-sized; downstream arithmetic is
    control-plane.
    """
    zs = F.arrays_zip(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
    arr = F.flatten(
        F.transform(
            zs,
            lambda a: F.transform(
                zs,
                lambda b: F.struct(
                    (a["x"] * b["x"]).alias("xx"),
                    (a["y"] * b["y"]).alias("yy"),
                    (a["x"] * b["y"]).alias("xy"),
                ),
            ),
        )
    )
    return (
        base.select(F.posexplode(arr).alias("_i", "_s"))
        .groupBy("_i")
        .agg(
            F.sum("_s.xx").alias("sxx"),
            F.sum("_s.yy").alias("syy"),
            F.sum("_s.xy").alias("sxy"),
        )
    )


def mmd_quadratic(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample kernel MMD² with the quadratic kernel k(x,y) = (x·y)²
    (Gretton et al. 2012, biased V-statistic): did the embedding
    DISTRIBUTION shift between two slices — sensitive to covariance/
    shape changes the centroid distance (linear-kernel MMD) cannot see.
    For the quadratic kernel the population MMD² collapses to

        MMD² = ‖E_A[xxᵀ] − E_B[xxᵀ]‖²_F

    — the Frobenius distance between the two second-moment matrices —
    so the WHOLE two-sample statistic comes from d²-cell sufficient
    statistics and needs NO pairwise kernel evaluations (the textbook
    estimator is O(n²) in vectors; this form is O(n·d²) map-side work
    with a d²-row shuffle, exact, not an approximation).

    Scale design: one conditional-count aggregate for group sizes, one
    d²-cell pass per group (conditional sums share a single scan), one
    aggregate over the 2×d² cells. Output one row:
    (n_a, n_b, d, mmd2) — mmd2 NULL when either slice is empty.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.filter(
        F.col(vec_col).isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select((F.col(group_col) == group_a).alias("_ga"), v.alias("_x"))
    counts = base.agg(
        F.sum(F.col("_ga").cast("long")).alias("_na"),
        F.sum((~F.col("_ga")).cast("long")).alias("_nb"),
        F.max(F.size("_x")).alias("_d"),
    )
    arr = F.flatten(
        F.transform(
            "_x", lambda a: F.transform(F.col("_x"), lambda b: a * b)
        )
    )
    cells = (
        base.select("_ga", F.posexplode(arr).alias("_i", "_v"))
        .groupBy("_i")
        .agg(
            F.sum(F.when(F.col("_ga"), F.col("_v"))).alias("_sa"),
            F.sum(F.when(~F.col("_ga"), F.col("_v"))).alias("_sb"),
        )
    )
    j = cells.crossJoin(F.broadcast(counts))
    diff = F.col("_sa") / F.col("_na") - F.col("_sb") / F.col("_nb")
    return j.agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max("_d").cast("int").alias("d"),
        F.round(
            F.when(
                (F.max("_na") > 0) & (F.max("_nb") > 0),
                F.sum(diff * diff),
            ),
            6,
        ).alias("mmd2"),
    )


def _cka_pandas(base: DataFrame) -> DataFrame:
    """BLAS-partials CKA path: per-Arrow-batch sufficient statistics
    (n, Σx, Σy, XᵀX, XᵀY, YᵀY) via ``mapInPandas`` — one model-sized
    (1 + 2d + 3d²)-double row per batch reaches the driver, never the
    corpus (the procrustes_drift shape, pca.py). The centered Frobenius
    sums and the CKA ratio are O(d²) driver arithmetic."""

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            xa = np.array(pdf["_x"].tolist(), dtype=np.float64)
            xb = np.array(pdf["_y"].tolist(), dtype=np.float64)
            row = np.concatenate(
                (
                    [float(len(xa))],
                    xa.sum(axis=0),
                    xb.sum(axis=0),
                    (xa.T @ xa).ravel(),
                    (xa.T @ xb).ravel(),
                    (xb.T @ xb).ravel(),
                )
            )
            yield pd.DataFrame({"stats": [row.tolist()]})

    rows = base.mapInPandas(_partials, "stats array<double>").collect()
    spark = base.sparkSession
    if not rows:
        return spark.createDataFrame(
            [(0, 0, None)], "n long, d int, cka double"
        )
    total = np.zeros(len(rows[0]["stats"]))
    for r in rows:
        total += np.asarray(r["stats"])
    n = total[0]
    d = int(round(np.sqrt((len(total) - 1) / 3.0 + 1.0 / 9.0) - 1.0 / 3.0))
    sx = total[1 : 1 + d]
    sy = total[1 + d : 1 + 2 * d]
    blocks = total[1 + 2 * d :]
    sxx = blocks[: d * d].reshape(d, d)
    sxy = blocks[d * d : 2 * d * d].reshape(d, d)
    syy = blocks[2 * d * d :].reshape(d, d)
    mx, my = sx / n, sy / n
    cxx = sxx / n - np.outer(mx, mx)
    cxy = sxy / n - np.outer(mx, my)
    cyy = syy / n - np.outer(my, my)
    fxx = float((cxx * cxx).sum())
    fyy = float((cyy * cyy).sum())
    fxy = float((cxy * cxy).sum())
    den = math.sqrt(fxx) * math.sqrt(fyy)
    return spark.createDataFrame(
        [(int(n), d, round(fxy / den, 6) if den > 0 else None)],
        "n long, d int, cka double",
    )


def cka_quantization_audit(
    df: DataFrame,
    vec_col: str = "embedding",
    method: str = "explode",
) -> DataFrame:
    """Linear CKA between the embedding corpus and its int8-dequantized
    self (Kornblith et al. 2019, eq. 1 with the linear kernel): how
    much of the REPRESENTATIONAL STRUCTURE survives quantization —
    scale/rotation-insensitive where X50's per-dimension error units
    are not (a uniformly shrunk space has large L2 error but CKA = 1).

        CKA = ‖C_xy‖²_F / (‖C_xx‖_F · ‖C_yy‖_F),
        C_ab = E[a bᵀ] − E[a]E[b]ᵀ  (column-centered cross-covariance)

    Quantization is the in-repo int8 contract (quantize_int8 →
    dequantize: scale = max|v|/127, floor(x/scale + 0.5) — bit-exact
    across engines, X50's oracle convention).

    Scale design: one d-row mean aggregate + one d²-cell sufficient-
    statistics pass (_pair_moment_cells — partial-aggregated explode,
    shuffle = #tasks × d² rows), then the centered Frobenius sums are
    ONE aggregate over the cell relation with the two d-row mean
    relations broadcast in. Nothing corpus-sized leaves the executors;
    no pairwise vector work. Output one row: (n, d, cka).

    ``method="pandas"`` computes the SAME sufficient statistics
    (n, Σx, Σy, XᵀX, XᵀY, YᵀY) as per-Arrow-batch BLAS partials over
    ``mapInPandas`` — the procrustes_drift shape (pca.py) — collecting
    one (1 + 2d + 3d²)-double array per batch instead of shuffling
    #tasks × d² exploded cells. Same exact math, same output; use it
    when the JVM explode constant dominates (measured sf1, 20k×4096
    cells: the explode pass is ~41 s of codegen-loop work the BLAS
    partials do in a fraction of that). ``method="explode"`` stays the
    default: zero Python in the plan, no Arrow transfer.
    """
    from swivel_spark_prep_spark.operators import similarity as _self

    if method not in ("explode", "pandas"):
        raise ValueError(f"unknown method {method!r}")
    q = _self.dequantize(_self.quantize_int8(df.filter(F.col(vec_col).isNotNull()), col=vec_col))
    base = q.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_x"),
        F.col("deq").alias("_y"),
    )
    if method == "pandas":
        return _cka_pandas(base)
    counts = base.agg(
        F.count("*").alias("_n"), F.max(F.size("_x")).alias("_d")
    )
    means = (
        base.select(
            F.posexplode(
                F.arrays_zip(F.col("_x").alias("x"), F.col("_y").alias("y"))
            ).alias("_k", "_s")
        )
        .groupBy("_k")
        .agg(F.sum("_s.x").alias("_sx"), F.sum("_s.y").alias("_sy"))
    )
    cells = _pair_moment_cells(base, "_x", "_y")
    d = F.col("_d").cast("long")
    j = (
        cells.crossJoin(F.broadcast(counts))
        .join(
            F.broadcast(means.select(
                F.col("_k").alias("_ki"),
                F.col("_sx").alias("_sxi"),
                F.col("_sy").alias("_syi"),
            )),
            F.floor(F.col("_i") / d) == F.col("_ki"),
        )
        .join(
            F.broadcast(means.select(
                F.col("_k").alias("_kj"),
                F.col("_sx").alias("_sxj"),
                F.col("_sy").alias("_syj"),
            )),
            F.pmod(F.col("_i"), d) == F.col("_kj"),
        )
    )
    n = F.col("_n").cast("double")
    cxx = F.col("sxx") / n - (F.col("_sxi") / n) * (F.col("_sxj") / n)
    cyy = F.col("syy") / n - (F.col("_syi") / n) * (F.col("_syj") / n)
    cxy = F.col("sxy") / n - (F.col("_sxi") / n) * (F.col("_syj") / n)
    agg = j.agg(
        F.max("_n").alias("n"),
        F.max("_d").cast("int").alias("d"),
        F.sum(cxy * cxy).alias("_fxy"),
        F.sum(cxx * cxx).alias("_fxx"),
        F.sum(cyy * cyy).alias("_fyy"),
    )
    den = F.sqrt(F.col("_fxx")) * F.sqrt(F.col("_fyy"))
    return agg.select(
        "n",
        "d",
        F.round(
            F.when(den > 0, F.col("_fxy") / den), 6
        ).alias("cka"),
    )
