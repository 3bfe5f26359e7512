"""Distributed PCA for embedding columns: fit on the corpus, project to
k dimensions — the dimensionality-reduction step before ANN indexing /
clustering (smaller vectors, same neighborhoods), and the classic
whitening preprocessor.

Scale shape: the ONLY thing that ever leaves the executors is the
per-batch partial sufficient statistics (n, Σx, ΣxxT) — one
(1 + d + d²)-double row per Arrow batch, ~33 KB at d=64 — which the
driver reduces into the d×d covariance and eigendecomposes (O(d³) on
d≤~4096 is driver-trivial). The data-sized passes are embarrassingly
parallel numpy over Arrow batches: one pass to fit, one matmul pass to
project with the broadcast (mean, components). No shuffle in either
pass.

Determinism: eigh of a fixed symmetric matrix is deterministic, and the
residual sign ambiguity is pinned by forcing each component's largest-
magnitude coordinate positive — so fitted components (and therefore
projections) are reproducible run to run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(
    embs: DataFrame, k: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit on the full corpus; returns (mean[d], components[k, d],
    explained_variance[k]) with components orthonormal and variances
    descending."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            row = np.concatenate(
                ([float(len(x))], x.sum(axis=0), (x.T @ x).ravel())
            )
            yield pd.DataFrame({"stats": [row.tolist()]})

    rows = (
        embs.select(vec_col)
        .mapInPandas(_partials, "stats array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("cannot fit PCA on an empty frame")
    total = np.zeros(len(rows[0]["stats"]))
    for r in rows:
        total += np.asarray(r["stats"])
    d = int(round((-1 + np.sqrt(1 + 4 * (len(total) - 1))) / 2))
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    n, sx, sxx = total[0], total[1 : 1 + d], total[1 + d :].reshape(d, d)
    if n < 2:
        raise ValueError("need at least 2 vectors to fit PCA")
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign pin: largest-|coordinate| positive per component
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def pca_transform(
    embs: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "proj",
    explained_variance: np.ndarray | None = None,
) -> DataFrame:
    """Project every vector onto the fitted components: out = (x − mean)
    @ componentsT, one broadcast matmul per Arrow batch. Output schema =
    input columns + ``out_col: array<float>``. Pass the fit's
    ``explained_variance`` to WHITEN: each projected coordinate is
    scaled by 1/sqrt(var + 1e-12), so the output has identity
    covariance — the preprocessing that makes Euclidean ANN isotropic."""
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    if out_col in embs.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    comps = np.asarray(components)
    if explained_variance is not None:
        comps = comps / np.sqrt(
            np.asarray(explained_variance)[:, None] + 1e-12
        )
    sc = embs.sparkSession.sparkContext
    b = sc.broadcast((np.asarray(mean), comps))
    out_schema = StructType(
        list(embs.schema.fields) + [StructField(out_col, ArrayType(FloatType()))]
    )

    def _proj(batches):
        m, c = b.value
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                p = (x - m) @ c.T
                pdf[out_col] = [row.astype(np.float32).tolist() for row in p]
            else:
                pdf[out_col] = []
            yield pdf

    return embs.mapInPandas(_proj, out_schema)


def jl_sign_matrix(d: int, k: int, salt: str = "jl") -> list[list[float]]:
    """Deterministic ±1/√k Rademacher projection matrix (k rows × d
    cols) from per-cell md5 parity — the Achlioptas (2001)
    database-friendly Johnson–Lindenstrauss construction, seeded so any
    engine (or the DuckDB oracle) rebuilds the identical matrix from
    (salt, d, k) alone: cell sign = parity of the first hex nibble of
    md5('salt:i:j'). Model-sized (k·d doubles); built on the driver."""
    import hashlib

    inv = 1.0 / (k ** 0.5)
    return [
        [
            inv
            if int(hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -inv
            for i in range(d)
        ]
        for j in range(k)
    ]


def random_projection(
    embs: DataFrame,
    k: int,
    vec_col: str = "embedding",
    salt: str = "jl",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``k`` dims: append
    ``out_col = R·v`` with the seeded Rademacher matrix embedded as an
    array LITERAL (k·d doubles — the model, not data). Entirely
    map-only whole-stage codegen — ``zip_with``/``aggregate`` dot
    products, no shuffle, no Python — the cheap alternative to
    :func:`pca_fit` when a data-dependent basis is not needed (JL:
    pairwise distances are preserved within 1±ε for k = O(log n / ε²),
    independent of the input dimension). Input dim is probed from one
    row (bounded control read)."""
    probe = embs.select(F.size(vec_col).alias("d")).first()
    if probe is None:
        raise ValueError("empty input")
    d = probe["d"]
    rows = jl_sign_matrix(d, k, salt=salt)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dots = [
        F.aggregate(
            F.zip_with(vec, F.lit(r), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for r in rows
    ]
    return embs.withColumn(out_col, F.array(*dots))


def procrustes_drift(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Orthogonal-Procrustes drift report between two embedding
    versions (Schönemann 1966): find the rotation R minimizing
    ‖A·R − B‖_F over vectors shared by both tables, then measure what
    remains — the "did the embedding space actually change, or just
    rotate?" audit after re-training (neighborhoods are
    rotation-invariant, so residual AFTER the best rotation is the
    real drift; raw deltas wildly overstate it).

    Execution is the pca_fit sufficient-statistics shape end to end:
    pass 1 streams per-Arrow-batch partials of (n, AᵀB, ‖A‖², ‖B‖²) —
    model-sized (d² + 2 doubles per batch) — the driver SVDs M = AᵀB
    (O(d³), d ≤ thousands) into R = U·Vᵀ; pass 2 broadcasts R in the
    UDF closure and aggregates the aligned residual. Nothing
    corpus-sized ever reaches the driver, no shuffle in either pass
    beyond the id join. Output: one row (n, d, rms_before, rms_after,
    mean_cos_aligned) — rms_after ≈ 0 means pure rotation;
    rms_after ≈ rms_before means genuine geometric drift.
    """
    j = a.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_a"),
    ).join(
        b.select(
            F.col(id_col).alias("_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("_b"),
        ),
        "_id",
    )
    from swivel_spark_prep_spark.cache import track_persist

    j = track_persist(j.select("_a", "_b"))

    def _partials(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            xa = np.array(pdf["_a"].tolist(), dtype=np.float64)
            xb = np.array(pdf["_b"].tolist(), dtype=np.float64)
            row = np.concatenate(
                (
                    [float(len(xa))],
                    (xa.T @ xb).ravel(),
                    [float((xa * xa).sum()), float((xb * xb).sum())],
                    ((xa - xb) ** 2).sum(axis=1)[None, :].sum(axis=1),
                )
            )
            yield pd.DataFrame({"stats": [row.tolist()]})

    rows = j.mapInPandas(_partials, "stats array<double>").collect()
    if not rows:
        j.unpersist()
        raise ValueError("no shared ids between the two embedding tables")
    total = np.zeros(len(rows[0]["stats"]))
    for r in rows:
        total += np.asarray(r["stats"])
    n = total[0]
    d = int(round(np.sqrt(len(total) - 4)))
    m = total[1 : 1 + d * d].reshape(d, d)
    na2, nb2, raw_sse = total[1 + d * d], total[2 + d * d], total[3 + d * d]
    u, _, vt = np.linalg.svd(m)
    rot = u @ vt  # the Schönemann solution for max trace(RᵀM)

    rot_b = rot.tolist()

    def _resid(batches):
        import pandas as pd

        rr = np.array(rot_b)
        for pdf in batches:
            if not len(pdf):
                continue
            xa = np.array(pdf["_a"].tolist(), dtype=np.float64)
            xb = np.array(pdf["_b"].tolist(), dtype=np.float64)
            ar = xa @ rr
            sse = float(((ar - xb) ** 2).sum())
            num = (ar * xb).sum(axis=1)
            den = np.linalg.norm(ar, axis=1) * np.linalg.norm(xb, axis=1)
            cos = float((num / np.where(den > 0, den, 1.0)).sum())
            yield pd.DataFrame({"stats": [[sse, cos]]})

    res = np.zeros(2)
    for r in j.mapInPandas(_resid, "stats array<double>").collect():
        res += np.asarray(r["stats"])
    j.unpersist()
    spark = a.sparkSession
    return spark.createDataFrame(
        [
            (
                int(n),
                d,
                float(np.sqrt(raw_sse / n)),
                float(np.sqrt(res[0] / n)),
                float(res[1] / n),
            )
        ],
        "n long, d int, rms_before double, rms_after double, mean_cos_aligned double",
    )
