"""Deduplication operators for large-scale training-data pipelines.

- exact dedup: content-hash groupBy (Q39/Q40 as an API);
- MinHash + LSH banding: shingle → per-seed min-hash signature → band
  buckets → bucket-join candidates → exact-Jaccard verify;
- SimHash: 64-bit signature + Hamming-band blocking;
- n-gram Jaccard (exact): the deterministic oracle twin (Q41 generalized).

Scale notes: signatures are computed with JVM-side higher-order functions
(transform/array_min over the shingle array — no explode of |shingles|×H
rows, no Python). Candidate generation joins on (band_idx, band_hash) —
hash-partitioned, no all-pairs. The exact-verify stage re-joins the
shingle arrays only for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --- exact dedup -----------------------------------------------------------

def exact_dedup(
    df: DataFrame, content_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Survivors: keep the min key per content hash (md5). Partitioned
    window — hash-partitioned by digest, no global sort."""
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dup_stats(df: DataFrame, content_col: str = "text") -> DataFrame:
    return df.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col(content_col))).alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5(F.col(content_col)))).alias("n_dups"),
    )


# --- shingling -------------------------------------------------------------

def shingle(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shingles): sorted distinct n-token shingles (token
    n-grams joined by single spaces). Docs shorter than n tokens get an
    empty array."""
    expr = F.expr(
        f"""CASE WHEN size(toks) >= {n} THEN
              array_sort(array_distinct(transform(sequence(0, size(toks)-{n}),
                p -> concat_ws(' ', {", ".join(f"toks[p+{i}]" for i in range(n))}))))
            ELSE cast(array() as array<string>) END"""
    )
    return docs.select(
        F.col(doc_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks")
    ).select("doc_id", expr.alias("shingles"))


def _exact_jaccard_verify(
    cand: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """cand(d1, d2) × sh(doc_id, shingles) → pairs with exact Jaccard ≥
    threshold. Only candidate pairs pay the set-intersection cost."""
    x = sh.select(F.col("doc_id").alias("d1"), F.col("shingles").alias("sh1"))
    y = sh.select(F.col("doc_id").alias("d2"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = F.size("sh1").cast("double") + F.size("sh2").cast("double") - inter
    return (
        cand.join(x, "d1")
        .join(y, "d2")
        .withColumn("jac", inter / union)
        .filter(F.col("jac") >= threshold)
        .select("d1", "d2", "jac")
    )


# --- MinHash + LSH ---------------------------------------------------------

MERSENNE_31 = (1 << 31) - 1


def _affine_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine min-hash family
    h_i(x) = (a_i·x + b_i) mod 2^31−1. The 31-bit field keeps a·h+b
    < 2^62 — exact in int64 under Spark 4's default ANSI mode, which
    THROWS on long overflow instead of wrapping."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_31) | 1, rng.randrange(0, MERSENNE_31))
        for _ in range(num_hashes)
    ]


def minhash_signature(sh: DataFrame, num_hashes: int = 64) -> DataFrame:
    """(doc_id, shingles, sig): classic affine-family MinHash — each
    shingle is string-hashed ONCE (xxhash64), then every signature slot
    applies a cheap affine permutation h_i(x) = (a_i·x + b_i) mod 2^31−1
    and takes the min. One string hash per shingle instead of num_hashes
    string hashes — the standard construction. Empty shingle sets get
    NULL mins and never enter candidate generation."""
    base = sh.withColumn(
        "_hs",
        F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_31))),
    )

    def _min_hash(a: int, b: int):
        # NB: the lambda must take exactly one parameter — PySpark treats a
        # two-parameter transform lambda as (element, index).
        return F.array_min(
            F.transform(
                "_hs", lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE_31))
            )
        )

    sig = F.array(*[_min_hash(a, b) for a, b in _affine_params(num_hashes)])
    return base.withColumn("sig", sig).drop("_hs")


def minhash_lsh_candidates(
    signed: DataFrame, num_bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature; docs sharing any (band_idx, band_hash) bucket
    become candidate pairs (d1 < d2). Join is keyed on the bucket —
    scales with bucket occupancy, not n²."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    F.slice("sig", b * rows_per_band + 1, rows_per_band)
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )
    buckets = (
        signed.filter(F.size("shingles") > 0)
        .select("doc_id", F.explode(bands).alias("b"))
        .select("doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash"))
    )
    a = buckets.select(F.col("doc_id").alias("d1"), "band_idx", "band_hash")
    b = buckets.select(F.col("doc_id").alias("d2"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs (d1, d2, jac): MinHash-LSH candidates +
    exact-Jaccard verify. With b=16, r=4 the LSH S-curve crosses ~50%
    recall at jac ≈ (1/b)^(1/r) ≈ 0.5 — pairs at the 0.8 threshold are
    found with probability ≈ 1-(1-0.8^4)^16 ≈ 1-3e-4, and the verify
    stage keeps precision exact. 64 hashes halve signature cost vs 128
    with the same band width."""
    rows_per_band = num_hashes // num_bands
    sh = shingle(docs, n, text_col, doc_col)
    signed = minhash_signature(sh, num_hashes)
    cand = minhash_lsh_candidates(signed, num_bands, rows_per_band)
    return _exact_jaccard_verify(cand, sh, jaccard_threshold)


# --- exact n-gram Jaccard (inverted-index blocking) ------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 2,
    max_df: int = 10,
    threshold: float = 0.2,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Exact near-dup pairs via inverted-index blocking on rare shingles
    (document frequency in [min_df, max_df]) — Q41 generalized. The df
    upper bound keeps bucket joins skew-free: a shingle shared by >max_df
    docs would create quadratic candidates and is (by construction) a weak
    signal anyway."""
    sh = shingle(docs, n, text_col, doc_col)
    inv = sh.select("doc_id", F.explode("shingles").alias("sh"))
    rare = (
        inv.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df").between(min_df, max_df))
        .select("sh")
    )
    cand = (
        inv.withColumnRenamed("doc_id", "d1")
        .join(rare, "sh")
        .join(inv.withColumnRenamed("doc_id", "d2"), "sh")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    return _exact_jaccard_verify(cand, sh, threshold)


# --- SimHash ---------------------------------------------------------------

def simhash(
    docs: DataFrame, text_col: str = "text", doc_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(doc_id, simhash): classic token-level SimHash. Each token hashes to
    64 bits; bit k of the signature is 1 iff Σ_tokens (2·bit_k − 1) ≥ 0.
    Pure JVM expressions (explode + 64 conditional sums), no Python."""
    toks = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned(F.col("h"), k).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"b{k}")
            for k in range(bits)
        ]
    )
    sig = None
    for k in range(bits):
        bit = F.when(F.col(f"b{k}") >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, k)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Pairs (d1, d2, hamming ≤ max_hamming) via 4×16-bit band blocking:
    any pair within Hamming distance 3 of a 64-bit signature must agree
    exactly on at least one of 4 disjoint 16-bit bands (pigeonhole)."""
    sigs = simhash(docs, text_col, doc_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("simhash"), b * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
            for b in range(4)
        ]
    )
    buckets = sigs.select(
        "doc_id", F.col("simhash"), F.explode(bands).alias("b")
    ).select(
        "doc_id",
        "simhash",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_val").alias("band_val"),
    )
    a = buckets.select(
        F.col("doc_id").alias("d1"), F.col("simhash").alias("s1"), "band_idx", "band_val"
    )
    b = buckets.select(
        F.col("doc_id").alias("d2"), F.col("simhash").alias("s2"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
