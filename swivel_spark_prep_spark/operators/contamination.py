"""Benchmark-contamination detection: which corpus documents share enough
n-grams with an evaluation/benchmark set to be suspect.

The standard pre-training hygiene step (and its post-hoc audit): before a
corpus trains a model, every document is checked for verbatim n-gram
overlap with held-out benchmarks so evaluation numbers aren't inflated by
memorized test items.

Plan shape (100 TB reading): the corpus side is the 100 TB table; the
benchmark side is eval suites — thousands of documents, megabytes. Shingle
both, broadcast the benchmark inverted index, hash-join on the shingle,
partial-agg count per (doc, bench) pair. The corpus is touched exactly
once, map-side only: no shuffle of corpus data at all when the benchmark
broadcasts (the groupBy keys are (doc_id, bench_id) — partial aggregation
collapses the join fan-out before the one small exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.dedup import shingle_hashes


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
    bench_doc_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, n_shared): corpus docs sharing ≥ ``min_shared``
    distinct n-token shingles with a benchmark doc.

    Both sides shingle with ``shingle_hashes`` (xxhash64 over the token
    tuple) — the hash function is identical on corpus and benchmark, so
    the shared-shingle count is unchanged up to 64-bit collisions, and no
    string shingle is ever materialized, deduped, sorted, or join-keyed
    (string array ops dominated the MinHash profile; see dedup.py).

    ``shingle_hashes`` emits *distinct* shingles per document, so every
    (doc, shingle) and (bench, shingle) row is unique and the joined rows
    per (doc, bench) pair are distinct — ``count(*)`` equals
    ``countDistinct(shingle)`` without the distinct-agg expand.

    Set ``broadcast_benchmark=False`` only if the benchmark side is too
    large to broadcast (then it's a shuffle hash join on the shingle).
    """
    c = shingle_hashes(corpus, n=n, text_col=text_col, doc_col=doc_col).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    b = shingle_hashes(
        benchmark, n=n, text_col=text_col, doc_col=bench_doc_col
    ).select(F.col("doc_id").alias("bench_id"), F.explode("shingles").alias("sh"))
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        c.join(b, "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
    bench_doc_col: str = "doc_id",
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti on the overlap set) —
    the removal step downstream of the audit."""
    flagged = ngram_overlap(
        corpus, benchmark, n=n, min_shared=min_shared,
        text_col=text_col, doc_col=doc_col, bench_doc_col=bench_doc_col,
    ).select("doc_id").distinct()
    return corpus.join(flagged, corpus[doc_col] == flagged["doc_id"], "left_anti")


def novelty_scores(
    candidates: DataFrame,
    reference: DataFrame,
    n: int = 8,
    text_col: str = "text",
    doc_col: str = "doc_id",
    broadcast_reference: bool = False,
) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction of
    a candidate's distinct n-token shingles NOT present anywhere in the
    reference — the incremental-crawl curation signal ("how much of
    this document is new text"), the complement of the contamination
    audit above.

    Plan: shingle both sides with the shared xxhash64 kernel, distinct
    the reference's shingle set once, LEFT SEMI join candidate shingles
    against it (per-shingle hash join — semi join never fans out), and
    divide seen/total per document. A semi join plus one grouped count:
    candidate data crosses the wire once, keyed by shingle. The
    reference set is corpus-sized, so the default is a shuffle join;
    pass ``broadcast_reference=True`` when the reference is small
    (a benchmark, a day's crawl).

    Returns (doc_id, n_shingles, n_seen, novelty) — docs shorter than
    ``n`` tokens have zero shingles and are emitted with novelty NULL.
    """
    from swivel_spark_prep_spark.cache import track_persist

    # consumed twice (totals + explode) and shingling is the CPU cost —
    # persist the shingle arrays once, released via cache.release_persisted
    cand = track_persist(
        shingle_hashes(
            candidates, n=n, text_col=text_col, doc_col=doc_col
        ).select("doc_id", "shingles")
    )
    exploded = cand.select("doc_id", F.explode("shingles").alias("sh"))
    ref = (
        shingle_hashes(reference, n=n, text_col=text_col, doc_col=doc_col)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    if broadcast_reference:
        ref = F.broadcast(ref)
    seen = (
        exploded.join(ref, "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_seen"))
    )
    totals = cand.select("doc_id", F.size("shingles").alias("n_shingles"))
    return (
        totals.join(seen, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
            F.when(
                F.col("n_shingles") > 0,
                1.0 - F.coalesce("n_seen", F.lit(0)) / F.col("n_shingles"),
            ).alias("novelty"),
        )
    )


def split_leakage_audit(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    train_frac: float = 0.8,
    salt: str = "",
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Train/test LEAKAGE audit for a hash split: how many documents on
    one side have an exact or near duplicate on the other — the
    contamination mode dedup-then-split prevents and split-then-dedup
    silently ships (an eval doc whose twin sits in training scores as
    memorization, not generalization).

    Exact leakage: one md5-grouped aggregate flags every digest present
    on BOTH sides (no pair join). Near-dup leakage: the existing
    MinHash-LSH pair relation filtered to cross-split pairs — banded,
    never all-pairs. Uses the same deterministic md5 split as
    sampling.hash_split, so the audit reproduces the split it audits.
    Output (1 row): n_train, n_test, exact_cross_digests,
    exact_cross_docs, neardup_cross_pairs.
    """
    from swivel_spark_prep_spark.operators.dedup import minhash_near_dups
    from swivel_spark_prep_spark.operators.sampling import hash_bucket

    if not 0.0 < train_frac < 1.0:
        raise ValueError(f"train_frac must be in (0,1), got {train_frac}")
    n = 1_000_000
    is_train = hash_bucket(F.col(doc_col), n, salt) < F.lit(
        int(round(train_frac * n))
    )
    tagged = docs.select(
        F.col(doc_col).alias("_id"),
        F.col(text_col).alias("_t"),
        is_train.alias("_tr"),
    )
    sides = tagged.agg(
        F.sum(F.col("_tr").cast("long")).alias("n_train"),
        F.sum((~F.col("_tr")).cast("long")).alias("n_test"),
    )
    exact = (
        tagged.groupBy(F.md5("_t").alias("_h"))
        .agg(
            F.count("*").alias("_c"),
            F.sum(F.col("_tr").cast("long")).alias("_ctr"),
        )
        .filter((F.col("_ctr") > 0) & (F.col("_ctr") < F.col("_c")))
        .agg(
            F.count("*").alias("exact_cross_digests"),
            F.coalesce(F.sum("_c"), F.lit(0)).alias("exact_cross_docs"),
        )
    )
    pairs = minhash_near_dups(
        docs, jaccard_threshold=jaccard_threshold,
        text_col=text_col, doc_col=doc_col,
    )
    t1 = tagged.select(F.col("_id").alias("d1"), F.col("_tr").alias("_tr1"))
    t2 = tagged.select(F.col("_id").alias("d2"), F.col("_tr").alias("_tr2"))
    cross = (
        pairs.join(t1, "d1")
        .join(t2, "d2")
        .filter(F.col("_tr1") != F.col("_tr2"))
        .agg(F.count("*").alias("neardup_cross_pairs"))
    )
    return (
        sides.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(cross))
        .select(
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_test").cast("long").alias("n_test"),
            F.col("exact_cross_digests").cast("long").alias(
                "exact_cross_digests"
            ),
            F.col("exact_cross_docs").cast("long").alias("exact_cross_docs"),
            F.col("neardup_cross_pairs").cast("long").alias(
                "neardup_cross_pairs"
            ),
        )
    )
