"""Content-defined chunking (CDC) + chunk-level dedup — the
storage-dedup primitive (Muthitacharoen et al., "A Low-bandwidth Network
File System"; rsync/restic/borg all chunk this way): cut a document
where a rolling hash of the last ``window`` tokens hits a divisor
condition, so boundaries depend on CONTENT, not position. Insert a
paragraph at the front and every later boundary re-aligns — shared
content keeps producing identical chunks (property-tested), which
fixed-size chunking cannot do.

Token-level here (matching the rest of the text pipeline): the hash of
a window ending at token i is the Horner polynomial of per-token hashes
(first 8 md5 hex digits as an int — an arithmetic both Spark's
``conv(hex,16,10)`` and DuckDB's ``('0x'||hex)::BIGINT`` evaluate
identically, which is what makes the oracle exact) mod M = 2³¹−1;
a cut lands after token i when that value ≡ 0 mod ``divisor`` (mean
chunk length ≈ divisor tokens). The final token never cuts (the forced
end boundary covers it).

Everything is a chain of higher-order JVM expressions per row —
transform / filter / aggregate / slice — no shuffle at all until the
cross-doc chunk-hash aggregate, and that shuffles 8-byte-ish hashes
with map-side combine. No Python in any path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = 257
_M = 2147483647  # 2^31 - 1


def cdc_chunk(
    docs: DataFrame,
    window: int = 3,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode documents into content-defined chunks: ``(id_col,
    chunk_idx, chunk_text, chunk_hash)``. Docs shorter than ``window``
    tokens form a single chunk."""
    from swivel_spark_prep_spark.cache import fan_out

    w, d = window, divisor
    # fan_out before the per-token md5 + Horner HOFs (round 16, guide
    # §2.5): the single-file corpus scans as one task, so the chunking
    # CPU — the op's whole cost — otherwise runs on one core
    toks = fan_out(docs).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("t")
    ).withColumn("n", F.size("t"))
    hashed = toks.withColumn(
        "hs",
        F.expr(
            "transform(t, x -> cast(conv(substr(md5(x), 1, 8), 16, 10)"
            " as bigint))"
        ),
    )
    # cut after token i (window..n-1) when the windowed Horner hash
    # divides; Horner with a step-mod is congruent to the full
    # polynomial mod M, and each step stays < 2^40 (no overflow)
    cuts = hashed.withColumn(
        "cuts",
        F.when(
            F.col("n") > w,
            F.expr(
                f"filter(sequence({w}, n - 1),"
                f" i -> aggregate(slice(hs, i - {w} + 1, {w}),"
                f" cast(0 as bigint),"
                f" (acc, h) -> (acc * {_B} + h) % {_M}) % {d} = 0)"
            ),
        ).otherwise(F.expr("cast(array() as array<bigint>)")),
    )
    chunks = cuts.withColumn(
        "bounds",
        F.expr("concat(array(cast(0 as bigint)), cuts, array(cast(n as bigint)))"),
    ).select(
        id_col,
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(bounds) - 1),"
                " j -> concat_ws(' ', slice(t,"
                " cast(element_at(bounds, j) + 1 as int),"
                " cast(element_at(bounds, j + 1) - element_at(bounds, j)"
                " as int))))"
            )
        ).alias("idx0", "chunk_text"),
    )
    return chunks.select(
        id_col,
        (F.col("idx0") + 1).alias("chunk_idx"),
        "chunk_text",
        F.md5("chunk_text").alias("chunk_hash"),
    )


def cdc_dedup_stats(
    docs: DataFrame,
    window: int = 3,
    divisor: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document chunk-dedup report: ``(id_col, n_chunks, dup_chunks,
    dup_frac)`` where a chunk instance is duplicated when its hash
    occurs in ≥ ``min_docs`` distinct documents — the storage-dedup
    ratio a CDC-chunked corpus store would achieve on this data."""
    from swivel_spark_prep_spark.cache import track_persist

    # persisted NARROW (round 16, guide §5): the stats only ever read
    # (id, chunk_hash), and the relation feeds THREE consumers (the
    # duplicate aggregate, the semi join, the per-doc totals) — without
    # the persist the whole CDC chunking pipeline (per-token md5 +
    # Horner rolling hash) executes three times; projecting away
    # chunk_text first keeps the cached footprint to two hash columns.
    ch = track_persist(
        cdc_chunk(docs, window, divisor, id_col, text_col).select(
            id_col, "chunk_hash"
        )
    )
    dup = (
        ch.groupBy("chunk_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("chunk_hash")
    )
    flagged = ch.join(dup, "chunk_hash", "left_semi")
    per = flagged.groupBy(id_col).agg(F.count("*").alias("dup_chunks"))
    totals = ch.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    return (
        totals.join(per, id_col, "left")
        .select(
            id_col,
            "n_chunks",
            F.coalesce("dup_chunks", F.lit(0)).alias("dup_chunks"),
            F.round(
                F.coalesce("dup_chunks", F.lit(0)) / F.col("n_chunks"), 4
            ).alias("dup_frac"),
        )
    )


def span_corruption_spec(
    docs: DataFrame,
    block: int = 20,
    span_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "spancorr",
) -> DataFrame:
    """Deterministic T5-style span-corruption plan (Raffel et al. 2020's
    denoising objective, public): which token spans of each document to
    mask. One span of ``span_len`` tokens per full ``block``-token
    block, placed at an md5-derived offset inside the block — spans are
    non-overlapping BY CONSTRUCTION (one per disjoint block, offset ≤
    block − span_len), the corruption rate is span_len/block (15% for
    the 3/20 default), and the placement is a pure function of
    (doc, block index): reproducible across runs, engines, and corpus
    growth, unlike an RNG draw.

    Emitting the spec (not the corrupted text) keeps the operator
    engine-checkable and lets the tokenizer-side consumer apply
    sentinel tokens its own way. Pure projection + explode — no
    shuffle, linear in corpus tokens.

    Output: (id_col, span_id, start, length) with 0-based token starts.
    """
    if not (0 < span_len <= block):
        raise ValueError("need 0 < span_len <= block")
    n_tok = F.size(F.split(F.lower(F.col(text_col)), " "))
    n_blocks = F.floor(n_tok / block).cast("int")
    spans = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n_blocks > 0, F.sequence(F.lit(0), n_blocks - 1)
            ).otherwise(F.array())
        ).alias("span_id", "__b"),
    )
    off = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col(id_col).cast("string"),
                        F.lit("|"),
                        F.col("__b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (block - span_len + 1)
    )
    return spans.select(
        id_col,
        "span_id",
        (F.col("__b") * block + off).cast("long").alias("start"),
        F.lit(span_len).cast("long").alias("length"),
    )


def sliding_window_chunks(
    docs: DataFrame,
    window: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size sliding-window chunking with overlap — the RAG-prep
    counterpart of :func:`cdc_chunk`: split each document into windows
    of ``window`` tokens advancing by ``stride`` (overlap = window −
    stride), the standard retrieval-corpus segmentation. Every token is
    covered, the last chunk may be short, and a document with ≤ window
    tokens yields exactly one chunk:

        n_chunks = 1 + ceil(max(n − window, 0) / stride)
        chunk k  = tokens[k·stride + 1 .. min(k·stride + window, n)]

    Execution: split → ONE sequence+posexplode per document (fan-out =
    n_chunks, the output's own cardinality — no join, no shuffle, no
    window function; chunking is embarrassingly row-parallel) → slice +
    array_join, all JVM codegen-or-generator expressions. Scale: output
    rows ≈ corpus_tokens/stride regardless of document skew; a giant
    document costs its own chunk count, never a hot partition (rows
    stay on their input partition).

    Output: (id, chunk_id, n_tokens, chunk).
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window and stride must be >= 1, got {window}/{stride}")
    if stride > window:
        raise ValueError(f"stride {stride} > window {window} would skip tokens")
    toks = F.split(F.col(text_col), " ", -1)
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), toks.alias("_t"), F.size(toks).alias("_n")
    ).filter(F.col("_n") > 0)
    n_chunks = F.lit(1) + F.greatest(
        F.ceil((F.col("_n") - F.lit(window)) / F.lit(float(stride))),
        F.lit(0),
    ).cast("int")
    ex = base.select(
        "id",
        "_t",
        "_n",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    start = F.col("chunk_id") * F.lit(stride) + F.lit(1)
    piece = F.slice("_t", start, F.lit(window))
    return ex.select(
        "id",
        "chunk_id",
        F.least(F.lit(window), F.col("_n") - F.col("chunk_id") * F.lit(stride))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )
