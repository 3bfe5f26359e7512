"""Full-text search primitives: inverted index + BM25 ranking.

The retrieval side of a training-data pipeline (mining documents for a
topic, building eval retrieval sets, nearest-neighbour text lookup
without embeddings). Two entry points:

- :func:`build_inverted_index` — the classic posting-list relation
  (term, doc_id, tf) plus per-term document frequency, produced by one
  explode + one aggregate. At 100 TB this is the standard "index build"
  shuffle: partitioned by term, combiner-friendly (partial counts
  map-side), no driver state.
- :func:`bm25_topk` — score documents for a small query-term set with
  BM25 (Robertson/Sparck Jones; the Lucene ``k1``/``b`` parametrization
  with the non-negative ``ln(1 + (N-df+0.5)/(df+0.5))`` idf) and return
  the global top-k.

Scale design of ``bm25_topk``: the query-term filter is applied to the
token stream BEFORE any aggregation, so the only shuffled relation is
(docs containing a query term) — proportional to the posting lists of
the query, not the corpus. Corpus-level constants (N, avgdl) are one
1-row aggregate broadcast back via crossJoin; per-term df is a
|query|-row aggregate, also broadcast. The final top-k is
``orderBy(...).limit(k)`` which Spark executes as TakeOrdered (per
partition heap + driver merge of k·P rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    ).filter(F.col("term") != "")


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting lists: one row per (term, doc) with the term frequency and
    the term's document frequency. Partitioned by the groupBy on
    (term, doc) — partial aggregation runs map-side, and the df window
    is per-term (re-uses the same hash partitioning on term)."""
    tf = _tokens(docs, id_col, text_col).groupBy("term", id_col).agg(
        F.count("*").alias("tf")
    )
    # df per term via a second small aggregate + join rather than a
    # window: the (term, df) relation is |vocab| rows — tiny next to the
    # posting lists — and the join re-shuffles on term only.
    df_by_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    return tf.join(df_by_term, "term").select("term", id_col, "tf", "df")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global BM25 top-k for ``query_terms``: (doc_id, score) with
    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``,
    ties broken by ascending doc id. Scores are exact doubles; callers
    wanting cross-engine comparability should round."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = _tokens(docs, id_col, text_col)
    # per-document length from the raw text — one projection, no shuffle
    dl = docs.select(
        F.col(id_col),
        F.size(F.split(F.lower(F.col(text_col)), " ")).cast("double").alias("dl"),
    )
    # corpus constants: single-row aggregate, broadcast via crossJoin
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # filter to query terms FIRST: everything downstream is sized by the
    # query's posting lists, not the corpus
    qtf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("term", id_col)
        .agg(F.count("*").cast("double").alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def rrf_fuse(
    ranked: dict[str, DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009, public)
    of several retrieval result lists: ``rrf(d) = Σ_lists 1/(k_rrf +
    rank_list(d))`` over the lists that contain ``d``.

    ``ranked`` maps a list name to a (id, score) DataFrame — typically
    the TOP-K output of :func:`bm25_topk` (lexical) and a dense cosine
    scorer; ids must share a domain. Ranks are 1-based by (score desc,
    id asc) — the deterministic tie-break both engines replay.

    Scale: the inputs are already top-k lists (bounded), so the
    per-list row_number window and the final aggregate touch only
    |lists|·k rows — fusion cost is independent of corpus size.

    Output: (id_col, rrf, n_lists), top-``k`` by (rrf desc, id asc).
    """
    if not ranked:
        raise ValueError("ranked must be non-empty")
    from pyspark.sql.window import Window

    tagged = None
    for name, df in ranked.items():
        t = df.select(
            F.lit(name).alias("__list"),
            F.col(id_col),
            F.col(score_col).cast("double").alias("__s"),
        )
        tagged = t if tagged is None else tagged.unionAll(t)
    w = Window.partitionBy("__list").orderBy(F.desc("__s"), F.asc(id_col))
    return (
        tagged.withColumn("__rank", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.sum(1.0 / (F.lit(float(k_rrf)) + F.col("__rank"))).alias("rrf"),
            F.count("*").alias("n_lists"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Standard retrieval evaluation (TREC-style, public): per-query
    Recall@k, MRR@k and binary nDCG@k from a ranked run and a
    relevance-judgment relation — the eval loop every retrieval stack
    (BM25, dense, hybrid RRF) is tuned against.

    ``results``: (query, doc, rank) with rank 1-based; ``qrels``:
    (query, doc, rel) with rel > 0 meaning relevant. Unjudged retrieved
    docs count as non-relevant (the TREC convention). nDCG uses binary
    gains: DCG = Σ rel/log2(rank+1), IDCG = Σ_{i≤min(R,k)} 1/log2(i+1)
    with R the query's total relevant count.

    One join on (query, doc) + two grouped aggregates — both sides
    shuffle on the query key only; the IDCG series folds in as a
    codegen ``aggregate(sequence(...))`` expression, no UDF. Queries
    with no relevant documents are dropped (their metrics are
    undefined). Output: (query_col, n_rel, recall, mrr, ndcg).
    """
    res = results.filter(F.col(rank_col) <= k).select(
        query_col, doc_col, rank_col
    )
    # distinct: duplicate judgment rows (real qrels files carry them
    # across assessment rounds) would fan out the join and yield
    # nDCG > 1
    rel = qrels.filter(F.col(rel_col) > 0).select(query_col, doc_col).distinct()
    totals = rel.groupBy(query_col).agg(F.count("*").alias("n_rel"))
    hits = (
        res.join(
            rel.withColumn("__rel", F.lit(1)), [query_col, doc_col], "left"
        )
        .groupBy(query_col)
        .agg(
            F.sum(F.coalesce("__rel", F.lit(0))).alias("__hits"),
            F.max(
                F.when(F.col("__rel").isNotNull(), 1.0 / F.col(rank_col))
            ).alias("__mrr"),
            F.sum(
                F.when(
                    F.col("__rel").isNotNull(),
                    1.0 / F.log2(F.col(rank_col) + 1.0),
                )
            ).alias("__dcg"),
        )
    )
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {k}))), cast(0.0 as double),"
        " (acc, i) -> acc + 1.0 / log2(i + 1.0))"
    )
    return (
        totals.join(hits, query_col, "left")
        .select(
            query_col,
            "n_rel",
            (F.coalesce("__hits", F.lit(0)) / F.col("n_rel")).alias("recall"),
            F.coalesce("__mrr", F.lit(0.0)).alias("mrr"),
            (F.coalesce("__dcg", F.lit(0.0)) / idcg).alias("ndcg"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    k: int = 20,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most-similar document pairs by EXACT cosine over the
    df-pruned TF-IDF vector space (the classic VSM duplicate/related-
    document detector — a third similarity family next to MinHash-LSH
    shingles and dense embeddings).

    Terms with document frequency > ``max_df`` are dropped from the
    vector space itself (standard stopword pruning: a term in half the
    corpus carries ~zero idf anyway), which simultaneously makes the
    pair generation tractable — the posting-list self-join on the
    shared term key is bounded by Σ_t df_t² over df ≤ max_df, never
    the ubiquitous-term blowup. Within that space the score is exact:
    sim = Σ_t w₁w₂ / (‖w₁‖‖w₂‖), w = tf · ln(N/df).

    Plan: one token aggregate → posting lists, one |vocab|-row df
    relation broadcast, one self-join on term + pair aggregate, one
    TakeOrdered(k). Output: (d1, d2, sim), d1 < d2.
    """
    from swivel_spark_prep_spark.cache import track_persist

    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy("term", id_col).agg(F.count("*").cast("double").alias("tf"))
    n_docs = docs.select(id_col).distinct().count()  # bounded: one long
    dfr = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") <= max_df
    )
    # the weighted postings feed the norms AND both self-join sides —
    # persist once instead of re-tokenizing the corpus three times
    w = track_persist(
        tf.join(F.broadcast(dfr), "term").select(
            "term",
            F.col(id_col).alias("d"),
            (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
        )
    )
    norms = w.groupBy("d").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nn"))
    a = w.select("term", F.col("d").alias("d1"), F.col("w").alias("w1"))
    b = w.select("term", F.col("d").alias("d2"), F.col("w").alias("w2"))
    dots = (
        a.join(b, "term")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    return (
        dots.join(norms.select(F.col("d").alias("d1"), F.col("nn").alias("n1")), "d1")
        .join(norms.select(F.col("d").alias("d2"), F.col("nn").alias("n2")), "d2")
        .select("d1", "d2", (F.col("dot") / (F.col("n1") * F.col("n2"))).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("d1"), F.asc("d2"))
        .limit(k)
    )


def expand_query_rm3(
    docs: DataFrame,
    query_terms: list[str],
    n_docs_fb: int = 10,
    n_terms: int = 10,
    max_df: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (the RM3 idea, Lavrenko
    & Croft 2001, reduced to its TF-IDF core): take the BM25 top
    ``n_docs_fb`` documents for the query, score every term they
    contain by Σ_docs tf·ln(N/df), drop the original query terms and
    df > ``max_df`` noise, return the top ``n_terms`` as (term, weight)
    — feed the union of original + expansion terms back into
    :func:`bm25_topk` for the expanded retrieval round.

    Everything downstream of the BM25 stage is sized by the feedback
    set (n_docs_fb documents' tokens), not the corpus. Ties break by
    term asc; weights are raw doubles (round for cross-engine
    hashing)."""
    from swivel_spark_prep_spark.cache import track_persist

    fb = bm25_topk(docs, query_terms, k=n_docs_fb, id_col=id_col, text_col=text_col)
    n = docs.select(id_col).distinct().count()  # bounded: one long
    # one persisted token stream feeds the vocabulary df relation and
    # the feedback-doc counts
    toks = track_persist(_tokens(docs, id_col, text_col))
    dfr = (
        toks.groupBy("term", id_col)
        .agg(F.lit(1).alias("__1"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    qset = {t.lower() for t in query_terms}
    fb_toks = toks.join(F.broadcast(fb.select(id_col)), id_col, "left_semi")
    fb_tf = (
        fb_toks.groupBy("term", id_col)
        .agg(F.count("*").cast("double").alias("tf"))
        .filter(~F.col("term").isin(list(qset)))
    )
    # broadcast the FEEDBACK side (n_docs_fb documents' distinct terms),
    # never the corpus-vocabulary df relation
    scored = (
        dfr.filter(F.col("df") <= max_df)
        .join(F.broadcast(fb_tf), "term")
        .groupBy("term")
        .agg(
            F.sum(F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))).alias(
                "weight"
            )
        )
    )
    return scored.orderBy(F.desc("weight"), F.asc("term")).limit(n_terms)


def _gram_array(text_col: str):
    t = F.lower(F.col(text_col))
    # sequence(1, n) steps DOWN when n < 1 — guard short texts to an
    # empty gram set explicitly
    return F.when(
        F.length(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def trigram_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional-free character-trigram posting index (the pg_trgm
    idea): one row per DISTINCT (doc, gram) over the lower-cased text.
    Built with sequence+transform inside codegen — no UDF. The distinct
    is one (id, gram)-keyed shuffle over the exploded gram stream — the
    standard index-build cost, paid ONCE; persist or write the result
    and reuse it across queries (substring_search accepts it via
    ``index=``; its inline path deliberately avoids this shuffle).
    """
    return docs.select(
        F.col(id_col).alias("id"), F.explode(_gram_array(text_col)).alias("gram")
    ).distinct()


def substring_search(
    docs: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact substring search (case-insensitive ``contains``), with an
    optional TRIGRAM-INDEX prefilter (the pg_trgm idea): a doc can
    contain the pattern only if it contains EVERY trigram of the
    pattern, so a PREBUILT posting index narrows the verify to
    candidate ids — result-identical to the naive filter by
    construction (prefilter is a superset; verify is exact — the
    MinHash-LSH candidate/verify discipline applied to substring
    match; path-equality is test-pinned).

    WITHOUT an index this runs the plain ``contains`` scan — measured
    honestly, that is the right plan: constructing the gram stream
    reads every byte the scan would read and then does strictly more
    work (0.26 s naive vs 60+ s inline-index at the sf1 sweep), so an
    inline prefilter can never pay for itself on one query. The index
    pays where pg_trgm's does: built ONCE (trigram_index, persisted or
    written), amortized over MANY patterns against a corpus whose scan
    is expensive — then each query touches only the pattern's posting
    lists plus the candidate rows. Patterns shorter than 3 characters
    always use the plain filter (no trigram to block on).
    Returns the matching rows of ``docs``.
    """
    pat = pattern.lower()
    verify = F.contains(F.lower(F.col(text_col)), F.lit(pat))
    if index is None or len(pat) < 3:
        return docs.filter(verify)
    grams = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    cands = (
        index.filter(F.col("gram").isin(grams))
        .groupBy("id")
        .agg(F.countDistinct("gram").alias("_hits"))
        .filter(F.col("_hits") == len(grams))
        .select(F.col("id").alias(id_col))
    )
    return docs.join(cands, id_col, "left_semi").filter(verify)


def doc_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the cheap document-tagging
    primitive (related-content keys, index facets, quick topic
    labels). Weights are the same tf · ln(N/df) space
    tfidf_cosine_pairs ranks pairs in; the per-doc top-k is a window
    PARTITIONED by the document (ties break by term, so the tag set is
    run-deterministic). One token aggregate, one vocab-sized df
    relation broadcast back, one per-doc window — no self-join, no
    global sort. Output: (id, rank, term, w).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy("term", id_col).agg(
        F.count("*").cast("double").alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()  # bounded: one long
    dfr = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = tf.join(F.broadcast(dfr), "term").select(
        F.col(id_col).alias("id"),
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    win = Window.partitionBy("id").orderBy(F.desc("w"), F.asc("term"))
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("id", "rank", "term", "w")
    )


def kwic_snippets(
    docs: DataFrame,
    term: str,
    width: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context (KWIC) snippets — the search-result extraction
    step: for every document containing ``term`` as a whitespace token,
    the ±``width``-token window around its FIRST occurrence. The
    concordance view corpus linguists and search UIs both want; pure
    codegen (split + array_position + slice + array_join), zero
    shuffle, linear scan.

    Output: (id, pos, snippet) — pos is the 1-based token position of
    the hit; docs without the token produce no row.
    """
    if width < 0:
        raise ValueError(f"width must be >= 0, got {width}")
    toks = F.split(F.col(text_col), " ", -1)
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        toks.alias("_t"),
        F.array_position(toks, term).alias("pos"),
    ).filter(F.col("pos") > 0)
    start = F.greatest(F.lit(1), F.col("pos") - F.lit(width))
    # window length: from start through pos + width (slice clamps at
    # the array end)
    length = F.col("pos") + F.lit(width) - start + F.lit(1)
    return base.select(
        "id",
        "pos",
        F.array_join(F.slice("_t", start, length), " ").alias("snippet"),
    )
