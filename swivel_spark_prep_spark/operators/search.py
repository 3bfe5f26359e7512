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
    rel = qrels.filter(F.col(rel_col) > 0).select(query_col, doc_col)
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
