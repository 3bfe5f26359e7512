"""N-gram language-model training + perplexity scoring — the CCNet-style
quality signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document against an n-gram LM
trained on a trusted (or held-out) corpus, then filter/bucket by
perplexity. CCNet uses a KenLM 5-gram; the distributed re-expression here
is a bigram model with stupid backoff (Brants et al., "Large Language
Models in Machine Translation") — the smoothing scheme designed for
exactly this setting, distributed counts with no normalization pass.

Everything is declarative DataFrame ops:

- ``train_bigram_lm`` — two hash aggregates (unigram + bigram counts) with
  map-side partial aggregation; the model IS a pair of DataFrames, so it
  scales to any vocabulary (nothing is collected to the driver).
- ``score_stupid_backoff`` — per-document bigrams are pre-aggregated
  (``doc_id, w1, w2 → k``) BEFORE joining the count tables, so repeated
  bigrams inside a document join once; the count joins are plain shuffle
  hash joins on the token keys (broadcast-able automatically when the
  vocabulary is small — AQE decides); the corpus-total row is an explicit
  1-row broadcast.

Score semantics (log-likelihood per bigram, natural log):

    lp(w1 w2) = ln(c(w1,w2) / c(w1))          if the bigram was seen
              = ln(alpha * c(w2) / N)          otherwise (backoff)
    with c(w2) := 1 for out-of-vocabulary w2 (an OOV floor, the
    add-one unknown-word convention), alpha = 0.4 (Brants et al.).

    avg_lp(doc) = sum_k lp / n_bigrams;  ppl(doc) = exp(-avg_lp)

Documents with fewer than two tokens have no bigrams and are absent from
the output (callers needing them can left-join back). Training on the
scoring corpus itself makes every bigram "seen" — pass a held-out
``train`` subset (as X69 does) to exercise the backoff path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def train_bigram_lm(
    train: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables for a bigram LM: ``(unigrams(w, c), bigrams(w1, w2,
    c), total(n))``. Two shuffles (one per aggregate), both with map-side
    partial aggregation; ``total`` derives from the unigram table (no
    third scan)."""
    toks = train.select(_tokens(train, text_col).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bi = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n"))
    return uni, bi, total


def score_stupid_backoff(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    total: DataFrame,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document ``(id_col, n_bigrams, avg_lp, ppl)`` under the stupid-
    backoff bigram LM. ``avg_lp`` is the mean natural-log likelihood per
    bigram (≤ 0), ``ppl = exp(-avg_lp)`` — the CCNet filter key."""
    doc_bi = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.expr(
                        f"slice(split({text_col}, ' '), 1,"
                        f" size(split({text_col}, ' ')) - 1)"
                    ).alias("w1"),
                    F.expr(
                        f"slice(split({text_col}, ' '), 2,"
                        f" size(split({text_col}, ' ')) - 1)"
                    ).alias("w2"),
                )
            ).alias("p"),
        )
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("k"))
    )
    u1 = unigrams.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = unigrams.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    bc = bigrams.select("w1", "w2", F.col("c").alias("cb"))
    scored = (
        doc_bi.join(bc, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lp",
            F.when(
                F.col("cb").isNotNull(),
                F.log(F.col("cb") / F.col("c1")),
            ).otherwise(
                F.log(F.lit(alpha) * F.coalesce(F.col("c2"), F.lit(1)) / F.col("n"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("k").alias("n_bigrams"),
        (F.sum(F.col("k") * F.col("lp")) / F.sum("k")).alias("avg_lp"),
        F.exp(-(F.sum(F.col("k") * F.col("lp")) / F.sum("k"))).alias("ppl"),
    )


def nb_char_trigram_classifier(
    train: DataFrame,
    score: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Trainable naive-Bayes language classifier over character
    trigrams (the Cavnar-Trenkle / langid.py family, multinomial NB
    with add-one smoothing): train per-label trigram counts on
    ``train``, predict the argmax posterior for every ``score`` row.
    Returns (id_col, pred) — compose with the label for a confusion
    matrix. Unlike the stopword heuristic (X01), this is a MODEL
    TRAINED ON DATA: labels are whatever the train frame carries.

    Declarative end to end — the "model" is a DataFrame of per-trigram
    per-label log-probabilities, never collected:

    - training: one explode + one (trigram, label) count aggregate
      (map-side partials), label totals and the trigram-vocabulary size
      fold in as 1-row/|labels|-row broadcasts;
    - scoring: the document's trigram MULTISET joins the model on
      trigram (hash join, broadcast-able when the vocab is small), one
      grouped sum per (doc, label), argmax via max_by. A trigram absent
      from training contributes the add-one floor ln(1/(n_label+V)).

    ln-sum order across engines differs in the last ulp; posteriors for
    distinct labels differ by whole units, so the ARGMAX (what this
    returns) is engine-stable — pin parity on it, not on raw scores.
    """
    tris = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - 2, 0)),"
        f" i -> substring({text_col}, i, 3))"
    )
    tr = train.select(
        F.col(label_col).alias("_y"), F.explode(tris).alias("_t")
    )
    counts = tr.groupBy("_y", "_t").agg(F.count("*").alias("_c"))
    label_tot = tr.groupBy("_y").agg(F.count("*").alias("_n"))
    vocab = counts.select("_t").distinct().agg(
        F.count("*").cast("double").alias("_v")
    )
    labels = [r["_y"] for r in label_tot.select("_y").collect()]
    # wide per-trigram model: one ln-prob column per label (labels are
    # few — languages, domains; the trigram dimension stays tall)
    model = (
        counts.groupBy("_t")
        .pivot("_y", labels)
        .agg(F.first("_c"))
        .crossJoin(F.broadcast(vocab))
    )
    for y in labels:
        model = model.withColumn(f"_cnt_{y}", F.coalesce(F.col(y), F.lit(0)))
    lt = {r["_y"]: r["_n"] for r in label_tot.collect()}
    prior_n = sum(lt.values())
    sc = score.select(F.col(id_col), F.explode(tris).alias("_t"))
    joined = sc.join(model.select("_t", "_v", *[f"_cnt_{y}" for y in labels]), "_t", "left")
    aggs = []
    for y in labels:
        lp = F.log(
            (F.coalesce(F.col(f"_cnt_{y}"), F.lit(0)) + 1.0)
            / (lt[y] + F.coalesce(F.col("_v"), F.lit(1.0)))
        )
        aggs.append(F.sum(lp).alias(f"_s_{y}"))
    per_doc = joined.groupBy(id_col).agg(*aggs)
    import math

    best = F.expr(
        "greatest(" + ", ".join(f"_p_{y}" for y in labels) + ")"
    )
    for y in labels:
        per_doc = per_doc.withColumn(
            f"_p_{y}", F.col(f"_s_{y}") + math.log(lt[y] / prior_n)
        )
    pred = None
    for y in sorted(labels):
        cond = F.col(f"_p_{y}") == best
        pred = F.when(cond, F.lit(y)) if pred is None else pred.when(cond, F.lit(y))
    return per_doc.select(F.col(id_col), pred.alias("pred"))
