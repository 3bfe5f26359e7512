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
    # CASE guard, not greatest(): Spark's sequence(1, 0) DESCENDS,
    # emitting [1, 0] — a sub-3-char doc would fabricate junk trigrams
    tris = F.expr(
        f"CASE WHEN length({text_col}) >= 3 THEN "
        f"transform(sequence(1, length({text_col}) - 2),"
        f" i -> substring({text_col}, i, 3)) "
        f"ELSE cast(array() as array<string>) END"
    )
    from swivel_spark_prep_spark.cache import fan_out, track_persist

    # fan_out before the trigram explode (guide §2.5): the single-file
    # corpus scans as one task, and the ~|chars|-way Generate is the
    # training pass's whole CPU — one core otherwise
    tr = fan_out(train).select(
        F.col(label_col).alias("_y"), F.explode(tris).alias("_t")
    )
    # persisted: counts feeds the label totals, the vocab size, and the
    # model — without it the train-corpus explode re-runs per consumer
    counts = track_persist(tr.groupBy("_y", "_t").agg(F.count("*").alias("_c")))
    lt = {
        r["_y"]: r["_n"]
        for r in counts.groupBy("_y").agg(F.sum("_c").alias("_n")).collect()
    }
    if not lt:
        raise ValueError("train frame produced no trigrams")
    if any(y is None for y in lt):
        raise ValueError("labels must be non-null")
    labels = sorted(lt, key=str)  # tie-break order; survives odd labels
    prior_n = float(sum(lt.values()))
    vocab = counts.select("_t").distinct().agg(
        F.count("*").cast("double").alias("_v")
    )
    # wide per-trigram model with POSITIONAL column names — label values
    # never become identifiers (a 'pt-BR' label must not meet a parser)
    model = counts.groupBy("_t").agg(
        *[
            F.sum(F.when(F.col("_y") == F.lit(y), F.col("_c"))).alias(f"_cnt_{i}")
            for i, y in enumerate(labels)
        ]
    )
    import math

    ids = score.select(id_col).distinct()
    # same fan-out for the scoring-side explode
    sc = fan_out(score).select(F.col(id_col), F.explode(tris).alias("_t"))
    # vocab crossJoins the SCORING rows: a trigram absent from training
    # must still smooth against the true V, not a left-join NULL
    joined = sc.join(model, "_t", "left").crossJoin(F.broadcast(vocab))
    aggs = []
    for i, y in enumerate(labels):
        lp = F.log(
            (F.coalesce(F.col(f"_cnt_{i}"), F.lit(0)) + 1.0)
            / (lt[y] + F.col("_v"))
        )
        aggs.append(F.sum(lp).alias(f"_s_{i}"))
    per_doc = joined.groupBy(id_col).agg(*aggs)
    # every score row gets a prediction: a doc too short for any trigram
    # (dropped by the explode) falls back to the PRIOR argmax
    full = ids.join(per_doc, id_col, "left")
    for i, y in enumerate(labels):
        full = full.withColumn(
            f"_p_{i}",
            F.coalesce(F.col(f"_s_{i}"), F.lit(0.0))
            + math.log(lt[y] / prior_n),
        )
    pcols = [F.col(f"_p_{i}") for i in range(len(labels))]
    best = F.greatest(*pcols) if len(pcols) > 1 else pcols[0]
    pred = None
    for i, y in enumerate(labels):  # labels sorted: first match wins ties
        cond = F.col(f"_p_{i}") == best
        pred = F.when(cond, F.lit(y)) if pred is None else pred.when(
            cond, F.lit(y)
        )
    return full.select(F.col(id_col), pred.alias("pred"))


def nb_crossval_audit(
    docs: DataFrame,
    k: int = 5,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "kfold",
) -> DataFrame:
    """Cross-validated label-noise audit (the "confident learning"
    reading of Northcutt et al., public): every document is scored by a
    naive-Bayes char-trigram classifier TRAINED WITHOUT ITS OWN FOLD,
    so a prediction that disagrees with the stored label is evidence
    about the label, not memorization. Returns (id_col, label, pred,
    fold, mismatch) — aggregate the off-diagonal for the noise rate,
    inspect high-disagreement slices for mislabeled strata.

    Scale design — ONE training pass, not k: folds come from the
    deterministic md5 assignment (sampling.kfold_assign), and the
    leave-fold-out model is obtained by FOLD-DIFFERENCE ALGEBRA on two
    count relations::

        c_without_fold(f, y, t) = c_all(y, t) − c_fold(f, y, t)
        n_without_fold(f, y)    = n_all(y)    − n_fold(f, y)
        V_without_fold(f)       = V_all       − |{t exclusive to f}|

    so the corpus-sized trigram stream is aggregated once, and only the
    bounded count tables are combined per fold. Scoring joins each
    document's trigram multiset against c_all and its own fold's
    c_fold (same hash join on trigram), sums per (doc, label) with
    add-one smoothing over the fold's vocabulary, adds the fold prior,
    and argmaxes (ties by label asc). Labels with no rows outside a
    fold are excluded as candidates for that fold's docs (their prior
    is −∞). Docs shorter than one trigram fall back to the fold-prior
    argmax, like the base classifier.
    """
    from pyspark.sql.window import Window

    from swivel_spark_prep_spark.cache import fan_out, track_persist
    from swivel_spark_prep_spark.operators.sampling import kfold_assign

    # fan_out before the trigram explode (guide §2.5): the single-file
    # corpus scans as one task, so the persisted trigram stream — the
    # audit's whole map-side CPU — would otherwise materialize on one core
    base = fan_out(
        kfold_assign(
            docs.select(id_col, label_col, text_col), id_col, k=k, salt=salt
        )
    )
    tris = F.expr(
        f"CASE WHEN length({text_col}) >= 3 THEN "
        f"transform(sequence(1, length({text_col}) - 2),"
        f" i -> substring({text_col}, i, 3)) "
        f"ELSE cast(array() as array<string>) END"
    )
    tg = track_persist(
        base.select(
            F.col(id_col),
            F.col("fold"),
            F.col(label_col).alias("__y"),
            F.explode(tris).alias("__t"),
        )
    )

    c_all = tg.groupBy("__y", "__t").agg(F.count("*").alias("__ca"))
    c_fold = tg.groupBy("fold", "__y", "__t").agg(F.count("*").alias("__cf"))
    n_all = tg.groupBy("__y").agg(F.count("*").alias("__na"))
    n_fold = tg.groupBy("fold", "__y").agg(F.count("*").alias("__nf"))

    # per-fold training vocabulary: V_all minus trigrams exclusive to f
    t_spread = tg.groupBy("__t").agg(
        F.count_distinct("fold").alias("__nfolds"), F.min("fold").alias("__onef")
    )
    v_all_df = t_spread.agg(F.count("*").alias("__va"))
    v_excl = (
        t_spread.filter(F.col("__nfolds") == 1)
        .groupBy(F.col("__onef").alias("fold"))
        .agg(F.count("*").alias("__ve"))
    )
    folds_df = base.select("fold").distinct()
    v_by_fold = (
        folds_df.join(v_excl, "fold", "left")
        .crossJoin(F.broadcast(v_all_df))
        .select(
            "fold",
            (F.col("__va") - F.coalesce("__ve", F.lit(0)))
            .cast("double")
            .alias("__vf"),
        )
    )

    # leave-fold-out label totals + priors; labels absent outside a fold
    # drop out of that fold's candidate set
    ly = (
        folds_df.crossJoin(n_all)
        .join(n_fold, ["fold", "__y"], "left")
        .select(
            "fold",
            "__y",
            (F.col("__na") - F.coalesce("__nf", F.lit(0)))
            .cast("double")
            .alias("__nyf"),
        )
        .filter(F.col("__nyf") > 0)
    )
    priors = ly.groupBy("fold").agg(F.sum("__nyf").alias("__pn"))
    lyp = track_persist(
        ly.join(priors, "fold")
        .join(v_by_fold, "fold")
        .select(
            "fold",
            F.col("__y").alias("__cand"),
            "__nyf",
            (F.log(F.col("__nyf") / F.col("__pn"))).alias("__lprior"),
            "__vf",
        )
    )

    # per-doc trigram multiset (bounded: one row per distinct trigram)
    doc_t = tg.groupBy(id_col, "fold", "__t").agg(F.count("*").alias("__cd"))
    scored = (
        doc_t.join(F.broadcast(lyp), "fold")
        .join(
            c_all.select(F.col("__y").alias("__cand"), "__t", "__ca"),
            ["__cand", "__t"],
            "left",
        )
        .join(
            c_fold.select(
                "fold", F.col("__y").alias("__cand"), "__t", "__cf"
            ),
            ["fold", "__cand", "__t"],
            "left",
        )
        .groupBy(id_col, "fold", "__cand")
        .agg(
            (
                F.sum(
                    F.col("__cd")
                    * F.log(
                        (
                            F.coalesce("__ca", F.lit(0))
                            - F.coalesce("__cf", F.lit(0))
                            + 1.0
                        )
                        / (F.col("__nyf") + F.col("__vf"))
                    )
                )
                + F.first("__lprior")
            ).alias("__p")
        )
    )
    # docs with no trigram: fold-prior argmax
    no_tri = (
        base.join(doc_t.select(id_col).distinct(), id_col, "left_anti")
        .select(id_col, "fold")
        .join(F.broadcast(lyp), "fold")
        .select(id_col, "fold", "__cand", F.col("__lprior").alias("__p"))
    )
    allscores = scored.select(id_col, "fold", "__cand", "__p").unionAll(no_tri)
    w = Window.partitionBy(id_col).orderBy(F.desc("__p"), F.asc("__cand"))
    preds = (
        allscores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "fold", F.col("__cand").alias("pred"))
    )
    return preds.join(base.select(id_col, label_col), id_col).select(
        id_col,
        F.col(label_col).alias("label"),
        "pred",
        "fold",
        (F.col(label_col) != F.col("pred")).alias("mismatch"),
    )


def kneser_ney_bigram(
    train: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    the fixed-discount interpolated form of Chen & Goodman 1998):

        P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
                 + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)

    where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    left-contexts of w2 (the continuation-probability insight: how many
    contexts a word COMPLETES, not how often it occurs), and N1+(··) =
    distinct bigram types. All four relations are aggregates of the one
    bigram count table — three grouped aggregates with map-side
    combine, two vocab-keyed hash joins, one 1-row broadcast. Output:
    (w1, w2, c, p_kn) for every observed bigram (the backoff mass for
    UNSEEN pairs is λ(w1)·P_cont(w2) by the same formula with c = 0 —
    computable from the returned marginals without materializing the
    V² grid, which is the point of the factored form at 100 TB vocab).
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    _, bi, _ = train_bigram_lm(train, text_col)
    ctx = bi.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n_follow")
    )
    cont = bi.groupBy("w2").agg(F.count("*").alias("n_prec"))
    types = bi.agg(F.count("*").alias("n_types"))
    d = F.lit(float(discount))
    return (
        bi.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c",
            (
                F.greatest(F.col("c") - d, F.lit(0.0)) / F.col("c1")
                + d
                * F.col("n_follow")
                / F.col("c1")
                * F.col("n_prec")
                / F.col("n_types")
            ).alias("p_kn"),
        )
    )


def good_turing_smooth(counts: DataFrame, count_col: str) -> DataFrame:
    """Simple Good–Turing smoothed frequencies (Gale & Sampson 1995) —
    the classic answer to "how much probability mass belongs to events
    seen r times, and to events never seen at all", the discounting
    that Katz backoff and corpus-coverage estimates are built on.

    Input: one row per ITEM with its observed count; everything below
    operates on the FREQUENCY-OF-FREQUENCIES relation N_r (one row per
    distinct count value — O(√N_tokens) rows by the pigeonhole Σr ≥
    k²/2, so control-plane-ish but NOT driver-collected):

    - Turing estimate  r*_T = (r+1)·N_{r+1}/N_r  (needs N_{r+1});
    - Z-transform      Z_r = N_r / (0.5·(t − q)) with q/t the previous/
      next OBSERVED r (q=0 first, t=2r−q last) — computed via
      partitioned_prefix_extremum (exclusive prefix max below, prefix
      min above), never a global window;
    - LGT estimate     r*_LGT = r·(1 + 1/r)^(b+1) from the one-aggregate
      OLS fit log Z = a + b·log r (the X191 sufficient-stats idiom);
    - Gale–Sampson switch: use Turing for small r, switch to LGT at the
      FIRST r where |r*_T − r*_LGT| ≤ 1.65·sd(r*_T) (or N_{r+1} is
      absent) and stay switched — the switch point is a min-aggregate,
      broadcast back;
    - P0 = N_1/N unseen mass; per-r probabilities renormalized so
      Σ N_r·p_r = 1 − P0.

    Output: (r, n_r, r_star, p_r, p0) per distinct count, ordered by r.
    All work after the first groupBy is on the N_r relation; the only
    data-sized stage is that one hash aggregate.
    """
    from swivel_spark_prep_spark.cache import track_persist
    from swivel_spark_prep_spark.operators.ranks import (
        partitioned_prefix_extremum,
    )

    nr = (
        counts.select(F.col(count_col).cast("long").alias("r"))
        .filter(F.col("r").isNotNull() & (F.col("r") > 0))
        .groupBy("r")
        .agg(F.count("*").cast("double").alias("n_r"))
    )
    nr = track_persist(nr)
    # neighboring observed counts: q = prev r (0 if none), t = next r
    # (2r - q if none) -- two prefix-extremum passes, no global window
    withq = partitioned_prefix_extremum(nr, ["r"], "r", "_q", agg="max")
    witht = partitioned_prefix_extremum(
        withq, [F.col("r").desc()], "r", "_t", agg="min"
    )
    q = F.coalesce(F.col("_q"), F.lit(0)).cast("double")
    t = F.coalesce(F.col("_t").cast("double"), 2.0 * F.col("r") - q)
    z = witht.select(
        "r",
        "n_r",
        (F.col("n_r") / (0.5 * (t - q))).alias("_z"),
    )
    fit = z.agg(
        F.count("*").alias("_k"),
        F.sum(F.log("r")).alias("_sx"),
        F.sum(F.log("_z")).alias("_sy"),
        F.sum(F.log("r") * F.log("r")).alias("_sxx"),
        F.sum(F.log("r") * F.log("_z")).alias("_sxy"),
    )
    den = F.col("_k") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    b = F.when(den > 0, (F.col("_k") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den)
    fit = fit.select(b.alias("_b"))
    # N_{r+1} lookup: keyed join of the AGGREGATED relation onto itself
    # (reducer-crossed on both sides -- not a pair self-join)
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("_n_next"))
    est = (
        z.join(nxt, "r", "left")
        .crossJoin(F.broadcast(fit))
        .select(
            "r",
            "n_r",
            ((F.col("r") + 1) * F.col("_n_next") / F.col("n_r")).alias("_turing"),
            (
                F.col("r")
                * F.pow(1.0 + 1.0 / F.col("r"), F.col("_b") + 1.0)
            ).alias("_lgt"),
            F.sqrt(
                F.pow(F.col("r") + 1, 2)
                * F.col("_n_next")
                / (F.col("n_r") * F.col("n_r"))
                * (1.0 + F.col("_n_next") / F.col("n_r"))
            ).alias("_sd"),
        )
    )
    est = track_persist(est)
    # first r where Turing and LGT agree (or Turing is undefined):
    # switch there and stay switched
    switch = est.filter(
        F.col("_turing").isNull()
        | (F.abs(F.col("_turing") - F.col("_lgt")) <= 1.65 * F.col("_sd"))
    ).agg(F.min("r").alias("_switch_r"))
    with_star = est.crossJoin(F.broadcast(switch)).select(
        "r",
        "n_r",
        F.when(
            F.col("r") < F.coalesce(F.col("_switch_r"), F.lit(1)),
            F.col("_turing"),
        )
        .otherwise(F.col("_lgt"))
        .alias("_rstar"),
    )
    norm = with_star.agg(
        F.sum(F.col("r") * F.col("n_r")).alias("_N"),
        F.sum(F.col("n_r") * F.col("_rstar")).alias("_mass"),
        F.max(F.when(F.col("r") == 1, F.col("n_r"))).alias("_n1"),
    )
    p0 = F.coalesce(F.col("_n1") / F.col("_N"), F.lit(0.0))
    return (
        with_star.crossJoin(F.broadcast(norm))
        .select(
            F.col("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.round("_rstar", 6).alias("r_star"),
            F.round(
                (F.col("_rstar") / F.col("_N"))
                * ((1.0 - p0) / (F.col("_mass") / F.col("_N"))),
                9,
            ).alias("p_r"),
            F.round(p0, 9).alias("p0"),
        )
        .orderBy("r")
    )


def dunning_llr_collocations(
    train: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by Dunning's log-likelihood ratio (Dunning
    1993) — the G² complement to PMI (X117): PMI over-rewards rare
    pairs (two hapaxes that co-occur once get a huge score); G²
    weights the evidence by COUNT, so "of the" beats a one-off typo
    pair. Over the adjacent-bigram event table (N = total bigram
    tokens, k₁· / k·₁ the positional marginals):

        G² = 2·Σ_cell O·ln(O/E),  E_cell from the margins,

    summed over the 2×2 (w1?, w2?) contingency each bigram induces;
    zero cells contribute 0 (lim x·ln x = 0).

    Scale design: the bigram/marginal relations are train_bigram_lm's
    hash aggregates (vocab-sized, Zipf-bounded); two vocab-keyed joins
    attach the margins, a 1-row broadcast attaches N; G² is row
    arithmetic and the result is one TakeOrdered(k) — no new shuffle
    shape beyond the X180 Kneser–Ney plan. Output: (w1, w2, c, g2),
    ordered g2 desc with (w1, w2) tiebreak.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _, bi, _ = train_bigram_lm(train, text_col)
    left = bi.groupBy("w1").agg(F.sum("c").alias("_c1"))
    right = bi.groupBy("w2").agg(F.sum("c").alias("_c2"))
    total = bi.agg(F.sum("c").cast("double").alias("_N"))

    def _term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    scored = (
        bi.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
    )
    k11 = F.col("c").cast("double")
    k12 = F.col("_c1") - k11
    k21 = F.col("_c2") - k11
    nn = F.col("_N")
    k22 = nn - F.col("_c1") - F.col("_c2") + k11
    r1 = F.col("_c1").cast("double")
    r2 = nn - r1
    c1 = F.col("_c2").cast("double")
    c2 = nn - c1
    g2 = 2.0 * (
        _term(k11, r1 * c1 / nn)
        + _term(k12, r1 * c2 / nn)
        + _term(k21, r2 * c1 / nn)
        + _term(k22, r2 * c2 / nn)
    )
    return (
        scored.withColumn("_g2", g2)
        .orderBy(F.col("_g2").desc(), "w1", "w2")
        .limit(k)
        .select("w1", "w2", "c", F.round("_g2", 6).alias("g2"))
    )
