"""Classifier-evaluation metrics as relational aggregates — the audit
loop of a data pipeline that trains filters on its own corpus (quality
classifiers, language ID, toxicity gates): AUC for threshold-free
ranking power, Cohen's kappa for agreement between two labelers, and a
calibration/ECE report for "is the score a probability".

All three reduce the corpus to relations BEFORE any running sum: AUC to
per-distinct-score counts, kappa to label marginals, calibration to
``bins`` rows. The AUC CDF uses the two-pass range-partitioned prefix
sum (operators/ranks — for a CONTINUOUS score, distinct scores ≈ rows,
so an unpartitioned window would be a single-task sort at corpus scale;
round-9 verdict "What's wrong #1"). Everything is deterministic
arithmetic (no sampling), so DuckDB oracles replay the formulas exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

__all__ = [
    "binary_auc",
    "cohens_kappa",
    "calibration_report",
    "chi2_independence",
    "mutual_information",
    "ndcg_at_k",
    "spearman_corr",
    "embedding_class_scatter",
    "average_precision",
    "isotonic_calibration",
    "welch_ttest",
    "anova_oneway",
    "mann_whitney_u",
    "cuped_uplift",
    "kruskal_wallis",
    "brier_decomposition",
    "mcnemar_test",
    "cochran_armitage",
    "fleiss_kappa",
    "rank_biased_overlap",
    "bradley_terry",
    "bradley_terry_oracle_sql",
    "simplified_silhouette",
    "conformal_interval",
    "tukey_hsd",
    "cochran_q",
    "two_proportion_test",
    "regression_reliability",
    "mde_report",
    "conformal_by_group",
    "jonckheere_terpstra",
    "ansari_bradley",
    "chatterjee_xi",
    "cucconi_test",
    "lepage_test",
    "bws_test",
    "fligner_killeen",
    "acklam_probit_sql",
    "page_trend",
    "quade_test",
    "weighted_kappa",
]


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Tie-corrected Mann-Whitney AUC: the probability a random
    positive outscores a random negative, counting ties as half —
    equivalently the area under the ROC curve with linear tie
    interpolation (Hand & Till 2001 formulation).

    Computed WITHOUT ranking raw rows: one aggregate collapses the data
    to per-DISTINCT-SCORE (n_pos, n_neg) counts; the negatives strictly
    below each score come from the two-pass range-partitioned prefix
    sum (operators/ranks.partitioned_prefix_sum — no single-task sort
    even when the score is continuous and distinct≈rows); then
    ``AUC = Σ n_pos(s)·(neg_below(s) + n_neg(s)/2) / (N_pos·N_neg)``.
    Rows with NULL score or label are excluded. Output: one row
    (n_pos, n_neg, auc) — or one row PER GROUP (group, n_pos, n_neg,
    auc) with ``group_col`` ("AUC by language/source", the per-slice
    audit a curation pipeline actually runs; NULL group is a group).
    auc is NULL when either class is empty (undefined, not 0)."""
    gcols = [group_col] if group_col else []
    g = df.select(
        *gcols,
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    c = g.groupBy(*gcols, "_s").agg(
        F.sum(F.col("_y").cast("long")).alias("_np"),
        F.sum((~F.col("_y")).cast("long")).alias("_nn"),
    )
    cum = partitioned_prefix_sum(
        c, ["_s"], ["_nn"], ["_cnb"], group_cols=gcols, inclusive=False
    )
    aggs = [
        F.sum("_np").alias("n_pos"),
        F.sum("_nn").alias("n_neg"),
        F.when(
            (F.sum("_np") > 0) & (F.sum("_nn") > 0),
            F.sum(F.col("_np") * (F.col("_cnb") + F.col("_nn") / 2.0))
            / (F.sum("_np") * F.sum("_nn")),
        ).alias("auc"),
    ]
    return cum.groupBy(group_col).agg(*aggs) if group_col else cum.agg(*aggs)


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two categorical labelers (Cohen 1960):
    observed agreement corrected for the agreement two INDEPENDENT
    labelers with the same marginals would reach by chance —
    ``kappa = (p_o - p_e)/(1 - p_e)`` with
    ``p_e = Σ_k p_a(k)·p_b(k)``. The go/no-go statistic before trusting
    a cheap heuristic labeler against a reference one.

    One corpus aggregate for n and p_o; two tiny per-label marginal
    aggregates full-outer-joined on the label for p_e. Rows where
    either label is NULL are excluded. kappa is NULL when p_e = 1 (a
    degenerate single-label pair — agreement is vacuous). Output: one
    row (n, po, pe, kappa)."""
    g = df.select(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    base = g.agg(
        F.count("*").alias("_n"),
        F.avg((F.col("_a") == F.col("_b")).cast("double")).alias("_po"),
    )
    ma = g.groupBy(F.col("_a").alias("_k")).agg(F.count("*").alias("_ca"))
    mb = g.groupBy(F.col("_b").alias("_k")).agg(F.count("*").alias("_cb"))
    pe = (
        ma.join(mb, "_k", "full_outer")
        .crossJoin(F.broadcast(base))
        .agg(
            F.sum(
                F.coalesce("_ca", F.lit(0))
                * F.coalesce("_cb", F.lit(0))
                / (F.col("_n").cast("double") * F.col("_n"))
            ).alias("_pe")
        )
    )
    return base.crossJoin(F.broadcast(pe)).select(
        F.col("_n").alias("n"),
        F.col("_po").alias("po"),
        F.col("_pe").alias("pe"),
        F.when(
            F.col("_pe") < 1.0,
            (F.col("_po") - F.col("_pe")) / (1.0 - F.col("_pe")),
        ).alias("kappa"),
    )


def calibration_report(
    df: DataFrame, prob_col: str, label_col: str, bins: int = 10
) -> DataFrame:
    """Reliability diagram + expected calibration error (Naeini et al.
    2015 ECE): scores in [0,1] bucket into ``bins`` fixed-width bins;
    per bin the mean predicted probability (confidence) vs the observed
    positive rate (accuracy), and ``ECE = Σ (n_b/N)·|acc_b − conf_b|``
    as a final '__ece__' row (the skew_report summary-row convention).
    Output: (kind, bin, n, conf, acc, gap) — gap is |acc − conf| per
    bin and the ECE itself on the summary row. One corpus aggregate to
    ``bins`` rows; everything after is bin-sized."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    p = F.col(prob_col).cast("double")
    g = df.select(
        p.alias("_p"), F.col(label_col).cast("boolean").alias("_y")
    ).filter(F.col("_p").isNotNull() & F.col("_y").isNotNull())
    # clamp BOTH sides: p=1.0 belongs to the top bin, and out-of-contract
    # scores (p<0, p>1 — the docstring says [0,1] but a buggy upstream
    # model is exactly when you run this audit) land in the edge bins
    # instead of minting negative bin ids / spurious rows (ADVICE r9)
    binned = g.select(
        F.greatest(
            F.lit(0), F.least(F.lit(bins - 1), F.floor(F.col("_p") * bins))
        )
        .cast("long")
        .alias("bin"),
        "_p",
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.avg("_p").alias("conf"),
        F.avg(F.col("_y").cast("double")).alias("acc"),
    )
    per = per.select(
        F.lit("bin").alias("kind"),
        "bin",
        "n",
        "conf",
        "acc",
        F.abs(F.col("acc") - F.col("conf")).alias("gap"),
    )
    tot = per.agg(
        F.lit("__ece__").alias("kind"),
        F.lit(None).cast("long").alias("bin"),
        F.sum("n").alias("n"),
        F.lit(None).cast("double").alias("conf"),
        F.lit(None).cast("double").alias("acc"),
        (F.sum(F.col("n") * F.col("gap")) / F.sum("n")).alias("gap"),
    )
    return per.unionByName(tot)


def chi2_independence(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, with Cramér's V effect size — the "are these two labels
    actually related" audit (lang × source, label × split, …) run
    before stratifying or rebalancing on a pair of columns.

    ``chi2 = Σ_cells (o − e)²/e`` over the FULL |A|×|B| grid with
    ``e = row_marginal·col_marginal/n`` — absent cells (o = 0) still
    contribute their e term (the Benford absent-class lesson).
    ``V = sqrt(chi2 / (n·min(|A|−1, |B|−1)))`` (Cramér 1946), in [0,1].
    dof = (|A|−1)(|B|−1).

    Scale shape: two label-marginal aggregates + one cell aggregate; the
    grid is marginal-cross-marginal (label-cardinality-sized, broadcast)
    left-joined with observed cells — never a corpus-sized join. Rows
    where either label is NULL are excluded. Output: one row
    (n, dof, chi2, cramers_v); NULL stats when either column is
    constant (dof = 0 — independence is vacuous)."""
    g = df.select(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    o = g.groupBy("_a", "_b").agg(F.count("*").alias("_o"))
    ma = o.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    mb = o.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    tot = o.agg(F.sum("_o").cast("double").alias("_n"))
    grid = (
        ma.crossJoin(F.broadcast(mb))
        .join(o, ["_a", "_b"], "left")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("_ra") * F.col("_cb") / F.col("_n")
    cell = F.pow(F.coalesce(F.col("_o"), F.lit(0)) - e, 2) / e
    ka = ma.agg(F.count("*").alias("_ka"))
    kb = mb.agg(F.count("*").alias("_kb"))
    agg = grid.agg(
        F.first("_n").cast("long").alias("n"),
        F.sum(cell).alias("_chi2"),
    )
    out = agg.crossJoin(F.broadcast(ka)).crossJoin(F.broadcast(kb))
    dof = (F.col("_ka") - 1) * (F.col("_kb") - 1)
    kmin = F.least(F.col("_ka"), F.col("_kb")) - 1
    return out.select(
        "n",
        dof.cast("long").alias("dof"),
        F.when(dof > 0, F.col("_chi2")).alias("chi2"),
        F.when(
            dof > 0, F.sqrt(F.col("_chi2") / (F.col("n") * kmin))
        ).alias("cramers_v"),
    )


def mutual_information(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    the sqrt-normalized form ``nmi = MI / sqrt(H_a·H_b)`` (Strehl &
    Ghosh 2002) — the redundancy audit: nmi ≈ 1 means one label is a
    relabeling of the other (keep one), ≈ 0 means independent strata.

    ``MI = Σ_{observed cells} p_ab · ln(p_ab / (p_a·p_b))`` — zero
    cells contribute exactly 0 (lim x→0 x·ln x = 0), so unlike chi²
    the observed-cell relation IS the full sum. Same bounded shape:
    cell + marginal aggregates, broadcast joins, one output row
    (n, h_a, h_b, mi, nmi); nmi is NULL when either entropy is 0 (a
    constant column carries no information to share)."""
    g = df.select(
        F.col(a_col).cast("string").alias("_a"),
        F.col(b_col).cast("string").alias("_b"),
    ).filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
    o = g.groupBy("_a", "_b").agg(F.count("*").alias("_o"))
    ma = o.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    mb = o.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    tot = o.agg(F.sum("_o").cast("double").alias("_n"))
    ha = ma.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            (F.col("_ra") / F.col("_n")) * F.log(F.col("_ra") / F.col("_n"))
        )).alias("_ha")
    )
    hb = mb.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            (F.col("_cb") / F.col("_n")) * F.log(F.col("_cb") / F.col("_n"))
        )).alias("_hb")
    )
    cells = (
        o.join(F.broadcast(ma), "_a")
        .join(F.broadcast(mb), "_b")
        .crossJoin(F.broadcast(tot))
    )
    p_ab = F.col("_o") / F.col("_n")
    mi = cells.agg(
        F.first("_n").cast("long").alias("n"),
        F.sum(
            p_ab
            * F.log(p_ab / ((F.col("_ra") / F.col("_n")) * (F.col("_cb") / F.col("_n"))))
        ).alias("_mi"),
    )
    out = mi.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    return out.select(
        "n",
        F.col("_ha").alias("h_a"),
        F.col("_hb").alias("h_b"),
        F.col("_mi").alias("mi"),
        F.when(
            (F.col("_ha") > 0) & (F.col("_hb") > 0),
            F.col("_mi") / F.sqrt(F.col("_ha") * F.col("_hb")),
        ).alias("nmi"),
    )


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    item_col: str,
    rel_col: str,
    score_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group NDCG@k (Järvelin & Kekäläinen 2002) of the ranking the
    ``score_col`` induces against graded ``rel_col`` ground truth:
    ``DCG@k = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1)`` over the score
    ordering, normalized by the ideal (relevance-sorted) DCG@k. Groups
    whose ideal DCG is 0 (no relevant items) return NULL.

    Both orderings tie-break on ``item_col`` — REQUIRED for a
    deterministic metric (score ties are common when scores are model
    logits rounded to few decimals; an undefined tie order would make
    the metric run-dependent). All windows are PARTITIONED by the group
    — per-group ranking is embarrassingly parallel, nothing global.
    Output: (group, ndcg) one row per group.
    """
    w_score = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(item_col).asc()
    )
    w_ideal = Window.partitionBy(group_col).orderBy(
        F.col(rel_col).desc(), F.col(item_col).asc()
    )
    gain = F.pow(F.lit(2.0), F.col(rel_col)) - 1
    ranked = df.select(
        F.col(group_col).alias("__g"),
        F.row_number().over(w_score).alias("__r"),
        F.row_number().over(w_ideal).alias("__ri"),
        gain.alias("__gain"),
    )
    return (
        ranked.groupBy(F.col("__g").alias(group_col))
        .agg(
            F.sum(
                F.when(
                    F.col("__r") <= k, F.col("__gain") / F.log2(F.col("__r") + 1)
                ).otherwise(0.0)
            ).alias("__dcg"),
            F.sum(
                F.when(
                    F.col("__ri") <= k, F.col("__gain") / F.log2(F.col("__ri") + 1)
                ).otherwise(0.0)
            ).alias("__idcg"),
        )
        .select(
            group_col,
            F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg")).alias(
                "ndcg"
            ),
        )
    )


def _fractional_ranks(
    df: DataFrame, val_col: str, out_col: str, group_col: str | None
) -> DataFrame:
    """Average (midrank) fractional ranks of ``val_col`` (per group):
    rank(v) = #{x < v} + (#{x = v} + 1)/2 — the tie convention Spearman
    requires. Built scale-safe: one groupBy to the per-distinct-value
    relation, one partitioned_prefix_sum over the value order for the
    strictly-below counts (value cardinality, never corpus size, and no
    single-partition stage), one hash join back. NULL values get NULL
    ranks (excluded upstream)."""
    from swivel_spark_prep_spark.cache import track_persist

    gcols = [group_col] if group_col else []
    # persisted (round 16, guide §5): df feeds BOTH the per-value count
    # aggregate and the rank join-back below, so its lineage — often a
    # corpus scan, sometimes a whole previous rank pass (spearman chains
    # two) — would otherwise execute twice per call.
    df = track_persist(df)
    counts = df.groupBy(*gcols, val_col).agg(F.count("*").alias("__cnt"))
    cum = partitioned_prefix_sum(
        counts,
        order_cols=[val_col],
        value_cols="__cnt",
        out_cols=["__below"],
        group_cols=gcols or None,
    )
    ranks = cum.select(
        *gcols,
        val_col,
        (F.col("__below") + (F.col("__cnt") + 1) / 2.0).alias(out_col),
    )
    return df.join(ranks, [*gcols, val_col])


def spearman_corr(
    df: DataFrame,
    a_col: str,
    b_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Spearman rank correlation ρ between two columns (per group):
    Pearson correlation of the midrank-transformed values — the
    tie-correct general form, not the 6Σd²/n(n²−1) shortcut (which is
    only valid with no ties). Rows with a NULL in either column are
    excluded (pairwise-complete, the convention of R's cor and
    pandas .corr).

    Scale design: each rank transform is value-cardinality work on the
    two-pass prefix-sum primitive (no global window — the binary_auc /
    ks_test discipline), and the final Pearson is one aggregate from
    guarded raw moments (NULL on zero rank variance, matching SQL CORR
    on constant input under ANSI mode). Output: one row (or one per
    group): (group?, n, rho).
    """
    from swivel_spark_prep_spark.cache import track_persist

    gcols = [group_col] if group_col else []
    base = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()).select(
        *gcols, F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    )
    # Round 17 (guide §1.2 — shuffle value-cardinality cells, not rows):
    # the old form ran TWO _fractional_ranks passes over the full row
    # set, each persisting its input and joining ranks back to every
    # row (the second pass's input was the whole first join). Collapse
    # to the distinct (a, b) CELL relation first (one hash aggregate of
    # corpus rows); midranks are functions of the marginal value counts
    # alone, so both rank transforms and the final moments are
    # cell-sized. Numerically: ranks are identical (same marginal
    # counts), and the moment sums add the same quarter-integer values
    # (midranks are k/2, products k/4, cell counts integer) grouped by
    # cell instead of by row — exact in double at any n where the old
    # row sums were exact, and pinned against the DuckDB oracle at both
    # replay SFs (rho is rounded to 6 decimals in X169 on top).
    cells = track_persist(
        base.groupBy(*gcols, "__a", "__b").agg(F.count("*").alias("__c"))
    )

    def _cell_ranks(val, out):
        marg = cells.groupBy(*gcols, val).agg(F.sum("__c").alias("__cnt"))
        cum = partitioned_prefix_sum(
            marg,
            order_cols=[val],
            value_cols="__cnt",
            out_cols=["__below"],
            group_cols=gcols or None,
        )
        return cum.select(
            *gcols,
            val,
            (F.col("__below") + (F.col("__cnt") + 1) / 2.0).alias(out),
        )

    both = cells.join(_cell_ranks("__a", "__ra"), [*gcols, "__a"]).join(
        _cell_ranks("__b", "__rb"), [*gcols, "__b"]
    )
    c = F.col("__c").cast("double")
    moments = both.groupBy(*gcols).agg(
        F.sum("__c").alias("n"),
        F.sum(c * F.col("__ra")).alias("_sx"),
        F.sum(c * F.col("__rb")).alias("_sy"),
        F.sum(c * F.col("__ra") * F.col("__ra")).alias("_sxx"),
        F.sum(c * F.col("__rb") * F.col("__rb")).alias("_syy"),
        F.sum(c * F.col("__ra") * F.col("__rb")).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    den2 = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")) * (
        n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    )
    return moments.select(
        *gcols,
        "n",
        F.when(
            den2 > 0,
            (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / F.sqrt(den2),
        ).alias("rho"),
    )


def embedding_class_scatter(
    embs: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Class-separability audit for an embedding column — the Fisher
    scatter decomposition (trace form of Fisher 1936 / standard
    one-way MANOVA): total sum-of-squares splits exactly into

        within_ss  = Σ_l Σ_d ‖x_d − c_l‖²     (cohesion of each class)
        between_ss = Σ_l n_l · ‖c_l − g‖²     (separation of centroids)

    with F = (between/(k−1)) / (within/(N−k)) — the one-number answer
    to "do these embeddings separate my labels at all?" before anyone
    trains a probe on them. Everything is two grouped aggregates over
    the (label, dim, x) exploded relation: per-(label, dim) raw moments
    (n, Σx, Σx²), then per-dim global sums — centroids are never
    materialized per row, there is no pairwise anything, and the
    relation peaks at N·dim rows straight off the scan (the same
    explode the PCA fit uses). One output row:
    (n_docs, n_labels, dim, within_ss, between_ss, fisher_f).

    Dimensions must be uniform (they are, per the embeddings fixture);
    NULL labels/vectors are excluded. fisher_f is NULL when k < 2 or
    N ≤ k (zero denominator degrees of freedom).
    """
    ex = (
        embs.filter(F.col(label_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(label_col).cast("string").alias("l"),
            F.posexplode(F.transform(vec_col, lambda x: x.cast("double"))).alias(
                "j", "x"
            ),
        )
    )
    per = ex.groupBy("l", "j").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    glob = per.groupBy("j").agg(
        F.sum("s").alias("gs"), F.sum("n").alias("gn")
    )
    cells = per.join(glob, "j")
    return cells.agg(
        F.max("gn").cast("long").alias("n_docs"),
        F.countDistinct("l").alias("n_labels"),
        (F.max("j") + 1).cast("long").alias("dim"),
        F.sum(F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias("__w"),
        F.sum(
            F.col("n")
            * F.pow(F.col("s") / F.col("n") - F.col("gs") / F.col("gn"), 2)
        ).alias("__b"),
    ).select(
        "n_docs",
        "n_labels",
        "dim",
        F.round("__w", 6).alias("within_ss"),
        F.round("__b", 6).alias("between_ss"),
        F.round(
            F.when(
                (F.col("n_labels") > 1) & (F.col("n_docs") > F.col("n_labels")),
                (F.col("__b") / (F.col("n_labels") - 1))
                / (F.col("__w") / (F.col("n_docs") - F.col("n_labels"))),
            ),
            6,
        ).alias("fisher_f"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Average precision (area under the precision–recall curve in its
    step form — the scikit-learn ``average_precision_score``
    definition): thresholds at every DISTINCT score descending,

        AP = Σ_s (ΔR_s) · P_s = Σ_s (np_s / N_pos) · (ctp_s / call_s)

    where ctp/call are the INCLUSIVE running positive/total counts from
    the top of the ranking. The complement of :func:`binary_auc` for
    imbalanced classes: AUC answers "do positives outrank negatives",
    AP answers "how clean is the head of the ranking" — the metric a
    precision-oriented curation filter is actually tuned on.

    Same execution shape as binary_auc: one aggregate collapses the
    corpus to per-distinct-score (np, nn) counts, then the two-pass
    range-partitioned prefix sum (operators/ranks) provides the running
    totals with no single-task sort even for a continuous score.
    Ties share one threshold (a tie block contributes once, at the
    block's cumulative precision) — deterministic with no tie-order
    dependence, exactly as the step-curve definition prescribes.
    Output: (n_pos, n, ap) — or per group with ``group_col`` (NULL
    group is a group). ap is NULL when the group has no positives.
    """
    gcols = [group_col] if group_col else []
    g = df.select(
        *gcols,
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    c = g.groupBy(*gcols, "_s").agg(
        F.sum(F.col("_y").cast("long")).alias("_np"),
        F.count("*").alias("_nt"),
    )
    cum = partitioned_prefix_sum(
        c.withColumn("_o", -F.col("_s")),
        ["_o"],
        ["_np", "_nt"],
        ["_ctp", "_call"],
        group_cols=gcols,
        inclusive=True,
    )
    aggs = [
        F.sum("_np").alias("n_pos"),
        F.sum("_nt").alias("n"),
        F.when(
            F.sum("_np") > 0,
            F.sum(F.col("_np") * (F.col("_ctp") / F.col("_call")))
            / F.sum("_np"),
        ).alias("ap"),
    ]
    return cum.groupBy(group_col).agg(*aggs) if group_col else cum.agg(*aggs)


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Isotonic (monotone) calibration map via pool-adjacent-violators
    (Ayer et al. 1955; the Zadrozny–Elkan 2002 classifier-calibration
    use): the least-squares NON-DECREASING fit of label rate to score.
    Returns the MAPPING relation (group, score, n, y_rate, calibrated)
    — one row per distinct score — which callers range-join or
    broadcast back onto the corpus; returning the map instead of
    rewriting the rows keeps the expensive side a pure aggregate.

    Execution: one grouped aggregate collapses the corpus to
    per-(group, distinct score) (n, Σy) — corpus-sized work ends here —
    then PAV runs per group via Arrow grouped-map over the
    score-cardinality relation. PAV is inherently sequential (each pool
    may merge with its left neighbor transitively), so the per-group
    map must fit one task: for CONTINUOUS scores quantile-bin first
    (equidepth_histogram or F.round) — the standard practice anyway,
    and the same per-entity-fits-one-task contract ewma_grouped_map
    documents. The '__all__' placeholder group is used when no
    ``group_col`` is given.
    """
    gcol = group_col or "__g"
    base = df.select(
        (F.col(group_col) if group_col else F.lit("__all__")).alias(gcol),
        F.col(score_col).cast("double").alias("score"),
        F.col(label_col).cast("double").alias("_y"),
    ).filter(F.col("score").isNotNull() & F.col("_y").isNotNull())
    agg = base.groupBy(gcol, "score").agg(
        F.count("*").alias("n"), F.avg("_y").alias("y_rate")
    )
    schema = (
        f"`{gcol}` string, score double, n long, y_rate double, calibrated double"
    )

    def _pav(pdf):
        pdf = pdf.sort_values("score").reset_index(drop=True)
        vals: list = []
        wts: list = []
        sizes: list = []
        for y, w in zip(pdf["y_rate"], pdf["n"]):
            vals.append(float(y))
            wts.append(float(w))
            sizes.append(1)
            while len(vals) > 1 and vals[-2] > vals[-1]:
                tot = wts[-1] + wts[-2]
                vals[-2] = (vals[-1] * wts[-1] + vals[-2] * wts[-2]) / tot
                wts[-2] = tot
                sizes[-2] += sizes[-1]
                del vals[-1], wts[-1], sizes[-1]
        out = []
        for v, k in zip(vals, sizes):
            out.extend([v] * k)
        pdf["calibrated"] = out
        return pdf

    return (
        agg.withColumn(gcol, F.col(gcol).cast("string"))
        .groupBy(gcol)
        .applyInPandas(_pav, schema)
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic (Welch 1947) —
    "did the mean move between these two slices" with no
    equal-variance assumption, the safe default for A/B checks on
    corpus metrics. ONE grouped aggregate produces both slices' raw
    moments; everything after is scalar arithmetic on a 2-row relation
    (sample variance from Σx² − n·x̄², the same guarded-moment form
    the autocorrelation operator uses):

        t  = (x̄_a − x̄_b) / √(s²_a/n_a + s²_b/n_b)
        df = (s²_a/n_a + s²_b/n_b)² / Σ (s²_g/n_g)²/(n_g − 1)

    Output: one row (n_a, mean_a, n_b, mean_b, mean_diff, t_stat,
    df_welch); t/df are NULL when either slice has < 2 rows or both
    variances are 0. The p-value is erf territory — compare |t|
    against the t critical value for df_welch caller-side.
    """
    g = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).cast("double").alias("_x")
    ).filter(F.col("_x").isNotNull() & F.col("_g").isin([group_a, group_b]))
    per = g.groupBy("_g").agg(
        F.count("*").cast("double").alias("n"),
        F.avg("_x").alias("m"),
        F.sum(F.col("_x") * F.col("_x")).alias("ss"),
    )
    a = per.filter(F.col("_g") == group_a).select(
        F.col("n").alias("na"), F.col("m").alias("ma"), F.col("ss").alias("sa")
    )
    b = per.filter(F.col("_g") == group_b).select(
        F.col("n").alias("nb"), F.col("m").alias("mb"), F.col("ss").alias("sb")
    )
    j = a.crossJoin(F.broadcast(b))
    va = (F.col("sa") - F.col("na") * F.col("ma") * F.col("ma")) / (F.col("na") - 1)
    vb = (F.col("sb") - F.col("nb") * F.col("mb") * F.col("mb")) / (F.col("nb") - 1)
    se2 = va / F.col("na") + vb / F.col("nb")
    ok = (F.col("na") > 1) & (F.col("nb") > 1) & (se2 > 0)
    t = F.when(ok, (F.col("ma") - F.col("mb")) / F.sqrt(se2))
    dfw = F.when(
        ok,
        F.pow(se2, 2)
        / (
            F.pow(va / F.col("na"), 2) / (F.col("na") - 1)
            + F.pow(vb / F.col("nb"), 2) / (F.col("nb") - 1)
        ),
    )
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.round("ma", 6).alias("mean_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round("mb", 6).alias("mean_b"),
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(dfw, 6).alias("df_welch"),
    )


def anova_oneway(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """One-way ANOVA (Fisher): does the mean differ across k slices —
    the k-group generalization of :func:`welch_ttest` (equal-variance
    form; for k = 2 it squares the pooled t). The decomposition

        SS_between = Σ_g n_g (x̄_g − x̄)²,  SS_within = Σ_g Σ (x − x̄_g)²
        F = (SS_between/(k−1)) / (SS_within/(N−k)),  η² = SSB/(SSB+SSW)

    is computed entirely from per-group raw moments (n, Σx, Σx²): one
    grouped aggregate to the k-row relation, one 1-row aggregate over
    it — no second data pass, no window. η² (effect size) answers "how
    much of the variance the slicing explains" independent of N.
    Output: one row (k, n, ss_between, ss_within, f_stat, eta_sq);
    f_stat NULL when k < 2, N ≤ k, or SS_within = 0 (η² still
    reported). NULL values/groups are excluded.
    """
    per = (
        df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).cast("double").alias("_x"),
        )
        .filter(F.col("_x").isNotNull() & F.col("_g").isNotNull())
        .groupBy("_g")
        .agg(
            F.count("*").cast("double").alias("_n"),
            F.sum("_x").alias("_s"),
            F.sum(F.col("_x") * F.col("_x")).alias("_ss"),
        )
    )
    tot = per.agg(
        F.count("*").alias("k"),
        F.sum("_n").alias("_N"),
        F.sum("_s").alias("_S"),
        # Σ s_g²/n_g: the between-group raw term
        F.sum(F.col("_s") * F.col("_s") / F.col("_n")).alias("_B"),
        F.sum("_ss").alias("_SS"),
    )
    ssb = F.col("_B") - F.col("_S") * F.col("_S") / F.col("_N")
    ssw = F.col("_SS") - F.col("_B")
    ok = (F.col("k") > 1) & (F.col("_N") > F.col("k")) & (ssw > 0)
    fstat = F.when(
        ok, (ssb / (F.col("k") - 1)) / (ssw / (F.col("_N") - F.col("k")))
    )
    eta = F.when(ssb + ssw > 0, ssb / (ssb + ssw))
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("_N").cast("long").alias("n"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(fstat, 6).alias("f_stat"),
        F.round(eta, 6).alias("eta_sq"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann–Whitney–Wilcoxon rank-sum test (Mann & Whitney 1947) — the
    distribution-free "did this slice's values shift" companion to
    welch_ttest (which assumes means are the story; U detects any
    stochastic dominance), plus Cliff's δ = P(a > b) − P(a < b), the
    rank effect size δ = 2U_a/(n_a·n_b) − 1.

    Scale design: U needs only the per-group RANK SUM of the pooled
    midranks — the midrank transform is the same value-cardinality
    partitioned_prefix_sum pass Spearman uses (no global window), the
    tie-correction term Σ(t³−t) is one aggregate over the distinct-
    value relation, and everything downstream is arithmetic on a
    2-row relation. Normal approximation with continuity correction:

        z = (U_a − n_a·n_b/2 ∓ 0.5) / σ,
        σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))

    Output: one row (n_a, n_b, u_a, u_b, z, cliffs_delta); z NULL when
    σ = 0 (all values tied) or either slice is empty.
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull() & F.col("_g").isin([group_a, group_b]))
    ranked = _fractional_ranks(base, "_x", "_r", None)
    per = ranked.groupBy("_g").agg(
        F.count("*").cast("double").alias("n"), F.sum("_r").alias("rsum")
    )
    a = per.filter(F.col("_g") == group_a).select(
        F.col("n").alias("na"), F.col("rsum").alias("ra")
    )
    b = per.filter(F.col("_g") == group_b).select(F.col("n").alias("nb"))
    ties = (
        base.groupBy("_x")
        .agg(F.count("*").cast("double").alias("_t"))
        .agg(
            F.sum(
                F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")
            ).alias("tie3")
        )
    )
    j = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(ties))
    na, nb = F.col("na"), F.col("nb")
    n = na + nb
    ua = F.col("ra") - na * (na + 1) / 2.0
    ub = na * nb - ua
    mu = na * nb / 2.0
    sig2 = (na * nb / 12.0) * ((n + 1) - F.col("tie3") / (n * (n - 1)))
    # continuity correction toward the mean
    cc = F.when(ua > mu, ua - mu - 0.5).when(ua < mu, ua - mu + 0.5).otherwise(
        F.lit(0.0)
    )
    z = F.when((sig2 > 0) & (na > 0) & (nb > 0), cc / F.sqrt(sig2))
    delta = F.when(na * nb > 0, 2.0 * ua / (na * nb) - 1.0)
    return j.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(ua, 6).alias("u_a"),
        F.round(ub, 6).alias("u_b"),
        F.round(z, 6).alias("z"),
        F.round(delta, 6).alias("cliffs_delta"),
    )


def cuped_uplift(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """CUPED variance-reduced uplift (Deng, Xu, Kohavi & Walker, WSDM
    2013): adjust the experiment metric y by a pre-experiment covariate
    x before differencing —

        θ = cov(x, y)/var(x)   (pooled, pre-assignment so unbiased),
        ŷ_g = ȳ_g − θ·(x̄_g − x̄),   uplift = ŷ_a − ŷ_b

    — cutting the uplift's variance by ρ²(x,y) (often 40–70% when x is
    last period's value of the same metric), i.e. the same experiment
    sensitivity at half the sample. The whole computation is raw
    moments: ONE grouped aggregate produces both slices' (n, Σx, Σy),
    one pooled aggregate produces θ and x̄ from (Σx, Σy, Σxx, Σxy) —
    no second data pass, 1-row-relation arithmetic after. Output: one
    row (n_a, n_b, mean_a, mean_b, diff_raw, theta, adj_mean_a,
    adj_mean_b, diff_cuped, corr_xy, var_reduction = ρ²); θ/adjusted
    fields NULL when var(x) = 0. Rows with NULL in either column are
    excluded.
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(metric_col).cast("double").alias("_y"),
        F.col(covariate_col).cast("double").alias("_x"),
    ).filter(
        F.col("_y").isNotNull()
        & F.col("_x").isNotNull()
        & F.col("_g").isin([group_a, group_b])
    )
    from swivel_spark_prep_spark.cache import track_persist

    base = track_persist(base)
    pool = base.agg(
        F.count("*").cast("double").alias("N"),
        F.sum("_x").alias("Sx"),
        F.sum("_y").alias("Sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("Sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("Syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("Sxy"),
    )
    per = base.groupBy("_g").agg(
        F.count("*").cast("double").alias("n"),
        F.avg("_y").alias("my"),
        F.avg("_x").alias("mx"),
    )
    a = per.filter(F.col("_g") == group_a).select(
        F.col("n").alias("na"), F.col("my").alias("mya"), F.col("mx").alias("mxa")
    )
    b = per.filter(F.col("_g") == group_b).select(
        F.col("n").alias("nb"), F.col("my").alias("myb"), F.col("mx").alias("mxb")
    )
    j = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(pool))
    N = F.col("N")
    vx = N * F.col("Sxx") - F.col("Sx") * F.col("Sx")
    vy = N * F.col("Syy") - F.col("Sy") * F.col("Sy")
    cxy = N * F.col("Sxy") - F.col("Sx") * F.col("Sy")
    theta = F.when(vx > 0, cxy / vx)
    xbar = F.col("Sx") / N
    adj_a = F.col("mya") - theta * (F.col("mxa") - xbar)
    adj_b = F.col("myb") - theta * (F.col("mxb") - xbar)
    rho2 = F.when((vx > 0) & (vy > 0), cxy * cxy / (vx * vy))
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round("mya", 6).alias("mean_a"),
        F.round("myb", 6).alias("mean_b"),
        F.round(F.col("mya") - F.col("myb"), 6).alias("diff_raw"),
        F.round(theta, 6).alias("theta"),
        F.round(adj_a, 6).alias("adj_mean_a"),
        F.round(adj_b, 6).alias("adj_mean_b"),
        F.round(adj_a - adj_b, 6).alias("diff_cuped"),
        F.round(F.when(rho2.isNotNull(), F.sqrt(rho2) * F.signum(cxy)), 6).alias(
            "corr_xy"
        ),
        F.round(rho2, 6).alias("var_reduction"),
    )


def kruskal_wallis(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Kruskal–Wallis H test (Kruskal & Wallis 1952) — the k-group
    rank-based one-way ANOVA: does at least one group's value
    distribution stochastically dominate? The distribution-free
    companion to :func:`anova_oneway` exactly as :func:`mann_whitney_u`
    is to :func:`welch_ttest` (and H reduces to the two-group
    rank-sum for k = 2):

        H = 12/(N(N+1)) · Σ R_g²/n_g − 3(N+1)

    with the tie correction C = 1 − Σ(t³−t)/(N³−N), H_adj = H/C, and
    ε² = H/(N−1) as the effect size (Kelley's epsilon-squared).

    Scale shape: pooled midranks ride the same value-cardinality
    partitioned_prefix_sum pass Spearman/Mann–Whitney use (no global
    window); per-group rank sums are one grouped aggregate; the tie
    term is one aggregate over the distinct-value relation; the final
    algebra runs on a k-row relation joined to two 1-row broadcasts.
    Output (1 row): k, n, h, h_adj, epsilon_sq — h_adj NULL when every
    value is tied (C = 0), h NULL when N < 2 or k < 2.
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull() & F.col("_g").isNotNull())
    ranked = _fractional_ranks(base, "_x", "_r", None)
    per = ranked.groupBy("_g").agg(
        F.count("*").cast("double").alias("ng"), F.sum("_r").alias("rg")
    )
    stat = per.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("ng").alias("N"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("rr"),
    )
    ties = (
        base.groupBy("_x")
        .agg(F.count("*").cast("double").alias("_t"))
        .agg(
            F.sum(
                F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")
            ).alias("tie3")
        )
    )
    j = stat.crossJoin(F.broadcast(ties))
    N = F.col("N")
    h = F.when(
        (N > 1) & (F.col("k") > 1),
        12.0 / (N * (N + 1)) * F.col("rr") - 3.0 * (N + 1),
    )
    corr = 1.0 - F.col("tie3") / (N * N * N - N)
    return j.select(
        "k",
        N.cast("long").alias("n"),
        F.round(h, 6).alias("h"),
        F.round(F.when(corr > 0, h / corr), 6).alias("h_adj"),
        F.round(F.when(N > 1, h / (N - 1)), 6).alias("epsilon_sq"),
    )


def brier_decomposition(
    df: DataFrame, prob_col: str, label_col: str, bins: int = 10
) -> DataFrame:
    """Murphy decomposition of the Brier score (Brier 1950, Murphy
    1973) over fixed-width forecast bins — the "is my model sharp AND
    honest" audit behind :func:`calibration_report`'s ECE:

        BS  = (1/N)·Σ (p_i − y_i)²            (exact, unbinned)
        REL = (1/N)·Σ_k n_k (p̄_k − ō_k)²      (reliability: penalty)
        RES = (1/N)·Σ_k n_k (ō_k − ō)²        (resolution: reward)
        UNC = ō(1 − ō)                         (base-rate uncertainty)

    The textbook identity BS = REL − RES + UNC holds exactly only when
    forecasts are constant within a bin; the within-bin variance
    otherwise leaks into a residual, which is REPORTED rather than
    hidden: residual = BS − (REL − RES + UNC), so the decomposition is
    verifiable instead of approximately-true. Out-of-[0,1] scores clamp
    into the edge bins (the calibration_report convention).

    One corpus aggregate to ``bins`` rows of raw moments
    (n, Σp, Σy, Σ(p−y)²), one bins-row reduction — nothing after the
    first groupBy is corpus-sized. Output (1 row): n, brier,
    reliability, resolution, uncertainty, residual.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    p = F.col(prob_col).cast("double")
    g = df.select(
        p.alias("_p"), F.col(label_col).cast("int").cast("double").alias("_y")
    ).filter(F.col("_p").isNotNull() & F.col("_y").isNotNull())
    binned = g.select(
        F.greatest(
            F.lit(0), F.least(F.lit(bins - 1), F.floor(F.col("_p") * bins))
        )
        .cast("long")
        .alias("_b"),
        "_p",
        "_y",
    )
    per = binned.groupBy("_b").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("_p").alias("sp"),
        F.sum("_y").alias("sy"),
        F.sum((F.col("_p") - F.col("_y")) * (F.col("_p") - F.col("_y"))).alias(
            "se"
        ),
    )
    nk, sp, sy = F.col("n"), F.col("sp"), F.col("sy")
    tot = per.agg(
        F.sum("n").alias("N"),
        F.sum("se").alias("SE"),
        F.sum("sy").alias("SY"),
        F.sum(nk * (sp / nk - sy / nk) * (sp / nk - sy / nk)).alias("REL"),
        F.sum(nk * (sy / nk) * (sy / nk)).alias("SYY"),
    )
    N = F.col("N")
    obar = F.col("SY") / N
    brier = F.col("SE") / N
    rel = F.col("REL") / N
    # Σ n_k(ō_k − ō)² = Σ n_k ō_k² − N·ō²  (the grouped-moments form)
    res = (F.col("SYY") - N * obar * obar) / N
    unc = obar * (1.0 - obar)
    return tot.select(
        N.cast("long").alias("n"),
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(brier - (rel - res + unc), 6).alias("residual"),
    )


def mcnemar_test(df: DataFrame, a_correct_col: str, b_correct_col: str) -> DataFrame:
    """McNemar's test (McNemar 1947) on paired classifier outcomes —
    THE test for "is model A actually better than model B on the same
    examples" (marginal-accuracy deltas ignore the pairing; McNemar
    uses only the discordant pairs, where the two models disagree):

        χ² = (|b − c| − 1)² / (b + c)     (Edwards continuity correction)

    with b = #(A right, B wrong) and c = #(A wrong, B right). One
    corpus aggregate to a single contingency row — nothing else.
    Output (1 row): n, both_correct, a_only, b_only, both_wrong, chi2 —
    chi2 NULL when there are no discordant pairs (b + c = 0).
    """
    a = F.col(a_correct_col).cast("boolean")
    b = F.col(b_correct_col).cast("boolean")
    g = df.filter(a.isNotNull() & b.isNotNull())
    row = g.agg(
        F.count("*").alias("n"),
        F.sum((a & b).cast("long")).alias("both_correct"),
        F.sum((a & ~b).cast("long")).alias("a_only"),
        F.sum((~a & b).cast("long")).alias("b_only"),
        F.sum((~a & ~b).cast("long")).alias("both_wrong"),
    )
    bb, cc = F.col("a_only"), F.col("b_only")
    disc = bb + cc
    # clamp |b−c|−1 at 0: with b = c the correction would otherwise
    # manufacture χ² = 1/(b+c) out of a perfectly concordant margin
    num = F.greatest(F.abs(bb - cc) - 1, F.lit(0))
    chi2 = F.when(disc > 0, num * num / disc.cast("double"))
    return row.select(
        "n",
        "both_correct",
        "a_only",
        "b_only",
        "both_wrong",
        F.round(chi2, 6).alias("chi2"),
    )


def cochran_armitage(
    df: DataFrame, score_col: str, success_col: str
) -> DataFrame:
    """Cochran–Armitage test for trend (Cochran 1954, Armitage 1955):
    does a binary outcome's rate move MONOTONICALLY with an ordered
    exposure level? The dose-response test a plain k×2 chi² cannot
    express (chi² is order-blind; a clean upward trend and a zigzag
    score the same). Levels enter as their numeric scores s_i:

        T = Σ s_i·(r_i − n_i·p̄),    p̄ = R/N
        Var(T) = p̄(1−p̄)·(Σ s_i²n_i − (Σ s_i n_i)²/N)
        z = T/√Var,  χ² = z²  (1 dof)

    Positive z = the success rate RISES with the score. One grouped
    aggregate to the level-cardinality relation, one 1-row reduction —
    nothing after the first groupBy is corpus-sized. Output (1 row):
    k, n, successes, p_bar, z, chi2 — z NULL when Var = 0 (constant
    outcome or a single level).
    """
    base = df.select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(success_col).cast("int").cast("double").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    per = base.groupBy("_s").agg(
        F.count("*").cast("double").alias("n"), F.sum("_y").alias("r")
    )
    s, nn, r = F.col("_s"), F.col("n"), F.col("r")
    tot = per.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(nn).alias("N"),
        F.sum(r).alias("R"),
        F.sum(s * r).alias("sr"),
        F.sum(s * nn).alias("sn"),
        F.sum(s * s * nn).alias("ssn"),
    )
    N, R = F.col("N"), F.col("R")
    pbar = R / N
    t = F.col("sr") - F.col("sn") * pbar
    var = pbar * (1.0 - pbar) * (F.col("ssn") - F.col("sn") * F.col("sn") / N)
    z = F.when(var > 0, t / F.sqrt(var))
    return tot.select(
        "k",
        N.cast("long").alias("n"),
        R.cast("long").alias("successes"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(z, 6).alias("z"),
        F.round(F.when(var > 0, t * t / var), 6).alias("chi2"),
    )


def fleiss_kappa(df: DataFrame, item_col: str, category_col: str) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among
    a FIXED number n of raters per item (Cohen's kappa generalizes to
    exactly two rater COLUMNS; Fleiss to n anonymous raters in rows).
    Input: one row per (item, rating); with per-item×category counts
    n_ij and N items:

        P_i = (Σ_j n_ij² − n) / (n(n−1))       (per-item agreement)
        P̄  = mean_i P_i,   p_j = Σ_i n_ij/(N·n),   P_e = Σ_j p_j²
        κ  = (P̄ − P_e) / (1 − P_e)

    Fleiss' formula is UNDEFINED for varying raters-per-item, so the
    contract is executable (the heavyhitters refuse-don't-guess
    discipline): per-item totals reduce to a 2-row min/max control
    aggregate, and a mismatch raises ValueError rather than returning
    a silently wrong κ. Scale shape: one groupBy to (item, category)
    counts, one to per-item sums, one to the category-marginal
    relation — everything downstream is category-cardinality. Output
    (1 row): n_items, n_raters, p_bar, p_e, kappa — kappa NULL when
    P_e = 1 (single category: agreement is vacuous).
    """
    g = df.select(
        F.col(item_col).alias("_i"),
        F.col(category_col).cast("string").alias("_c"),
    ).filter(F.col("_i").isNotNull() & F.col("_c").isNotNull())
    cells = g.groupBy("_i", "_c").agg(F.count("*").cast("double").alias("_n"))
    per_item = cells.groupBy("_i").agg(
        F.sum("_n").alias("_tot"),
        F.sum(F.col("_n") * F.col("_n")).alias("_sq"),
    )
    # executable contract: constant raters-per-item (control aggregate,
    # 1 row — never data)
    chk = per_item.agg(
        F.min("_tot").alias("_lo"), F.max("_tot").alias("_hi")
    ).collect()[0]
    if chk["_lo"] is None:
        raise ValueError("fleiss_kappa: empty input")
    if chk["_lo"] != chk["_hi"]:
        raise ValueError(
            "fleiss_kappa requires a constant rater count per item; got "
            f"min={chk['_lo']:.0f} max={chk['_hi']:.0f}"
        )
    n = float(chk["_lo"])
    if n < 2:
        raise ValueError(f"fleiss_kappa needs >= 2 raters per item, got {n:.0f}")
    pbar_df = per_item.agg(
        F.count("*").cast("double").alias("_N"),
        F.avg((F.col("_sq") - n) / (n * (n - 1))).alias("_pbar"),
    )
    pe_df = cells.groupBy("_c").agg(F.sum("_n").alias("_cj"))
    pe = pe_df.crossJoin(F.broadcast(pbar_df)).agg(
        F.sum(
            (F.col("_cj") / (F.col("_N") * n))
            * (F.col("_cj") / (F.col("_N") * n))
        ).alias("_pe")
    )
    out = pbar_df.crossJoin(F.broadcast(pe))
    return out.select(
        F.col("_N").cast("long").alias("n_items"),
        F.lit(int(n)).cast("long").alias("n_raters"),
        F.round("_pbar", 6).alias("p_bar"),
        F.round("_pe", 6).alias("p_e"),
        F.round(
            F.when(
                F.col("_pe") < 1.0,
                (F.col("_pbar") - F.col("_pe")) / (1.0 - F.col("_pe")),
            ),
            6,
        ).alias("kappa"),
    )


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    rank_col: str,
    k: int,
    p: float = 0.9,
) -> DataFrame:
    """Truncated rank-biased overlap RBO@k (Webber, Moffat & Zobel
    TOIS 2010) between two ranked lists — the top-weighted "how
    similar are these two rankings" measure retrieval A/Bs use where
    Spearman/Kendall (uniform depth weighting, conjoint domains) do
    not apply:

        RBO@k = Σ_{d=1}^{k} (1−p)·p^{d−1} · |A_d ∩ B_d| / d

    An id at ranks (r_a, r_b) enters every depth d ≥ max(r_a, r_b),
    so its total contribution is the TAIL weight T(d₀) =
    Σ_{d=d₀}^{k} (1−p)p^{d−1}/d — which turns the depth loop into one
    k-bounded equi-join on id plus an element_at into a precomputed
    k-length literal. Both inputs are rank ≤ k lists by contract
    (rows outside [1, k] are filtered); p controls top-weight (p=0.9
    ≈ the top 10 dominate). Output (1 row): k, p, n_common, rbo —
    rbo ∈ [0, 1], and Σ_d weights telescope so two IDENTICAL lists
    give exactly Σ_{d≤k}(1−p)p^{d−1} (< 1: the truncation residual is
    the undecided tail, reported by construction, not hidden).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    w = [(1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    tails = [sum(w[d0 - 1:]) for d0 in range(1, k + 1)]
    aa = a.select(
        F.col(id_col).alias("_id"), F.col(rank_col).cast("long").alias("_ra")
    ).filter((F.col("_ra") >= 1) & (F.col("_ra") <= k))
    bb = b.select(
        F.col(id_col).alias("_id"), F.col(rank_col).cast("long").alias("_rb")
    ).filter((F.col("_rb") >= 1) & (F.col("_rb") <= k))
    j = aa.join(bb, "_id")
    d0 = F.greatest("_ra", "_rb").cast("int")
    wcol = F.element_at(F.array(*[F.lit(t) for t in tails]), d0)
    return j.agg(
        F.lit(int(k)).cast("long").alias("k"),
        F.lit(float(p)).alias("p"),
        F.count("*").alias("n_common"),
        F.round(F.coalesce(F.sum(wcol), F.lit(0.0)), 6).alias("rbo"),
    )


def bradley_terry(
    comparisons: DataFrame,
    winner_col: str,
    loser_col: str,
    iterations: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Bradley–Terry preference strengths via Hunter's MM algorithm
    (Hunter, Annals of Statistics 2004) — THE model for turning pairwise
    preference data (RLHF comparison datasets, A/B winner logs, model
    arenas) into a per-item strength scale:  P(i beats j) =
    p_i / (p_i + p_j),  fitted by the fixed-point update

        p_i ← W_i / Σ_j n_ij / (p_i + p_j)

    where W_i = total wins of i and n_ij = games between i and j,
    then rescaled each round to mean 1 (the likelihood is scale-free;
    a fixed scale keeps the iteration away from under/overflow and
    makes runs comparable).

    Scale design, mirroring :func:`~..graph.pagerank`: the corpus of
    raw comparisons collapses ONCE to the (i, j, games) relation —
    item-pair cardinality, not row cardinality — persisted and
    re-joined against the (item, p) relation (item cardinality) each
    round; every iteration is two equi-joins + one hash aggregate, and
    ``localCheckpoint`` truncates the doubling plan tree exactly as in
    pagerank. Items with zero wins converge to strength 0 in one step
    (the MLE boundary case); a pair with games > 0 always has a winner,
    so no denominator can hit 0 + 0.

    Output (one row per item): (item, strength, wins, games).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    from swivel_spark_prep_spark.cache import checkpoint_truncate, track_persist

    cmp_ = comparisons.select(
        F.col(winner_col).cast("string").alias("_i"),
        F.col(loser_col).cast("string").alias("_j"),
    ).filter(
        F.col("_i").isNotNull()
        & F.col("_j").isNotNull()
        & (F.col("_i") != F.col("_j"))
    )
    # ordered-pair win counts: item-pair cardinality from here on
    pw = cmp_.groupBy("_i", "_j").agg(F.count("*").cast("double").alias("_w"))
    pw = track_persist(pw)
    # games(i, j) = w(i, j) + w(j, i), materialized for BOTH directions
    games = track_persist(
        pw.unionByName(
            pw.select(
                F.col("_j").alias("_i"), F.col("_i").alias("_j"), "_w"
            )
        )
        .groupBy("_i", "_j")
        .agg(F.sum("_w").alias("_n"))
    )
    wins = pw.groupBy("_i").agg(F.sum("_w").alias("_W"))
    items = track_persist(
        games.select("_i").distinct().join(wins, "_i", "left").select(
            "_i",
            F.coalesce(F.col("_W"), F.lit(0.0)).alias("_W"),
            F.coalesce(F.col("_W"), F.lit(0.0)).cast("long").alias("_wl"),
        )
    )
    # n_items for the mean-1 rescale: one long on the driver (bounded —
    # the item relation, not the comparison corpus)
    n_items = float(items.count())
    if n_items == 0:
        raise ValueError("comparison relation is empty (no valid pairs)")

    p = items.select("_i", F.lit(1.0).alias("_p"))
    for _ in range(iterations):
        den = (
            games.join(p.select(F.col("_i").alias("_j"), F.col("_p").alias("_pj")), "_j")
            .join(p.select("_i", F.col("_p").alias("_pi")), "_i")
            .groupBy("_i")
            .agg(F.sum(F.col("_n") / (F.col("_pi") + F.col("_pj"))).alias("_den"))
        )
        # checkpoint RAW, not p (round 16): the old form checkpointed p,
        # so the den-join lineage executed TWICE per round — once
        # building the `total` broadcast and once inside the checkpoint.
        # Materializing raw runs the expensive games ⋈ p ⋈ p aggregate
        # once; `total` is then a tiny aggregate over the materialized
        # relation and p stays a lazy rescale on top of it (guide §1.2
        # "don't compute things twice"). The plan-tree/stats truncation
        # argument (pagerank; the BigInteger stats hang at 30
        # iterations) still holds: each round's chain roots at a fresh
        # checkpoint, so neither depth nor estimated sizeInBytes can
        # compound across rounds.
        raw = checkpoint_truncate(
            items.join(den, "_i").select(
                "_i", (F.col("_W") / F.col("_den")).alias("_p")
            )
        )
        total = raw.agg(F.sum("_p").alias("_tot"))
        p = raw.crossJoin(F.broadcast(total)).select(
            "_i", (F.col("_p") * F.lit(n_items) / F.col("_tot")).alias("_p")
        )

    gtot = games.groupBy("_i").agg(F.sum("_n").cast("long").alias("_g"))
    return (
        p.join(items.select("_i", "_wl"), "_i")
        .join(gtot, "_i")
        .select(
            F.col("_i").alias("item"),
            F.round("_p", round_to).alias("strength"),
            F.col("_wl").alias("wins"),
            F.col("_g").alias("games"),
        )
    )


def bradley_terry_oracle_sql(
    comparisons_sql: str,
    iterations: int = 8,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`bradley_terry`: the identical MM update
    unrolled into one CTE chain per iteration from the same parameters
    — parity pins the algorithm, not a fixture by-product.
    ``comparisons_sql`` must yield (w, l) winner/loser columns."""
    # AS MATERIALIZED throughout: each iteration references the previous
    # CTE multiple times; DuckDB's default inlining would re-expand the
    # chain exponentially (the k_core_oracle_sql precedent).
    parts = [
        f"WITH cmp AS MATERIALIZED ({comparisons_sql})",
        "pw AS MATERIALIZED (SELECT w AS i, l AS j, COUNT(*)::DOUBLE AS wn"
        " FROM cmp"
        " WHERE w IS NOT NULL AND l IS NOT NULL AND w <> l GROUP BY 1, 2)",
        "games AS MATERIALIZED (SELECT i, j, SUM(wn) AS n FROM"
        " (SELECT i, j, wn FROM pw UNION ALL SELECT j, i, wn FROM pw)"
        " GROUP BY 1, 2)",
        "wins AS MATERIALIZED (SELECT i, SUM(wn) AS w FROM pw GROUP BY 1)",
        "items AS MATERIALIZED (SELECT DISTINCT i FROM games)",
        "nit AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM items)",
        "p0 AS MATERIALIZED (SELECT i, 1.0 AS p FROM items)",
    ]
    for t in range(1, iterations + 1):
        prev = f"p{t - 1}"
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT g.i, SUM(g.n / (pi.p + pj.p)) AS den"
            f" FROM games g JOIN {prev} pi ON g.i = pi.i"
            f" JOIN {prev} pj ON g.j = pj.i GROUP BY 1)"
        )
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT d.i, COALESCE(w.w, 0) / d.den AS p"
            f" FROM d{t} d LEFT JOIN wins w ON d.i = w.i)"
        )
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT i, p * (SELECT n FROM nit)"
            f" / (SELECT SUM(p) FROM r{t}) AS p FROM r{t})"
        )
    last = f"p{iterations}"
    return (
        ",\n".join(parts)
        + f"""
SELECT {last}.i AS item, ROUND({last}.p, {round_to}) AS strength,
       COALESCE(wins.w, 0)::BIGINT AS wins,
       (SELECT SUM(n) FROM games g WHERE g.i = {last}.i)::BIGINT AS games
FROM {last} LEFT JOIN wins ON {last}.i = wins.i;"""
    )


def simplified_silhouette(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Simplified silhouette coefficient per cluster (Hruschka et al.'s
    centroid variant of Rousseeuw 1987): a(x) = distance to the OWN
    cluster centroid, b(x) = min distance to any other centroid,
    s(x) = (b − a) / max(a, b) — the O(n·k) cluster-quality score
    (full silhouette is O(n²) pairwise and unusable at corpus scale;
    the centroid form is what MLlib's ClusteringEvaluator computes).

    Fully relational, no driver-side centroids: posexplode each vector
    ONCE to (row, dim, val); centroids are the (label, dim) mean
    relation (k·d rows, broadcast); per-(row, candidate-centroid)
    squared distances come from one hash aggregate over the dim join.
    Work = n·k·d — linear in rows for bounded k, the same shape as one
    k-means assignment step. Rows with NULL label/vector are excluded.

    Output (one row per cluster): (label, n, mean_silhouette), where
    mean_silhouette uses s = 0 when max(a, b) = 0 (a point exactly on
    its lone centroid).
    """
    base = emb.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_l"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_pos", "_val"),
    ).filter(F.col("_l").isNotNull())
    cent = base.groupBy(F.col("_l").alias("_cl"), "_pos").agg(
        F.avg("_val").alias("_m")
    )
    d2 = (
        base.join(F.broadcast(cent), "_pos")
        .groupBy("_id", "_l", "_cl")
        .agg(F.sum((F.col("_val") - F.col("_m")) ** 2).alias("_d2"))
    )
    a = d2.filter(F.col("_l") == F.col("_cl")).select(
        "_id", "_l", F.sqrt("_d2").alias("_da")
    )
    b = (
        d2.filter(F.col("_l") != F.col("_cl"))
        .groupBy("_id", "_l")
        .agg(F.sqrt(F.min("_d2")).alias("_db"))
    )
    mx = F.greatest("_da", "_db")
    s = a.join(b, ["_id", "_l"]).select(
        "_l",
        F.when(mx == 0, F.lit(0.0))
        .otherwise((F.col("_db") - F.col("_da")) / mx)
        .alias("_s"),
    )
    return s.groupBy(F.col("_l").alias("label")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("_s"), 6).alias("mean_silhouette"),
    )


def conformal_interval(
    cal: DataFrame,
    test: DataFrame,
    value_col: str,
    pred_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal prediction interval (Papadopoulos et al. 2002,
    Vovk's inductive conformal): from a CALIBRATION set's absolute
    residuals r = |y − ŷ|, the half-width

        q̂ = r_(⌈(1−α)(n_cal+1)⌉)   (the k-th smallest residual)

    gives ŷ ± q̂ with finite-sample marginal coverage ≥ 1 − α for ANY
    predictor — distribution-free. Reported against the TEST set:
    empirical coverage = fraction of |y − ŷ| ≤ q̂.

    The order statistic rides the scale-safe shape: distinct-residual
    counts → one inclusive :func:`~..ranks.partitioned_prefix_sum` in
    residual order → filter cum ≥ k → min (never a global sort or an
    unpartitioned window over the corpus). k > n_cal (calibration set
    too small for the requested α) yields the honest degenerate answer:
    q_hat NULL, coverage 1.0 (the infinite interval).

    Output (1 row): (n_cal, n_test, alpha, q_hat, coverage).
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from swivel_spark_prep_spark.cache import track_persist

    # persisted: the calibration residual relation feeds BOTH the
    # distinct-residual counts and the n_cal count — without the persist
    # the calibration scan + residual projection runs twice (guide §5)
    res = track_persist(
        cal.select(
            F.abs(F.col(value_col) - F.col(pred_col)).alias("_r")
        ).filter(F.col("_r").isNotNull())
    )
    dv = res.groupBy("_r").agg(F.count("*").cast("double").alias("_c"))
    cum = partitioned_prefix_sum(dv, ["_r"], "_c", ["_cum"], inclusive=True)
    n = res.agg(F.count("*").alias("_n"))
    k = F.ceil(F.lit(1.0 - float(alpha)) * (F.col("_n") + F.lit(1)))
    qhat = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("_cum") >= k)
        .agg(F.min("_r").alias("_q"))
    )
    t = test.select(
        F.abs(F.col(value_col) - F.col(pred_col)).alias("_r")
    ).filter(F.col("_r").isNotNull())
    return (
        t.crossJoin(F.broadcast(qhat))
        .crossJoin(F.broadcast(n))
        .agg(
            F.max("_n").alias("n_cal"),
            F.count("*").alias("n_test"),
            F.lit(float(alpha)).alias("alpha"),
            F.round(F.max("_q"), 6).alias("q_hat"),
            F.round(
                F.avg(
                    # q NULL = the infinite interval: everything covered
                    F.when(F.col("_q").isNull(), 1.0)
                    .when(F.col("_r") <= F.col("_q"), 1.0)
                    .otherwise(0.0)
                ),
                6,
            ).alias("coverage"),
        )
    )


def tukey_hsd(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Tukey HSD pairwise contrasts (Tukey 1949) — the post-hoc step
    after a significant ANOVA (anova_oneway, X209): for every group
    pair, the mean difference and its studentized-range statistic

        q = |m_a − m_b| / sqrt( MSW/2 · (1/n_a + 1/n_b) )

    with MSW the pooled within-group mean square (the Tukey–Kramer
    unequal-n form). The statistic is reported with its error df;
    critical values of the studentized-range distribution are a table
    lookup the caller applies (no closed form — same convention as
    kruskal_wallis reporting H).

    One grouped sufficient-stats aggregate (n, Σx, Σx²) — the corpus is
    touched once — then the pair grid is groups², a bounded model-side
    cross of the per-group relation (the X222 pairwise-distances
    class). Output: (group_a, group_b, n_a, n_b, diff, se, q_stat,
    df_within), group_a < group_b.
    """
    g = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).groupBy(F.col(group_col).cast("string").alias("_g")).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(F.col(value_col).cast("double")).alias("_s"),
        F.sum(F.col(value_col).cast("double") ** 2).alias("_s2"),
    )
    tot = g.agg(
        F.sum("_n").alias("_tn"),
        F.count("*").cast("double").alias("_k"),
        F.sum(F.col("_s2") - F.col("_s") ** 2 / F.col("_n")).alias("_ssw"),
    )
    a = g.select(
        F.col("_g").alias("group_a"),
        F.col("_n").alias("_na"),
        (F.col("_s") / F.col("_n")).alias("_ma"),
    )
    b = g.select(
        F.col("_g").alias("group_b"),
        F.col("_n").alias("_nb"),
        (F.col("_s") / F.col("_n")).alias("_mb"),
    )
    msw = F.col("_ssw") / (F.col("_tn") - F.col("_k"))
    se = F.sqrt(msw / 2.0 * (1.0 / F.col("_na") + 1.0 / F.col("_nb")))
    return (
        a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "group_a",
            "group_b",
            F.col("_na").cast("long").alias("n_a"),
            F.col("_nb").cast("long").alias("n_b"),
            F.round(F.col("_ma") - F.col("_mb"), 6).alias("diff"),
            F.round(se, 6).alias("se"),
            F.round(
                F.when(se > 0, F.abs(F.col("_ma") - F.col("_mb")) / se), 6
            ).alias("q_stat"),
            (F.col("_tn") - F.col("_k")).cast("long").alias("df_within"),
        )
    )


def cochran_q(
    df: DataFrame,
    item_col: str,
    treatment_col: str,
    success_col: str,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — k-treatment generalization of
    McNemar (X219): do k binary raters/treatments have the same success
    rate on matched items?

        Q = k(k−1) Σ_j (C_j − T/k)² / (k·Σ_i R_i − Σ_i R_i²)

    C_j = per-treatment successes, R_i = per-item successes, T = ΣC_j;
    Q ~ χ²(k−1) under H0. The matched design is a CONTRACT and it is
    enforced (the fleiss_kappa convention): every item must carry
    exactly k distinct treatments, validated by a 2-row min/max control
    aggregate before any statistic is computed.

    Two grouped aggregates over the (item, treatment, success) relation
    + 1-row reductions. Output (1 row): (n_items, k, q_stat, df).
    """
    base = df.select(
        F.col(item_col).alias("_i"),
        F.col(treatment_col).cast("string").alias("_t"),
        F.col(success_col).cast("int").cast("double").alias("_x"),
    ).filter(
        F.col("_i").isNotNull() & F.col("_t").isNotNull() & F.col("_x").isNotNull()
    )
    per_item = base.groupBy("_i").agg(
        F.countDistinct("_t").alias("_kt"),
        F.sum("_x").alias("_r"),
    )
    chk = per_item.agg(
        F.min("_kt").alias("_lo"), F.max("_kt").alias("_hi")
    ).collect()[0]
    if chk["_lo"] is None:
        raise ValueError("ratings relation is empty")
    if chk["_lo"] != chk["_hi"]:
        raise ValueError(
            f"cochran_q requires a constant treatment count per item, "
            f"got min {chk['_lo']} != max {chk['_hi']}"
        )
    k = int(chk["_hi"])
    if k < 2:
        raise ValueError(f"need >= 2 treatments, got {k}")
    # _tsum, not _T: Spark resolves names case-insensitively by default,
    # so _T would collide with the treatment column _t in the crossJoin
    rows = per_item.agg(
        F.count("*").alias("_n"),
        F.sum("_r").alias("_tsum"),
        F.sum(F.col("_r") ** 2).alias("_r2"),
    )
    cols = base.groupBy("_t").agg(F.sum("_x").alias("_c"))
    csq = cols.crossJoin(F.broadcast(rows)).agg(
        F.sum((F.col("_c") - F.col("_tsum") / F.lit(float(k))) ** 2).alias("_cs")
    )
    return rows.crossJoin(F.broadcast(csq)).select(
        F.col("_n").alias("n_items"),
        F.lit(k).cast("long").alias("k"),
        F.round(
            F.when(
                F.lit(float(k)) * F.col("_tsum") - F.col("_r2") > 0,
                F.lit(float(k * (k - 1)))
                * F.col("_cs")
                / (F.lit(float(k)) * F.col("_tsum") - F.col("_r2")),
            ),
            6,
        ).alias("q_stat"),
        F.lit(k - 1).cast("long").alias("df"),
    )


def two_proportion_test(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a,
    group_b,
    z_crit: float = 1.959963984540054,
) -> DataFrame:
    """Two-proportion z-test + per-group Wilson score intervals — the
    workhorse conversion-rate A/B readout (pooled-variance z for the
    difference; Wilson 1927 for the per-arm CIs, which stay inside
    [0, 1] and behave at small n where the Wald interval collapses):

        z  = (p̂_a − p̂_b) / sqrt( p̂(1−p̂)(1/n_a + 1/n_b) ),  p̂ pooled
        CI = (p̂ + z²/2n ± z·sqrt(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)

    One grouped aggregate (the corpus is touched once), 1-row algebra
    after. Degenerate pooled variance (all successes / all failures)
    yields z NULL. Output (1 row): (n_a, n_b, p_a, p_b, diff, z_stat,
    ci_a_lo, ci_a_hi, ci_b_lo, ci_b_hi).
    """
    x = F.col(success_col).cast("int").cast("double")
    g = (
        df.filter(F.col(group_col).isin([group_a, group_b]) & x.isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(F.count("*").cast("double").alias("_n"), F.sum(x).alias("_s"))
    )
    zc = float(z_crit)

    def side(name, tag):
        return g.filter(F.col("_g") == name).select(
            F.col("_n").alias(f"_n{tag}"), F.col("_s").alias(f"_s{tag}")
        )

    j = side(group_a, "a").crossJoin(F.broadcast(side(group_b, "b")))
    pa = F.col("_sa") / F.col("_na")
    pb = F.col("_sb") / F.col("_nb")
    pp = (F.col("_sa") + F.col("_sb")) / (F.col("_na") + F.col("_nb"))
    sevar = pp * (1.0 - pp) * (1.0 / F.col("_na") + 1.0 / F.col("_nb"))

    def wilson(p, n):
        z2 = zc * zc
        center = p + z2 / (2.0 * n)
        half = F.lit(zc) * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        denom = 1.0 + z2 / n
        return ((center - half) / denom, (center + half) / denom)

    alo, ahi = wilson(pa, F.col("_na"))
    blo, bhi = wilson(pb, F.col("_nb"))
    return j.select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(pa - pb, 6).alias("diff"),
        F.round(F.when(sevar > 0, (pa - pb) / F.sqrt(sevar)), 6).alias("z_stat"),
        F.round(alo, 6).alias("ci_a_lo"),
        F.round(ahi, 6).alias("ci_a_hi"),
        F.round(blo, 6).alias("ci_b_lo"),
        F.round(bhi, 6).alias("ci_b_hi"),
    )


def regression_reliability(
    df: DataFrame,
    value_col: str,
    pred_col: str,
    bins: int = 10,
) -> DataFrame:
    """Regression reliability diagram — calibration_report's regression
    sibling: bucket rows by PREDICTION into ``bins`` equal-width bins
    over the prediction range, then compare mean prediction vs mean
    observed value per bin (a calibrated regressor tracks the diagonal;
    systematic bias shows as a signed gap, heteroscedastic error as
    residual-std growth). Equal-WIDTH bins from a broadcast 1-row
    min/max — pure codegen bucketing, no quantile pass, no sort.

    Output (≤ bins rows): (bin, n, mean_pred, mean_value, gap,
    resid_std), bin ∈ [1, bins], empty bins absent.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    base = df.select(
        F.col(value_col).cast("double").alias("_y"),
        F.col(pred_col).cast("double").alias("_p"),
    ).filter(F.col("_y").isNotNull() & F.col("_p").isNotNull())
    mm = base.agg(F.min("_p").alias("_lo"), F.max("_p").alias("_hi"))
    w = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    raw = F.when(w == 0, F.lit(1)).otherwise(
        F.least(
            F.lit(bins),
            F.greatest(F.lit(1), (F.floor((F.col("_p") - F.col("_lo")) / w) + 1)),
        )
    )
    r = F.col("_y") - F.col("_p")
    return (
        base.crossJoin(F.broadcast(mm))
        .select(raw.cast("int").alias("bin"), "_y", "_p", r.alias("_r"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("_p"), 6).alias("mean_pred"),
            F.round(F.avg("_y"), 6).alias("mean_value"),
            F.round(F.avg("_y") - F.avg("_p"), 6).alias("gap"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.avg(F.col("_r") ** 2) - F.avg("_r") ** 2, F.lit(0.0)
                    )
                ),
                6,
            ).alias("resid_std"),
        )
    )


def mde_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    alpha_z: float = 1.959963984540054,
    power_z: float = 0.8416212335729143,
) -> DataFrame:
    """Minimum detectable effect from pilot data — the experiment-design
    readout BEFORE the test runs: with the observed arm sizes and the
    pooled variance, the smallest true difference a two-sample z-test
    would detect at the given α (two-sided) and power:

        MDE = (z_{α/2} + z_{power}) · sqrt( s²_pooled (1/n_a + 1/n_b) )

    (defaults: α = 0.05, power = 0.80 — the 1.96/0.8416 pair). Reported
    absolute and relative to the control (group_b) mean. One grouped
    sufficient-stats aggregate; 1-row algebra after. Output (1 row):
    (n_a, n_b, mean_a, mean_b, sd_pooled, mde_abs, mde_rel).
    """
    x = F.col(value_col).cast("double")
    g = (
        df.filter(F.col(group_col).isin([group_a, group_b]) & x.isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count("*").cast("double").alias("_n"),
            F.sum(x).alias("_s"),
            F.sum(x * x).alias("_s2"),
        )
    )

    def side(name, tag):
        return g.filter(F.col("_g") == name).select(
            F.col("_n").alias(f"_n{tag}"),
            F.col("_s").alias(f"_s{tag}"),
            F.col("_s2").alias(f"_q{tag}"),
        )

    j = side(group_a, "a").crossJoin(F.broadcast(side(group_b, "b")))
    ssa = F.col("_qa") - F.col("_sa") ** 2 / F.col("_na")
    ssb = F.col("_qb") - F.col("_sb") ** 2 / F.col("_nb")
    s2 = (ssa + ssb) / (F.col("_na") + F.col("_nb") - 2.0)
    mde = F.lit(float(alpha_z) + float(power_z)) * F.sqrt(
        s2 * (1.0 / F.col("_na") + 1.0 / F.col("_nb"))
    )
    mb = F.col("_sb") / F.col("_nb")
    return j.select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.round(F.col("_sa") / F.col("_na"), 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(F.sqrt(s2), 6).alias("sd_pooled"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(F.when(mb != 0, mde / F.abs(mb)), 6).alias("mde_rel"),
    )


def conformal_by_group(
    cal: DataFrame,
    test: DataFrame,
    group_col: str,
    value_col: str,
    pred_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Group-conditional split conformal — :func:`conformal_interval`
    per slice: a MARGINAL conformal interval can hit 90% overall while
    badly under-covering a minority slice; fitting q̂ per group (Mondrian
    conformal, Vovk 2003) restores the guarantee group-by-group. The
    audit table a fairness/robustness review reads.

    Same scale shape as the ungrouped form, with every stage grouped:
    per-(group, residual) counts → one GROUPED inclusive prefix-sum pass
    → per-group k-th order statistic → coverage join. Groups whose
    calibration slice is too small for the requested α get the honest
    infinite interval (q_hat NULL, coverage 1). Output (one row per
    group present in BOTH sets): (group, n_cal, n_test, q_hat,
    coverage).
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    res = cal.select(
        F.col(group_col).alias("_g"),
        F.abs(F.col(value_col) - F.col(pred_col)).alias("_r"),
    ).filter(F.col("_r").isNotNull() & F.col("_g").isNotNull())
    dv = res.groupBy("_g", "_r").agg(F.count("*").cast("double").alias("_c"))
    cum = partitioned_prefix_sum(
        dv, ["_r"], "_c", ["_cum"], group_cols=["_g"], inclusive=True
    )
    n = res.groupBy("_g").agg(F.count("*").alias("_n"))
    k = F.ceil(F.lit(1.0 - float(alpha)) * (F.col("_n") + F.lit(1)))
    qhat = (
        cum.join(n, "_g")
        .filter(F.col("_cum") >= k)
        .groupBy("_g")
        .agg(F.min("_r").alias("_q"))
    )
    t = test.select(
        F.col(group_col).alias("_g"),
        F.abs(F.col(value_col) - F.col(pred_col)).alias("_r"),
    ).filter(F.col("_r").isNotNull() & F.col("_g").isNotNull())
    return (
        t.join(n, "_g")
        .join(qhat, "_g", "left")
        .groupBy(F.col("_g").alias("group"))
        .agg(
            F.max("_n").alias("n_cal"),
            F.count("*").alias("n_test"),
            F.round(F.max("_q"), 6).alias("q_hat"),
            F.round(
                F.avg(
                    F.when(F.col("_q").isNull(), 1.0)
                    .when(F.col("_r") <= F.col("_q"), 1.0)
                    .otherwise(0.0)
                ),
                6,
            ).alias("coverage"),
        )
    )


def jarque_bera(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Jarque–Bera normality statistic per group (Jarque & Bera 1980):
    JB = n/6·(S² + K²/4) from sample skewness S and EXCESS kurtosis K —
    the moment-based normality screen run before reaching for a t-test
    (compare JB to χ²₂: 5.99 at α=0.05). Reported as the statistic plus
    its ingredients (the repo's no-erf convention — compare to the
    critical value, don't fabricate a p).

    One grouped aggregate of raw power sums Σx..Σx⁴; central moments,
    S, K and JB are row-local arithmetic on the |groups|-row relation.
    Groups with n < 8 or zero variance report NULL JB (the moment
    estimates are meaningless there).
    """
    gcols = [group_col] if group_col else []
    x = F.col(value_col).cast("double")
    s = df.filter(x.isNotNull()).groupBy(*gcols).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(x).alias("_s1"),
        F.sum(x * x).alias("_s2"),
        F.sum(x * x * x).alias("_s3"),
        F.sum(x * x * x * x).alias("_s4"),
    )
    n = F.col("_n")
    m = F.col("_s1") / n
    m2 = F.col("_s2") / n - m * m
    m3 = F.col("_s3") / n - 3 * m * F.col("_s2") / n + 2 * m * m * m
    m4 = (
        F.col("_s4") / n
        - 4 * m * F.col("_s3") / n
        + 6 * m * m * F.col("_s2") / n
        - 3 * m * m * m * m
    )
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2) - 3.0
    ok = (n >= 8) & (m2 > 0)
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    return s.select(
        *gcols,
        n.cast("long").alias("n"),
        F.round(F.when(ok, skew), 6).alias("skewness"),
        F.round(F.when(ok, kurt), 6).alias("kurtosis_excess"),
        F.round(F.when(ok, jb), 6).alias("jb"),
    )


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Brown–Forsythe variance-equality test (1974): the one-way ANOVA
    F computed on z = |x − median_group| — the robust Levene variant
    that gates "can I pool variances" before an equal-variance test,
    without normality assumptions (medians, not means, absorb skew).

    Two corpus passes by necessity (the median must exist before z
    does): one grouped EXACT percentile aggregate (broadcast back — the
    group relation is control-plane), one moments aggregate over z; the
    F statistic is 1-row arithmetic. Output: (k, n, f_stat, df1, df2).
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_x")
    )
    med = base.groupBy("_g").agg(F.percentile("_x", F.lit(0.5)).alias("_med"))
    z = base.join(F.broadcast(med), "_g").select(
        "_g", F.abs(F.col("_x") - F.col("_med")).alias("_z")
    )
    per = z.groupBy("_g").agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_z").alias("_s"),
        F.sum(F.col("_z") * F.col("_z")).alias("_ss"),
    )
    tot = per.agg(
        F.count("*").alias("_k"),
        F.sum("_n").alias("_N"),
        F.sum("_s").alias("_S"),
        F.sum(F.col("_s") * F.col("_s") / F.col("_n")).alias("_B"),
        F.sum("_ss").alias("_SS"),
    )
    k = F.col("_k").cast("double")
    nn = F.col("_N")
    ssb = F.col("_B") - F.col("_S") * F.col("_S") / nn
    ssw = F.col("_SS") - F.col("_B")
    f = F.when(
        (k > 1) & (nn > k) & (ssw > 0),
        (ssb / (k - 1)) / (ssw / (nn - k)),
    )
    return tot.select(
        F.col("_k").cast("long").alias("k"),
        nn.cast("long").alias("n"),
        F.round(f, 6).alias("f_stat"),
        (F.col("_k") - 1).cast("long").alias("df1"),
        (nn - k).cast("long").alias("df2"),
    )


def chi2_residuals(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Standardized (adjusted) Pearson residuals per contingency cell
    (Haberman 1973): r = (O − E)/√(E·(1−p_row)·(1−p_col)) — the
    drill-down behind a significant χ² independence test (X160 says
    THAT the table deviates; this says WHICH cells, with |r| > 2 the
    conventional flag). One cell-count aggregate; margins re-aggregate
    the bounded cell relation and broadcast back.
    """
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).cast("string").alias("a"),
            F.col(col_b).cast("string").alias("b"),
        )
        .agg(F.count("*").cast("double").alias("_o"))
    )
    row_m = cells.groupBy("a").agg(F.sum("_o").alias("_ra"))
    col_m = cells.groupBy("b").agg(F.sum("_o").alias("_cb"))
    tot = cells.agg(F.sum("_o").alias("_n"))
    j = (
        cells.join(F.broadcast(row_m), "a")
        .join(F.broadcast(col_m), "b")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("_ra") * F.col("_cb") / F.col("_n")
    denom = F.sqrt(
        e
        * (1.0 - F.col("_ra") / F.col("_n"))
        * (1.0 - F.col("_cb") / F.col("_n"))
    )
    return j.select(
        "a",
        "b",
        F.col("_o").cast("long").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round(
            F.when(denom > 0, (F.col("_o") - e) / denom), 6
        ).alias("std_residual"),
    )


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
) -> DataFrame:
    """First-order partial correlation — the x↔y association with the
    confounder z held fixed (the correlation analogue of X265's
    Simpson check; a strong r_xy that collapses when z is partialled
    out was z's doing all along)::

        r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²))

    ONE moments aggregate computes all three Pearson correlations
    (rows with any NULL among x,y,z are excluded — the correlations
    must share a sample for the identity to hold); the partial is
    1-row arithmetic. Degenerate inputs (either conditioning
    correlation = ±1, or any zero variance) return NULL partial.
    Output (1 row): n, r_xy, r_xz, r_yz, r_xy_given_z.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    z = F.col(z_col).cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull() & z.isNotNull()
    ).select(x.alias("_x"), y.alias("_y"), z.alias("_z"))
    s = base.agg(
        F.count("*").alias("n"),
        F.corr("_x", "_y").alias("_rxy"),
        F.corr("_x", "_z").alias("_rxz"),
        F.corr("_y", "_z").alias("_ryz"),
    )
    den = F.sqrt(
        (1.0 - F.col("_rxz") * F.col("_rxz"))
        * (1.0 - F.col("_ryz") * F.col("_ryz"))
    )
    return s.select(
        "n",
        F.round("_rxy", 6).alias("r_xy"),
        F.round("_rxz", 6).alias("r_xz"),
        F.round("_ryz", 6).alias("r_yz"),
        F.round(
            F.when(
                den > 0,
                (F.col("_rxy") - F.col("_rxz") * F.col("_ryz")) / den,
            ),
            6,
        ).alias("r_xy_given_z"),
    )


def precision_coverage(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Selective-prediction table: at each confidence threshold t, the
    COVERAGE (fraction of rows where the model would act, score ≥ t)
    and the PRECISION among them (El-Yaniv & Wiener's selective-risk
    curve, reported as precision) — the table that picks an abstention
    cutoff by reading both columns at once, where a PR curve hides
    coverage. Same bounded-bin plan as the threshold-ROI operator: one
    bin pass (rows carry their highest cleared threshold), one hash
    aggregate with conditional positives, one (|T|×|T|) triangular
    join. Output per threshold: (threshold, n_covered, coverage,
    precision) — precision NULL at zero coverage.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = sorted(set(float(t) for t in thresholds))
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    bin_expr = F.lit(None).cast("double")
    for t in ts:
        bin_expr = F.when(s >= F.lit(t), F.lit(t)).otherwise(bin_expr)
    bins = (
        df.filter(s.isNotNull() & y.isNotNull())
        .select(bin_expr.alias("_bin"), y.cast("long").alias("_y"))
        .groupBy("_bin")
        .agg(F.count("*").alias("_n"), F.sum("_y").alias("_p"))
    )
    tot = bins.agg(F.sum("_n").alias("_tn"))
    thr = df.sparkSession.createDataFrame(
        [(t,) for t in ts], "threshold double"
    ).crossJoin(F.broadcast(tot))
    kept = (
        thr.join(F.broadcast(bins), F.col("_bin") >= F.col("threshold"), "left")
        .groupBy("threshold", "_tn")
        .agg(
            F.coalesce(F.sum("_n"), F.lit(0)).alias("n_covered"),
            F.coalesce(F.sum("_p"), F.lit(0)).alias("_pos"),
        )
    )
    return kept.select(
        "threshold",
        F.col("n_covered").cast("long").alias("n_covered"),
        F.round(F.col("n_covered") / F.col("_tn"), 6).alias("coverage"),
        F.round(
            F.when(
                F.col("n_covered") > 0, F.col("_pos") / F.col("n_covered")
            ),
            6,
        ).alias("precision"),
    )


def dispersion_index(
    df: DataFrame,
    count_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Index of dispersion / Poissonness check (Fisher): for count data,
    D = (n−1)·s²/x̄ is χ²ₙ₋₁ under a Poisson model, so
    var_mean_ratio = s²/x̄ ≈ 1 means Poisson, > 1 overdispersion
    (burstiness, contagion — model with negative binomial), < 1
    underdispersion (regularity). The modeling pre-check before any
    per-entity count is treated as Poisson. One grouped moments
    aggregate; groups with n < 2 or x̄ = 0 report NULL.
    Output per group: (n, mean, var_mean_ratio, dispersion_d).
    """
    x = F.col(count_col).cast("double")
    gcols = [group_col] if group_col else []
    s = df.filter(x.isNotNull()).groupBy(*gcols).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(x).alias("_s"),
        F.sum(x * x).alias("_ss"),
    )
    n, mean = F.col("_n"), F.col("_s") / F.col("_n")
    var = (F.col("_ss") - F.col("_n") * mean * mean) / (F.col("_n") - 1)
    ok = (n >= 2) & (mean > 0)
    return s.select(
        *gcols,
        n.cast("long").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(F.when(ok, var / mean), 6).alias("var_mean_ratio"),
        F.round(F.when(ok, (n - 1) * var / mean), 6).alias("dispersion_d"),
    )


def james_stein_means(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-group means (James & Stein 1961,
    Efron & Morris 1975's batting-average form): small noisy groups
    borrow strength from the grand mean instead of publishing their raw
    extremes — the estimator for any "quality score per source" table
    where group sizes vary wildly. Per group g::

        B_g = σ²/n_g / (σ²/n_g + τ²)          (shrinkage weight)
        shrunk_g = B_g·x̄̄ + (1 − B_g)·x̄_g

    with σ² the pooled within-group variance and τ² the method-of-
    moments between-group variance (clamped at 0 when the observed
    spread is within noise — everything collapses to the grand mean).
    One grouped moments aggregate; the pooled/between pieces are 1-row
    re-aggregates broadcast back. Output per group:
    (group, n, mean_raw, shrinkage, mean_shrunk).
    """
    x = F.col(value_col).cast("double")
    per = df.filter(x.isNotNull()).groupBy(F.col(group_col).alias("_g")).agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(x).alias("_m"),
        F.coalesce(F.var_samp(x), F.lit(0.0)).alias("_v"),
    )
    tot = per.agg(
        F.count("*").alias("_k"),
        F.sum("_n").alias("_ntot"),
        F.sum(F.col("_n") * F.col("_m")).alias("_sm"),
        # pooled within-group variance: Σ(n_g−1)v_g / Σ(n_g−1)
        (
            F.sum((F.col("_n") - 1) * F.col("_v"))
            / F.nullif(F.sum(F.col("_n") - 1), F.lit(0.0))
        ).alias("_s2"),
    ).select(
        "_k", "_ntot", "_s2", (F.col("_sm") / F.col("_ntot")).alias("_gm")
    )
    j = per.crossJoin(F.broadcast(tot))
    # between-group variance (method of moments): observed variance of
    # group means minus their sampling noise, clamped at 0
    between = j.agg(
        F.greatest(
            F.sum(
                F.col("_n")
                * (F.col("_m") - F.col("_gm"))
                * (F.col("_m") - F.col("_gm"))
            )
            / F.first("_ntot")
            - F.first("_s2") * F.first("_k") / F.first("_ntot"),
            F.lit(0.0),
        ).alias("_tau2")
    )
    out = j.crossJoin(F.broadcast(between))
    b = F.when(
        (F.col("_s2") / F.col("_n") + F.col("_tau2")) > 0,
        (F.col("_s2") / F.col("_n"))
        / (F.col("_s2") / F.col("_n") + F.col("_tau2")),
    ).otherwise(F.lit(1.0))
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_n").cast("long").alias("n"),
        F.round("_m", 6).alias("mean_raw"),
        F.round(b, 6).alias("shrinkage"),
        F.round(b * F.col("_gm") + (1 - b) * F.col("_m"), 6).alias(
            "mean_shrunk"
        ),
    )


def mantel_haenszel(
    df: DataFrame,
    stratum_col: str,
    exposed_col: str,
    outcome_col: str,
) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio across strata (Mantel &
    Haenszel 1959) — the constructive follow-up to a Simpson's-paradox
    detection: instead of reporting the confounded marginal odds ratio,
    pool the per-stratum 2×2 tables into one stratification-adjusted
    estimate,

        OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ)

    with the Robins–Breslow–Greenland (1986) variance of log OR_MH
    (valid under both sparse-strata and large-strata asymptotics)::

        Var = ΣPR/(2R²) + Σ(PS+QR)/(2RS) + ΣQS/(2S²)
        P=(a+d)/n, Q=(b+c)/n, R=ad/n, S=bc/n, R=ΣRᵢ, S=ΣSᵢ

    Scale design: the whole computation is ONE grouped conditional-sum
    aggregate (stratum → a,b,c,d) followed by a 1-row re-aggregate
    broadcast back onto the per-stratum relation — no joins on data,
    no windows. ``exposed_col``/``outcome_col`` are boolean columns.
    Output per stratum: (stratum, a, b, c, d, or_stratum) plus the
    pooled (or_mh, se_log_or, or_lo95, or_hi95) repeated on every row.
    """
    e = F.col(exposed_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    per = (
        df.filter(e.isNotNull() & o.isNotNull())
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.sum((e & o).cast("double")).alias("a"),
            F.sum((e & ~o).cast("double")).alias("b"),
            F.sum((~e & o).cast("double")).alias("c"),
            F.sum((~e & ~o).cast("double")).alias("d"),
        )
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    rr = F.col("a") * F.col("d") / n
    ss = F.col("b") * F.col("c") / n
    p = (F.col("a") + F.col("d")) / n
    q = (F.col("b") + F.col("c")) / n
    pooled = per.agg(
        F.sum(rr).alias("_r"),
        F.sum(ss).alias("_s"),
        F.sum(p * rr).alias("_pr"),
        F.sum(p * ss + q * rr).alias("_psqr"),
        F.sum(q * ss).alias("_qs"),
    ).select(
        (F.col("_r") / F.nullif(F.col("_s"), F.lit(0.0))).alias("_ormh"),
        F.sqrt(
            F.col("_pr") / (2 * F.col("_r") * F.col("_r"))
            + F.col("_psqr") / (2 * F.col("_r") * F.col("_s"))
            + F.col("_qs") / (2 * F.col("_s") * F.col("_s"))
        ).alias("_se"),
    )
    out = per.crossJoin(F.broadcast(pooled))
    return out.select(
        "stratum",
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(
            F.col("a") * F.col("d")
            / F.nullif(F.col("b") * F.col("c"), F.lit(0.0)),
            6,
        ).alias("or_stratum"),
        F.round("_ormh", 6).alias("or_mh"),
        F.round("_se", 6).alias("se_log_or"),
        F.round(F.exp(F.log("_ormh") - 1.959964 * F.col("_se")), 6).alias(
            "or_lo95"
        ),
        F.round(F.exp(F.log("_ormh") + 1.959964 * F.col("_se")), 6).alias(
            "or_hi95"
        ),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test for k related treatments over n blocks
    (Friedman 1937) plus Kendall's coefficient of concordance
    W = χ²_F / (n(k−1)) — the repeated-measures complement to
    Kruskal–Wallis: each block (user, rater, day) ranks the k
    treatments internally, so between-block level shifts cancel by
    construction. Only COMPLETE blocks (all k treatments present
    after the (block, treatment) pre-aggregate) enter the test.

        χ²_F = 12/(nk(k+1)) · ΣⱼR²ⱼ − 3n(k+1)

    with midranks for ties (rank − 1 + (t+1)/2 via the per-block RANK
    window plus a tied-count window; the plain statistic is reported
    without the tie-correction denominator — ties across a block's k
    cells are rare when the cell measure is a continuous mean).

    Scale design: ranks use windows partitioned by BLOCK (millions of
    small partitions, never a global sort); completeness is a count
    window over the same partition against the broadcast global k;
    everything after is a k-row aggregate. Output per treatment:
    (treatment, n_blocks, rank_sum, mean_rank) with (k, chi2_f,
    kendall_w) repeated.
    """
    cell = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(block_col).alias("_b"), F.col(treatment_col).alias("_t")
        )
        .agg(F.avg(F.col(value_col).cast("double")).alias("_x"))
    )
    kglob = cell.agg(F.countDistinct("_t").cast("double").alias("_k"))
    wb = Window.partitionBy("_b")
    complete = (
        cell.withColumn("_nt", F.count("*").over(wb))
        .crossJoin(F.broadcast(kglob))
        .filter(F.col("_nt") == F.col("_k"))
    )
    w_rank = Window.partitionBy("_b").orderBy("_x")
    w_tie = Window.partitionBy("_b", "_x")
    ranked = complete.select(
        "_t",
        "_k",
        (
            F.rank().over(w_rank).cast("double")
            - 1
            + (F.count("*").over(w_tie).cast("double") + 1) / 2
        ).alias("_r"),
    )
    per = ranked.groupBy("_t", "_k").agg(
        F.count("*").cast("double").alias("_n"), F.sum("_r").alias("_rs")
    )
    stats = per.agg(
        F.first("_n").alias("_nb"),
        F.first("_k").alias("_kk"),
        F.sum(F.col("_rs") * F.col("_rs")).alias("_rs2"),
    ).select(
        "_nb",
        "_kk",
        (
            12.0 / (F.col("_nb") * F.col("_kk") * (F.col("_kk") + 1))
            * F.col("_rs2")
            - 3 * F.col("_nb") * (F.col("_kk") + 1)
        ).alias("_chi2"),
    )
    return (
        per.crossJoin(F.broadcast(stats))
        .select(
            F.col("_t").alias("treatment"),
            F.col("_n").cast("long").alias("n_blocks"),
            F.round("_rs", 6).alias("rank_sum"),
            F.round(F.col("_rs") / F.col("_n"), 6).alias("mean_rank"),
            F.col("_kk").cast("long").alias("k"),
            F.round("_chi2", 6).alias("chi2_f"),
            F.round(
                F.col("_chi2") / (F.col("_nb") * (F.col("_kk") - 1)), 6
            ).alias("kendall_w"),
        )
    )


def ratio_metric_ci(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (total value
    per event, revenue per session, tokens per request) where the
    randomization/iid unit is the USER, not the event — the estimator
    every A/B platform needs because events within a user are
    correlated and the naive per-event SE is anti-conservative
    (Deng, Knoblich & Lu, KDD 2018). With per-unit totals
    (yᵢ = Σ value, xᵢ = #events), R = ΣY/ΣX = ȳ/x̄ and

        Var(R) ≈ (S²_y − 2R·S_yx + R²·S²_x) / (n·x̄²)

    Scale design: one groupBy(unit) aggregate, then one (grouped)
    moments aggregate with var_samp/covar_samp — two shuffles total,
    no windows, no per-unit state on the driver. Output per group:
    (n_units, n_events, ratio, se, lo95, hi95).
    """
    gcols = [group_col] if group_col else []
    per = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, F.col(unit_col).alias("_u"))
        .agg(
            F.sum(F.col(value_col).cast("double")).alias("_y"),
            F.count("*").cast("double").alias("_x"),
        )
    )
    m = per.groupBy(*gcols).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_y").alias("_sy"),
        F.sum("_x").alias("_sx"),
        F.var_samp("_y").alias("_vy"),
        F.var_samp("_x").alias("_vx"),
        F.covar_samp("_y", "_x").alias("_cyx"),
    )
    r = F.col("_sy") / F.col("_sx")
    xbar = F.col("_sx") / F.col("_n")
    var = (
        (F.col("_vy") - 2 * r * F.col("_cyx") + r * r * F.col("_vx"))
        / (F.col("_n") * xbar * xbar)
    )
    se = F.when(var >= 0, F.sqrt(var))
    return m.select(
        *gcols,
        F.col("_n").cast("long").alias("n_units"),
        F.col("_sx").cast("long").alias("n_events"),
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - 1.959964 * se, 6).alias("lo95"),
        F.round(r + 1.959964 * se, 6).alias("hi95"),
    )


def g_test(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """G-test (log-likelihood-ratio) of independence over a two-way
    contingency table (Sokal & Rohlf; Woolf 1957) — the information-
    theoretic twin of chi2_independence: G = 2·Σ O·ln(O/E) equals
    2N·I(A;B) in nats, so it is additive across table partitions
    (chi² is not) and better behaved when expected counts are small
    but observed are 0 (0·ln0 terms vanish exactly). Same χ²_{df}
    reference distribution, df = (r−1)(c−1).

    Scale design: identical shape to chi2_independence — one grouped
    cell count, marginals as two re-aggregates joined back on the
    bounded label relations, one scalar re-aggregate. Zero cells
    contribute 0 (only realized cells appear in the grouped relation,
    matching the 0·ln0 limit). Output one row:
    (n, r_levels, c_levels, df, g_stat, mi_nats).
    """
    base = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    cells = base.groupBy(
        F.col(a_col).alias("_a"), F.col(b_col).alias("_b")
    ).agg(F.count("*").cast("double").alias("_o"))
    ra = cells.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    cb = cells.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    tot = cells.agg(F.sum("_o").alias("_n"))
    j = (
        cells.join(F.broadcast(ra), "_a")
        .join(F.broadcast(cb), "_b")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("_ra") * F.col("_cb") / F.col("_n")
    return (
        j.agg(
            F.first("_n").alias("n"),
            F.countDistinct("_a").alias("r_levels"),
            F.countDistinct("_b").alias("c_levels"),
            F.sum(2 * F.col("_o") * F.log(F.col("_o") / e)).alias("_g"),
        )
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("r_levels").cast("long").alias("r_levels"),
            F.col("c_levels").cast("long").alias("c_levels"),
            ((F.col("r_levels") - 1) * (F.col("c_levels") - 1))
            .cast("long")
            .alias("df"),
            F.round("_g", 6).alias("g_stat"),
            F.round(F.col("_g") / (2 * F.col("n")), 6).alias("mi_nats"),
        )
    )


def hosmer_lemeshow(
    df: DataFrame,
    p_col: str,
    y_col: str,
    tiebreak_col: str,
    bins: int = 10,
) -> DataFrame:
    """Hosmer–Lemeshow goodness-of-fit test for a probability model
    (Hosmer & Lemeshow 1980) — the hypothesis-test companion to the
    X152 reliability diagram / ECE: group rows into ``bins``
    EQUAL-COUNT "deciles of risk" by predicted probability and compare
    observed vs expected positives per bin,

        HL = Σ_b [(O_b−E_b)²/E_b + ((n_b−O_b)−(n_b−E_b))²/(n_b−E_b)]

    ~ χ²(bins−2) under calibration. ECE averages the gap (a metric);
    HL says whether the gap is explainable by binomial noise (a test).

    Scale design: equal-count binning needs a global rank — computed
    with the range-partitioned prefix count (partitioned_prefix_sum
    over (p, tiebreak), unique by construction), never ntile's global
    window; bin = floor((rank−1)·bins/n). One grouped aggregate after.
    Output per bin: (bin, n, obs_pos, exp_pos) with (hl_stat, df)
    repeated.
    """
    if bins < 3:
        raise ValueError(f"bins must be >= 3, got {bins}")
    from swivel_spark_prep_spark.operators.ranks import (
        partitioned_prefix_sum,
    )

    base = df.select(
        F.col(p_col).cast("double").alias("_p"),
        F.col(y_col).cast("boolean").cast("int").cast("double").alias("_y"),
        F.col(tiebreak_col).alias("_tb"),
    ).filter(F.col("_p").isNotNull() & F.col("_y").isNotNull())
    ranked = partitioned_prefix_sum(
        base.withColumn("_one", F.lit(1.0)),
        ["_p", "_tb"],
        "_one",
        ["_r"],
        inclusive=True,
    )
    tot = base.agg(F.count("*").cast("double").alias("_n"))
    binned = ranked.crossJoin(F.broadcast(tot)).select(
        F.floor((F.col("_r") - 1) * bins / F.col("_n")).alias("bin"),
        "_p",
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("double").alias("_nb"),
        F.sum("_y").alias("_o1"),
        F.sum("_p").alias("_e1"),
    )
    o0 = F.col("_nb") - F.col("_o1")
    e0 = F.col("_nb") - F.col("_e1")
    contrib = (F.col("_o1") - F.col("_e1")) * (
        F.col("_o1") - F.col("_e1")
    ) / F.col("_e1") + (o0 - e0) * (o0 - e0) / e0
    stats = per.agg(F.sum(contrib).alias("_hl"))
    return (
        per.crossJoin(F.broadcast(stats))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("_nb").cast("long").alias("n"),
            F.col("_o1").cast("long").alias("obs_pos"),
            F.round("_e1", 6).alias("exp_pos"),
            F.round("_hl", 6).alias("hl_stat"),
            F.lit(bins - 2).cast("long").alias("df"),
        )
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Krippendorff's alpha, nominal metric (Krippendorff 1970/2004) —
    the agreement coefficient that, unlike X225's Fleiss kappa, allows
    a VARYING number of raters per item (raters who skip items, the
    normal state of a labeling queue). Coincidence-matrix form:

        D_o = (1/n)·Σᵢ (mᵢ² − Σ_c n_ic²)/(mᵢ−1)
        D_e = (n² − Σ_c n_c²)/(n(n−1))        α = 1 − D_o/D_e

    with mᵢ ratings on item i, n = Σmᵢ total ratings; items with
    mᵢ < 2 contribute nothing (no pairable values) and are excluded.

    Scale design: one grouped cell count (item, category), one
    per-item re-aggregate, two 1-row totals — the same plan family as
    fleiss_kappa with the constant-raters contract removed. Output:
    (n_items, n_ratings, d_o, d_e, alpha).
    """
    cells = (
        df.filter(F.col(item_col).isNotNull() & F.col(category_col).isNotNull())
        .groupBy(F.col(item_col).alias("_i"), F.col(category_col).alias("_c"))
        .agg(F.count("*").cast("double").alias("_n"))
    )
    per_item = cells.groupBy("_i").agg(
        F.sum("_n").alias("_m"), F.sum(F.col("_n") * F.col("_n")).alias("_sq")
    ).filter(F.col("_m") >= 2)
    obs = per_item.agg(
        F.count("*").alias("_items"),
        F.sum("_m").alias("_ntot"),
        F.sum(
            (F.col("_m") * F.col("_m") - F.col("_sq")) / (F.col("_m") - 1)
        ).alias("_do_num"),
    )
    pairable = per_item.select("_i")
    per_cat = (
        cells.join(pairable, "_i")
        .groupBy("_c")
        .agg(F.sum("_n").alias("_nc"))
        .agg(F.sum(F.col("_nc") * F.col("_nc")).alias("_sq_c"))
    )
    j = obs.crossJoin(F.broadcast(per_cat))
    n = F.col("_ntot")
    d_o = F.col("_do_num") / n
    d_e = (n * n - F.col("_sq_c")) / (n * (n - 1))
    return j.select(
        F.col("_items").cast("long").alias("n_items"),
        n.cast("long").alias("n_ratings"),
        F.round(d_o, 6).alias("d_o"),
        F.round(d_e, 6).alias("d_e"),
        F.round(1 - d_o / d_e, 6).alias("alpha"),
    )


def bowker_test(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Bowker's test of symmetry (Bowker 1948) — McNemar's k×k
    generalization, over a paired categorical square table (here:
    first vs last state per unit): under symmetry n_ij ≈ n_ji for
    every off-diagonal pair, and

        B = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji)  ~ χ²(df)

    with df = #pairs having n_ij + n_ji > 0 — "do units drift between
    states in a preferred DIRECTION, or just churn symmetrically",
    the significance layer over X114's transition matrix.

    Scale design: one grouped cell count, then a full-outer self-join
    of the two triangular halves keyed on the (bounded, k²-sized)
    label pairs — never row-scale data. Output per pair:
    (from_type, to_type, n_fwd, n_rev, contrib) with (df, bowker_stat)
    repeated.
    """
    cells = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
        .agg(F.count("*").cast("double").alias("_n"))
    )
    fwd = cells.filter(F.col("_a") < F.col("_b")).select(
        F.col("_a").alias("from_type"),
        F.col("_b").alias("to_type"),
        F.col("_n").alias("_nf"),
    )
    rev = cells.filter(F.col("_a") > F.col("_b")).select(
        F.col("_b").alias("from_type"),
        F.col("_a").alias("to_type"),
        F.col("_n").alias("_nr"),
    )
    pairs = (
        fwd.join(rev, ["from_type", "to_type"], "full_outer")
        .na.fill({"_nf": 0.0, "_nr": 0.0})
        .withColumn(
            "_ctr",
            F.when(
                F.col("_nf") + F.col("_nr") > 0,
                (F.col("_nf") - F.col("_nr"))
                * (F.col("_nf") - F.col("_nr"))
                / (F.col("_nf") + F.col("_nr")),
            ),
        )
    )
    stats = pairs.agg(
        F.sum(F.col("_ctr").isNotNull().cast("long")).alias("_df"),
        F.sum("_ctr").alias("_b"),
    )
    return pairs.crossJoin(F.broadcast(stats)).select(
        "from_type",
        "to_type",
        F.col("_nf").cast("long").alias("n_fwd"),
        F.col("_nr").cast("long").alias("n_rev"),
        F.round("_ctr", 6).alias("contrib"),
        F.col("_df").cast("long").alias("df"),
        F.round("_b", 6).alias("bowker_stat"),
    )


def yuen_trimmed_t(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    tiebreak_col: str,
    trim: float = 0.2,
) -> DataFrame:
    """Yuen's trimmed-mean t-test (Yuen 1974) between two slices — the
    heavy-tail-robust member of the two-sample family (welch_ttest
    assumes means matter and tails behave; mann_whitney_u gives up on
    means entirely; Yuen tests TRIMMED means with winsorized
    variances, keeping the mean interpretation while capping tail
    leverage). With per-group trim count g = ⌊trim·n⌋, h = n − 2g:

        d = s²_win·(n−1)/(h(h−1)),  t = (x̄_t,a − x̄_t,b)/√(d_a+d_b)

    Welch–Satterthwaite df on the d's.

    Scale design: the trim cut is an ORDER STATISTIC — ranks come
    from the range-partitioned grouped prefix count over a unique
    (value, tiebreak) order (no global window); the winsorization
    bounds are the min/max of the kept range (one aggregate); the
    winsorized variance is var_samp over the clamped column; the
    final t is arithmetic on a 2-row relation. Output one row:
    (n_a, n_b, h_a, h_b, tmean_a, tmean_b, diff, t_stat, df_yuen).
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    from swivel_spark_prep_spark.operators.ranks import (
        partitioned_prefix_sum,
    )

    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_x"),
        F.col(tiebreak_col).alias("_tb"),
    ).filter(F.col("_x").isNotNull() & F.col("_g").isin([group_a, group_b]))
    ranked = partitioned_prefix_sum(
        base.withColumn("_one", F.lit(1.0)),
        ["_x", "_tb"],
        "_one",
        ["_r"],
        group_cols=["_g"],
        inclusive=True,
    )
    tot = base.groupBy("_g").agg(F.count("*").cast("double").alias("_n"))
    j = ranked.join(F.broadcast(tot), "_g").withColumn(
        "_gt", F.floor(F.lit(trim) * F.col("_n")).cast("double")
    )
    kept = j.filter(
        (F.col("_r") > F.col("_gt")) & (F.col("_r") <= F.col("_n") - F.col("_gt"))
    )
    cuts = kept.groupBy("_g").agg(
        F.count("*").cast("double").alias("_h"),
        F.avg("_x").alias("_tm"),
        F.min("_x").alias("_lo"),
        F.max("_x").alias("_hi"),
    )
    wz = j.join(F.broadcast(cuts), "_g").select(
        "_g",
        "_n",
        "_h",
        "_tm",
        F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("_x"))).alias(
            "_w"
        ),
    )
    per = wz.groupBy("_g").agg(
        F.first("_n").alias("_n"),
        F.first("_h").alias("_h"),
        F.first("_tm").alias("_tm"),
        F.var_samp("_w").alias("_sw2"),
    )

    def side(tag, g):
        return [
            F.max(F.when(F.col("_g") == g, F.col(c))).alias(f"{c}{tag}")
            for c in ["_n", "_h", "_tm", "_sw2"]
        ]

    w = per.agg(*side("a", group_a), *side("b", group_b))
    da = (
        F.col("_sw2a") * (F.col("_na") - 1) / (F.col("_ha") * (F.col("_ha") - 1))
    )
    db = (
        F.col("_sw2b") * (F.col("_nb") - 1) / (F.col("_hb") * (F.col("_hb") - 1))
    )
    t = (F.col("_tma") - F.col("_tmb")) / F.sqrt(da + db)
    dfy = (da + db) * (da + db) / (
        da * da / (F.col("_ha") - 1) + db * db / (F.col("_hb") - 1)
    )
    return w.select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.col("_ha").cast("long").alias("h_a"),
        F.col("_hb").cast("long").alias("h_b"),
        F.round("_tma", 6).alias("tmean_a"),
        F.round("_tmb", 6).alias("tmean_b"),
        F.round(F.col("_tma") - F.col("_tmb"), 6).alias("diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(dfy, 6).alias("df_yuen"),
    )


def quantile_treatment_effects(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    group_a,
    group_b,
    probs: tuple = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Quantile treatment effects (Doksum 1974; Firpo 2007's estimand):
    the per-quantile difference q_p(A) − q_p(B) between two arms — the
    distributional view a mean-difference test flattens: a treatment
    that helps the p90 and hurts the p25 nets to "no effect" in a
    t-test and shows plainly here.

    Scale design: ONE grouped exact-percentile aggregate per arm
    (Spark's `percentile` with a probability ARRAY — a single pass
    however many quantiles), pivoted to a 1-row relation, exploded
    back out to one row per probability. Output:
    (p, q_a, q_b, qte).
    """
    probs = [float(p) for p in probs]
    if not probs or not all(0.0 < p < 1.0 for p in probs):
        raise ValueError(f"probs must be in (0, 1), got {probs}")
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(arm_col).isin([group_a, group_b])
    ).select(F.col(arm_col).alias("_g"), x.alias("_x"))
    plist = ", ".join(repr(p) for p in probs)
    per = base.groupBy("_g").agg(
        F.expr(f"percentile(_x, array({plist}))").alias("_qs")
    )
    w = per.agg(
        F.max(F.when(F.col("_g") == group_a, F.col("_qs"))).alias("_qa"),
        F.max(F.when(F.col("_g") == group_b, F.col("_qs"))).alias("_qb"),
    )
    exploded = w.select(
        F.posexplode(F.lit(probs).cast("array<double>")).alias("_i", "p"),
        "_qa",
        "_qb",
    )
    return exploded.select(
        "p",
        F.round(F.col("_qa")[F.col("_i")], 6).alias("q_a"),
        F.round(F.col("_qb")[F.col("_i")], 6).alias("q_b"),
        F.round(
            F.col("_qa")[F.col("_i")] - F.col("_qb")[F.col("_i")], 6
        ).alias("qte"),
    )


def did_estimate(
    df: DataFrame,
    unit_col: str,
    arm_col: str,
    period_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Difference-in-differences with the paired-delta formulation
    (Card & Krueger 1994's design; SE per Bertrand et al.'s
    unit-clustering advice applied to the 2×2 case): per unit present
    in BOTH periods, Δᵤ = ȳᵤ,post − ȳᵤ,pre; the estimate is
    mean(Δ_A) − mean(Δ_B) with the two-sample SE over unit deltas —
    clustering at the unit automatically, which the naive four-cell
    variance gets wrong when a unit contributes many events.
    ``period_col`` must be boolean-like (false = pre, true = post);
    units missing a period are excluded (and counted).

    Scale design: one (unit, period) aggregate, one conditional pivot
    per unit, one grouped moments pass — no windows. Output one row:
    (n_a, n_b, n_dropped, delta_a, delta_b, did, se, t_stat).
    """
    per = (
        df.filter(
            F.col(value_col).isNotNull()
            & F.col(arm_col).isin([group_a, group_b])
        )
        .groupBy(
            F.col(unit_col).alias("_u"),
            F.col(arm_col).alias("_g"),
            F.col(period_col).cast("boolean").alias("_p"),
        )
        .agg(F.avg(F.col(value_col).cast("double")).alias("_m"))
    )
    unit = per.groupBy("_u", "_g").agg(
        F.max(F.when(F.col("_p"), F.col("_m"))).alias("_post"),
        F.max(F.when(~F.col("_p"), F.col("_m"))).alias("_pre"),
    )
    both = unit.withColumn("_d", F.col("_post") - F.col("_pre"))
    stats = both.groupBy("_g").agg(
        F.count("*").alias("_ntot"),
        F.count("_d").cast("double").alias("_n"),
        F.avg("_d").alias("_md"),
        F.var_samp("_d").alias("_vd"),
    )

    def side(tag, g):
        return [
            F.max(F.when(F.col("_g") == g, F.col(c))).alias(f"{c}{tag}")
            for c in ["_ntot", "_n", "_md", "_vd"]
        ]

    w = stats.agg(*side("a", group_a), *side("b", group_b))
    se = F.sqrt(
        F.col("_vda") / F.col("_na") + F.col("_vdb") / F.col("_nb")
    )
    did = F.col("_mda") - F.col("_mdb")
    return w.select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        (
            F.col("_ntota") + F.col("_ntotb") - F.col("_na") - F.col("_nb")
        ).cast("long").alias("n_dropped"),
        F.round("_mda", 6).alias("delta_a"),
        F.round("_mdb", 6).alias("delta_b"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("t_stat"),
    )


def brunner_munzel(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Brunner–Munzel test (Brunner & Munzel 2000) — the rank test to
    reach for when Mann–Whitney's homoscedasticity-under-H₀ assumption
    is itself in doubt (unequal variances AND unequal shapes): tests
    P(X<Y) + ½P(X=Y) = ½ using combined-vs-within midrank placements,

        W = n_a·n_b·(R̄_b − R̄_a) / (N·√(n_a·S²_a + n_b·S²_b))

    S²_g = var over group g of (combined midrank − within-group
    midrank), with Satterthwaite df. p̂ = (R̄_b − (n_b+1)/2)/n_a is the
    stochastic-superiority estimate itself.

    Scale design: TWO _fractional_ranks passes (pooled + per-group),
    both the distinct-value prefix-sum shape — no global window; the
    statistic is arithmetic on a 2-row moments relation. Output one
    row: (n_a, n_b, p_hat, bm_stat, df_bm).
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull() & F.col("_g").isin([group_a, group_b]))
    pooled = _fractional_ranks(base, "_x", "_rc", None)
    both = _fractional_ranks(pooled, "_x", "_rw", "_g")
    per = both.groupBy("_g").agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_rc").alias("_rbar"),
        F.var_samp(F.col("_rc") - F.col("_rw")).alias("_s2"),
    )

    def side(tag, g):
        return [
            F.max(F.when(F.col("_g") == g, F.col(c))).alias(f"{c}{tag}")
            for c in ["_n", "_rbar", "_s2"]
        ]

    w = per.agg(*side("a", group_a), *side("b", group_b))
    na, nb = F.col("_na"), F.col("_nb")
    n = na + nb
    num = na * nb * (F.col("_rbarb") - F.col("_rbara"))
    den = n * F.sqrt(na * F.col("_s2a") + nb * F.col("_s2b"))
    # complete separation: both placement variances are 0 and the
    # Satterthwaite ratio is 0/0 — report NULL df (and NULL W: the
    # statistic is unbounded; p_hat = 0 or 1 carries the answer)
    dfden = (
        F.pow(na * F.col("_s2a"), 2) / (na - 1)
        + F.pow(nb * F.col("_s2b"), 2) / (nb - 1)
    )
    dfb = F.when(
        dfden > 0,
        F.pow(na * F.col("_s2a") + nb * F.col("_s2b"), 2) / dfden,
    )
    return w.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round((F.col("_rbarb") - (nb + 1) / 2) / na, 6).alias("p_hat"),
        F.round(F.when(den > 0, num / den), 6).alias("bm_stat"),
        F.round(dfb, 6).alias("df_bm"),
    )


def quantile_order_ci(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    p: float = 0.5,
    z: float = 1.959964,
) -> DataFrame:
    """Distribution-free confidence interval for a quantile from ORDER
    STATISTICS (the binomial argument, normal-approximated ranks;
    Conover's nonparametric interval) — the bootstrap-free way to put
    error bars on a median/p90: the interval [x₍ᵣ₎, x₍ₛ₎] with

        r = max(1, ⌊np − z·√(np(1−p))⌋)
        s = min(n, ⌈np + z·√(np(1−p))⌉ + 1)

    covers the true quantile with ≈ the nominal confidence, for ANY
    continuous distribution, at zero replicates (X194's bootstrap pays
    a 100× scan for the same answer on the median).

    Scale design: ranks via the grouped distinct-value prefix count
    (inclusive span [lo, hi] per distinct value handles ties); the
    bound values are conditional min/max aggregates at the computed
    ranks — two shuffles total. Output per group:
    (n, p, lo_rank, hi_rank, q, lo, hi).
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    gcols = [group_col] if group_col else []
    base = df.select(
        *gcols, F.col(value_col).cast("double").alias("_x")
    ).filter(F.col("_x").isNotNull())
    dv = base.groupBy(*gcols, "_x").agg(F.count("*").alias("_t"))
    cum = partitioned_prefix_sum(
        dv, ["_x"], "_t", ["_hi"], group_cols=gcols or None, inclusive=True
    ).withColumn("_lo", F.col("_hi") - F.col("_t") + 1)
    tot = base.groupBy(*gcols).agg(F.count("*").cast("double").alias("_n"))
    j = (
        cum.join(F.broadcast(tot), gcols)
        if gcols
        else cum.crossJoin(F.broadcast(tot))
    )
    n = F.col("_n")
    half = F.lit(z) * F.sqrt(n * p * (1 - p))
    r = F.greatest(F.lit(1.0), F.floor(n * p - half).cast("double"))
    s = F.least(n, (F.ceil(n * p + half) + 1).cast("double"))
    qrank = F.ceil(n * p).cast("double")
    covers = lambda rank: (F.col("_lo") <= rank) & (rank <= F.col("_hi"))  # noqa: E731
    out = j.groupBy(*gcols).agg(
        F.first("_n").cast("long").alias("n"),
        F.lit(float(p)).alias("p"),
        F.max(r).cast("long").alias("lo_rank"),
        F.max(s).cast("long").alias("hi_rank"),
        F.round(
            F.min(F.when(covers(qrank), F.col("_x"))), 6
        ).alias("q"),
        F.round(F.min(F.when(covers(r), F.col("_x"))), 6).alias("lo"),
        F.round(F.min(F.when(covers(s), F.col("_x"))), 6).alias("hi"),
    )
    return out


def negative_binomial_fit(
    df: DataFrame,
    count_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Negative-binomial fit of per-entity counts by the method of
    moments (the Gamma-Poisson overdispersion model; Greenwood & Yule
    1920) — the constructive follow-up to dispersion_index's
    "var/mean ≫ 1" verdict: r = m²/(v−m), p = m/v, plus the predicted
    zero fraction (r/(r+m))^r next to the observed one — if NB can't
    even match the zeros, reach for a zero-inflated model. Groups with
    v ≤ m (no overdispersion) report NULL r/p — Poisson suffices.

    Scale design: one grouped moments aggregate; everything after is
    row arithmetic. Output per group: (n, mean, var, r, p, zero_obs,
    zero_nb).
    """
    x = F.col(count_col).cast("double")
    agg = df.filter(x.isNotNull()).groupBy(
        *( [group_col] if group_col else [] )
    ).agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(x).alias("_m"),
        F.var_samp(x).alias("_v"),
        F.avg((x == 0).cast("double")).alias("_z"),
    )
    m, v = F.col("_m"), F.col("_v")
    r = F.when(v > m, m * m / (v - m))
    return agg.select(
        *([group_col] if group_col else []),
        F.col("_n").cast("long").alias("n"),
        F.round(m, 6).alias("mean"),
        F.round(v, 6).alias("var"),
        F.round(r, 6).alias("r"),
        F.round(F.when(v > m, m / v), 6).alias("p"),
        F.round("_z", 6).alias("zero_obs"),
        F.round(F.pow(r / (r + m), r), 6).alias("zero_nb"),
    )


def cronbach_alpha(df: DataFrame, item_cols: list) -> DataFrame:
    """Cronbach's alpha internal-consistency coefficient (Cronbach
    1951) over k item columns scored per subject — the "do these k
    quality signals measure one construct" check before averaging them
    into a single score:

        α = k/(k−1) · (1 − Σᵢvar(itemᵢ) / var(Σᵢitemᵢ))

    α near 1 = the items co-vary (one construct); near 0 = they are
    independent signals and their mean is not a scale.

    Scale design: one aggregate computing every item variance and the
    total-score variance in a single pass — no reshaping, no windows.
    Output one row: (n_items, n_subjects, sum_item_var, total_var,
    alpha).
    """
    k = len(item_cols)
    if k < 2:
        raise ValueError(f"need >= 2 items, got {k}")
    items = [F.col(c).cast("double") for c in item_cols]
    total = sum(items[1:], items[0])
    cond = items[0].isNotNull()
    for it in items[1:]:
        cond = cond & it.isNotNull()
    agg = df.filter(cond).agg(
        F.count("*").alias("_n"),
        *[F.var_samp(it).alias(f"_v{i}") for i, it in enumerate(items)],
        F.var_samp(total).alias("_vt"),
    )
    sv = sum(F.col(f"_v{i}") for i in range(k))
    return agg.select(
        F.lit(k).cast("long").alias("n_items"),
        F.col("_n").cast("long").alias("n_subjects"),
        F.round(sv, 6).alias("sum_item_var"),
        F.round("_vt", 6).alias("total_var"),
        F.round(
            F.when(
                F.col("_vt") > 0,
                (F.lit(k) / (k - 1)) * (1 - sv / F.col("_vt")),
            ),
            6,
        ).alias("alpha"),
    )


def variance_decomposition(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """One-way variance decomposition: η² = SSB/SST (share of variance
    explained by the grouping) and ICC(1) via the ANOVA estimator with
    Donner's n₀ correction for unequal group sizes — "how much does
    SOURCE explain about this metric" in one number, the effect-size
    companion to X209's F-test (which only says the means differ,
    not by how much of the variance):

        n₀   = (N − Σn²_g/N) / (k−1)
        ICC1 = (MSB − MSW) / (MSB + (n₀−1)·MSW)

    Scale design: one grouped moments pass + one 1-row rollup — the
    anova_oneway plan shape with the effect sizes added. Output one
    row: (k, n, eta2, msb, msw, n0, icc1).
    """
    x = F.col(value_col).cast("double")
    per = df.filter(x.isNotNull()).groupBy(F.col(group_col).alias("_g")).agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(x).alias("_m"),
        F.coalesce(F.var_samp(x), F.lit(0.0)).alias("_v"),
    )
    tot = per.agg(
        F.count("*").cast("double").alias("_k"),
        F.sum("_n").alias("_nn"),
        (F.sum(F.col("_n") * F.col("_m")) / F.sum("_n")).alias("_gm"),
        F.sum(F.col("_n") * F.col("_n")).alias("_sn2"),
    )
    j = per.crossJoin(F.broadcast(tot))
    agg = j.agg(
        F.first("_k").alias("_k"),
        F.first("_nn").alias("_nn"),
        F.first("_sn2").alias("_sn2"),
        F.sum(
            F.col("_n")
            * (F.col("_m") - F.col("_gm"))
            * (F.col("_m") - F.col("_gm"))
        ).alias("_ssb"),
        F.sum((F.col("_n") - 1) * F.col("_v")).alias("_ssw"),
    )
    k, n = F.col("_k"), F.col("_nn")
    msb = F.col("_ssb") / (k - 1)
    msw = F.col("_ssw") / (n - k)
    n0 = (n - F.col("_sn2") / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    return agg.select(
        k.cast("long").alias("k"),
        n.cast("long").alias("n"),
        F.round(
            F.col("_ssb") / F.nullif(F.col("_ssb") + F.col("_ssw"), F.lit(0.0)),
            6,
        ).alias("eta2"),
        F.round(msb, 6).alias("msb"),
        F.round(msw, 6).alias("msw"),
        F.round(n0, 6).alias("n0"),
        F.round(icc, 6).alias("icc1"),
    )


def beta_binomial_shrink(
    df: DataFrame,
    success_col: str,
    group_col: str,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-group PROPORTIONS via the
    beta-binomial ANOVA estimator (Kleinman 1973's moment route):
    the rates twin of james_stein_means — a 3-document source with a
    100% pass rate should not outrank a 10 000-document source at 96%.
    The intraclass correlation of the 0/1 outcome gives the prior
    weight M = (1−ρ)/ρ (ANOVA MoM with Donner's n₀), and

        rate_shrunk = (x_g + M·p̄) / (n_g + M)

    — small groups collapse toward the pooled rate, big groups keep
    their own. ρ ≤ 0 (no between-group signal) collapses everything
    to p̄ exactly.

    Scale design: one grouped conditional-count pass + two 1-row
    rollups (the variance_decomposition machinery on a binary
    outcome). Output per group: (n, successes, rate_raw, prior_m,
    rate_shrunk).
    """
    y = F.col(success_col).cast("boolean").cast("int").cast("double")
    per = df.filter(y.isNotNull()).groupBy(F.col(group_col).alias("_g")).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(y).alias("_x"),
        F.avg(y).alias("_m"),
        F.coalesce(F.var_samp(y), F.lit(0.0)).alias("_v"),
    )
    tot = per.agg(
        F.count("*").cast("double").alias("_k"),
        F.sum("_n").alias("_nn"),
        (F.sum("_x") / F.sum("_n")).alias("_pbar"),
        F.sum(F.col("_n") * F.col("_n")).alias("_sn2"),
    )
    j = per.crossJoin(F.broadcast(tot))
    rho = j.agg(
        F.first("_k").alias("_k"),
        F.first("_nn").alias("_nn"),
        F.first("_sn2").alias("_sn2"),
        F.sum(
            F.col("_n")
            * (F.col("_m") - F.col("_pbar"))
            * (F.col("_m") - F.col("_pbar"))
        ).alias("_ssb"),
        F.sum((F.col("_n") - 1) * F.col("_v")).alias("_ssw"),
    ).select(
        "*",
        (F.col("_ssb") / (F.col("_k") - 1)).alias("_msb"),
        (F.col("_ssw") / (F.col("_nn") - F.col("_k"))).alias("_msw"),
        (
            (F.col("_nn") - F.col("_sn2") / F.col("_nn"))
            / (F.col("_k") - 1)
        ).alias("_n0"),
    ).select(
        "*",
        (
            (F.col("_msb") - F.col("_msw"))
            / (F.col("_msb") + (F.col("_n0") - 1) * F.col("_msw"))
        ).alias("_rho"),
    )
    out = j.crossJoin(F.broadcast(rho.select("_rho")))
    m_prior = F.when(
        F.col("_rho") > 0, (1 - F.col("_rho")) / F.col("_rho")
    )
    shrunk = F.when(
        m_prior.isNotNull(),
        (F.col("_x") + m_prior * F.col("_pbar")) / (F.col("_n") + m_prior),
    ).otherwise(F.col("_pbar"))
    return out.select(
        F.col("_g").alias(group_col),
        F.col("_n").cast("long").alias("n"),
        F.col("_x").cast("long").alias("successes"),
        F.round("_m", 6).alias("rate_raw"),
        F.round(m_prior, 6).alias("prior_m"),
        F.round(shrunk, 6).alias("rate_shrunk"),
    )


def qini_curve(
    df: DataFrame,
    treated_col: str,
    outcome_col: str,
    score_col: str,
    tiebreak_col: str,
    deciles: int = 10,
) -> DataFrame:
    """Qini uplift curve by score decile (Radcliffe 2007) — THE
    evaluation table for a targeting model: rank units by the score
    (descending), and at each cumulative decile report the incremental
    conversions versus what the control group's rate predicts,

        qini(d) = conv_T(d) − conv_C(d) · N_T(d)/N_C(d)

    A useless score tracks the random diagonal; a good one front-loads
    the area. (Deciles of the SCORE, uplift measured against the
    concurrent control — not a model fit, a bookkeeping identity.)

    Scale design: the global score rank is the range-partitioned
    prefix count over (−score, tiebreak) (never ntile's single
    window); per-decile conditional sums + one cumulative pass over
    the 10-row relation. Output per cumulative decile: (decile,
    n_treated, n_control, conv_treated, conv_control, qini,
    qini_random).
    """
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    base = df.select(
        F.col(treated_col).cast("boolean").alias("_t"),
        F.col(outcome_col).cast("boolean").cast("int").alias("_y"),
        (-F.col(score_col).cast("double")).alias("_ns"),
        F.col(tiebreak_col).alias("_tb"),
    ).filter(F.col("_t").isNotNull() & F.col("_y").isNotNull() & F.col("_ns").isNotNull())
    ranked = partitioned_prefix_sum(
        base.withColumn("_one", F.lit(1.0)),
        ["_ns", "_tb"],
        "_one",
        ["_r"],
        inclusive=True,
    )
    tot = base.agg(F.count("*").cast("double").alias("_n"))
    binned = ranked.crossJoin(F.broadcast(tot)).select(
        F.floor((F.col("_r") - 1) * deciles / F.col("_n")).alias("_d"),
        "_t",
        "_y",
    )
    per = binned.groupBy("_d").agg(
        F.sum(F.col("_t").cast("long")).alias("_nt"),
        F.sum((~F.col("_t")).cast("long")).alias("_nc"),
        F.sum(F.when(F.col("_t"), F.col("_y")).otherwise(F.lit(0))).alias("_ct"),
        F.sum(F.when(~F.col("_t"), F.col("_y")).otherwise(F.lit(0))).alias("_cc"),
    )
    cum = partitioned_prefix_sum(
        per, ["_d"], ["_nt", "_nc", "_ct", "_cc"],
        ["_cnt", "_cnc", "_cct", "_ccc"], inclusive=True,
    )
    glob = per.agg(
        F.sum("_ct").alias("_gt"),
        F.sum("_cc").alias("_gc"),
        F.sum("_nt").alias("_gnt"),
        F.sum("_nc").alias("_gnc"),
    )
    j = cum.crossJoin(F.broadcast(glob))
    qini = F.col("_cct") - F.col("_ccc") * F.col("_cnt") / F.nullif(
        F.col("_cnc").cast("double"), F.lit(0.0)
    )
    rand = (
        (F.col("_gt") - F.col("_gc") * F.col("_gnt") / F.col("_gnc"))
        * (F.col("_d") + 1)
        / deciles
    )
    return j.select(
        (F.col("_d") + 1).cast("long").alias("decile"),
        F.col("_cnt").cast("long").alias("n_treated"),
        F.col("_cnc").cast("long").alias("n_control"),
        F.col("_cct").cast("long").alias("conv_treated"),
        F.col("_ccc").cast("long").alias("conv_control"),
        F.round(qini, 6).alias("qini"),
        F.round(rand, 6).alias("qini_random"),
    )


def pocock_monitor(
    df: DataFrame,
    ts_col: str,
    arm_col: str,
    value_col: str,
    group_a,
    group_b,
    looks: int = 5,
    bound: float = 2.413,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Group-sequential monitoring with the Pocock boundary (Pocock
    1977): split the accrual-ordered sample into ``looks`` equal
    interim analyses and test the two-arm mean difference at EACH look
    against the constant Pocock critical value (2.413 = the K=5,
    α=.05 two-sided constant; pass the right constant for other K) —
    the peeking-with-a-license design: testing 5 times at 1.96 inflates
    type-I error to ~14%, the Pocock bound holds it at 5%.

    Scale design: the accrual rank is the range-partitioned prefix
    count over (ts, tiebreak); per-look conditional moments + ONE
    cumulative pass over the looks-row relation; z is arithmetic.
    Output per look (cumulative): (look, n_a, n_b, z, crossed,
    pocock_bound) plus first_crossed_look repeated.
    """
    if looks < 2:
        raise ValueError(f"looks must be >= 2, got {looks}")
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    x = F.col(value_col).cast("double")
    base = df.select(
        F.col(ts_col).alias("_ts"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
        F.when(F.col(arm_col) == group_a, 1)
        .when(F.col(arm_col) == group_b, 0)
        .alias("_a"),
        x.alias("_x"),
    ).filter(F.col("_a").isNotNull() & F.col("_x").isNotNull() & F.col("_ts").isNotNull())
    order = ["_ts"] + (["_tb"] if tiebreak_col else [])
    ranked = partitioned_prefix_sum(
        base.withColumn("_one", F.lit(1.0)), order, "_one", ["_r"], inclusive=True
    )
    tot = base.agg(F.count("*").cast("double").alias("_n"))
    binned = ranked.crossJoin(F.broadcast(tot)).select(
        F.floor((F.col("_r") - 1) * looks / F.col("_n")).alias("_l"),
        "_a",
        "_x",
    )
    per = binned.groupBy("_l").agg(
        F.sum(F.col("_a").cast("double")).alias("_na"),
        F.sum(1 - F.col("_a").cast("double")).alias("_nb"),
        F.sum(F.when(F.col("_a") == 1, F.col("_x"))).alias("_sa"),
        F.sum(F.when(F.col("_a") == 0, F.col("_x"))).alias("_sb"),
        F.sum(F.when(F.col("_a") == 1, F.col("_x") * F.col("_x"))).alias("_qa"),
        F.sum(F.when(F.col("_a") == 0, F.col("_x") * F.col("_x"))).alias("_qb"),
    )
    cum = partitioned_prefix_sum(
        per,
        ["_l"],
        ["_na", "_nb", "_sa", "_sb", "_qa", "_qb"],
        ["_cna", "_cnb", "_csa", "_csb", "_cqa", "_cqb"],
        inclusive=True,
    )
    ma = F.col("_csa") / F.col("_cna")
    mb = F.col("_csb") / F.col("_cnb")
    va = (F.col("_cqa") - F.col("_cna") * ma * ma) / (F.col("_cna") - 1)
    vb = (F.col("_cqb") - F.col("_cnb") * mb * mb) / (F.col("_cnb") - 1)
    se = F.sqrt(va / F.col("_cna") + vb / F.col("_cnb"))
    z = F.when(se > 0, (ma - mb) / se)
    scored = cum.select(
        (F.col("_l") + 1).cast("long").alias("look"),
        F.col("_cna").cast("long").alias("n_a"),
        F.col("_cnb").cast("long").alias("n_b"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > bound, F.lit(False)).alias("crossed"),
        F.lit(float(bound)).alias("pocock_bound"),
    )
    first = scored.agg(
        F.min(F.when(F.col("crossed"), F.col("look"))).alias(
            "first_crossed_look"
        )
    )
    return scored.crossJoin(F.broadcast(first))


def risk_table(
    df: DataFrame,
    exposed_col: str,
    outcome_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """2×2 risk table with the three standard epidemiological effect
    measures and their CIs — risk difference (Wald), risk ratio
    (Katz log), odds ratio (Woolf log) — the one-stop readout for a
    binary exposure × binary outcome where each measure answers a
    different question (absolute impact / relative risk / case-control
    compatibility):

        RD = p₁−p₀ ± z·√(p₁q₁/n₁ + p₀q₀/n₀)
        ln RR ± z·√(1/a − 1/n₁ + 1/c − 1/n₀)
        ln OR ± z·√(1/a + 1/b + 1/c + 1/d)

    Scale design: ONE conditional-count aggregate; everything else is
    1-row arithmetic. Output one row: (a, b, c, d, rd, rd_lo, rd_hi,
    rr, rr_lo, rr_hi, odds_ratio, or_lo, or_hi); ratio CIs NULL on
    zero cells (the honest answer — use exact methods there).
    """
    e = F.col(exposed_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    agg = df.filter(e.isNotNull() & o.isNotNull()).agg(
        F.sum((e & o).cast("double")).alias("a"),
        F.sum((e & ~o).cast("double")).alias("b"),
        F.sum((~e & o).cast("double")).alias("c"),
        F.sum((~e & ~o).cast("double")).alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    n1, n0 = a + b, c + d
    p1, p0 = a / n1, c / n0
    rd = p1 - p0
    rd_se = F.sqrt(p1 * (1 - p1) / n1 + p0 * (1 - p0) / n0)
    pos = (a > 0) & (b > 0) & (c > 0) & (d > 0)
    rr = p1 / p0
    rr_se = F.sqrt(1 / a - 1 / n1 + 1 / c - 1 / n0)
    orr = (a * d) / (b * c)
    or_se = F.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    return agg.select(
        a.cast("long").alias("a"),
        b.cast("long").alias("b"),
        c.cast("long").alias("c"),
        d.cast("long").alias("d"),
        F.round(rd, 6).alias("rd"),
        F.round(rd - z * rd_se, 6).alias("rd_lo"),
        F.round(rd + z * rd_se, 6).alias("rd_hi"),
        F.round(F.when(pos, rr), 6).alias("rr"),
        F.round(F.when(pos, F.exp(F.log(rr) - z * rr_se)), 6).alias("rr_lo"),
        F.round(F.when(pos, F.exp(F.log(rr) + z * rr_se)), 6).alias("rr_hi"),
        F.round(F.when(pos, orr), 6).alias("odds_ratio"),
        F.round(F.when(pos, F.exp(F.log(orr) - z * or_se)), 6).alias("or_lo"),
        F.round(F.when(pos, F.exp(F.log(orr) + z * or_se)), 6).alias("or_hi"),
    )


def bartlett_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Bartlett's test of variance homogeneity (Bartlett 1937) — the
    higher-power, normality-assuming complement to the robust
    Brown–Forsythe (X273): with k groups of sample variance s²ⱼ,

        χ² = [(N−k)·ln s²_pooled − Σ(nⱼ−1)·ln s²ⱼ] / C
        C  = 1 + (Σ 1/(nⱼ−1) − 1/(N−k)) / (3(k−1))

    against χ²(k−1). Groups with fewer than two rows or zero variance
    carry no variance information and are excluded (scipy's contract);
    k counts the groups actually tested.

    Scale design: ONE grouped moments aggregate + a 1-row rollup — the
    cheapest test in the family (no median pass, no ranks). Output one
    row: (k, n, chi2, df).
    """
    x = F.col(value_col).cast("double")
    per = (
        df.filter(x.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count("*").cast("double").alias("_n"),
            F.var_samp(x).alias("_v"),
        )
        .filter((F.col("_n") >= 2) & (F.col("_v") > 0))
    )
    tot = per.agg(
        F.count("*").alias("_k"),
        F.sum("_n").alias("_N"),
        F.sum((F.col("_n") - 1) * F.col("_v")).alias("_sv"),
        F.sum((F.col("_n") - 1) * F.log("_v")).alias("_slnv"),
        F.sum(1.0 / (F.col("_n") - 1)).alias("_sinv"),
    )
    k = F.col("_k").cast("double")
    nn = F.col("_N")
    sp2 = F.col("_sv") / (nn - k)
    c = 1.0 + (F.col("_sinv") - 1.0 / (nn - k)) / (3.0 * (k - 1.0))
    chi2 = F.when(
        (k > 1) & (nn > k) & (sp2 > 0),
        ((nn - k) * F.log(sp2) - F.col("_slnv")) / c,
    )
    return tot.select(
        F.col("_k").cast("long").alias("k"),
        nn.cast("long").alias("n"),
        F.round(chi2, 6).alias("chi2"),
        (k - 1).cast("long").alias("df"),
    )


def mood_median_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Mood's median test (Mood 1950): do k groups share a common
    median? Classify every row as above / not-above the GRAND median
    and χ²-test the resulting 2×k contingency against the margins —
    the bluntest but most outlier-proof of the k-sample location
    tests (only the sign of x − median matters).

    Scale design: one 1-row exact-percentile aggregate (broadcast),
    one conditional-count grouped aggregate, one rollup; χ² is
    arithmetic over the k-row relation. Output one row:
    (k, n, grand_median, chi2, df).
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_x")
    )
    med = base.agg(F.percentile("_x", F.lit(0.5)).alias("_med"))
    per = (
        base.crossJoin(F.broadcast(med))
        .groupBy("_g")
        .agg(
            F.max("_med").alias("_med"),
            F.sum((F.col("_x") > F.col("_med")).cast("double")).alias("_a"),
            F.count("*").cast("double").alias("_n"),
        )
    )
    # the expected counts need the GLOBAL margins, so χ² is a second
    # 1-row pass over the k-row per-group relation joined to them
    # (χ² = Σⱼ [(aⱼ−Eaⱼ)²/Eaⱼ + (bⱼ−Ebⱼ)²/Ebⱼ], E from margins).
    # The left side's (_a, _n) are renamed first: the margin aggregate
    # shares per's lineage, and Spark 4's resolver flags the bare
    # names ambiguous across the self-derived cross join.
    per2 = per.select(
        "_med", F.col("_a").alias("_pa"), F.col("_n").alias("_pn")
    )
    chi = (
        per2.crossJoin(
            F.broadcast(
                per.agg(
                    F.sum("_a").alias("_A"), F.sum("_n").alias("_N")
                )
            )
        )
        .select(
            "_med",
            (F.col("_pn") * F.col("_A") / F.col("_N")).alias("_ea"),
            (F.col("_pn") * (F.col("_N") - F.col("_A")) / F.col("_N")).alias(
                "_eb"
            ),
            F.col("_pa").alias("_a"),
            (F.col("_pn") - F.col("_pa")).alias("_b"),
            F.col("_pn").alias("_n"),
        )
        .agg(
            F.count("*").alias("_k"),
            F.max("_med").alias("_gm"),
            F.sum("_n").alias("_N"),
            F.sum(
                F.when(
                    (F.col("_ea") > 0) & (F.col("_eb") > 0),
                    (F.col("_a") - F.col("_ea"))
                    * (F.col("_a") - F.col("_ea"))
                    / F.col("_ea")
                    + (F.col("_b") - F.col("_eb"))
                    * (F.col("_b") - F.col("_eb"))
                    / F.col("_eb"),
                )
            ).alias("_chi2"),
        )
    )
    return chi.select(
        F.col("_k").cast("long").alias("k"),
        F.col("_N").cast("long").alias("n"),
        F.round("_gm", 6).alias("grand_median"),
        F.round("_chi2", 6).alias("chi2"),
        (F.col("_k") - 1).cast("long").alias("df"),
    )


def ordinal_association(
    df: DataFrame,
    ord_a: str,
    ord_b: str,
) -> DataFrame:
    """Ordinal-by-ordinal association from a bounded contingency table:
    Goodman–Kruskal γ (1954), Somers' D(b|a), and Kendall τ-b — the
    three standard concordance readings of the same (C, D) pair
    counts, each answering a different tie question (γ ignores ties,
    Somers' D penalizes ties in the dependent, τ-b penalizes both):

        C/D = Σ over cell pairs (i<i', j<j' / j>j') of nᵢⱼ·nᵢ'ⱼ'
        γ = (C−D)/(C+D),  D(b|a) = (C−D)/(n₀−n_a),
        τ-b = (C−D)/√((n₀−n_a)(n₀−n_b)),  n₀ = n(n−1)/2

    with n_a/n_b the tied-pair counts from the row/column margins.
    Inputs must already be ordinal-coded (bounded small integer
    classes — bin first; never feed raw continuous columns).

    Scale design: ONE contingency hash aggregate collapses the corpus
    to a bounded cell relation; the C/D double sum is a broadcast
    nested-loop join of that bounded relation with itself (cells², not
    rows² — the whole point); margins and the statistics are rollup
    arithmetic. Output one row: (n, n_cells, concordant, discordant,
    gamma, somers_d_ba, tau_b).
    """
    a = F.col(ord_a).cast("long")
    b = F.col(ord_b).cast("long")
    cells = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("_a"), b.alias("_b"))
        .agg(F.count("*").cast("double").alias("_n"))
    )
    from swivel_spark_prep_spark.cache import track_persist

    cells = track_persist(cells)
    c1 = cells.select(
        F.col("_a").alias("_a1"), F.col("_b").alias("_b1"),
        F.col("_n").alias("_n1"),
    )
    c2 = cells.select(
        F.col("_a").alias("_a2"), F.col("_b").alias("_b2"),
        F.col("_n").alias("_n2"),
    )
    pairs = c1.join(
        F.broadcast(c2), F.col("_a1") < F.col("_a2")
    ).agg(
        F.sum(
            F.when(F.col("_b1") < F.col("_b2"), F.col("_n1") * F.col("_n2"))
        ).alias("_C"),
        F.sum(
            F.when(F.col("_b1") > F.col("_b2"), F.col("_n1") * F.col("_n2"))
        ).alias("_D"),
    )
    marg = cells.agg(
        F.sum("_n").alias("_N"),
        F.count("*").alias("_cells"),
    )
    ta = (
        cells.groupBy("_a").agg(F.sum("_n").alias("_na"))
        .agg(F.sum(F.col("_na") * (F.col("_na") - 1) / 2.0).alias("_ta"))
    )
    tb = (
        cells.groupBy("_b").agg(F.sum("_n").alias("_nb"))
        .agg(F.sum(F.col("_nb") * (F.col("_nb") - 1) / 2.0).alias("_tb"))
    )
    out = (
        pairs.crossJoin(F.broadcast(marg))
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    cc = F.coalesce(F.col("_C"), F.lit(0.0))
    dd = F.coalesce(F.col("_D"), F.lit(0.0))
    n0 = F.col("_N") * (F.col("_N") - 1) / 2.0
    gamma = F.when(cc + dd > 0, (cc - dd) / (cc + dd))
    somers = F.when(n0 - F.col("_ta") > 0, (cc - dd) / (n0 - F.col("_ta")))
    taub = F.when(
        (n0 - F.col("_ta")) * (n0 - F.col("_tb")) > 0,
        (cc - dd) / F.sqrt((n0 - F.col("_ta")) * (n0 - F.col("_tb"))),
    )
    return out.select(
        F.col("_N").cast("long").alias("n"),
        F.col("_cells").cast("long").alias("n_cells"),
        cc.cast("long").alias("concordant"),
        dd.cast("long").alias("discordant"),
        F.round(gamma, 6).alias("gamma"),
        F.round(somers, 6).alias("somers_d_ba"),
        F.round(taub, 6).alias("tau_b"),
    )


def vif3(
    df: DataFrame,
    col1: str,
    col2: str,
    col3: str,
) -> DataFrame:
    """Variance inflation factors for a THREE-feature design — the
    multicollinearity gate before anyone trusts X174-style regression
    weights: VIFᵢ = 1/(1−R²ᵢ) from regressing feature i on the other
    two, which for three standardized features is closed-form from the
    pairwise correlations via the inverse-correlation-matrix diagonal:

        det = 1 + 2·r₁₂r₁₃r₂₃ − r₁₂² − r₁₃² − r₂₃²
        VIF₁ = (1−r₂₃²)/det   (and cyclically)

    VIF > 5–10 = the coefficient's variance is inflated that many
    times by collinearity. Three features keep the inverse closed-form
    and the output self-explanatory; the general-p path is the same
    one-pass Gram matrix with a dim-bounded driver inverse (the
    X103 PCA convention).

    Scale design: ONE moments aggregate (9 sums) over rows where all
    three are present; everything else is 1-row arithmetic. det ≤ 0
    (numerically singular) yields NULL VIFs — the honest answer.
    Output one row: (n, r12, r13, r23, vif1, vif2, vif3, det).
    """
    x1 = F.col(col1).cast("double")
    x2 = F.col(col2).cast("double")
    x3 = F.col(col3).cast("double")
    base = df.filter(
        x1.isNotNull() & x2.isNotNull() & x3.isNotNull()
    ).select(x1.alias("_1"), x2.alias("_2"), x3.alias("_3"))
    agg = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.corr("_1", "_2").alias("_r12"),
        F.corr("_1", "_3").alias("_r13"),
        F.corr("_2", "_3").alias("_r23"),
    )
    r12, r13, r23 = F.col("_r12"), F.col("_r13"), F.col("_r23")
    det = (
        1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23
    )
    pos = det > 1e-12
    return agg.select(
        F.col("_n").cast("long").alias("n"),
        F.round(r12, 6).alias("r12"),
        F.round(r13, 6).alias("r13"),
        F.round(r23, 6).alias("r23"),
        F.round(F.when(pos, (1.0 - r23 * r23) / det), 6).alias("vif1"),
        F.round(F.when(pos, (1.0 - r13 * r13) / det), 6).alias("vif2"),
        F.round(F.when(pos, (1.0 - r12 * r12) / det), 6).alias("vif3"),
        F.round(det, 6).alias("det"),
    )


def obrien_fleming_monitor(
    df: DataFrame,
    ts_col: str,
    arm_col: str,
    value_col: str,
    group_a,
    group_b,
    looks: int = 5,
    c: float = 2.04,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Group-sequential monitoring with the O'Brien–Fleming boundary
    (O'Brien & Fleming 1979) — the conservative-early companion to the
    Pocock monitor (X339): the critical value SHRINKS as information
    accrues, bound(look ℓ) = c·√(K/ℓ) with c the K-look α=.05 OBF
    constant (2.04 for K=5) — near-unspendable early (first-look bound
    4.56 at K=5), ≈ the fixed-sample 1.96 at the end, which is why OBF
    is the default in confirmatory trials while Pocock suits ops
    monitoring.

    Execution: reuses the pocock machinery verbatim (range-partitioned
    accrual ranks, cumulative per-look moments) and re-scores the
    per-look z against the decaying bound — the z column pocock
    already emits IS the information path. Output per look:
    (look, n_a, n_b, z, crossed, obf_bound) + first_crossed_look.
    """
    base = pocock_monitor(
        df, ts_col, arm_col, value_col, group_a, group_b,
        looks=looks, bound=c, tiebreak_col=tiebreak_col,
    ).select("look", "n_a", "n_b", "z")
    bound = F.round(
        F.lit(float(c)) * F.sqrt(F.lit(float(looks)) / F.col("look")), 6
    )
    scored = base.select(
        "look",
        "n_a",
        "n_b",
        "z",
        F.coalesce(F.abs(F.col("z")) > bound, F.lit(False)).alias("crossed"),
        bound.alias("obf_bound"),
    )
    first = scored.agg(
        F.min(F.when(F.col("crossed"), F.col("look"))).alias(
            "first_crossed_look"
        )
    )
    return scored.crossJoin(F.broadcast(first))


def theils_u(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Theil's uncertainty coefficient U(b|a) (Theil 1970) — the
    DIRECTIONAL categorical-association reading the symmetric pair
    (X160 χ², X161 MI) can't give: what fraction of b's entropy does
    knowing a remove?

        U(b|a) = (H(b) − H(b|a)) / H(b) ∈ [0, 1]

    0 = a says nothing about b, 1 = a determines b — and U(b|a) ≠
    U(a|b) in general, which is the point (source may determine lang
    while lang barely narrows source).

    Scale design: ONE contingency hash aggregate (bounded cells), the
    margins as two grouped rollups of it, entropies as 1-row
    arithmetic; NULL when H(b) = 0 (b is constant — the coefficient is
    undefined, not 1). Output one row: (n, h_b, h_b_given_a, u_b_a).
    """
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    cells = base.groupBy("_a", "_b").agg(
        F.count("*").cast("double").alias("_n")
    )
    from swivel_spark_prep_spark.cache import track_persist

    cells = track_persist(cells)
    na = cells.groupBy("_a").agg(F.sum("_n").alias("_na"))
    tot = cells.agg(F.sum("_n").alias("_N"))
    # H(b|a) = −Σ_ab (n_ab/N)·ln(n_ab/n_a). The cell count is renamed
    # first: na/tot share cells' lineage and Spark 4's resolver flags
    # the bare _n ambiguous across the self-derived joins.
    cells2 = cells.select("_a", "_b", F.col("_n").alias("_cn"))
    hba = (
        cells2.join(F.broadcast(na), "_a")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                -(F.col("_cn") / F.col("_N"))
                * F.log(F.col("_cn") / F.col("_na"))
            ).alias("_hba")
        )
    )
    hb = (
        cells.groupBy("_b")
        .agg(F.sum("_n").alias("_nb"))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                -(F.col("_nb") / F.col("_N"))
                * F.log(F.col("_nb") / F.col("_N"))
            ).alias("_hb"),
            F.max("_N").alias("_N2"),
        )
    )
    out = hb.crossJoin(F.broadcast(hba))
    return out.select(
        F.col("_N2").cast("long").alias("n"),
        F.round("_hb", 6).alias("h_b"),
        F.round("_hba", 6).alias("h_b_given_a"),
        F.round(
            F.when(
                F.col("_hb") > 0,
                (F.col("_hb") - F.col("_hba")) / F.col("_hb"),
            ),
            6,
        ).alias("u_b_a"),
    )


def cuzick_trend(
    df: DataFrame,
    value_col: str,
    score_col: str,
) -> DataFrame:
    """Cuzick's nonparametric trend test across ORDERED groups (Cuzick
    1985) — the dose-response question Kruskal–Wallis can't answer
    (KW sees "some group differs"; Cuzick sees "values RISE with the
    group score"): with ordinal group scores sⱼ and pooled midranks
    Rᵢ,

        L = Σᵢ s(gᵢ)·Rᵢ,   E[L] = (N+1)/2·Σ nⱼsⱼ,
        Var[L] = (N+1)/12·(N·Σ nⱼsⱼ² − (Σ nⱼsⱼ)²),
        z = (L − E)/√Var

    Midranks handle ties in the values; the classical variance (no tie
    correction) is used and replayed verbatim by the oracle — with
    continuous values the correction is negligible, and the convention
    is what matters for parity.

    Scale design: one _fractional_ranks prefix pass (the BM/MWU
    machinery — no global window), one grouped count, 1-row
    arithmetic. Output one row: (n, k, l_stat, e_l, z).
    """
    base = df.select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_s").isNotNull() & F.col("_x").isNotNull())
    ranked = _fractional_ranks(base, "_x", "_r", None)
    stats = ranked.agg(
        F.count("*").cast("double").alias("_N"),
        F.sum(F.col("_s") * F.col("_r")).alias("_L"),
    )
    per = base.groupBy("_s").agg(F.count("*").cast("double").alias("_n"))
    marg = per.agg(
        F.count("*").alias("_k"),
        F.sum(F.col("_n") * F.col("_s")).alias("_ns"),
        F.sum(F.col("_n") * F.col("_s") * F.col("_s")).alias("_ns2"),
    )
    out = stats.crossJoin(F.broadcast(marg))
    nn = F.col("_N")
    e = (nn + 1) / 2.0 * F.col("_ns")
    var = (nn + 1) / 12.0 * (nn * F.col("_ns2") - F.col("_ns") * F.col("_ns"))
    return out.select(
        nn.cast("long").alias("n"),
        F.col("_k").cast("long").alias("k"),
        F.round("_L", 6).alias("l_stat"),
        F.round(e, 6).alias("e_l"),
        F.round(
            F.when(var > 0, (F.col("_L") - e) / F.sqrt(var)), 6
        ).alias("z"),
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: float = 0.05,
) -> DataFrame:
    """Per-group winsorized moments (Winsor via Tukey 1962; Yuen's
    X310 companion — trimming DELETES the tails, winsorizing CLAMPS
    them, keeping n and giving a mean/sd usable downstream where
    row counts must reconcile): values below the group's p-quantile
    (above the 1−p) are set to that quantile, then plain moments.

    Scale design: one grouped EXACT-percentile aggregate (broadcast —
    the group relation is control-plane), one clamped moments pass.
    Output per group: (group, n, lo_cap, hi_cap, win_mean, win_std),
    ordered.
    """
    if not 0.0 <= p < 0.5:
        raise ValueError(f"p must be in [0, 0.5), got {p}")
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_x")
    )
    caps = base.groupBy("_g").agg(
        F.percentile("_x", F.lit(float(p))).alias("_lo"),
        F.percentile("_x", F.lit(1.0 - float(p))).alias("_hi"),
    )
    clamped = base.join(F.broadcast(caps), "_g").select(
        "_g",
        "_lo",
        "_hi",
        F.least(F.greatest(F.col("_x"), F.col("_lo")), F.col("_hi")).alias(
            "_w"
        ),
    )
    return (
        clamped.groupBy("_g")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.max("_lo"), 6).alias("lo_cap"),
            F.round(F.max("_hi"), 6).alias("hi_cap"),
            F.round(F.avg("_w"), 6).alias("win_mean"),
            F.round(F.stddev_samp("_w"), 6).alias("win_std"),
        )
        .select(F.col("_g").alias("group"), "n", "lo_cap", "hi_cap",
                "win_mean", "win_std")
        .orderBy("group")
    )


def grubbs_test(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Grubbs' maximum-normed-residual statistic (Grubbs 1950): the
    single-most-extreme observation's distance from the mean in sd
    units, G = max|xᵢ − x̄|/s, plus the offending value — the
    classical "is my worst point an outlier" screen (compare G to the
    t-based critical value for the chosen α; the statistic and the
    suspect are the distributed part, the lookup is a constant).

    Scale design: one moments aggregate (broadcast), one max_by scan —
    no sort, no window. Deterministic suspect: ties on |deviation|
    break toward the SMALLEST value (min_by on (-dev, x)). Output one
    row: (n, mean, std, g_stat, suspect_value).
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(x.alias("_x"))
    mom = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_x").alias("_m"),
        F.stddev_samp("_x").alias("_s"),
    )
    dev = base.crossJoin(F.broadcast(mom)).select(
        "_x", "_n", "_m", "_s", F.abs(F.col("_x") - F.col("_m")).alias("_d")
    )
    top = dev.agg(
        F.max("_n").alias("_n"),
        F.max("_m").alias("_m"),
        F.max("_s").alias("_s"),
        F.max("_d").alias("_dmax"),
        F.min_by("_x", F.struct(-F.col("_d"), F.col("_x"))).alias("_sus"),
    )
    return top.select(
        F.col("_n").cast("long").alias("n"),
        F.round("_m", 6).alias("mean"),
        F.round("_s", 6).alias("std"),
        F.round(
            F.when(F.col("_s") > 0, F.col("_dmax") / F.col("_s")), 6
        ).alias("g_stat"),
        F.round("_sus", 6).alias("suspect_value"),
    )


_EULER_GAMMA = 0.57721566490153286061
#: exact/asymptotic switch for harmonic numbers: Euler–Maclaurin's next
#: omitted term at m=120 is 1/(252·120⁶) ≈ 1.3e-15 absolute (~2e-16
#: relative) — below double rounding noise.
_HARMONIC_EXACT_MAX = 120
#: driver-exact / distributed switch for the Scholz–Stephens double sum
#: g: below this the O(N) running-sum loop is a bounded control-plane
#: cost; above it g becomes ONE Spark range aggregate (O(1) driver).
_AD_G_EXACT_MAX = 10_000


def _harmonic(m: int) -> float:
    """H_m with O(1) memory: exact partial sum below
    ``_HARMONIC_EXACT_MAX``, Euler–Maclaurin (ln m + γ + 1/2m − 1/12m²
    + 1/120m⁴) above — relative error < 1e-15 there."""
    import math as _math

    if m <= 0:
        return 0.0
    if m <= _HARMONIC_EXACT_MAX:
        return sum(1.0 / i for i in range(1, m + 1))
    im = 1.0 / m
    return (
        _math.log(m) + _EULER_GAMMA + im / 2.0
        - im * im / 12.0 + im ** 4 / 120.0
    )


def _ad_g(spark, n: int) -> float:
    """Scholz–Stephens g = Σ_{j=2}^{N−1} (H_{N−1} − H_{N−j})/j with NO
    O(corpus-rows) driver allocation or loop (round-14 verdict "What's
    wrong #1" — the old harmonic array was a guaranteed driver OOM at
    100 TB row counts):

    * N ≤ ``_AD_G_EXACT_MAX``: exact, one running-sum loop (m = N−j
      ascending keeps H_m as a single accumulator; g = H_{N−1}·Σ1/j −
      ΣH_{N−j}/j), O(1) memory, loop bounded by the threshold.
    * N above: ONE distributed aggregate over ``spark.range(2, N)`` —
      each row computes H_{N−j} from a broadcast 120-float exact table
      (``element_at``) when N−j is small and Euler–Maclaurin otherwise,
      so driver cost is O(1) and executor cost O(N/cores). Boundary
      agreement with the exact loop is test-pinned to ≥10 significant
      digits (tests/test_round15_ops.py).
    """
    if n < 3:
        return 0.0
    hn1 = _harmonic(n - 1)
    if n <= _AD_G_EXACT_MAX:
        hm = 0.0  # running H_m, m = N - j
        s_inv = 0.0  # Σ_{j=2}^{N-1} 1/j
        s_hj = 0.0  # Σ_{j=2}^{N-1} H_{N-j}/j
        for m in range(1, n - 1):  # j = N - m runs N-1 … 2
            hm += 1.0 / m
            jj = n - m
            s_inv += 1.0 / jj
            s_hj += hm / jj
        return hn1 * s_inv - s_hj
    exact = F.lit([_harmonic(i) for i in range(1, _HARMONIC_EXACT_MAX + 1)])
    j = F.col("id").cast("double")
    m = F.lit(float(n)) - j
    im = F.lit(1.0) / m
    h_asym = (
        F.log(m) + F.lit(_EULER_GAMMA) + im / 2.0
        - im * im / 12.0 + F.pow(im, 4) / 120.0
    )
    h_m = F.when(
        m <= _HARMONIC_EXACT_MAX,
        F.element_at(exact, m.cast("int")),
    ).otherwise(h_asym)
    row = (
        spark.range(2, n)
        .agg(F.sum((F.lit(hn1) - h_m) / j).alias("g"))
        .collect()[0]
    )  # 1-row control relation
    return float(row["g"])


def ad_ksample(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """k-sample Anderson–Darling test (Scholz & Stephens 1987, the
    tie-adjusted A²ₐₖₙ) — the k-sample comparison scipy recommends over
    k-sample KS: AD weights the distribution TAILS, where data-mixture
    differences usually live, so it sees shifts KS's single-supremum
    statistic dilutes. Over pooled distinct values z with multiplicity
    l, midrank-centered pooled/per-group cumulative counts B and Mⱼ:

        A² = (N−1)/N · Σⱼ (1/nⱼ) Σ_z (l/N)·(N·Mⱼ − nⱼ·B)²
                                   / (B(N−B) − N·l/4)

    standardized as T = (A² − (k−1))/σ_N with the paper's exact σ
    (their eq. 4–7; σ needs the harmonic sum h = H_{N−1} and the double
    sum g = Σⱼ₌₂^{N−1} (H_{N−1} − H_{N−j})/j, computed with O(1) driver
    memory: exact running sums below N = 10⁴, a single distributed
    ``spark.range`` aggregate with Euler–Maclaurin harmonic terms
    above — see _harmonic/_ad_g; N ≤ 3 degrades to NULL σ/T).
    T ≳ 1.96 rejects at ~5% (their table 1 interpolation is a
    constant lookup, left to the caller).

    Scale design: the group list is collected once (k-bounded); ONE
    distinct-value hash aggregate carries l plus k conditional counts
    as COLUMNS; one grouped-free range-partitioned prefix pass
    (partitioned_prefix_sum) yields all cumulative counts; A² is one
    aggregate over the distinct-value relation. Never a per-group
    single-task window, never a densified grid. Output one row:
    (k, n, a2, sigma, t_stat).
    """
    import math as _math

    from swivel_spark_prep_spark.cache import bounded_distinct
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_v")
    )
    # control-plane: bounded group vocabulary — raises past the cap
    # instead of flooding the driver on a miscalled column
    groups = sorted(bounded_distinct(base, "_g", cap=1000))
    k = len(groups)
    if k < 2:
        raise ValueError(f"need >= 2 groups, got {k}")
    aggs = [F.count("*").cast("double").alias("_l")]
    for i, g in enumerate(groups):
        aggs.append(
            F.sum((F.col("_g") == g).cast("double")).alias(f"_f{i}")
        )
    cells = base.groupBy("_v").agg(*aggs)
    cum = partitioned_prefix_sum(
        cells,
        ["_v"],
        ["_l"] + [f"_f{i}" for i in range(k)],
        ["_cl"] + [f"_cf{i}" for i in range(k)],
        inclusive=True,
    )
    tot = cells.agg(
        F.sum("_l").alias("_N"),
        *[F.sum(f"_f{i}").alias(f"_n{i}") for i in range(k)],
    )
    j = cum.crossJoin(F.broadcast(tot))
    nn = F.col("_N")
    b = F.col("_cl") - F.col("_l") / 2.0
    den = b * (nn - b) - nn * F.col("_l") / 4.0
    inner_terms = []
    for i in range(k):
        m = F.col(f"_cf{i}") - F.col(f"_f{i}") / 2.0
        num = (nn * m - F.col(f"_n{i}") * b)
        inner_terms.append(
            F.sum(
                F.when(
                    den > 0,
                    (F.col("_l") / nn) * num * num / den,
                ).otherwise(F.lit(0.0))
            ).alias(f"_s{i}")
        )
    sums = j.agg(
        F.max("_N").alias("_N"),
        *[F.max(f"_n{i}").alias(f"_n{i}") for i in range(k)],
        *inner_terms,
    )
    row = sums.collect()[0]  # 1-row control relation
    n_total = int(row["_N"])
    a2 = (
        (n_total - 1)
        / n_total
        * sum(row[f"_s{i}"] / row[f"_n{i}"] for i in range(k))
    )
    # Scholz-Stephens variance (eq. 4-7). Harmonic scalars h and the
    # double sum g come from _harmonic/_ad_g — exact-below-threshold,
    # asymptotic/distributed above, NEVER an O(corpus-rows) driver
    # allocation or loop (round-14 verdict "What's wrong #1").
    hh = sum(1.0 / row[f"_n{i}"] for i in range(k))
    if n_total <= 3:
        # variance denominator (N-1)(N-2)(N-3) degenerates — NULL
        # sigma/t like every sibling test, not ZeroDivisionError
        sigma = None
        t = None
    else:
        h = _harmonic(n_total - 1)
        g = _ad_g(df.sparkSession, n_total)
        a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * hh
        bb = (2 * g - 4) * k * k + 8 * h * k + (
            2 * g - 14 * h - 4
        ) * hh - 8 * h + 4 * g - 6
        c = (6 * h + 2 * g - 2) * k * k + (
            4 * h - 4 * g + 6
        ) * k + (2 * h - 6) * hh + 4 * h
        d = (2 * h + 6) * k * k - 4 * h * k
        var = (
            a * n_total**3 + bb * n_total**2 + c * n_total + d
        ) / ((n_total - 1) * (n_total - 2) * (n_total - 3))
        sigma = _math.sqrt(var) if var > 0 else None
        t = (a2 - (k - 1)) / sigma if sigma else None
    return df.sparkSession.createDataFrame(
        [(
            k,
            n_total,
            round(a2, 6),
            round(sigma, 6) if sigma else None,
            round(t, 6) if t is not None else None,
        )],
        "k long, n long, a2 double, sigma double, t_stat double",
    )


def jonckheere_terpstra(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Jonckheere–Terpstra test for an ORDERED alternative across k
    groups (Terpstra 1952, Jonckheere 1954; tie-corrected null
    variance per Hollander–Wolfe 1999 §6.2): does the value tend to
    INCREASE along the group ordering — the k-sample trend question
    Kruskal–Wallis (any difference) and Cuzick (rank-sum scores, X358)
    approach differently. JT is the sum of pairwise Mann–Whitney
    counts over ordered group pairs a < b (ties count half):

        JT = Σ_{a<b} Σ_v f_b(v)·(C_a(v⁻) + f_a(v)/2)

    standardized with E = (N² − Σnᵢ²)/4 and the tie-corrected variance
    (their eq. 6.19; tie multiplicities tⱼ are the pooled per-distinct-
    value counts):

        σ² = A/72 + B/(36N(N−1)(N−2)) + C/(8N(N−1))
        A  = N(N−1)(2N+5) − Σnᵢ(nᵢ−1)(2nᵢ+5) − Σtⱼ(tⱼ−1)(2tⱼ+5)
        B  = Σnᵢ(nᵢ−1)(nᵢ−2) · Σtⱼ(tⱼ−1)(tⱼ−2)
        C  = Σnᵢ(nᵢ−1) · Σtⱼ(tⱼ−1)

    Group ORDER is the ascending sort of the group labels (document
    your label scheme accordingly — e.g. dose_1 < dose_2 < dose_3).

    Scale design: the ad_ksample shape exactly — bounded group
    vocabulary (bounded_distinct), ONE distinct-value hash aggregate
    carrying k conditional-count COLUMNS, one range-partitioned prefix
    pass, then ONE aggregate producing every pairwise U term plus the
    tie-polynomial sums; all remaining arithmetic is k-bounded scalars
    on a 1-row control relation. Never a per-group window, never a
    rows×rows pair join. Output one row:
    (k, n, jt, mean, sigma, z) — sigma/z NULL when the variance
    degenerates (all values tied, or N < 2).
    """
    import math as _math

    from swivel_spark_prep_spark.cache import bounded_distinct
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_v")
    )
    # cap=50, NOT the generic 1000: this op generates k(k-1)/2 pairwise-U
    # aggregate COLUMNS, so k=1000 would ask Catalyst to analyze ~500k
    # expressions — a planner/codegen blow-up long before any data-plane
    # issue. JT's contract is small ordered k (doses, tiers, severity
    # levels); k=50 → 1,225 columns, comfortably inside planner limits,
    # and past the cap the failure is a clear raise, not a planner hang.
    groups = sorted(bounded_distinct(base, "_g", cap=50))
    k = len(groups)
    if k < 2:
        raise ValueError(f"need >= 2 groups, got {k}")
    aggs = [F.count("*").cast("double").alias("_l")]
    for i, g in enumerate(groups):
        aggs.append(F.sum((F.col("_g") == g).cast("double")).alias(f"_f{i}"))
    cells = base.groupBy("_v").agg(*aggs)
    cum = partitioned_prefix_sum(
        cells,
        ["_v"],
        [f"_f{i}" for i in range(k)],
        [f"_c{i}" for i in range(k)],
        inclusive=False,
    )
    terms = []
    for a in range(k):
        for b in range(a + 1, k):
            terms.append(
                F.sum(
                    F.col(f"_f{b}")
                    * (F.col(f"_c{a}") + F.col(f"_f{a}") / 2.0)
                ).alias(f"_u{a}_{b}")
            )
    l = F.col("_l")
    sums = cum.agg(
        *[F.sum(f"_f{i}").alias(f"_n{i}") for i in range(k)],
        F.sum(l * (l - 1) * (2 * l + 5)).alias("_t1"),
        F.sum(l * (l - 1) * (l - 2)).alias("_t2"),
        F.sum(l * (l - 1)).alias("_t3"),
        *terms,
    )
    row = sums.collect()[0]  # 1-row control relation
    ns = [float(row[f"_n{i}"]) for i in range(k)]
    n = sum(ns)
    jt = sum(
        float(row[f"_u{a}_{b}"])
        for a in range(k)
        for b in range(a + 1, k)
    )
    mean = (n * n - sum(v * v for v in ns)) / 4.0
    a_poly = (
        n * (n - 1) * (2 * n + 5)
        - sum(v * (v - 1) * (2 * v + 5) for v in ns)
        - float(row["_t1"])
    )
    b_poly = sum(v * (v - 1) * (v - 2) for v in ns) * float(row["_t2"])
    c_poly = sum(v * (v - 1) for v in ns) * float(row["_t3"])
    var = None
    if n > 2:
        var = (
            a_poly / 72.0
            + b_poly / (36.0 * n * (n - 1) * (n - 2))
            + c_poly / (8.0 * n * (n - 1))
        )
    sigma = _math.sqrt(var) if var and var > 0 else None
    z = (jt - mean) / sigma if sigma else None
    return df.sparkSession.createDataFrame(
        [(
            k,
            int(n),
            round(jt, 6),
            round(mean, 6),
            round(sigma, 6) if sigma else None,
            round(z, 6) if z is not None else None,
        )],
        "k long, n long, jt double, mean double, sigma double, z double",
    )


def ansari_bradley(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Ansari–Bradley rank test for a SCALE (dispersion) difference
    between two samples (Ansari & Bradley 1960; conditional-on-ties
    normal approximation per Conover 1999 §5.3): did the SPREAD of the
    metric change, center aside — the variance-shift companion to
    Mann–Whitney's location shift, rank-robust where Bartlett (X345)
    assumes normality. Midrank scores fold the pooled ranking at its
    center, so extreme observations get SMALL scores:

        s(v) = min(r(v), N + 1 − r(v)),  r = midrank
        AB   = Σ_{i∈A} s_i
        E    = n_a·s̄,
        Var  = n_a·n_b·(N·Σl·s² − (Σl·s)²) / (N²(N−1))

    (the conditional moments given the observed tie pattern — exact
    whatever the ties, no lookup tables needed at these N).

    Scale design: the binary_auc shape — ONE distinct-value aggregate
    with two conditional-count columns, one range-partitioned prefix
    pass for midranks, ONE moments aggregate; everything after is
    scalar arithmetic on a 1-row relation. Output one row:
    (n_a, n_b, ab_stat, mean, sigma, z) — sigma/z NULL when the score
    variance degenerates (all values tied or N < 2); z < 0 means
    sample A is MORE dispersed (small folded scores).
    """
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    cells = base.groupBy("_v").agg(
        F.count("*").cast("double").alias("_l"),
        F.sum((F.col("_g") == group_a).cast("double")).alias("_fa"),
        F.sum((F.col("_g") == group_b).cast("double")).alias("_fb"),
    )
    cum = partitioned_prefix_sum(
        cells, ["_v"], ["_l"], ["_cl"], inclusive=False
    )
    tot = cells.agg(F.sum("_l").alias("_N"))
    j = cum.crossJoin(F.broadcast(tot))
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0  # pooled midrank
    s = F.least(r, F.col("_N") + 1.0 - r)  # folded AB score
    m = j.agg(
        F.max("_N").alias("n"),
        F.sum("_fa").alias("na"),
        F.sum("_fb").alias("nb"),
        F.sum(F.col("_fa") * s).alias("ab"),
        F.sum(F.col("_l") * s).alias("ls"),
        F.sum(F.col("_l") * s * s).alias("ls2"),
    )
    nn, na, nb = F.col("n"), F.col("na"), F.col("nb")
    mean = na * F.col("ls") / nn
    var = (
        na * nb * (nn * F.col("ls2") - F.col("ls") * F.col("ls"))
        / (nn * nn * F.nullif((nn - 1.0), F.lit(0.0)))
    )
    sig = F.when(var > 0, F.sqrt(var))
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round("ab", 6).alias("ab_stat"),
        F.round(mean, 6).alias("mean"),
        F.round(sig, 6).alias("sigma"),
        F.round(
            F.when(sig > 0, (F.col("ab") - mean) / sig), 6
        ).alias("z"),
    )


def youden_thresholds(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-threshold sensitivity / specificity / Youden's J (Youden
    1950) with the J-optimal cutoff flagged — the operating-point table
    behind a quality-filter threshold decision: binary_auc (X150) says
    whether the score ranks at all, THIS says where to cut it. At each
    distinct score t the classifier predicts positive when score ≥ t:

        sens(t) = P(score ≥ t | y)      spec(t) = P(score < t | ¬y)
        J(t)    = sens + spec − 1       best = argmax J (lowest t wins)

    Scale design: the binary_auc shape — one distinct-score aggregate
    with (n_pos, n_neg) columns, one range-partitioned prefix pass for
    the strictly-below counts, class totals broadcast; the argmax is
    max_by over ROUNDED J (both engines compare identical rounded
    doubles, the X365 argmax convention) broadcast back onto the
    threshold relation. Output per distinct score:
    (threshold, sensitivity, specificity, j, best_threshold).
    """
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    g = df.select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    cells = g.groupBy("_s").agg(
        F.sum(F.col("_y").cast("double")).alias("_np"),
        F.sum((~F.col("_y")).cast("double")).alias("_nn"),
    )
    cum = partitioned_prefix_sum(
        cells, ["_s"], ["_np", "_nn"], ["_pb", "_nb"], inclusive=False
    )
    tot = cells.agg(
        F.sum("_np").alias("_tp"), F.sum("_nn").alias("_tn")
    )
    j = cum.crossJoin(F.broadcast(tot))
    sens = F.when(
        F.col("_tp") > 0, (F.col("_tp") - F.col("_pb")) / F.col("_tp")
    )
    spec = F.when(F.col("_tn") > 0, F.col("_nb") / F.col("_tn"))
    scored = j.select(
        F.col("_s").alias("threshold"),
        F.round(sens, 6).alias("sensitivity"),
        F.round(spec, 6).alias("specificity"),
        F.round(sens + spec - 1.0, 6).alias("j"),
    )
    best = scored.agg(
        F.min_by(
            "threshold", F.struct(-F.col("j"), F.col("threshold"))
        ).alias("best_threshold")
    )
    return scored.crossJoin(F.broadcast(best)).orderBy("threshold")


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table (the direct-marketing decile
    analysis; Berry & Linoff's formulation): rank the corpus by model
    score descending, cut into ``buckets`` equal-depth bins, and report
    each bin's response rate, lift over the base rate, and the
    cumulative share of all positives captured — "how much of the good
    stuff do the top k% hold", the working read of a curation score.

    Scale design: per-ROW global ranks come from the two-pass
    range-partitioned prefix sum over (−score, id) — deterministic
    tie-break on id so both engines assign identical bins, never a
    single-task ntile sort; bin membership is integer arithmetic
    (floor((rank−1)·B/N)); one grouped aggregate per bin; the
    cumulative pass is a window over the B-row bin relation (bounded
    by the buckets literal — allowlisted). Output per bin:
    (bucket, n, positives, response_rate, lift, cum_capture).
    """
    if not 2 <= buckets <= 100:
        raise ValueError(f"buckets must be in [2, 100], got {buckets}")
    from swivel_spark_prep_spark.operators.ranks import partitioned_prefix_sum

    g = df.select(
        F.col(id_col).alias("_id"),
        (-F.col(score_col).cast("double")).alias("_negs"),
        F.col(label_col).cast("double").alias("_y"),
    ).filter(F.col("_negs").isNotNull() & F.col("_y").isNotNull())
    ranked = partitioned_prefix_sum(
        g.withColumn("_one", F.lit(1.0)),
        ["_negs", "_id"],
        ["_one"],
        ["_rk"],
        inclusive=False,
    )
    tot = g.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_y").alias("_p"),
    )
    b = ranked.crossJoin(F.broadcast(tot)).select(
        F.floor(F.col("_rk") * buckets / F.col("_n")).cast("long").alias(
            "bucket"
        ),
        "_y",
        "_n",
        "_p",
    )
    per = b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("_y").cast("long").alias("positives"),
        F.max("_n").alias("_tn"),
        F.max("_p").alias("_tp"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    rate = F.col("positives") / F.col("n")
    base = F.col("_tp") / F.col("_tn")
    return per.select(
        "bucket",
        "n",
        "positives",
        F.round(rate, 6).alias("response_rate"),
        F.round(F.when(base > 0, rate / base), 6).alias("lift"),
        F.round(
            F.when(
                F.col("_tp") > 0,
                F.sum("positives").over(w) / F.col("_tp"),
            ),
            6,
        ).alias("cum_capture"),
    ).orderBy("bucket")


def gwet_ac1(
    df: DataFrame,
    item_col: str,
    category_col: str,
) -> DataFrame:
    """Gwet's AC1 agreement coefficient, nominal categories (Gwet
    2008): the chance-corrected inter-rater agreement that stays
    informative under SKEWED label prevalence, where kappa and alpha
    collapse toward zero (the "kappa paradox" — two raters agreeing on
    97% of an almost-all-'clean' corpus can get kappa ≈ 0). Varying
    raters per item, like Krippendorff's alpha (X309):

        p_a = (1/n')·Σᵢ Σ_c n_ic(n_ic−1)/(mᵢ(mᵢ−1))
        π_c = (1/n')·Σᵢ n_ic/mᵢ
        p_e = (1/(q−1))·Σ_c π_c(1−π_c)     AC1 = (p_a − p_e)/(1 − p_e)

    over the n' items with mᵢ ≥ 2 ratings; q = observed category count.

    Scale design: the krippendorff_alpha plan family — one (item,
    category) cell count, one per-item re-aggregate, one q-row category
    aggregate, 1-row combines; q is label-bounded. Output one row:
    (n_items, q, p_a, p_e, ac1) — ac1 NULL when p_e = 1 (degenerate
    single-category corpus).
    """
    cells = (
        df.filter(
            F.col(item_col).isNotNull() & F.col(category_col).isNotNull()
        )
        .groupBy(F.col(item_col).alias("_i"), F.col(category_col).alias("_c"))
        .agg(F.count("*").cast("double").alias("_n"))
    )
    per_item = (
        cells.groupBy("_i")
        .agg(
            F.sum("_n").alias("_m"),
            F.sum(F.col("_n") * (F.col("_n") - 1)).alias("_pairs"),
        )
        .filter(F.col("_m") >= 2)
    )
    pa = per_item.agg(
        F.count("*").cast("double").alias("_items"),
        F.avg(
            F.col("_pairs") / (F.col("_m") * (F.col("_m") - 1))
        ).alias("_pa"),
    )
    # per-category mean share over pairable items (q-bounded relation)
    shares = (
        cells.join(per_item.select("_i", "_m"), "_i")
        .groupBy("_c")
        .agg(F.sum(F.col("_n") / F.col("_m")).alias("_sh"))
    )
    pe = shares.crossJoin(F.broadcast(pa)).agg(
        F.count("*").cast("double").alias("_q"),
        F.sum(
            (F.col("_sh") / F.col("_items"))
            * (1.0 - F.col("_sh") / F.col("_items"))
        ).alias("_spi"),
    )
    out = pa.crossJoin(F.broadcast(pe))
    pe_v = F.when(F.col("_q") > 1, F.col("_spi") / (F.col("_q") - 1.0))
    return out.select(
        F.col("_items").cast("long").alias("n_items"),
        F.col("_q").cast("long").alias("q"),
        F.round("_pa", 6).alias("p_a"),
        F.round(pe_v, 6).alias("p_e"),
        F.round(
            F.when(pe_v < 1.0, (F.col("_pa") - pe_v) / (1.0 - pe_v)), 6
        ).alias("ac1"),
    )


def power_divergence(
    df: DataFrame,
    row_col: str,
    col_col: str,
    lambda_: float = 2.0 / 3.0,
) -> DataFrame:
    """Cressie–Read power-divergence test of independence on a
    contingency table (Cressie & Read 1984): the one-parameter family
    that CONTAINS Pearson's χ² (λ=1) and the likelihood-ratio G²
    (λ→0), with λ=⅔ their recommended compromise — more stable than
    χ² under sparse cells, less anticonservative than G². All three
    are reported from ONE densified grid so the practitioner sees
    whether the conclusion is λ-sensitive:

        CR(λ) = 2/(λ(λ+1)) · Σ O[(O/E)^λ − 1],  E = rowtot·coltot/N

    (empty cells contribute 0 to CR/G² and E to χ², the standard
    conventions).

    Scale design: the corpus collapses to the (row, col) CELL relation
    in one hash aggregate; marginals are two cell-bounded aggregates;
    the FULL grid is their broadcast cross join left-joined with the
    observed cells — everything after the first aggregate is
    label-bounded control plane. Output one row:
    (n, n_rows, n_cols, dof, chi2, g2, cressie_read).
    """
    if lambda_ <= 0 or abs(lambda_ - 1.0) < 1e-12:
        raise ValueError(
            f"lambda_ must be in (0, 1) U (1, inf), got {lambda_}"
            " (chi2 and g2 are already reported)"
        )
    base = df.filter(
        F.col(row_col).isNotNull() & F.col(col_col).isNotNull()
    ).select(F.col(row_col).alias("_r"), F.col(col_col).alias("_c"))
    cells = base.groupBy("_r", "_c").agg(
        F.count("*").cast("double").alias("_o")
    )
    rm = cells.groupBy("_r").agg(F.sum("_o").alias("_rt")).select(
        F.col("_r").alias("_rr"), "_rt"
    )
    cm = cells.groupBy("_c").agg(F.sum("_o").alias("_ct")).select(
        F.col("_c").alias("_cc"), "_ct"
    )
    nt = cells.agg(F.sum("_o").alias("_n"))
    grid = (
        F.broadcast(rm)
        .crossJoin(F.broadcast(cm))
        .crossJoin(F.broadcast(nt))
        .join(
            cells,
            (F.col("_rr") == F.col("_r")) & (F.col("_cc") == F.col("_c")),
            "left",
        )
        .select(
            "_rr",
            "_cc",
            "_n",
            F.coalesce(F.col("_o"), F.lit(0.0)).alias("_ob"),
            (F.col("_rt") * F.col("_ct") / F.col("_n")).alias("_e"),
        )
    )
    lam = float(lambda_)
    o, e = F.col("_ob"), F.col("_e")
    agg = grid.agg(
        F.max("_n").alias("n"),
        F.count_distinct("_rr").alias("_nr"),
        F.count_distinct("_cc").alias("_nc"),
        F.sum((o - e) * (o - e) / e).alias("_chi2"),
        F.sum(F.when(o > 0, 2.0 * o * F.log(o / e)).otherwise(0.0)).alias(
            "_g2"
        ),
        F.sum(
            F.when(
                o > 0,
                2.0 / (lam * (lam + 1.0))
                * o
                * (F.pow(o / e, F.lit(lam)) - 1.0),
            ).otherwise(0.0)
        ).alias("_cr"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("_nr").cast("long").alias("n_rows"),
        F.col("_nc").cast("long").alias("n_cols"),
        ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("long").alias("dof"),
        F.round("_chi2", 6).alias("chi2"),
        F.round("_g2", 6).alias("g2"),
        F.round("_cr", 6).alias("cressie_read"),
    )


def chatterjee_xi(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Chatterjee's rank correlation ξ (Chatterjee, JASA 2021, eq. 1.5
    — the tie-general form): does Y look like a FUNCTION of X — 0 for
    independence, →1 for any measurable functional dependence, where
    Pearson/Spearman only see monotone trends. With rows sorted by X
    and r_i = #{j: y_j ≤ y_i}, l_i = #{j: y_j ≥ y_i}:

        ξ = 1 − n·Σ_{i<n} |r_{i+1} − r_i| / (2·Σ_i l_i (n − l_i))

    X-ties are broken by ascending Y (the paper breaks them uniformly
    at random; a deterministic rule keeps the statistic reproducible
    and lets the DuckDB twin replay it bit-for-bit — documented bias:
    within equal X the Y-ranks are locally sorted, nudging ξ upward at
    heavy X-tie rates).

    Scale design: adjacent-pair sums need NO global window — rows
    collapse to distinct (x, y) cells (within-cell adjacent rows have
    identical r, contributing 0), the cell sequence index and the
    y-rank counts are two range-partitioned prefix passes, and the
    "next cell" is a hash self-join on index+1. Output one row:
    (n, xi) — xi NULL when every y is tied (denominator 0).
    """
    base = df.select(
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    # ONE corpus aggregate (round 16, guide §1.2): the previous form
    # also aggregated base for the total count and the per-y counts —
    # three corpus scans where one suffices, because both derive from
    # the persisted distinct-(x, y) cell relation (Σ _c and a cell-sized
    # groupBy). The persist additionally feeds both prefix passes from
    # the cache (guide §5); everything downstream is cell-bounded.
    from swivel_spark_prep_spark.cache import track_persist

    cells = track_persist(
        base.groupBy("_x", "_y").agg(
            F.count("*").cast("double").alias("_c"),
            F.lit(1.0).alias("_one"),
        )
    )
    tot = cells.agg(F.sum("_c").alias("_n"))
    ycells = cells.groupBy("_y").agg(F.sum("_c").alias("_cy"))
    ycum = partitioned_prefix_sum(
        ycells, ["_y"], ["_cy"], ["_yb"], inclusive=False
    )
    idx = partitioned_prefix_sum(
        cells, ["_x", "_y"], ["_one"], ["_k"], inclusive=True
    )
    ranked = idx.join(ycum.select("_y", "_yb", "_cy"), "_y").crossJoin(
        F.broadcast(tot)
    )
    r = F.col("_yb") + F.col("_cy")  # #{y_j <= y_i}
    l = F.col("_n") - F.col("_yb")  # #{y_j >= y_i}
    # persisted: ranked feeds THREE consumers (both adjacent-pair join
    # sides and the denominator aggregate); cell-relation sized.
    ranked = track_persist(
        ranked.select("_k", "_c", r.alias("_r"), l.alias("_l"), "_n")
    )
    left = ranked.select(F.col("_k").alias("_ka"), F.col("_r").alias("_r1"))
    right = ranked.select(
        (F.col("_k") - 1).alias("_ka"), F.col("_r").alias("_r2")
    )
    num = left.join(right, "_ka").agg(
        F.sum(F.abs(F.col("_r2") - F.col("_r1"))).alias("_num")
    )
    den = ranked.agg(
        F.max("_n").alias("_nn"),
        F.sum(F.col("_c") * F.col("_l") * (F.col("_n") - F.col("_l"))).alias(
            "_den"
        ),
    )
    j = den.crossJoin(F.broadcast(num))
    xi = F.when(
        F.col("_den") > 0,
        1.0 - F.col("_nn") * F.coalesce(F.col("_num"), F.lit(0.0))
        / (2.0 * F.col("_den")),
    )
    return j.select(
        F.col("_nn").cast("long").alias("n"),
        F.round(xi, 6).alias("xi"),
    )


def cucconi_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Cucconi test for a JOINT location–scale shift between two
    samples (Cucconi 1968; moments per Marozzi 2009): one statistic
    covering the Lepage question with squared ranks instead of a
    two-test sum — U from the squared pooled ranks of sample B, V from
    the squared contrary ranks, combined through their exact null
    correlation ρ:

        U = (6·Σ_{j∈B} R_j² − n(N+1)(2N+1)) / √(mn(N+1)(2N+1)(8N+11)/5)
        V = same with (N+1−R_j)²
        ρ = 2(N²−4)/((2N+1)(8N+11)) − 1
        C = (U² + V² − 2ρUV) / (2(1−ρ²))        (~Exp(1) under H₀)

    Ties take pooled midranks (the standard practical convention; the
    classical moments assume continuity and are replayed verbatim).

    Scale design: the ansari_bradley shape — ONE distinct-value
    aggregate with two conditional-count columns, one range-partitioned
    prefix pass for midranks, ONE moments aggregate, then 1-row scalar
    arithmetic. Output: (n_a, n_b, u, v, rho, c_stat) — NULL u/v/c
    when either slice is empty or N < 3.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    cells = base.groupBy("_v").agg(
        F.count("*").cast("double").alias("_l"),
        F.sum((F.col("_g") == group_a).cast("double")).alias("_fa"),
        F.sum((F.col("_g") == group_b).cast("double")).alias("_fb"),
    )
    cum = partitioned_prefix_sum(cells, ["_v"], ["_l"], ["_cl"], inclusive=False)
    tot = cells.agg(F.sum("_l").alias("_N"))
    j = cum.crossJoin(F.broadcast(tot))
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0
    cr = F.col("_N") + 1.0 - r
    m = j.agg(
        F.max("_N").alias("nn"),
        F.sum("_fa").alias("na"),
        F.sum("_fb").alias("nb"),
        F.sum(F.col("_fb") * r * r).alias("sr2"),
        F.sum(F.col("_fb") * cr * cr).alias("scr2"),
    )
    nn, na, nb = F.col("nn"), F.col("na"), F.col("nb")
    cen = nb * (nn + 1.0) * (2.0 * nn + 1.0)
    den2 = na * nb * (nn + 1.0) * (2.0 * nn + 1.0) * (8.0 * nn + 11.0) / 5.0
    u = F.when(den2 > 0, (6.0 * F.col("sr2") - cen) / F.sqrt(den2))
    v = F.when(den2 > 0, (6.0 * F.col("scr2") - cen) / F.sqrt(den2))
    rho = 2.0 * (nn * nn - 4.0) / ((2.0 * nn + 1.0) * (8.0 * nn + 11.0)) - 1.0
    c = F.when(
        (den2 > 0) & (1.0 - rho * rho > 0),
        (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho)),
    )
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(u, 6).alias("u"),
        F.round(v, 6).alias("v"),
        F.round(rho, 6).alias("rho"),
        F.round(c, 6).alias("c_stat"),
    )


def lepage_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Lepage test for a joint location–scale alternative (Lepage
    1971): D = z_W² + z_AB², the squared standardized Wilcoxon rank
    sum (location) plus the squared standardized Ansari–Bradley sum
    (scale) — ~χ²₂ under H₀; the classical two-component complement to
    Cucconi's squared-rank statistic. Wilcoxon uses the tie-corrected
    variance (no continuity correction — Lepage's D is defined on the
    uncorrected z); Ansari–Bradley uses the conditional tie-exact
    moments (Conover 1999 §5.3), both over pooled midranks.

    Scale design: BOTH component statistics come from the SAME single
    distinct-value aggregate + one range-partitioned prefix pass (the
    ansari_bradley cells), then one moments aggregate and 1-row
    arithmetic. Output: (n_a, n_b, z_w, z_ab, d_stat) — each z NULL
    when its variance degenerates; d NULL unless both exist.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    cells = base.groupBy("_v").agg(
        F.count("*").cast("double").alias("_l"),
        F.sum((F.col("_g") == group_a).cast("double")).alias("_fa"),
        F.sum((F.col("_g") == group_b).cast("double")).alias("_fb"),
    )
    cum = partitioned_prefix_sum(cells, ["_v"], ["_l"], ["_cl"], inclusive=False)
    tot = cells.agg(F.sum("_l").alias("_N"))
    j = cum.crossJoin(F.broadcast(tot))
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0
    s = F.least(r, F.col("_N") + 1.0 - r)
    l = F.col("_l")
    m = j.agg(
        F.max("_N").alias("nn"),
        F.sum("_fa").alias("na"),
        F.sum("_fb").alias("nb"),
        F.sum(F.col("_fa") * r).alias("w"),
        F.sum(F.col("_fa") * s).alias("ab"),
        F.sum(l * s).alias("ls"),
        F.sum(l * s * s).alias("ls2"),
        F.sum(l * l * l - l).alias("tie3"),
    )
    nn, na, nb = F.col("nn"), F.col("na"), F.col("nb")
    ew = na * (nn + 1.0) / 2.0
    vw = (
        na * nb / 12.0
        * ((nn + 1.0) - F.col("tie3") / F.nullif(nn * (nn - 1.0), F.lit(0.0)))
    )
    zw = F.when(vw > 0, (F.col("w") - ew) / F.sqrt(vw))
    eab = na * F.col("ls") / nn
    vab = (
        na * nb * (nn * F.col("ls2") - F.col("ls") * F.col("ls"))
        / (nn * nn * F.nullif(nn - 1.0, F.lit(0.0)))
    )
    zab = F.when(vab > 0, (F.col("ab") - eab) / F.sqrt(vab))
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(zw, 6).alias("z_w"),
        F.round(zab, 6).alias("z_ab"),
        F.round(zw * zw + zab * zab, 6).alias("d_stat"),
    )


def bws_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Baumgartner–Weiß–Schindler two-sample test (Baumgartner, Weiß &
    Schindler, Biometrics 1998): a rank analogue of Cramér–von Mises
    with the variance-normalizing weight 1/(t(1−t)) that restores
    power in the TAILS, where CvM and Wilcoxon go blind. With R_i the
    pooled (mid)rank of the i-th ordered observation of sample A
    (size m, other size n, N = m+n):

        B_A = (1/m) Σ_{i=1..m} (R_i − (N/m)·i)²
                     / ( (i/(m+1))·(1 − i/(m+1)) · n·N/m )
        B   = (B_A + B_B)/2        (reject at α=.05 when B ≳ 2.493)

    Ties: pooled midranks; the per-sample index i within a tied run is
    an arbitrary assignment of consecutive integers, and the SUM over
    the run is invariant to that assignment, so the statistic is
    deterministic.

    Scale design: one distinct-value aggregate + one range-partitioned
    prefix pass gives each tied run its pooled midrank and per-sample
    start offset; the run then explodes to one row PER OBSERVATION
    (sequence(start+1, start+count) — corpus-LINEAR, one output row per
    input row, never a pair blow-up), and B_A/B_B are one aggregate.
    Output: (n_a, n_b, b_a, b_b, b_stat) — NULL when either slice is
    empty.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    cells = base.groupBy("_v").agg(
        F.count("*").cast("double").alias("_l"),
        F.sum((F.col("_g") == group_a).cast("double")).alias("_fa"),
        F.sum((F.col("_g") == group_b).cast("double")).alias("_fb"),
    )
    cum = partitioned_prefix_sum(
        cells, ["_v"], ["_l", "_fa", "_fb"], ["_cl", "_ca", "_cb"],
        inclusive=False,
    )
    tot = cells.agg(
        F.sum("_l").alias("_N"),
        F.sum("_fa").alias("_m"),
        F.sum("_fb").alias("_nb2"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0  # pooled midrank
    # one exploded row per observation of each sample within the run:
    # i walks start+1 .. start+count (corpus-linear replicate explode)
    per = []
    for fcol, scol, msize, osize in (
        ("_fa", "_ca", "_m", "_nb2"),
        ("_fb", "_cb", "_nb2", "_m"),
    ):
        e = (
            j.filter(F.col(fcol) > 0)
            .select(
                F.lit(fcol == "_fa").alias("_is_a"),
                r.alias("_r"),
                F.col(msize).alias("_sm"),
                F.col(osize).alias("_so"),
                F.col("_N").alias("_nn"),
                F.explode(
                    F.sequence(
                        (F.col(scol) + 1).cast("long"),
                        (F.col(scol) + F.col(fcol)).cast("long"),
                    )
                ).alias("_i"),
            )
        )
        per.append(e)
    rows = per[0].unionByName(per[1])
    i = F.col("_i").cast("double")
    sm, so, nn = F.col("_sm"), F.col("_so"), F.col("_nn")
    t = i / (sm + 1.0)
    term = (
        (F.col("_r") - nn / sm * i) * (F.col("_r") - nn / sm * i)
        / F.nullif(t * (1.0 - t) * so * nn / sm, F.lit(0.0))
    )
    agg = rows.agg(
        F.max(F.when(F.col("_is_a"), sm)).alias("na"),
        F.max(F.when(~F.col("_is_a"), sm)).alias("nb"),
        (F.sum(F.when(F.col("_is_a"), term))
         / F.nullif(F.max(F.when(F.col("_is_a"), sm)), F.lit(0.0))).alias("ba"),
        (F.sum(F.when(~F.col("_is_a"), term))
         / F.nullif(F.max(F.when(~F.col("_is_a"), sm)), F.lit(0.0))).alias("bb"),
    )
    return agg.select(
        F.coalesce(F.col("na"), F.lit(0.0)).cast("long").alias("n_a"),
        F.coalesce(F.col("nb"), F.lit(0.0)).cast("long").alias("n_b"),
        F.round("ba", 6).alias("b_a"),
        F.round("bb", 6).alias("b_b"),
        F.round((F.col("ba") + F.col("bb")) / 2.0, 6).alias("b_stat"),
    )


# Acklam's rational approximation to the inverse normal CDF (Peter
# Acklam, 2002 — the widely-reimplemented public algorithm; |relative
# error| < 1.15e-9 over (0,1)). Only the UPPER half p ∈ (0.5, 1) is
# implemented — fligner_killeen feeds p = 0.5 + r/(2(N+1)) — so the
# lower-tail branch is omitted. The coefficients and the exact
# operation ORDER are mirrored verbatim in the generated DuckDB twin
# (queries/extra.py) so both engines produce the identical double.
_ACKLAM_A = (
    -3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
    1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00,
)
_ACKLAM_B = (
    -5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
    6.680131188771972e+01, -1.328068155288572e+01,
)
_ACKLAM_C = (
    -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
    -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00,
)
_ACKLAM_D = (
    7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
    3.754408661907416e+00,
)
_ACKLAM_P_HIGH = 0.97575  # 1 - p_low: central/upper-tail switch point


def _acklam_probit(p):
    """Φ⁻¹(p) for a Column p strictly in (0.5, 1) — see _ACKLAM_*."""
    a1, a2, a3, a4, a5, a6 = _ACKLAM_A
    b1, b2, b3, b4, b5 = _ACKLAM_B
    c1, c2, c3, c4, c5, c6 = _ACKLAM_C
    d1, d2, d3, d4 = _ACKLAM_D
    q = p - 0.5
    rr = q * q
    central = (
        (((((a1 * rr + a2) * rr + a3) * rr + a4) * rr + a5) * rr + a6) * q
        / (((((b1 * rr + b2) * rr + b3) * rr + b4) * rr + b5) * rr + 1.0)
    )
    qq = F.sqrt(-2.0 * F.log(1.0 - p))
    upper = -(
        ((((c1 * qq + c2) * qq + c3) * qq + c4) * qq + c5) * qq + c6
    ) / ((((d1 * qq + d2) * qq + d3) * qq + d4) * qq + 1.0)
    return F.when(p <= _ACKLAM_P_HIGH, central).otherwise(upper)


def acklam_probit_sql(expr: str) -> str:
    """The identical Acklam upper-half probit as a DuckDB SQL scalar
    over ``expr`` (a double expression string) — repr() float literals
    and the same operation order as _acklam_probit, so both engines
    compute the identical IEEE double."""
    a1, a2, a3, a4, a5, a6 = (repr(x) for x in _ACKLAM_A)
    b1, b2, b3, b4, b5 = (repr(x) for x in _ACKLAM_B)
    c1, c2, c3, c4, c5, c6 = (repr(x) for x in _ACKLAM_C)
    d1, d2, d3, d4 = (repr(x) for x in _ACKLAM_D)
    p = f"({expr})"
    q = f"({p} - 0.5)"
    rr = f"({q} * {q})"
    central = (
        f"(((((({a1} * {rr} + {a2}) * {rr} + {a3}) * {rr} + {a4}) * {rr} "
        f"+ {a5}) * {rr} + {a6}) * {q} "
        f"/ ((((({b1} * {rr} + {b2}) * {rr} + {b3}) * {rr} + {b4}) * {rr} "
        f"+ {b5}) * {rr} + 1.0))"
    )
    qq = f"sqrt(-2.0 * ln(1.0 - {p}))"
    upper = (
        f"(-((((({c1} * {qq} + {c2}) * {qq} + {c3}) * {qq} + {c4}) * {qq} "
        f"+ {c5}) * {qq} + {c6}) "
        f"/ (((({d1} * {qq} + {d2}) * {qq} + {d3}) * {qq} + {d4}) * {qq} "
        f"+ 1.0))"
    )
    return f"(CASE WHEN {p} <= {repr(_ACKLAM_P_HIGH)} THEN {central} ELSE {upper} END)"


def fligner_killeen(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Fligner–Killeen k-sample scale test (Fligner & Killeen 1976;
    the median-centered normal-scores form of Conover, Johnson &
    Johnson 1981 — R's fligner.test): are the group DISPERSIONS equal —
    the rank-robust k-group generalization of Ansari–Bradley (X367),
    and the variance-homogeneity screen that, unlike Bartlett (X345),
    survives heavy tails. Each value is centered by its GROUP median,
    the absolute deviations are pooled and midranked, mapped through
    normal scores a = Φ⁻¹(½ + r/(2(N+1))) (Acklam probit — identical
    double arithmetic in the DuckDB twin), and

        X² = Σ_g n_g (ā_g − ā)² / s²,   s² = Σ(a − ā)²/(N−1)   (~χ²ₖ₋₁)

    Scale design: group medians are ONE grouped exact-percentile
    aggregate (broadcast back); midranks are the distinct-value
    aggregate + range-partitioned prefix pass; scores attach to rows
    by a hash join on the deviation value; the statistic is one k-row
    grouped aggregate against 1-row broadcast moments. Output:
    (k, n, fk_stat, dof) — fk NULL when the score variance is 0.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_x")
    )
    med = base.groupBy("_g").agg(F.median("_x").alias("_med"))
    u = base.join(F.broadcast(med), "_g").select(
        "_g", F.abs(F.col("_x") - F.col("_med")).alias("_u")
    )
    cells = u.groupBy("_u").agg(F.count("*").cast("double").alias("_l"))
    cum = partitioned_prefix_sum(cells, ["_u"], ["_l"], ["_cl"], inclusive=False)
    tot = cells.agg(F.sum("_l").alias("_N"))
    scored = cum.crossJoin(F.broadcast(tot))
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0
    p = 0.5 + r / (2.0 * (F.col("_N") + 1.0))
    scored = scored.select("_u", _acklam_probit(p).alias("_a"))
    rows = u.join(scored, "_u")
    per = rows.groupBy("_g").agg(
        F.count("*").cast("double").alias("_ng"), F.sum("_a").alias("_sa")
    )
    overall = rows.agg(
        F.count("*").cast("double").alias("_nn"),
        F.sum("_a").alias("_ta"),
        F.sum(F.col("_a") * F.col("_a")).alias("_ta2"),
    )
    j = per.crossJoin(F.broadcast(overall))
    abar = F.col("_ta") / F.col("_nn")
    gbar = F.col("_sa") / F.col("_ng")
    agg = j.agg(
        F.count("*").cast("long").alias("k"),
        F.max("_nn").alias("_n"),
        F.sum(F.col("_ng") * (gbar - abar) * (gbar - abar)).alias("_num"),
        F.max(
            (F.col("_ta2") - F.col("_nn") * abar * abar)
            / F.nullif(F.col("_nn") - 1.0, F.lit(0.0))
        ).alias("_s2"),
    )
    return agg.select(
        "k",
        F.col("_n").cast("long").alias("n"),
        F.round(
            F.when(F.col("_s2") > 0, F.col("_num") / F.col("_s2")), 6
        ).alias("fk_stat"),
        (F.col("k") - 1).cast("long").alias("dof"),
    )


def page_trend(
    df: DataFrame,
    value_col: str,
    block_col: str,
    treat_col: str,
) -> DataFrame:
    """Page's L trend test (Page 1963) for an ORDERED alternative
    across k treatments within b blocks — the within-block companion
    to Cuzick (X358): does the value RISE along the treatment order
    consistently across blocks, where Friedman (X287's family) only
    asks "any difference". Treatments are scored 1..k by ascending
    treatment label; within each block values take midranks;

        L = Σ_j score_j · R_j,   R_j = Σ_blocks rank_j
        E[L] = b·k(k+1)²/4,  Var[L] = b·k²(k+1)(k²−1)/144

    (classical no-tie variance, replayed verbatim — the X358
    convention). Only COMPLETE blocks (all k treatments present)
    enter, so every block contributes the same rank mass.

    Scale design: blocks stay a relation (never collected); the
    treatment vocabulary is k-bounded (bounded_distinct); within-block
    midranks ride the grouped value-cardinality prefix pass; L is one
    aggregate. Output: (n_blocks, k, l_stat, e_l, z) — z NULL when
    b = 0 or k < 2.
    """
    from swivel_spark_prep_spark.cache import bounded_distinct

    base = df.select(
        F.col(block_col).alias("_b"),
        F.col(treat_col).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull() & F.col("_t").isNotNull())
    treats = sorted(bounded_distinct(base, "_t", cap=50))
    k = len(treats)
    if k < 2:
        raise ValueError(f"need >= 2 ordered treatments, got {k}")
    score = F.create_map(
        *[F.lit(x) for pair in ((t, i + 1) for i, t in enumerate(treats))
          for x in pair]
    )
    complete = (
        base.groupBy("_b")
        .agg(F.countDistinct("_t").alias("_kt"))
        .filter(F.col("_kt") == k)
        .select("_b")
    )
    grid = base.join(complete, "_b")
    ranked = _fractional_ranks(grid, "_v", "_r", "_b")
    agg = ranked.agg(
        (F.countDistinct("_b")).cast("double").alias("_bb"),
        F.sum(score[F.col("_t")] * F.col("_r")).alias("_l"),
    )
    bb = F.col("_bb")
    kk = F.lit(float(k))
    el = bb * kk * (kk + 1.0) * (kk + 1.0) / 4.0
    var = bb * kk * kk * (kk + 1.0) * (kk * kk - 1.0) / 144.0
    return agg.select(
        bb.cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k"),
        F.round("_l", 6).alias("l_stat"),
        F.round(el, 6).alias("e_l"),
        F.round(
            F.when(var > 0, (F.col("_l") - el) / F.sqrt(var)), 6
        ).alias("z"),
    )


def quade_test(
    df: DataFrame,
    value_col: str,
    block_col: str,
    treat_col: str,
) -> DataFrame:
    """Quade test (Quade 1979) for k related treatments over b blocks —
    Friedman weighted by how much each block DISCRIMINATES: blocks are
    ranked by their within-block RANGE (Q_i = midrank of max−min), each
    within-block rank is centered and weighted S_ij = Q_i(r_ij −
    (k+1)/2), and

        F = (b−1)·B / (A − B),  A = ΣΣ S_ij²,  B = (1/b)·Σ_j S_j²

    with F ~ F(k−1, (b−1)(k−1)) under H₀ (conventional A = B
    degenerate case → NULL). More powerful than Friedman when block
    scales differ — exactly the shape of per-day activity data. Only
    COMPLETE blocks enter (the page_trend convention).

    Scale design: within-block midranks and the block-range midranks
    are both value-cardinality prefix passes (blocks never collected);
    A and the per-treatment sums are single aggregates over the grid
    relation (treatment vocabulary k-bounded). Output:
    (n_blocks, k, f_stat).
    """
    from swivel_spark_prep_spark.cache import bounded_distinct

    base = df.select(
        F.col(block_col).alias("_b"),
        F.col(treat_col).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    ).filter(F.col("_v").isNotNull() & F.col("_t").isNotNull())
    treats = sorted(bounded_distinct(base, "_t", cap=50))
    k = len(treats)
    if k < 2:
        raise ValueError(f"need >= 2 treatments, got {k}")
    complete = (
        base.groupBy("_b")
        .agg(F.countDistinct("_t").alias("_kt"))
        .filter(F.col("_kt") == k)
        .select("_b")
    )
    from swivel_spark_prep_spark.cache import track_persist

    # persisted: `grid` feeds the within-block rank pass AND the block
    # ranges; `s` feeds the per-treatment sums AND the A roll-up — each
    # re-derivation would re-run the complete-block join + prefix passes
    # and double the plan per consumer (guide §5)
    grid = track_persist(base.join(complete, "_b"))
    ranked = _fractional_ranks(grid, "_v", "_r", "_b")
    ranges = grid.groupBy("_b").agg(
        (F.max("_v") - F.min("_v")).alias("_rg")
    )
    qranks = _fractional_ranks(ranges, "_rg", "_q", None).select("_b", "_q")
    s = track_persist(
        ranked.join(qranks, "_b").select(
            "_t",
            (F.col("_q") * (F.col("_r") - (k + 1) / 2.0)).alias("_s"),
        )
    )
    per_t = s.groupBy("_t").agg(F.sum("_s").alias("_sj"))
    atot = s.agg(
        F.sum(F.col("_s") * F.col("_s")).alias("_a"),
        (F.count("*") / F.lit(float(k))).alias("_bb"),
    )
    j = per_t.crossJoin(F.broadcast(atot))
    agg = j.agg(
        F.max("_bb").alias("_bb"),
        F.max("_a").alias("_a"),
        (F.sum(F.col("_sj") * F.col("_sj")) / F.max("_bb")).alias("_bsum"),
    )
    bb, a, bsum = F.col("_bb"), F.col("_a"), F.col("_bsum")
    fstat = F.when(a - bsum > 0, (bb - 1.0) * bsum / (a - bsum))
    return agg.select(
        bb.cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k"),
        F.round(fstat, 6).alias("f_stat"),
    )


def weighted_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    weights: str = "quadratic",
) -> DataFrame:
    """Weighted Cohen's kappa for ORDINAL labels (Cohen 1968): chance-
    corrected agreement where near-misses earn partial credit —

        κ_w = (p_o,w − p_e,w) / (1 − p_e,w),
        w_ij = 1 − (i−j)²/(k−1)²   (quadratic; "linear" = 1 − |i−j|/(k−1))

    with i, j the 0-based ordinal index of each category in ascending
    label order (the convention both engines share). Quadratic-weighted
    kappa is the standard metric for ordinal rater agreement (and the
    Kaggle QWK); plain kappa (cohens_kappa) treats a one-step miss like
    a worst-case miss.

    Scale design: one (a, b)-cell aggregate, two k-row marginal
    aggregates, and the chance term is the k×k broadcast cross of the
    marginals — all bounded by the label vocabulary (bounded_distinct,
    raises past the cap). Output one row: (k, n, po_w, pe_w, kappa_w)
    — kappa NULL when p_e,w = 1 (degenerate marginals).
    """
    from swivel_spark_prep_spark.cache import bounded_distinct

    if weights not in ("quadratic", "linear"):
        raise ValueError(f"unknown weights {weights!r}")
    base = df.filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    cats = sorted(
        set(bounded_distinct(base, "_a", cap=1000))
        | set(bounded_distinct(base, "_b", cap=1000))
    )
    k = len(cats)
    if k < 2:
        raise ValueError(f"need >= 2 ordinal categories, got {k}")
    idx = F.create_map(
        *[F.lit(x) for pair in ((c, i) for i, c in enumerate(cats))
          for x in pair]
    )

    def w(di):
        if weights == "quadratic":
            return 1.0 - (di * di) / float((k - 1) * (k - 1))
        return 1.0 - F.abs(di) / float(k - 1)

    cells = base.groupBy("_a", "_b").agg(F.count("*").cast("double").alias("_n"))
    cells = cells.select(
        idx[F.col("_a")].cast("double").alias("_i"),
        idx[F.col("_b")].cast("double").alias("_j"),
        "_n",
    )
    # every branch below derives from `cells`; Spark 4's resolver throws
    # AMBIGUOUS_REFERENCE when a df is joined with aggregates derived
    # from itself — rename each branch's columns before joining (the
    # mood_median_test/theils_u convention)
    tot = cells.agg(F.sum("_n").alias("_N"))
    po = cells.select(
        F.col("_i").alias("_pi"),
        F.col("_j").alias("_pj"),
        F.col("_n").alias("_pn"),
    ).crossJoin(F.broadcast(tot)).agg(
        F.max("_N").alias("_N"),
        (
            F.sum(w(F.col("_pi") - F.col("_pj")) * F.col("_pn")) / F.max("_N")
        ).alias("_po"),
    )
    ma = cells.groupBy("_i").agg(F.sum("_n").alias("_ra"))
    mb = cells.groupBy("_j").agg(F.sum("_n").alias("_cb"))
    pe = (
        ma.select(F.col("_i").alias("_mi"), "_ra")
        .crossJoin(  # k×k marginal cross, label-bounded
            F.broadcast(mb.select(F.col("_j").alias("_mj"), "_cb"))
        )
        .crossJoin(F.broadcast(tot.select(F.col("_N").alias("_N2"))))
        .agg(
            (
                F.sum(
                    w(F.col("_mi") - F.col("_mj")) * F.col("_ra") * F.col("_cb")
                )
                / (F.max("_N2") * F.max("_N2"))
            ).alias("_pe")
        )
    )
    j = po.crossJoin(F.broadcast(pe))
    kap = F.when(
        1.0 - F.col("_pe") > 0,
        (F.col("_po") - F.col("_pe")) / (1.0 - F.col("_pe")),
    )
    return j.select(
        F.lit(k).cast("long").alias("k"),
        F.col("_N").cast("long").alias("n"),
        F.round("_po", 6).alias("po_w"),
        F.round("_pe", 6).alias("pe_w"),
        F.round(kap, 6).alias("kappa_w"),
    )


def mood_dispersion(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mood's squared-rank dispersion test (Mood 1954): are two samples
    equally SPREAD about the common center — the squared-deviation
    cousin of Ansari–Bradley (X367: triangular scores) and the scale
    half of Lepage (X387), with scores that weight extreme ranks
    quadratically. With pooled midranks R_i over N = m + n values:

        T = Σ_{i∈A} (R_i − (N+1)/2)²
        E[T]   = m (N² − 1) / 12
        Var[T] = m n (N + 1)(N² − 4) / 180
        z = (T − E) / √Var

    Ties take pooled midranks; the classical no-tie moments are
    replayed verbatim by both engines (the cucconi_test convention).
    Midrank scores are exact multiples of 1/4 in doubles, so T carries
    no float-ordering noise.

    Scale design: the ansari_bradley shape — ONE distinct-value
    aggregate with conditional-count columns, one range-partitioned
    prefix pass for midranks, ONE moments aggregate, 1-row scalar
    arithmetic. Output: (n_a, n_b, t_stat, z) — NULL z when either
    slice is empty or N < 3 (Var = 0).
    """
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    cells = base.groupBy("_v").agg(
        F.count("*").cast("double").alias("_l"),
        F.sum((F.col("_g") == group_a).cast("double")).alias("_fa"),
        F.sum((F.col("_g") == group_b).cast("double")).alias("_fb"),
    )
    cum = partitioned_prefix_sum(cells, ["_v"], ["_l"], ["_cl"], inclusive=False)
    tot = cells.agg(F.sum("_l").alias("_N"))
    j = cum.crossJoin(F.broadcast(tot))
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0
    sc = (r - (F.col("_N") + 1.0) / 2.0) * (r - (F.col("_N") + 1.0) / 2.0)
    m = j.agg(
        F.max("_N").alias("nn"),
        F.sum("_fa").alias("na"),
        F.sum("_fb").alias("nb"),
        F.sum(F.col("_fa") * sc).alias("t"),
    )
    nn, na, nb = F.col("nn"), F.col("na"), F.col("nb")
    et = na * (nn * nn - 1.0) / 12.0
    vt = na * nb * (nn + 1.0) * (nn * nn - 4.0) / 180.0
    z = F.when(vt > 0, (F.col("t") - et) / F.sqrt(vt))
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(F.col("t"), 6).alias("t_stat"),
        F.round(z, 6).alias("z"),
    )


def dagostino_k2(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """D'Agostino–Pearson K² omnibus normality test (D'Agostino 1970
    skewness transform; Anscombe & Glynn 1983 kurtosis transform;
    D'Agostino, Belanger & D'Agostino 1990 for the combination): are
    the values plausibly Gaussian — the moment-based complement to the
    ECDF screens (Kuiper/Watson X379, KS X157), and the finite-sample-
    calibrated sibling of X272's Jarque–Bera (JB uses the raw g1²/g2²
    asymptotics; K² transforms each to a z first). From population central
    moments m₂..m₄ (g1 = m₃/m₂^1.5, b2 = m₄/m₂²):

      skewness: Y = g1 √((n+1)(n+3)/(6(n−2))),
                β₂ = 3(n²+27n−70)(n+1)(n+3) / ((n−2)(n+5)(n+7)(n+9)),
                W² = −1+√(2(β₂−1)), δ = 1/√(ln W), α = √(2/(W²−1)),
                Z₁ = δ ln(Y/α + √((Y/α)²+1))
      kurtosis: E = 3(n−1)/(n+1),
                V = 24n(n−2)(n−3)/((n+1)²(n+3)(n+5)), x = (b2−E)/√V,
                √β₁ = 6(n²−5n+2)/((n+7)(n+9)) ·
                      √(6(n+3)(n+5)/(n(n−2)(n−3))),
                A = 6 + 8/√β₁ (2/√β₁ + √(1+4/β₁)),
                Z₂ = ((1−2/(9A)) − ∛((1−2/A)/(1+x√(2/(A−4))))) / √(2/(9A))
      K² = Z₁² + Z₂²   (~χ²₂ under normality)

    Every step is closed-form scalar arithmetic replayed in the same
    order by both engines (CBRT is sign-preserving in both); the only
    data passes are the two moment aggregates.

    Scale design: ONE mean aggregate, one broadcast-mean central-moment
    aggregate, then 1-row arithmetic — nothing but scans. Output:
    (n, g1, b2, z_skew, z_kurt, k2) — NULL transforms when n < 8
    (below which the skewness W² ≤ 1 and δ is undefined — the same
    bound scipy enforces), m₂ = 0, or the Z₂ denominator
    1 + x√(2/(A−4)) hits 0.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(x.alias("_v"))
    mean = base.agg(
        F.count("*").cast("double").alias("_n"),
        (F.sum("_v") / F.count("*")).alias("_m"),
    )
    d = F.col("_v") - F.col("_m")
    mom = base.crossJoin(F.broadcast(mean)).agg(
        F.max("_n").alias("n"),
        (F.sum(d * d) / F.max("_n")).alias("m2"),
        (F.sum(d * d * d) / F.max("_n")).alias("m3"),
        (F.sum(d * d * d * d) / F.max("_n")).alias("m4"),
    )
    n, m2 = F.col("n"), F.col("m2")
    ok = (n >= 8) & (m2 > 0)
    g1 = F.when(ok, F.col("m3") / F.pow(m2, 1.5))
    b2 = F.when(ok, F.col("m4") / (m2 * m2))
    y = g1 * F.sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0)))
    beta2 = (
        3.0 * (n * n + 27.0 * n - 70.0) * (n + 1.0) * (n + 3.0)
        / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    )
    w2 = -1.0 + F.sqrt(2.0 * (beta2 - 1.0))
    # at n = 7, beta2 = 3 EXACTLY, so w2 = 1 makes both ln(W) and w2-1
    # degenerate; nullif-guard them (ANSI throws on the division even
    # when the result only feeds the n>=8-gated NULL branch)
    delta = 1.0 / F.sqrt(F.nullif(0.5 * F.log(w2), F.lit(0.0)))
    alpha = F.sqrt(2.0 / F.nullif(w2 - 1.0, F.lit(0.0)))
    z1 = delta * F.log(y / alpha + F.sqrt((y / alpha) * (y / alpha) + 1.0))
    eb2 = 3.0 * (n - 1.0) / (n + 1.0)
    vb2 = (
        24.0 * n * (n - 2.0) * (n - 3.0)
        / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
    )
    xx = (b2 - eb2) / F.sqrt(vb2)
    sb1 = (
        6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0))
        * F.sqrt(6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0)))
    )
    aa = 6.0 + 8.0 / sb1 * (2.0 / sb1 + F.sqrt(1.0 + 4.0 / (sb1 * sb1)))
    z2den = 1.0 + xx * F.sqrt(2.0 / (aa - 4.0))
    z2 = (
        (1.0 - 2.0 / (9.0 * aa))
        - F.cbrt((1.0 - 2.0 / aa) / F.nullif(z2den, F.lit(0.0)))
    ) / F.sqrt(2.0 / (9.0 * aa))
    return mom.select(
        n.cast("long").alias("n"),
        F.round(g1, 6).alias("g1"),
        F.round(b2, 6).alias("b2"),
        F.round(z1, 6).alias("z_skew"),
        F.round(z2, 6).alias("z_kurt"),
        F.round(z1 * z1 + z2 * z2, 6).alias("k2"),
    )


def siegel_tukey(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Siegel–Tukey dispersion test (Siegel & Tukey 1960): rank the
    pooled sample from the OUTSIDE IN — 1 to the lowest value, 2 and 3
    to the two highest, 4 and 5 to the next two lowest, and so on — so
    a Wilcoxon sum on the zig-zag scores compares spreads while reusing
    the Wilcoxon null. The third member of the suite's scale-test
    family (X367 Ansari triangular scores, X401 Mood squared scores).
    Conventions, replayed verbatim by both engines: no observation is
    dropped at odd N (scores 1..N are always assigned); tied values
    average their positional scores; the conditional tie-exact linear-
    rank moments (Conover) standardize T:

        E[T]   = n_a Σ l·s / N
        Var[T] = n_a n_b (N Σ l·s² − (Σ l·s)²) / (N² (N−1))

    The tie-averaged score of a value block occupying sorted positions
    lo..hi is computed in CLOSED FORM (split the range at ⌈N/2⌉; each
    side is an arithmetic sum minus an odd/even count — exact integer
    arithmetic in doubles), so no per-observation explode is needed.

    Scale design: the ansari_bradley shape — ONE distinct-value
    aggregate, one range-partitioned prefix pass, closed-form block
    scores, ONE moments aggregate, 1-row arithmetic. Output:
    (n_a, n_b, t_stat, z) — NULL z when a slice is empty or N < 2.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    cells = base.groupBy("_v").agg(
        F.count("*").cast("double").alias("_l"),
        F.sum((F.col("_g") == group_a).cast("double")).alias("_fa"),
        F.sum((F.col("_g") == group_b).cast("double")).alias("_fb"),
    )
    cum = partitioned_prefix_sum(cells, ["_v"], ["_l"], ["_cl"], inclusive=False)
    tot = cells.agg(F.sum("_l").alias("_N"))
    j = cum.crossJoin(F.broadcast(tot))
    nn_ = F.col("_N")
    lo = F.col("_cl") + 1.0
    hi = F.col("_cl") + F.col("_l")
    c = F.floor(nn_ / 2.0).cast("double")  # each half holds ⌊N/2⌋ ranks
    # bottom segment [lo, min(hi, c)]: score(p) = 2p − (p odd)
    b_hi = F.least(hi, c)
    n_odd = F.floor((b_hi + 1.0) / 2.0) - F.floor(lo / 2.0)
    sum_b = F.when(
        b_hi >= lo, (lo + b_hi) * (b_hi - lo + 1.0) - n_odd
    ).otherwise(F.lit(0.0))
    # top segment [max(lo, N−c+1), hi] in depth q = N+1−p:
    # score = 2q − (q even)
    t_lo = F.greatest(lo, nn_ - c + 1.0)
    q_lo = nn_ + 1.0 - hi
    q_hi = nn_ + 1.0 - t_lo
    n_even = F.floor(q_hi / 2.0) - F.floor((q_lo - 1.0) / 2.0)
    sum_t = F.when(
        hi >= t_lo, (q_lo + q_hi) * (q_hi - q_lo + 1.0) - n_even
    ).otherwise(F.lit(0.0))
    # odd N leaves a single middle position (N+1)/2 on neither side —
    # it is visited LAST and always carries score N
    mid_p = (nn_ + 1.0) / 2.0
    sum_m = F.when(
        (F.pmod(nn_, F.lit(2.0)) == 1.0) & (lo <= mid_p) & (mid_p <= hi),
        nn_,
    ).otherwise(F.lit(0.0))
    s = (sum_b + sum_t + sum_m) / F.col("_l")
    m = j.agg(
        F.max("_N").alias("nn"),
        F.sum("_fa").alias("na"),
        F.sum("_fb").alias("nb"),
        F.sum(F.col("_fa") * s).alias("t"),
        F.sum(F.col("_l") * s).alias("ls"),
        F.sum(F.col("_l") * s * s).alias("ls2"),
    )
    nn, na, nb = F.col("nn"), F.col("na"), F.col("nb")
    et = na * F.col("ls") / nn
    vt = (
        na * nb * (nn * F.col("ls2") - F.col("ls") * F.col("ls"))
        / (nn * nn * F.nullif(nn - 1.0, F.lit(0.0)))
    )
    z = F.when(vt > 0, (F.col("t") - et) / F.sqrt(vt))
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(F.col("t"), 6).alias("t_stat"),
        F.round(z, 6).alias("z"),
    )


def runs_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Wald–Wolfowitz two-sample runs test (1940): pool both samples,
    sort by value, count maximal runs of same-group labels — ANY
    distributional difference (location, scale, shape) shortens runs.
    The omnibus complement to the targeted rank tests; the time-order
    runs screens (X315/X374) test randomness of ONE sequence, this
    tests identity of TWO distributions. Tie convention, documented
    and replayed by both engines: within a tied value block the
    group-a observations sort before group-b (sort key (value, group
    slot)), so runs are deterministic. Classical moments:

        E[R] = 1 + 2mn/N,  Var[R] = 2mn(2mn − N) / (N² (N−1))

    Scale design: the run count NEVER materializes the sorted sequence
    — a block of f_a a's then f_b b's contributes 1 internal
    transition when both are present, and block boundaries contribute
    (last label ≠ next first label), so R = 1 + Σ internal + Σ
    boundary comes from the distinct-value cells + ONE fan-out-1
    adjacency join on the exclusive prefix count (next block's offset
    equals this block's offset + length). Output: (n_a, n_b, runs, z)
    — NULL z when a slice is empty or Var = 0.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    cells = base.groupBy("_v").agg(
        F.count("*").cast("double").alias("_l"),
        F.sum((F.col("_g") == group_a).cast("double")).alias("_fa"),
        F.sum((F.col("_g") == group_b).cast("double")).alias("_fb"),
    )
    cum = partitioned_prefix_sum(cells, ["_v"], ["_l"], ["_cl"], inclusive=False)
    has_a = F.col("_fa") > 0
    has_b = F.col("_fb") > 0
    blocks = cum.select(
        "_cl",
        (F.col("_cl") + F.col("_l")).alias("_end"),
        (has_a & has_b).cast("double").alias("_internal"),
        F.when(has_b, F.lit("b")).otherwise(F.lit("a")).alias("_last"),
        F.when(has_a, F.lit("a")).otherwise(F.lit("b")).alias("_first"),
    )
    nxt = blocks.select(
        F.col("_cl").alias("_ncl"), F.col("_first").alias("_nfirst")
    )
    adj = blocks.join(nxt, F.col("_end") == F.col("_ncl"))
    bnd = adj.agg(
        F.sum((F.col("_last") != F.col("_nfirst")).cast("double")).alias("_bd")
    )
    m = cum.agg(
        F.sum("_l").alias("nn"),
        F.sum("_fa").alias("na"),
        F.sum("_fb").alias("nb"),
        F.sum(((F.col("_fa") > 0) & (F.col("_fb") > 0)).cast("double")).alias(
            "_int"
        ),
    ).crossJoin(F.broadcast(bnd))
    nn, na, nb = F.col("nn"), F.col("na"), F.col("nb")
    runs = F.when(
        nn > 0, 1.0 + F.col("_int") + F.coalesce(F.col("_bd"), F.lit(0.0))
    )
    er = 1.0 + 2.0 * na * nb / nn
    vr = (
        2.0 * na * nb * (2.0 * na * nb - nn)
        / (nn * nn * F.nullif(nn - 1.0, F.lit(0.0)))
    )
    z = F.when((na > 0) & (nb > 0) & (vr > 0), (runs - er) / F.sqrt(vr))
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        runs.cast("long").alias("runs"),
        F.round(z, 6).alias("z"),
    )


#: Zelen & Severo (Abramowitz–Stegun 26.2.17) Φ approximation
#: coefficients — |error| < 7.5e-8, far inside the suite's round-6
#: comparison; the DuckDB twins replay the identical literals.
_PHI_B = (0.319381530, -0.356563782, 1.781477937,
          -1.821255978, 1.330274429)
_PHI_P = 0.2316419


def _norm_cdf(x):
    """Standard normal CDF as a Column expression (Zelen–Severo
    polynomial; sign-folded). Same operation order as the SQL twin."""
    ax = F.abs(x)
    k = 1.0 / (1.0 + _PHI_P * ax)
    poly = (
        _PHI_B[0] * k
        + _PHI_B[1] * k * k
        + _PHI_B[2] * k * k * k
        + _PHI_B[3] * k * k * k * k
        + _PHI_B[4] * k * k * k * k * k
    )
    upper = 1.0 - F.exp(-ax * ax / 2.0) / math.sqrt(2.0 * math.pi) * poly
    return F.when(x >= 0, upper).otherwise(1.0 - upper)


def lilliefors_test(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Lilliefors normality test (Lilliefors 1967): the KS statistic
    against a normal with MEAN AND SD ESTIMATED FROM THE SAMPLE (the
    case vanilla KS tables are wrong for) — the ECDF-based complement
    to X404's moment-based K²:

        D = max_x max( F̂(x) − Φ(z), Φ(z) − F̂(x⁻) ),  z = (x − x̄)/s
        (s = sample sd, ÷(n−1), Lilliefors' convention; reference
        points ≈ 0.886/√n at 5% via the Dallal–Wilkinson approximation)

    Φ uses the Zelen–Severo polynomial (|ε| < 7.5e-8) with identical
    literals and operation order in both engines.

    Scale design: two moment aggregates (broadcast mean), ONE
    distinct-value aggregate + one prefix pass for the two-sided ECDF,
    a 1-row max reduction. Output: (n, mean, sd, d_stat) — NULL when
    n < 2 or s = 0.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(x.alias("_v"))
    mean = base.agg(
        F.count("*").cast("double").alias("_n"),
        (F.sum("_v") / F.count("*")).alias("_m"),
    )
    mom = base.crossJoin(F.broadcast(mean)).agg(
        F.max("_n").alias("_n"),
        F.max("_m").alias("_m"),
        F.sqrt(
            F.sum((F.col("_v") - F.col("_m")) * (F.col("_v") - F.col("_m")))
            / F.nullif(F.max("_n") - 1.0, F.lit(0.0))
        ).alias("_s"),
    )
    cells = base.groupBy("_v").agg(F.count("*").cast("double").alias("_l"))
    cum = partitioned_prefix_sum(cells, ["_v"], ["_l"], ["_cl"], inclusive=False)
    jj = cum.crossJoin(F.broadcast(mom))
    phi = _norm_cdf((F.col("_v") - F.col("_m")) / F.col("_s"))
    d_hi = (F.col("_cl") + F.col("_l")) / F.col("_n") - phi
    d_lo = phi - F.col("_cl") / F.col("_n")
    agg = jj.filter(F.col("_s") > 0).agg(
        F.max("_n").alias("_n"),
        F.max("_m").alias("_m"),
        F.max("_s").alias("_s"),
        F.max(F.greatest(d_hi, d_lo)).alias("_d"),
    )
    return agg.select(
        F.col("_n").cast("long").alias("n"),
        F.round("_m", 6).alias("mean"),
        F.round("_s", 6).alias("sd"),
        F.round("_d", 6).alias("d_stat"),
    )


def cochran_c_hartley(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Cochran's C and Hartley's F-max variance-outlier screens
    (Cochran 1941; Hartley 1950): is ONE group's variance an outlier —
    the single-culprit question the global k-sample tests (X273
    Brown–Forsythe, X389 Fligner–Killeen, X419 Conover) deliberately
    average away:

        C     = max_g s_g² / Σ_g s_g²     (reference tables assume a
                balanced design; with unequal n_g this is the standard
                screening read — documented, both engines replay it)
        F_max = max_g s_g² / min_g s_g²

    Sample variances (÷(n_g−1)). The classic lab-practice pair: C
    flags one inflated variance against the pool, F-max the extreme
    ratio.

    Scale design: ONE grouped moment aggregate, one k-bounded
    reduction, 1-row arithmetic. Output: (k, n, n_min, n_max,
    cochran_c, hartley_fmax) — NULL stats when k < 2, any group has
    n < 2, or the smallest variance is 0 (F-max) / Σs² = 0 (C).
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_v")
    )
    per = base.groupBy("_g").agg(
        F.count("*").cast("double").alias("_n"),
        F.var_samp("_v").alias("_s2"),
    )
    m = per.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("_n").alias("nn"),
        F.min("_n").alias("nmin"),
        F.max("_n").alias("nmax"),
        F.max("_s2").alias("smax"),
        F.min("_s2").alias("smin"),
        F.sum("_s2").alias("ssum"),
    )
    k = F.col("k")
    ok = (k > 1) & (F.col("nmin") > 1)
    c = F.when(ok & (F.col("ssum") > 0), F.col("smax") / F.col("ssum"))
    fmax = F.when(ok & (F.col("smin") > 0), F.col("smax") / F.col("smin"))
    return m.select(
        k.cast("long").alias("k"),
        F.col("nn").cast("long").alias("n"),
        F.col("nmin").cast("long").alias("n_min"),
        F.col("nmax").cast("long").alias("n_max"),
        F.round(c, 6).alias("cochran_c"),
        F.round(fmax, 6).alias("hartley_fmax"),
    )


def stuart_maxwell(
    df: DataFrame,
    col_a: str,
    col_b: str,
    cap: int = 32,
) -> DataFrame:
    """Stuart–Maxwell test of marginal homogeneity for a paired k×k
    contingency (Stuart 1955; Maxwell 1970): did the CATEGORY
    DISTRIBUTION shift between the two readings — the k-category
    generalization of McNemar (X308's symmetry test asks about
    individual cell flips; this asks about the margins):

        d_i = row_i − col_i   (first k−1 categories)
        V_ii = row_i + col_i − 2 n_ii,  V_ij = −(n_ij + n_ji)
        χ² = d′ V⁻¹ d   (~χ²_{k−1} under marginal homogeneity)

    Scale design: the corpus reduces to the label-bounded k×k cell
    table (cap ≤ {cap} categories enforced via bounded_distinct — a
    clear raise, never an unbounded collect); the (k−1)-dim solve runs
    driver-side on that control relation (the X104 raking convention).
    Output: (k, n, dof, chi2) — NULL χ² when V is singular (e.g.
    perfect agreement); raises when either column exceeds the cap.
    """
    import numpy as np

    from swivel_spark_prep_spark.cache import bounded_distinct

    spark = df.sparkSession
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    cats = sorted(
        set(bounded_distinct(base, "_a", cap=cap))
        | set(bounded_distinct(base, "_b", cap=cap))
    )
    k = len(cats)
    idx = {c: i for i, c in enumerate(cats)}
    cells = base.groupBy("_a", "_b").count().collect()  # ≤ cap² control rows
    n_mat = np.zeros((k, k))
    for r in cells:
        n_mat[idx[r["_a"]], idx[r["_b"]]] = r["count"]
    n_tot = int(n_mat.sum())
    chi2 = None
    if k >= 2:
        rows, cols = n_mat.sum(axis=1), n_mat.sum(axis=0)
        d = (rows - cols)[: k - 1]
        v = np.zeros((k - 1, k - 1))
        for i in range(k - 1):
            v[i, i] = rows[i] + cols[i] - 2.0 * n_mat[i, i]
            for jx in range(k - 1):
                if jx != i:
                    v[i, jx] = -(n_mat[i, jx] + n_mat[jx, i])
        try:
            chi2 = round(float(d @ np.linalg.solve(v, d)), 6)
        except np.linalg.LinAlgError:
            chi2 = None
    return spark.createDataFrame(
        [(k, n_tot, k - 1, chi2)], "k long, n long, dof long, chi2 double"
    )


def lin_ccc(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Lin's concordance correlation coefficient (Lin 1989): how well
    do paired readings fall on the 45° line through the origin —
    agreement, not mere correlation (Pearson's r forgives scale and
    location shifts; CCC charges for them):

        ρ_c = 2 s_xy / (s_x² + s_y² + (x̄ − ȳ)²)

    with POPULATION moments (÷n, Lin's definition). The estimation
    half of the agreement trio with Bland–Altman limits (interval) and
    Deming regression (structural line).

    Scale design: one mean aggregate + one broadcast-mean central-
    moment aggregate — nothing but scans. Output: (n, mean_x, mean_y,
    ccc) — NULL when n = 0 or both spreads and the location gap are 0.
    """
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        x.alias("_x"), y.alias("_y")
    )
    mean = base.agg(
        F.count("*").cast("double").alias("_n"),
        (F.sum("_x") / F.count("*")).alias("_mx"),
        (F.sum("_y") / F.count("*")).alias("_my"),
    )
    dx = F.col("_x") - F.col("_mx")
    dy = F.col("_y") - F.col("_my")
    mom = base.crossJoin(F.broadcast(mean)).agg(
        F.max("_n").alias("n"),
        F.max("_mx").alias("mx"),
        F.max("_my").alias("my"),
        (F.sum(dx * dx) / F.max("_n")).alias("sxx"),
        (F.sum(dy * dy) / F.max("_n")).alias("syy"),
        (F.sum(dx * dy) / F.max("_n")).alias("sxy"),
    )
    gap = F.col("mx") - F.col("my")
    den = F.col("sxx") + F.col("syy") + gap * gap
    ccc = F.when(den > 0, 2.0 * F.col("sxy") / den)
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round("mx", 6).alias("mean_x"),
        F.round("my", 6).alias("mean_y"),
        F.round(ccc, 6).alias("ccc"),
    )


def deming_regression(
    df: DataFrame,
    col_x: str,
    col_y: str,
    delta: float = 1.0,
) -> DataFrame:
    """Deming errors-in-variables regression (Deming 1943; Adcock
    1878): the structural line when BOTH variables carry noise — OLS
    attenuates the slope toward 0 by the x-noise share; Deming splits
    the orthogonal residual by the error-variance ratio δ (δ = 1 is
    orthogonal regression). Closed form from population moments:

        β = (s_yy − δ s_xx + √((s_yy − δ s_xx)² + 4 δ s_xy²)) / (2 s_xy)
        α = ȳ − β x̄

    The structural member of the agreement trio (CCC, Bland–Altman).

    Scale design: one mean aggregate + one broadcast-mean moment
    aggregate, 1-row arithmetic. Output: (n, slope, intercept) — NULL
    when s_xy = 0 (the closed form degenerates; a vertical/horizontal
    structural line has no finite unique β).
    """
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        x.alias("_x"), y.alias("_y")
    )
    mean = base.agg(
        F.count("*").cast("double").alias("_n"),
        (F.sum("_x") / F.count("*")).alias("_mx"),
        (F.sum("_y") / F.count("*")).alias("_my"),
    )
    dx = F.col("_x") - F.col("_mx")
    dy = F.col("_y") - F.col("_my")
    mom = base.crossJoin(F.broadcast(mean)).agg(
        F.max("_n").alias("n"),
        F.max("_mx").alias("mx"),
        F.max("_my").alias("my"),
        (F.sum(dx * dx) / F.max("_n")).alias("sxx"),
        (F.sum(dy * dy) / F.max("_n")).alias("syy"),
        (F.sum(dx * dy) / F.max("_n")).alias("sxy"),
    )
    diff = F.col("syy") - delta * F.col("sxx")
    beta = F.when(
        F.col("sxy") != 0,
        (diff + F.sqrt(diff * diff + 4.0 * delta * F.col("sxy") * F.col("sxy")))
        / (2.0 * F.col("sxy")),
    )
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(beta, 6).alias("slope"),
        F.round(F.col("my") - beta * F.col("mx"), 6).alias("intercept"),
    )


def bland_altman(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Bland–Altman limits of agreement (Bland & Altman 1986): the
    interval answer to "do two measurements agree" — bias = mean of
    the paired differences d = y − x, limits = bias ± 1.96 s_d (s_d =
    sample sd, ÷(n−1), their convention), plus the observed fraction
    outside the limits (≈ 5% under normality — a cheap calibration
    read). The interval member of the agreement trio (CCC, Deming).

    Scale design: one mean aggregate, one broadcast-mean sd aggregate,
    one broadcast-limits counting pass — three scans, no shuffle
    beyond the 1-row reductions. Output: (n, bias, sd_diff, loa_lo,
    loa_hi, pct_outside) — NULL limits when n < 2.
    """
    x = F.col(col_x).cast("double")
    y = F.col(col_y).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        (y - x).alias("_d")
    )
    mean = base.agg(
        F.count("*").cast("double").alias("_n"),
        (F.sum("_d") / F.count("*")).alias("_b"),
    )
    mom = base.crossJoin(F.broadcast(mean)).agg(
        F.max("_n").alias("n"),
        F.max("_b").alias("b"),
        F.sqrt(
            F.sum((F.col("_d") - F.col("_b")) * (F.col("_d") - F.col("_b")))
            / F.nullif(F.max("_n") - 1.0, F.lit(0.0))
        ).alias("s"),
    )
    out = base.crossJoin(F.broadcast(mom)).agg(
        F.max("n").alias("n"),
        F.max("b").alias("b"),
        F.max("s").alias("s"),
        (
            F.sum(
                (F.abs(F.col("_d") - F.col("b")) > 1.96 * F.col("s"))
                .cast("double")
            )
            / F.max("n")
        ).alias("pct"),
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.round("b", 6).alias("bias"),
        F.round("s", 6).alias("sd_diff"),
        F.round(F.col("b") - 1.96 * F.col("s"), 6).alias("loa_lo"),
        F.round(F.col("b") + 1.96 * F.col("s"), 6).alias("loa_hi"),
        F.round("pct", 6).alias("pct_outside"),
    )


def dunn_posthoc(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons after Kruskal–Wallis (Dunn
    1964): WHICH groups differ once the omnibus KW (X-series) says
    some do — pairwise z's on pooled mean midranks with the shared tie
    correction:

        z_ij = (R̄_i − R̄_j) / √( (N(N+1)/12 − T/(12(N−1))) (1/n_i + 1/n_j) )
        T = Σ_ties (t³ − t)

    (Raw z's; apply your own Bonferroni/Holm across the k(k−1)/2 rows
    — the suite reports evidence, not decisions.)

    Scale design: pooled midranks via ONE distinct-value aggregate +
    one prefix pass (the ansari cells), ONE k-row group-stats
    aggregate, then a k²-bounded self-join of the k-row relation
    (i < j) — pairs of GROUPS, never of rows. Output: one row per
    pair (g1, g2, n_1, n_2, mean_rank_1, mean_rank_2, z), ordered by
    (g1, g2) — z NULL when the pair variance degenerates.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("_g"), x.alias("_v")
    )
    cells = base.groupBy("_v", "_g").agg(
        F.count("*").cast("double").alias("_f")
    )
    vcells = cells.groupBy("_v").agg(F.sum("_f").alias("_l"))
    cum = partitioned_prefix_sum(vcells, ["_v"], ["_l"], ["_cl"], inclusive=False)
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0
    ranked = cells.join(cum, "_v").select(
        "_g", "_f", r.alias("_r")
    )
    gstats = ranked.groupBy("_g").agg(
        F.sum("_f").alias("_ng"),
        (F.sum(F.col("_f") * F.col("_r")) / F.sum("_f")).alias("_mr"),
    )
    tie = cum.agg(
        F.sum("_l").alias("_N"),
        F.sum(F.col("_l") * F.col("_l") * F.col("_l") - F.col("_l")).alias(
            "_T"
        ),
    )
    a = gstats.select(
        F.col("_g").alias("g1"), F.col("_ng").alias("_n1"),
        F.col("_mr").alias("_r1"),
    )
    b = gstats.select(
        F.col("_g").alias("g2"), F.col("_ng").alias("_n2"),
        F.col("_mr").alias("_r2"),
    )
    pairs = (
        # k²-bounded GROUP pairs; broadcast so the keyless non-equi
        # join plans as BNLJ, never a shuffled cartesian
        a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(tie))
    )
    nn = F.col("_N")
    var = (
        (nn * (nn + 1.0) / 12.0 - F.col("_T") / (12.0 * F.nullif(nn - 1.0, F.lit(0.0))))
        * (1.0 / F.col("_n1") + 1.0 / F.col("_n2"))
    )
    z = F.when(var > 0, (F.col("_r1") - F.col("_r2")) / F.sqrt(var))
    return pairs.select(
        "g1",
        "g2",
        F.col("_n1").cast("long").alias("n_1"),
        F.col("_n2").cast("long").alias("n_2"),
        F.round("_r1", 6).alias("mean_rank_1"),
        F.round("_r2", 6).alias("mean_rank_2"),
        F.round(z, 6).alias("z"),
    ).orderBy("g1", "g2")


def cohens_d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Cohen's d and Hedges' g standardized mean difference (Cohen
    1969; Hedges 1981): the effect-size companion to the suite's
    two-sample p-value machinery — HOW BIG is the shift in pooled-sd
    units, with Hedges' exact-ratio small-sample correction
    approximated the standard way:

        d = (x̄_a − x̄_b) / s_p,
        s_p² = ((n_a−1) s_a² + (n_b−1) s_b²) / (n_a + n_b − 2)
        g = J·d,  J = 1 − 3/(4(n_a+n_b−2) − 1)

    Scale design: one grouped moment aggregate (mean + sum-of-squares
    per slice via broadcast means), 1-row arithmetic. Output:
    (n_a, n_b, d, g) — NULL when either slice has < 2 rows or s_p = 0.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(
        x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("_g"), x.alias("_v"))
    per = base.groupBy("_g").agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_v").alias("_m"),
        F.coalesce(
            F.var_samp("_v"), F.lit(0.0)
        ).alias("_s2"),
    )
    m = per.agg(
        F.max(F.when(F.col("_g") == group_a, F.col("_n"))).alias("na"),
        F.max(F.when(F.col("_g") == group_b, F.col("_n"))).alias("nb"),
        F.max(F.when(F.col("_g") == group_a, F.col("_m"))).alias("ma"),
        F.max(F.when(F.col("_g") == group_b, F.col("_m"))).alias("mb"),
        F.max(F.when(F.col("_g") == group_a, F.col("_s2"))).alias("sa2"),
        F.max(F.when(F.col("_g") == group_b, F.col("_s2"))).alias("sb2"),
    )
    na, nb = F.col("na"), F.col("nb")
    dof = na + nb - 2.0
    sp = F.sqrt(
        ((na - 1.0) * F.col("sa2") + (nb - 1.0) * F.col("sb2"))
        / F.nullif(dof, F.lit(0.0))
    )
    d = F.when(
        (na >= 2) & (nb >= 2) & (sp > 0), (F.col("ma") - F.col("mb")) / sp
    )
    jj = 1.0 - 3.0 / (4.0 * dof - 1.0)
    return m.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(d, 6).alias("d"),
        F.round(jj * d, 6).alias("g"),
    )


def welch_anova(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA (Welch 1951): the k-group
    mean comparison that does NOT assume equal variances — the
    k-sample sequel to welch_ttest, and the omnibus X273's
    Brown–Forsythe variance test decides you need:

        w_g = n_g/s_g²,  W = Σ w_g,  x̄_w = Σ w_g x̄_g / W
        A = Σ w_g (x̄_g − x̄_w)² / (k−1)
        B = 2(k−2)/(k²−1) · Σ (1 − w_g/W)² / (n_g − 1)
        F* = A / (1 + B),   df1 = k−1,
        df2 = (k²−1) / (3 Σ (1 − w_g/W)² / (n_g − 1))

    Scale design: ONE grouped moment aggregate, one k-bounded weight
    aggregate (two passes because x̄_w feeds the deviations —
    broadcast), 1-row arithmetic. Output: (k, n, f_stat, df1, df2) —
    NULL when k < 2 or any group has n < 2 or zero variance.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("_g"), x.alias("_v")
    )
    per = base.groupBy("_g").agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_v").alias("_m"),
        F.var_samp("_v").alias("_s2"),
    )
    ok_per = (F.col("_n") > 1) & (F.col("_s2") > 0)
    w = per.select(
        "_n", "_m", "_s2",
        F.when(ok_per, F.col("_n") / F.col("_s2")).alias("_w"),
    )
    tot = w.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("_n").alias("nn"),
        F.sum("_w").alias("W"),
        F.sum(F.col("_w") * F.col("_m")).alias("wm"),
        F.min(ok_per.cast("int")).alias("allok"),
    )
    j = w.crossJoin(F.broadcast(tot))
    xw = F.col("wm") / F.col("W")
    m = j.agg(
        F.max("k").alias("k"),
        F.max("nn").alias("nn"),
        F.max("allok").alias("allok"),
        F.sum(F.col("_w") * (F.col("_m") - xw) * (F.col("_m") - xw)).alias(
            "A0"
        ),
        F.sum(
            (1.0 - F.col("_w") / F.col("W"))
            * (1.0 - F.col("_w") / F.col("W"))
            / (F.col("_n") - 1.0)
        ).alias("S"),
    )
    k = F.col("k")
    ok = (k > 1) & (F.col("allok") == 1)
    a = F.col("A0") / (k - 1.0)
    b = 2.0 * (k - 2.0) / (k * k - 1.0) * F.col("S")
    f = F.when(ok, a / (1.0 + b))
    df2 = F.when(ok, (k * k - 1.0) / (3.0 * F.col("S")))
    return m.select(
        k.cast("long").alias("k"),
        F.col("nn").cast("long").alias("n"),
        F.round(f, 6).alias("f_stat"),
        (k - 1.0).cast("long").alias("df1"),
        F.round(df2, 6).alias("df2"),
    )


def games_howell(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Games–Howell post-hoc pairwise comparisons (Games & Howell
    1976): WHICH group means differ when variances are UNEQUAL — the
    heteroscedastic sibling of Tukey's HSD and the pairwise follow-up
    to welch_anova (X416), as Dunn (X414) is to Kruskal–Wallis:

        q_ij  = (m_i − m_j) / √((s_i²/n_i + s_j²/n_j) / 2)
        df_ij = (v_i + v_j)² / (v_i²/(n_i−1) + v_j²/(n_j−1)),
                v_g = s_g²/n_g   (Welch–Satterthwaite per pair)

    (Raw signed q and df; refer q to the studentized-range table
    downstream — the suite reports evidence, not decisions.)

    Scale design: ONE grouped moment aggregate, then a k²-bounded
    broadcast BNLJ self-pairing of the k-row stats relation — pairs
    of GROUPS, never rows. Output: one row per pair (g1, g2, n_1,
    n_2, diff, q_stat, df), ordered — NULL q/df when either side has
    n < 2 or zero variance.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("_g"), x.alias("_v")
    )
    per = base.groupBy("_g").agg(
        F.count("*").cast("double").alias("_n"),
        F.avg("_v").alias("_m"),
        F.var_samp("_v").alias("_s2"),
    )
    a = per.select(
        F.col("_g").alias("g1"), F.col("_n").alias("_n1"),
        F.col("_m").alias("_m1"), F.col("_s2").alias("_v1s"),
    )
    b = per.select(
        F.col("_g").alias("g2"), F.col("_n").alias("_n2"),
        F.col("_m").alias("_m2"), F.col("_s2").alias("_v2s"),
    )
    # k²-bounded GROUP pairs; broadcast → BNLJ, never a cartesian
    pairs = a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
    ok = (
        (F.col("_n1") > 1) & (F.col("_n2") > 1)
        & (F.col("_v1s") > 0) & (F.col("_v2s") > 0)
    )
    v1 = F.col("_v1s") / F.col("_n1")
    v2 = F.col("_v2s") / F.col("_n2")
    diff = F.col("_m1") - F.col("_m2")
    q = F.when(ok, diff / F.sqrt((v1 + v2) / 2.0))
    dof = F.when(
        ok,
        (v1 + v2) * (v1 + v2)
        / (v1 * v1 / (F.col("_n1") - 1.0) + v2 * v2 / (F.col("_n2") - 1.0)),
    )
    return pairs.select(
        "g1",
        "g2",
        F.col("_n1").cast("long").alias("n_1"),
        F.col("_n2").cast("long").alias("n_2"),
        F.round(diff, 6).alias("diff"),
        F.round(q, 6).alias("q_stat"),
        F.round(dof, 6).alias("df"),
    ).orderBy("g1", "g2")


def conover_squared_ranks(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Conover squared-ranks k-sample test for equal variances
    (Conover 1980 §5.3): pooled ranks of |x − x̄_g| SQUARED — the
    rank-based k-sample scale test between X389's normal-scores
    Fligner–Killeen and X273's parametric Brown–Forsythe:

        u = |x − x̄_g|,  R = pooled midrank of u,  S_g = Σ_g R²
        S̄ = Σ R²/N,  D² = (Σ R⁴ − N S̄²)/(N−1)
        T = (Σ_g S_g²/n_g − N S̄²) / D²    (~χ²_{k−1})

    Midrank powers are exact in doubles (integer/quarter-integer
    sums), so T carries no float-ordering noise.

    Scale design: one grouped mean aggregate (broadcast), ONE
    distinct-|deviation|-value aggregate + one prefix pass for pooled
    midranks, one k-bounded group reduction, 1-row arithmetic.
    Output: (k, n, t_stat) — NULL when D² = 0 (all deviations tied).
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("_g"), x.alias("_v")
    )
    means = base.groupBy("_g").agg(F.avg("_v").alias("_m"))
    u = base.join(F.broadcast(means), "_g").select(
        "_g", F.abs(F.col("_v") - F.col("_m")).alias("_u")
    )
    cells = u.groupBy("_u", "_g").agg(F.count("*").cast("double").alias("_f"))
    vcells = cells.groupBy("_u").agg(F.sum("_f").alias("_l"))
    cum = partitioned_prefix_sum(vcells, ["_u"], ["_l"], ["_cl"], inclusive=False)
    r = F.col("_cl") + (F.col("_l") + 1.0) / 2.0
    ranked = cells.join(cum, "_u").select("_g", "_f", r.alias("_r"))
    gs = ranked.groupBy("_g").agg(
        F.sum("_f").alias("_ng"),
        F.sum(F.col("_f") * F.col("_r") * F.col("_r")).alias("_sg"),
    )
    gtot = gs.agg(
        F.count("*").cast("double").alias("k"),
        F.sum(F.col("_sg") * F.col("_sg") / F.col("_ng")).alias("ssq"),
    )
    mom = cum.agg(
        F.sum("_l").alias("nn"),
        F.sum(F.col("_l") * r * r).alias("r2"),
        F.sum(F.col("_l") * r * r * r * r).alias("r4"),
    )
    j = gtot.crossJoin(F.broadcast(mom))
    nn = F.col("nn")
    sbar = F.col("r2") / nn
    d2 = (F.col("r4") - nn * sbar * sbar) / F.nullif(nn - 1.0, F.lit(0.0))
    t = F.when(d2 > 0, (F.col("ssq") - nn * sbar * sbar) / d2)
    return j.select(
        F.col("k").cast("long").alias("k"),
        nn.cast("long").alias("n"),
        F.round(t, 6).alias("t_stat"),
    )
