"""Round-12 batch H operator pins: Tukey HSD, Cochran's Q, vocabulary
richness (Chao1/coverage), QQ drift profile."""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.usefixtures("spark")


# ---- tukey_hsd


def test_tukey_worked_example(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import tukey_hsd

    rows = (
        [("a", v) for v in (1.0, 2.0, 3.0)]
        + [("b", v) for v in (2.0, 3.0, 4.0)]
        + [("c", v) for v in (10.0, 11.0, 12.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r.group_a, r.group_b): r for r in tukey_hsd(df, "g", "v").collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # within each group SS = 2; SSW = 6, df = 9 - 3 = 6, MSW = 1
    se = math.sqrt(1.0 / 2.0 * (1 / 3 + 1 / 3))
    r = got[("a", "c")]
    assert r.df_within == 6
    assert r.diff == pytest.approx(2.0 - 11.0, abs=1e-6)
    assert r.se == pytest.approx(se, abs=1e-6)
    assert r.q_stat == pytest.approx(9.0 / se, abs=1e-4)
    assert got[("a", "b")].diff == pytest.approx(-1.0, abs=1e-6)


def test_tukey_pair_count(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import tukey_hsd

    rows = [(f"g{i % 5}", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert tukey_hsd(df, "g", "v").count() == 10  # C(5,2)


# ---- cochran_q


def test_cochran_python_replay(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import cochran_q

    # 8 items x 3 treatments, mixed outcomes
    mat = [
        (1, 1, 0), (1, 1, 1), (0, 1, 0), (1, 0, 0),
        (0, 0, 0), (1, 1, 0), (0, 1, 1), (1, 1, 1),
    ]
    rows = [
        (i, f"t{j}", x)
        for i, outcomes in enumerate(mat)
        for j, x in enumerate(outcomes)
    ]
    df = spark.createDataFrame(rows, "i long, t string, x int")
    k = 3
    R = [sum(o) for o in mat]
    C = [sum(o[j] for o in mat) for j in range(k)]
    T = sum(R)
    q = k * (k - 1) * sum((c - T / k) ** 2 for c in C) / (k * T - sum(r * r for r in R))
    row = cochran_q(df, "i", "t", "x").collect()[0]
    assert row.n_items == 8 and row.k == 3 and row.df == 2
    assert row.q_stat == pytest.approx(q, abs=1e-6)


def test_cochran_unbalanced_raises(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import cochran_q

    rows = [(1, "a", 1), (1, "b", 0), (2, "a", 1)]  # item 2 missing b
    df = spark.createDataFrame(rows, "i long, t string, x int")
    with pytest.raises(ValueError, match="constant treatment count"):
        cochran_q(df, "i", "t", "x")


def test_cochran_degenerate_all_ones_null(spark):
    """All successes: denominator k*T - sum R^2 = 0 -> q_stat NULL."""
    from swivel_spark_prep_spark.operators.evalmetrics import cochran_q

    rows = [(i, t, 1) for i in range(4) for t in ("a", "b")]
    df = spark.createDataFrame(rows, "i long, t string, x int")
    assert cochran_q(df, "i", "t", "x").collect()[0].q_stat is None


# ---- vocab_richness


def test_vocab_richness_worked_example(spark):
    from swivel_spark_prep_spark.operators.textstats import vocab_richness

    df = spark.createDataFrame([("en", "a a b c")], "lang string, text string")
    row = vocab_richness(df, group_cols=["lang"]).collect()[0]
    assert (row.n_tokens, row.v_distinct, row.f1, row.f2) == (4, 3, 2, 1)
    # chao1 = 3 + 2*1/(2*(1+1)) = 3.5 ; coverage = 1 - 2/4 = 0.5
    assert row.chao1 == pytest.approx(3.5, abs=1e-6)
    assert row.coverage == pytest.approx(0.5, abs=1e-6)


def test_vocab_richness_no_singletons_saturated(spark):
    from swivel_spark_prep_spark.operators.textstats import vocab_richness

    df = spark.createDataFrame([("en", "x x y y")], "lang string, text string")
    row = vocab_richness(df, group_cols=["lang"]).collect()[0]
    assert row.f1 == 0
    assert row.chao1 == 2.0  # no unseen mass estimated
    assert row.coverage == 1.0


def test_vocab_richness_groups_independent(spark):
    from swivel_spark_prep_spark.operators.textstats import vocab_richness

    df = spark.createDataFrame(
        [("en", "a b"), ("fr", "a a")], "lang string, text string"
    )
    got = {r.lang: r for r in vocab_richness(df, group_cols=["lang"]).collect()}
    assert got["en"].f1 == 2 and got["fr"].f1 == 0


# ---- qq_drift


def test_qq_drift_shifted_uniform(spark):
    from swivel_spark_prep_spark.operators.quality import qq_drift

    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v)) for v in range(101, 201)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.q: r for r in qq_drift(df, "v", "g", "a", "b").collect()}
    assert len(got) == 9
    for q in (0.1, 0.5, 0.9):
        # left-continuous inverse CDF of 1..100 at q is 100q
        assert got[q].q_a == pytest.approx(100 * q, abs=1e-9)
        assert got[q].diff == pytest.approx(-100.0, abs=1e-9)


def test_qq_drift_identical_zero(spark):
    from swivel_spark_prep_spark.operators.quality import qq_drift

    rows = [(g, float(v % 13)) for g in ("a", "b") for v in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert all(
        r.diff == 0.0 for r in qq_drift(df, "v", "g", "a", "b").collect()
    )


# ---- two_proportion_test


def test_two_proportion_worked_example(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import two_proportion_test

    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 20 + [("b", 0)] * 80
    df = spark.createDataFrame(rows, "g string, x int")
    r = two_proportion_test(df, "g", "x", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (100, 100)
    assert r.p_a == 0.3 and r.p_b == 0.2
    pp = 0.25
    se = math.sqrt(pp * 0.75 * (1 / 100 + 1 / 100))
    assert r.z_stat == pytest.approx(0.1 / se, abs=1e-5)
    # Wilson bounds bracket the point estimates and stay in [0, 1]
    assert 0 <= r.ci_a_lo < 0.3 < r.ci_a_hi <= 1
    assert 0 <= r.ci_b_lo < 0.2 < r.ci_b_hi <= 1


def test_two_proportion_degenerate_z_null(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import two_proportion_test

    rows = [("a", 1)] * 5 + [("b", 1)] * 5  # all successes: pooled var 0
    df = spark.createDataFrame(rows, "g string, x int")
    r = two_proportion_test(df, "g", "x", "a", "b").collect()[0]
    assert r.z_stat is None and r.diff == 0.0


# ---- cross_source_dup_matrix


def test_cross_source_dup_matrix_planted(spark):
    from swivel_spark_prep_spark.operators.dedup import cross_source_dup_matrix

    rows = [
        (1, "sa", "dup one"), (2, "sb", "dup one"), (3, "sb", "dup one"),
        (4, "sa", "dup two"), (5, "sc", "dup two"),
        (6, "sa", "unique a"), (7, "sb", "unique b"),
        (8, "sa", "dup one"),  # second sa copy of group one
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.source_a, r.source_b): r for r in cross_source_dup_matrix(df).collect()}
    # (sa, sb): group 'dup one' spans both -> 1 group, mass 2*2 = 4
    assert got[("sa", "sb")].shared_groups == 1
    assert got[("sa", "sb")].pair_mass == 4
    assert got[("sa", "sc")].shared_groups == 1
    assert got[("sa", "sc")].pair_mass == 1
    assert ("sb", "sc") not in got  # no shared text


def test_cross_source_dup_matrix_no_dups_empty(spark):
    from swivel_spark_prep_spark.operators.dedup import cross_source_dup_matrix

    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    assert cross_source_dup_matrix(df).count() == 0


# ---- regression_reliability


def test_regression_reliability_perfect_predictor(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import regression_reliability

    rows = [(float(v), float(v)) for v in range(100)]
    df = spark.createDataFrame(rows, "y double, p double")
    out = regression_reliability(df, "y", "p", bins=5).collect()
    assert len(out) == 5
    assert all(r.gap == 0.0 and r.resid_std == 0.0 for r in out)
    assert sum(r.n for r in out) == 100


def test_regression_reliability_constant_bias(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import regression_reliability

    rows = [(float(v) + 3.0, float(v)) for v in range(50)]
    df = spark.createDataFrame(rows, "y double, p double")
    out = regression_reliability(df, "y", "p", bins=4).collect()
    assert all(r.gap == pytest.approx(3.0, abs=1e-6) for r in out)


def test_regression_reliability_constant_pred_one_bin(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import regression_reliability

    rows = [(float(v), 5.0) for v in range(10)]
    df = spark.createDataFrame(rows, "y double, p double")
    out = regression_reliability(df, "y", "p", bins=10).collect()
    assert len(out) == 1 and out[0].bin == 1 and out[0].n == 10


# ---- embedding_hygiene


def test_embedding_hygiene_planted_defects(spark):
    from swivel_spark_prep_spark.operators.similarity import embedding_hygiene

    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [0.0, 0.0]),          # zero vector
        (3, None),                # NULL
        (4, [float("nan"), 1.0]), # non-finite
        (5, [1.0, 0.0, 0.0]),     # dim mismatch (mode = 2)
        (6, [0.0, 2.0]),          # norm 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_hygiene(df).collect()[0]
    assert r.n_rows == 6
    assert r.n_null == 1
    assert r.n_zero == 1
    assert r.n_nonfinite == 1
    assert r.dims_mode == 2
    assert r.n_dim_mismatch == 1
    # norms over clean rows: 5, 0, 2, sqrt(1)=1 (the 3-dim one still has
    # a finite norm) -> mean of [5, 0, 1, 2]
    assert r.norm_max == 5.0
    assert r.norm_min == 0.0
    assert r.norm_mean == pytest.approx(2.0, abs=1e-6)


# ---- CLI: chunk + label-aggregate


def test_cli_chunk(spark, tmp_path, capsys):
    from swivel_spark_prep_spark import cli

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b c")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "chunks")
    rc = cli.main(["chunk", "--input", src, "--output", out,
                   "--window", "4", "--stride", "2"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "5 chunks from 2 docs" in printed  # 4 + 1
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert set(got.columns) == {"id", "chunk_id", "n_tokens", "chunk"}


def test_cli_label_aggregate(spark, tmp_path, capsys):
    from swivel_spark_prep_spark import cli

    rows = []
    for i in range(10):
        true = "x" if i % 2 else "y"
        rows += [(i, "good1", true), (i, "good2", true), (i, "bad", "x")]
    src = str(tmp_path / "ratings")
    spark.createDataFrame(rows, "item long, rater string, label string").write.parquet(src)
    out = str(tmp_path / "labels")
    rc = cli.main(["label-aggregate", "--input", src, "--output", out])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "10 consensus labels" in printed
    assert "rater bad:" in printed and "rater good1:" in printed
    got = {r.item: r.ds_label for r in spark.read.parquet(out).collect()}
    assert all(got[i] == ("x" if i % 2 else "y") for i in range(10))


# ---- decision_stump


def test_stump_perfect_split(spark):
    from swivel_spark_prep_spark.operators.quality import decision_stump

    rows = [(float(v), 1) for v in range(10)] + [(float(v), 0) for v in range(10, 20)]
    df = spark.createDataFrame(rows, "v double, y int")
    r = decision_stump(df, "v", "y").collect()[0]
    assert r.threshold == 9.0  # v <= 9 is all positives
    assert r.gini_split == 0.0
    assert r.gain == pytest.approx(0.5, abs=1e-6)
    assert (r.n_left, r.n_right, r.pos_left, r.pos_right) == (10, 10, 10, 0)


def test_stump_python_replay(spark):
    from swivel_spark_prep_spark.operators.quality import decision_stump

    vals = [((i * 7) % 20, 1 if (i * 3) % 5 < 2 else 0) for i in range(60)]
    df = spark.createDataFrame(
        [(float(v), y) for v, y in vals], "v double, y int"
    )
    # brute force over distinct thresholds
    import collections

    agg = collections.Counter()
    pos = collections.Counter()
    for v, y in vals:
        agg[v] += 1
        pos[v] += y
    vs = sorted(agg)
    tn, tp = sum(agg.values()), sum(pos.values())

    def gini(p, n):
        q = p / n
        return 2 * q * (1 - q)

    best = None
    nl = pl = 0
    for v in vs:
        nl += agg[v]
        pl += pos[v]
        nr, pr = tn - nl, tp - pl
        if nr == 0:
            continue
        g = nl / tn * gini(pl, nl) + nr / tn * gini(pr, nr)
        if best is None or g < best[0] - 1e-12:
            best = (g, v, nl, nr)
    r = decision_stump(df, "v", "y").collect()[0]
    assert r.threshold == best[1]
    assert r.gini_split == pytest.approx(best[0], abs=1e-6)
    assert r.n_left == best[2] and r.n_right == best[3]


# ---- mde_report


def test_mde_analytic(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import mde_report

    import numpy as np

    rng = np.random.RandomState(4)
    a = rng.randn(200) * 2 + 10
    b = rng.randn(300) * 2 + 10
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mde_report(df, "g", "v", "a", "b").collect()[0]
    ssa = ((a - a.mean()) ** 2).sum()
    ssb = ((b - b.mean()) ** 2).sum()
    s2 = (ssa + ssb) / (200 + 300 - 2)
    mde = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
        s2 * (1 / 200 + 1 / 300)
    )
    assert r.sd_pooled == pytest.approx(math.sqrt(s2), abs=1e-4)
    assert r.mde_abs == pytest.approx(mde, abs=1e-4)
    assert r.mde_rel == pytest.approx(mde / abs(b.mean()), abs=1e-4)


# ---- markov_perplexity


def test_markov_deterministic_chain_ppl_one(spark):
    from swivel_spark_prep_spark.operators.timeseries import markov_perplexity

    # a -> b -> a -> b ... per user: next state fully determined
    rows = [(u, t, "a" if t % 2 == 0 else "b") for u in range(3) for t in range(10)]
    df = spark.createDataFrame(rows, "u long, t long, s string")
    r = markov_perplexity(df, "u", ["t"], "s").collect()[0]
    assert r.perplexity == 1.0
    assert r.entropy_rate == 0.0
    assert r.n_transitions == 27


def test_markov_uniform_two_states_ppl_two(spark):
    from swivel_spark_prep_spark.operators.timeseries import markov_perplexity

    # from every state, next is a or b equally often
    seq = ["a", "a", "b", "b", "a", "b", "a", "a", "b", "b", "a", "b"]
    # transitions: aa, ab, bb, ba, ab, ba, aa, ab, bb, ba, ab
    # from a: aa x2, ab x4 -> not uniform; craft exactly uniform:
    seq = ["a", "a", "b", "a", "b", "b", "a"]
    # transitions: aa, ab, ba, ab, bb, ba -> a: {a:1, b:2}... craft simpler
    seq = ["a", "a", "b", "b", "a", "b"]
    # aa, ab, bb, ba, ab -> from a: a1 b2; from b: b1 a1 -> not uniform
    # build explicitly: aa, ab, ba, bb each once
    rows = [
        (1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"),  # aa, ab, bb
        (2, 0, "b"), (2, 1, "a"), (2, 2, "b"),               # ba, ab
        (3, 0, "b"), (3, 1, "a"),                            # ba
        (4, 0, "a"), (4, 1, "b"),                            # ab... recount
    ]
    # transitions: u1: aa, ab, bb ; u2: ba, ab ; u3: ba ; u4: ab
    # from a: a=1, b=3 ; from b: a=2, b=1 -> H = -(1/7 ln(1/4) + 3/7 ln(3/4)
    #                                            + 2/7 ln(2/3) + 1/7 ln(1/3))
    df = spark.createDataFrame(rows, "u long, t long, s string")
    r = markov_perplexity(df, "u", ["t"], "s").collect()[0]
    h = -(
        1 / 7 * math.log(1 / 4)
        + 3 / 7 * math.log(3 / 4)
        + 2 / 7 * math.log(2 / 3)
        + 1 / 7 * math.log(1 / 3)
    )
    assert r.n_transitions == 7
    assert r.entropy_rate == pytest.approx(h, abs=1e-6)
    assert r.perplexity == pytest.approx(math.exp(h), abs=1e-6)


# ---- kwic_snippets


def test_kwic_window_and_edges(spark):
    from swivel_spark_prep_spark.operators.search import kwic_snippets

    df = spark.createDataFrame(
        [
            (1, "a b c hit d e f"),
            (2, "hit x y"),            # hit at position 1: left-clamped
            (3, "no match here"),
            (4, "p q hit"),            # right-clamped
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in kwic_snippets(df, "hit", width=2).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1].pos == 4 and got[1].snippet == "b c hit d e"
    assert got[2].pos == 1 and got[2].snippet == "hit x y"
    assert got[4].pos == 3 and got[4].snippet == "p q hit"


def test_kwic_first_occurrence_only(spark):
    from swivel_spark_prep_spark.operators.search import kwic_snippets

    df = spark.createDataFrame([(1, "hit a hit b")], "doc_id long, text string")
    rows = kwic_snippets(df, "hit", width=1).collect()
    assert len(rows) == 1 and rows[0].pos == 1


# ---- dedup_roi_by_group


def test_dedup_roi_planted(spark):
    from swivel_spark_prep_spark.operators.dedup import dedup_roi_by_group

    rows = [
        (1, "sa", "dup text one"),   # survivor (min id)
        (2, "sb", "dup text one"),   # sb pays 3 tokens
        (3, "sb", "dup text one"),   # sb pays 3 more
        (4, "sa", "unique a doc"),
        (5, "sb", "unique b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.group: r for r in dedup_roi_by_group(df).collect()}
    assert got["sa"].n_rows == 2 and got["sa"].rows_saved == 0
    assert got["sa"].tokens_saved_pct == 0.0
    assert got["sb"].n_rows == 3 and got["sb"].rows_saved == 2
    assert got["sb"].tokens_total == 8  # 3 + 3 + 2
    assert got["sb"].tokens_surviving == 2
    assert got["sb"].tokens_saved_pct == pytest.approx(75.0, abs=1e-6)


# ---- plan_report + explain-query CLI


def test_plan_report_shape(spark, sf_dir):
    from swivel_spark_prep_spark.plans import plan_report
    from swivel_spark_prep_spark.queries.declared import DECLARED_QUERIES

    rep = plan_report(DECLARED_QUERIES["Q05_join_inner_multi"](spark, sf_dir))
    assert rep["pushed_filters"], "pushdown must reach the scans"
    # column pruning: the customer scan must read only the 2 used cols
    assert any("c_nationkey" in s and "c_name" not in s for s in rep["read_schemas"])
    assert rep["broadcast_joins"] >= 2  # both dims broadcast
    assert rep["codegen_stages"] >= 1
    assert not rep["has_cartesian"]
    assert rep["unpartitioned_windows"] == 0


def test_cli_explain_query(spark, sf_dir, capsys):
    import json

    from swivel_spark_prep_spark import cli

    rc = cli.main(["explain-query", "Q02_filter_pred", "--sf-dir", str(sf_dir)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == "Q02_filter_pred"
    assert out["pushed_filters"] and not out["has_cartesian"]


# ---- conformal_by_group / boilerplate_share


def test_conformal_by_group_per_slice(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import conformal_by_group

    # group a: residuals 1..9 -> q_hat = 9 at alpha=0.1 (k = 9)
    # group b: residuals 10..18 -> q_hat = 18 (slice-specific!)
    cal = spark.createDataFrame(
        [("a", float(r), 0.0) for r in range(1, 10)]
        + [("b", float(r), 0.0) for r in range(10, 19)],
        "g string, y double, p double",
    )
    te = spark.createDataFrame(
        [("a", 8.0, 0.0), ("a", 9.5, 0.0), ("b", 17.0, 0.0), ("b", 19.0, 0.0)],
        "g string, y double, p double",
    )
    got = {r.group: r for r in conformal_by_group(cal, te, "g", "y", "p", 0.1).collect()}
    assert got["a"].q_hat == 9.0 and got["b"].q_hat == 18.0
    assert got["a"].coverage == 0.5 and got["b"].coverage == 0.5


def test_conformal_by_group_small_slice_infinite(spark):
    from swivel_spark_prep_spark.operators.evalmetrics import conformal_by_group

    cal = spark.createDataFrame(
        [("a", 1.0, 0.0), ("a", 2.0, 0.0)], "g string, y double, p double"
    )
    te = spark.createDataFrame([("a", 100.0, 0.0)], "g string, y double, p double")
    row = conformal_by_group(cal, te, "g", "y", "p", 0.1).collect()[0]
    assert row.q_hat is None and row.coverage == 1.0


def test_boilerplate_share_planted(spark):
    from swivel_spark_prep_spark.operators.textstats import boilerplate_share

    footer = "all rights reserved"
    rows = [
        (1, "sa", f"alpha text one. {footer}"),
        (2, "sa", f"beta text two. {footer}"),
        (3, "sb", f"gamma words three. {footer}"),
        (4, "sb", "unique line only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in boilerplate_share(
        df, min_docs=3, group_cols=["source"]
    ).collect()}
    # footer (3 tokens) repeats across 3 docs -> boiler in sa twice, sb once
    assert got["sa"].boiler_lines == 2 and got["sa"].boiler_tokens == 6
    assert got["sa"].n_lines == 4
    assert got["sb"].boiler_lines == 1 and got["sb"].boiler_tokens == 3
    assert got["sb"].tokens_total == 3 + 3 + 3  # gamma(3) + footer(3) + unique(3)


def test_boilerplate_share_literal_delimiter(spark):
    """The delimiter is LITERAL: 'x y' must not split on arbitrary
    chars (Spark split takes a regex — the operator escapes it)."""
    from swivel_spark_prep_spark.operators.textstats import boilerplate_share

    df = spark.createDataFrame(
        [(1, "s", "ab cd ef")], "doc_id long, source string, text string"
    )
    row = boilerplate_share(df, min_docs=2, group_cols=["source"]).collect()[0]
    assert row.n_lines == 1  # no '. ' present: the whole doc is one line
    assert row.tokens_total == 3


# ---- rolling_active_counts


def test_rolling_active_brute_force(spark):
    import datetime as dt

    from swivel_spark_prep_spark.operators.timeseries import rolling_active_counts

    base = dt.datetime(2024, 1, 1)
    # user 1 active days 0, 2, 20; user 2 active days 5, 6; user 3 day 0
    acts = [(1, 0), (1, 2), (1, 20), (2, 5), (2, 6), (3, 0)]
    rows = [
        (u, base + dt.timedelta(days=d, hours=h))
        for (u, d) in acts
        for h in (1, 13)  # two events per active day: distinct must dedup
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    W = 7
    got = {
        r.window_end.isoformat(): r.n_active
        for r in rolling_active_counts(df, "u", "ts", window_days=W).collect()
    }
    # brute force
    days = {d for _, d in acts}
    expect = {}
    for e in range(0, max(days) + W):
        n = len({u for (u, d) in acts if e - W + 1 <= d <= e})
        if n:
            expect[(base + dt.timedelta(days=e)).date().isoformat()] = n
    assert got == expect


def test_rolling_active_window_one_is_daily(spark):
    import datetime as dt

    from swivel_spark_prep_spark.operators.timeseries import rolling_active_counts

    base = dt.datetime(2024, 3, 1)
    rows = [(1, base), (2, base), (1, base + dt.timedelta(days=2))]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        r.window_end.isoformat(): r.n_active
        for r in rolling_active_counts(df, "u", "ts", window_days=1).collect()
    }
    assert got == {"2024-03-01": 2, "2024-03-03": 1}


# ---- topk_term_overlap


def test_topk_overlap_identical_and_disjoint(spark):
    from swivel_spark_prep_spark.operators.textstats import topk_term_overlap

    df = spark.createDataFrame(
        [
            ("a", "x y z"), ("b", "x y z"),      # identical vocab
            ("c", "p q r"),                        # disjoint from both
        ],
        "lang string, text string",
    )
    got = {(r.group_a, r.group_b): r for r in topk_term_overlap(
        df, group_col="lang", k=10
    ).collect()}
    assert got[("a", "b")].jaccard == 1.0 and got[("a", "b")].n_common == 3
    assert got[("a", "c")].jaccard == 0.0 and got[("a", "c")].n_common == 0
    assert got[("b", "c")].n_common == 0  # zero-overlap pairs still appear


def test_topk_overlap_head_only(spark):
    """k cuts the head: a term outside one slice's top-k must not count
    even if the other slice has it."""
    from swivel_spark_prep_spark.operators.textstats import topk_term_overlap

    df = spark.createDataFrame(
        [
            ("a", "top top top rare"),   # a's top-1 = 'top'
            ("b", "rare rare other"),    # b's top-1 = 'rare'
        ],
        "lang string, text string",
    )
    row = topk_term_overlap(df, group_col="lang", k=1).collect()[0]
    assert row.n_common == 0  # heads differ; 'rare' is not in a's top-1
