"""CLI front-end — the reference's spark-submit surface, re-expressed.

The reference's CLI takes (input, output, shard_size, min_count, window)
and runs the full prep pipeline (SURVEY.md §2.1 "CLI", §3.1 E1). Ours:

    python -m swivel_spark_prep_spark.cli prep \
        --input corpus.txt --output out/ \
        --shard-size 4096 --min-count 5 --window 10 [--tfrecord]

    python -m swivel_spark_prep_spark.cli bench-query Q13_agg_tpch_q1 \
        --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="swivel-spark-prep")
    sub = p.add_subparsers(dest="cmd", required=True)

    prep = sub.add_parser("prep", help="run the swivel prep pipeline")
    prep.add_argument("--input", required=True, help="text corpus (one doc per line) or parquet with doc_id/text")
    prep.add_argument("--output", required=True, help="output directory")
    prep.add_argument("--shard-size", type=int, default=4096)
    prep.add_argument("--min-count", type=int, default=5)
    prep.add_argument("--window", type=int, default=10)
    prep.add_argument("--tfrecord", action="store_true", help="also write TFRecord shards")
    prep.add_argument("--master", default=None)

    bq = sub.add_parser("bench-query", help="run one registered query")
    bq.add_argument("name")
    bq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    bq.add_argument("--master", default=None)

    dc = sub.add_parser(
        "dedup-cluster",
        help="fuzzy dedup: MinHash-LSH pairs → connected components → "
        "survivors + cluster map",
    )
    dc.add_argument("--input", required=True, help="parquet with doc_id/text")
    dc.add_argument("--output", required=True, help="output directory")
    dc.add_argument("--threshold", type=float, default=0.8, help="Jaccard")
    dc.add_argument("--ngram", type=int, default=3, help="shingle width")
    dc.add_argument("--master", default=None)

    pc = sub.add_parser(
        "prep-corpus",
        help="training-data prep: clean → dedup → split → pack → write",
    )
    pc.add_argument("--input", required=True, help="parquet with doc_id/text")
    pc.add_argument("--output", required=True, help="output directory")
    pc.add_argument("--chunk-tokens", type=int, default=2048)
    pc.add_argument(
        "--bpe-merges",
        type=int,
        default=0,
        help="train a BPE merge table of this size on the deduped corpus "
        "and pack by BPE token count (0 = whitespace tokens)",
    )
    pc.add_argument("--train", type=float, default=0.9)
    pc.add_argument("--val", type=float, default=0.05)
    pc.add_argument("--test", type=float, default=0.05)
    pc.add_argument("--no-redact", action="store_true")
    pc.add_argument("--master", default=None)

    cs = sub.add_parser(
        "corpus-stats",
        help="one-call corpus report: size, tokens, language mix, "
        "Gopher pass rate, duplicate rates",
    )
    cs.add_argument("--input", required=True, help="parquet with doc_id/text")
    cs.add_argument(
        "--near-dups",
        action="store_true",
        help="also run MinHash-LSH near-dup pair detection (extra pass)",
    )
    cs.add_argument("--master", default=None)

    pr = sub.add_parser(
        "profile",
        help="single-scan table profile: per-column nulls/NDV/ranges",
    )
    pr.add_argument("--input", required=True, help="parquet table")
    pr.add_argument("--exact-ndv", action="store_true")
    pr.add_argument("--master", default=None)

    qt = sub.add_parser(
        "quantiles",
        help="mergeable DDSketch quantiles of a numeric column, "
        "optionally per group (+ '__total__' rollup-by-merge)",
    )
    qt.add_argument("--input", required=True, help="parquet table")
    qt.add_argument("--column", required=True, help="numeric column")
    qt.add_argument("--by", default=None, help="optional group column")
    qt.add_argument(
        "--q", default="0.5,0.9,0.99", help="comma-separated quantiles"
    )
    qt.add_argument("--alpha", type=float, default=0.01)
    qt.add_argument("--master", default=None)

    card = sub.add_parser(
        "dataset-card",
        help="long-format dataset card: corpus totals, dup count, "
        "vocab size, type-token ratio",
    )
    card.add_argument("--input", required=True, help="parquet with doc_id/text")
    card.add_argument("--master", default=None)

    se = sub.add_parser(
        "search", help="BM25 full-text top-k over a doc_id/text table"
    )
    se.add_argument("--input", required=True, help="parquet with doc_id/text")
    se.add_argument("query", nargs="+", help="query terms")
    se.add_argument("-k", type=int, default=10)
    se.add_argument("--master", default=None)

    sel = sub.add_parser(
        "select",
        help="DSIR data selection: keep the most target-like fraction "
        "of a corpus by hashed-bigram importance weight",
    )
    sel.add_argument("--input", required=True, help="parquet with doc_id/text")
    sel.add_argument(
        "--target-sql",
        required=True,
        help="boolean SQL expression over the input columns marking "
        "target-distribution rows (e.g. \"source = 'wiki'\")",
    )
    sel.add_argument("--output", required=True)
    sel.add_argument(
        "--keep", type=float, default=0.2, help="fraction of raw rows to keep"
    )
    sel.add_argument("--buckets", type=int, default=4096)
    sel.add_argument("--master", default=None)

    dr = sub.add_parser(
        "drift",
        help="PSI drift report between a baseline and a current parquet "
        "table (stable/moderate/drifted per numeric column)",
    )
    dr.add_argument("--baseline", required=True)
    dr.add_argument("--current", required=True)
    dr.add_argument("--cols", required=True, help="comma-separated numeric columns")
    dr.add_argument("--bins", type=int, default=10)
    dr.add_argument("--master", default=None)

    pg = sub.add_parser(
        "pagerank",
        help="PageRank over an edge parquet (src,dst); optional "
        "personalization seeds",
    )
    pg.add_argument("--input", required=True, help="parquet with src/dst columns")
    pg.add_argument("--src", default="src")
    pg.add_argument("--dst", default="dst")
    pg.add_argument("--iterations", type=int, default=10)
    pg.add_argument("--damping", type=float, default=0.85)
    pg.add_argument("--seeds", default=None, help="comma-separated seed node ids")
    pg.add_argument("--output", required=True)
    pg.add_argument("--top", type=int, default=10, help="print the top-N nodes")
    pg.add_argument("--master", default=None)

    pii = sub.add_parser(
        "pii",
        help="scan a parquet text column for PII (email/phone/SSN/IPv4/"
        "card) and optionally write a redacted copy",
    )
    pii.add_argument("--input", required=True)
    pii.add_argument("--text-col", default="text")
    pii.add_argument("--luhn", action="store_true",
                     help="keep only Luhn-valid card hits")
    pii.add_argument("--redact-to", default=None,
                     help="write the scrubbed table to this parquet path")
    pii.add_argument("--master", default=None)

    dom = sub.add_parser(
        "domains",
        help="per-registered-domain footprint of a parquet URL column, "
        "with optional blocklist filtering stats",
    )
    dom.add_argument("--input", required=True)
    dom.add_argument("--url-col", default="url")
    dom.add_argument("--blocklist", default=None,
                     help="parquet/newline file of blocked domains")
    dom.add_argument("--top", type=int, default=20)
    dom.add_argument("--master", default=None)

    lp = sub.add_parser(
        "lsh-plan",
        help="MinHash-LSH banding planner: score every (bands x rows) "
        "factorization by FP/FN mass around a Jaccard threshold",
    )
    lp.add_argument("--num-hashes", type=int, default=128)
    lp.add_argument("--threshold", type=float, default=0.8)
    lp.add_argument("--master", default=None)

    cp = sub.add_parser(
        "compact",
        help="compact a parquet table's small files into target-sized "
        "bins (FFD plan, write-new-then-delete-old per bin)",
    )
    cp.add_argument("--table", required=True, help="parquet table directory")
    cp.add_argument("--target-mb", type=float, default=128.0)
    cp.add_argument("--small-fraction", type=float, default=0.5)
    cp.add_argument("--dry-run", action="store_true",
                    help="print the plan, touch nothing")
    cp.add_argument("--master", default=None)

    ch = sub.add_parser(
        "chunk",
        help="sliding-window RAG chunking: split docs into overlapping "
        "token windows (window/stride), write the chunk table",
    )
    ch.add_argument("--input", required=True, help="parquet with doc_id/text")
    ch.add_argument("--output", required=True, help="output directory")
    ch.add_argument("--window", type=int, default=256)
    ch.add_argument("--stride", type=int, default=128)
    ch.add_argument("--master", default=None)

    la = sub.add_parser(
        "label-aggregate",
        help="Dawid-Skene consensus labels from (item, rater, label) "
        "votes: write per-item labels, print per-rater quality",
    )
    la.add_argument("--input", required=True,
                    help="parquet with item/rater/label columns")
    la.add_argument("--output", required=True, help="output directory")
    la.add_argument("--item-col", default="item")
    la.add_argument("--rater-col", default="rater")
    la.add_argument("--label-col", default="label")
    la.add_argument("--iterations", type=int, default=3)
    la.add_argument("--master", default=None)

    cu = sub.add_parser(
        "curate",
        help="end-to-end curation: Gopher quality filter -> exact + "
        "MinHash dedup -> contamination screen -> temperature mixture "
        "-> BPE tokenize -> chunk packing -> sharded sink, with a "
        "stage-reconciling manifest.json",
    )
    cu.add_argument("input", help="parquet path with (doc_id, text[, lang])")
    cu.add_argument("output", help="output dir (data/ + manifest.json)")
    cu.add_argument("--benchmark", default=None,
                    help="parquet path of benchmark docs to screen against")
    cu.add_argument("--strata-col", default="lang")
    cu.add_argument("--min-words", type=int, default=5)
    cu.add_argument("--min-stopwords", type=int, default=2,
                    help="Gopher stopword rule (set 0 for non-English "
                    "or synthetic corpora)")
    cu.add_argument("--minhash-threshold", type=float, default=0.8)
    cu.add_argument("--temperature", type=float, default=2.0)
    cu.add_argument("--bpe-merges", type=int, default=100)
    cu.add_argument("--chunk-tokens", type=int, default=512)
    cu.add_argument("--shards", type=int, default=8)
    cu.add_argument("--sink", choices=("parquet", "tfrecord", "avro"),
                    default="parquet")
    cu.add_argument("--keep-rejects", action="store_true",
                    help="write per-stage dropped doc ids + evidence "
                    "under <output>/rejects/<stage>/")
    cu.add_argument("--master", default=None)

    ex = sub.add_parser(
        "explain-query",
        help="plan health report for one registered query: pushed "
        "filters, pruned schemas, codegen spans, shuffle/join mix, "
        "guardrail invariants",
    )
    ex.add_argument("name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ex.add_argument("--master", default=None)

    sv = sub.add_parser(
        "survival-report",
        help="Kaplan-Meier curve + RMST + (with --by) k-group log-rank "
        "over a (duration, event[, group]) parquet",
    )
    sv.add_argument("--input", required=True, help="parquet table")
    sv.add_argument("--duration", default="duration")
    sv.add_argument("--event", default="event")
    sv.add_argument("--by", default=None, help="optional cohort column")
    sv.add_argument(
        "--tau", type=float, default=None,
        help="RMST horizon (default: max observed duration)",
    )
    sv.add_argument("--output", default=None, help="optional parquet dir for the KM curve")
    sv.add_argument("--master", default=None)

    ab = sub.add_parser(
        "ab-report",
        help="A/B readout over a (unit, arm, value) parquet: Welch t, "
        "Mann-Whitney U, quantile treatment effects, per-arm "
        "delta-method ratio CIs — one JSON line",
    )
    ab.add_argument("--input", required=True, help="parquet table")
    ab.add_argument("--unit", default="unit")
    ab.add_argument("--arm", default="arm")
    ab.add_argument("--value", default="value")
    ab.add_argument("--arm-a", default="a")
    ab.add_argument("--arm-b", default="b")
    ab.add_argument("--master", default=None)

    pf = sub.add_parser(
        "preflight",
        help="pre-shuffle scale audits: shard-skew of hashing --input "
        "by --key into --shards buckets, plus (with --join-input) the "
        "join fan-out distribution against --join-key — one JSON line",
    )
    pf.add_argument("--input", required=True, help="parquet table")
    pf.add_argument("--key", required=True, help="partition/join key column")
    pf.add_argument("--shards", type=int, default=200)
    pf.add_argument(
        "--join-input", default=None,
        help="optional right-side parquet for the fan-out audit",
    )
    pf.add_argument(
        "--join-key", default=None,
        help="right-side key column (default: --key)",
    )
    pf.add_argument("--master", default=None)

    tr = sub.add_parser(
        "trend-report",
        help="stream-health randomness/trend readout over a timestamped "
        "parquet: Wald-Wolfowitz runs + Kendall turning points + "
        "trend/seasonal strength + (with --value) the mSPRT "
        "always-valid mean monitor's final p — one JSON line",
    )
    tr.add_argument("--input", required=True, help="parquet table")
    tr.add_argument("--ts", default="ts", help="timestamp column")
    tr.add_argument(
        "--value", default=None,
        help="optional metric column for the mSPRT monitor",
    )
    tr.add_argument("--master", default=None)

    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F  # noqa: F401 (prep-corpus)

    from swivel_spark_prep_spark.session import get_session

    # getOrCreate may hand us a pre-existing session (e.g. when driven
    # in-process) — only stop what we created.
    owns_session = SparkSession.getActiveSession() is None
    spark = get_session("swivel-spark-prep-cli", master=args.master)
    from swivel_spark_prep_spark.cache import persisted_scope

    # every subcommand fetches/writes its results before returning, so
    # one scope around the dispatch releases whatever the operators
    # persisted — even on error — instead of relying on process exit
    with persisted_scope():
        return _dispatch(args, spark, owns_session)


def _dispatch(args, spark, owns_session) -> int:
    from pyspark.sql import functions as F  # noqa: F401

    try:
        if args.cmd == "prep":
            from swivel_spark_prep_spark.operators.swivel import prep, write_outputs
            from swivel_spark_prep_spark.sources import read_corpus_text

            if args.input.endswith(".parquet") or args.input.rstrip("/").endswith(
                "parquet"
            ):
                docs = spark.read.parquet(args.input).select("doc_id", "text")
            else:
                docs = read_corpus_text(spark, args.input)
            result = prep(
                docs,
                window=args.window,
                min_count=args.min_count,
                shard_size=args.shard_size,
            )
            write_outputs(result, args.output, tfrecord=args.tfrecord)
            print(
                f"vocab={result.vocab_size} shards={result.num_shards}x"
                f"{result.num_shards} nnz={result.cooc.count()} → {args.output}"
            )
        elif args.cmd == "prep-corpus":
            from swivel_spark_prep_spark.operators.dedup import exact_dedup
            from swivel_spark_prep_spark.operators.packing import pack_sequences
            from swivel_spark_prep_spark.operators.sampling import hash_split
            from swivel_spark_prep_spark.operators.textstats import clean_text
            from swivel_spark_prep_spark.sinks import write_partitioned

            docs = spark.read.parquet(args.input).select("doc_id", "text")
            cleaned = clean_text(
                docs, redact=not args.no_redact
            ).select("doc_id", F.col("text_clean").alias("text"))
            deduped = exact_dedup(cleaned)
            split = hash_split(
                deduped,
                "doc_id",
                {"train": args.train, "val": args.val, "test": args.test},
            )
            if args.bpe_merges > 0:
                from swivel_spark_prep_spark.operators.bpe import (
                    bpe_token_count_expr,
                    train_bpe,
                )

                merges = train_bpe(deduped, num_merges=args.bpe_merges)
                split = split.withColumn(
                    "_bpe_n_tok", bpe_token_count_expr("text", merges)
                )
                packed = pack_sequences(
                    split, args.chunk_tokens, token_count_col="_bpe_n_tok"
                )
                split = split.drop("_bpe_n_tok")
            else:
                packed = pack_sequences(split, args.chunk_tokens)
            out = split.join(packed.drop("n_tok"), "doc_id")
            write_partitioned(out, args.output, ["split"])
            by = {
                r["split"]: r["n"]
                for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
            }
            print(
                f"docs={deduped.count()} splits={by} "
                f"chunks≤{args.chunk_tokens}tok → {args.output}"
            )
        elif args.cmd == "dedup-cluster":
            from swivel_spark_prep_spark.operators.dedup import (
                fuzzy_dedup_clusters,
                minhash_near_dups,
            )

            docs = spark.read.parquet(args.input)
            pairs = minhash_near_dups(
                docs, n=args.ngram, jaccard_threshold=args.threshold
            )
            clusters = fuzzy_dedup_clusters(docs, pairs)
            clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
            # Re-read the materialized clusters so the survivors join and
            # the count below reuse the written parquet instead of
            # re-executing the LSH→CC lineage per action (three full
            # recomputes otherwise); the survivors count likewise reads
            # back its own parquet (row-group-stats count, no re-join).
            clusters = spark.read.parquet(f"{args.output}/clusters")
            survivors = docs.join(
                clusters.filter("is_rep").select("doc_id"), "doc_id", "left_semi"
            )
            survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
            n_docs = docs.count()
            n_surv = spark.read.parquet(f"{args.output}/survivors").count()
            print(
                f"docs={n_docs} survivors={n_surv} "
                f"removed={n_docs - n_surv} → {args.output}"
            )
        elif args.cmd == "corpus-stats":
            from swivel_spark_prep_spark.operators.textstats import (
                gopher_quality,
                language_id,
            )

            docs = spark.read.parquet(args.input).select("doc_id", "text")
            # one scan: doc/token/char totals + exact-dup + Gopher stats
            g = gopher_quality(docs)
            agg = g.agg(
                F.count("*").alias("docs"),
                F.sum(F.size(F.split("text", " "))).alias("tokens"),
                F.sum(F.length("text")).alias("chars"),
                F.count_distinct(F.md5("text")).alias("uniq"),
                F.sum(F.col("gopher_pass").cast("long")).alias("gopher_ok"),
            ).collect()[0]
            print(
                f"docs={agg['docs']} tokens={agg['tokens']} "
                f"chars={agg['chars']} "
                f"exact_dups={agg['docs'] - agg['uniq']} "
                f"gopher_pass={agg['gopher_ok']}/{agg['docs']}"
            )
            mix = (
                language_id(docs)
                .groupBy("pred_lang")
                .agg(F.count("*").alias("n"))
                .orderBy(F.col("n").desc(), "pred_lang")
                .collect()
            )
            print("lang_mix=" + ",".join(f"{r.pred_lang}:{r.n}" for r in mix))
            if args.near_dups:
                from swivel_spark_prep_spark.operators.dedup import (
                    minhash_near_dups,
                )

                n_pairs = minhash_near_dups(docs).count()
                print(f"near_dup_pairs={n_pairs}")
        elif args.cmd == "profile":
            from swivel_spark_prep_spark.operators.profile import profile_table

            pdf = profile_table(
                spark.read.parquet(args.input), exact_ndv=args.exact_ndv
            ).toPandas()
            print(pdf.to_string(index=False))
        elif args.cmd == "quantiles":
            from swivel_spark_prep_spark.operators.profile import (
                ddsketch_build,
                ddsketch_merge,
                ddsketch_quantiles,
            )

            from swivel_spark_prep_spark.cache import track_persist

            qs = [float(x) for x in args.q.split(",") if x.strip()]
            df = spark.read.parquet(args.input)
            sk = ddsketch_build(df, args.column, args.by, alpha=args.alpha)
            if args.by:
                # consumed twice (per-group + merge) — persist the grid,
                # released by main's persisted_scope
                sk = track_persist(sk)
                sk = sk.unionByName(ddsketch_merge(sk))
            out = (
                ddsketch_quantiles(sk, qs, alpha=args.alpha)
                .orderBy("g", "q")
                .collect()
            )
            for r in out:
                print(f"{r.g}\tq{r.q:g}\t{r.est:.6g}")
        elif args.cmd == "dataset-card":
            from swivel_spark_prep_spark.operators.textstats import dataset_card

            pdf = dataset_card(spark.read.parquet(args.input)).toPandas()
            for _, r in pdf.iterrows():
                print(f"{r['metric']}\t{r['value']}")
        elif args.cmd == "search":
            from swivel_spark_prep_spark.operators.search import bm25_topk

            docs = spark.read.parquet(args.input).select("doc_id", "text")
            hits = bm25_topk(docs, args.query, k=args.k).collect()
            for r in hits:
                print(f"{r.doc_id}\t{r.score:.4f}")
            print(f"# {len(hits)} hits for {' '.join(args.query)}")
        elif args.cmd == "select":
            from swivel_spark_prep_spark.operators.sampling import dsir_weights

            docs = spark.read.parquet(args.input)
            target = F.expr(args.target_sql)
            w = dsir_weights(docs, target, n_buckets=args.buckets)
            raw_w = w.join(
                docs.filter(~target).select("doc_id"), "doc_id", "left_semi"
            )
            # exact percentile threshold from ONE 1-row aggregate,
            # folded into the filter (the X45 pattern) — ties at the
            # cut may keep slightly more than the requested fraction
            thr = raw_w.agg(
                F.percentile("log_weight", 1.0 - args.keep)
            ).first()[0]
            if thr is None:
                print(
                    "error: no raw (non-target) rows match — check "
                    "--target-sql",
                    file=sys.stderr,
                )
                return 2
            kept = docs.join(
                raw_w.filter(F.col("log_weight") >= thr).select("doc_id"),
                "doc_id",
                "left_semi",
            )
            kept.write.mode("overwrite").parquet(args.output)
            n_raw = raw_w.count()
            n_kept = spark.read.parquet(args.output).count()
            print(
                f"raw={n_raw} kept={n_kept} "
                f"(target {args.keep:.0%}) thr={thr:.4f} → {args.output}"
            )
        elif args.cmd == "drift":
            from swivel_spark_prep_spark.operators.quality import drift_report

            rep = drift_report(
                spark.read.parquet(args.baseline),
                spark.read.parquet(args.current),
                [c.strip() for c in args.cols.split(",") if c.strip()],
                bins=args.bins,
            ).collect()
            for r in rep:
                print(f"{r['col']}	{r['psi']:.4f}	{r['verdict']}")
        elif args.cmd == "pagerank":
            from swivel_spark_prep_spark.operators.graph import pagerank

            seeds = (
                [x.strip() for x in args.seeds.split(",") if x.strip()]
                if args.seeds
                else None
            )
            ranks = pagerank(
                spark.read.parquet(args.input),
                src_col=args.src,
                dst_col=args.dst,
                iterations=args.iterations,
                damping=args.damping,
                seeds=seeds,
            )
            ranks.write.mode("overwrite").parquet(args.output)
            top = (
                spark.read.parquet(args.output)
                .orderBy(F.desc("pagerank"), F.asc("node"))
                .limit(args.top)
                .collect()
            )
            for r in top:
                print(f"{r.node}	{r.pagerank:.8f}")
            print(f"# wrote ranks → {args.output}")
        elif args.cmd == "pii":
            from swivel_spark_prep_spark.operators.pii import (
                PII_PATTERNS,
                pii_redact,
                pii_scan,
            )

            docs = spark.read.parquet(args.input)
            scanned = pii_scan(docs, text_col=args.text_col, luhn_cards=args.luhn)
            totals = scanned.agg(
                F.count("*").alias("docs"),
                *[F.sum(f"pii_{c}").alias(c) for c in PII_PATTERNS],
                F.sum((F.col("pii_total") > 0).cast("long")).alias("docs_with_pii"),
            ).collect()[0]
            print(f"docs={totals['docs']} with_pii={totals['docs_with_pii']}")
            for c in PII_PATTERNS:
                print(f"  {c}: {totals[c]}")
            if args.redact_to:
                pii_redact(docs, text_col=args.text_col).write.mode(
                    "overwrite"
                ).parquet(args.redact_to)
                print(f"# wrote redacted table → {args.redact_to}")
        elif args.cmd == "domains":
            from swivel_spark_prep_spark.operators.urls import (
                blocklist_filter,
                domain_stats,
            )

            docs = spark.read.parquet(args.input)
            stats = domain_stats(docs, url_col=args.url_col)
            for r in (
                stats.orderBy(F.desc("n_docs"), F.asc_nulls_last("domain"))
                .limit(args.top)
                .collect()
            ):
                print(f"{r['domain'] or '<unparseable>'}	{r['n_docs']}	{r['share']:.4f}")
            if args.blocklist:
                if args.blocklist.endswith(".parquet"):
                    bl = spark.read.parquet(args.blocklist)
                else:
                    bl = spark.read.text(args.blocklist).select(
                        F.col("value").alias("domain")
                    )
                kept = blocklist_filter(docs, bl, url_col=args.url_col).count()
                total = docs.count()
                print(f"# blocklist keeps {kept}/{total} docs")
        elif args.cmd == "lsh-plan":
            from swivel_spark_prep_spark.operators.dedup import lsh_parameter_plan

            plan = lsh_parameter_plan(
                spark, num_hashes=args.num_hashes, threshold=args.threshold
            ).collect()
            print("b\tr\tp@t\tcrossover\tfp_mass\tfn_mass\ttotal")
            for r in plan:
                print(
                    f"{r['b']}\t{r['r']}\t{r['p_at_threshold']:.4f}\t"
                    f"{r['crossover']:.4f}\t{r['fp_mass']:.4f}\t"
                    f"{r['fn_mass']:.4f}\t{r['total_mass']:.4f}"
                )
            best = plan[0]
            print(
                f"# best trade: {best['b']} bands x {best['r']} rows "
                f"(candidate p at {args.threshold} = {best['p_at_threshold']:.4f})"
            )
        elif args.cmd == "compact":
            from swivel_spark_prep_spark.operators.compaction import (
                compact_table,
                list_parquet_files,
                plan_compaction,
            )

            target = int(args.target_mb * 1024 * 1024)
            if args.dry_run:
                plan = plan_compaction(
                    list_parquet_files(spark, args.table), target, args.small_fraction
                )
                for i, b in enumerate(plan):
                    print(f"bin {i}: {len(b['paths'])} files, {b['bytes']} bytes")
                print(f"# {len(plan)} bins planned (dry run)")
            else:
                stats = compact_table(
                    spark, args.table, target, args.small_fraction
                )
                print(
                    f"# compacted {stats['files_removed']} files into "
                    f"{stats['files_written']} ({stats['bytes_compacted']} bytes)"
                )
        elif args.cmd == "chunk":
            from swivel_spark_prep_spark.operators.chunking import (
                sliding_window_chunks,
            )

            docs = spark.read.parquet(args.input)
            chunks = sliding_window_chunks(
                docs, window=args.window, stride=args.stride
            )
            chunks.write.mode("overwrite").parquet(args.output)
            out = spark.read.parquet(args.output)
            n_docs = out.select("id").distinct().count()
            n_chunks = out.count()
            print(
                f"# {n_chunks} chunks from {n_docs} docs "
                f"(window={args.window}, stride={args.stride}) -> {args.output}"
            )
        elif args.cmd == "label-aggregate":
            from swivel_spark_prep_spark.operators.labeling import (
                dawid_skene,
                dawid_skene_rater_quality,
            )

            ratings = spark.read.parquet(args.input)
            labels = dawid_skene(
                ratings, args.item_col, args.rater_col, args.label_col,
                iterations=args.iterations,
            )
            labels.write.mode("overwrite").parquet(args.output)
            rq = dawid_skene_rater_quality(
                ratings, args.item_col, args.rater_col, args.label_col,
                iterations=args.iterations,
            ).orderBy("rater").collect()
            n = spark.read.parquet(args.output).count()
            print(f"# {n} consensus labels -> {args.output}")
            for r in rq:
                print(
                    f"# rater {r.rater}: n={r.n_ratings} "
                    f"accuracy={r.accuracy}"
                )
        elif args.cmd == "curate":
            import json as _json

            from swivel_spark_prep_spark.curate import curate

            docs = spark.read.parquet(args.input)
            cols = [c for c in ("doc_id", "text", args.strata_col)
                    if c in docs.columns]
            strata = args.strata_col if args.strata_col in docs.columns else None
            bench = (spark.read.parquet(args.benchmark)
                     if args.benchmark else None)
            man = curate(
                spark, docs.select(*cols), args.output,
                benchmark=bench, strata_col=strata,
                min_words=args.min_words,
                gopher_kwargs={"min_stopwords": args.min_stopwords},
                minhash_threshold=args.minhash_threshold,
                temperature=args.temperature,
                bpe_merges=args.bpe_merges,
                chunk_tokens=args.chunk_tokens,
                shards=args.shards, sink=args.sink,
                keep_rejects=args.keep_rejects,
            )
            print(_json.dumps(
                {"rows_final": man["rows_final"],
                 "total_tokens": man["total_tokens"],
                 "n_chunks": man["n_chunks"],
                 "reconciles": man["reconciles"],
                 "stages": [
                     {"stage": s["stage"], "rows_out": s["rows_out"],
                      "dropped": s["dropped"]} for s in man["stages"]],
                 "manifest": args.output + "/manifest.json"}))
        elif args.cmd == "explain-query":
            import json as _json

            from swivel_spark_prep_spark.plans import plan_report
            from swivel_spark_prep_spark.queries.declared import DECLARED_QUERIES
            from swivel_spark_prep_spark.queries.extra import EXTRA_QUERIES

            registry = {**DECLARED_QUERIES, **EXTRA_QUERIES}
            if args.name not in registry:
                print(f"unknown query {args.name}", file=sys.stderr)
                return 2
            rep = plan_report(registry[args.name](spark, args.sf_dir))
            print(_json.dumps({"query": args.name, **rep}))
        elif args.cmd == "survival-report":
            import json as _json

            from swivel_spark_prep_spark.operators.timeseries import (
                kaplan_meier,
                logrank_k,
                rmst,
            )

            df = spark.read.parquet(args.input)
            tau = args.tau
            if tau is None:
                max_dur = df.agg(
                    F.max(F.col(args.duration).cast("double"))
                ).collect()[0][0]
                if max_dur is None or max_dur <= 0.0:
                    print(
                        "survival-report: no usable rows "
                        f"(max({args.duration}) is {max_dur}); nothing to report",
                        file=sys.stderr,
                    )
                    return 2
                tau = float(max_dur)
            km = kaplan_meier(df, args.duration, args.event)
            if args.output:
                km.write.mode("overwrite").parquet(args.output)
            curve = km.orderBy("duration").collect()
            rep = {
                "n_event_times": len(curve),
                "final_survival": curve[-1]["survival"] if curve else 1.0,
                "rmst": rmst(df, args.duration, args.event, tau).collect()[0].asDict(),
            }
            if args.by:
                rep["logrank_k"] = [
                    r.asDict()
                    for r in logrank_k(df, args.duration, args.event, args.by)
                    .orderBy(args.by)
                    .collect()
                ]
            print(_json.dumps(rep, default=str))
        elif args.cmd == "ab-report":
            import json as _json

            from swivel_spark_prep_spark.operators.evalmetrics import (
                mann_whitney_u,
                quantile_treatment_effects,
                ratio_metric_ci,
                welch_ttest,
            )

            df = spark.read.parquet(args.input)
            a, b = args.arm_a, args.arm_b
            rep = {
                "welch": welch_ttest(df, args.value, args.arm, a, b)
                .collect()[0]
                .asDict(),
                "mann_whitney": mann_whitney_u(df, args.value, args.arm, a, b)
                .collect()[0]
                .asDict(),
                "qte": [
                    r.asDict()
                    for r in quantile_treatment_effects(
                        df, args.arm, args.value, a, b
                    )
                    .orderBy("p")
                    .collect()
                ],
                "ratio_by_arm": [
                    r.asDict()
                    for r in ratio_metric_ci(
                        df.filter(F.col(args.arm).isin([a, b])),
                        args.unit,
                        args.value,
                        args.arm,
                    )
                    .orderBy(args.arm)
                    .collect()
                ],
            }
            print(_json.dumps(rep, default=str))
        elif args.cmd == "preflight":
            import json as _json

            from swivel_spark_prep_spark.operators.quality import (
                join_fanout_audit,
                shard_skew_audit,
            )

            df = spark.read.parquet(args.input)
            rep = {
                "shard_skew": shard_skew_audit(
                    df, args.key, n_shards=args.shards
                ).collect()[0].asDict()
            }
            if args.join_input:
                right = spark.read.parquet(args.join_input)
                rep["join_fanout"] = join_fanout_audit(
                    df, right, args.key, args.join_key or args.key
                ).collect()[0].asDict()
            print(_json.dumps(rep, default=str))
        elif args.cmd == "trend-report":
            import json as _json

            from swivel_spark_prep_spark.operators.timeseries import (
                msprt_monitor,
                rate_runs_test,
                seasonal_trend_strength,
                turning_point_test,
            )

            df = spark.read.parquet(args.input)
            n_rows = df.filter(F.col(args.ts).isNotNull()).count()
            if n_rows == 0:
                print(
                    f"trend-report: no rows with non-null {args.ts}; "
                    "nothing to report",
                    file=sys.stderr,
                )
                return 2
            rep = {
                "n_rows": n_rows,
                "runs": rate_runs_test(df, args.ts).collect()[0].asDict(),
                "turning_points": turning_point_test(df, args.ts)
                .collect()[0]
                .asDict(),
                "strength": seasonal_trend_strength(df, args.ts)
                .collect()[0]
                .asDict(),
            }
            if args.value:
                tl = (
                    msprt_monitor(df, args.ts, args.value)
                    .orderBy("bucket")
                    .collect()
                )
                if tl:
                    rep["msprt_final"] = tl[-1].asDict()
                    rep["msprt_min_p"] = min(
                        r["p_always_valid"] for r in tl
                    )
            print(_json.dumps(rep, default=str))
        elif args.cmd == "bench-query":
            import time

            from swivel_spark_prep_spark.queries.declared import DECLARED_QUERIES
            from swivel_spark_prep_spark.queries.extra import EXTRA_QUERIES

            registry = {**DECLARED_QUERIES, **EXTRA_QUERIES}
            if args.name not in registry:
                print(f"unknown query {args.name}; known: {sorted(registry)}", file=sys.stderr)
                return 2
            t0 = time.perf_counter()
            pdf = registry[args.name](spark, args.sf_dir).toPandas()
            dt = time.perf_counter() - t0
            print(pdf.head(10).to_string(index=False))
            print(f"# {args.name}: {len(pdf)} rows in {dt:.3f}s")
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
