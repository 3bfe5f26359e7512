"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all JVM-side expressions (no Python UDFs), each
with a deterministic, SQL-expressible definition so the DuckDB oracle can
replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword-overlap
#: language-ID heuristic. Deterministic tie-break: list order below.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "dans", "est", "pour"],
    "es": ["el", "la", "los", "las", "de", "y", "en", "que", "es", "por"],
    "de": ["der", "die", "das", "und", "in", "von", "zu", "mit", "ist", "den"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "他"],
}
LANG_ORDER = list(STOPWORDS)


def lang_scores(toks_col="_toks") -> dict[str, F.Column]:
    toks = F.col(toks_col)
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).cast("long")
        for lang, words in STOPWORDS.items()
    }


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by stopword-overlap score; 'und' when no stopword
    matches. Argmax with the fixed LANG_ORDER tie-break. The token array
    is materialized once — referencing split() from each of the 5 score
    expressions would re-split per language."""
    base = docs.select("*", F.split(F.col(text_col), " ").alias("_toks"))
    scores = lang_scores("_toks")
    # left-to-right scan with strict > : earlier languages win ties
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in LANG_ORDER:
        cond = scores[lang] > best_score
        new_best = F.when(cond, F.lit(lang)).otherwise(best)
        new_score = F.when(cond, scores[lang]).otherwise(best_score)
        best, best_score = new_best, new_score
    return base.withColumn("pred_lang", best).drop("_toks")


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics per document:
    - n_tok: whitespace token count;
    - avg_tok_len: (chars − spaces) / tokens;
    - alpha_ratio: fraction of [a-z ] characters;
    - digit_ratio: fraction of [0-9];
    - score: 100 · alpha_ratio − 10 · digit_ratio, clamped to [0, 100],
      zeroed for docs with < 5 tokens."""
    # materialize the shared subexpressions (split / regex scans) once —
    # the ratio expressions below reference each of them 2–3 times
    text = F.col(text_col)
    base = docs.select(
        "*",
        F.length(text).cast("double").alias("_nc"),
        F.size(F.split(text, " ")).cast("long").alias("_nt"),
        F.length(F.regexp_replace(text, "[^a-z ]", "")).cast("double").alias("_na"),
        F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double").alias("_nd"),
    )
    n_chars, n_tok = F.col("_nc"), F.col("_nt")
    avg_tok_len = (n_chars - (n_tok - 1)) / n_tok
    alpha_ratio = F.col("_na") / n_chars
    digit_ratio = F.col("_nd") / n_chars
    raw = 100.0 * alpha_ratio - 10.0 * digit_ratio
    score = F.when(n_tok < 5, F.lit(0.0)).otherwise(
        F.least(F.lit(100.0), F.greatest(F.lit(0.0), raw))
    )
    return base.select(
        *[c for c in docs.columns],
        n_tok.alias("n_tok"),
        F.round(avg_tok_len, 4).alias("avg_tok_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(score, 4).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    ([a-z]+ runs | digits | single non-space symbol) — the cheap proxy for
    subword token budgeting."""
    text = F.col(text_col)
    return docs.select(
        "*",
        F.size(F.split(text, " ")).cast("long").alias("ws_tokens"),
        F.regexp_count(text, F.lit("[a-z]+|[0-9]|[^a-z0-9 ]")).cast("long").alias(
            "re_tokens"
        ),
    )


def repetition_score(
    docs: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """Within-document repetition (Gopher-style quality rule): the
    fraction of n-gram OCCURRENCES that are repeats of an earlier one,
    rep_ratio = 1 − distinct_ngrams / total_ngrams (0 for docs shorter
    than n tokens). High values flag boilerplate/spam for filtering.
    Pure per-row JVM array expressions — no explode, no shuffle. The
    token array is materialized as its own projection first: inlining
    split() into the transform lambda repeats the split subtree per
    reference (~30% slower)."""
    base = docs.select("*", F.split(F.col(text_col), " ").alias("_toks"))
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda p: F.xxhash64(*[F.element_at(toks, p + i + 1) for i in range(n)]),
    )
    total = F.size(toks) - (n - 1)
    ratio = F.when(total <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(grams)).cast("double") / total
    )
    return base.withColumn("rep_ratio", ratio).drop("_toks")


def clean_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_clean",
    redact: bool = True,
) -> DataFrame:
    """Normalization + redaction pass for training corpora, all JVM regex
    (one fused projection, no Python):
    - lowercase, collapse whitespace runs, trim;
    - with redact=True, mask email addresses as <email> and long digit
      runs (phone/account/card numbers, ≥7 digits with optional
      separators) as <number> — masking BEFORE the corpus ships beats
      filtering (keeps the document, drops the PII).
    Order matters: emails first (they may contain digits), then numbers,
    then whitespace cleanup of any gaps the masking left."""
    t = F.lower(F.col(text_col))
    if redact:
        t = F.regexp_replace(
            t, r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<email>"
        )
        t = F.regexp_replace(t, r"\d(?:[ \-.]?\d){6,}", "<number>")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return docs.withColumn(out_col, t)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:
    - fp_md5: md5 of the whitespace-normalized text (lower, collapsed
      runs of spaces, trimmed) — the exact-dedup key;
    - fp_rolling: polynomial rolling hash (base 31, mod 1e9+7 — the
      modulus keeps acc*31+c inside int64) over the normalized text's code
      points, computed JVM-side with aggregate()."""
    # normalized text materialized once — both fingerprints reference it
    base = docs.select(
        "*",
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), " +", " ")).alias(
            "_norm"
        ),
    )
    rolling = F.aggregate(
        F.transform(F.split(F.col("_norm"), ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(1000000007),
    )
    return base.select(
        *[c for c in docs.columns],
        F.md5(F.col("_norm")).alias("fp_md5"),
        rolling.alias("fp_rolling"),
    )


#: The Gopher paper's stopword-presence list (Rae et al. 2021, table A1).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The published Gopher quality-filter rule bundle (Rae et al.,
    "Scaling Language Models: ... Gopher", appendix A1.1 — the rule set
    MassiveText, RefinedWeb, FineWeb etc. all start from), as ONE
    declarative projection — every rule is a JVM expression over the
    token list, no UDFs, one scan, and each rule's boolean is emitted
    separately so a pipeline can audit WHY a document failed:

    - ``ok_word_count``: word count in [min_words, max_words]
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: (#'#' + #'...') / words ≤ 0.1
    - ``ok_bullet``: fraction of lines starting with a bullet ≤ 0.9
    - ``ok_ellipsis``: fraction of lines ending with '...' ≤ 0.3
    - ``ok_alpha``: fraction of words containing a letter ≥ 0.8
    - ``ok_stopwords``: ≥ 2 of the paper's 8 stopwords present
    - ``gopher_pass``: all of the above

    Thresholds are the paper's defaults, overridable per corpus.
    """
    t = F.split(F.col(text_col), " ")
    n_words = F.size(t)
    sum_word_len = F.length(F.col(text_col)) - (n_words - 1)
    mean_wl = sum_word_len / n_words
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    n_ellipsis = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis) / n_words
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike("^[-*•]")))  # noqa: E741
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike("\\.\\.\\.$"))) / n_lines
    )
    alpha_frac = (
        F.size(F.filter(t, lambda w: w.rlike("[a-zA-Z]"))) / n_words
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(t), stop_arr))
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "ok_bullet": bullet_frac <= max_bullet_frac,
        "ok_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "ok_alpha": alpha_frac >= min_alpha_frac,
        "ok_stopwords": n_stop >= min_stopwords,
    }
    out = docs
    overall = F.lit(True)
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
        overall = overall & F.col(name)
    return out.withColumn("gopher_pass", overall)


def compression_signal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic repetition/
    boilerplate signal dataset-curation pipelines threshold on (highly
    compressible text is template or repeated spans; near-incompressible
    text is noise/binary junk; natural prose sits in between). zlib at a
    fixed level is bit-deterministic, so the ratio is a stable feature.
    Arrow-batched (the deflate call IS the work — no JVM twin exists);
    everything downstream of the ratio stays declarative. Returns
    ``(id_col, n_bytes, n_compressed, ratio)`` with ratio ∈ (0, ~1.01]
    rounded to 4 dp."""
    import pandas as pd  # noqa: F811

    def _ratio(batches):
        import zlib

        for pdf in batches:
            texts = [(t or "").encode("utf-8") for t in pdf[text_col]]
            comp = [len(zlib.compress(b, level)) for b in texts]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(b) for b in texts],
                    "n_compressed": comp,
                    "ratio": [
                        round(c / n, 4) if n else 1.0
                        for c, n in zip(comp, [len(b) for b in texts])
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _ratio, schema=f"{id_col} long, n_bytes long, n_compressed long, ratio double"
    )


def nfc_normalize(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_nfc"
) -> DataFrame:
    """Unicode NFC normalization (canonical composition) of a text
    column — the fix for byte-distinct/visually-identical strings
    (decomposed accents, compatibility forms) that silently break
    exact dedup and token matching. Spark has no built-in Unicode
    normalizer, so this runs Python's unicodedata (the reference
    Unicode implementation) per Arrow batch via mapInPandas — the same
    seam as every other Python-kernel operator here; NULLs pass
    through."""
    from pyspark.sql.types import StringType, StructField, StructType

    if out_col in docs.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    out_schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, StringType())]
    )

    def _nfc(batches):
        import unicodedata

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(
                lambda x: None if x is None else unicodedata.normalize("NFC", x)
            )
            yield pdf

    return docs.mapInPandas(_nfc, out_schema)


def dataset_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-call dataset card: the corpus-level numbers a dataset README
    reports, as long-format (metric, value) rows — doc/token/char
    totals, exact-duplicate count, vocabulary size, type-token ratio,
    mean token length. Two aggregates total: one over documents (plus
    the md5 distinct), one over the exploded token stream for the
    vocabulary lane; both partial-aggregate map-side. Values are
    doubles rounded to 4dp so the card is engine-comparable."""
    toks = F.split(F.col(text_col), " ")
    d = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.size(toks)).cast("double").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("double").alias("n_chars"),
        (F.count("*") - F.count_distinct(F.md5(F.col(text_col))))
        .cast("double")
        .alias("exact_dup_docs"),
    )
    t = (
        docs.select(F.explode(toks).alias("_tok"))
        .filter(F.col("_tok") != "")
        .agg(
            F.count_distinct("_tok").cast("double").alias("vocab_size"),
            F.avg(F.length("_tok")).alias("mean_token_len"),
            F.count("*").cast("double").alias("_n_nonempty"),
        )
    )
    row = d.crossJoin(t)
    metrics = [
        ("n_docs", F.col("n_docs")),
        ("n_tokens", F.col("n_tokens")),
        ("n_chars", F.col("n_chars")),
        ("avg_tokens_per_doc", F.col("n_tokens") / F.col("n_docs")),
        ("exact_dup_docs", F.col("exact_dup_docs")),
        ("vocab_size", F.col("vocab_size")),
        ("type_token_ratio", F.col("vocab_size") / F.col("_n_nonempty")),
        ("mean_token_len", F.col("mean_token_len")),
    ]
    fields = F.array(
        *[
            F.struct(F.lit(k).alias("metric"), F.round(v, 4).alias("value"))
            for k, v in metrics
        ]
    )
    return row.select(F.explode(fields).alias("_m")).select("_m.*")


def mixture_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-slice token-distribution divergence vs the whole corpus — the
    mixture diagnostic behind "which sources drifted / which slice is
    redundant" calls when composing a training mix.

    For each group g, the unigram distribution p_g (add-``alpha``
    smoothing over the CORPUS vocabulary V) is compared to the corpus
    distribution p_c with

    - ``kl``:  KL(p_g ‖ p_c) = Σ_w p_g ln(p_g/p_c)   (asymmetric,
      penalizes tokens the slice uses that the corpus rarely does)
    - ``jsd``: Jensen-Shannon divergence (symmetric, bounded by ln 2)

    Scale design: one exploded-token aggregate per level (corpus vocab
    (w, c) and per-group counts (g, w, c_g)); the full grid is the
    |groups| × |V| cross of the small per-group totals relation
    (broadcast) with the vocab relation, left-joined with per-group
    counts on (g, w) — partitioned by w, never wider than the grid. The
    corpus scalars (|V|, N) ride a 1-row broadcast. At 1M vocab × 100
    sources the grid is 100M skinny rows: one shuffle, no driver state.

    Output: (group_col, n_tokens, kl, jsd) — raw doubles; round in the
    caller if hashing results.
    """
    toks = docs.select(
        F.col(group_col).alias("__g"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__w"),
    ).filter(F.col("__w") != "")

    vocab = toks.groupBy("__w").agg(F.count("*").alias("__c"))
    by_group = toks.groupBy("__g", "__w").agg(F.count("*").alias("__cg"))
    group_totals = toks.groupBy("__g").agg(F.count("*").alias("__ng"))
    scalars = vocab.agg(
        F.count("*").cast("double").alias("__v"),
        F.sum("__c").cast("double").alias("__n"),
    )

    grid = (
        vocab.crossJoin(F.broadcast(group_totals))
        .join(by_group, ["__g", "__w"], "left")
        .crossJoin(F.broadcast(scalars))
    )
    a = float(alpha)
    pg = (F.coalesce(F.col("__cg"), F.lit(0)) + a) / (
        F.col("__ng") + a * F.col("__v")
    )
    pc = (F.col("__c") + a) / (F.col("__n") + a * F.col("__v"))
    m = (pg + pc) / 2.0
    return (
        grid.groupBy(F.col("__g").alias(group_col))
        .agg(
            F.max("__ng").alias("n_tokens"),
            F.sum(pg * F.log(pg / pc)).alias("kl"),
            F.sum(0.5 * pg * F.log(pg / m) + 0.5 * pc * F.log(pc / m)).alias(
                "jsd"
            ),
        )
    )


def diversity_scores(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ns: tuple = (1, 3),
) -> DataFrame:
    """Distinct-n lexical diversity per slice (Li et al. 2016's
    distinct-1/distinct-2, public): |distinct n-grams| / |n-grams| —
    low values flag template-generated or heavily repeated slices a
    diversity-aware mix would downweight; near-1 trigram ratios flag
    fresh text.

    One exploded aggregate per n over the token stream (count +
    count_distinct on the group key, map-side partials); results join
    on the group key. Output: (group_col, n_tokens, distinct{n}...).
    """
    # materialize the split ONCE per row: inlining the split() expression
    # into the slice + n element_at lambda references re-evaluates the
    # split per reference (the repetition_score pitfall — this was a 10x
    # on the trigram pass)
    base = docs.select(
        F.col(group_col), F.split(F.lower(F.col(text_col)), " ").alias("__arr")
    )
    toks = F.col("__arr")
    out = None
    for n in ns:
        if n == 1:
            grams = base.select(
                F.col(group_col), F.explode(toks).alias("__g")
            ).filter(F.col("__g") != "")
        else:
            grams = base.select(
                F.col(group_col),
                F.explode(
                    F.transform(
                        F.slice(
                            toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))
                        ),
                        lambda w, i: F.concat_ws(
                            " ",
                            F.array(
                                *[
                                    F.element_at(toks, i + j + 1)
                                    for j in range(n)
                                ]
                            ),
                        ),
                    )
                ).alias("__g"),
            )
        # two cheap aggregates instead of count + count_distinct in one
        # (that shape EXPANDs the stream 2x); the second groupBy runs
        # over the already-distinct (group, gram) relation
        per = grams.groupBy(group_col, "__g").agg(F.count("*").alias("__c"))
        agg = per.groupBy(group_col).agg(
            F.sum("__c").alias(f"__n{n}"),
            F.count("*").alias(f"__d{n}"),
        )
        # left join: a group too short for any higher-n gram must still
        # report its lower-n columns (NULL distinct{n}, not a dropped row)
        out = agg if out is None else out.join(agg, group_col, "left")
    cols = [F.col(group_col)]
    if 1 in ns:
        cols.append(F.col("__n1").alias("n_tokens"))
    for n in ns:
        cols.append(
            (F.col(f"__d{n}") / F.col(f"__n{n}")).alias(f"distinct{n}")
        )
    return out.select(*cols)


def zipf_fit(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Zipf's-law fit per slice: least-squares slope/intercept/R² of
    ln(frequency) against ln(rank) over the slice's token frequency
    table — natural text sits near slope −1; strong departures flag
    template/generated slices (too flat) or tiny degenerate
    vocabularies, complementing diversity_scores' distinct-n view.

    One exploded aggregate to the per-(group, token) counts, a
    rank window over the per-group VOCABULARY relation (never raw
    tokens), then the built-in regr_* aggregates — all JVM-side.
    Ties rank deterministically (count desc, token asc). Output:
    (group_col, vocab_size, slope, intercept, r2)."""
    from pyspark.sql import Window

    counts = (
        docs.select(
            F.col(group_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_tok"),
        )
        .filter(F.col("_tok") != "")
        .groupBy(group_col, "_tok")
        .agg(F.count("*").alias("_cnt"))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("_cnt"), F.asc("_tok"))
    ranked = counts.withColumn("_rank", F.row_number().over(w))
    y = F.log(F.col("_cnt").cast("double"))
    x = F.log(F.col("_rank").cast("double"))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").alias("vocab_size"),
            F.regr_slope(y, x).alias("slope"),
            F.regr_intercept(y, x).alias("intercept"),
            F.regr_r2(y, x).alias("r2"),
        )
        .orderBy(group_col)
    )


def heaps_law_fit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_points: int = 10,
    salt: str = "heaps",
) -> DataFrame:
    """Vocabulary-growth (Heaps'/Herdan's law) fit: V(N) ≈ k·N^β —
    "how fast does the vocabulary grow as the corpus scales", the
    companion diagnostic to :func:`zipf_fit` and the number that sizes
    a tokenizer vocab or a vocab-keyed shuffle BEFORE the 100 TB run.

    Growth points come from ``n_points`` cumulative pseudo-random
    prefixes: docs land in buckets by the md5 hash of their id (a
    deterministic random order, the standard way to measure Heaps
    without an arbitrary document order), N_f = tokens in buckets ≤ f,
    V_f = distinct words whose FIRST bucket ≤ f — one grouped
    aggregate per relation (per-word min-bucket is vocab-sized; the
    cumulative step is a triangular join over the ``n_points``-row
    bucket table, no window anywhere). The log-log OLS over the
    ``n_points`` points is a single aggregate. Output: one row
    (n_points, total_tokens, vocab, beta, k, r2). β is NULL for
    degenerate inputs (fewer than 2 non-empty prefixes).
    """
    from swivel_spark_prep_spark.operators.sampling import hash_bucket

    if n_points < 2:
        raise ValueError(f"n_points must be >= 2, got {n_points}")
    toks = docs.select(
        (hash_bucket(F.col(id_col), n_points, salt=salt) + 1).alias("bkt"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    per_bucket_tokens = toks.groupBy("bkt").agg(F.count("*").alias("nt"))
    first_seen = toks.groupBy("w").agg(F.min("bkt").alias("fb"))
    per_bucket_vocab = first_seen.groupBy("fb").agg(F.count("*").alias("nv"))
    spark = docs.sparkSession
    grid = spark.range(1, n_points + 1).select(F.col("id").alias("f"))
    pts = (
        grid.join(per_bucket_tokens, F.col("bkt") <= F.col("f"), "left")
        .groupBy("f")
        .agg(F.coalesce(F.sum("nt"), F.lit(0)).alias("N"))
        .join(
            grid.join(per_bucket_vocab, F.col("fb") <= F.col("f"), "left")
            .groupBy("f")
            .agg(F.coalesce(F.sum("nv"), F.lit(0)).alias("V")),
            "f",
        )
        .filter((F.col("N") > 0) & (F.col("V") > 0))
        .select(F.log("N").alias("x"), F.log("V").alias("y"), "N", "V")
    )
    m = F.count("*").cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxx, sxy, syy = (
        F.sum(F.col("x") * F.col("x")),
        F.sum(F.col("x") * F.col("y")),
        F.sum(F.col("y") * F.col("y")),
    )
    # Variance guards use a RELATIVE tolerance: for a constant axis the
    # raw m*s2 - s*s is a catastrophic cancellation whose ~1e-15-relative
    # residue has a run-order-dependent SIGN (Spark's parallel sums) — a
    # bare > 0 flaps between NULL and 0.0 across runs/engines. A real
    # variance clears 1e-9 relative by many orders of magnitude.
    varx = m * sxx - sx * sx
    vary = m * syy - sy * sy
    x_ok = varx > 1e-9 * m * sxx
    y_ok = vary > 1e-9 * m * syy
    beta = F.when((m > 1) & x_ok, (m * sxy - sx * sy) / varx)
    r2 = F.when(
        x_ok & y_ok,
        F.pow(m * sxy - sx * sy, 2) / (varx * vary),
    )
    return pts.agg(
        F.count("*").alias("n_points"),
        F.max("N").alias("total_tokens"),
        F.max("V").alias("vocab"),
        F.round(beta, 6).alias("beta"),
        F.round(F.exp((sy - beta * sx) / m), 6).alias("k"),
        F.round(r2, 6).alias("r2"),
    )


def token_information_gain(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    min_df: int = 2,
) -> DataFrame:
    """Feature selection for token models: information gain of each
    token's PRESENCE about a binary label — IG(w) = H(Y) − H(Y|X_w) —
    the classic filter ranking (Yang & Pedersen 1997) run before
    training a hashed-feature classifier (operators/linear.py): which
    words are worth a bucket at all.

    One distinct (doc, token) aggregate → per-token (df, positives-
    containing) counts joined against the 1-row corpus marginals; the
    entropy algebra is pure codegen with 0·ln 0 guarded to 0. Tokens
    with df < ``min_df`` are dropped (singleton tokens memorize, not
    inform). Top-``k`` by (IG desc, token asc) via TakeOrdered.
    Output: (token, df, p_pos_given_token, ig).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("boolean").cast("int").alias("_y"),
        F.col(text_col).alias("_t"),
    ).filter(F.col("_y").isNotNull())
    tot = base.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("_y").cast("double").alias("_n1"),
    )
    toks = base.select(
        "_id", "_y", F.explode(F.split(F.lower("_t"), " ")).alias("w")
    ).filter(F.col("w") != "").distinct()
    per = toks.groupBy("w").agg(
        F.count("*").cast("double").alias("_df"),
        F.sum("_y").cast("double").alias("_df1"),
    ).filter(F.col("_df") >= min_df)

    def h(p):
        # binary entropy with the 0·ln 0 = 0 convention, NULL-proof
        safe = F.when((p > 0) & (p < 1), p)
        return F.coalesce(
            -safe * F.log(safe) - (1 - safe) * F.log(1 - safe), F.lit(0.0)
        )

    j = per.crossJoin(F.broadcast(tot))
    p1 = F.col("_n1") / F.col("_n")
    pw = F.col("_df") / F.col("_n")
    p1w = F.col("_df1") / F.col("_df")
    p1nw = (F.col("_n1") - F.col("_df1")) / (F.col("_n") - F.col("_df"))
    ig = h(p1) - (pw * h(p1w) + (1 - pw) * F.when(
        F.col("_n") > F.col("_df"), h(p1nw)
    ).otherwise(F.lit(0.0)))
    return (
        j.select(
            F.col("w").alias("token"),
            F.col("_df").cast("long").alias("df"),
            F.round(p1w, 6).alias("p_pos_given_token"),
            F.round(ig, 6).alias("ig"),
        )
        .orderBy(F.desc("ig"), F.asc("token"))
        .limit(k)
    )


def pairwise_distribution_distances(
    counts: DataFrame,
    group_col: str,
    item_col: str,
    count_col: str,
) -> DataFrame:
    """Pairwise distances between the item distributions of every two
    groups — the source×source companion to :func:`mixture_divergence`
    (which compares each slice to the corpus): given a per-(group,
    item) count relation, emit for every unordered group pair

        bc        = Σ_w √(p₁(w)·p₂(w))          (Bhattacharyya coeff.)
        hellinger = √(1 − bc)                    (Hellinger 1909 metric)
        tv        = ½·Σ_w |p₁(w) − p₂(w)|        (total variation)

    TV over the UNION support decomposes as ½(Σ_common|p₁−p₂| +
    (1−m₁) + (1−m₂)) where m_g is group g's probability mass on the
    COMMON items — so the common-item join carries the whole
    computation and disjoint-support mass is recovered arithmetically,
    never by materializing the union grid.

    Scale shape: group totals are a group-cardinality broadcast; the
    only data-sized work is one self-join of the (group, item)
    AGGREGATE on item (fan-out per item ≤ |groups|², and |groups| is
    bounded by contract — sources/langs, not data); the pair grid is
    built from the group list so pairs with DISJOINT supports still
    appear (bc = 0, tv = 1 — the absent-cell lesson). Output:
    (g1, g2, n_common, bc, hellinger, tv), g1 < g2.
    """
    base = counts.select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(item_col).alias("_w"),
        F.col(count_col).cast("double").alias("_c"),
    ).filter(F.col("_g").isNotNull() & F.col("_w").isNotNull() & (F.col("_c") > 0))
    totals = base.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    p = base.join(F.broadcast(totals), "_g").select(
        "_g", "_w", (F.col("_c") / F.col("_ng")).alias("_p")
    )
    a = p.select(
        F.col("_g").alias("g1"), F.col("_w").alias("_w"), F.col("_p").alias("_p1")
    )
    b = p.select(
        F.col("_g").alias("g2"), F.col("_w").alias("_w"), F.col("_p").alias("_p2")
    )
    common = (
        a.join(b, "_w")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(
            F.count("*").alias("n_common"),
            F.sum(F.sqrt(F.col("_p1") * F.col("_p2"))).alias("_bc"),
            F.sum(F.abs(F.col("_p1") - F.col("_p2"))).alias("_sabs"),
            F.sum("_p1").alias("_m1"),
            F.sum("_p2").alias("_m2"),
        )
    )
    ga = totals.select(F.col("_g").alias("g1"))
    gb = totals.select(F.col("_g").alias("g2"))
    grid = ga.crossJoin(F.broadcast(gb)).filter(F.col("g1") < F.col("g2"))
    full = grid.join(common, ["g1", "g2"], "left")
    bc = F.coalesce(F.col("_bc"), F.lit(0.0))
    tv = 0.5 * (
        F.coalesce(F.col("_sabs"), F.lit(0.0))
        + (1.0 - F.coalesce(F.col("_m1"), F.lit(0.0)))
        + (1.0 - F.coalesce(F.col("_m2"), F.lit(0.0)))
    )
    return full.select(
        "g1",
        "g2",
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
        F.round(bc, 6).alias("bc"),
        # clamp: bc can exceed 1 by 1e-16 float noise on identical dists
        F.round(F.sqrt(F.greatest(1.0 - bc, F.lit(0.0))), 6).alias("hellinger"),
        F.round(tv, 6).alias("tv"),
    )


def readability_scores(
    docs: DataFrame,
    group_cols: list | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade level (Flesch 1948,
    Kincaid 1975) per group — the classic readability screens corpus
    curation uses to bucket text by audience difficulty:

        ease  = 206.835 − 1.015·(W/S) − 84.6·(Sy/W)
        grade = 0.39·(W/S) + 11.8·(Sy/W) − 15.59

    with W = whitespace tokens, S = sentence marks ([.!?]+ runs, min 1
    so unpunctuated text counts as one sentence), and Sy = syllables by
    the standard vowel-group heuristic (runs of [aeiouy] in lowercased
    text; spaces break runs, so the per-word sum equals one whole-text
    regexp_count). Pure codegen — three regex/size expressions + one
    hash aggregate, no UDF, no shuffle beyond the group-by; the regexes
    are in the Java∩RE2 subset so the DuckDB oracle replays them
    exactly.

    Output (one row per group): (group..., n_docs, avg_words,
    mean_ease, mean_grade).
    """
    group_cols = list(group_cols or [])
    lower = F.lower(F.col(text_col))
    words = F.size(F.split(lower, " ", -1)).cast("double")
    syll = F.regexp_count(lower, F.lit("[aeiouy]+")).cast("double")
    sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit("[.!?]+")), F.lit(1)
    ).cast("double")
    wps = words / sents
    spw = syll / words
    per = docs.filter(F.col(text_col).isNotNull()).select(
        *group_cols,
        words.alias("_w"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias("_e"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias("_g"),
    ).filter(F.col("_w") > 0)
    return per.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("_w"), 6).alias("avg_words"),
        F.round(F.avg("_e"), 6).alias("mean_ease"),
        F.round(F.avg("_g"), 6).alias("mean_grade"),
    )


def vocab_richness(
    docs: DataFrame,
    group_cols: list | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary richness / saturation per group — Chao1 and Good's
    coverage (Chao 1984; Good 1953), the "how much vocabulary have we
    NOT seen yet" estimators a corpus-mix designer reads before adding
    more of a source:

        chao1    = V + f1(f1−1) / (2(f2+1))   (bias-corrected form,
                                               finite when f2 = 0)
        coverage = 1 − f1/N                   (Good–Turing: unseen
                                               probability mass ≈ f1/N)

    with V = distinct tokens, N = total tokens, f1/f2 = tokens seen
    exactly once/twice. Complements heaps_law_fit (X189): Heaps
    extrapolates the growth CURVE, Chao1 estimates the asymptote.

    One explode → one (group, token) count aggregate → one group
    reduction; token-cardinality shuffle with map-side combine, the
    word-count shape. Output: (group..., n_tokens, v_distinct, f1, f2,
    chao1, coverage).
    """
    group_cols = list(group_cols or [])
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        *group_cols,
        F.explode(F.split(F.lower(F.col(text_col)), " ", -1)).alias("_t"),
    ).filter(F.col("_t") != "")
    counts = toks.groupBy(*group_cols, "_t").agg(F.count("*").alias("_c"))
    return counts.groupBy(*group_cols).agg(
        F.sum("_c").alias("n_tokens"),
        F.count("*").alias("v_distinct"),
        F.sum((F.col("_c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("_c") == 2).cast("long")).alias("f2"),
        F.round(
            F.count("*")
            + F.sum((F.col("_c") == 1).cast("double"))
            * (F.sum((F.col("_c") == 1).cast("double")) - 1)
            / (2.0 * (F.sum((F.col("_c") == 2).cast("double")) + 1)),
            6,
        ).alias("chao1"),
        F.round(
            1.0 - F.sum((F.col("_c") == 1).cast("double")) / F.sum("_c"),
            6,
        ).alias("coverage"),
    )


def boilerplate_share(
    docs: DataFrame,
    min_docs: int = 3,
    group_cols: list | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = ". ",
) -> DataFrame:
    """Boilerplate mass per group — what fraction of each source's
    tokens live in LINES repeated across ≥ ``min_docs`` distinct
    documents (navbars, license footers, cookie banners: the content
    remove_common_lines strips; this measures HOW MUCH there is to
    strip, per source, before committing to the pass).

    Line = ``line_delim`` split segment. One explode → per-line
    distinct-doc count (hash aggregate) → join the flag back → one
    grouped ratio. Shuffles carry (line-hash, count), never documents.
    Output (one row per group): (group..., n_lines, boiler_lines,
    tokens_total, boiler_tokens, boiler_token_pct).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    import re as _re

    group_cols = list(group_cols or [])
    # Spark split() takes a REGEX — '. ' would mean "any char + space";
    # escape so the delimiter is literal (DuckDB's string_split is
    # literal, and so is this operator's contract)
    delim_re = _re.escape(line_delim)
    lines = docs.filter(F.col(text_col).isNotNull()).select(
        *group_cols,
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), delim_re, -1)).alias("_l"),
    ).filter(F.col("_l") != "")
    counts = lines.groupBy(F.sha2(F.col("_l"), 256).alias("_h")).agg(
        F.countDistinct("_id").alias("_docs")
    )
    tagged = lines.select(
        *group_cols,
        F.sha2(F.col("_l"), 256).alias("_h"),
        F.size(F.split(F.col("_l"), " ", -1)).cast("double").alias("_nt"),
    ).join(counts, "_h")
    boiler = (F.col("_docs") >= min_docs).cast("int")
    return tagged.groupBy(*group_cols).agg(
        F.count("*").alias("n_lines"),
        F.sum(boiler).cast("long").alias("boiler_lines"),
        F.sum("_nt").cast("long").alias("tokens_total"),
        F.sum(F.col("_nt") * boiler).cast("long").alias("boiler_tokens"),
        F.round(F.sum(F.col("_nt") * boiler) / F.sum("_nt") * 100.0, 6).alias(
            "boiler_token_pct"
        ),
    )


def topk_term_overlap(
    docs: DataFrame,
    group_col: str = "lang",
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-k vocabulary overlap matrix across slices — for every slice
    pair, how much of their HEAD vocabulary (top-k terms by frequency)
    is shared: n_common and the Jaccard of the two top-k sets. The
    corpus-composition diagnostic behind "are these two sources/
    languages/snapshots interchangeable or complementary" — X222's
    distribution distances weigh the whole distribution; this isolates
    the head, where tokenizer and mixture decisions actually bite.

    Term counts collapse the corpus once (word-count shape); top-k per
    slice is a PARTITIONED rank window over the (slice, term) count
    relation; the pair join is keyed on term between two k-bounded
    relations (≤ #slices·k rows each side). Ties at rank k break by
    term (deterministic). Output (one row per unordered slice pair
    with n_common ≥ 0 — pairs sharing nothing still appear):
    (group_a, group_b, k, n_common, jaccard).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    toks = docs.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.explode(F.split(F.lower(F.col(text_col)), " ", -1)).alias("_t"),
    ).filter(F.col("_t") != "")
    counts = toks.groupBy("_g", "_t").agg(F.count("*").alias("_c"))
    w = Window.partitionBy("_g").orderBy(F.col("_c").desc(), F.col("_t"))
    top = counts.select(
        "_g", "_t", F.row_number().over(w).alias("_rk")
    ).filter(F.col("_rk") <= k)
    from swivel_spark_prep_spark.cache import track_persist

    top = track_persist(top.select("_g", "_t"))
    # per-slice top set SIZE (= min(k, vocab)) for the Jaccard denominator
    sizes = top.groupBy("_g").agg(F.count("*").alias("_n"))
    a = top.select(F.col("_g").alias("group_a"), "_t")
    b = top.select(F.col("_g").alias("group_b"), "_t")
    common = (
        a.join(b, "_t")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("n_common"))
    )
    grid = (
        sizes.select(F.col("_g").alias("group_a"), F.col("_n").alias("_na"))
        .join(
            F.broadcast(
                sizes.select(F.col("_g").alias("group_b"), F.col("_n").alias("_nb"))
            ),
            F.col("group_a") < F.col("group_b"),
        )
    )
    return grid.join(common, ["group_a", "group_b"], "left").select(
        "group_a",
        "group_b",
        F.lit(int(k)).cast("long").alias("k"),
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
        F.round(
            F.coalesce(F.col("n_common"), F.lit(0))
            / (F.col("_na") + F.col("_nb") - F.coalesce(F.col("n_common"), F.lit(0))),
            6,
        ).alias("jaccard"),
    )


def encoding_audit(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Encoding-health audit per corpus slice — the mojibake/QA gate a
    web-scale ingest runs before any text operator sees the data:

    - ``docs_replacement``: documents containing U+FFFD (the UTF-8
      decoder's substitution for undecodable bytes — each one is a
      document that was decoded with the wrong charset somewhere)
    - ``ctrl_char_ratio``: C0 control characters (excluding \\t \\n \\r)
      per character — binary-in-text and terminal-escape contamination
    - ``non_ascii_share``: non-ASCII characters per character — not an
      error signal but the mix statistic that catches a slice suddenly
      switching script or losing its diacritics
    - ``ascii_frac_docs``: fraction of pure-ASCII documents

    One scan, all counters via length-difference of regexp_replace (no
    UDF, no explode); one hash aggregate per slice.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    repl = F.length(F.regexp_replace(t, "�", "")) < n_chars
    n_ctrl = n_chars - F.length(
        F.regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")
    )
    n_non_ascii = n_chars - F.length(
        F.regexp_replace(t, "[^\\x00-\\x7F]", "")
    )
    return (
        docs.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(repl.cast("long")).alias("docs_replacement"),
            F.round(
                F.sum(n_ctrl) / F.sum(n_chars), 6
            ).alias("ctrl_char_ratio"),
            F.round(
                F.sum(n_non_ascii) / F.sum(n_chars), 6
            ).alias("non_ascii_share"),
            F.round(
                F.avg((n_non_ascii == 0).cast("double")), 6
            ).alias("ascii_frac_docs"),
        )
    )


def log_odds_terms(
    docs: DataFrame,
    slice_col: str,
    slice_a,
    slice_b,
    text_col: str = "text",
    alpha0: float = 500.0,
    k: int = 15,
) -> DataFrame:
    """What words distinguish slice A from slice B — the log-odds ratio
    with an informative Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    "Fightin' Words"), the standard corpus-composition comparison that
    fixes raw log-odds' small-count explosions and TF-IDF's length
    confounds. Per word w with counts y^A_w, y^B_w and prior
    α_w = α₀·(pooled share of w)::

        δ_w = ln[(y^A_w+α_w)/(n^A+α₀−y^A_w−α_w)]
            − ln[(y^B_w+α_w)/(n^B+α₀−y^B_w−α_w)]
        z_w = δ_w / sqrt(1/(y^A_w+α_w) + 1/(y^B_w+α_w))

    Top-k by |z| (ties by word) each direction is the readable output.

    Plan: ONE tokenize-explode pass builds per-word conditional counts
    for both slices and the pool simultaneously (conditional sums — the
    slices never scan separately); totals fold in as a 1-row broadcast;
    z is row-local arithmetic on the |vocab|-sized counts relation and
    the top-k cut is a TakeOrdered. No window, no join at row scale.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = F.explode(
        F.split(F.lower(F.col(text_col)), " ")
    ).alias("w")
    base = docs.filter(F.col(slice_col).isin([slice_a, slice_b])).select(
        (F.col(slice_col) == slice_a).alias("_a"), toks
    )
    counts = base.groupBy("w").agg(
        F.sum(F.col("_a").cast("long")).alias("_ya"),
        F.sum((~F.col("_a")).cast("long")).alias("_yb"),
    )
    tot = counts.agg(
        F.sum("_ya").cast("double").alias("_na"),
        F.sum("_yb").cast("double").alias("_nb"),
    )
    c = counts.crossJoin(F.broadcast(tot))
    aw = (
        F.lit(float(alpha0))
        * (F.col("_ya") + F.col("_yb"))
        / (F.col("_na") + F.col("_nb"))
    )
    da = F.log(
        (F.col("_ya") + aw)
        / (F.col("_na") + F.lit(float(alpha0)) - F.col("_ya") - aw)
    )
    db = F.log(
        (F.col("_yb") + aw)
        / (F.col("_nb") + F.lit(float(alpha0)) - F.col("_yb") - aw)
    )
    var = 1.0 / (F.col("_ya") + aw) + 1.0 / (F.col("_yb") + aw)
    scored = c.select(
        "w",
        F.col("_ya").alias("count_a"),
        F.col("_yb").alias("count_b"),
        ((da - db) / F.sqrt(var)).alias("_z"),
    )
    top_a = scored.orderBy(F.desc("_z"), "w").limit(k)
    top_b = scored.orderBy(F.asc("_z"), "w").limit(k)
    return (
        top_a.select("*", F.lit(str(slice_a)).alias("favors"))
        .unionAll(top_b.select("*", F.lit(str(slice_b)).alias("favors")))
        .select(
            "favors", "w", "count_a", "count_b", F.round("_z", 6).alias("z")
        )
    )


def ngram_dup_spectrum(
    docs: DataFrame,
    ns: tuple = (1, 2, 4, 8),
    text_col: str = "text",
) -> DataFrame:
    """Duplication spectrum: corpus-wide duplicate mass at each n-gram
    granularity — dup_rate(n) = 1 − distinct/total over ALL n-token
    grams. Reading the curve tells a curation pass WHERE the
    duplication lives: high dup at n=1 is just vocabulary reuse, high
    dup persisting to n=8 is copied passages (the signal Lee et al.'s
    ExactSubstr dedup acts on), and the n at which the curve collapses
    calibrates the dedup shingle size.

    ONE tokenize + explode pass for ALL n (round-16: the previous form
    ran one scan + tokenize + aggregate per n, so the corpus was read
    and split |ns| times and the per-n branches each generated their
    grams inside the one scan task of the single-file input — guide
    §1.2 "don't compute things twice" + §2.5 input skew): every token
    array emits its (n, gram) pairs for every requested n in a single
    flattened generate, and one grouped count + exact COUNT(DISTINCT)
    aggregate produces the whole spectrum. A literal ns-grid left join
    preserves the old per-n output row even for an n no document
    reaches (total 0, dup_rate NULL), exactly as the per-n aggregates
    did. Grams are compared as STRINGS (exact — no hash-collision
    caveat, and any engine replays it).
    """
    from swivel_spark_prep_spark.cache import fan_out

    t = F.split(F.lower(F.col(text_col)), " ")
    for n in ns:
        if n < 1:
            raise ValueError(f"every n must be >= 1, got {n}")
    empty = F.array().cast("array<struct<n:int,_g:string>>")

    def _tagged(n: int):
        # helper-scope closure (a one-param lambda: PySpark derives the
        # HOF's lambda arity from the Python signature, so the n binding
        # cannot ride a default arg)
        grams = F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda p: F.struct(
                F.lit(n).alias("n"),
                F.array_join(F.slice(t, p + 1, n), " ").alias("_g"),
            ),
        )
        # the when-guard replaces the old per-n filter: size(t) >= n
        # keeps the sequence hi bound >= 0 and ascending; the otherwise
        # branch is never evaluated for qualifying rows
        return F.when(F.size(t) >= n, grams).otherwise(empty)

    # unique n values generate grams ONCE (a duplicate entry in ns must
    # not double the counts — the old per-n aggregates never did); the
    # output grid below still carries ns as given, duplicates included
    tagged = [_tagged(int(n)) for n in dict.fromkeys(ns)]
    grouped = (
        fan_out(docs)
        .select(F.explode(F.flatten(F.array(*tagged))).alias("_s"))
        .select(F.col("_s.n").alias("n"), F.col("_s._g").alias("_g"))
        .groupBy("n")
        .agg(
            F.count("*").alias("_tot"),
            F.countDistinct("_g").alias("_dst"),
        )
    )
    grid = docs.sparkSession.createDataFrame(
        [(int(n),) for n in ns], "n int"
    )
    return grid.join(grouped, "n", "left").select(
        "n",
        F.coalesce(F.col("_tot"), F.lit(0)).alias("total_grams"),
        F.coalesce(F.col("_dst"), F.lit(0)).alias("distinct_grams"),
        F.round(1.0 - F.col("_dst") / F.col("_tot"), 6).alias("dup_rate"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    k: int = 100,
) -> DataFrame:
    """Hill (1975) estimator of the power-law tail index over the top-k
    order statistics: ξ = (1/k)·Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎), α = 1/ξ — the
    robust tail-heaviness measure that complements the regression-based
    Zipf fit (zipf_fit regresses ALL ranks and is biased by the
    distribution's body; Hill reads only the tail it claims to
    measure). α ≈ 1 is the Zipf regime for token frequencies.

    Plan: TakeOrdered(k+1) by (value desc, then a total tiebreak) is
    the only reduction — a k-bounded relation; the estimator is one
    aggregate over it (x₍ₖ₊₁₎ folds in as the relation's own min).
    Output (1 row): k, x_k1, xi, alpha.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    top = (
        df.select(F.col(value_col).cast("double").alias("_x"))
        .filter(F.col("_x") > 0)
        .orderBy(F.desc("_x"))
        .limit(k + 1)
    )
    xk1 = top.agg(F.min("_x").alias("_xk1"), F.count("*").alias("_m"))
    return (
        top.crossJoin(F.broadcast(xk1))
        .filter(F.col("_x") > F.col("_xk1"))
        .agg(
            F.lit(int(k)).alias("k"),
            F.first("_xk1").alias("x_k1"),
            F.round(
                F.sum(F.log(F.col("_x") / F.col("_xk1"))) / F.lit(float(k)),
                6,
            ).alias("xi"),
        )
        .select(
            "k",
            "x_k1",
            "xi",
            F.round(F.when(F.col("xi") > 0, 1.0 / F.col("xi")), 6).alias(
                "alpha"
            ),
        )
    )


def topk_coverage(
    docs: DataFrame,
    ks: tuple = (10, 100, 1000, 10000),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-truncation planning table: what share of all token
    OCCURRENCES the top-k most frequent types cover, at a grid of k —
    the number that justifies (or indicts) a vocab cut like the swivel
    prep's shard-size truncation (Q32/Q33's min_count is a count
    threshold; this reads the same decision in coverage terms).

    One token-count aggregate, ONE two-pass range-partitioned prefix
    sum over the vocab relation in (count desc, token) order — never a
    single-task window — then a bounded bucket-max per grid point
    (each type is bucketed to the smallest grid k that includes its
    rank; a (|ks| × |ks|) running-max join carries steps across empty
    buckets). Output per k: (k, types, coverage) — ``types`` =
    min(k, vocab size) actually available.
    """
    from swivel_spark_prep_spark.operators.ranks import (
        partitioned_prefix_sum,
    )

    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] < 1:
        raise ValueError(f"ks must be positive, got {ks}")
    from swivel_spark_prep_spark.cache import fan_out, track_persist

    # fan_out before the tokenize explode (guide §2.5: the single-file
    # corpus scans as ONE task, so tokenization — the op's map-side CPU
    # — otherwise runs on one core); persist the vocab relation because
    # it feeds THREE executions without it: the prefix sum's range
    # sampling pass, its shuffle write, and the totals aggregate
    # (guide §5 — Spark has no common-subplan reuse).
    counts = track_persist(
        fan_out(docs)
        .select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count("*").cast("double").alias("_c"))
        .withColumn("_one", F.lit(1.0))
    )
    pre = partitioned_prefix_sum(
        counts,
        [F.desc("_c"), F.asc("_w")],
        ["_c", "_one"],
        ["_cc", "_rk"],
        inclusive=True,
    )
    tot = counts.agg(F.sum("_c").alias("_t"), F.count("*").alias("_v"))
    bucket_expr = F.lit(None).cast("int")
    for k in reversed(ks):  # smallest grid k >= rank wins
        bucket_expr = F.when(F.col("_rk") <= k, F.lit(k)).otherwise(
            bucket_expr
        )
    shares = pre.select(
        bucket_expr.alias("_b"),
        F.col("_cc").alias("_cum"),
        F.col("_rk").alias("_rk"),
    ).filter(F.col("_b").isNotNull())
    bucket = shares.groupBy("_b").agg(
        F.max_by("_cum", "_rk").alias("_cum"),
        F.max("_rk").alias("_types"),
    )
    grid = docs.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    return (
        grid.join(F.broadcast(bucket), F.col("_b") <= F.col("k"), "left")
        .groupBy("k")
        .agg(
            F.coalesce(F.max_by("_types", "_b"), F.lit(0.0))
            .cast("long")
            .alias("types"),
            F.coalesce(F.max_by("_cum", "_b"), F.lit(0.0)).alias("_cum"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "types",
            F.round(F.col("_cum") / F.col("_t"), 6).alias("coverage"),
        )
    )


def vocab_churn(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary churn between two corpus snapshots: how many word
    TYPES are exclusive to each side, how much of each side's token
    MASS those exclusive types carry, and the type-set Jaccard — the
    snapshot diff that catches a crawl whose vocabulary silently
    rotated even when the size didn't (new spam vocab in, old domain
    vocab out).

    One token-count aggregate per side, one full-outer join on the
    type (vocab-sized, hash-shuffled once), one 1-row rollup. Output
    (1 row): types_a, types_b, types_both, types_only_a, types_only_b,
    mass_only_a, mass_only_b, type_jaccard.
    """

    def counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(
                F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w")
            )
            .groupBy("_w")
            .agg(F.count("*").cast("double").alias(name))
        )

    j = counts(docs_a, "_ca").join(counts(docs_b, "_cb"), "_w", "full_outer")
    return j.agg(
        F.sum((F.col("_ca").isNotNull()).cast("long")).alias("types_a"),
        F.sum((F.col("_cb").isNotNull()).cast("long")).alias("types_b"),
        F.sum(
            (F.col("_ca").isNotNull() & F.col("_cb").isNotNull()).cast("long")
        ).alias("types_both"),
        F.sum(
            (F.col("_ca").isNotNull() & F.col("_cb").isNull()).cast("long")
        ).alias("types_only_a"),
        F.sum(
            (F.col("_cb").isNotNull() & F.col("_ca").isNull()).cast("long")
        ).alias("types_only_b"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("_cb").isNull(), F.col("_ca"))), F.lit(0.0)
            )
            / F.sum(F.coalesce("_ca", F.lit(0.0))),
            6,
        ).alias("mass_only_a"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("_ca").isNull(), F.col("_cb"))), F.lit(0.0)
            )
            / F.sum(F.coalesce("_cb", F.lit(0.0))),
            6,
        ).alias("mass_only_b"),
        F.round(
            F.sum(
                (F.col("_ca").isNotNull() & F.col("_cb").isNotNull()).cast(
                    "long"
                )
            )
            / F.count("*"),
            6,
        ).alias("type_jaccard"),
    )


def topk_rank_movers(
    docs_a: DataFrame,
    docs_b: DataFrame,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Head-vocabulary movement between two snapshots: every term in
    either side's top-k frequency ranking, with both ranks and the
    movement — the monitoring table behind "what changed in the head"
    (X255's overlap matrix says HOW MUCH the heads differ; this names
    the terms and directions). ``status``: moved (both sides),
    entered (B only), exited (A only).

    Per side: one token-count aggregate + TakeOrdered(k) by (count
    desc, term) + a rank over that k-row relation (the X61/X228
    LIMIT-bounded window class); the join is top-k × top-k, ≤ 2k rows
    out. Output: (term, rank_a, rank_b, delta, status), worst movers
    first (ties by term).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    def ranked(d: DataFrame, name: str) -> DataFrame:
        counts = (
            d.select(
                F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w")
            )
            .groupBy("_w")
            .agg(F.count("*").alias("_c"))
            .orderBy(F.desc("_c"), F.asc("_w"))
            .limit(k)
        )
        w = Window.orderBy(F.desc("_c"), F.asc("_w"))
        return counts.select(
            "_w", F.row_number().over(w).cast("long").alias(name)
        )
    a = ranked(docs_a, "rank_a")
    b = ranked(docs_b, "rank_b")
    j = a.join(b, "_w", "full_outer")
    return j.select(
        F.col("_w").alias("term"),
        "rank_a",
        "rank_b",
        (F.col("rank_a") - F.col("rank_b")).alias("delta"),
        F.when(
            F.col("rank_a").isNotNull() & F.col("rank_b").isNotNull(),
            F.lit("moved"),
        )
        .when(F.col("rank_a").isNull(), F.lit("entered"))
        .otherwise(F.lit("exited"))
        .alias("status"),
    ).orderBy(
        F.desc(F.coalesce(F.abs(F.col("rank_a") - F.col("rank_b")), F.lit(int(k)))),
        F.asc("term"),
    )


def chapman_vocab_estimate(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Chapman capture–recapture estimate of TOTAL vocabulary size
    (Chapman 1951; Seber's variance) from two independent corpus
    samples — the mark-recapture complement to Chao1 (X241): Chao1
    extrapolates from within-sample singleton structure, Chapman from
    CROSS-sample overlap, so disagreement between the two flags a
    violated assumption (heterogeneous type probabilities — always
    true of Zipfian text, which is why both carry a "lower bound in
    practice" reading). With n₁/n₂ distinct types per sample and m
    shared:

        N̂ = (n₁+1)(n₂+1)/(m+1) − 1
        Var = (n₁+1)(n₂+1)(n₁−m)(n₂−m) / ((m+1)²(m+2))

    Scale design: two distinct-type aggregates + one type-keyed inner
    join on the (vocabulary-sized, not corpus-sized) distinct
    relations, then 1-row arithmetic. Output: (n_types_a, n_types_b,
    m_shared, union_observed, chapman_n, se).
    """
    def types(df):
        return (
            df.filter(F.col(text_col).isNotNull())
            .select(
                F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w")
            )
            .filter(F.col("_w") != "")
            .distinct()
        )

    ta, tb = types(docs_a), types(docs_b)
    n1 = ta.agg(F.count("*").cast("double").alias("_n1"))
    n2 = tb.agg(F.count("*").cast("double").alias("_n2"))
    m = ta.join(tb, "_w").agg(F.count("*").cast("double").alias("_m"))
    j = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    chapman = (F.col("_n1") + 1) * (F.col("_n2") + 1) / (F.col("_m") + 1) - 1
    var = (
        (F.col("_n1") + 1)
        * (F.col("_n2") + 1)
        * (F.col("_n1") - F.col("_m"))
        * (F.col("_n2") - F.col("_m"))
        / ((F.col("_m") + 1) * (F.col("_m") + 1) * (F.col("_m") + 2))
    )
    return j.select(
        F.col("_n1").cast("long").alias("n_types_a"),
        F.col("_n2").cast("long").alias("n_types_b"),
        F.col("_m").cast("long").alias("m_shared"),
        (F.col("_n1") + F.col("_n2") - F.col("_m")).cast("long").alias(
            "union_observed"
        ),
        F.round(chapman, 6).alias("chapman_n"),
        F.round(F.sqrt(var), 6).alias("se"),
    )


def script_mix_audit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Mixed-script / confusables exposure audit per slice — the
    homoglyph-spoofing gate (Unicode TR39's threat model: Latin text
    salted with Cyrillic/Greek lookalikes defeats exact dedup and
    keyword filters while reading identically): count each document's
    letters per script block (Latin, Cyrillic, Greek, CJK) via
    length-difference regexp counters, flag documents mixing ≥ 2
    scripts, and report the slice-level exposure.

    Scale design: pure codegen regexp arithmetic (the encoding_audit
    shape) — one scan, one grouped aggregate, zero shuffles beyond the
    final rollup. Output per group: (n_docs, mixed_docs, mixed_share,
    latin_docs, cyrillic_docs, greek_docs, cjk_docs).
    """
    t = F.col(text_col)

    def n_of(pattern):
        return F.length(t) - F.length(F.regexp_replace(t, pattern, ""))

    scripts = {
        "latin": "[A-Za-z]",
        "cyrillic": "[\\x{0400}-\\x{04FF}]",
        "greek": "[\\x{0370}-\\x{03FF}]",
        "cjk": "[\\x{4E00}-\\x{9FFF}]",
    }
    flags = [(n_of(p) > 0).cast("int").alias(f"_{k}") for k, p in scripts.items()]
    base = df.filter(t.isNotNull()).select(F.col(group_col), *flags)
    nmix = sum(F.col(f"_{k}") for k in scripts)
    return base.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum((nmix >= 2).cast("long")).alias("mixed_docs"),
        F.round(F.avg((nmix >= 2).cast("double")), 6).alias("mixed_share"),
        F.sum("_latin").alias("latin_docs"),
        F.sum("_cyrillic").alias("cyrillic_docs"),
        F.sum("_greek").alias("greek_docs"),
        F.sum("_cjk").alias("cjk_docs"),
    )


def novelty_timeline(
    df: DataFrame,
    ts_col: str,
    text_col: str = "text",
    bucket: str = "week",
) -> DataFrame:
    """Vocabulary-novelty timeline: per time bucket, the share of token
    MASS whose type first appeared in that bucket — the freshness curve
    between X189's global Heaps fit (one exponent, no time axis) and
    X282's two-snapshot churn (one pair, no trajectory). A healthy
    growing corpus decays smoothly; a cliff means an ingest source
    switched on, a flatline at ~0 means the pipeline is re-crawling
    what it already has.

    Scale design: tokenize once; each type's FIRST bucket is one
    min-aggregate over the (type, bucket) relation (vocabulary-sized);
    joining it back to the per-bucket type-mass relation is
    vocabulary-keyed. No windows, no pair joins. Output per bucket:
    (bucket, n_tokens, new_types, new_token_mass, novelty_share).
    """
    if bucket not in ("day", "week", "month"):
        raise ValueError(f"bucket must be day/week/month, got {bucket}")
    b = F.date_trunc(bucket, F.col(ts_col)).cast("date")
    toks = (
        df.filter(F.col(text_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(b.alias("_b"), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w"))
        .filter(F.col("_w") != "")
    )
    per = toks.groupBy("_b", "_w").agg(F.count("*").alias("_c"))
    first = per.groupBy("_w").agg(F.min("_b").alias("_fb"))
    j = per.join(first, "_w")
    out = j.groupBy("_b").agg(
        F.sum("_c").alias("n_tokens"),
        F.sum((F.col("_b") == F.col("_fb")).cast("long")).alias("new_types"),
        F.sum(F.when(F.col("_b") == F.col("_fb"), F.col("_c")).otherwise(F.lit(0))).alias(
            "new_token_mass"
        ),
    )
    return out.select(
        F.col("_b").alias("bucket"),
        "n_tokens",
        "new_types",
        "new_token_mass",
        F.round(F.col("new_token_mass") / F.col("n_tokens"), 6).alias(
            "novelty_share"
        ),
    )


def cross_source_ngram_overlap(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source n-gram overlap with the REST of the corpus — the
    self-BLEU-style diversity read (Zhu et al. 2018's texygen metric,
    reduced to its distributed core): for each source, what share of
    its DISTINCT word n-grams also appears in at least one other
    source? High overlap = the source adds little new phrasing (a
    mirror, a template farm); low = genuinely novel text worth its
    tokens in a training mix.

    Scale design: explode n-grams (whitespace tokens, positional
    slices — fan-out ≤ tokens per doc, the word-count shape), distinct
    (source, gram) — one shuffle keyed by the pair; the per-gram
    source count is a second hash aggregate on the gram (vocab-sized,
    Zipf-bounded); one broadcast-joinable rollup per source. Never a
    source×source pair relation: the "other sources" test is
    source_count ≥ 2 on the gram table, so the work is linear in
    distinct grams however many sources exist. Output: (source,
    n_grams, shared_grams, overlap_ratio), ordered by source.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = docs.filter(
        F.col(text_col).isNotNull() & F.col(source_col).isNotNull()
    ).select(
        F.col(source_col).alias("_src"),
        F.split(F.col(text_col), " ").alias("_t"),
    )
    # arrays_zip the n shifted slices, then explode — one Generate
    zipped = toks.select(
        "_src",
        F.explode(
            F.arrays_zip(
                *[
                    # greatest(…, 0): docs shorter than n−1 tokens
                    # would otherwise hand slice() a negative length
                    # (runtime error for n ≥ 3); the DuckDB twin's
                    # range(1, len(w)) is empty-safe the same way
                    F.expr(
                        f"slice(_t, {i + 1}, "
                        f"greatest(size(_t) - {n - 1}, 0))"
                    ).alias(f"_w{i}")
                    for i in range(n)
                ]
            )
        ).alias("_p"),
    ).select(
        "_src",
        F.concat_ws(
            " ", *[F.col(f"_p._w{i}") for i in range(n)]
        ).alias("_g"),
    )
    sg = zipped.distinct()
    gcount = sg.groupBy("_g").agg(F.count("*").alias("_nsrc"))
    return (
        sg.join(gcount, "_g")
        .groupBy("_src")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("_nsrc") >= 2).cast("long")).alias("shared_grams"),
        )
        .select(
            F.col("_src").alias("source"),
            "n_grams",
            "shared_grams",
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.col("shared_grams").cast("double") / F.col("n_grams"),
                ),
                6,
            ).alias("overlap_ratio"),
        )
        .orderBy("source")
    )


def head_token_profile_similarity(
    docs: DataFrame,
    k: int = 30,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise source similarity over HEAD-token usage profiles — the
    style fingerprint stopword-profiling uses in authorship analysis
    (Mosteller & Wallace 1964's function-word insight), corpus-neutral
    by construction: the profile dimensions are the corpus's own top-k
    tokens, each source becomes its usage distribution over exactly
    those k, and sources are compared by cosine. Two template farms
    land near 1.0 even when their content words differ; a genuinely
    different register stands out.

    Scale design: token counts are the word-count shape; the head
    vocabulary is one TakeOrdered(k) (broadcast); per-(source, token)
    counts are a second hash aggregate FILTERED to the k head tokens;
    the pair stage joins the (sources × k)-bounded profile relation
    with itself ON TOKEN (allowlisted — ≤ k·|sources|² terms, sources
    being the small dimension), never rows². Output:
    (source_a, source_b, cosine), one row per unordered pair SHARING
    at least one head token — a pair with fully disjoint head usage
    has cosine 0 and is simply absent (the token-keyed join never
    materializes the zero cells, which is the point at many sources).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.filter(
        F.col(text_col).isNotNull() & F.col(source_col).isNotNull()
    ).select(
        F.col(source_col).alias("_src"),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    )
    head = (
        toks.groupBy("_w")
        .agg(F.count("*").alias("_c"))
        .orderBy(F.col("_c").desc(), "_w")
        .limit(k)
        .select("_w")
    )
    prof = (
        toks.join(F.broadcast(head), "_w")
        .groupBy("_src", "_w")
        .agg(F.count("*").cast("double").alias("_n"))
    )
    from swivel_spark_prep_spark.cache import track_persist

    prof = track_persist(
        prof.withColumn(
            "_p",
            F.col("_n")
            / F.sum("_n").over(Window.partitionBy("_src")),
        )
    )
    norm = prof.groupBy("_src").agg(
        F.sqrt(F.sum(F.col("_p") * F.col("_p"))).alias("_nrm")
    )
    a = prof.select(
        F.col("_src").alias("_sa"), "_w", F.col("_p").alias("_pa")
    )
    b = prof.select(
        F.col("_src").alias("_sb"), "_w", F.col("_p").alias("_pb")
    )
    dots = (
        a.join(b, "_w")
        .filter(F.col("_sa") < F.col("_sb"))
        .groupBy("_sa", "_sb")
        .agg(F.sum(F.col("_pa") * F.col("_pb")).alias("_dot"))
    )
    na = norm.select(F.col("_src").alias("_sa"), F.col("_nrm").alias("_na"))
    nb = norm.select(F.col("_src").alias("_sb"), F.col("_nrm").alias("_nb"))
    return (
        dots.join(F.broadcast(na), "_sa")
        .join(F.broadcast(nb), "_sb")
        .select(
            F.col("_sa").alias("source_a"),
            F.col("_sb").alias("source_b"),
            F.round(
                F.when(
                    F.col("_na") * F.col("_nb") > 0,
                    F.col("_dot") / (F.col("_na") * F.col("_nb")),
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy("source_a", "source_b")
    )


def schnabel_vocab_estimate(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Multi-occasion capture–recapture vocabulary estimate (Schnabel
    1938, the Chapman-corrected form N̂ = ΣCₜMₜ/(ΣRₜ+1) per Krebs):
    treat each source as a sampling OCCASION over the shared token
    population — how big is the true vocabulary the union is drawing
    from, and how much does each new source re-capture? The k-source
    generalization of the two-sample Chapman estimate
    (chapman_vocab_estimate): more occasions, tighter estimate,
    per-occasion recapture diagnostics for free. Occasions are the
    ascending sort of the group labels.

    Scale design: tokens → per-(token) FIRST occasion (one min
    aggregate) + distinct (occasion, token) presence; per-occasion
    Cₜ/Rₜ are one grouped aggregate each, Mₜ is an exclusive prefix
    over the OCCASION relation (group-label-bounded, so the windows
    are control-plane); N̂ is a 1-row broadcast back onto the occasion
    table. Output per occasion:
    (group, c_t, m_t, r_t, n_hat) ordered by group.
    """
    toks = docs.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w"),
    ).filter(F.col("_w") != "")
    pres = toks.select("_g", "_w").distinct()
    first = pres.groupBy("_w").agg(F.min("_g").alias("_f"))
    per = (
        pres.join(first, "_w")
        .groupBy("_g")
        .agg(
            F.count("*").cast("double").alias("_c"),
            F.sum((F.col("_f") < F.col("_g")).cast("double")).alias("_r"),
            F.sum((F.col("_f") == F.col("_g")).cast("double")).alias(
                "_new"
            ),
        )
    )
    w = Window.orderBy("_g").rowsBetween(
        Window.unboundedPreceding, -1
    )
    occ = per.select(
        "_g",
        "_c",
        "_r",
        F.coalesce(F.sum("_new").over(w), F.lit(0.0)).alias("_m"),
    )
    tot = occ.agg(
        (
            F.sum(F.col("_c") * F.col("_m"))
            / (F.sum("_r") + 1.0)
        ).alias("_nhat")
    )
    return (
        occ.crossJoin(F.broadcast(tot))
        .select(
            F.col("_g").alias("group"),
            F.col("_c").cast("long").alias("c_t"),
            F.col("_m").cast("long").alias("m_t"),
            F.col("_r").cast("long").alias("r_t"),
            F.round("_nhat", 6).alias("n_hat"),
        )
        .orderBy("group")
    )


def lexical_richness_classics(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """The classical length-robust lexical-richness quartet per group —
    the authorship/stylometry constants that, unlike raw type-token
    ratio, are (approximately) invariant to corpus SIZE, so two
    sources of very different volume are comparable on one scale
    (Tweedie & Baayen 1998's survey is the standard reference):

        Yule's K    = 10⁴·(Σ_m m²·V_m − N) / N²        (Yule 1944)
        Sichel's S  = V₂ / V                            (Sichel 1975)
        Honoré's R  = 100·ln N / (1 − V₁/V)             (Honoré 1979)
        Brunet's W  = N^(V^−0.165)                      (Brunet 1978)

    with N tokens, V types, V_m types occurring exactly m times. K is
    the repeat-rate (high = template/boilerplate-heavy text — a cheap
    quality screen); S and R read the hapax/dis-legomena structure
    vocab_richness (X241) estimates saturation from.

    Scale design: the word-count shape — one token scan to per-(group,
    token) counts, one frequency-SPECTRUM re-aggregate (group, m, V_m —
    Zipf-bounded), one group-row reduction. Output per group:
    (group, n_tokens, v_types, v1, v2, yule_k, sichel_s, honore_r,
    brunet_w); R NULL when every type is a hapax (V₁ = V), the
    convention for its pole.
    """
    toks = docs.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w"),
    ).filter(F.col("_w") != "")
    counts = toks.groupBy("_g", "_w").agg(F.count("*").alias("_m"))
    spectrum = counts.groupBy("_g", "_m").agg(
        F.count("*").cast("double").alias("_vm")
    )
    m = F.col("_m").cast("double")
    agg = spectrum.groupBy("_g").agg(
        F.sum(m * F.col("_vm")).alias("_n"),
        F.sum("_vm").alias("_v"),
        F.sum(F.when(F.col("_m") == 1, F.col("_vm")).otherwise(0.0)).alias(
            "_v1"
        ),
        F.sum(F.when(F.col("_m") == 2, F.col("_vm")).otherwise(0.0)).alias(
            "_v2"
        ),
        F.sum(m * m * F.col("_vm")).alias("_smm"),
    )
    n, v = F.col("_n"), F.col("_v")
    return agg.select(
        F.col("_g").alias("group"),
        n.cast("long").alias("n_tokens"),
        v.cast("long").alias("v_types"),
        F.col("_v1").cast("long").alias("v1"),
        F.col("_v2").cast("long").alias("v2"),
        F.round(
            F.when(n > 0, 1e4 * (F.col("_smm") - n) / (n * n)), 6
        ).alias("yule_k"),
        F.round(F.when(v > 0, F.col("_v2") / v), 6).alias("sichel_s"),
        F.round(
            F.when(
                (v > 0) & (F.col("_v1") < v) & (n > 1),
                100.0 * F.log(n) / (1.0 - F.col("_v1") / v),
            ),
            6,
        ).alias("honore_r"),
        F.round(
            F.when((n > 1) & (v > 0), F.pow(n, F.pow(v, F.lit(-0.165)))),
            6,
        ).alias("brunet_w"),
    ).orderBy("group")


def mtld(
    df: DataFrame,
    group_col: str | None = "lang",
) -> DataFrame:
    """MTLD — the Measure of Textual Lexical Diversity (McCarthy &
    Jarvis 2010), per group: mean factor length at the canonical 0.72
    type-token-ratio threshold, averaged over a forward and a backward
    pass. THE length-robust sequential diversity metric — unlike raw
    TTR (collapses with length) or X384's frequency-spectrum constants
    (order-blind), MTLD sees local repetition structure: boilerplate
    with a diverse vocabulary overall still produces short factors.

    Per document and direction: walk the tokens keeping a running
    factor TTR = types/tokens; when TTR drops below 0.72 count a
    factor and reset; the trailing partial factor contributes
    (1 − TTR_end)/(1 − 0.72). MTLD_dir = n_tokens/factors (NULL when
    factors = 0, e.g. an all-unique short text); doc MTLD = the
    two-direction mean.

    Scale design: the walk is a per-document ``F.aggregate`` fold over
    the token array — executor-local, zero shuffle, accumulator
    bounded by the current factor's type set (factors reset at TTR
    0.72, so the set stays small regardless of document length); the
    group report is one aggregate. The DuckDB twin replays the
    identical fold as a recursive CTE joined to a (doc, tokens) base
    table. Output per group: (group, n_docs, mean_tokens, mean_mtld)
    — mean over docs with a defined MTLD.
    """
    from swivel_spark_prep_spark.cache import fan_out

    gcols = [group_col] if group_col else []
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    # fan_out before the per-doc interpreted fold (guide §2.5): the
    # single-file corpus scans as ONE task and the two MTLD walks are
    # interpreted HOF evaluation — the op's whole CPU on one core
    base = (
        fan_out(df)
        .filter(F.col("text").isNotNull())
        .filter(F.lit(True) if not gcols else F.col(group_col).isNotNull())
        .select(*gcols, toks.alias("_ws"))
        .filter(F.size("_ws") > 0)
    )

    empty = F.expr("CAST(array() AS ARRAY<STRING>)")

    def _fold(arr):
        def step(acc, w):
            ns = F.when(
                F.array_contains(acc["seen"], w), acc["seen"]
            ).otherwise(F.array_append(acc["seen"], w))
            tf2 = acc["tf"] + F.lit(1)
            trip = (F.size(ns).cast("double") / tf2) < 0.72
            return F.struct(
                F.when(trip, empty).otherwise(ns).alias("seen"),
                F.when(trip, F.lit(0)).otherwise(tf2).alias("tf"),
                F.when(trip, acc["fac"] + 1.0).otherwise(acc["fac"]).alias(
                    "fac"
                ),
            )

        def finish(acc):
            partial = F.coalesce(
                (
                    1.0
                    - F.size(acc["seen"]).cast("double")
                    / F.nullif(acc["tf"].cast("double"), F.lit(0.0))
                )
                / (1.0 - 0.72),
                F.lit(0.0),
            )
            return acc["fac"] + partial

        init = F.struct(
            empty.alias("seen"), F.lit(0).alias("tf"), F.lit(0.0).alias("fac")
        )
        return F.aggregate(arr, init, step, finish)

    n = F.size("_ws").cast("double")
    per = base.select(
        *gcols,
        n.alias("_n"),
        (n / F.nullif(_fold(F.col("_ws")), F.lit(0.0))).alias("_mf"),
        (n / F.nullif(_fold(F.reverse(F.col("_ws"))), F.lit(0.0))).alias(
            "_mb"
        ),
    )
    out = per.groupBy(*gcols).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("_n"), 6).alias("mean_tokens"),
        F.round(F.avg((F.col("_mf") + F.col("_mb")) / 2.0), 6).alias(
            "mean_mtld"
        ),
    )
    if gcols:
        return out.withColumnRenamed(group_col, "group").orderBy("group")
    return out
