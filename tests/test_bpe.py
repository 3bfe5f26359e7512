"""BPE tokenizer properties (operators/bpe.py).

Oracle parity for X52/X53 is covered by the parametrized sweep in
test_llm_operators.py; these pin the semantics the oracle can't see:
training determinism, the rank-order/single-pass contract, and
expression-path ≡ pandas-path on a TRAINED (not fixed) merge table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from swivel_spark_prep_spark.operators import bpe


def test_train_first_merge_is_most_frequent_pair(spark):
    # corpus pair counts: (l,o) appears in low×3, lower×2, love ×1 → 6;
    # nothing else reaches 6 → first merge must be (l,o), deterministically.
    docs = spark.createDataFrame(
        [(1, "low low low lower lower love"), (2, "newest newest")],
        "doc_id int, text string",
    )
    merges = bpe.train_bpe(docs, num_merges=3)
    assert merges[0] == ("l", "o")
    assert merges == bpe.train_bpe(docs, num_merges=3)  # deterministic


def test_encode_word_rank_order_single_pass():
    # (e,r) ranks before (r,e): "rere" → e,r merges mid-word first, and
    # the later (r,e) pass finds no <r><e> adjacency left. Pins the
    # single-pass-per-rank contract the oracle SQL replays.
    merges = [("e", "r"), ("r", "e")]
    assert bpe.encode_word("rere", merges) == ["r", "er", "e"]
    # non-overlapping left-to-right within one pass: "aaaa" → aa, aa
    assert bpe.encode_word("aaaa", [("a", "a")]) == ["aa", "aa"]
    # chained merges build longer symbols across ranks
    assert bpe.encode_word("the", [("t", "h"), ("th", "e")]) == ["the"]


def test_expr_path_equals_pandas_path_on_trained_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.train_bpe(docs, num_merges=40)
    assert len(merges) == 40
    e = bpe.bpe_encode(docs, merges).select("doc_id", "tokens", "n_tok")
    p = bpe.bpe_encode_pandas(docs, merges).select("doc_id", "tokens", "n_tok")
    assert sorted(e.collect()) == sorted(p.collect())


def test_tokens_roundtrip_to_filtered_text(spark, sf_dir):
    # concatenating a word's tokens must reproduce the word: per doc,
    # join(tokens, '') == lowercased text with non-alnum removed.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = (
        bpe.bpe_encode(docs, bpe.DEMO_MERGES)
        .select(
            F.array_join("tokens", "").alias("joined"),
            F.regexp_replace(F.lower("text"), "[^a-z0-9]", "").alias("want"),
        )
        .filter(F.col("joined") != F.col("want"))
        .count()
    )
    assert bad == 0


def test_pack_token_count_col_matches_whitespace_default(spark, sf_dir):
    from swivel_spark_prep_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = pack_sequences(docs, chunk_tokens=128).orderBy("doc_id").collect()
    with_n = docs.withColumn(
        "n", F.size(F.split("text", " ")).cast("long")
    )
    via_col = (
        pack_sequences(with_n, chunk_tokens=128, token_count_col="n")
        .orderBy("doc_id")
        .collect()
    )
    assert base == via_col


def test_oracle_count_expr_matches_spark(spark, sf_dir, duck):
    # bpe_oracle_count_expr (the composable SQL helper) agrees with the
    # JVM token-count expression on the fixture corpus.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            bpe.bpe_token_count_expr("text", bpe.DEMO_MERGES).alias("n"),
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.execute(
            "SELECT doc_id, "
            + bpe.bpe_oracle_count_expr(bpe.DEMO_MERGES)
            + " FROM documents"
        ).fetchall()
    }
    assert got == want


def test_bpe_expr_matches_python_reference_on_adversarial_corpus(spark):
    """Expression path ≡ the pure-Python reference on inputs chosen to
    break it: empty/whitespace docs, unicode casing, digit runs,
    punctuation-only, repeated chars (overlapping-merge stress), very
    long tokens."""
    import re

    docs = [
        (0, ""),
        (1, "   "),
        (2, "Straße ÉCOLE İstanbul"),
        (3, "123 123 123 aaaa aaaaa aaaaaa"),
        (4, "!@#$%^&*()"),
        (5, "the the the and and in in in"),
        (6, "a" * 500 + " " + "ab" * 250),
        (7, "mixedCASE Words-with_proto.punct2和中文"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe.DEMO_MERGES + [("a", "a"), ("aa", "aa")]
    got = {
        r.doc_id: (list(r.tokens), r.n_tok)
        for r in bpe.bpe_encode(df, merges).collect()
    }
    for doc_id, text in docs:
        toks = []
        for w in re.findall("[a-z0-9]+", text.lower()):
            toks.extend(bpe.encode_word(w, merges))
        assert got[doc_id] == (toks, len(toks)), f"doc {doc_id}"


def test_byte_complete_trained_expr_equals_pandas_and_roundtrips(spark, sf_dir):
    """Byte-complete mode end-to-end on the real fixture corpus with a
    TRAINED merge table: the codegen expression path and the Arrow
    pandas path agree token-for-token, and every document detokenizes
    back to its lowercased text exactly (nothing dropped)."""
    # the fixture corpus is pure words+spaces — inject punctuation runs
    # (same trick as X67) so byte merges have something to learn
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.replace(
            F.replace(F.col("text"), F.lit(" "), F.lit(", ")),
            F.lit("ta"),
            F.lit("t--a"),
        ).alias("text"),
    )
    merges = bpe.train_bpe(docs, num_merges=40, byte_complete=True)
    assert len(merges) == 40
    # punctuation must genuinely participate: ", " is now the dominant
    # separator, so at least one learned merge is byte-side
    assert any(a.startswith("#") for a, _ in merges)
    e = bpe.bpe_encode(docs, merges, byte_complete=True).select(
        "doc_id", "text", "tokens", "n_tok"
    )
    p = bpe.bpe_encode_pandas(docs, merges, byte_complete=True).select(
        "doc_id", "tokens", "n_tok"
    )
    erows = {r.doc_id: r for r in e.collect()}
    for pr in p.collect():
        assert list(erows[pr.doc_id].tokens) == list(pr.tokens)
    for r in erows.values():
        assert bpe.detokenize(list(r.tokens)) == r.text.lower()
