"""Deterministic subword (BPE) tokenizer — train + encode, Spark-first.

Contract (SURVEY.md §2.5 "training-data pipeline" gap closed in round 6;
no reference file citable — /root/reference is empty, SURVEY.md §0):

- Pre-tokenize: lowercase; words are maximal runs of ``[a-z0-9]``; all
  other characters are word boundaries. Merges never cross a boundary.
- **Byte-complete mode** (``byte_complete=True``, round 7): nothing is
  dropped. Pieces are maximal runs of ``[a-z0-9]`` OR maximal runs of
  everything else; an alnum piece starts as its characters, a non-alnum
  piece as its UTF-8 BYTES, each escaped as a ``#hh`` symbol (``#`` is
  outside the alnum symbol alphabet, so an escape token can never
  collide with a token merged from letters ``x``, ``c``, ``3``).
  Merges stay within a piece, so letter and byte symbols never mix
  inside one token, and ``detokenize(tokens) == lower(text)`` exactly —
  the GPT-style byte-level completeness property, pinned by a
  hypothesis round-trip test. Normalization boundary: lowercase is the
  ONLY lossy step, and it is the documented normalization.
- Each word starts as its character sequence.
- Encoding applies the learned merges IN RANK ORDER, one full
  left-to-right non-overlapping pass per merge (the subword-nmt merge
  step, applied once per rank). This single-pass-per-rank rule is the
  documented determinism contract: it makes the tokenizer expressible
  as a chain of literal string replaces, so the EXACT same computation
  runs as Spark JVM expressions, as DuckDB oracle SQL, and in the
  pandas fallback — no cross-engine semantic gap to paper over.

Representation trick that makes replaces safe: every symbol is wrapped
as ``<sym>`` (symbols are alnum-only, so ``<``/``>`` never collide) and
words are separated by a space. A merge (a, b) is then the literal
replace ``<a><b>`` → ``<ab>``: wrappers make symbol boundaries
unambiguous (``<an>`` never matches inside ``<man>``), and the space
stops cross-word merges. ``replace`` is left-to-right non-overlapping
in Spark, DuckDB, and Python alike — identical semantics by
construction.

Scale design:
- **Training** is one distributed word-count aggregate; only the
  distinct-word frequency table — capped at ``max_words`` rows via
  TakeOrdered — comes to the driver (same bounded-driver-table
  justification as IVF's k-means sample, similarity.py:397). The merge
  loop is the classic incremental one (pair index + delta updates):
  O(total symbols + merges · touched words), seconds for 64k words.
- **Encoding** is the 100-TB hot path and stays inside whole-stage
  codegen for bounded merge tables: two regexp_replace + N literal
  replaces + a char count — no Python, no shuffle, linear in corpus
  bytes. Catalyst splits oversized codegen methods automatically; for
  multi-thousand-merge tables use ``bpe_encode_pandas`` (one Arrow
  pass, per-batch word memo — Zipf reuse makes the memo hit rate high).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEMO_MERGES",
    "DEMO_MERGES_BYTES",
    "train_bpe",
    "bpe_merged_expr",
    "bpe_token_count_expr",
    "bpe_tokens_expr",
    "bpe_encode",
    "bpe_encode_pandas",
    "bpe_oracle_expr",
    "bpe_oracle_count_expr",
    "encode_word",
    "piece_symbols",
    "detokenize",
]

#: Fixed 10-merge demo table for the X52/X53 oracle checks — chosen so
#: later merges build on earlier ones (t+h→th→the, i+n→in→ing,
#: a+n→an→and) and both (e,r) and (r,e) appear, pinning the
#: rank-order + single-pass contract in the oracle itself.
DEMO_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("an", "d"),
    ("o", "n"),
    ("r", "e"),
    ("in", "g"),
    ("o", "u"),
]

#: Byte-complete demo table: the alnum demo merges plus common
#: punctuation-byte merges (", " ". " "--") — escape symbols merge with
#: escape symbols only (pieces are homogeneous), pinning the byte-level
#: single-pass contract in the X67 oracle.
DEMO_MERGES_BYTES: list[tuple[str, str]] = DEMO_MERGES + [
    ("#2c", "#20"),  # ", "
    ("#2e", "#20"),  # ". "
    ("#2d", "#2d"),  # "--"
]

_WORD_RE = "[a-z0-9]+"
#: Byte-complete pre-tokenizer: maximal alnum runs OR maximal non-alnum
#: runs — together they cover every character, so nothing is dropped.
_PIECE_RE = "([a-z0-9]+|[^a-z0-9]+)"


def piece_symbols(piece: str) -> list[str]:
    """Initial symbol sequence for one pre-tokenized piece: characters
    for an alnum piece, escaped ``#hh`` UTF-8 bytes for a non-alnum one
    (pieces are homogeneous by construction of ``_PIECE_RE``)."""
    c = piece[0]
    if ("a" <= c <= "z") or ("0" <= c <= "9"):
        return list(piece)
    return ["#%02x" % b for b in piece.encode("utf-8")]


def detokenize(tokens: list[str]) -> str:
    """Inverse of byte-complete encoding: concatenate tokens back to the
    normalized (lowercased) input. Escape tokens contribute raw bytes —
    decoded only after the full concatenation, because merges need not
    respect UTF-8 character boundaries (a token may hold half of a
    multibyte character)."""
    buf = bytearray()
    for t in tokens:
        if t.startswith("#"):
            buf.extend(int(h, 16) for h in t.split("#")[1:])
        else:
            buf.extend(t.encode("utf-8"))
    return buf.decode("utf-8")


# ---------------------------------------------------------------- training


def _merge_symbols(sym: list[str], a: str, b: str) -> list[str]:
    """One left-to-right non-overlapping pass of merge (a, b)."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _train_merges(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int,
    byte_complete: bool = False,
) -> list[tuple[str, str]]:
    """Classic incremental BPE training over a (word, count) table.

    Deterministic: best pair = max count, ties broken by lexicographically
    smallest pair. Incremental delta updates touch only words containing
    the merged pair (pair→word-index inverted index), so the loop is
    O(total symbols + merges · touched words), not merges · corpus.
    """
    from collections import defaultdict

    words = [
        piece_symbols(w) if byte_complete else list(w) for w, _ in word_counts
    ]
    counts = [c for _, c in word_counts]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)

    def _account(i: int, sign: int) -> None:
        sym = words[i]
        for p in zip(sym, sym[1:]):
            pair_counts[p] += sign * counts[i]
            if sign > 0:
                pair_words[p].add(i)

    for i in range(len(words)):
        _account(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = {p: c for p, c in pair_counts.items() if c >= min_pair_count}
        if not live:
            break
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for i in sorted(pair_words.pop(best, ())):
            _account(i, -1)
            words[i] = _merge_symbols(words[i], *best)
            _account(i, +1)
        # stale inverted-index entries (words re-merged away from a pair)
        # are tolerated: _account(-1) already zeroed their counts, and
        # the zip pass on the updated word re-adds only live pairs.
        pair_counts = defaultdict(int, {p: c for p, c in pair_counts.items() if c > 0})
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 65536,
    min_pair_count: int = 2,
    byte_complete: bool = False,
) -> list[tuple[str, str]]:
    """Learn a ranked merge table from a corpus.

    Spark side: one explode + groupBy word-count shuffle, then
    TakeOrdered(max_words) by (count desc, word) — the ONLY driver-side
    materialization is that bounded distinct-word table (Zipf: 64k words
    cover the overwhelming mass of any natural corpus; the tail adds
    singleton pairs that can't win a merge anyway). Determinism: the
    cap's ordering is total, and the driver loop's tie-break is total.

    ``byte_complete=True`` counts non-alnum pieces too (punctuation and
    whitespace runs become ``#hh`` byte-symbol sequences), so learned
    merges cover the whole byte stream, GPT-style.
    """
    pat = _PIECE_RE if byte_complete else _WORD_RE
    rows = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    return _train_merges(
        [(r["w"], r["c"]) for r in rows],
        num_merges,
        min_pair_count,
        byte_complete=byte_complete,
    )


# ---------------------------------------------------------------- encoding


def bpe_merged_expr(
    col: Column | str,
    merges: list[tuple[str, str]],
    byte_complete: bool = False,
) -> Column:
    """The wrapped-and-merged representation, e.g. ``<th><e> <c><a><t>``.

    Pure JVM expression chain: lowercase → boundary squash → char wrap →
    one literal replace per merge in rank order. Everything downstream
    (token count, token array) derives from this one column.

    Byte-complete mode swaps the boundary squash for a piece transform:
    alnum pieces wrap per character, non-alnum pieces wrap per UTF-8
    byte as ``<#hh>`` (hex via the built-in ``hex(encode(...))`` — still
    JVM-side, still linear in corpus bytes; ``transform`` over the piece
    array adds no shuffle).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    if byte_complete:
        pieces = F.regexp_extract_all(c, F.lit(_PIECE_RE), 1)
        mapped = F.transform(
            pieces,
            lambda p: F.when(
                p.rlike("^[a-z0-9]"), F.regexp_replace(p, "(.)", "<$1>")
            ).otherwise(
                F.regexp_replace(
                    F.lower(F.hex(F.encode(p, "UTF-8"))), "(..)", "<#$1>"
                )
            ),
        )
        s = F.array_join(mapped, " ")
    else:
        s = F.regexp_replace(c, "[^a-z0-9]+", " ")
        s = F.regexp_replace(s, "([a-z0-9])", "<$1>")
    for a, b in merges:
        s = F.replace(s, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    return s


def bpe_token_count_expr(
    col: Column | str,
    merges: list[tuple[str, str]],
    byte_complete: bool = False,
) -> Column:
    """Token count = number of ``<`` markers in the merged representation
    (cheaper than materializing the token array)."""
    s = bpe_merged_expr(col, merges, byte_complete)
    return (F.length(s) - F.length(F.replace(s, F.lit("<"), F.lit("")))).cast("long")


def bpe_tokens_expr(
    col: Column | str,
    merges: list[tuple[str, str]],
    byte_complete: bool = False,
) -> Column:
    """Token array (document order; alnum-only mode drops boundaries,
    byte-complete mode loses nothing — see :func:`detokenize`)."""
    return F.regexp_extract_all(
        bpe_merged_expr(col, merges, byte_complete), F.lit("<([a-z0-9#]+)>"), 1
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    byte_complete: bool = False,
) -> DataFrame:
    """Add token-array + token-count columns, all inside codegen."""
    return df.withColumn(
        tokens_col, bpe_tokens_expr(text_col, merges, byte_complete)
    ).withColumn(n_tok_col, F.size(tokens_col).cast("long"))


def encode_word(
    word: str, merges: list[tuple[str, str]], byte_complete: bool = False
) -> list[str]:
    """Reference Python encoder for ONE already-lowercased piece —
    the same rank-order single-pass semantics as the expression chain.
    In byte-complete mode the piece may be a non-alnum run (encoded as
    ``#hh`` byte symbols before merging)."""
    sym = piece_symbols(word) if byte_complete else list(word)
    for a, b in merges:
        sym = _merge_symbols(sym, a, b)
    return sym


def bpe_encode_pandas(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    byte_complete: bool = False,
) -> DataFrame:
    """Arrow-batched fallback for multi-thousand-merge tables, where a
    replace-per-merge expression chain stops being the fast path.

    One mapInPandas over the corpus; per-batch ``word → tokens`` memo
    exploits Zipf reuse so each distinct word is encoded once per batch.
    Identical semantics to the expression path (property-tested).
    """
    import re

    from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

    word_re = re.compile(_PIECE_RE if byte_complete else _WORD_RE)
    out_schema = StructType(
        df.schema.fields
        + [
            StructField(tokens_col, ArrayType(StringType())),
            StructField(n_tok_col, LongType()),
        ]
    )

    def _encode_batches(batches):
        memo: dict[str, list[str]] = {}

        def enc_doc(text):
            toks: list[str] = []
            for w in word_re.findall((text or "").lower()):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(
                        w, merges, byte_complete=byte_complete
                    )
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf[text_col].map(enc_doc)
            pdf = pdf.copy()
            pdf[tokens_col] = toks
            pdf[n_tok_col] = toks.map(len).astype("int64")
            yield pdf

    return df.mapInPandas(_encode_batches, schema=out_schema)


# ------------------------------------------------------------------ oracle


def bpe_oracle_expr(
    merges: list[tuple[str, str]],
    col: str = "text",
    byte_complete: bool = False,
) -> str:
    """The DuckDB SQL twin of :func:`bpe_merged_expr` — generated from
    the SAME merge table and the same piece/escape spec, so X52/X67
    parity is structural, not incidental."""
    if byte_complete:
        # COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
        # array_join([]) is '' — pin the empty-document case to ''
        s = (
            f"COALESCE(array_to_string(list_transform("
            f"regexp_extract_all(lower({col}), '{_PIECE_RE}', 1), "
            "p -> CASE WHEN regexp_matches(p, '^[a-z0-9]') "
            "THEN regexp_replace(p, '(.)', '<\\1>', 'g') "
            "ELSE regexp_replace(lower(hex(encode(p))), '(..)', '<#\\1>', 'g') "
            "END), ' '), '')"
        )
    else:
        s = (
            f"regexp_replace(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'),"
            " '([a-z0-9])', '<\\1>', 'g')"
        )
    for a, b in merges:
        s = f"replace({s}, '<{a}><{b}>', '<{a}{b}>')"
    return s


def bpe_oracle_count_expr(
    merges: list[tuple[str, str]],
    col: str = "text",
    byte_complete: bool = False,
) -> str:
    s = bpe_oracle_expr(merges, col, byte_complete)
    return f"(length({s}) - length(replace({s}, '<', '')))::BIGINT"
