"""PII detection and redaction — the scrubbing pass every large-scale
training-data pipeline runs before anything else sees the text.

Pure JVM-side regex work: `F.regexp_count` / `F.regexp_replace` stay
inside whole-stage codegen, embarrassingly parallel per row — no
shuffle, no UDF, scan-bound at 100 TB. The pattern set is deliberately
restricted to the regex subset Java's engine and RE2 (DuckDB/Go — the
oracle dialect) interpret identically: character classes, bounded
repetition, alternation, ASCII word boundaries; no lookaround, no
backreferences — so every pattern is replayable in the DuckDB oracle
verbatim AND portable to RE2-based scrubbers.

Categories (the conventional web-scrape scrub list, cf. the C4 /
RefinedWeb / Dolma pipeline write-ups — all public):

- email     user@host.tld
- phone     NNN-NNN-NNNN / NNN.NNN.NNNN (separator-delimited, the
            only shape detectable without locale NER)
- ipv4      dotted quad (syntactic; no range validation)
- ssn       NNN-NN-NNNN
- card      13-16 digit runs; optionally post-filtered by the Luhn
            checksum (`luhn_check`) to kill random-number false hits

`pii_scan` appends one count column per category + a total;
`pii_redact` replaces matches with `<CATEGORY>` placeholder tokens,
longest/most-specific pattern first so SSN/phone hyphen shapes are
consumed before the bare digit-run card pattern can eat them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ORDER MATTERS for redaction: most specific first (ssn/phone are
# hyphen-structured and must not be swallowed by the card digit run;
# email before ipv4 is irrelevant but fixed for determinism).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "card": r"\b\d{13,16}\b",
}


def luhn_check(col: Column | str) -> Column:
    """TRUE iff the digit string passes the Luhn mod-10 checksum
    (ISO/IEC 7812 — the card-number check digit algorithm). Pure
    built-in expression work: reverse → per-digit transform (double
    every second digit, fold >9 by subtracting 9) → sum % 10 == 0.
    NULL/empty/non-digit input → FALSE.
    """
    c = F.col(col) if isinstance(col, str) else col
    digits = F.split(F.reverse(c), "")
    # split("") yields a trailing "" element on some inputs — filter to
    # pure digits, which also rejects malformed candidates outright
    digits = F.filter(digits, lambda d: d.rlike("^[0-9]$"))
    summed = F.aggregate(
        F.zip_with(
            digits,
            F.sequence(F.lit(0), F.size(digits) - 1),
            lambda d, i: F.when(
                i % 2 == 1,
                F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9).otherwise(
                    d.cast("int") * 2
                ),
            ).otherwise(d.cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(
        c.isNotNull() & c.rlike("^[0-9]{2,}$"), summed % 10 == 0
    ).otherwise(F.lit(False))


def pii_scan(
    docs: DataFrame,
    text_col: str = "text",
    categories: list[str] | None = None,
    luhn_cards: bool = False,
    prefix: str = "pii_",
) -> DataFrame:
    """Append per-category PII hit counts (``pii_email``, …) and
    ``pii_total``. With ``luhn_cards=True`` the card count keeps only
    digit runs that pass :func:`luhn_check` (regexp_extract_all +
    array filter — still pure JVM expression work)."""
    cats = list(categories or PII_PATTERNS)
    unknown = [c for c in cats if c not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII categories: {unknown}")
    out = docs
    for cat in cats:
        if cat == "card" and luhn_cards:
            cnt = F.size(
                F.filter(
                    F.regexp_extract_all(
                        F.col(text_col), F.lit(PII_PATTERNS[cat]), F.lit(0)
                    ),
                    luhn_check,
                )
            ).cast("long")
        else:
            cnt = F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[cat])).cast(
                "long"
            )
        out = out.withColumn(f"{prefix}{cat}", F.coalesce(cnt, F.lit(0)))
    total = None
    for cat in cats:
        c = F.col(f"{prefix}{cat}")
        total = c if total is None else total + c
    return out.withColumn(f"{prefix}total", total)


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    categories: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace every match with an angle-bracket placeholder
    (``<EMAIL>``, ``<SSN>``, …), applying patterns in PII_PATTERNS
    order so structured hyphen shapes are consumed before the bare
    card digit-run. In-place on ``text_col`` unless ``out_col``."""
    cats = [c for c in PII_PATTERNS if c in (categories or PII_PATTERNS)]
    col = F.col(text_col)
    for cat in cats:
        col = F.regexp_replace(col, PII_PATTERNS[cat], f"<{cat.upper()}>")
    return docs.withColumn(out_col or text_col, col)
