"""URL / domain operators — the provenance axis of web-corpus curation.

Every web-scale pipeline groups, filters, and rate-limits by domain
(per-domain caps, blocklists, domain-level quality priors a la
Common-Crawl curation). These operators keep the whole axis in
JVM-side expression work:

- ``extract_domain``: host and "registered domain" (last two labels —
  the public-suffix-list-free approximation; a real deployment swaps
  in a PSL lookup via a broadcast table, same plan shape) from a URL
  column by regex. The pattern lives in the Java∩RE2 subset so the
  DuckDB oracle replays it verbatim — the same portability contract
  as operators/pii.py.
- ``domain_stats``: per-registered-domain doc counts + share — the
  input to per-domain caps (compose with sampling.per_source_cap).
- ``blocklist_filter``: LEFT ANTI join against a blocklist relation on
  the registered domain. The blocklist is control-plane-sized →
  broadcast; a million-entry list still broadcasts in MBs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://[userinfo@]HOST[:port][/...] — host = first run free of
# /?#@: after the optional userinfo. No lookaround (RE2-portable):
# anchor on the scheme, strip userinfo with an optional group.
URL_HOST_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def extract_domain(
    url: Column | str,
    *,
    registered: bool = True,
) -> Column:
    """Lower-cased host of a URL; with ``registered=True``, only the
    last two dot-labels (``a.b.example.com`` → ``example.com``) — the
    grouping key of per-domain curation. Malformed / schemeless input
    → NULL (regexp_extract yields '' on no-match; mapped to NULL)."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(c, URL_HOST_PATTERN, 1))
    host = F.when(host != "", host)
    if not registered:
        return host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)


def domain_stats(
    docs: DataFrame, url_col: str = "url", out_domain_col: str = "domain"
) -> DataFrame:
    """Per-registered-domain footprint: document count and corpus
    share. One aggregate + a 1-row broadcast total — no window. NULL
    domains (unparseable URLs) aggregate under NULL, kept visible: a
    spike there is a scraper bug, not data."""
    per = docs.select(
        extract_domain(url_col).alias(out_domain_col)
    ).groupBy(out_domain_col).agg(F.count("*").alias("n_docs"))
    total = per.agg(F.sum("n_docs").alias("__t"))
    return per.crossJoin(F.broadcast(total)).select(
        out_domain_col,
        "n_docs",
        (F.col("n_docs") / F.col("__t")).alias("share"),
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    blocklist_col: str = "domain",
) -> DataFrame:
    """Drop documents whose REGISTERED domain appears in the blocklist
    (the standard spam/adult/SEO-farm exclusion pass). LEFT ANTI on the
    broadcast blocklist — rows with unparseable URLs (NULL domain)
    survive, as anti-join NULL keys never match; scrub those with a
    separate validity rule if the policy wants them gone."""
    keyed = docs.withColumn("__dom", extract_domain(url_col))
    bl = blocklist.select(F.col(blocklist_col).alias("__dom")).distinct()
    return keyed.join(F.broadcast(bl), "__dom", "left_anti").drop("__dom")
