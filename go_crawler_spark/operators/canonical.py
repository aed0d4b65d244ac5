"""Canonical-link consolidation [EXTENSION — crawl/webtext-data].

``<link rel="canonical">`` is the page's own declaration of its preferred
URL — the first-line dedup signal a web-text pipeline applies BEFORE any
content fingerprinting (the same document served at /doc/42.html,
/doc/42.html?utm=x and /m/42 usually declares one canonical). The
reference's parser walks every node but keeps only src/href fetch targets
(internal/pageparser.go:28-68, pkg/htmlparser/parser.go:20-118) — the
canonical signal is discarded; here it becomes a dedup key.

Scale shape: extraction and resolution are PURE JVM expressions
(``regexp_extract`` / ``concat`` inside whole-stage codegen — page bytes
never cross to Python), and the consolidation groupBy exchanges only
``(canonical_url, url)`` string pairs. One scan, one bounded shuffle.

Semantics (industry convention, and what keeps the op one-pass at scale):

- one hop only — a canonical pointing at a page that itself declares a
  different canonical is NOT chased (crawlers treat canonical chains as
  author error; chase-to-fixpoint would be `resolve_redirects` on the
  canonical graph if ever wanted);
- absolute ``http(s)://`` and root-relative ``/path`` hrefs are resolved
  (root-relative against the page's own scheme+host — still JVM-only);
  any other relative form falls back to self (full RFC 3986 resolution is
  available via functions/urls.py::canonicalize_udf at Arrow cost — the
  hot path stays JVM);
- fragments are stripped (P3 parity: functions/urls.py:88);
- a page with no (or empty) canonical is its own canonical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one tag, either attribute order; [^>]* cannot cross the tag close, so a
# <link rel="stylesheet"> decoy can never satisfy rel=canonical.
# HTML attribute names/values are case-insensitive and may be unquoted
# (<LINK REL=CANONICAL ...> is valid markup the reference's tokenizer-based
# parser accepts), hence (?i) and the optional-quoting alternatives. An
# UNQUOTED rel value needs its closing delimiter consumed so
# rel=canonical-ish cannot match — a consuming class, not a lookahead,
# because the DuckDB oracle's RE2 engine has no lookahead.
_REL = """rel=(?:["']canonical["']|canonical[\\s/>])"""
_HREF_Q = """href=["']([^"']*)["']"""
_HREF_U = """href=([^"'\\s>]+)"""
_REL_FIRST_Q = f"(?i)<link[^>]*{_REL}[^>]*{_HREF_Q}"
_HREF_FIRST_Q = f"(?i)<link[^>]*{_HREF_Q}[^>]*{_REL}"
_REL_FIRST_U = f"(?i)<link[^>]*{_REL}[^>]*{_HREF_U}"
_HREF_FIRST_U = f"(?i)<link[^>]*{_HREF_U}[^>]*{_REL}"


def canonical_href_expr(html: Column) -> Column:
    """Raw canonical href ('' when the page declares none). JVM-only."""
    return F.coalesce(
        F.nullif(F.regexp_extract(html, _REL_FIRST_Q, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _HREF_FIRST_Q, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _REL_FIRST_U, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _HREF_FIRST_U, 1), F.lit("")),
        F.lit(""),
    )


def canonical_url_expr(url: Column, html: Column) -> Column:
    """Resolved canonical URL of a page (falls back to the page's own URL —
    see module docstring for the supported href forms). JVM-only."""
    href = F.regexp_replace(canonical_href_expr(html), "#.*$", "")
    origin = F.regexp_extract(url, "^(https?://[^/]+)", 1)
    return (
        F.when(href.startswith("http://") | href.startswith("https://"), href)
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(url)
    )


def extract_canonicals(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page mapping ``(url, canonical_url, is_self)``."""
    url = F.col(url_col)
    canon = canonical_url_expr(url, F.col(html_col).cast("string"))
    return pages.select(
        url.alias("url"),
        canon.alias("canonical_url"),
        (canon == url).alias("is_self"),
    )


def consolidate_canonicals(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Group pages by declared canonical: ``(canonical_url, n_pages,
    representative)`` where the representative is the smallest member URL
    (total deterministic rule, same convention as first-writer dedup)."""
    return (
        extract_canonicals(pages, url_col, html_col)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("url").alias("representative"),
        )
    )
