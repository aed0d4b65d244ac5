"""Block-level main-content extraction [EXTENSION — webtext pipeline].

The reference's text layer extracts ALL visible text from a page
(internal/pageparser.go via pkg/htmlparser — byte-preserving, the parity
path lives in functions/htmlx.py). Training-data pipelines need the
opposite bias: boilerplate (navigation, footers, link farms) REMOVED
before dedup/quality scoring, or nav chrome dominates n-gram statistics
on every template site. The published shallow classifiers that won the
CleanEval line — Boilerpipe's NumWords/LinkDensity decision stump
(Kohlschütter, Fankhauser & Nejdl, WSDM 2010) and jusText's
link-density + length block rules (Pomikálek 2011) — need exactly two
features per DOM-ish block: word count and link density. Both are
computable with string machinery, no DOM.

This module is that classifier as ONE pure JVM column expression:

1. split HTML into blocks at block-level tag boundaries
   (p/div/td/li/h1-6/article/section/blockquote/br — the tag set both
   papers treat as block separators);
2. per block: visible words (tags stripped, whitespace collapsed) and
   anchor words (inside <a>…</a>);
3. keep blocks with ``n_words >= min_words`` and
   ``link_words/n_words <= max_link_density`` (the WSDM'10 stump, with
   jusText's short-block rejection);
4. main text = kept blocks joined in document order.

Scale shape: map-only — the page never leaves its partition, nothing
shuffles, no Python anywhere (split/transform/filter/aggregate are JVM
higher-order functions; the regexes are RE2-compatible so the DuckDB
oracle replays them verbatim). At 100 TB this is the cheapest possible
operator class, which is why production pipelines run main-content
extraction on every fetched page.

Determinism notes:
- block COUNTS are taken after dropping zero-word blocks, so Spark's and
  DuckDB's differing empty-string-at-split-boundary conventions cannot
  skew them;
- link density compares as ``link_words * max_ld_denom <= n_words *
  max_ld_num`` — exact integer arithmetic, no float threshold drift.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# block-boundary tag set from the Boilerpipe/jusText papers
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|td|li|h[1-6]|article|section|blockquote)\b[^>]*>"
    r"|<br\s*/?>"
)
ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
TAG_RE = r"<[^>]+>"

__all__ = ["extract_main_content", "BLOCK_SPLIT_RE", "ANCHOR_RE"]


def _word_count(col: Column) -> Column:
    toks = F.split(F.trim(col), r"\s+")
    return F.size(F.filter(toks, lambda w: w != F.lit("")))


def extract_main_content(
    html_col: Column,
    min_words: int = 5,
    max_link_density: tuple[int, int] = (1, 2),
) -> Column:
    """struct<main_text, n_blocks, n_content> for one HTML string column.

    ``max_link_density`` is a rational (num, den) — a block survives iff
    ``link_words * den <= n_words * num`` (default 1/2), all-integer.
    ``n_blocks`` counts non-empty visible blocks; ``n_content`` the kept
    subset; ``main_text`` is their visible text joined by single spaces.
    """
    num, den = max_link_density
    blocks = F.split(html_col, BLOCK_SPLIT_RE)

    def _features(b: Column) -> Column:
        visible = F.trim(
            F.regexp_replace(
                F.regexp_replace(b, TAG_RE, " "), r"\s+", " "
            )
        )
        link_text = F.array_join(
            F.regexp_extract_all(b, F.lit(ANCHOR_RE), F.lit(1)), " "
        )
        link_visible = F.regexp_replace(link_text, TAG_RE, " ")
        return F.struct(
            visible.alias("t"),
            _word_count(visible).alias("nw"),
            _word_count(link_visible).alias("lw"),
        )

    feats = F.filter(
        F.transform(blocks, _features), lambda s: s["nw"] > 0
    )
    kept = F.filter(
        feats,
        lambda s: (s["nw"] >= F.lit(min_words))
        & (s["lw"] * F.lit(den) <= s["nw"] * F.lit(num)),
    )
    return F.struct(
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(
            "main_text"
        ),
        F.size(feats).alias("n_blocks"),
        F.size(kept).alias("n_content"),
    )
