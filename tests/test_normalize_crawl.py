"""RFC 3986 identity normalization wired into the crawl loop
(CrawlConfig.normalize_urls / --normalize-urls): seeds and extracted
children normalize BEFORE the seen-check, so equivalent spellings
collapse to one fetch."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_crawler_spark.config import CrawlConfig
from go_crawler_spark.plans.crawl import run_crawl


def _corpus(spark):
    # b is linked with a MESSY spelling (unreserved percent-encoding —
    # note a messy HOST spelling would be dropped earlier by the
    # reference-parity P5 same-host netloc equality, correctly so);
    # c is linked canonically
    rows = [
        (
            "http://host.org/a",
            '<a href="/%62">b</a>'
            '<a href="http://host.org/c">c</a>',
        ),
        ("http://host.org/b", "<p>leaf b</p>"),
        ("http://host.org/c", "<p>leaf c</p>"),
    ]
    return (
        spark.createDataFrame(rows, "url string, html string")
        .select(
            "url",
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
            F.encode("html", "UTF-8").alias("html"),
            F.lit("").alias("text"),
            F.lit("en").alias("lang"),
        )
    )


def test_messy_seed_and_child_collapse_to_canonical(spark):
    pages = _corpus(spark)
    cfg = CrawlConfig(max_count=10, normalize_urls=True)
    # seed spelled three equivalent ways: ONE seed row must survive
    res = run_crawl(
        spark,
        pages,
        [
            "HTTP://HOST.ORG:80/a",
            "http://Host.org/a",
            "http://host.org/%61",  # %61 = unreserved 'a'
        ],
        cfg,
    )
    got = {r["url"]: r for r in res.schedule.collect()}
    assert set(got) == {
        "http://host.org/a",
        "http://host.org/b",
        "http://host.org/c",
    }
    # the messy-spelled child resolved to the canonical corpus row and
    # was actually FETCHED (content joined)
    fetched = {r["url"]: r["status"] for r in res.fetched.collect()}
    assert fetched.get("http://host.org/b") == "ok"


def test_without_flag_messy_spellings_stay_distinct(spark):
    pages = _corpus(spark)
    cfg = CrawlConfig(max_count=10)
    res = run_crawl(
        spark, pages, ["HTTP://HOST.ORG:80/a", "http://host.org/a"], cfg
    )
    urls = {r["url"] for r in res.schedule.collect()}
    # reference semantics: identity is the raw string — both seeds enqueue
    assert "HTTP://HOST.ORG:80/a" in urls and "http://host.org/a" in urls


def test_normalized_crawl_matches_canonical_seed_crawl(spark):
    """normalize_urls with a messy SEED ≡ the plain crawl seeded
    canonically (same frontier, same seq order) — over a corpus whose
    links are already canonical, so the only difference is the seed
    spelling. (With messy in-page links the two runs legitimately
    differ: the plain crawl keeps `%62` as its own identity — reference
    semantics — while the normalized one collapses it.)"""
    rows = [
        ("http://host.org/a", '<a href="/b">b</a><a href="/c">c</a>'),
        ("http://host.org/b", "<p>leaf b</p>"),
        ("http://host.org/c", "<p>leaf c</p>"),
    ]
    pages = (
        spark.createDataFrame(rows, "url string, html string")
        .select(
            "url",
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
            F.encode("html", "UTF-8").alias("html"),
            F.lit("").alias("text"),
            F.lit("en").alias("lang"),
        )
    )
    messy = run_crawl(
        spark,
        pages,
        ["HTTP://Host.ORG:80/a"],
        CrawlConfig(max_count=10, normalize_urls=True),
    )
    canon = run_crawl(
        spark, pages, ["http://host.org/a"], CrawlConfig(max_count=10)
    )
    def key(res):
        return sorted(
            (r["url"], r["kind"], r["depth"], r["seq"])
            for r in res.schedule.collect()
        )
    assert key(messy) == key(canon)
