"""Spider-trap detection: URL-template collapse edges and the census/gate
semantics (oracle parity runs in test_queries_oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_crawler_spark.functions.urls import url_template_expr
from go_crawler_spark.operators.traps import trap_gate, url_trap_census


def _templates(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["t"] for r in df.select(url_template_expr("url").alias("t")).collect()
    ]


def test_template_collapses_digits_strips_query_fragment(spark):
    got = _templates(
        spark,
        [
            "https://ex.com/cal/2024/05/31?sess=99#frag",
            "https://ex.com/cal/1999/12/01",
            "https://EX.com:8080/CAL/7/8/9",          # port + case
            "https://user:pw@ex.com/cal/1/2/3",       # userinfo
            "https://ex.com",                          # empty path
            "https://ex.com/static/about.html",
        ],
    )
    assert got[0] == got[1] == got[2] == got[3] == "ex.com/cal/<d>/<d>/<d>"
    assert got[4] == "ex.com/"
    assert got[5] == "ex.com/static/about.html"


def test_census_flags_prolific_low_diversity_only(spark):
    rows = (
        # trap: 24 urls, 2 distinct fingerprints
        [(f"https://t.com/p/{i}", f"fp{i % 2}") for i in range(24)]
        # prolific but diverse: 24 urls, 24 fingerprints -> not a trap
        + [(f"https://ok.com/p/{i}", f"u{i}") for i in range(24)]
        # content-poor but rare: 4 urls, 1 fingerprint -> not a trap
        + [(f"https://rare.com/p/{i}", "same") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "url string, fingerprint string")
    got = {r["template"]: r for r in url_trap_census(df, min_urls=20).collect()}
    assert got["t.com/p/<d>"]["is_trap"] is True
    assert got["ok.com/p/<d>"]["is_trap"] is False
    assert got["rare.com/p/<d>"]["is_trap"] is False


def test_trap_gate_drops_only_flagged_templates(spark):
    rows = [(f"https://t.com/p/{i}", "same") for i in range(20)] + [
        ("https://ok.com/about.html", "x")
    ]
    df = spark.createDataFrame(rows, "url string, fingerprint string")
    census = url_trap_census(df, min_urls=20)
    kept = [r["url"] for r in trap_gate(df, census).collect()]
    assert kept == ["https://ok.com/about.html"]
