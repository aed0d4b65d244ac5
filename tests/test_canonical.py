"""Canonical-link consolidation vs an independent regex implementation,
plus the JVM-only plan guarantee (page bytes never cross to Python)."""

from __future__ import annotations

import re

import pytest

from go_crawler_spark.datagen import canonical_corpus_rows, canonical_pages_df
from go_crawler_spark.operators.canonical import (
    consolidate_canonicals,
    extract_canonicals,
)

N = 97  # not a multiple of 8 or 40: ragged last group, hosts wrap


def py_canonical(url: str, html: str) -> str:
    """Independent implementation: findall over all <link> tags, attribute
    dict per tag (case-insensitive names/values, quoted or unquoted —
    HTML semantics), first rel=canonical wins."""
    for tag in re.findall(r"(?i)<link\b[^>]*>", html):
        attrs: dict[str, str] = {}
        for m in re.finditer(
            r"""(\w+)=("([^"]*)"|'([^']*)'|[^"'\s>]+)""", tag
        ):
            if m.group(3) is not None:
                val = m.group(3)
            elif m.group(4) is not None:
                val = m.group(4)
            else:
                val = m.group(2)
            attrs.setdefault(m.group(1).lower(), val)
        if attrs.get("rel", "").lower() == "canonical" and attrs.get("href"):
            href = attrs["href"].split("#", 1)[0]
            if href.startswith(("http://", "https://")):
                return href
            if href.startswith("/"):
                m2 = re.match(r"^(https?://[^/]+)", url)
                return m2.group(1) + href
            return url
    return url


@pytest.fixture(scope="module")
def mapping(spark):
    df = extract_canonicals(canonical_pages_df(spark, N))
    return {r["url"]: (r["canonical_url"], r["is_self"]) for r in df.collect()}


def test_matches_independent_regex(mapping):
    for url, html in canonical_corpus_rows(N):
        expect = py_canonical(url, html)
        assert mapping[url] == (expect, expect == url), url


def test_variant_semantics(mapping):
    from go_crawler_spark.datagen import canonical_page_url as pu
    # v0: no canonical → self
    assert mapping[pu(0)] == (pu(0), True)
    # v1: absolute → the group leader's URL
    assert mapping[pu(9)] == (pu(8), False)
    # v2: root-relative resolves on the PAGE's host, not the leader's
    assert mapping[pu(10)] == ("https://c10.example.com/doc/8.html", False)
    # v3: fragment stripped
    assert mapping[pu(11)] == ("https://c11.example.com/doc/8.html", False)
    # v4: href-before-rel attribute order
    assert mapping[pu(12)] == (pu(8), False)
    # v5: explicit self-canonical
    assert mapping[pu(13)] == (pu(13), True)
    # v6: UPPERCASE tag with unquoted rel value (HTML is case-insensitive)
    assert mapping[pu(14)] == (pu(8), False)
    # v7: fully unquoted root-relative, resolved on the page's own host
    assert mapping[pu(15)] == ("https://c15.example.com/doc/8.html", False)


def test_consolidation_groups(spark):
    rows = consolidate_canonicals(canonical_pages_df(spark, 16)).collect()
    by_canon = {r["canonical_url"]: r for r in rows}
    from go_crawler_spark.datagen import canonical_page_url as pu
    # group 0: i=0 (v0 self), i=1 (v1 absolute), i=4 (v4 flipped attrs) and
    # i=6 (v6 uppercase-unquoted) all land on pu(0); representative is the
    # smallest member URL
    g0 = by_canon[pu(0)]
    assert g0["n_pages"] == 4
    assert g0["representative"] == pu(0)
    # root-relative rows resolve onto their own host → singleton groups
    assert by_canon["https://c2.example.com/doc/0.html"]["n_pages"] == 1
    assert by_canon["https://c7.example.com/doc/0.html"]["n_pages"] == 1
    # explicit self-canonical consolidates alone
    assert by_canon[pu(5)]["n_pages"] == 1
    # every page lands in exactly one group
    assert sum(r["n_pages"] for r in rows) == 16


def test_plan_is_jvm_only(spark):
    plan = extract_canonicals(
        canonical_pages_df(spark, 6)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
