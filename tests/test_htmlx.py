"""Golden-fixture tests for the HTML extraction / text / rewrite functions.

Ports the reference's assertions (internal/pageparser_test.go:9-90 and
pkg/htmlparser/parser_test.go:10-65) against our own fixture
(tests/testdata/fixture1.html) which embeds the same assertion-relevant
URLs. Note the reference test at pageparser_test.go:50 has a bug
(`gotLinks = append(gotAssets, ...)`); we test the *intended* semantics.
"""

import os

import pytest

from go_crawler_spark.functions.htmlx import (
    extract_resources_raw,
    extract_text,
    resolve_links_and_assets,
    rewrite_html,
)

HERE = os.path.dirname(os.path.abspath(__file__))
PAGE = "https://www.sheldonbrown.com/web_sample1.html"


@pytest.fixture(scope="module")
def html() -> bytes:
    with open(os.path.join(HERE, "testdata", "fixture1.html"), "rb") as f:
        return f.read()


class TestRawLayer:
    """pkg/htmlparser/parser_test.go — raw layer keeps externals, returns
    attribute values verbatim."""

    def test_raw_extraction(self, html):
        res = extract_resources_raw(html)
        by_tag: dict[str, list[str]] = {}
        for tag, src, _pos in res:
            by_tag.setdefault(tag, []).append(src)

        for want in [
            "https://www.sheldonbrown.com/index.html",
            "web_glossary.html#browser",
            "web_sample1.html#href2",
        ]:
            assert want in by_tag["a"]
        for want in [
            "https://www.sheldonbrown.com/common-data/document.css",
            "https://www.sheldonbrown.com/common-data/screen.css",
            "https://www.sheldonbrown.com/common-data/print.css",
        ]:
            assert want in by_tag["link"]
        # externals ARE present at the raw layer (parser_test.go:56-59)
        for want in [
            "https://www.googletagmanager.com/gtag/js?id=G-YRNYST4RX7",
            "http://pagead2.googlesyndication.com/pagead/show_ads.js",
        ]:
            assert want in by_tag["script"]
        assert "https://www.sheldonbrown.com/images/scb_eagle_contact.jpeg" in by_tag["img"]

    def test_link_rel_dispatch(self, html):
        # link without stylesheet rel/type is NOT collected (parser.go:52-57)
        srcs = [s for t, s, _ in extract_resources_raw(html) if t == "link"]
        assert "https://www.sheldonbrown.com/favicon.ico" not in srcs

    def test_inline_script_not_scanned(self, html):
        srcs = [s for _, s, _ in extract_resources_raw(html)]
        assert not any("should_not_appear" in s for s in srcs)

    def test_document_order(self, html):
        res = extract_resources_raw(html)
        assert [p for _, _, p in res] == list(range(len(res)))

    def test_empty(self):
        assert extract_resources_raw(b"") == []


class TestResolvedLayer:
    """internal/pageparser_test.go — same-host only, fragment-stripped,
    absolutized, querystrings preserved."""

    def test_links(self, html):
        res = resolve_links_and_assets(PAGE, html)
        links = [u for k, u, _ in res if k == "page"]
        for want in [
            "https://www.sheldonbrown.com/index.html",
            "https://www.sheldonbrown.com/web_glossary.html",
            "https://www.sheldonbrown.com/web_sample1.html",
        ]:
            assert want in links
        for bad in [
            "https://www.external.com/1.html",
            "https://www.google.com/",
            "https://www.ya.ru/some_path",
        ]:
            assert bad not in links

    def test_assets(self, html):
        res = resolve_links_and_assets(PAGE, html)
        assets = [u for k, u, _ in res if k == "asset"]
        for want in [
            "https://www.sheldonbrown.com/common-data/document.css",
            "https://www.sheldonbrown.com/common-data/screen.css",
            "https://www.sheldonbrown.com/common-data/print.css",
            "https://www.sheldonbrown.com/common-data/added.js?someAttr=true",
            "https://www.sheldonbrown.com/common-data/added2.js",
            "https://www.sheldonbrown.com/images/scb_eagle_contact.jpeg",
        ]:
            assert want in assets
        for bad in [
            "https://www.external.com/1.css",
            "https://www.external.com/1.js",
            "https://www.external.com/1.jpg",
            "https://www.googletagmanager.com/gtag/js?id=G-YRNYST4RX7",
            "http://pagead2.googlesyndication.com/pagead/show_ads.js",
        ]:
            assert bad not in assets


class TestText:
    def test_deterministic(self, html):
        t1, t2 = extract_text(html), extract_text(html)
        assert t1 == t2
        assert "Golden fixture" in t1
        assert "Entity & text survives as plain text." in t1

    def test_scripts_excluded(self, html):
        assert "should_not_appear" not in extract_text(html)

    def test_empty(self):
        assert extract_text(b"") == ""


class TestRewrite:
    def test_rewrites_internal_only(self, html):
        out = rewrite_html(html, PAGE)
        s = out.decode("utf-8")
        # internal asset → relative local path (models.go:92-95)
        assert 'href="./common-data/screen.css"' in s
        # internal link → local ".html" target (models.go:96-99)
        assert 'href="./web_glossary.html.html"' in s
        # externals untouched
        assert 'src="https://www.external.com/1.js"' in s
        assert 'href="https://www.google.com/"' in s

    def test_bytes_outside_attrs_preserved(self, html):
        out = rewrite_html(html, PAGE)
        assert b"Entity &amp; text survives" in out
        assert b"<title>Engine golden fixture one</title>" in out

    def test_pure_function(self, html):
        assert rewrite_html(html, PAGE) == rewrite_html(html, PAGE)

    def test_empty(self):
        assert rewrite_html(b"", PAGE) == b""


def test_parse_page_equals_extract_plus_rewrite():
    """The fused single-parse path (parse_page) must be byte-identical to
    the separate extract + rewrite functions on every corpus page and the
    golden fixture."""
    import pathlib

    from go_crawler_spark.datagen import page_html, page_url
    from go_crawler_spark.functions.htmlx import (
        parse_page,
        resolve_links_and_assets,
        rewrite_html,
    )

    for i in range(80):
        u, h = page_url(i), page_html(i, 300, 11, 4, (10, 60))
        children, html_out = parse_page(u, h)
        assert children == resolve_links_and_assets(u, h), (i, u)
        assert html_out == rewrite_html(h, u), (i, u)

    for f in pathlib.Path(__file__).parent.glob("testdata/*.html"):
        h = f.read_bytes()
        u = "https://www.sheldonbrown.com/web_sample1.html"
        children, html_out = parse_page(u, h)
        assert children == resolve_links_and_assets(u, h)
        assert html_out == rewrite_html(h, u)

    assert parse_page("https://a.com/x.html", b"") == ([], b"")


class TestFastScannerDifferential:
    """_fast_collect must equal _CollectParser.found on every input where
    it does not bail (returns None). The gates may reject anything — that
    only costs speed — but an accepted input must produce the identical
    (tag, src, offset, raw) stream, since parse_page trusts the offsets
    for byte-exact in-place rewrites."""

    ADVERSARIAL = [
        # constructs the scanner must bail on (or handle identically)
        b"<!-- <a href=x.html> --><a href=real.html>",
        b"<script>var s = '<a href=fake.html>';</script><a href=r.html>",
        b"<style>a { content: '<img src=f.jpg>'; }</style>",
        b"<script src=ext.js>",  # unclosed cdata element
        b"<a href='x.html'",  # unterminated tag at EOF
        b"<a href=x.html><b",
        b"<![CDATA[ <a href=f.html> ]]><a href=r.html>",
        b"<?php echo '<a href=f.html>'; ?><a href=r.html>",
        b"<!doctype html><a href=x.html>",
        b"<!DOCTYPE html [ <!ENTITY x 'y'> ]><a href=x.html>",
        b"<a href=\"x.html\" href=\"y.html\">first wins",
        b"<a  HREF = 'z.html' >attr case",
        b"<a href=x.html/>self closing",
        b"<a href='a&amp;b.html'>entity in attr",
        b"<a href='a&amp;b.html&bogus;'>partial entity",
        b"< a href=x.html>not a tag",
        b"<a/href=x.html>slash junk",
        b"</a junk><a href=x.html>",
        b"</><a href=x.html>",
        b"<a href=>empty value",
        b"<a href>valueless attr",
        b"<A HREF=UPPER.HTML>",
        b"<img src=1.jpg><img src=1.jpg>",
        b"text only, no tags",
        b"<",
        b"",
        b"trailing <",
        b"<a href='un>closed.html'>gt in quoted value",
        b"<a title='> <img src=inside.jpg>' href=x.html>",
        b"<a\nhref='nl.html'>newline in tag",
        b"<a href=x.html",
        b"<script>no close",
        b"<script></SCRIPT ><a href=x.html>",
        b"<link rel=stylesheet href=s.css><link href=n.css>",
        b"\xff\xfe<a href=x.html>latin-1 bytes",
    ]

    @staticmethod
    def _slow(s: str):
        from go_crawler_spark.functions.htmlx import _CollectParser

        p = _CollectParser()
        p.feed_text(s)
        return p.found

    def test_adversarial_corpus(self):
        from go_crawler_spark.functions.htmlx import _fast_collect

        for raw in self.ADVERSARIAL:
            s = raw.decode("latin-1")
            fast = _fast_collect(s)
            if fast is not None:
                assert fast == self._slow(s), raw

    def test_datagen_pages_take_fast_path(self):
        """The synthetic corpus must actually exercise the fast path —
        a silent bail would quietly forfeit the speedup."""
        from go_crawler_spark.datagen import page_html
        from go_crawler_spark.functions.htmlx import _fast_collect

        for i in range(40):
            s = page_html(i, 300, 11, 4, (10, 60)).decode("latin-1")
            fast = _fast_collect(s)
            assert fast is not None, i
            assert fast == self._slow(s), i

    def test_golden_fixtures(self):
        import pathlib

        from go_crawler_spark.functions.htmlx import _fast_collect

        for f in pathlib.Path(__file__).parent.glob("testdata/*.html"):
            s = f.read_bytes().decode("latin-1")
            fast = _fast_collect(s)
            if fast is not None:
                assert fast == self._slow(s), f

    def test_hypothesis_html_soup(self):
        from hypothesis import given, settings, strategies as st

        from go_crawler_spark.functions.htmlx import _fast_collect

        token = st.sampled_from([
            "<a href=", "<a href='x.html'>", "<img src=\"1.jpg\"/>",
            "<link rel=stylesheet href=s.css>", "<script", " src=x.js>",
            "</script>", "</a>", "<script>", "var x = '", "'", "\"",
            "<!doctype html>", "<!--", "-->", "<![CDATA[", "]]>", "<?", "?>",
            "text ", "&amp;", "&", ";", "<", ">", "/", "=", " ", "\n", "\t",
            "x.html", "a", "<b", "<style>", "</style>", "é", "\x00",
        ])

        @settings(max_examples=500, deadline=None)
        @given(st.lists(token, min_size=0, max_size=12).map("".join))
        def check(s):
            fast = _fast_collect(s)
            if fast is not None:
                assert fast == self._slow(s), s

        check()


def test_extract_anchor_texts():
    """Anchor-text extraction (LLM-pipeline extension): entities unescaped,
    nested markup transparent, whitespace collapsed, empty anchors dropped,
    fragment stripped + absolutized, off-host KEPT, unclosed <a> flushed,
    doc order by open position."""
    from go_crawler_spark.functions.htmlx import extract_anchor_texts

    html = (
        b'<html><body>'
        b'<a href="p2.html#sec">go <b>there</b>&amp;back</a>'
        b'<A HREF="https://other.net/z">  Ext  Link </A>'
        b'<a href="/empty"></a>'
        b'<a href="#top">top</a>'
        b'<a name="no-href">skip</a>'
        b'<a href="/tail">unclosed tail'
        b'</body></html>'
    )
    got = extract_anchor_texts("https://h.example.com/a/p1.html", html)
    assert got == [
        ("https://h.example.com/a/p2.html", "go there&back", 0),
        ("https://other.net/z", "Ext Link", 1),
        ("https://h.example.com/a/p1.html", "top", 3),
        ("https://h.example.com/tail", "unclosed tail", 4),
    ]
    # dead inputs parse to nothing
    assert extract_anchor_texts("https://h.example.com/", b"") == []
    assert extract_anchor_texts("https://h.example.com/", b"\xff\xfe<a href='x'>t</a>") == [
        ("https://h.example.com/x", "t", 0)
    ]
