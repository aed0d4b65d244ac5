"""Unit tests for URL canonicalization and Go-compatible save paths.

Ports the semantics pinned by internal/pageparser.go:33-53 and
internal/models.go:208-249 (see docstrings in functions/urls.py).
"""

from go_crawler_spark.functions.urls import (
    asset_save_path,
    canonicalize,
    go_path_base,
    go_path_clean,
    go_path_dir,
    host_of,
    link_target_save_path,
    make_relative_url,
    md5_hex,
    page_save_path,
    registrable_host,
    resolve_local_save_path,
)

PAGE = "https://www.sheldonbrown.com/web_sample1.html"


class TestCanonicalize:
    def test_fragment_stripped_before_resolve(self):
        # pageparser.go:39 — web_glossary.html#browser → absolutized, no fragment
        assert (
            canonicalize(PAGE, "web_glossary.html#browser")
            == "https://www.sheldonbrown.com/web_glossary.html"
        )

    def test_self_fragment_resolves_to_page(self):
        assert canonicalize(PAGE, "web_sample1.html#href2") == PAGE
        assert canonicalize(PAGE, "#href2") == PAGE

    def test_absolute_passthrough(self):
        assert (
            canonicalize(PAGE, "https://www.external.com/1.html")
            == "https://www.external.com/1.html"
        )

    def test_querystring_survives(self):
        # pinned by pageparser_test.go:66-71 (added.js?someAttr=true)
        assert (
            canonicalize(PAGE, "https://www.sheldonbrown.com/common-data/added.js?someAttr=true")
            == "https://www.sheldonbrown.com/common-data/added.js?someAttr=true"
        )

    def test_relative_dotdot(self):
        assert (
            canonicalize("https://h.com/a/b/c.html", "../x.html")
            == "https://h.com/a/x.html"
        )

    def test_unparseable_dropped(self):
        assert canonicalize(PAGE, "http://[bad") is None

    def test_host(self):
        assert host_of(PAGE) == "www.sheldonbrown.com"
        assert host_of("https://h.com:8080/p") == "h.com:8080"
        assert registrable_host("https://UpPer.COM:8080/p") == "upper.com"


class TestGoPath:
    # parity cases with Go's path package (path.Base/Dir/Clean)
    def test_base(self):
        assert go_path_base("") == "."
        assert go_path_base("/") == "/"
        assert go_path_base("/a/b.html") == "b.html"
        assert go_path_base("/a/") == "a"
        assert go_path_base("a") == "a"

    def test_dir(self):
        assert go_path_dir("/a/b.html") == "/a"
        assert go_path_dir("b.html") == "."
        assert go_path_dir("/") == "/"
        assert go_path_dir("") == "."

    def test_clean(self):
        assert go_path_clean("/a/./b/../c") == "/a/c"
        assert go_path_clean("a//b") == "a/b"
        assert go_path_clean("") == "."


class TestSavePath:
    def test_page_with_file(self):
        # models.go:61-63: dir+base, ".html" appended
        assert page_save_path(PAGE) == "/web_sample1.html.html"

    def test_page_root(self):
        # path "" → Dir(".")+Base(".") → fallback "index" → "index.html";
        # path "/" → Dir("/")="/" → "/index.html" (Go path semantics)
        assert page_save_path("https://h.com") == "index.html"
        assert page_save_path("https://h.com/") == "/index.html"

    def test_asset(self):
        # models.go:187-189: no fallback, no ext
        assert (
            asset_save_path("https://www.sheldonbrown.com/common-data/screen.css")
            == "/common-data/screen.css"
        )

    def test_asset_empty_base_md5(self):
        # models.go:222-224: empty name → md5 of full URL
        url = "https://h.com"
        assert asset_save_path(url) == md5_hex(url)

    def test_link_target(self):
        # models.go:96: link target save path gets ".html"
        assert (
            link_target_save_path("https://www.sheldonbrown.com/web_glossary.html")
            == "/web_glossary.html.html"
        )

    def test_querystring_not_in_path(self):
        assert (
            asset_save_path("https://h.com/common-data/added.js?someAttr=true")
            == "/common-data/added.js"
        )


class TestMakeRelativeURL:
    def test_same_dir(self):
        # models.go:233-249: Rel from page dir, "./"-prefixed
        assert make_relative_url("/a/index.html", "/a/style.css") == "./style.css"

    def test_subdir(self):
        assert make_relative_url("/index.html", "/common-data/screen.css") == "./common-data/screen.css"

    def test_updir(self):
        assert make_relative_url("/a/b/index.html", "/a/x.css") == "../x.css"

    def test_mixed_abs_rel_fallback(self):
        # Go filepath.Rel errors on mixed abs/rel → fallback "./"+base
        assert make_relative_url("index.html", "/x/y.css") == "./y.css"
