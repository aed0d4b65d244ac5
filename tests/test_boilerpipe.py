"""Block-level main-content extraction (operators/boilerpipe.py):
Boilerpipe/jusText NumWords+LinkDensity stump over block-tag splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_crawler_spark.operators.boilerpipe import extract_main_content


def _run(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(extract_main_content(F.col("html"), **kw).alias("m")).select(
        "m.*"
    ).first()


def test_nav_linkfarm_footer_dropped(spark):
    html = (
        '<div class="nav"><a href="/a">home</a> <a href="/b">about</a>'
        ' <a href="/c">contact us now</a></div>'
        "<p>this is the real article body with plenty of words to keep</p>"
        '<div><a href="/x">word word word word word</a> short</div>'
        "<p>tail</p>"
        '<div class="footer"><a href="/p">privacy</a> <a href="/t">terms</a></div>'
    )
    r = _run(spark, html)
    assert r["main_text"] == (
        "this is the real article body with plenty of words to keep"
    )
    assert r["n_blocks"] == 5 and r["n_content"] == 1


def test_case_insensitive_tags_and_br(spark):
    html = "<P>one two three four five six</P>seven eight nine ten eleven<BR/>rest"
    r = _run(spark, html)
    # <P>/<BR/> both split despite case; the two >=5-word halves survive
    assert r["n_blocks"] == 3 and r["n_content"] == 2
    assert r["main_text"].startswith("one two three")


def test_empty_and_tag_only_html(spark):
    assert _run(spark, "")["n_blocks"] == 0
    r = _run(spark, "<div><p></p></div>")
    assert r["n_blocks"] == 0 and r["main_text"] == ""


def test_inline_tags_do_not_split(spark):
    html = "<p>alpha <b>beta</b> gamma delta epsilon zeta</p>"
    r = _run(spark, html)
    assert r["n_blocks"] == 1 and r["n_content"] == 1
    assert r["main_text"] == "alpha beta gamma delta epsilon zeta"


def test_link_density_rational_threshold(spark):
    # exactly half linked words passes lw*2 <= nw*1; one more fails
    half = "<p><a href=x>a b c</a> d e f</p>"          # lw=3 nw=6 -> keep
    over = "<p><a href=x>a b c d</a> e f g</p>"        # lw=4 nw=7 -> drop
    assert _run(spark, half, min_words=3)["n_content"] == 1
    assert _run(spark, over, min_words=3)["n_content"] == 0


def test_matches_python_model_random(spark):
    """Seeded random pseudo-HTML (block tags in mixed case, inline tags,
    anchors, bare text, brs) — the Spark expression must equal an
    independent Python implementation of the same split/strip/count
    algebra on every document."""
    import random
    import re

    rng = random.Random(4242)
    frags = [
        "<p>", "</p>", "<DIV class=x>", "</div>", "<LI>", "<br/>", "<br />",
        "<b>", "</b>", "<a href=q>", "</a>", "word ", "w ", "longer words ",
        "here are five words now ",
    ]
    rows = [
        (i, "".join(rng.choice(frags) for _ in range(rng.randint(0, 30))))
        for i in range(300)
    ]

    split_re = re.compile(
        r"(?i)</?(?:p|div|td|li|h[1-6]|article|section|blockquote)\b[^>]*>"
        r"|<br\s*/?>"
    )
    tag_re = re.compile(r"<[^>]+>")
    anchor_re = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")

    def words(s: str) -> int:
        return len([w for w in s.strip().split() if w])

    def py_mc(html: str):
        feats = []
        for b in split_re.split(html):
            visible = re.sub(r"\s+", " ", tag_re.sub(" ", b)).strip()
            nw = words(visible)
            if nw == 0:
                continue
            link = tag_re.sub(" ", " ".join(anchor_re.findall(b)))
            feats.append((visible, nw, words(link)))
        kept = [t for t in feats if t[1] >= 5 and t[2] * 2 <= t[1]]
        return (" ".join(t[0] for t in kept), len(feats), len(kept))

    df = spark.createDataFrame(rows, "i long, html string")
    got = {
        r["i"]: (r["m"]["main_text"], r["m"]["n_blocks"], r["m"]["n_content"])
        for r in df.select(
            "i", extract_main_content(F.col("html")).alias("m")
        ).collect()
    }
    for i, html in rows:
        assert got[i] == py_mc(html), (i, html, got[i], py_mc(html))
