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


def test_crawl_trap_gate_end_to_end(spark, tmp_path):
    """The operational trap loop: crawl once, census the output, feed the
    flagged templates back — the recrawl blocks the trap family with
    status skipped_trap (staying seen) and fetches everything else."""
    import datetime as dt

    from pyspark.sql import functions as F

    from go_crawler_spark.config import CrawlConfig
    from go_crawler_spark.plans.crawl import run_crawl

    epoch = dt.datetime(2024, 1, 1)

    def page(url, links, text):
        html = (
            "<html><body>"
            + "".join(f'<a href="{l}">x</a>' for l in links)
            + f"<p>{text}</p></body></html>"
        ).encode("utf-8")
        return (url, epoch, html, text, "en")

    trap_urls = [f"https://ex.com/cal/{i}" for i in range(24)]
    rows = [
        page("https://ex.com/", ["/about.html"] + trap_urls, "root page"),
        page("https://ex.com/about.html", [], "about page unique"),
    ] + [page(u, [], "identical trap body") for u in trap_urls]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    cfg = CrawlConfig(max_count=100)
    first = run_crawl(spark, pages, ["https://ex.com/"], cfg)
    assert first.pages_out.count() == 26  # everything fetched, trap included

    census = url_trap_census(
        first.pages_out.select("url", F.md5("text").alias("fingerprint")),
        min_urls=20,
    )
    flagged = [r["template"] for r in census.filter("is_trap").collect()]
    assert flagged == ["ex.com/cal/<d>"]

    second = run_crawl(
        spark, pages, ["https://ex.com/"], cfg, trap_templates=census
    )
    st = {r["url"]: r["status"] for r in second.fetched.collect()}
    assert st["https://ex.com/"] == "ok"
    assert st["https://ex.com/about.html"] == "ok"
    assert all(st[u] == "skipped_trap" for u in trap_urls)
    # trapped URLs stay seen (can never be re-enqueued), like robots blocks
    seen = {r["url"] for r in second.seen.collect()}
    assert set(trap_urls) <= seen
    # and the pages sink holds only real fetches
    assert second.pages_out.count() == 2


def test_url_template_python_twin_matches_expr(spark):
    """simulator.url_template must equal url_template_expr byte-for-byte —
    the in-loop trap refresh's simulator parity rests on it."""
    from go_crawler_spark.simulator import url_template

    urls = [
        "https://ex.com/cal/2024/05/31?sess=99#frag",
        "https://EX.com:8080/CAL/7/8/9",
        "https://user:pw@ex.com/cal/1/2/3",
        "https://ex.com",
        "https://ex.com.",                      # trailing host dot
        "https://ex.com?q=1",                   # query, no path
        "https://ex.com/static/about.html",
        "http://sub.ex.co.uk/a99b/c?x#y",
        "https://ex.com/UPPER/Page007.HTML",
        "https://ex.com//double//42//",
    ]
    assert _templates(spark, urls) == [url_template(u) for u in urls]


def test_trap_emerges_mid_crawl_gated_without_restart(spark, tmp_path):
    """In-loop trap defense (trap_refresh_rounds): a template that becomes
    prolific+content-poor DURING the crawl is censused and gated at the
    next refresh — no operator round-trip, no restart — and the engine
    matches the simulator's schedule/statuses/seen/metrics bit-for-bit.

    Timeline (R=1, min_urls=20): round 0 fetches the hub; round 1 fetches
    its 20 /gen/<i>.html children (4 content variants -> 20 urls, 4
    fingerprints); the round-2 refresh flags gen/<d>.html and the 12
    just-discovered /gen/1xx.html grandchildren are blocked with
    skipped_trap while the /real/ branch keeps crawling."""
    import datetime as dt

    from go_crawler_spark.config import CrawlConfig
    from go_crawler_spark.plans.crawl import run_crawl
    from go_crawler_spark.simulator import simulate

    epoch = dt.datetime(2024, 1, 1)

    def html(links, body):
        return (
            "<html><body>"
            + "".join(f'<a href="{l}">x</a>' for l in links)
            + f"<p>{body}</p></body></html>"
        ).encode("utf-8")

    H = "https://trap.example.com"
    corpus = {
        f"{H}/hub.html": html(
            [f"/gen/{i}.html" for i in range(1, 21)] + ["/real/about.html"],
            "hub",
        ),
        f"{H}/real/about.html": html(["/real/team.html"], "about"),
        f"{H}/real/team.html": html([], "team"),
    }
    for i in range(1, 21):
        v = i % 4  # 4 exact content variants across 20 urls
        corpus[f"{H}/gen/{i}.html"] = html(
            [f"/gen/{100 + v * 10 + j}.html" for j in range(3)], f"variant {v}"
        )
    pages = spark.createDataFrame(
        [(u, epoch, b, "", "en") for u, b in corpus.items()],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )

    cfg = CrawlConfig(max_count=100)
    seeds = [f"{H}/hub.html"]
    res = run_crawl(
        spark, pages, seeds, cfg, workdir=str(tmp_path / "wd"),
        trap_refresh_rounds=1, trap_min_urls=20,
    )
    sim = simulate(corpus, seeds, cfg, trap_refresh_rounds=1, trap_min_urls=20)

    e_sched = {(r["url"], r["kind"], r["depth"], r["seq"])
               for r in res.schedule.collect()}
    s_sched = {(it.url, it.kind, it.depth, it.seq) for it in sim.schedule}
    assert e_sched == s_sched
    e_fetched = {(r["url"], r["round"], r["status"])
                 for r in res.fetched.collect()}
    s_fetched = {(it.url, it.fetch_round, it.status)
                 for it in sim.schedule if it.fetch_round >= 0}
    assert e_fetched == s_fetched
    assert {r["url"] for r in res.seen.collect()} == sim.seen

    # the trap was actually cut mid-crawl: all 12 grandchildren blocked at
    # round 2, the real branch fetched, and the census checkpointed
    st = {r["url"]: (r["round"], r["status"]) for r in res.fetched.collect()}
    gen_children = sorted(u for u in st if "/gen/1" in u and int(
        u.rsplit("/", 1)[1].split(".")[0]) >= 100)
    assert len(gen_children) == 12
    assert all(st[u] == (2, "skipped_trap") for u in gen_children)
    assert st[f"{H}/real/team.html"] == (2, "ok")
    census = spark.read.parquet(str(tmp_path / "wd" / "trap_census"))
    assert [r["template"] for r in census.collect()] == [
        "trap.example.com/gen/<d>.html"
    ]
