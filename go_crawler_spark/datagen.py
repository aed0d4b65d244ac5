"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the exact ``input_hint`` table shape
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
whose html embeds a *known* link graph (FIXTURES.md §1): internal links in
relative/absolute/fragment/querystring forms, internal css/js/img assets
(some shared per host for dedup), external noise that must be filtered,
dead links (skipped-download path), and mixed-case tags like the
reference's golden fixture. One heavy host exercises skew salting.

Everything is a pure function of ``(seed, page index, n_pages)`` — no
wall-clock, no randomness outside ``random.Random(seed ^ i)`` — so the
pure-Python simulator can reconstruct the identical universe without Spark,
and generation distributes over executors via ``mapInPandas`` on
``spark.range`` (scales to any corpus size; nothing is built on the driver).

``text`` is computed at generation time with the engine's own
``extract_text`` so the "byte-identical extracted text per url" invariant
(input_hint) is checkable end-to-end.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from go_crawler_spark.functions.htmlx import extract_text

# host cycle with deliberate skew: big.example.com owns 50% of all pages
HOSTS: tuple[str, ...] = (
    "big.example.com",
    "big.example.com",
    "big.example.com",
    "big.example.com",
    "alpha.example.org",
    "beta.example.org",
    "gamma.example.net",
    "delta.example.net",
)
L = len(HOSTS)
LANGS = ("en", "de", "fr", "es", "zh")
EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def host_of_index(i: int) -> str:
    return HOSTS[i % L]


def page_url(i: int) -> str:
    return f"https://{host_of_index(i)}/p{i}.html"


def asset_urls_of_index(i: int) -> List[str]:
    """Asset URLs referenced by page i (same-host only; resolved form)."""
    h = host_of_index(i)
    out = [
        f"https://{h}/common/site.css",          # shared per host → heavy dedup
        f"https://{h}/common/app.js?v=1",        # querystring survives (pageparser_test.go:66-71)
        f"https://{h}/img/p{i}.jpg",             # unique per page
    ]
    return out


def link_targets_of_index(
    i: int, n_pages: int, seed: int, branching: int = 3
) -> List[int]:
    """Deterministic same-host out-links (same host ⇔ same index class
    mod L). Tree-shaped within each host class — class-index k links to
    class children B·k+1..B·k+B — giving the wide, shallow frontier growth
    of a real site (BFS depth ≈ log_B of the host's page count), plus a
    back-link to the parent (dedup exercise) and one strided neighbor.
    ``branching`` controls B; higher B ⇒ wider rounds / shallower crawl
    (the bench uses a high B so per-round work dominates round count)."""
    k = i // L  # index within the host's page class
    cls = i % L
    out = []
    for c in range(branching * k + 1, branching * k + branching + 1):  # tree children
        t = cls + c * L
        if t < n_pages:
            out.append(t)
    if k > 0:
        out.append(cls + ((k - 1) // branching) * L)  # parent back-link
    rng = random.Random((seed << 20) ^ i)
    sib = cls + (k + 1 + rng.randrange(3)) * L  # a near sibling
    if sib < n_pages:
        out.append(sib)
    return out


def page_html(
    i: int,
    n_pages: int,
    seed: int,
    branching: int = 3,
    words: tuple[int, int] = (20, 50),
) -> bytes:
    h = host_of_index(i)
    rng = random.Random((seed << 21) ^ i)
    targets = link_targets_of_index(i, n_pages, seed, branching)

    links = []
    for m, t in enumerate(targets):
        if m % 2 == 0:
            # relative form with fragment — must absolutize + strip
            links.append(f'<a href="p{t}.html#sec{m}">rel link {t}</a>')
        else:
            links.append(f'<A HREF="https://{h}/p{t}.html">abs link {t}</A>')
    # self-link with bare fragment (resolves to the page itself)
    links.append('<a href="#top">top</a>')
    if i % 3 == 0:
        links.append(f'<a href="/dead{i}.html">dead link</a>')  # not in corpus
    links.append(f'<a href="https://ads.external.net/track?x={i}">external</a>')

    css, js, img = asset_urls_of_index(i)
    assets = [
        f'<link rel="stylesheet" type="text/css" href="/common/site.css"/>',
        f'<script src="{js}"></script>',
        f'<IMG SRC="/img/p{i}.jpg">',
        '<script src="https://cdn.external.net/lib.js"></script>',
        '<link rel="icon" href="/favicon.ico"/>',  # non-stylesheet link: ignored
    ]

    lo, hi = words
    body_words = " ".join(
        f"word{rng.randrange(1000)}" for _ in range(lo + rng.randrange(max(hi - lo, 1)))
    )
    body = f"""<!DOCTYPE html>
<html>
<head>
  <title>Page {i} on {h}</title>
  {assets[0]}
  {assets[1]}
  {assets[3]}
  {assets[4]}
</head>
<BODY>
  <h1>Synthetic page {i}</h1>
  {assets[2]}
  <p>{body_words}</p>
  <ul>
    {"".join(f"<li>{a}</li>" for a in links)}
  </ul>
  <script>var inline_{i} = "never scanned";</script>
</BODY>
</html>"""
    return body.encode("utf-8")


def asset_content(url: str) -> bytes:
    """Deterministic fake asset bytes (css/js/img are opaque payloads)."""
    return (f"/* asset body of {url} */" + "x" * (len(url) % 64)).encode("utf-8")


def corpus_row(
    i: int,
    n_pages: int,
    seed: int,
    branching: int = 3,
    words: tuple[int, int] = (20, 50),
) -> Tuple[str, dt.datetime, bytes, str, str]:
    html = page_html(i, n_pages, seed, branching, words)
    return (
        page_url(i),
        EPOCH + dt.timedelta(seconds=i),
        html,
        extract_text(html),
        LANGS[i % len(LANGS)],
    )


def all_asset_urls(n_pages: int) -> List[str]:
    urls: set[str] = set()
    for i in range(n_pages):
        urls.update(asset_urls_of_index(i))
    return sorted(urls)


def generate_pages_df(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    branching: int = 3,
    words: tuple[int, int] = (20, 50),
) -> DataFrame:
    """Distributed corpus: page rows + asset rows (assets are fetchable
    members of the corpus with empty text). No driver-side materialization
    — page AND per-page asset rows derive from the page index inside
    ``mapInPandas``; only the ~|hosts| shared assets are driver rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.append(corpus_row(int(i), n_pages, seed, branching, words))
                img = asset_urls_of_index(int(i))[2]  # unique per-page asset
                rows.append((img, EPOCH, asset_content(img), "", ""))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    pages = spark.range(n_pages).mapInPandas(gen, PAGES_SCHEMA)

    shared: set[str] = set()
    for h in set(HOSTS):
        shared.add(f"https://{h}/common/site.css")
        shared.add(f"https://{h}/common/app.js?v=1")
    asset_rows = [(u, EPOCH, asset_content(u), "", "") for u in sorted(shared)]
    assets = spark.createDataFrame(asset_rows, PAGES_SCHEMA)
    return pages.unionByName(assets)


def generate_corpus_dict(
    n_pages: int,
    seed: int = 42,
    branching: int = 3,
    words: tuple[int, int] = (20, 50),
) -> dict[str, bytes]:
    """The same universe as a url→html dict for the pure-Python simulator."""
    d = {page_url(i): page_html(i, n_pages, seed, branching, words) for i in range(n_pages)}
    for u in all_asset_urls(n_pages):
        d[u] = asset_content(u)
    return d


def default_seeds(n_seeds: int = 4) -> List[str]:
    """One seed per distinct host (first page of each), plus a dead seed —
    FIXTURES.md §2 requires a dead seed to exercise row-preserving skip."""
    seeds = []
    seen_hosts: set[str] = set()
    i = 0
    while len(seen_hosts) < min(n_seeds, len(set(HOSTS))):
        h = host_of_index(i)
        if h not in seen_hosts:
            seen_hosts.add(h)
            seeds.append(page_url(i))
        i += 1
    seeds.append("https://big.example.com/deadseed.html")
    return seeds


# ---------------------------------------------------------------------------
# trap corpus [EXTENSION] — a deterministic universe containing a spider
# trap that EMERGES mid-crawl: a hub links to n_gen calendar-style pages
# /gen/<i>.html sharing only 4 content variants (prolific + content-poor,
# the url_trap_census signature), each minting further /gen/ grandchildren,
# while a /real/ chain keeps producing genuine content. Drives the in-loop
# trap defense (plans/crawl.py run_crawl(trap_refresh_rounds=...)) in the
# contract query crawl_trap_refresh; the fixture oracle is the pure-Python
# simulator over the same dict (tools/gen_fixtures.py).
# ---------------------------------------------------------------------------

TRAP_HOST = "trap.example.com"


def trap_corpus_n_gen(scale: int) -> int:
    """Trap fan-out per scale — always ≥ 20 (the census default threshold)
    and < 100 (grandchild ids start at 100, must never collide)."""
    return min(20 + scale // 24, 96)


def trap_corpus_dict(scale: int) -> dict:
    """url → html bytes; the simulator consumes this directly."""
    h = f"https://{TRAP_HOST}"

    def html(links, body):
        return (
            "<html><body>"
            + "".join(f'<a href="{u}">x</a>' for u in links)
            + f"<p>{body}</p></body></html>"
        ).encode("utf-8")

    n_gen = trap_corpus_n_gen(scale)
    corpus = {
        f"{h}/hub.html": html(
            [f"/gen/{i}.html" for i in range(1, n_gen + 1)] + ["/real/0.html"],
            f"hub scale {scale}",
        ),
    }
    for j in range(4):  # the genuine branch: a 4-page chain
        nxt = [f"/real/{j + 1}.html"] if j < 3 else []
        corpus[f"{h}/real/{j}.html"] = html(nxt, f"real page {j} scale {scale}")
    for i in range(1, n_gen + 1):
        v = i % 4  # 4 exact content variants across n_gen urls
        corpus[f"{h}/gen/{i}.html"] = html(
            [f"/gen/{100 + v * 10 + k}.html" for k in range(3)], f"variant {v}"
        )
    return corpus


def trap_seeds() -> List[str]:
    return [f"https://{TRAP_HOST}/hub.html"]


def trap_pages_df(spark: SparkSession, scale: int) -> DataFrame:
    rows = [
        (u, EPOCH + dt.timedelta(seconds=i), b, "", "en")
        for i, (u, b) in enumerate(sorted(trap_corpus_dict(scale).items()))
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# redirect graph (operators/redirects.py — Go defaultCheckRedirect semantics)
# ---------------------------------------------------------------------------


def redirect_edges(n_blocks: int = 40) -> List[tuple]:
    """Deterministic redirect edge list ``(src_url, dst_url)`` exercising
    every chain shape the Go client can meet (pkg/httpclient/client.go:24-27
    → net/http defaultCheckRedirect): straight chains that fit / just fit /
    just exceed the 10-request budget, pure cycles (incl. a self-loop),
    rho shapes (tails into cycles), fan-in, and a duplicate-src conflict
    for the min(dst) determinism rule. Each block is an isolated copy on
    its own host, so the graph parallelizes embarrassingly."""
    edges: List[tuple] = []
    for b in range(n_blocks):
        base = f"https://r{b}.example.com"
        # chains of d hops: d ≤ 9 ok end-to-end; d ≥ 10 stopped from node 0
        for d in (1, 2, 3, 5, 8, 9, 10, 11, 14):
            for i in range(d):
                edges.append(
                    (f"{base}/chain{d}/{i}", f"{base}/chain{d}/{i + 1}")
                )
        # pure cycles (cyc1 = self-loop): every member is budget-stopped
        for c in (1, 2, 3, 5):
            for i in range(c):
                edges.append(
                    (f"{base}/cyc{c}/{i}", f"{base}/cyc{c}/{(i + 1) % c}")
                )
        # rho: a tail of t hops into a 3-cycle — stopped at every tail depth
        for t in (3, 9, 10):
            for i in range(t - 1):
                edges.append((f"{base}/rho{t}/t{i}", f"{base}/rho{t}/t{i + 1}"))
            edges.append((f"{base}/rho{t}/t{t - 1}", f"{base}/rho{t}/c0"))
            edges.append((f"{base}/rho{t}/c0", f"{base}/rho{t}/c1"))
            edges.append((f"{base}/rho{t}/c1", f"{base}/rho{t}/c2"))
            edges.append((f"{base}/rho{t}/c2", f"{base}/rho{t}/c0"))
        # fan-in: three sources collapse onto one terminal
        for s in ("a", "b", "c"):
            edges.append((f"{base}/fan/{s}", f"{base}/fan/z"))
        # duplicate src: min(dst) keeps /dup/a (terminal), drops /dup/b
        edges.append((f"{base}/dup/s", f"{base}/dup/b"))
        edges.append((f"{base}/dup/s", f"{base}/dup/a"))
        edges.append((f"{base}/dup/b", f"{base}/dup/b2"))
    return edges


def redirect_edges_df(spark: SparkSession, n_blocks: int = 40) -> DataFrame:
    return spark.createDataFrame(
        redirect_edges(n_blocks), "src_url string, dst_url string"
    )


# ---------------------------------------------------------------------------
# canonical-link corpus (operators/canonical.py)
# ---------------------------------------------------------------------------


def canonical_page_url(i: int) -> str:
    return f"https://c{i % 40}.example.com/doc/{i}.html"


def canonical_corpus_rows(n: int) -> List[tuple]:
    """Deterministic (url, html) corpus for canonical-link consolidation.
    Eight page variants (i % 8): no-canonical, absolute rel-first,
    root-relative single-quoted, root-relative with fragment,
    href-before-rel absolute, self-canonical, UPPERCASE-unquoted-rel
    absolute (<LINK REL=CANONICAL ...> — attribute names/values are
    case-insensitive and may be unquoted in real HTML), and fully
    unquoted root-relative; a stylesheet <link> decoy — including an
    unquoted-rel decoy — rides every page so extraction must key on
    rel=canonical, not <link>."""
    rows: List[tuple] = []
    for i in range(n):
        url = canonical_page_url(i)
        g = i - (i % 8)  # group leader this page consolidates onto
        decoy = ('<link rel="stylesheet" href="/css/main.css">'
                 '<link rel=preload href=/js/app.js>')
        v = i % 8
        if v == 0:
            head = decoy
        elif v == 1:
            head = f'{decoy}<link rel="canonical" href="{canonical_page_url(g)}">'
        elif v == 2:
            head = f"{decoy}<link rel='canonical' href='/doc/{g}.html'>"
        elif v == 3:
            head = f'{decoy}<link rel="canonical" href="/doc/{g}.html#sect-2">'
        elif v == 4:
            head = f'{decoy}<link href="{canonical_page_url(g)}" rel="canonical">'
        elif v == 5:
            head = f'{decoy}<link rel="canonical" href="{url}">'
        elif v == 6:
            head = f'{decoy}<LINK REL=CANONICAL HREF="{canonical_page_url(g)}">'
        else:
            head = f"{decoy}<link rel=canonical href=/doc/{g}.html>"
        rows.append(
            (url, f"<html><head>{head}</head><body>doc {i}</body></html>")
        )
    return rows


def canonical_pages_df(spark: SparkSession, n: int) -> DataFrame:
    return spark.createDataFrame(canonical_corpus_rows(n), "url string, html string")
