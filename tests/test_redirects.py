"""Redirect-chain resolution vs an independent pure-Python walker.

Semantics under test (operators/redirects.py): Go net/http
defaultCheckRedirect — a fetch completes iff the chain fits 10 requests
(≤ 9 followed redirects); cycles and long chains are stopped with
hops == 10 (the capped walk length); min(dst) wins a duplicate src.
"""

from __future__ import annotations

import pytest

from go_crawler_spark.datagen import redirect_edges, redirect_edges_df
from go_crawler_spark.operators.redirects import (
    STATUS_BLOCKED_HOP,
    STATUS_OK,
    STATUS_STOPPED,
    resolve_redirects,
)


def py_resolve(edges: list[tuple], budget: int = 10) -> dict[str, tuple]:
    """Independent walker: literal hop-by-hop iteration, no doubling."""
    nxt: dict[str, str] = {}
    for s, d in edges:
        nxt[s] = min(nxt[s], d) if s in nxt else d
    out = {}
    for u in sorted({s for s, _ in edges} | {d for _, d in edges}):
        cur, hops = u, 0
        while cur in nxt and hops < budget:
            cur = nxt[cur]
            hops += 1
        if hops >= budget:
            out[u] = (None, budget, STATUS_STOPPED)
        else:
            out[u] = (cur, hops, STATUS_OK)
    return out


@pytest.fixture(scope="module")
def resolved(spark):
    edges = redirect_edges_df(spark, 2)
    urls = edges.selectExpr("src_url AS url").union(
        edges.selectExpr("dst_url AS url")
    )
    rows = resolve_redirects(urls, edges).collect()
    return {r["url"]: (r["final_url"], r["hops"], r["status"]) for r in rows}


def test_matches_pure_python_walker(resolved):
    expect = py_resolve(redirect_edges(2))
    assert resolved == expect


def test_one_row_per_url(spark):
    edges = redirect_edges_df(spark, 1)
    urls = edges.selectExpr("src_url AS url").union(
        edges.selectExpr("dst_url AS url")
    )
    df = resolve_redirects(urls, edges)
    assert df.count() == df.select("url").distinct().count()


def test_go_budget_boundary(resolved):
    """Chain of d hops: head is ok iff d ≤ 9 (10 requests); node k of a
    d-chain needs d-k hops."""
    base = "https://r0.example.com"
    ok9 = resolved[f"{base}/chain9/0"]
    assert ok9 == (f"{base}/chain9/9", 9, STATUS_OK)
    # d=10: exactly one hop over the Go budget — terminal exists but is
    # unreachable within 10 requests
    assert resolved[f"{base}/chain10/0"] == (None, 10, STATUS_STOPPED)
    # one step in, the remaining 9 hops fit
    assert resolved[f"{base}/chain10/1"] == (
        f"{base}/chain10/10", 9, STATUS_OK)
    assert resolved[f"{base}/chain14/0"] == (None, 10, STATUS_STOPPED)


def test_cycles_and_rho_are_stopped(resolved):
    base = "https://r1.example.com"
    assert resolved[f"{base}/cyc1/0"] == (None, 10, STATUS_STOPPED)
    assert resolved[f"{base}/cyc5/3"] == (None, 10, STATUS_STOPPED)
    for t in (3, 9, 10):
        assert resolved[f"{base}/rho{t}/t0"][2] == STATUS_STOPPED
        assert resolved[f"{base}/rho{t}/c1"][2] == STATUS_STOPPED


def test_terminal_fanin_and_dup_src(resolved):
    base = "https://r0.example.com"
    # pure targets resolve to themselves at hop 0
    assert resolved[f"{base}/fan/z"] == (f"{base}/fan/z", 0, STATUS_OK)
    for s in ("a", "b", "c"):
        assert resolved[f"{base}/fan/{s}"] == (f"{base}/fan/z", 1, STATUS_OK)
    # duplicate src: min(dst)=/dup/a wins, so /dup/s never walks through b
    assert resolved[f"{base}/dup/s"] == (f"{base}/dup/a", 1, STATUS_OK)
    assert resolved[f"{base}/dup/b"] == (f"{base}/dup/b2", 1, STATUS_OK)


def test_smaller_budget(spark):
    """max_requests is honored for non-default budgets (jump-table set and
    greedy descent adapt)."""
    edges = redirect_edges_df(spark, 1)
    urls = spark.createDataFrame(
        [("https://r0.example.com/chain5/0",),
         ("https://r0.example.com/chain3/0",)], "url string")
    rows = {r["url"]: (r["final_url"], r["hops"], r["status"])
            for r in resolve_redirects(urls, edges, max_requests=4).collect()}
    assert rows["https://r0.example.com/chain5/0"] == (None, 4, STATUS_STOPPED)
    assert rows["https://r0.example.com/chain3/0"] == (
        "https://r0.example.com/chain3/3", 3, STATUS_OK)


def test_alias_dedup(spark):
    from go_crawler_spark.operators.redirects import dedup_by_final_url

    edges = redirect_edges_df(spark, 1)
    urls = edges.selectExpr("src_url AS url").union(
        edges.selectExpr("dst_url AS url")
    )
    groups = {r["final_url"]: r for r in
              dedup_by_final_url(urls, edges).collect()}
    base = "https://r0.example.com"
    # fan/z absorbs its three sources plus itself
    assert groups[f"{base}/fan/z"]["n_aliases"] == 4
    assert groups[f"{base}/fan/z"]["first_alias"] == f"{base}/fan/a"
    # chain9: all ten members resolve to the tail
    assert groups[f"{base}/chain9/9"]["n_aliases"] == 10
    # chain10: node 0 is budget-stopped and must NOT appear as an alias
    assert groups[f"{base}/chain10/10"]["n_aliases"] == 10
    # no stopped chain contributes a NULL/cycle group
    assert None not in groups
    assert not any("/cyc" in k for k in groups)


def test_random_functional_graphs_property(spark):
    """Property: on arbitrary functional graphs (every node ≤1 outgoing
    edge, arbitrary chains/trees/rho shapes), the pointer-doubling
    resolver equals the literal hop-by-hop walker — including non-default
    budgets that are not sums of distinct powers of two below them."""
    import random

    rng = random.Random(1234)
    for trial, budget in ((0, 10), (1, 10), (2, 7), (3, 3), (4, 16)):
        n = 120
        edges = []
        for i in range(n):
            if rng.random() < 0.8:  # 20% terminals
                edges.append((f"u{i}", f"u{rng.randrange(n)}"))
        # a few duplicate srcs to exercise the min(dst) rule
        for i in rng.sample(range(n), 5):
            edges.append((f"u{i}", f"u{rng.randrange(n)}"))
        expect = py_resolve(edges, budget)
        df_edges = spark.createDataFrame(edges, "src_url string, dst_url string")
        urls = df_edges.selectExpr("src_url AS url").union(
            df_edges.selectExpr("dst_url AS url"))
        got = {r["url"]: (r["final_url"], r["hops"], r["status"])
               for r in resolve_redirects(
                   urls, df_edges, max_requests=budget).collect()}
        assert got == expect, f"trial {trial} budget {budget}"


# ---------------------------------------------------------------------------
# per-hop robots enforcement (blocked_urls)
# ---------------------------------------------------------------------------


def py_resolve_blocked(edges: list[tuple], blocked: set[str],
                       budget: int = 10) -> dict[str, tuple]:
    """Independent walker with per-REQUEST robots on hops 2..n: abort
    BEFORE stepping into a blocked URL; budget exhaustion checked first
    (no request happens either way — Go's client errors first)."""
    nxt: dict[str, str] = {}
    for s, d in edges:
        nxt[s] = min(nxt[s], d) if s in nxt else d
    out = {}
    for u in sorted({s for s, _ in edges} | {d for _, d in edges}):
        cur, hops, cut = u, 0, False
        while cur in nxt and hops < budget:
            if nxt[cur] in blocked:
                cut = True
                break
            cur = nxt[cur]
            hops += 1
        if hops >= budget:
            out[u] = (None, budget, STATUS_STOPPED)
        elif cut:
            out[u] = (None, hops, STATUS_BLOCKED_HOP)
        else:
            out[u] = (cur, hops, STATUS_OK)
    return out


BLOCK_SUFFIXES = ("/chain8/4", "/rho3/c1", "/fan/z", "/dup/a", "/chain14/12")


def test_blocked_hops_match_walker(spark):
    """Chains cut mid-way (chain8 at hop 3), a broken cycle entry
    (rho3/c1 removes the c0->c1 edge), hop-0 cuts (fan/a,b,c and dup/s —
    its min(dst) IS /dup/a), and a cut beyond the budget's reach
    (chain14/12: walks from the head still stop on budget; walks from
    depth >=5 get blocked). The blocked URL itself as an INPUT is
    request 1 = the caller's duty: /chain8/4 resolves ok from itself."""
    edges = redirect_edges(2)
    blocked = {d for _, d in edges if d.endswith(BLOCK_SUFFIXES)} | {
        s for s, _ in edges if s.endswith(BLOCK_SUFFIXES)}
    df_edges = redirect_edges_df(spark, 2)
    urls = df_edges.selectExpr("src_url AS url").union(
        df_edges.selectExpr("dst_url AS url"))
    bdf = spark.createDataFrame([(u,) for u in sorted(blocked)], "url string")
    got = {r["url"]: (r["final_url"], r["hops"], r["status"])
           for r in resolve_redirects(urls, df_edges, blocked_urls=bdf)
           .collect()}
    expect = py_resolve_blocked(edges, blocked)
    assert got == expect
    # shape spot-checks so the fixture really exercises each case
    b = "https://r0.example.com"
    assert got[f"{b}/chain8/0"] == (None, 3, STATUS_BLOCKED_HOP)
    assert got[f"{b}/chain8/4"][2] == STATUS_OK  # input = request 1
    assert got[f"{b}/fan/a"] == (None, 0, STATUS_BLOCKED_HOP)
    assert got[f"{b}/dup/s"] == (None, 0, STATUS_BLOCKED_HOP)
    assert got[f"{b}/chain14/0"] == (None, 10, STATUS_STOPPED)  # budget wins
    assert got[f"{b}/chain14/5"] == (None, 6, STATUS_BLOCKED_HOP)
    assert got[f"{b}/rho3/t0"] == (None, 3, STATUS_BLOCKED_HOP)


def test_blocked_random_graphs_property(spark):
    """Property: arbitrary functional graphs x random blocked subsets x
    non-power-of-two budgets — doubling resolver == literal walker."""
    import random

    rng = random.Random(99)
    for trial, budget in ((0, 10), (1, 7), (2, 3)):
        n = 100
        edges = [(f"u{i}", f"u{rng.randrange(n)}")
                 for i in range(n) if rng.random() < 0.8]
        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
        blocked = set(rng.sample(nodes, len(nodes) // 6))
        expect = py_resolve_blocked(edges, blocked, budget)
        df_edges = spark.createDataFrame(
            edges, "src_url string, dst_url string")
        urls = df_edges.selectExpr("src_url AS url").union(
            df_edges.selectExpr("dst_url AS url"))
        bdf = spark.createDataFrame(
            [(u,) for u in sorted(blocked)], "url string")
        got = {r["url"]: (r["final_url"], r["hops"], r["status"])
               for r in resolve_redirects(
                   urls, df_edges, max_requests=budget,
                   blocked_urls=bdf).collect()}
        assert got == expect, f"trial {trial} budget {budget}"
