"""Redirect-chain resolution [EXTENSION — crawl-data].

The reference crawler never sees a redirect as data: its Go HTTP client
(`pkg/httpclient/client.go:24-27`) is a stock ``&http.Client{...}`` whose
default ``CheckRedirect`` policy (Go stdlib ``net/http/client.go``,
``defaultCheckRedirect``) silently follows Location hops until the chain
would exceed **10 requests** (``len(via) >= 10`` → "stopped after 10
redirects"), i.e. at most 9 followed redirects succeed and a chain that
needs a 10th redirect fails the fetch. In the table model a crawl log
records each hop as a row ``(src_url, dst_url)``, and resolving every
URL's final fetch target is a *graph* problem, not a client loop.

Scale shape (10^10 URLs, ~10^8 redirect rows):

- The full URL set crosses ONE hash semi/anti-join against the redirect
  ``src`` set: URLs that are not redirect sources are final at hop 0 and
  never enter the iterative pipeline (at web scale that is ~99% of rows
  exiting after a single bounded join).
- The walkers advance by **binary pointer doubling**: jump tables
  J1=edges, J2=J1∘J1, J4, J8 (three (src,dst)-only self-joins, each no
  larger than the redirect table), then a greedy descent 8→4→2→1 under
  the 10-request budget — 3 + 4 bounded joins total instead of 10
  sequential frontier joins, and O(log) instead of O(chain) rounds.
  Cycles need no special casing: every jump exists on a cycle, so the
  descent exhausts the budget and lands on ``hops == max`` = stopped,
  exactly like Go's client burning its request budget in a loop.
- Nothing here touches page bytes; every exchange carries URL strings
  and an int.

Determinism: a crawl log can record conflicting Locations for one src
(re-fetches). The resolver keeps ``min(dst)`` per src — a total,
engine-independent rule (swap in ``min_by(dst, warc_ts)`` when a
timestamp column is available).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Go net/http defaultCheckRedirect: error once len(via) >= 10 — a chain
# is fetchable iff it completes within 10 requests (≤ 9 followed hops).
GO_MAX_REQUESTS = 10

STATUS_OK = "ok"
STATUS_STOPPED = "stopped_after_10_redirects"  # Go's own error text
# a hop TARGET (request 2..n of the chain) is robots-disallowed: the
# crawler aborts before issuing that request, so the chain yields no page
STATUS_BLOCKED_HOP = "blocked_robots_hop"


def normalize_redirect_edges(edges: DataFrame, src: str = "src_url",
                             dst: str = "dst_url") -> DataFrame:
    """One outgoing edge per src: lexicographically-smallest Location wins
    (total deterministic rule; see module docstring)."""
    return (
        edges.groupBy(F.col(src).alias("_src"))
        .agg(F.min(F.col(dst)).alias("_dst"))
    )


def blocked_hop_targets(edges: DataFrame, robots: DataFrame,
                        dst: str = "dst_url") -> DataFrame:
    """The robots-disallowed subset of the edge table's hop targets — the
    set of URLs a policy-abiding client may never REQUEST as a redirect
    hop. Bounded by the edge table (~10^8 rows at web scale, never the
    frontier); one distinct + one broadcast rules join. Accepts both rule
    shapes :func:`go_crawler_spark.operators.politeness.apply_robots`
    accepts. Returns a single-column ``(url)`` frame for
    :func:`resolve_redirects`'s ``blocked_urls``."""
    from go_crawler_spark.functions.urls import registrable_host_udf
    from go_crawler_spark.operators.politeness import apply_robots

    dsts = (
        edges.select(F.col(dst).alias("url")).distinct()
        .withColumn("host", registrable_host_udf("url"))
    )
    _, blocked = apply_robots(dsts, robots)
    return blocked.select("url")


def resolve_redirects(
    urls: DataFrame,
    edges: DataFrame,
    url_col: str = "url",
    src: str = "src_url",
    dst: str = "dst_url",
    max_requests: int = GO_MAX_REQUESTS,
    assume_unique: bool = False,
    blocked_urls: "DataFrame | None" = None,
) -> DataFrame:
    """Resolve each URL in ``urls[url_col]`` through the redirect table to
    its final fetch target under the Go client's request budget.

    Returns ``(url, final_url, hops, status)``:

    - ``ok``: a terminal URL was reached within ``max_requests`` total
      requests (``hops <= max_requests - 1`` followed redirects);
      ``final_url`` is the terminal, ``hops`` the redirects followed.
    - ``stopped_after_10_redirects``: the chain (or cycle) still has a
      Location after ``max_requests - 1`` followed hops, so the next hop
      would exceed the budget — Go errors, the fetch yields no page;
      ``final_url`` is NULL and ``hops == max_requests`` (the capped walk
      length, matching a hop-capped recursive-SQL walk).

    ``assume_unique=True`` skips the defensive de-duplication of the input
    URL set (same contract as ``CrawlConfig.seeds_unique``): a caller whose
    input is unique by construction — a seen-deduped crawl frontier, the
    redirect-source set itself — must not pay a full shuffle+agg of every
    URL just to re-prove it.

    ``blocked_urls`` (optional one-column URL frame, e.g.
    :func:`blocked_hop_targets`) enforces robots per-REQUEST on the hops:
    a chain whose NEXT Location is a blocked URL aborts before issuing
    that request — requests 2..n are the resolver's responsibility,
    request 1 (the input URL itself) stays the caller's. Such chains
    return ``blocked_robots_hop`` with NULL ``final_url`` and ``hops`` =
    redirects successfully followed before the forbidden one. Mechanics:
    edges INTO blocked URLs are cut once up front (the src becomes a
    blocked terminal), so the budgeted walk needs no extra per-jump
    logic — one semi/anti join on the (bounded) edge table plus one
    relabeling join on the result. Budget exhaustion wins over a blocked
    terminal reached exactly AT the budget (no request happens either
    way; Go's client errors first).
    """
    budget = max_requests  # capped walk length: hops==budget ⇒ stopped
    e1 = normalize_redirect_edges(edges, src, dst)
    cut_srcs = None
    if blocked_urls is not None:
        b = (
            blocked_urls.select(
                F.col(blocked_urls.columns[0]).alias("_b")
            ).distinct().hint("shuffle_hash")
        )
        # srcs whose (single, post-normalization) Location is forbidden
        # become terminals: any walk reaching them stops there, blocked
        cut_srcs = e1.join(b, e1["_dst"] == b["_b"], "left_semi").select("_src")
        e1 = e1.join(b, e1["_dst"] == b["_b"], "left_anti")

    # Every join below hints shuffle_hash: the walk key changes at every
    # jump, so a sort-merge join's sorted outputs are never reusable — the
    # hint trades N useless sorts for hash builds on the (smaller) jump
    # side, and AQE still upgrades to broadcast when a side is tiny.

    # split: non-sources are final immediately and skip the pipeline
    srcs = e1.select(F.col("_src")).hint("shuffle_hash")
    base = urls.select(F.col(url_col).alias("url"))
    if not assume_unique:
        base = base.distinct()
    terminal0 = (
        base.join(srcs, base["url"] == srcs["_src"], "left_anti")
        .select(
            "url",
            F.col("url").alias("final_url"),
            F.lit(0).alias("hops"),
            F.lit(STATUS_OK).alias("status"),
        )
    )
    walkers = (
        base.join(srcs, base["url"] == srcs["_src"], "left_semi")
        .select("url", F.col("url").alias("cur"), F.lit(0).alias("hops"))
    )

    # jump tables J_{2^k} up to the largest power ≤ budget (greedy binary
    # descent then reaches exactly min(chain_len, budget) for any budget):
    # J_{2k} = J_k ∘ J_k — (src,dst)-only exchanges
    jumps = {1: e1}
    step = 1
    while step * 2 <= budget:
        a = jumps[step].select(
            F.col("_src").alias("_a_src"), F.col("_dst").alias("_a_dst")
        )
        b = jumps[step].hint("shuffle_hash")
        jumps[step * 2] = (
            a.join(b, a["_a_dst"] == b["_src"])
            .select(F.col("_a_src").alias("_src"), F.col("_dst").alias("_dst"))
        )
        step *= 2

    # greedy binary descent: take each power-of-two jump iff the full jump
    # exists AND it fits the remaining budget ⇒ hops = min(chain_len, budget)
    for s in sorted(jumps, reverse=True):
        j = jumps[s].select(
            F.col("_src").alias(f"_j{s}_src"), F.col("_dst").alias(f"_j{s}_dst")
        ).hint("shuffle_hash")
        walkers = (
            walkers.join(j, walkers["cur"] == j[f"_j{s}_src"], "left")
            .withColumn(
                "_take",
                F.col(f"_j{s}_dst").isNotNull()
                & (F.col("hops") + F.lit(s) <= F.lit(budget)),
            )
            .select(
                "url",
                F.when(F.col("_take"), F.col(f"_j{s}_dst"))
                .otherwise(F.col("cur")).alias("cur"),
                F.when(F.col("_take"), F.col("hops") + F.lit(s))
                .otherwise(F.col("hops")).alias("hops"),
            )
        )

    stopped = F.col("hops") >= F.lit(budget)
    resolved = walkers.select(
        "url",
        F.when(~stopped, F.col("cur")).alias("final_url"),
        F.col("hops").cast("int").alias("hops"),
        F.when(stopped, F.lit(STATUS_STOPPED))
        .otherwise(F.lit(STATUS_OK)).alias("status"),
    )
    out = terminal0.unionByName(resolved)
    if cut_srcs is not None:
        # relabel walks that ended on a blocked terminal (incl. hop-0
        # inputs whose own Location is forbidden, which land in terminal0
        # after the edge cut). Budget-stopped rows carry NULL final_url
        # and can never match — stopped wins, as documented.
        cut = cut_srcs.select(
            F.col("_src").alias("final_url"), F.lit(True).alias("_cut")
        ).hint("shuffle_hash")
        out = (
            out.join(cut, "final_url", "left")
            .select(
                "url",
                F.when(F.col("_cut").isNull(), F.col("final_url"))
                .alias("final_url"),
                "hops",
                F.when(F.col("_cut").isNotNull(), F.lit(STATUS_BLOCKED_HOP))
                .otherwise(F.col("status")).alias("status"),
            )
        )
    return out


def resolve_redirect_sources(
    edges: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    max_requests: int = GO_MAX_REQUESTS,
    blocked_urls: "DataFrame | None" = None,
) -> DataFrame:
    """Resolve ONLY the redirect-source set: ``(url, final_url, hops,
    status)`` for every distinct ``src`` in the hop table.

    This is the loop-invariant half of in-crawl redirect handling: the
    mapping depends only on the static edge table, never on the frontier,
    so an iterative crawl materializes it ONCE and each round applies a
    single hash join against it (:func:`apply_redirect_mapping`) — instead
    of re-deriving the jump tables (three self-joins) and re-distincting
    the full frontier every round. The mapping is bounded by the redirect
    table (~10^8 rows at web scale), orders of magnitude smaller than a
    10^10-URL frontier. URLs absent from the mapping are not redirect
    sources: they are final at hop 0 by definition.
    """
    e1 = normalize_redirect_edges(edges, src, dst)
    return resolve_redirects(
        e1.select(F.col("_src").alias("url")),
        edges, "url", src, dst, max_requests,
        assume_unique=True,  # groupBy keys are unique by construction
        blocked_urls=blocked_urls,
    )


def apply_redirect_mapping(
    frontier: DataFrame, mapping: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-round redirect application: ONE join of the frontier against a
    pre-materialized ``(url, final_url, status)`` source mapping
    (:func:`resolve_redirect_sources`). The round lineage contains no
    distinct-aggregate on the frontier and no jump-table joins — asserted
    in PLANS.md (``redirect_round_join``).

    Adds ``_final`` / ``_rstatus`` columns; rows whose URL is not a
    redirect source get NULLs (terminal at hop 0). The mapping side is
    shuffle-hash hinted: the frontier is the big side, a sort would be
    wasted, and AQE still upgrades to broadcast when the mapping is tiny.
    """
    m = mapping.select(
        F.col("url").alias(url_col),
        F.col("final_url").alias("_final"),
        F.col("status").alias("_rstatus"),
    ).hint("shuffle_hash")
    return frontier.join(m, url_col, "left")


def dedup_by_final_url(
    urls: DataFrame,
    edges: DataFrame,
    url_col: str = "url",
    src: str = "src_url",
    dst: str = "dst_url",
    max_requests: int = GO_MAX_REQUESTS,
) -> DataFrame:
    """Redirect-aware alias dedup: URLs whose chains land on the same
    final target are ONE page — the fetch scheduler should spend one
    request on the group, not one per alias (the reference fetches every
    alias separately and only its page-content identity collapses later;
    resolving first moves the dedup BEFORE the fetch). Budget-stopped
    chains yield no page and are excluded.

    Returns ``(final_url, n_aliases, first_alias)`` — first_alias is the
    smallest member URL (total deterministic rule, matching the repo's
    first-writer conventions)."""
    resolved = resolve_redirects(urls, edges, url_col, src, dst, max_requests)
    return (
        resolved.filter(F.col("status") == STATUS_OK)
        .groupBy("final_url")
        .agg(
            F.count(F.lit(1)).alias("n_aliases"),
            F.min("url").alias("first_alias"),
        )
    )
