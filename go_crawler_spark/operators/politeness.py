"""Per-host politeness slots + robots rules [EXTENSION — north rule].

The reference crawls a single host with no politeness (its Semaphore at
pkg/semaphore/semaphore.go:1-15 is defined but never used); the north rule
mandates per-host politeness buckets and robots.txt enforcement with skew
handled explicitly. Semantics (ours, documented, simulator-verified):

- per round, at most ``slots`` frontier items per canonical host are
  fetched, chosen in canonical ``seq`` order; the rest roll over to the
  next round keeping their seq (politeness delay quantized to rounds);
- robots: a ``(host, disallow_prefix)`` rules table; any frontier URL whose
  path starts with a disallowed prefix for its host is dropped with status
  'skipped_robots' (it stays in ``seen`` — it was enqueued already).

Skew: a simple ``row_number() over (partition by host order by seq)`` sends
every URL of a mega-host through one task. The salted two-phase variant
first ranks within (host, salt) — fanning a hot host across ``n_salts``
tasks and discarding all but ``slots`` rows per salt — then ranks the
survivors within host. Phase 2 sees at most ``slots * n_salts`` rows per
host regardless of host size, so the skewed window is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_fetch_slots(
    frontier: DataFrame,
    slots_per_host: int,
    n_salts: int = 8,
    host_col: str = "host",
    order_col: str = "seq",
    host_slots: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split frontier into (fetch_now, deferred) under per-host slots.

    ``slots_per_host <= 0`` disables the global cap; ``host_slots`` is an
    optional per-host override table ``(host, host_slots)`` — e.g. derived
    from robots.txt Crawl-delay via
    :func:`go_crawler_spark.functions.robots.crawl_delay_slots` — joined
    broadcast (a host-level table is tiny next to the frontier). A host's
    limit is its override if present, else the global cap (unlimited when
    the global cap is off).

    Deterministic: ``order_col`` is a total order, and the salt is a pure
    function of the URL (xxhash64 % n_salts), not a random number.
    """
    if slots_per_host <= 0 and host_slots is None:
        return frontier, frontier.limit(0)
    default_limit = slots_per_host if slots_per_host > 0 else 2**31 - 1

    base = frontier
    if host_slots is not None:
        base = base.join(
            F.broadcast(host_slots.select(host_col, "host_slots")),
            on=host_col, how="left",
        )
        limit = F.coalesce(F.col("host_slots"), F.lit(default_limit))
    else:
        limit = F.lit(default_limit)

    salted = base.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(order_col)
    phase1 = salted.withColumn("_r1", F.row_number().over(w1))
    survivors = phase1.filter(F.col("_r1") <= limit)

    w2 = Window.partitionBy(host_col).orderBy(order_col)
    phase2 = survivors.withColumn("_r2", F.row_number().over(w2))
    drop_cols = ["_salt", "_r1", "_r2"] + (
        ["host_slots"] if host_slots is not None else []
    )
    fetch_now = phase2.filter(F.col("_r2") <= limit).drop(*drop_cols)
    deferred = frontier.join(fetch_now.select("url"), on="url", how="left_anti")
    return fetch_now, deferred


def apply_robots(frontier: DataFrame, robots: DataFrame, host_col: str = "host") -> tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, blocked) by robots rules.

    Two rule-table shapes are accepted:

    - ``(host, disallow_prefix)`` — the simple any-prefix-blocks model
      (historic robots.txt subset; simulator-verified in the crawl loop);
    - an RFC 9309 rules table ``(host, agent, allow, pattern, pattern_len,
      regex)`` as produced by
      :func:`go_crawler_spark.functions.robots.parse_robots_rules` —
      full longest-match semantics with wildcards/anchors and
      allow-wins-ties, evaluated by
      :func:`go_crawler_spark.functions.robots.robots_verdict`.

    Either way the rules side is a small dimension table → broadcast
    join; the frontier is never shuffled.
    """
    if "pattern" in robots.columns:
        from go_crawler_spark.functions.robots import robots_verdict

        verdict = robots_verdict(frontier, robots, host_col=host_col)
        allowed = verdict.filter(F.col("robots_allowed")).drop("robots_allowed")
        blocked = verdict.filter(~F.col("robots_allowed")).drop("robots_allowed")
        return allowed, blocked
    rules = F.broadcast(
        robots.select(F.col("host").alias(host_col), "disallow_prefix").distinct()
    )
    path_expr = F.parse_url(F.col("url"), F.lit("PATH"))
    joined = (
        frontier.withColumn("_path", path_expr)
        .join(rules, on=host_col, how="left")
        .withColumn(
            "_blocked",
            F.col("disallow_prefix").isNotNull()
            & F.col("_path").startswith(F.col("disallow_prefix")),
        )
    )
    verdict = joined.groupBy(*frontier.columns).agg(F.max("_blocked").alias("_any_blocked"))
    allowed = verdict.filter(~F.coalesce(F.col("_any_blocked"), F.lit(False))).drop("_any_blocked")
    blocked = verdict.filter(F.coalesce(F.col("_any_blocked"), F.lit(False))).drop("_any_blocked")
    return allowed, blocked
