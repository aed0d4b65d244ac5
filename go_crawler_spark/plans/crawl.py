"""The crawl job: iterative-batch BFS over DataFrames.

One *round* is a single declarative lineage (SURVEY §3.1 Spark lifecycle):

    frontier → [robots] → [politeness split] → fetch join (pages corpus)
             → extract UDF → explode → depth filter → within-round dedup
             → anti-join seen (bloom-pruned) → budget-ordered limit
             → seq assignment → {next frontier, seen ∪, sink append, metrics}

which replaces the reference's goroutine pipeline (cmd/crawler/main.go:61-90)
— Spark's task scheduler replaces the hand-rolled worker pools (C2), union
replaces fan-in (C3), and the driver loop condition replaces ack-counting
termination (Q4, internal/queue.go:116-129).

Scale posture (designed for 10^10 URLs / 1000 executors, tested local):
- frontier/seen carry ``url_hash = xxhash64(url)``; seen is written
  hash-bucketed so the per-round anti-join co-partitions without a resort;
- the bloom filter prunes the anti-join probe side (operators/dedup.py);
- the politeness window is salted two-phase (operators/politeness.py) so a
  mega-host cannot serialize a round;
- seq assignment is the two-pass range-partition scheme (operators/
  sequence.py), never a single-partition window;
- per-round state is persisted to parquet (atomic rename) → any round is
  resumable (C6 [EXTENSION]); lineage is truncated every round so plans
  stay O(1) deep regardless of crawl length.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_crawler_spark.config import CrawlConfig
from go_crawler_spark.functions.htmlx import extract_resolved_udf, rewrite_html_udf
from go_crawler_spark.functions.urls import (
    asset_save_path_udf,
    page_save_path_udf,
    registrable_host_udf,
)
from go_crawler_spark.operators.budget import apply_page_budget
from go_crawler_spark.operators.dedup import (
    build_bloom,
    dedup_against_seen,
    first_writer_dedup,
)
from go_crawler_spark.operators.fetch import fetch_round
from go_crawler_spark.operators.politeness import apply_robots, assign_fetch_slots
from go_crawler_spark.operators.sequence import assign_global_seq

FRONTIER_SCHEMA = "url string, kind string, depth int, seq long, host string"
ORDER_COLS = ["parent_seq", "pos"]  # canonical within-round discovery order


@dataclass
class CrawlResult:
    schedule: DataFrame   # url kind depth seq host enqueue_round
    fetched: DataFrame    # url kind depth seq host round status size
    pages_out: DataFrame  # url warc_ts html text lang status save_path kind depth round
    metrics: DataFrame    # round pages_crawled pages_failed links_discovered assets_found bytes_downloaded
    seen: DataFrame       # url url_hash
    rounds: int


def _workdir_write(df: DataFrame, path: str, partition_cols: Optional[List[str]] = None) -> DataFrame:
    """Atomic parquet materialization: write to tmp, rename, read back.
    Truncates lineage and is the per-round checkpoint (C6)."""
    tmp = path + "._tmp"
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return df.sparkSession.read.parquet(path)


def _append(df: Optional[DataFrame], new: DataFrame) -> DataFrame:
    return new if df is None else df.unionByName(new)


def seeds_frontier(spark: SparkSession, seeds: List[str], cfg: CrawlConfig) -> tuple[DataFrame, DataFrame, int, int]:
    """Initial Push of the seed list (ref: main.go:93, generalized to a list
    per north rule). Returns (frontier, refused_pages, seq_next, enqueued).
    Seed dedup + budget follow exactly queue.go:88-114."""
    uniq: list[str] = []
    seen_local: set[str] = set()
    for s in seeds:
        if s not in seen_local:
            seen_local.add(s)
            uniq.append(s)
    admitted = uniq[: cfg.max_count]
    refused = uniq[cfg.max_count:]
    rows = [(u, "page", 0, i) for i, u in enumerate(admitted)]
    frontier = (
        spark.createDataFrame(rows, "url string, kind string, depth int, seq long")
        .withColumn("host", registrable_host_udf("url"))
    )
    refused_df = spark.createDataFrame([(u,) for u in refused], "url string")
    return frontier, refused_df, len(admitted), len(admitted)


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: List[str],
    cfg: CrawlConfig,
    robots: Optional[DataFrame] = None,
    workdir: Optional[str] = None,
    max_rounds: int = 1000,
) -> CrawlResult:
    """Drive the BFS loop. ``pages`` is the (url, warc_ts, html, text, lang)
    corpus; ``robots`` an optional (host, disallow_prefix) table."""
    own_workdir = workdir is None
    if own_workdir:
        import tempfile

        workdir = tempfile.mkdtemp(prefix="crawl_")

    frontier, refused_seeds, seq_next, pages_enqueued = seeds_frontier(spark, seeds, cfg)

    seen = frontier.select("url").unionByName(refused_seeds).withColumn(
        "url_hash", F.xxhash64("url")
    )
    seen = _workdir_write(seen, os.path.join(workdir, "seen"))
    frontier = _workdir_write(frontier, os.path.join(workdir, "frontier"))

    schedule = frontier.withColumn("enqueue_round", F.lit(0))
    schedule = _workdir_write(schedule, os.path.join(workdir, "schedule"))
    fetched_all: Optional[DataFrame] = None
    pages_out_all: Optional[DataFrame] = None
    metrics_rows: list[tuple] = []

    rnd = 0
    while rnd < max_rounds:
        if frontier.isEmpty():
            break

        # robots gate [EXTENSION]
        if robots is not None:
            allowed, blocked = apply_robots(frontier, robots)
            blocked_fetched = blocked.select(
                "url", "kind", "depth", "seq", "host",
                F.lit(rnd).alias("round"),
                F.lit("skipped_robots").alias("status"),
                F.lit(0).alias("size"),
            )
        else:
            allowed, blocked_fetched = frontier, None

        # politeness split [EXTENSION]
        fetch_now, deferred = assign_fetch_slots(
            allowed, cfg.host_slots_per_round, cfg.politeness_salts
        )

        # S2/S3 fetch: lookup join + size gate
        fetched = fetch_round(fetch_now, pages, cfg.max_file_size)
        fetched = _workdir_write(fetched, os.path.join(workdir, f"fetched_{rnd}"))

        # P1-P6: parse pages only (assets skip parse, main.go:207)
        parsed = fetched.filter(F.col("kind") == "page").withColumn(
            "children", extract_resolved_udf("url", "html")
        )
        children = (
            parsed.select(
                F.col("seq").alias("parent_seq"),
                F.col("depth").alias("parent_depth"),
                F.explode("children").alias("c"),
            )
            .select(
                F.col("c.url").alias("url"),
                F.col("c.kind").alias("kind"),
                (F.col("parent_depth") + 1).alias("depth"),
                "parent_seq",
                F.col("c.pos").alias("pos"),
            )
        )
        children = _workdir_write(children, os.path.join(workdir, f"children_{rnd}"))

        # metrics (M1) — counter names from internal/metrics.go:14-18
        agg = fetched.agg(
            F.sum(F.when((F.col("kind") == "page") & (F.col("status") == "ok"), 1).otherwise(0)).alias("pc"),
            F.sum(F.when((F.col("kind") == "page") & (F.col("status") != "ok"), 1).otherwise(0)).alias("pf"),
            F.sum("size").alias("bytes"),
        ).collect()[0]
        cagg = children.agg(
            F.sum(F.when(F.col("kind") == "page", 1).otherwise(0)).alias("links"),
            F.sum(F.when(F.col("kind") != "page", 1).otherwise(0)).alias("assets"),
        ).collect()[0]
        metrics_rows.append(
            (rnd, agg["pc"] or 0, agg["pf"] or 0, cagg["links"] or 0, cagg["assets"] or 0, agg["bytes"] or 0)
        )

        # [EXTENSION] depth limit — before seen (never pushed ⇒ never seen)
        candidates = children.filter(F.col("depth") <= cfg.max_depth)

        # Q1a within-round first-writer-wins
        candidates = first_writer_dedup(candidates, "url", ORDER_COLS)

        # Q1b cross-round: bloom prune + exact anti-join
        bloom = (
            build_bloom(seen, "url", cfg.bloom_bits, cfg.bloom_hashes)
            if cfg.use_bloom
            else None
        )
        new_urls = dedup_against_seen(candidates, seen, "url", bloom)

        # Q2 budget: ordered limit, pages only; refused pages still get seen
        budget_remaining = cfg.max_count - pages_enqueued
        admitted, refused = apply_page_budget(new_urls, budget_remaining, ORDER_COLS)

        # canonical contiguous seq continuing the global counter
        admitted = assign_global_seq(
            admitted.select("url", "kind", "depth", "parent_seq", "pos"),
            ORDER_COLS,
            start=seq_next,
        )
        admitted = admitted.select(
            "url", "kind", "depth", "seq",
            registrable_host_udf("url").alias("host"),
        )
        admitted = _workdir_write(admitted, os.path.join(workdir, f"admitted_{rnd}"))

        n_admitted = admitted.count()
        n_admitted_pages = admitted.filter(F.col("kind") == "page").count()
        seq_next += n_admitted
        pages_enqueued += n_admitted_pages

        # seen ∪ admitted ∪ budget-refused pages (queue.go:92-106)
        seen_new = (
            admitted.select("url")
            .unionByName(refused.select("url"))
            .withColumn("url_hash", F.xxhash64("url"))
        )
        seen = _workdir_write(
            seen.unionByName(seen_new), os.path.join(workdir, f"seen_{rnd}")
        )

        # S4/S5/T1 sink: rewrite page html, resolve save paths, keep skipped
        # rows (row-preserving skip, SURVEY §3.2)
        out = fetched.select(
            "url", "warc_ts",
            F.when(
                (F.col("kind") == "page") & F.col("html").isNotNull(),
                rewrite_html_udf("html", "url"),
            ).otherwise(F.col("html")).alias("html"),
            "text", "lang", "status", "kind", "depth",
            F.when(F.col("kind") == "page", page_save_path_udf("url"))
            .otherwise(asset_save_path_udf("url")).alias("save_path"),
            F.lit(rnd).alias("round"),
        )
        pages_out_all = _append(pages_out_all, out)

        fetch_log = fetched.select(
            "url", "kind", "depth", "seq", "host",
            F.lit(rnd).alias("round"), "status", "size",
        )
        if blocked_fetched is not None:
            fetch_log = fetch_log.unionByName(blocked_fetched)
        # materialize: blocked_fetched lazily reads the frontier path, which
        # is overwritten at the end of every round
        fetch_log = _workdir_write(fetch_log, os.path.join(workdir, f"fetchlog_{rnd}"))
        fetched_all = _append(fetched_all, fetch_log)

        schedule = _append(
            schedule.sparkSession.read.parquet(os.path.join(workdir, "schedule")),
            admitted.withColumn("enqueue_round", F.lit(rnd + 1)),
        )
        schedule = _workdir_write(schedule, os.path.join(workdir, "schedule"))

        # next frontier = deferred ∪ admitted
        frontier = _workdir_write(
            deferred.select("url", "kind", "depth", "seq", "host").unionByName(
                admitted
            ),
            os.path.join(workdir, "frontier"),
        )

        # checkpoint manifest — resume point (C6 [EXTENSION])
        with open(os.path.join(workdir, "MANIFEST.json"), "w") as f:
            json.dump(
                {"round": rnd, "seq_next": seq_next, "pages_enqueued": pages_enqueued},
                f,
            )
        rnd += 1

    metrics = spark.createDataFrame(
        metrics_rows,
        "round int, pages_crawled long, pages_failed long, "
        "links_discovered long, assets_found long, bytes_downloaded long",
    )
    pages_out = _workdir_write(pages_out_all, os.path.join(workdir, "pages_out")) if pages_out_all is not None else None
    fetched_final = _workdir_write(fetched_all, os.path.join(workdir, "fetched")) if fetched_all is not None else None
    return CrawlResult(
        schedule=schedule,
        fetched=fetched_final,
        pages_out=pages_out,
        metrics=metrics,
        seen=seen,
        rounds=rnd,
    )
