#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

``--scaling``: run the same job at two parallelism levels (local[8] = N and
local[32] = 4N — the sandbox stand-in for N vs 4N executors per
BASELINE.md) and report throughput at both plus scaling efficiency
E = (T_N / T_4N) / 4 into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("go-crawler-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def crawl_bench(spark, sf_dir: str) -> dict:
    """Flagship: full BFS crawl over the synthetic corpus; reports the
    north-rule metrics (URLs scheduled+deduped/sec, pages fetched/sec)."""
    from go_crawler_spark.config import CrawlConfig
    from go_crawler_spark.datagen import default_seeds, generate_pages_df
    from go_crawler_spark.plans.crawl import run_crawl

    base = os.path.basename(sf_dir.rstrip("/"))
    n_pages = {"sf0.001": 48, "sf0.01": 480, "sf0.1": 2400}.get(base, 2400)
    pages = generate_pages_df(spark, n_pages, seed=42)
    pages = pages.cache()
    pages.count()

    t0 = time.perf_counter()
    cfg = CrawlConfig(
        max_count=n_pages,  # crawl the whole reachable graph
        use_bloom=True,
        shuffle_partitions=CPUS,
    )
    res = run_crawl(spark, pages, default_seeds(), cfg)
    n_scheduled = res.schedule.count()
    n_fetched = res.fetched.count()
    dt = time.perf_counter() - t0
    pages.unpersist()
    return {
        "sec": dt,
        "urls_scheduled": n_scheduled,
        "urls_fetched": n_fetched,
        "urls_scheduled_per_sec": n_scheduled / dt,
        "pages_fetched_per_sec": n_fetched / dt,
        "rounds": res.rounds,
    }


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline operator queries (subset of __spark_entry__.queries that
    dominates runtime-relevant paths)."""
    import __spark_entry__ as em

    qs = em.queries()
    names = [
        "dedup_exact_keep_min",
        "minhash_near_dup_pairs",
        "simhash_near_dup_pairs",
        "token_counts",
        "quality_scores",
        "lang_id_pred",
        "embedding_topk_bruteforce",
        "embedding_ann_ivf",
        "tpch_pricing_summary",
        "revenue_by_priority",
        "politeness_topk_per_host",
        "global_seq_assignment",
        "crawl_extract_children",
    ]
    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def bench_once(cpus: int, sf_dir: str) -> dict:
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        crawl = crawl_bench(spark, sf_dir)
        qtimes = run_queries(spark, sf_dir)
    finally:
        spark.stop()
    total = round(crawl["sec"] + sum(qtimes.values()), 3)
    queries = {"crawl_flagship": round(crawl["sec"], 3), **qtimes}
    return {
        "metric": "total_headline_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(sf_dir.rstrip("/")).replace("sf", ""),
        "cpus": cpus,
        "crawl": {k: (round(v, 3) if isinstance(v, float) else v) for k, v in crawl.items()},
    }


def scaling_report(sf_dir: str) -> None:
    res_n = bench_once(8, sf_dir)
    res_4n = bench_once(32, sf_dir)
    t_n, t_4n = res_n["value"], res_4n["value"]
    eff = (t_n / t_4n) / 4
    crawl_eff = (res_n["crawl"]["sec"] / res_4n["crawl"]["sec"]) / 4
    lines = [
        "# BENCH — measured results",
        "",
        f"Input: `{sf_dir}` (+ synthetic crawl corpus, deterministic seed=42).",
        "Protocol per BASELINE.md: same job, same input, local[8] (N) vs",
        "local[32] (4N) as the sandbox stand-in for N vs 4N executors.",
        "",
        "| level | total headline sec | crawl sec | urls_scheduled/s | pages_fetched/s |",
        "|---|---|---|---|---|",
        f"| local[8] (N) | {t_n} | {res_n['crawl']['sec']} | {res_n['crawl']['urls_scheduled_per_sec']:.1f} | {res_n['crawl']['pages_fetched_per_sec']:.1f} |",
        f"| local[32] (4N) | {t_4n} | {res_4n['crawl']['sec']} | {res_4n['crawl']['urls_scheduled_per_sec']:.1f} | {res_4n['crawl']['pages_fetched_per_sec']:.1f} |",
        "",
        f"Scaling efficiency E = (T_N / T_4N) / 4: **{eff:.3f}** total, **{crawl_eff:.3f}** crawl-only.",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for name in res_n["queries"]:
        lines.append(f"| {name} | {res_n['queries'][name]} | {res_4n['queries'][name]} |")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"n": res_n, "4n": res_4n, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_report(SF_DIR)
    else:
        print(json.dumps(bench_once(CPUS, SF_DIR)))
