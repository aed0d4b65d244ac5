"""Checkpoint/resume (C6 [EXTENSION]): a crawl interrupted after any round
resumes from the workdir and produces results identical to an
uninterrupted run — including after a torn write from a mid-round crash."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from go_crawler_spark.config import CrawlConfig
from go_crawler_spark.datagen import default_seeds, generate_corpus_dict, generate_pages_df
from go_crawler_spark.plans.crawl import resume_crawl, run_crawl

N_PAGES = 48


@pytest.fixture(scope="module")
def pages_df(spark):
    df = generate_pages_df(spark, N_PAGES, 42)
    df.cache().count()
    return df


def _tables(res):
    sched = {(r["url"], r["kind"], r["depth"], r["seq"]) for r in res.schedule.collect()}
    fetched = {(r["url"], r["round"], r["status"]) for r in res.fetched.collect()}
    seen = {r["url"] for r in res.seen.collect()}
    metrics = {tuple(r) for r in res.metrics.collect()}
    return sched, fetched, seen, metrics


def test_resume_equals_uninterrupted(spark, pages_df):
    cfg = CrawlConfig(max_count=40, host_slots_per_round=3)

    full = run_crawl(spark, pages_df, default_seeds(), cfg)

    wd = tempfile.mkdtemp(prefix="resume_")
    partial = run_crawl(spark, pages_df, default_seeds(), cfg, workdir=wd, max_rounds=2)
    assert partial.rounds == 2

    resumed = resume_crawl(spark, pages_df, cfg, wd)
    assert resumed.rounds >= full.rounds
    assert _tables(resumed) == _tables(full)


def test_resume_cleans_torn_round(spark, pages_df):
    """A crash can leave a fetched_{r} for a round whose enqueue never
    landed; resume must discard it or those pages' children are lost."""
    cfg = CrawlConfig(max_count=40)

    full = run_crawl(spark, pages_df, default_seeds(), cfg)

    wd = tempfile.mkdtemp(prefix="resume_torn_")
    run_crawl(spark, pages_df, default_seeds(), cfg, workdir=wd, max_rounds=2)
    # simulate the torn round-2 fetch: copy round 1's fetched as round 2's
    shutil.copytree(os.path.join(wd, "fetched_1"), os.path.join(wd, "fetched_2"))

    resumed = resume_crawl(spark, pages_df, cfg, wd)
    assert _tables(resumed) == _tables(full)


def test_compact_then_resume_equals_uninterrupted(spark, pages_df):
    """Merging the per-round enqueue deltas into one bucketed table is
    row-identical: resume after compaction reproduces the uninterrupted
    crawl, including from a torn (crashed mid-round) checkpoint."""
    from go_crawler_spark.plans.crawl import compact_enqueue_log
    from go_crawler_spark.tableio import make_tableio

    cfg = CrawlConfig(max_count=40, host_slots_per_round=3)
    full = run_crawl(spark, pages_df, default_seeds(), cfg)

    wd = tempfile.mkdtemp(prefix="compact_")
    run_crawl(spark, pages_df, default_seeds(), cfg, workdir=wd, max_rounds=2)
    # simulate a torn round: a fetched_ log for a round whose enqueue
    # never landed — compaction must discard it like resume does
    shutil.copytree(os.path.join(wd, "fetched_1"), os.path.join(wd, "fetched_2"))

    merged_away = compact_enqueue_log(spark, wd, cfg)
    assert merged_away >= 1
    io = make_tableio(spark, wd, cfg.table_backend)
    assert io.list_names("enqueue_") == ["enqueue_0"]
    assert "fetched_2" not in io.list_names("fetched_")

    resumed = resume_crawl(spark, pages_df, cfg, wd)
    assert _tables(resumed) == _tables(full)

    # second compaction over the resumed rounds is a plain no-fail merge
    compact_enqueue_log(spark, wd, cfg)
    assert io.list_names("enqueue_") == ["enqueue_0"]
