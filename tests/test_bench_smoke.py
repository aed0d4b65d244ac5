"""Bench harness smoke gate: a scaled-down headline frontier round must
finish within a generous factor of a committed floor, so a harness or
methodology regression (like round 2's corpus-access switch, which tripled
fetch_extract) is caught by pytest before the driver measures it.

The gate runs bench.frontier_round_bench through the SAME code path the
headline uses (tmpfs corpus parquet + cache_corpus=True + the headline
datagen parameters), just 10x smaller so it fits the test session's
local[4]/4g Spark. Committed floor: this round measured ~9-14 s wall for
this job on an otherwise-idle box; the bound allows 5x for VM noise and
CI contention — loose enough to never flake, tight enough that a 3x
methodology regression plus noise still trips it.
"""

from __future__ import annotations

import os
import shutil
import tempfile

# generous multiple of the measured ~9-14 s wall on this box
SMOKE_BUDGET_SEC = 70.0
N_PAGES = 12_000


def test_frontier_round_smoke_budget(spark):
    import bench

    corpus = tempfile.mkdtemp(prefix="bench_smoke_", dir=bench._fast_tmp())
    corpus_pq = os.path.join(corpus, "corpus.parquet")
    try:
        from go_crawler_spark.datagen import generate_pages_df

        generate_pages_df(
            spark, N_PAGES, **bench._HEADLINE_GEN
        ).write.mode("overwrite").parquet(corpus_pq)
        fr = bench.frontier_round_bench(
            spark, cpus=4, n_pages=N_PAGES, corpus_path=corpus_pq,
            cache_corpus=True,
        )
    finally:
        shutil.rmtree(corpus, ignore_errors=True)

    assert fr["urls_fetched"] == N_PAGES
    assert fr["urls_scheduled"] > N_PAGES  # pages + assets admitted
    assert fr["sec"] < SMOKE_BUDGET_SEC, (
        f"frontier round took {fr['sec']:.1f}s (> {SMOKE_BUDGET_SEC}s smoke "
        f"budget) — bench harness or engine regression; phases: {fr['phases']}"
    )
