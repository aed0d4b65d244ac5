"""Cuckoo seen-filter [EXTENSION — north rule "bloom/cuckoo"]: unit
semantics (no false negatives, delete, merge, saturation degradation) and
crawl-loop equivalence with the simulator when selected via config."""

from __future__ import annotations

import numpy as np
import pytest

from go_crawler_spark.operators.cuckoo import CuckooFilter


def _hashes(n: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-(2**62), 2**62, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives_and_low_fp():
    f = CuckooFilter(1 << 12)  # 16k slots
    ins = _hashes(8000, 1)
    f.add_many(ins)
    assert not f.saturated
    assert f.might_contain(ins).all()  # no false negatives
    other = _hashes(20000, 2)
    fp_rate = f.might_contain(other).mean()
    assert fp_rate < 0.05, fp_rate  # 16-bit fingerprints → ~2^-13/bucket-pair


def test_delete_retires_urls():
    f = CuckooFilter(1 << 10)
    ins = _hashes(1000, 3)
    f.add_many(ins)
    removed = f.delete_many(ins[:500])
    assert removed == 500
    assert f.might_contain(ins[500:]).all()
    # deleted keys mostly gone (a few may alias another key's fingerprint)
    assert f.might_contain(ins[:500]).mean() < 0.1


def test_merge_by_reinsertion():
    a, b = CuckooFilter(1 << 11), CuckooFilter(1 << 11)
    ha, hb = _hashes(2000, 4), _hashes(2000, 5)
    a.add_many(ha)
    b.add_many(hb)
    m = a.merge(b)
    assert m.might_contain(ha).all() and m.might_contain(hb).all()


def test_saturation_degrades_to_all_true():
    f = CuckooFilter(1 << 4, slots_per_bucket=2)  # 32 slots
    f.add_many(_hashes(500, 6))
    assert f.saturated
    assert f.might_contain(_hashes(100, 7)).all()  # advisory: no pruning


def test_idempotent_insert():
    f = CuckooFilter(1 << 10)
    h = _hashes(300, 8)
    f.add_many(h)
    before = f.load_factor()
    f.add_many(h)  # re-inserting seen keys must not consume slots
    assert f.load_factor() == before


def test_crawl_with_cuckoo_matches_simulator(spark):
    from go_crawler_spark.config import CrawlConfig
    from go_crawler_spark.datagen import default_seeds, generate_corpus_dict, generate_pages_df
    from go_crawler_spark.plans.crawl import run_crawl
    from go_crawler_spark.simulator import simulate

    pages = generate_pages_df(spark, 48, 42)
    cfg = CrawlConfig(max_count=40, seen_filter="cuckoo", cuckoo_buckets=1 << 12,
                      bloom_min_seen_rows=0)
    res = run_crawl(spark, pages, default_seeds(), cfg)
    sim = simulate(generate_corpus_dict(48, 42), default_seeds(), cfg)

    e = {(r["url"], r["kind"], r["depth"], r["seq"]) for r in res.schedule.collect()}
    s = {(it.url, it.kind, it.depth, it.seq) for it in sim.schedule}
    assert e == s
    assert {r["url"] for r in res.seen.collect()} == sim.seen


def test_config_rejects_bad_filter():
    from go_crawler_spark.config import CrawlConfig

    with pytest.raises(ValueError):
        CrawlConfig(seen_filter="xor").validate()
