"""Fixture infrastructure pins.

The fixture generator (tools/gen_fixtures.py) re-derives minhash/simhash
expected outputs with a pure-Python xxhash64 — these tests pin that hash
(and the fixture files' presence/coverage) so a silent drift in either
side cannot produce a vacuously-passing oracle.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "fixtures")


def test_xxh64_matches_spark(spark):
    from tools.xxh64 import xxh64_str

    samples = (
        ["", "a", "ab", "abc"]
        + ["q" * n for n in range(4, 40)]
        + ["hello world " * 5, "日本語テキスト", "naïve café", "a b c d e f g h"]
    )
    rows = (
        spark.createDataFrame([(s,) for s in samples], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert r["h"] == xxh64_str(r["s"]), repr(r["s"])


def test_xxh64_long_fold_matches_spark(spark):
    """Multi-column xxhash64 (string, long literal) = the column's hash
    used as the seed of the literal's hashLong — the fold the count-min
    fixture replica relies on."""
    from tools.xxh64 import xxh64_long, xxh64_str

    mask = (1 << 64) - 1
    samples = ["", "a", "src3", "example.com", "日本語"]
    for lit in (0, 5, 1000, 1003, -1, 2**40):
        rows = (
            spark.createDataFrame([(s,) for s in samples], "s string")
            .select("s", F.xxhash64("s", F.lit(lit).cast("long")).alias("h"))
            .collect()
        )
        for r in rows:
            assert r["h"] == xxh64_long(lit, seed=xxh64_str(r["s"]) & mask), (
                lit, repr(r["s"]),
            )


@pytest.mark.parametrize(
    "name,key,expected_keys",
    [
        ("cms_host_counts", "sf", {"0.001", "0.01", "0.1"}),
        ("crawl_flagship", "scale", {48, 240, 1200}),
        ("crawl_children", "scale", {48, 240, 1200}),
        ("simhash_pairs", "sf", {"0.001", "0.01", "0.1"}),
        ("minhash_pairs", "sf", {"0.001", "0.01", "0.1"}),
        ("embedding_lsh_buckets", "sf", {"0.001", "0.01", "0.1"}),
        ("ann_ivf_candidates", "sf", {"0.001", "0.01", "0.1"}),
        ("streaming_host_metrics", "scale", {48, 240, 1200}),
    ],
)
def test_fixture_covers_all_scales(name, key, expected_keys):
    t = pq.read_table(os.path.join(FIXTURES, f"{name}.parquet"))
    assert set(t[key].to_pylist()) == expected_keys


def test_multimodal_fixture_present():
    t = pq.read_table(os.path.join(FIXTURES, "multimodal_features.parquet"))
    assert t.num_rows == 64
