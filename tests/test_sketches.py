"""Count-min sketch: never undercounts, exact on collision-free keys,
partitioning-independent (tree merge is a sum), and the estimate path
agrees with a hand-built table."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from go_crawler_spark.operators.sketches import (
    build_count_min,
    heavy_hitters,
    with_cms_estimate,
)


def _skewed_df(spark, n=2000, parts=8):
    # key k_j appears ~n/2^j times: a few heavy hitters + a long tail
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.concat(
                F.lit("k"),
                F.floor(F.log2(F.col("id") + 1)).cast("int").cast("string"),
            ).alias("key")
        )
    )


def test_cms_never_undercounts_and_exact_when_wide(spark):
    df = _skewed_df(spark)
    hh = heavy_hitters(df, "key", depth=4, width=1 << 14).collect()
    assert len(hh) == 11  # log2(2000) buckets
    assert all(r["overestimate"] >= 0 for r in hh)
    # 11 keys in a 16k-wide, depth-4 table: an all-rows collision is
    # (11/16384)^4-improbable — the estimate is exact
    assert all(r["cms_count"] == r["n_exact"] for r in hh)


def test_cms_partitioning_independent(spark):
    df = _skewed_df(spark)
    t1 = build_count_min(df.coalesce(1), "key", depth=4, width=1 << 10)
    t8 = build_count_min(df.repartition(32), "key", depth=4, width=1 << 10)
    assert np.array_equal(t1, t8)
    assert int(t1[0].sum()) == 2000  # every row counted once per sketch row


def test_cms_narrow_width_overestimates_only(spark):
    # width 16 forces collisions: estimates may inflate but never deflate,
    # and totals per row stay the row count
    df = _skewed_df(spark, n=500)
    hh = heavy_hitters(df, "key", depth=4, width=16).collect()
    assert all(r["cms_count"] >= r["n_exact"] for r in hh)


def test_with_cms_estimate_matches_manual_lookup(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "key string")
    table = build_count_min(df, "key", depth=2, width=64)
    got = {
        r["key"]: r["cms_count"]
        for r in with_cms_estimate(
            df.select("key").distinct(), "key", table
        ).collect()
    }
    assert got == {"a": 2, "b": 1}
