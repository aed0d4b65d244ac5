"""SemDeDup operator: hand-checkable toy geometry, min-id-per-component
keep rule, partitioning independence (the determinism protocol), and the
full oracle comparison rides tests/test_queries_oracle.py."""

from __future__ import annotations

import math

from go_crawler_spark.operators.semdedup import semdedup


def _toy_df(spark, parts=1):
    # two tight bundles on orthogonal axes + one lone vector: k=2 must
    # split the bundles; near-identical members prune to their min id
    e = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # ~dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.01, 0.999, 0.0, 0.0]),   # ~dup of 2
        (4, [0.0, 0.97, 0.2, 0.1]),     # near 2 but below a high threshold
    ]
    return spark.createDataFrame(
        e, "vec_id long, embedding array<float>"
    ).repartition(parts)


def test_semdedup_toy_clusters_and_prunes(spark):
    got = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semdedup(
            _toy_df(spark), k=2, n_iters=3, threshold=0.999
        ).collect()
    }
    assert len(got) == 5
    # bundles land in different clusters
    assert got[0][0] == got[1][0] and got[2][0] == got[3][0]
    assert got[0][0] != got[2][0]
    # min id of each near-dup component survives; dups drop
    assert got[0][1] and not got[1][1]
    assert got[2][1] and not got[3][1]
    assert got[4][1]  # cos(2,4) < 0.999: kept


def test_semdedup_partitioning_independent(spark):
    a = sorted(
        tuple(r) for r in semdedup(_toy_df(spark, parts=1), k=2, n_iters=3).collect()
    )
    b = sorted(
        tuple(r) for r in semdedup(_toy_df(spark, parts=5), k=2, n_iters=3).collect()
    )
    assert a == b


def test_semdedup_threshold_one_keeps_exact_dups_only(spark):
    df = spark.createDataFrame(
        [(10, [0.5, 0.5]), (11, [0.5, 0.5]), (12, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["keep"] for r in
           semdedup(df, k=1, n_iters=2, threshold=1.0 - 1e-9).collect()}
    assert got == {10: True, 11: False, 12: True}
    # sanity: normalized dup cosine is exactly 1
    assert math.isclose(0.5 / math.sqrt(0.5), math.sqrt(0.5))
