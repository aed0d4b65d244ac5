"""Count-min sketch — sublinear heavy-hitter / frequency estimation over a
key column (Cormode & Muthukrishnan 2005, public paper).

Why a crawl engine needs it at 10^10-URL scale: per-host frequency state
(politeness budgeting, hot-host detection, abuse throttling) must be
consultable on the driver or broadcast to every task, but an exact
per-host count table over the open web is hundreds of millions of entries.
A depth×width count-min table is a few MB regardless of key cardinality,
merges by element-wise ADDITION (so the two-level tree used for the seen
filter applies verbatim), and only ever OVER-estimates — safe for
throttling decisions.

Scale shape, mirroring ``operators.dedup.tree_build_filter``:

- the d hash positions are computed JVM-side (``xxhash64(key, lit(seed_i))``
  — multi-column xxhash64 folds the literal into the running hash, giving
  d independent 64-bit functions without Python touching key strings);
- every input partition builds its own d×w int64 table in one Arrow pass
  (only d small ints per row cross into Python);
- partitions hash into ≤``fan_in`` executor-side combiner tasks that SUM
  tables; the driver sums only the ≤fan_in combiner outputs. A flat
  per-partition collect would push |partitions| × (d·w·8 bytes) through
  the driver.

Determinism: all integer math — estimates are bit-reproducible across
partitionings and engines (the DuckDB-side oracle reads a fixture computed
by an independent pure-python/numpy replica over ``tools/xxh64.py``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# row i of the sketch uses xxhash64(key, CMS_SEED_BASE + i); the base is an
# arbitrary published constant of the scheme (fixture replicates it)
CMS_SEED_BASE = 1000


def _position_cols(key: str, depth: int, width: int) -> list:
    return [
        F.pmod(
            F.xxhash64(F.col(key), F.lit(CMS_SEED_BASE + i).cast("long")),
            F.lit(width),
        ).alias(f"_p{i}")
        for i in range(depth)
    ]


def build_count_min(
    df: DataFrame, key: str, depth: int = 4, width: int = 1 << 16,
    fan_in: int = 16,
) -> np.ndarray:
    """Build the d×w count table over ``df[key]`` (one increment per row)
    with per-partition builds + ≤``fan_in`` executor-side SUM combiners +
    a driver sum of the combiner outputs. Returns an int64 ndarray."""
    import pickle

    positions = df.select(*_position_cols(key, depth, width))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        table = np.zeros((depth, width), dtype=np.int64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            for i in range(depth):
                np.add.at(table[i], pdf[f"_p{i}"].to_numpy(), 1)
        if any_rows:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {"_comb": [pid % fan_in], "t": [pickle.dumps(table)]}
            )

    built = positions.mapInPandas(build, "_comb int, t binary")

    if positions.rdd.getNumPartitions() > fan_in:

        def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc = None
            for pdf in batches:
                for blob in pdf["t"]:
                    t = pickle.loads(blob)
                    acc = t if acc is None else acc + t
            if acc is not None:
                yield pd.DataFrame({"t": [pickle.dumps(acc)]})

        built = built.repartition(fan_in, "_comb").mapInPandas(combine, "t binary")

    merged = np.zeros((depth, width), dtype=np.int64)
    for row in built.select("t").collect():
        merged += pickle.loads(row["t"])
    return merged


def with_cms_estimate(
    df: DataFrame, key: str, table: np.ndarray, out_col: str = "cms_count"
) -> DataFrame:
    """Attach the count-min estimate (min over the d row counters) for
    ``df[key]`` from a broadcast of the built table. Positions come from
    the same JVM hash expressions the build used."""
    depth, width = table.shape
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(table)

    @pandas_udf(LongType())
    def estimate(*pos: pd.Series) -> pd.Series:
        t = b.value
        est = t[0][pos[0].to_numpy()]
        for i in range(1, len(pos)):
            est = np.minimum(est, t[i][pos[i].to_numpy()])
        return pd.Series(est)

    pos_cols = _position_cols(key, depth, width)
    return df.withColumn(out_col, estimate(*pos_cols))


def heavy_hitters(
    df: DataFrame, key: str, depth: int = 4, width: int = 1 << 16,
) -> DataFrame:
    """(key, n_exact, cms_count, overestimate) per distinct key — the
    exact count (for validation; at open-web cardinality a consumer keeps
    ONLY the sketch) next to the sketch estimate. cms_count ≥ n_exact
    always (count-min never undercounts)."""
    table = build_count_min(df, key, depth, width)
    exact = df.groupBy(key).agg(F.count("*").alias("n_exact"))
    est = with_cms_estimate(exact, key, table)
    return est.select(
        key, "n_exact", "cms_count",
        (F.col("cms_count") - F.col("n_exact")).alias("overestimate"),
    )
