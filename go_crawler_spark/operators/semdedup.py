"""SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication" —
public paper): cluster document embeddings with k-means, then prune
near-identical items WITHIN each cluster by pairwise cosine similarity.

Why cluster first at 100 TB: all-pairs cosine over 10^9+ embeddings is
infeasible; k-means caps the quadratic stage at O(Σ|c|²) with |c| ≈ n/k,
and the clustering itself is linear passes (the same reason the paper
scales to LAION/CommonCrawl sizes). Cross-cluster duplicates are missed by
design — the paper's accepted trade.

Scale shape:
- normalization + assignment are map-only Arrow passes (vectors cross into
  Python once per pass; centroids broadcast, k×d doubles);
- the centroid update is a posexplode → groupBy(cluster, dim) aggregation
  (map-side combine; k·d result rows collected to the driver — bounded);
- the quadratic stage runs per cluster via applyInPandas (one shuffle on
  cluster id).

Determinism protocol (bit-reproducible across partitionings AND vs the
independent fixture replica in tools/gen_fixtures.py):
- element sums for centroids use DECIMAL(38,15): each float64 is first
  quantized via its shortest decimal representation (what both Spark's
  float→decimal cast and python's ``Decimal(repr(v))`` produce), and
  decimal addition is exact, hence order-independent;
- centroid means are quantized to 9 dp (HALF_UP) before re-entering float
  math;
- every float reduction is ``(a*b).sum(axis=-1)`` over the fixed embedding
  dimension — numpy's pairwise summation order depends only on the reduced
  axis length, never on batch/partition row counts (no BLAS matmul, whose
  blocking varies with shape);
- dedup keeps the MINIMUM id per within-cluster duplicate component (the
  repo-wide first-writer convention; the paper keeps the item farthest
  from the centroid — same shape, different representative choice).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal, localcontext
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

CENTROID_SCALE = "1e-9"  # centroid quantization (dp) between iterations
SUM_DECIMAL = "decimal(38,15)"  # exact, order-independent element sums


def _dots(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n,d)×(k,d) → (n,k) cosine dots with a reduction order fixed by d
    alone (see determinism protocol)."""
    return (m[:, None, :] * c[None, :, :]).sum(axis=2)


def normalize_rows(vs: np.ndarray) -> np.ndarray:
    """L2-normalize float64 rows; zero vectors stay zero."""
    nrm = np.sqrt((vs * vs).sum(axis=1))
    nrm[nrm == 0.0] = 1.0
    return vs / nrm[:, None]


def quantize_centroids(sums: dict, counts: dict, k: int, d: int,
                       prev: np.ndarray) -> np.ndarray:
    """sums[(cluster, dim)] = Decimal, counts[cluster] = int → (k,d)
    float64 centroids rounded to CENTROID_SCALE; empty clusters keep their
    previous centroid."""
    out = prev.copy()
    with localcontext() as ctx:
        ctx.prec = 50
        q = Decimal(CENTROID_SCALE)
        for c in range(k):
            n = counts.get(c, 0)
            if not n:
                continue
            for j in range(d):
                m = (sums[(c, j)] / n).quantize(q, rounding=ROUND_HALF_UP)
                out[c, j] = float(m)
    return out


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """(id, cluster, keep) for every row: k-means cluster id and whether
    the row survives within-cluster near-dup pruning (cosine ≥
    ``threshold`` links rows; the minimum id of each linked component is
    kept)."""
    spark = df.sparkSession
    d = len(df.select(vec_col).first()[0])

    @F.pandas_udf(ArrayType(DoubleType()))
    def norm_udf(vs: pd.Series) -> pd.Series:
        m = normalize_rows(np.asarray(vs.tolist(), dtype=np.float64))
        return pd.Series(list(m))

    nrm = df.select(
        F.col(id_col).alias("_id"), norm_udf(vec_col).alias("_v")
    )
    # many downstream passes (k assignment scans + the final dedup) —
    # normalized vectors are small (n×d doubles) and worth keeping hot
    nrm = nrm.persist()

    # deterministic init: the k smallest ids' vectors
    init = nrm.orderBy("_id").limit(k).collect()
    centroids = np.asarray([r["_v"] for r in init], dtype=np.float64)

    def assign(cents: np.ndarray) -> DataFrame:
        b = spark.sparkContext.broadcast(cents)

        @F.pandas_udf("int")
        def cluster_udf(vs: pd.Series) -> pd.Series:
            m = np.asarray(vs.tolist(), dtype=np.float64)
            return pd.Series(np.argmax(_dots(m, b.value), axis=1).astype(np.int32))

        return nrm.withColumn("_c", cluster_udf("_v"))

    for _ in range(n_iters):
        assigned = assign(centroids)
        rows = (
            assigned.select("_c", F.posexplode("_v").alias("_j", "_x"))
            .groupBy("_c", "_j")
            .agg(
                F.sum(F.col("_x").cast(SUM_DECIMAL)).alias("_s"),
                F.count("*").alias("_n"),
            )
            .collect()
        )
        sums = {(r["_c"], r["_j"]): r["_s"] for r in rows}
        counts = {r["_c"]: int(r["_n"]) for r in rows if r["_j"] == 0}
        centroids = quantize_centroids(sums, counts, k, d, centroids)

    final = assign(centroids)

    out_schema = f"{id_col} long, cluster int, keep boolean"

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        ids = pdf["_id"].to_numpy()
        m = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
        n = len(ids)
        # union-find over within-cluster near-dup links
        parent = list(range(n))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        sims = (m[:, None, :] * m[None, :, :]).sum(axis=2)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        roots = np.asarray([find(i) for i in range(n)])
        keep = roots == np.arange(n)  # min id per component (sorted input)
        return pd.DataFrame(
            {id_col: ids, "cluster": pdf["_c"].to_numpy(), "keep": keep}
        )

    result = final.groupBy("_c").applyInPandas(prune, out_schema)
    nrm.unpersist()
    return result
