"""Mirror-host detection [EXTENSION — LLM-data pipeline / crawl hygiene].

Large crawls re-fetch entire SITES hosted under several names (regional
mirrors, www/non-www splits the canonicalizer can't prove, scraper
mirrors). Doc-level dedup removes the duplicate PAGES one pair at a time,
but the frontier keeps scheduling the mirror host forever. The classic
crawler fix (IRLbot, Heritrix) detects host pairs whose CONTENT overlaps
and suppresses the loser host wholesale.

``mirror_hosts`` finds host pairs whose page-fingerprint sets overlap:

    overlap(A, B) = |FP(A) ∩ FP(B)| / min(|FP(A)|, |FP(B)|)

(the min-denominator makes a small full mirror of a large site score 1.0
— the containment analog at host granularity).

Scale shape:
- Only (host, fingerprint) pairs ever move — 8-byte hash + host key,
  never page bytes.
- Candidate pairs come from a self-join keyed on the FINGERPRINT, so two
  hosts meet only if they actually share a page — never an all-pairs
  host join.
- The skew hazard is a boilerplate fingerprint shared by *every* host
  (empty page, parked-domain template): its bucket would be
  |hosts|²-sized. Fingerprints shared by more than ``max_hosts_per_fp``
  hosts are censused first (two-phase count on the fp) and EXCLUDED —
  ubiquitous content carries no mirror signal, the same frequent-item
  pruning the boilerplate detector applies. The census is an aggregate
  on the already-moving (fp, host) rows; no extra pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["mirror_hosts"]


def mirror_hosts(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "fingerprint",
    overlap_threshold: float = 0.8,
    min_docs: int = 2,
    max_hosts_per_fp: int = 64,
) -> DataFrame:
    """Detect mirror host pairs by fingerprint-set overlap.

    Returns ``(host_a, host_b, shared, size_a, size_b, overlap)`` with
    ``host_a < host_b`` (string order), ``size_*`` the hosts' distinct
    fingerprint counts, and ``overlap ≥ overlap_threshold``. Hosts with
    fewer than ``min_docs`` distinct fingerprints are ignored (a one-page
    "mirror" is noise)."""
    hf = (
        pages.select(
            F.col(host_col).alias("_h"), F.col(fp_col).alias("_fp")
        )
        .distinct()
    )

    # frequent-fingerprint pruning: ubiquitous content (shared by more
    # hosts than any real mirror set) is excluded from pairing
    rare = (
        hf.groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_nh"))
        .filter(
            (F.col("_nh") >= 2) & (F.col("_nh") <= max_hosts_per_fp)
        )
        .select("_fp")
    )
    paired = hf.join(rare, "_fp", "left_semi")

    sizes = hf.groupBy("_h").agg(F.count(F.lit(1)).alias("_sz")).filter(
        F.col("_sz") >= min_docs
    )

    a = paired.select(F.col("_h").alias("host_a"), "_fp")
    b = paired.select(F.col("_h").alias("host_b"), "_fp")
    shared = (
        a.join(b, "_fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sz_a = sizes.select(
        F.col("_h").alias("host_a"), F.col("_sz").alias("size_a")
    )
    sz_b = sizes.select(
        F.col("_h").alias("host_b"), F.col("_sz").alias("size_b")
    )
    return (
        shared.join(sz_a, "host_a")
        .join(sz_b, "host_b")
        .withColumn(
            "overlap",
            F.col("shared") / F.least(F.col("size_a"), F.col("size_b")),
        )
        .filter(F.col("overlap") >= overlap_threshold)
        .select(
            "host_a",
            "host_b",
            "shared",
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            "overlap",
        )
    )
