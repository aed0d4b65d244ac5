"""Distributed inverted-index construction [EXTENSION — LLM-data pipeline].

A crawl corpus's classic downstream artifact: term → (document frequency,
collection frequency, posting list). Retrieval-augmented pipelines build
exactly this over the cleaned corpus (BM25 candidate generation before
embedding rerank), and data-curation teams use the df table directly
(stopword discovery, contamination probes, vocabulary censuses).

Scale shape:
- One explode to (id, term), then a (term, id) partial-count aggregate —
  the exchange carries one row per DISTINCT (doc, term), bounded by
  corpus token count, combined map-side.
- df/cf come from a second aggregate keyed on the term (two-phase again).
- The posting LIST is the skew hazard: a stopword's full posting list is
  the corpus. The list is therefore capped BEFORE collection — a
  row_number window over (term) ordered by id keeps only the first
  ``postings_cap`` docs per term, so no task ever materializes more than
  ``cap`` rows per key, and the collect_list after the cap is bounded by
  construction. Real deployments page postings into fixed-size blocks the
  same way (block-max indexes); the cap here IS that first block.
  (The window sorts only the capped key's rows that reach it — skew on
  the window itself is bounded by AQE skew-split since rows beyond the
  cap are discarded at the filter immediately after; for a guaranteed
  bound swap the window for a min_k struct aggregate — df/cf stay exact
  either way, and the capped prefix is deterministic: lowest doc ids.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from go_crawler_spark.functions.text import normalize_for_fingerprint, tokens

__all__ = ["inverted_index"]


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings_cap: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Build the capped inverted index over the normalized token stream.

    Returns ``(term, df, cf, postings)`` — df = distinct docs containing
    the term, cf = total occurrences, postings = the first
    ``postings_cap`` doc ids in ascending order (the deterministic head
    block of the full posting list). Terms below ``min_df`` are dropped
    (the singleton long tail is census noise and at corpus scale it is
    most of the key space)."""
    toks = tokens(normalize_for_fingerprint(F.col(text_col)))
    td = df.select(
        F.col(id_col).alias("_id"), F.explode(toks).alias("term")
    ).filter(F.length("term") > 0)

    per_td = td.groupBy("term", "_id").agg(F.count(F.lit(1)).alias("tf"))

    stats = per_td.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )

    w = Window.partitionBy("term").orderBy("_id")
    head = (
        per_td.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= postings_cap)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("_id")).alias("postings"))
    )

    return (
        stats.join(head, "term")
        .filter(F.col("df") >= min_df)
        .select("term", "df", "cf", "postings")
    )
