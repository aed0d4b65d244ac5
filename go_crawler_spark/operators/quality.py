"""Repetition-based quality signals for webtext corpora.

Gopher-style repetition filters (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1 — public paper):
machine-generated / boilerplate pages repeat the same tokens and n-grams;
a training pipeline scores every document and drops the worst tail.

Per document over the *normalized* token stream (same normalization the
dedup fingerprints use, ``functions/text.py::normalize_for_fingerprint``):

- ``top_token_frac``  — occurrences of the most frequent token / total
  tokens (the "fraction of characters in the most common word" analog)
- ``dup_bigram_frac`` — occurrences belonging to bigrams seen ≥2 times
  within the doc / total bigrams ("duplicate 2-grams" analog)
- ``distinct_ratio``  — distinct tokens / total tokens

Scale shape: both signals are explode → groupBy(id, gram) counts. Partial
aggregation combines map-side, so the exchange carries one row per
*distinct* (doc, gram) — bounded by document length, never corpus size —
and the per-doc reduction is a second tiny aggregate keyed on the doc id.
No Python anywhere; the whole plan is JVM built-ins inside whole-stage
codegen. Exact DuckDB oracle: ``repetition_scores`` in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from go_crawler_spark.functions.text import (
    normalize_for_fingerprint,
    token_ngrams,
    tokens,
)


def repetition_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(id_col, top_token_frac, dup_bigram_frac, distinct_ratio)`` —
    rounded to 6 dp; all-zero for empty documents (row-preserving)."""
    # tokens("") is [""] — the filter drops it so empty docs count 0
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(normalize_for_fingerprint(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok") != "")
    tok_agg = (
        toks.groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tok"),
            F.max("c").alias("max_tok"),
            F.count("*").alias("n_distinct"),
        )
    )

    # token_ngrams keeps multiplicity (no distinct) and evaluates the
    # tokenization once per row — exactly what a repetition count needs
    bg_agg = (
        df.select(
            F.col(id_col),
            F.explode(token_ngrams(F.col(text_col), 2)).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bg"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
                "dup_bg"
            ),
        )
    )

    return (
        df.select(id_col)
        .join(tok_agg, on=id_col, how="left")
        .join(bg_agg, on=id_col, how="left")
        .select(
            id_col,
            F.round(
                F.coalesce(F.col("max_tok") / F.col("n_tok"), F.lit(0.0)), 6
            ).alias("top_token_frac"),
            F.round(
                F.coalesce(F.col("dup_bg") / F.col("n_bg"), F.lit(0.0)), 6
            ).alias("dup_bigram_frac"),
            F.round(
                F.coalesce(F.col("n_distinct") / F.col("n_tok"), F.lit(0.0)), 6
            ).alias("distinct_ratio"),
        )
    )
