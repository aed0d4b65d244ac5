"""Sliding-window text chunking [EXTENSION — LLM-data pipeline].

The reference stores whole pages (cmd/crawler/main.go:345-364 writes one
file per URL; no text segmentation exists anywhere in the Go tree). Every
embedding / retrieval pipeline downstream of a crawl needs the opposite
granularity: fixed-size token windows with overlap, so that (a) each
chunk fits an encoder's context, and (b) a sentence straddling a window
boundary still appears intact in the neighbouring window (the standard
RAG chunker — HuggingFace tokenizers' ``stride``, LangChain's
``chunk_overlap``). This operator produces that table; the embedding
near-dup / ANN operators (operators/similarity.py, dedup_corpus.py) then
run over the chunk rows instead of whole documents.

Window rule (exact, deterministic, both-engine expressible): over the
normalized token array of length ``n``, window starts are

    starts = sequence(1, greatest(least(n - size + stride, n), 1), stride)

i.e. ``1, 1+stride, 1+2·stride, …`` up to the first window that reaches
token ``n`` — so every token is covered, consecutive windows overlap by
``size - stride`` tokens, no window starts past the end, and a document
with ``n <= size`` yields exactly one window. The trailing window may be
shorter than ``size`` (it is clipped at ``n``), matching the tokenizer
convention. With ``stride > size`` the windows are gapped SAMPLES every
``stride`` tokens (the ``least(…, n)`` clamp is what keeps a sampled
start from landing past the end of the document).

Scale shape (the part that must survive 100 TB):
- The whole operator is MAP-ONLY: tokenize (JVM regexp), build the
  per-document start list (``sequence``), explode, slice, re-join — zero
  exchanges, zero Python. Catalyst keeps the entire pipeline inside one
  WholeStageCodegen span over the scan; output partitioning inherits the
  input's, so a downstream embedding UDF reads chunks with full data
  locality.
- Output volume is input volume × (size / stride) in the worst case —
  the only "blow-up" is the documented overlap factor the caller chose;
  no key can skew it (windows are per-document, never grouped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from go_crawler_spark.functions.text import normalize_for_fingerprint, tokens

__all__ = ["chunk_windows"]


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document's normalized token stream into overlapping
    ``size``-token windows every ``stride`` tokens.

    Returns one row per window:
    ``(id_col, chunk_idx, start_token, n_tokens, chunk_text)`` with
    ``chunk_idx`` 1-based in document order, ``start_token`` the 1-based
    token offset, ``n_tokens`` the window's actual length (only the last
    window of a document may be shorter than ``size``), and ``chunk_text``
    the window's tokens re-joined by single spaces. Documents whose
    normalized text is empty yield no rows.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    norm = normalize_for_fingerprint(F.col(text_col))
    toked = (
        df.select(F.col(id_col), norm.alias("_nt"))
        .filter(F.length("_nt") > 0)
        .select(id_col, tokens(F.col("_nt")).alias("_t"))
        .withColumn("_n", F.size("_t"))
    )
    # clamp the start bound at n: with stride > size (sampled, gapped
    # windows) the un-clamped bound n - size + stride exceeds n and would
    # admit a start past the end of the document (an empty window)
    starts = F.sequence(
        F.lit(1),
        F.greatest(
            F.least(F.col("_n") - F.lit(size) + F.lit(stride), F.col("_n")),
            F.lit(1),
        ),
        F.lit(stride),
    )
    return (
        toked.select(id_col, "_t", "_n", F.explode(starts).alias("_s"))
        .select(
            F.col(id_col),
            (((F.col("_s") - 1) / F.lit(stride)) + 1)
            .cast("int")
            .alias("chunk_idx"),
            F.col("_s").cast("int").alias("start_token"),
            F.least(F.lit(size), F.col("_n") - F.col("_s") + 1)
            .cast("int")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_t"), F.col("_s"), F.lit(size)), " "
            ).alias("chunk_text"),
        )
    )
