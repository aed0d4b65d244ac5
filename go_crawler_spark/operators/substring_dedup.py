"""Exact duplicate-substring detection (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr side of the
paper; MinHash/SimHash/SemDeDup cover the near-dup side elsewhere in this
package) [EXTENSION — LLM-pipeline].

A k-token window that occurs more than once ANYWHERE in the corpus
(across documents or repeated within one) marks memorization-prone
boilerplate: licenses, navigation chrome, templated paragraphs. The
operator finds every such window and merges overlapping/adjacent hits
into maximal per-document token spans — the unit a cleaning pass excises.

Spark-first shape (the paper builds one giant suffix array; that is a
single-machine design — at 10^10 documents the equivalent signal comes
from fixed-k window fingerprints, which distribute):

- gram building is map-only JVM (``transform(sequence(...))`` +
  ``slice`` + ``md5`` inside whole-stage codegen — text never reaches
  Python);
- the only exchanged rows are ``(doc_id, pos, gram_hash)`` — never text;
  the global count is a partial-agg groupBy on the hash, and duplicated
  windows come back via a left-semi join on the same key;
- the interval merge is one window pass per document
  (gaps-and-islands: running max of span ends marks island starts).

``md5`` is the default fingerprint because it is bit-identical across
engines (the DuckDB oracle re-derives it); at the 10^13-window scale the
drop-in is ``F.xxhash64`` (8-byte long instead of a 32-char string —
pass ``hash_fn=F.xxhash64``), identical plan shape.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def _tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text — parity with the repo's
    DuckDB tokenization (__spark_entry__._TOKS_SQL)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def duplicate_ngram_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    hash_fn: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Maximal per-document token spans covered by k-token windows that
    occur ``>= min_count`` times corpus-wide.

    Returns ``(doc_id, span_start, span_end, n_windows)`` with token
    offsets (0-based, end exclusive) and the count of duplicated windows
    merged into the span.
    """
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    _tokens(F.col(text_col)).alias("_toks"))
        # short docs have no k-window (also keeps sequence() bounds sane:
        # sequence(0, negative) would generate a DESCENDING range)
        .filter(F.size("_toks") >= k)
    )
    if hash_fn is None:
        grams = F.expr(
            f"transform(sequence(0, size(_toks) - {k}),"
            f" i -> md5(concat_ws(' ', slice(_toks, i + 1, {k}))))"
        )
    else:
        grams = F.expr(
            f"transform(sequence(0, size(_toks) - {k}),"
            f" i -> concat_ws(' ', slice(_toks, i + 1, {k})))"
        )
        grams = F.transform(grams, lambda g: hash_fn(g))
    windows = toks.select("doc_id", F.posexplode(grams).alias("pos", "_h"))

    dup_hashes = (
        windows.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_h")
    )
    dup = windows.join(dup_hashes, "_h", "left_semi").select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(k)).alias("e"),
    )

    # gaps-and-islands: a window starts a new span iff it begins after the
    # running max end of everything before it (adjacent windows touch at
    # s == prev_e and merge — contiguous duplicated text is one span)
    before = (
        Window.partitionBy("doc_id").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    upto = Window.partitionBy("doc_id").orderBy("s")
    return (
        dup.withColumn("_prev_e", F.max("e").over(before))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_e").isNull() | (F.col("s") > F.col("_prev_e")),
                1,
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(upto))
        .groupBy("doc_id", "_island")
        .agg(
            F.min("s").cast("int").alias("span_start"),
            F.max("e").cast("int").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_island")
    )


def excise_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every duplicated span's tokens from each document (the
    aggressive cleaning variant: ALL occurrences go — rebuilding "keep one
    occurrence" is a policy layer over the same spans). Documents with no
    spans pass through byte-identical tokens-wise; output is
    ``(doc_id, clean_text, n_removed_tokens)``.

    JVM-only and LINEAR per document: spans collect per doc (bounded:
    they are merged maximal intervals) and, because they are disjoint,
    the kept tokens are exactly the inter-span gaps — build the gap list
    ``[(0,s1), (e1,s2), …, (ek,n)]`` over the sorted spans and take one
    ``slice`` per gap, O(tokens + spans). A per-token ``exists`` over the
    span array would be O(tokens × spans): a pathological doc alternating
    duplicated/unique k-grams has ~tokens/2 spans → quadratic.
    """
    per_doc = spans.groupBy(F.col("doc_id").alias("_sid")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("_toks")
    )
    joined = toks.join(per_doc, toks["doc_id"] == per_doc["_sid"], "left")
    sp_sorted = F.array_sort(F.col("_spans"))  # struct sort: span_start first
    gap_starts = F.concat(
        F.array(F.lit(0)),
        F.transform(sp_sorted, lambda sp: sp["span_end"]),
    )
    gap_ends = F.concat(
        F.transform(sp_sorted, lambda sp: sp["span_start"]),
        F.array(F.size("_toks")),
    )
    kept = F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
        F.flatten(
            F.zip_with(
                gap_starts,
                gap_ends,
                lambda s, e: F.slice(
                    F.col("_toks"), s + F.lit(1), F.greatest(e - s, F.lit(0))
                ),
            )
        )
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size("_toks") - F.size(kept)).cast("int").alias("n_removed_tokens"),
    )
