"""Distributed BPE merge training [EXTENSION — LLM-data pipeline].

The repo already APPLIES a BPE-ish tokenizer (``functions/text.py``,
``bpe_token_counts``); this operator TRAINS one — byte-pair-encoding
merge induction (Sennrich et al. 2016, the exact algorithm behind the
GPT-2/RoBERTa vocabularies), re-expressed as the corpus-scale job it
really is:

1. ONE pass over the corpus builds the distinct-word census
   ``(word, count)`` — the only stage that ever touches document text.
2. Each of the ``n_merges`` rounds counts adjacent symbol pairs over the
   census (weighted by word count, overlapping occurrences counted —
   Sennrich's ``get_stats``), picks the globally most frequent pair, and
   rewrites every word's symbol sequence by greedy left-to-right
   non-overlapping replacement (Sennrich's ``merge_vocab``).

Scale shape:
- The corpus is read once; every iteration runs over the *distinct-word*
  table — at 100 TB that is ~10^9 rows of short arrays, not 10^13
  documents.
- Pair counting is explode → two-phase sum keyed on the pair (map-side
  partials); the exchange carries (pair, count) — bounded by the
  distinct-pair space, never the corpus.
- The argmax is ``orderBy(...).limit(1)`` — per-partition top-1s reduced
  once; ties broken (count DESC, left ASC, right ASC) so the learned
  merge table is deterministic under any partitioning.
- The merge rewrite is a JVM ``aggregate`` fold per word — map-only; the
  chosen pair ships as two literals, not a join.
- Lineage is truncated every round with an eager localCheckpoint (the
  same pattern as the PageRank/HITS iterations); the previous round's
  checkpoint is freed as soon as the next is materialized.

The independent oracle is a pure-Python replica (tools/gen_fixtures.py,
``gen_bpe_merges``) committed as fixture parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from go_crawler_spark.functions.text import normalize_for_fingerprint, tokens
from go_crawler_spark.operators.sequence import unpersist_local_checkpoint

__all__ = ["word_census", "learn_bpe_merges"]


def word_census(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The one corpus-touching stage: distinct normalized words with
    corpus frequencies, each split into its initial character symbols."""
    w = (
        df.select(
            F.explode(
                tokens(normalize_for_fingerprint(F.col(text_col)))
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )
    return w.select(
        "word",
        "count",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ).alias("symbols"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.when(
        F.size("symbols") >= 2,
        F.transform(
            # guard: sequence(1, 0) would be the DESCENDING [1, 0]
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at("symbols", i).alias("left"),
                F.element_at("symbols", i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        vocab.select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("count").cast("long").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right non-overlapping replacement of (left, right)
    with the concatenated symbol — a JVM fold, no Python, no join."""
    a, b, ab = F.lit(left), F.lit(right), F.lit(left + right)
    merged = F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (s == b),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab)
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.select("word", "count", merged.alias("symbols"))


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 12,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    table ``(step, left, right, merged, pair_count)`` in learning order —
    the artifact a tokenizer ships. Stops early if no adjacent pair
    remains (fully merged vocabulary)."""
    spark = df.sparkSession
    vocab = word_census(df, text_col, id_col).localCheckpoint(eager=True)
    rows = []
    prev = vocab
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("pair_count"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        t = top[0]
        rows.append(
            (step, t["left"], t["right"], t["left"] + t["right"],
             t["pair_count"])
        )
        vocab = _apply_merge(vocab, t["left"], t["right"]).localCheckpoint(
            eager=True
        )
        unpersist_local_checkpoint(prev)
        prev = vocab
    # the merge table below is a local DataFrame; nothing references the
    # final vocabulary checkpoint — free it before returning
    unpersist_local_checkpoint(vocab)
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string,"
        " pair_count long"
    )
