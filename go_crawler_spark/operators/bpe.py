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

import pandas as pd  # module-level: pandas_udf type hints resolve in module globals
from pyspark.sql import Column, DataFrame, functions as F

from go_crawler_spark.functions.text import normalize_for_fingerprint, tokens
from go_crawler_spark.operators.sequence import unpersist_local_checkpoint

__all__ = [
    "word_census",
    "learn_bpe_merges",
    "encode_words",
    "bpe_encode_docs",
]


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


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of (left, right)
    with the concatenated symbol — a JVM fold, no Python, no join."""
    a, b, ab = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        symbols,
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


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    return vocab.select(
        "word", "count", _merge_fold(F.col("symbols"), left, right).alias("symbols")
    )


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


def encode_words(
    words: DataFrame,
    merges: "list[tuple[str, str]]",
    word_col: str = "word",
    jvm_max_merges: int = 64,
) -> DataFrame:
    """Encode each (distinct) word in ``words[word_col]`` with a trained
    merge list (rank order = list order). Returns ``(word_col, pieces)``.

    Application rule: each merge is a greedy left-to-right non-overlapping
    pass, merges applied in rank order. For a merge list PRODUCED BY BPE
    TRAINING this is equivalent to the classic iterative lowest-rank-pair
    algorithm: rule r's components are each atomic or the output of a rule
    with rank < r, so once rule e's pass has run, no later merge can create
    a fresh (left_e, right_e) adjacency — a later rule's output symbol did
    not exist when rule e was learned and therefore cannot be one of its
    components. (A hand-written, non-training-order merge list can violate
    the precondition; this operator documents and assumes trained input.)

    Physical path by merge-table size:

    - ``len(merges) <= jvm_max_merges``: a CHAIN of JVM ``aggregate`` folds
      (one per merge) in a single map-only projection — no Python, no
      shuffle, the same fold the trainer uses.
    - larger tables (a real tokenizer ships 30k+ merges — a 30k-deep
      expression chain would break codegen): ONE Arrow pandas UDF applying
      the classic rank-dict algorithm per word; the rank dict ships once
      per executor in the task closure (bounded artifact, a few MB).

    Both paths are model-equivalence-tested against each other and a pure
    Python replica.
    """
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.col(word_col).substr(i, F.lit(1)),
    )
    if len(merges) <= jvm_max_merges:
        sym = chars
        for left, right in merges:
            sym = _merge_fold(sym, left, right)
        return words.select(word_col, sym.alias("pieces"))

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def _encode(col: pd.Series) -> pd.Series:
        def enc(word: str) -> list[str]:
            sym = list(word)
            while len(sym) >= 2:
                best_rank, best = None, None
                for i in range(len(sym) - 1):
                    r = ranks.get((sym[i], sym[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best = r, (sym[i], sym[i + 1])
                if best is None:
                    break
                a, b = best
                out: list[str] = []
                i = 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            return sym

        return col.map(enc)

    return words.select(word_col, _encode(F.col(word_col)).alias("pieces"))


def bpe_encode_docs(
    df: DataFrame,
    merges: "DataFrame | list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained BPE merge table. Returns one row
    per document: ``(id_col, n_words, n_pieces)`` — whitespace-word count
    and the total subword-piece count under the merges (the number a
    training-data pipeline bills against a token budget).

    Scale shape: the expensive step (merge application) runs once per
    DISTINCT word (the same census trick the trainer uses — ~10^9 rows at
    100 TB, not 10^13 token occurrences); the token stream then joins the
    per-word piece COUNT (an int, never the piece array) back on the word
    key and aggregates per document with map-side partials. Document text
    never shuffles; the word-level exchanges carry (word, int) pairs.
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("step").collect()  # bounded artifact
        ]
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                tokens(normalize_for_fingerprint(F.col(text_col)))
            ).alias("word"),
        )
        .filter(F.length("word") > 0)
    )
    # per-(doc, word) occurrence counts first: the join + doc aggregation
    # then move one row per distinct (doc, word), not per occurrence
    per_dw = toks.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("occ")
    )
    encoded = encode_words(
        per_dw.select("word").distinct(), merges
    ).select("word", F.size("pieces").alias("_np"))
    return (
        per_dw.join(encoded.hint("shuffle_hash"), "word")
        .groupBy(id_col)
        .agg(
            F.sum("occ").cast("long").alias("n_words"),
            F.sum(F.col("occ") * F.col("_np")).cast("long").alias("n_pieces"),
        )
    )
