"""Gopher/MassiveText document-quality rules [EXTENSION — LLM-data pipeline].

The reference crawler stores pages unfiltered (cmd/crawler/main.go:345-364);
production webtext pipelines gate documents with the rule set published in
Rae et al. 2021 ("Scaling Language Models: ... Gopher", Appendix A1.1),
reused nearly verbatim by FineWeb and Dolma:

1. word count within [min_words, max_words];
2. mean word length within [3, 10] characters;
3. symbol-to-word ratio (``#`` or ``...``) below 0.1;
4. fewer than 90% of lines starting with a bullet;
5. fewer than 30% of lines ending with an ellipsis;
6. at least 80% of words containing an alphabetic character;
7. at least 2 of the 8 required English "stop words"
   (the, be, to, of, and, that, have, with) present.

This operator returns the measured value for EVERY rule plus the combined
verdict, so a pipeline can audit which rule kills a document — the
shape FineWeb ships its filter stats in.

Determinism contract (cross-engine, mirrors the repo's float protocol):
words = Java-regex ``\\s+`` split of the trimmed RAW text (rules inspect
punctuation, so no alnum normalization); lines = ``\\n`` split, and the
two line fractions are computed over NON-EMPTY trimmed lines (a document
with no non-empty lines scores 0 on both). Every ratio is one double
division of exact integer counts, rounded to 6 dp.

Scale shape: the whole operator is MAP-ONLY JVM — splits, higher-order
aggregates, and regexp predicates in one codegen span over the scan; zero
exchanges, zero Python, no skew surface (everything is per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["gopher_quality_gate", "REQUIRED_STOPWORDS"]

# Rae et al. 2021 A1.1: "contains at least two of the following: the, be,
# to, of, and, that, have, with"
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLETS = ("- ", "* ", "•")  # dash, star, U+2022 bullet


def _count_occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length differencing (JVM)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def gopher_quality_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-document Gopher rule values and the combined keep verdict.

    Returns ``(id_col, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_word_frac, n_req_stopwords, keep)``.
    """
    t = F.col(text_col)
    # empty tokens (split of '' or of stray interior whitespace forms)
    # are filtered once so every word-derived metric sees real words only
    words = F.filter(
        F.split(F.trim(t), r"\s+"), lambda w: F.length(w) > 0
    )
    n_words = F.size(words).cast("long")

    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.round(
        total_word_chars.cast("double")
        / F.greatest(n_words, F.lit(1)).cast("double"),
        6,
    )

    n_symbols = _count_occurrences(t, "#") + _count_occurrences(t, "...")
    symbol_ratio = F.round(
        n_symbols.cast("double") / F.greatest(n_words, F.lit(1)).cast("double"),
        6,
    )

    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    n_lines = F.size(lines).cast("long")
    bullet_starts = F.size(
        F.filter(
            lines,
            lambda l: F.lit(False)
            | l.startswith(_BULLETS[0])
            | l.startswith(_BULLETS[1])
            | l.startswith(_BULLETS[2]),
        )
    ).cast("long")
    ellipsis_ends = F.size(
        F.filter(
            lines,
            lambda l: l.endswith("...") | l.endswith("…"),
        )
    ).cast("long")
    bullet_frac = F.round(
        bullet_starts.cast("double")
        / F.greatest(n_lines, F.lit(1)).cast("double"),
        6,
    )
    ellipsis_frac = F.round(
        ellipsis_ends.cast("double")
        / F.greatest(n_lines, F.lit(1)).cast("double"),
        6,
    )

    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    alpha_word_frac = F.round(
        alpha_words.cast("double")
        / F.greatest(n_words, F.lit(1)).cast("double"),
        6,
    )

    lowered = F.transform(words, lambda w: F.lower(w))
    n_req = F.aggregate(
        F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS]),
        F.lit(0),
        lambda acc, s: acc
        + F.when(F.array_contains(lowered, s), 1).otherwise(0),
    ).cast("int")

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_word_frac.alias("alpha_word_frac"),
        n_req.alias("n_req_stopwords"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("bullet_frac") < 0.9)
        & (F.col("ellipsis_frac") < 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_req_stopwords") >= 2)
    )
    return out.withColumn("keep", keep)
