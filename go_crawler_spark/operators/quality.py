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


# ---------------------------------------------------------------------------
# hashed-feature linear quality model (fastText-style scoring)
# ---------------------------------------------------------------------------

HEX_CHARS = "0123456789abcdef"


def _hashed_weight(tok):
    """Deterministic integer weight in [-128, 127] for a token: the first
    two hex chars of md5(token), decoded through a 16-char lookup (the
    repo's established md5-hex string protocol — never a wide hex→int
    cast) and centered. Stands in for a trained embedding row; the
    LOOKUP SHAPE (hash token → fixed weight, no vocabulary join) is the
    real thing production quality classifiers (fastText; the GPT-3 /
    LLaMA quality filters built on it) run at corpus scale."""
    h = F.md5(tok)
    hi = F.instr(F.lit(HEX_CHARS), F.substring(h, 1, 1)) - 1
    lo = F.instr(F.lit(HEX_CHARS), F.substring(h, 2, 1)) - 1
    return (hi * 16 + lo - 128).cast("long")


def linear_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: "tuple[str, ...]" = (),
) -> DataFrame:
    """Score every document with a hashed-bag-of-words linear model —
    the fastText classifier architecture (Joulin et al. 2016) that
    CCNet/GPT-3-style pipelines use as the learned quality gate, with
    the trained weight table replaced by a deterministic hash-derived
    one (see ``_hashed_weight``) so a DuckDB oracle can replay it
    exactly.

    score(doc) = Σ_tokens w(token)   (exact int64)
    mean_w     = round(score / n_tokens, 6)   (the classifier logit)
    label      = mean_w > 0

    Scale shape: map-only — tokenization, per-token weight, and the sum
    all run inside one JVM higher-order-function pass per row; no
    explode, no shuffle, no Python. At 100 TB this is the cheapest class
    of operator the engine has (pure scan + codegen), which is exactly
    why production pipelines can afford to score EVERY crawled page."""
    toks = tokens(normalize_for_fingerprint(F.col(text_col)))
    score = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + _hashed_weight(t),
    )
    n = F.size(toks)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.when(F.length(F.concat_ws("", toks)) == 0, F.lit(0).cast("long"))
        .otherwise(score)
        .alias("score"),
        F.when(F.length(F.concat_ws("", toks)) == 0, F.lit(0).cast("long"))
        .otherwise(n.cast("long"))
        .alias("n_tokens"),
    ).select(
        id_col,
        *passthrough,
        "score",
        "n_tokens",
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.col("score") / F.col("n_tokens")
            ),
            6,
        ).alias("mean_w"),
        (
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.col("score") / F.col("n_tokens")
            )
            > 0
        ).alias("label"),
    )


def word_blocklist_gate(
    df: DataFrame,
    blocklist: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_flagged: int = 0,
) -> DataFrame:
    """C4-style content word-blocklist gate (Raffel et al. 2020, §2.2:
    drop any page containing a word from a public blocklist; Dolma and
    FineWeb run the same gate with a count/fraction threshold). The
    word list is the CALLER's policy input — the operator ships no list.

    Per document over the normalized token stream (the same
    normalization the dedup fingerprints and BM25 use):

    - ``n_flagged``    — tokens that are in the blocklist (occurrence
      count, not distinct)
    - ``flagged_frac`` — n_flagged / n_tokens rounded to 6 dp (0.0 for
      empty docs)
    - ``keep``         — ``n_flagged <= max_flagged`` (C4's rule is the
      default ``max_flagged=0``: any hit drops the page)

    Scale shape: map-only — the blocklist enters as ONE literal array
    and the count is a JVM ``filter``+``size`` over each row's tokens
    inside whole-stage codegen; no explode, no shuffle, no Python. Cost
    is O(tokens · |blocklist|) per row, the right trade for real lists
    (LDNOOBW-class, ~10² words); a 10⁵-word list would instead
    broadcast-join the distinct-token census and join counts back —
    same output contract, so callers can swap without downstream
    changes.
    """
    bl = F.array(*[F.lit(w) for w in blocklist]) if blocklist else F.array()
    toks = tokens(normalize_for_fingerprint(F.col(text_col)))
    nonblank = F.filter(toks, lambda t: F.length(t) > 0)
    flagged = F.size(F.filter(nonblank, lambda t: F.array_contains(bl, t)))
    n = F.size(nonblank)
    return df.select(
        F.col(id_col),
        flagged.cast("int").alias("n_flagged"),
        n.cast("int").alias("n_tokens"),
    ).select(
        id_col,
        "n_flagged",
        "n_tokens",
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.col("n_flagged") / F.col("n_tokens")
            ),
            6,
        ).alias("flagged_frac"),
        (F.col("n_flagged") <= F.lit(max_flagged)).alias("keep"),
    )


def domain_quality_gate(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_mean_w: float = 0.0,
    min_docs: int = 1,
) -> DataFrame:
    """Domain-level quality gating — the source-level filter
    RefinedWeb/FineWeb/Gopher apply ABOVE the per-document gates: a
    domain whose aggregate quality is poor is dropped wholesale, docs
    and all (junk farms rarely host one good page; per-doc filters leak
    their tail).

    The domain statistic is the TOKEN-WEIGHTED mean of the hashed-linear
    model logit (:func:`linear_quality_score`):

        domain_mean_w = round(Σ_docs score / Σ_docs n_tokens, 6)

    i.e. the per-token mean weight over the domain's whole token stream.
    Both sums are exact int64, so the statistic is engine-exact; a
    domain of only-empty docs gets 0.0. ``keep`` = ``domain_mean_w >
    min_mean_w AND domain_doc_count >= min_docs`` (low-evidence domains
    can be deferred rather than judged by setting ``min_docs``).

    Returns one row per input document: ``(id_col, domain_col,
    domain_mean_w, domain_docs, keep)``.

    Scale shape: per-doc scoring is the map-only linear pass; the domain
    census is one groupBy exchanging ``(domain, int64, int64, int64)``
    partials (map-side combined — one row per distinct domain per task);
    the verdict joins back on the domain key, a table bounded by the
    domain count (~10^7 at web scale vs 10^10 docs — AQE broadcasts it
    when it fits). Document text never shuffles.
    """
    scored = linear_quality_score(
        df, text_col=text_col, id_col=id_col, passthrough=(domain_col,)
    )
    census = scored.groupBy(domain_col).agg(
        F.sum("score").alias("_dscore"),
        F.sum("n_tokens").alias("_dtokens"),
        F.count(F.lit(1)).alias("domain_docs"),
    )
    verdictc = F.round(
        F.when(F.col("_dtokens") == 0, F.lit(0.0)).otherwise(
            F.col("_dscore") / F.col("_dtokens")
        ),
        6,
    )
    verdicts = census.select(
        domain_col,
        verdictc.alias("domain_mean_w"),
        "domain_docs",
        (
            (verdictc > F.lit(min_mean_w))
            & (F.col("domain_docs") >= F.lit(min_docs))
        ).alias("keep"),
    )
    return scored.select(id_col, domain_col).join(
        verdicts, domain_col, "left"
    ).select(id_col, domain_col, "domain_mean_w", "domain_docs", "keep")
