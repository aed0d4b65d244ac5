"""CCNet-style language-model perplexity filtering (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data").

CCNet's defining quality step scores every document with a language model
trained on a trusted reference corpus and buckets the corpus into
head/middle/tail by score percentile; downstream LLM pipelines keep head
(+middle). The public pipeline uses a KenLM 5-gram; this implementation
uses an add-one-smoothed bigram LM so the whole computation stays in
exact integer counts + one log per token — every stage is expressible in
Spark built-ins (JVM codegen, no Python in the hot path) and in ANSI SQL
for the DuckDB oracle.

Model: p(w_i | w_{i-1}) = (C(w_{i-1} w_i) + 1) / (C(w_{i-1}) + V + 1)
with counts from the reference slice and V = |reference vocabulary|.
Document score = mean negative log-probability over its bigrams (higher
= worse = less like the reference). Bigram counts below ``min_count``
are pruned — standard LM practice, and at 100 TB it is what bounds the
count table to a broadcastable size.

100-TB shape:
- LM training is a token-level exchange only (same volume class as
  tf-idf): explode → groupBy(w1,w2) with map-side partial aggregation;
  document text never shuffles.
- Scoring is explode → TWO broadcast hash joins (bigram + unigram count
  tables; ``broadcast_counts=False`` degrades to shuffle-hash when a
  giant vocabulary outgrows the driver) → groupBy(doc_id) of
  (doc_id, decimal) pairs with map-side combine. No global sort.
- Bucketing is a map-side CASE against FIXED thresholds, exactly like
  CCNet's precomputed per-language cutoffs — a global ntile would
  single-task the corpus. ``score_thresholds`` computes cutoffs
  separately (approx_percentile by default at scale; exact percentile
  for oracle-deterministic tests).

Cross-engine float protocol (see SURVEY §6): per-token log-prob is
ln(int) - ln(int) rounded to 9 dp into DECIMAL(38,9); the per-document
sum is exact decimal; the mean is one double division rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from go_crawler_spark.functions.text import normalize_for_fingerprint, tokens

HEAD, MIDDLE, TAIL = "head", "middle", "tail"


def _norm_tokens(text_col: Column) -> Column:
    """Normalized token array; blank docs yield [''] (filtered later)."""
    return tokens(normalize_for_fingerprint(text_col))


def _bigram_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id_col, w1, w2) — one row per adjacent token pair. Guard size>=2
    BEFORE sequence(): sequence(0, -1) silently descends. The else
    branch builds a TYPED empty array (transform over an empty slice)
    so both when-branches agree on array<struct<w1,w2>>."""
    pairs = F.when(
        F.size(F.col("__t")) >= 2,
        F.expr(
            "transform(sequence(0, size(__t) - 2),"
            " i -> struct(__t[i] AS w1, __t[i + 1] AS w2))"
        ),
    ).otherwise(
        F.expr("transform(slice(__t, 1, 0), x -> struct(x AS w1, x AS w2))")
    )
    return (
        df.select(F.col(id_col), _norm_tokens(F.col(text_col)).alias("__t"))
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


def lm_counts(
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame, int]:
    """Train the bigram LM on the reference corpus.

    Returns (bigram_counts (w1, w2, c2), unigram_counts (w1, c1),
    vocab_size). Bigrams below ``min_count`` are pruned (bounds the
    broadcast); unigrams are kept in full — they are the denominators
    and the vocabulary census, and their cardinality is the token-type
    count, inherently far smaller than the bigram table."""
    uni = (
        reference.select(
            F.explode(_norm_tokens(F.col(text_col))).alias("w1")
        )
        .filter(F.col("w1") != "")
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
        # persisted: the vocab census below and the caller's scoring join
        # share this frame — without it the token explode runs twice
        .persist()
    )
    big = (
        _bigram_pairs(reference, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    vocab_size = uni.count()
    return big, uni, vocab_size


def perplexity_scores(
    docs: DataFrame,
    bigram_counts: DataFrame,
    unigram_counts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_counts: bool = True,
) -> DataFrame:
    """(id_col, n_bigrams, avg_neg_logp) for every document with at
    least one bigram. avg_neg_logp is the mean -ln p(w_i|w_{i-1});
    higher = less reference-like (CCNet's per-doc perplexity proxy)."""
    big = F.broadcast(bigram_counts) if broadcast_counts else bigram_counts
    uni = F.broadcast(unigram_counts) if broadcast_counts else unigram_counts
    pairs = _bigram_pairs(docs, text_col, id_col)
    denom_add = vocab_size + 1  # +1: the add-one slot for OOV
    logp = F.round(
        F.log(F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
        - F.log(F.coalesce(F.col("c1"), F.lit(0)) + F.lit(denom_add)),
        9,
    ).cast("decimal(38,9)")
    return (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .select(id_col, logp.alias("logp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("logp").alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                -F.col("_s").cast("double") / F.col("n_bigrams").cast("double"),
                6,
            ).alias("avg_neg_logp"),
        )
    )


def score_thresholds(
    scored: DataFrame,
    score_col: str = "avg_neg_logp",
    probs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = False,
) -> tuple[float, float]:
    """Head/middle cutoffs from the score distribution. Default is
    approx_percentile (sketch aggregate — the 100-TB path); ``exact``
    uses the exact percentile aggregate (counts-map state, fine at test
    scale, deterministic for oracles). Thresholds are rounded to 6 dp —
    the same grid the scores live on."""
    fn = "percentile" if exact else "approx_percentile"
    row = scored.select(
        F.expr(
            f"{fn}({score_col}, array(CAST({probs[0]!r} AS DOUBLE),"
            f" CAST({probs[1]!r} AS DOUBLE)))"
        ).alias("t")
    ).first()
    return round(row["t"][0], 6), round(row["t"][1], 6)


def bucket_by_thresholds(
    scored: DataFrame,
    head_max: float,
    middle_max: float,
    score_col: str = "avg_neg_logp",
) -> DataFrame:
    """Map-side CASE bucketing against fixed cutoffs (CCNet ships
    precomputed per-language thresholds for exactly this reason — a
    global ntile would funnel the corpus through one task)."""
    s = F.col(score_col)
    return scored.withColumn(
        "bucket",
        F.when(s <= F.lit(head_max), HEAD)
        .when(s <= F.lit(middle_max), MIDDLE)
        .otherwise(TAIL),
    )
