"""TF-IDF term weighting and top-terms-per-document extraction
[EXTENSION — training-data ops]. Classic corpus statistics (Spärck Jones
1972) used in data pipelines for keyword extraction, topic sampling, and
boilerplate/template detection (terms whose tf-idf is high corpus-wide in
a single host's pages are navigation chrome).

Scale shape at 100 TB:
- term counts: one explode of normalized tokens → groupBy(doc, term) with
  map-side combine — the exchange carries (doc_id, term, count) triples,
  never text;
- document frequency: a second agg over the tf table keyed by term alone
  (vocabulary-sized output, heavy-tailed — AQE handles the skewed
  stop-term keys, and a df-floor filter drops the hapax tail early);
- scoring: tf ⋈ df on term (two already-aggregated tables), then a
  per-document window for top-k — partitioned by doc_id, no global sort.

Cross-engine exactness (DuckDB oracle hash-matches bit for bit): the
smoothed inverse document frequency is the LOG-FREE variant
idf = (N + 1) / (df + 1), so every score is ONE IEEE division of two
exact integers (tf·(N+1) and df+1, both < 2^53) — bit-identical in any
IEEE-754 engine, no transcendental whose last ulp differs between Java's
Math.log and libm. Monotone in 1/df at fixed tf, so top-k per doc ranks
the same family of terms the log variant would; the absolute scale
differs (documented operator semantics, not an approximation bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from go_crawler_spark.functions.text import normalize_for_fingerprint, tokens


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, term, tf) — per-document counts of normalized tokens.
    Empty-string tokens (blank/punct-only docs) are dropped."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens(normalize_for_fingerprint(F.col(text_col)))).alias(
                "term"
            ),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df) — number of documents containing each term, derived
    from the tf table (already one row per (doc, term))."""
    return tf.groupBy("term").agg(F.count(id_col).alias("df"))


def tfidf_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """(id_col, term, tf, df, tfidf) with tfidf = tf·(N+1)/(df+1), N =
    total documents. ``min_df`` > 1 drops the hapax tail before the join
    (at web scale most of the vocabulary occurs once — pruning it early
    shrinks the term exchange by ~half)."""
    n_docs = df.count()
    tf = term_frequencies(df, text_col, id_col)
    dfreq = doc_frequencies(tf, id_col)
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    return tf.join(dfreq, "term").select(
        id_col,
        "term",
        "tf",
        "df",
        (
            (F.col("tf") * F.lit(n_docs + 1)).cast("double")
            / (F.col("df") + 1).cast("double")
        ).alias("tfidf"),
    )


def top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Top-k terms per document by tf-idf (ties: lexicographic term) —
    (id_col, term, tfidf, term_rank). The window is partitioned by
    document, so the plan is shuffle-on-doc + per-partition heap; no
    global order anywhere."""
    scored = tfidf_scores(df, text_col, id_col, min_df)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tfidf", "term_rank")
    )
