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

__all__ = ["inverted_index", "bm25_topk", "rrf_fuse"]


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


def bm25_topk(
    df: DataFrame,
    query_terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """BM25 retrieval over the normalized token stream (Robertson/Spärck
    Jones probabilistic ranking, the Lucene-default scoring function —
    the candidate-generation tier in front of embedding rerank).

    Per query term t and document d:

        idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)      [Lucene form]
        score(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Returns the ``top_n`` documents by total score:
    ``(id_col, n_hit_terms, score)``, fully tie-broken
    (score DESC, id ASC) so the slice is deterministic.

    Scale shape:
    - The token explode is filtered to the QUERY TERMS immediately (the
      bounded query set ships as an ``isin`` literal list), so the tf
      exchange carries only matching (doc, term) rows — a vanishing
      fraction of the corpus.
    - Document lengths are a map-side count aggregate (id-keyed, uniform).
    - df/avgdl/N are one bounded aggregate collected to the driver
      (|query_terms| + 2 numbers) and re-enter as literals — no join.
    - The final top-n is a per-partition TakeOrdered merge (Spark's
      orderBy+limit), never a global sort materialization.

    Cross-engine float protocol (SURVEY §6): per-(doc, term) contributions
    are rounded to 9 dp into DECIMAL(38,9) and summed exactly; the final
    score is rounded to 6 dp.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(normalize_for_fingerprint(F.col(text_col)))
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_t")).select(
        "_id",
        F.size(F.filter("_t", lambda w: F.length(w) > 0)).alias("dl"),
        F.explode("_t").alias("term"),
    )
    hits = base.filter(F.col("term").isin(list(query_terms)))
    tf = hits.groupBy("_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )

    # bounded censuses: N docs with >=1 token, total token count, per-term df
    gstats = df.select(
        F.col(id_col).alias("_id"), toks.alias("_t")
    ).select(
        "_id", F.size(F.filter("_t", lambda w: F.length(w) > 0)).alias("dl")
    ).filter(F.col("dl") > 0).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).first()
    n_docs, total_tokens = int(gstats["n"]), int(gstats["total"])
    if n_docs == 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, n_hit_terms int, score double"
        )
    avgdl = total_tokens / n_docs
    dfs = {
        r["term"]: int(r["c"])
        for r in tf.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    import math

    idf = {
        t: round(
            math.log((n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0),
            9,
        )
        for t in query_terms
    }
    idf_map = F.create_map(
        *[x for t in query_terms for x in (F.lit(t), F.lit(idf[t]))]
    )
    contrib = F.round(
        idf_map[F.col("term")]
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        9,
    ).cast("decimal(38,9)")
    return (
        tf.select("_id", contrib.alias("_c"))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
            F.sum("_c").alias("_s"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_hit_terms",
            F.round(F.col("_s").cast("double"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_n)
    )


def rrf_fuse(
    tiers: "dict[str, DataFrame]",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of ranked
    retrieval tiers — the standard way a hybrid search stack combines the
    BM25 (lexical) and embedding (semantic) candidate lists without score
    calibration:

        rrf(d) = Σ_tiers 1 / (k0 + rank_tier(d))        [k0 = 60]

    ``tiers`` maps tier name → a DataFrame of ``(id_col, rank_col)`` with
    ranks 1-based and unique per tier (each tier's own deterministic
    tie-break already applied). Returns one row per document appearing in
    ANY tier: ``(id_col, <name>_rank ... one int column per tier,
    rrf_score)``, ordered ``rrf_score DESC, id ASC``, limited to
    ``top_n``.

    Scale shape: the inputs are already top-N candidate lists (bounded by
    construction — BM25's TakeOrdered, ANN's per-query window), so the
    fusion exchanges only |tiers|·N ``(id, tier, rank)`` triples into one
    id-keyed aggregate; no document text, no vectors, no join back to the
    corpus. Adding a tier is one more unionByName branch, not a wider
    join. Cross-engine float protocol (SURVEY §6): per-tier contributions
    ``1/(k0+rank)`` are rounded to 9 dp into DECIMAL(38,9), summed
    exactly, final score rounded to 6 dp.
    """
    if not tiers:
        raise ValueError("tiers must be non-empty")
    tagged = None
    for name, df in tiers.items():
        part = df.select(
            F.col(id_col).alias("_id"),
            F.lit(name).alias("_tier"),
            F.col(rank_col).cast("int").alias("_rank"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    contrib = F.round(F.lit(1.0) / (F.lit(k0) + F.col("_rank")), 9).cast(
        "decimal(38,9)"
    )
    per_tier = [
        F.min(F.when(F.col("_tier") == name, F.col("_rank")))
        .cast("int")
        .alias(f"{name}_rank")
        for name in tiers
    ]
    return (
        tagged.groupBy("_id")
        .agg(*per_tier, F.sum(contrib).alias("_s"))
        .select(
            F.col("_id").alias(id_col),
            *[f"{name}_rank" for name in tiers],
            F.round(F.col("_s").cast("double"), 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(top_n)
    )
