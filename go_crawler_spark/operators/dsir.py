"""DSIR-style data selection via hashed n-gram importance weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — public paper): score every raw document by how much more
likely its n-grams are under a small TARGET corpus's bag-of-hashed-ngrams
distribution than under the raw corpus's own, then keep the top-scoring
slice. The classic use: target = curated/high-quality text, raw = a crawl
dump; the selected slice is "crawl text that reads like the target".

Reference anchor: the reference crawler has no selection stage — this is
[EXTENSION — training-data ops], same family as corpus_prep.decontaminate.

Scale shape (the whole point at 100 TB):
- feature extraction is a map-only JVM pass (token n-grams + md5 bucket
  prefix — no Python, no shuffle);
- both distributions come from ONE map-side-combined census with at most
  B = 16^bucket_hex distinct keys (4096 by default) — the reduce side is
  bounded by the bucket space, not the corpus, so it is collected and the
  weight table is derived driver-side (no second corpus scan for totals);
- the per-bucket weight table is ≤ B rows and is BROADCAST back onto the
  exploded grams, so the raw corpus is never shuffled: score assembly is
  explode → broadcast-join → per-doc partial agg. The only exchange
  carries (doc_id, bucket) pairs, never text.

Cross-engine exactness protocol (DuckDB oracle hash-matches bit for bit):
- the hash bucket is the md5 hex PREFIX as a STRING (md5 is identical in
  Spark and DuckDB; hex→int conversion is not portable — repo convention);
- the smoothed weight is a single IEEE division of two exact integers
  (counts and totals are < 2^53), so both engines produce the identical
  double: w_b = ((ct_b + 1) * (N_raw + B)) / ((cr_b + 1) * (N_tgt + B));
- per-doc scores sum those doubles as DECIMAL(38,9) (order-independent),
  round(6), cast back to double — the repo-wide float-sum protocol.

The paper scores with Σ log w and samples with Gumbel noise; this engine
exposes the deterministic variant — the per-occurrence MEAN ratio
(Σ w)/n and a top-k selection with doc_id tie-break — because a
cross-engine-verifiable pipeline cannot rank on transcendentals or RNG.
The mean, not the sum: off-target grams have w < 1 and drag the mean
down, playing the role of the paper's negative log-ratios, whereas a
plain sum of positive ratios would reward sheer length (a long junk doc
would beat a short on-target one). The estimator structure (hashed
n-gram bag distributions + per-occurrence importance ratio) is the
paper's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from go_crawler_spark.functions.text import token_ngrams

DEFAULT_BUCKET_HEX = 3  # md5 prefix length → B = 16^3 = 4096 buckets


def gram_buckets(
    text_col, n: int = 2, bucket_hex: int = DEFAULT_BUCKET_HEX
):
    """Array of hashed n-gram bucket keys (md5 hex prefixes) for one text
    column. Pure JVM: transform over the shingle array — no Python."""
    return F.transform(
        token_ngrams(text_col, n=n),
        lambda g: F.substring(F.md5(g), 1, bucket_hex),
    )


def dsir_scores(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bucket_hex: int = DEFAULT_BUCKET_HEX,
) -> DataFrame:
    """Per-document importance scores: (id_col, n_grams, score).

    ``target_pred`` is a boolean Column selecting the target slice of
    ``df`` (e.g. ``F.col("lang") == "en"``). score = the per-occurrence
    mean importance ratio round(Σ_g w_bucket(g), 6) / n_grams over the
    document's n-gram occurrences (exact decimal sum, then one IEEE
    division); docs with no grams score 0.0. Deterministic and
    engine-exact (see module docstring).
    """
    b_space = 16 ** bucket_hex

    grams = df.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode_outer(gram_buckets(F.col(text_col), n, bucket_hex)).alias(
            "bucket"
        ),
    )
    # one pass over the corpus feeds BOTH distributions (target ⊆ raw):
    # ≤ B result rows, map-side combined. COLLECTED: the bucket census is
    # bounded by the bucket space (4096 rows of 3 scalars), so totals and
    # the weight table are derived driver-side from the one collected
    # census instead of re-running the gram extraction for each (the
    # corpus is scanned exactly twice per evaluation: this census + the
    # final score assembly — nothing is left persisted)
    census = (
        grams.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cr"),
            F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("ct"),
        )
        .collect()
    )
    n_raw = sum(int(r["cr"]) for r in census)
    n_tgt = sum(int(r["ct"]) for r in census)

    # smoothed per-occurrence importance ratio; ONE IEEE division of exact
    # integers (< 2^53) — bit-identical in any engine (python float
    # division IS IEEE double division, same as Spark's / on doubles)
    weights = df.sparkSession.createDataFrame(
        [
            (
                r["bucket"],
                ((int(r["ct"]) + 1) * (n_raw + b_space))
                / ((int(r["cr"]) + 1) * (n_tgt + b_space)),
            )
            for r in census
        ],
        "bucket string, w double",
    )

    scored = (
        grams.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("bucket").isNotNull(), 1).otherwise(0)).alias(
                "n_grams"
            ),
            F.round(
                F.coalesce(
                    F.sum(F.col("w").cast("decimal(38,9)")),
                    F.lit(0).cast("decimal(38,9)"),
                ),
                6,
            )
            .cast("double")
            .alias("_sum_w"),
        )
    )
    return scored.select(
        id_col,
        "n_grams",
        F.when(
            F.col("n_grams") > 0,
            F.col("_sum_w") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
    )


def dsir_select(
    df: DataFrame,
    target_pred,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bucket_hex: int = DEFAULT_BUCKET_HEX,
) -> DataFrame:
    """Top-k selection by importance score (ties broken by id_col) —
    the deterministic analogue of the paper's Gumbel-top-k resampling.
    Returns (id_col, n_grams, score, seq) with seq = 0..k-1 in selection
    order.

    Scale shape: the ranking runs on the SCORES table (one row per doc —
    3 scalars, never the text) through :func:`priority_schedule`'s
    range-partitioned two-pass top-k, so no single task ever merges the
    global order (a TakeOrderedAndProject would). Callers re-join the
    winners to the corpus by id — broadcast when k is small.
    """
    from go_crawler_spark.operators.sequence import priority_schedule

    scores = dsir_scores(df, target_pred, text_col, id_col, n, bucket_hex)
    # priority_schedule orders ascending: negate for score-descending
    ranked = priority_schedule(
        scores.withColumn("_neg_score", -F.col("score")),
        ["_neg_score", id_col],
        k=k,
    )
    return ranked.drop("_neg_score")


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bucket_hex: int = DEFAULT_BUCKET_HEX,
    k: int = 50,
) -> DataFrame:
    """Corpus drift monitor [EXTENSION — training-data ops]: the top-``k``
    hashed-n-gram buckets by contribution to the total-variation distance
    between two corpus snapshots' bag-of-ngrams distributions — the
    recrawl-QA question "did the web (or the crawler) shift under us?".

    Output (bucket, n_a, n_b, drift_num, rank): drift_num =
    |n_a·N_b − n_b·N_a| is the bucket's UNNORMALIZED TV contribution as an
    exact integer (TV distance itself = Σ drift_num / (2·N_a·N_b));
    comparing integers sidesteps every cross-engine float trap, and the
    ranking is identical to ranking by |p_a − p_b|.

    Scale shape: each corpus contributes ONE bounded bucket census
    (≤ 16^bucket_hex rows, map-side combined — same shape as
    :func:`dsir_scores`); both censuses are collected and the whole drift
    computation runs driver-side on exact ints (two corpus scans total, no
    join, nothing persisted). The python-side math is arbitrary-precision;
    the int64 output column is runtime-guarded — drift_num ≥ 2^63 (reached
    around 10^9+ grams per side at default bucket width) raises with the
    remediation instead of wrapping silently.
    """

    def census(df: DataFrame) -> dict:
        rows = (
            df.select(
                F.explode(gram_buckets(F.col(text_col), n, bucket_hex)).alias(
                    "bucket"
                )
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        return {r["bucket"]: int(r["c"]) for r in rows}

    ca, cb = census(a), census(b)
    return a.sparkSession.createDataFrame(
        drift_topk_rows(ca, cb, k),
        "bucket string, n_a long, n_b long, drift_num long, rank long",
    )


def drift_topk_rows(ca: dict, cb: dict, k: int) -> list:
    """Driver-side exact-integer drift ranking (see
    :func:`distribution_drift`). Python ints never overflow; the guard
    protects the int64 column the result is published through."""
    na, nb = sum(ca.values()), sum(cb.values())
    drift = sorted(
        (
            (bk, ca.get(bk, 0), cb.get(bk, 0),
             abs(ca.get(bk, 0) * nb - cb.get(bk, 0) * na))
            for bk in set(ca) | set(cb)
        ),
        key=lambda t: (-t[3], t[0]),
    )[:k]
    if drift and drift[0][3] >= 1 << 63:
        raise OverflowError(
            "distribution_drift: drift_num "
            f"{drift[0][3]} exceeds int64 (N_a={na}, N_b={nb}); "
            "rank fewer grams per side (raise n / lower bucket_hex), "
            "census a sample, or publish through a decimal(38,0) column"
        )
    return [(bk, x, y, d, i + 1) for i, (bk, x, y, d) in enumerate(drift)]
