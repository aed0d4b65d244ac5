"""Corpus-preparation operators for training-data pipelines: chunk-level
(CCNet-style) dedup, benchmark decontamination, deterministic hash splits,
sequence packing, and temperature-based source mixing.

These extend the reference engine (whose text layer stops at HTML text
extraction, internal/pageparser.go) with the operations a 100 TB webtext
corpus needs between "crawled" and "trainable". All of them are pure JVM
``pyspark.sql.functions`` plans — no Python UDFs anywhere — and each has an
exact DuckDB oracle in ``__spark_entry__.oracle_sql``.

Public-knowledge provenance: CCNet paragraph-hash dedup (Wenzek et al.
2020, "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"), n-gram decontamination (Brown et al. 2020 GPT-3 appendix C),
temperature-based source sampling (Arivazhagan et al. 2019, multilingual
NMT), and fixed-length sequence packing as used by every LLM data loader.

Scale shapes (the part that matters at 100 TB):

- ``chunk_dedup``: the corpus-wide duplicate-chunk census shuffles ONLY
  8-byte xxhash64 fingerprints + doc ids — never text. Removed-chunk
  indices (a tiny per-doc int array) are joined back to the full table and
  the clean text is re-cut map-side from the original column, so document
  bytes cross no exchange at all.
- ``decontaminate``: the benchmark n-gram set is aggregated (distinct,
  hash-only) and broadcast; contamination is a broadcast semi-join on the
  gram hash followed by a broadcast anti-join of the matched doc ids —
  the 100 TB side is never shuffled.
- ``hash_split``: stateless map-only expression (md5-hex band compare);
  any executor can evaluate it independently, so the split is stable
  across reruns, partitionings, and cluster sizes.
- ``pack_sequences``: packing is windowed *within a source shard*
  (`partitionBy(source)`) — embarrassingly parallel across shards, which
  is how real loaders pack anyway; no global ordering is ever required.
- ``source_mix_weights``: two-phase aggregate to one row per source (a
  few thousand at web scale), then a tiny single-partition normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from go_crawler_spark.functions.text import (
    _bound_once,
    normalize_for_fingerprint,
    token_ngrams,
    tokens,
    word_token_count,
)

CHUNK_TOKENS = 12  # CCNet uses paragraphs; word-soup test docs have no
# newlines, so the deterministic analog is fixed 12-token windows


def token_chunks(col, size: int = CHUNK_TOKENS):
    """Non-overlapping ``size``-token windows over the normalized token
    stream, as an array of strings; [] for empty text. JVM-only
    (sequence + slice + concat_ws), normalization evaluated once/row."""
    return _bound_once(
        tokens(normalize_for_fingerprint(col)),
        lambda toks: F.when(
            F.length(F.concat_ws("", toks)) == 0, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.floor((F.size(toks) + (size - 1)) / size).cast("int"),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, (i - F.lit(1)) * size + 1, size)
                ),
            )
        ),
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = CHUNK_TOKENS,
    broadcast_removed: bool = True,
) -> DataFrame:
    """CCNet-style duplicated-chunk removal: cut every document into
    ``chunk_size``-token windows, census them corpus-wide, and delete every
    window that appears in ≥2 distinct documents. Returns
    ``(id_col, clean_text, n_chunks, n_removed)`` — row-preserving (a doc
    whose every chunk is boilerplate survives with empty clean_text).

    Plan: explode (id, idx, xxhash64(chunk)) → distinct → two-phase count
    per fingerprint → filter df≥2 → semi-join the exploded index table →
    collect removed idx per doc (tiny rows) → join back to the original
    table and re-cut the text map-side, keeping only surviving windows.
    Document bytes never enter an exchange; the exploded joins carry
    (8-byte hash, id, idx) triples only.

    ``broadcast_removed`` controls the final join-back: True (default)
    broadcasts the per-doc removed-index table so the big table is read
    map-side only — right whenever docs-with-a-duplicated-chunk fit in a
    broadcast (CCNet keeps its dup-hash set in memory the same way). When
    the removed set itself is too big (boilerplate-heavy crawl at full
    scale), pass False for a shuffle-hash join on the id — the text then
    crosses one exchange, the same cost class as the fetch join's
    large-round fallback (operators/fetch.py) and best served by
    storage-partitioning both tables on the id.
    """
    chunks = token_chunks(F.col(text_col), chunk_size)
    idx_fp = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("idx", "chunk"),
    ).select(id_col, "idx", F.xxhash64("chunk").alias("fp"))

    dup_fps = (
        idx_fp.select(id_col, "fp")
        .distinct()  # per-doc repeats count once toward document frequency
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("fp")
    )
    removed = (
        idx_fp.join(dup_fps, "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("idx")).alias("removed_idx"))
    )

    if broadcast_removed:
        removed = F.broadcast(removed)
    else:
        removed = removed.hint("shuffle_hash")
    out = df.join(removed, id_col, "left")
    rm = F.coalesce(
        F.col("removed_idx"), F.array().cast("array<int>")
    )
    kept = F.filter(
        chunks, lambda c, i: ~F.array_contains(rm, i.cast("int"))
    )
    return out.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size(chunks).alias("n_chunks"),
        F.size(rm).alias("n_removed"),
    )


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Drop every corpus document that shares a token ``ngram``-gram with
    any benchmark document (GPT-3-style test-set decontamination).
    ``bench_df`` needs the same ``text_col``. Returns the surviving rows of
    ``df`` unchanged.

    Plan: the benchmark gram set (distinct xxhash64) is tiny relative to
    the corpus → broadcast; corpus grams explode to (id, hash) and
    broadcast-semi-join; the contaminated id set (≤ #docs, usually ≪) is
    broadcast-anti-joined back. The 100 TB side is never shuffled — both
    joins stream map-side against broadcast tables.
    """
    grams = token_ngrams(F.col(text_col), ngram)
    bench_grams = (
        bench_df.select(F.explode(grams).alias("g"))
        .select(F.xxhash64("g").alias("gfp"))
        .distinct()
    )
    contaminated = (
        df.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.xxhash64("g").alias("gfp"))
        .join(F.broadcast(bench_grams), "gfp", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(F.broadcast(contaminated), id_col, "left_anti")


# md5-hex first-character bands: 16 equiprobable buckets (md5 is uniform),
# compared lexicographically so the same expression runs in any SQL engine.
SPLIT_BANDS = (("train", "0", "c"), ("val", "c", "e"), ("test", "e", "g"))


def hash_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment (12/2/2 sixteenths) from
    ``md5(cast(id))`` — stateless and map-only, so membership is stable
    under reruns, repartitioning, and incremental corpus growth (a doc's
    split never depends on other rows). Adds a ``split`` column."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    expr = F.lit(None).cast("string")
    for name, lo, hi in reversed(SPLIT_BANDS):
        expr = F.when((h >= lo) & (h < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def sample_threshold_hex(rate: float, digits: int = 8) -> str:
    """Zero-padded hex threshold such that ``substr(md5(x), 1, digits) <
    threshold`` keeps an (asymptotically) ``rate`` fraction of uniformly
    hashed inputs. Hex strings of equal length compare like the numbers
    they encode, so the comparison stays a pure string op — exact and
    identical across engines (no hex→int conversion, which DuckDB and
    Spark spell differently). ``rate ≥ 1`` has no same-length threshold
    (callers keep everything without comparing)."""
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0,1), got {rate}")
    return format(int(rate * (16 ** digits)), f"0{digits}x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the materialization step
    for ``source_mix_weights``: given target keep-rates per stratum
    (language / source / quality bucket), keep a row iff its salted md5
    band falls under the stratum's threshold.

    Same scale properties as ``hash_split``: stateless and map-only (a
    row's verdict depends only on its own id + stratum), so membership is
    stable under reruns, repartitioning, incremental corpus growth, and
    cluster size — re-running the sampler on a grown corpus only ADDS
    rows. The salt decorrelates the sample from the train/val/test split
    (which hashes the unsalted id), so sampling is independent of split
    assignment. No shuffle, no Python, whole-stage codegen throughout.
    """
    band = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8
    )

    def rate_cond(rate: float):
        if rate >= 1.0:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return band < F.lit(sample_threshold_hex(rate))

    keep = rate_cond(default_rate)
    for stratum, rate in sorted(rates.items()):
        keep = F.when(F.col(strata_col) == stratum, rate_cond(rate)).otherwise(keep)
    return df.filter(keep)


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    seq_len: int = 256,
) -> DataFrame:
    """Assign documents to fixed-budget training sequences: within each
    source shard, in deterministic ``id_col`` order, documents fill bins of
    ``seq_len`` (BPE-ish) tokens — bin = floor(tokens-before-this-doc /
    seq_len), the streaming-cumsum packing every LLM loader uses. Returns
    one row per (source, bin) with document and token counts.

    The window partitions by source shard, so packing parallelizes across
    shards with one shuffle on (source) and no global sort. At 100 TB a
    source shard is still bounded (re-shard upstream if a single source
    dominates — the same skew answer as the politeness salt)."""
    n_tok = word_token_count(F.col(text_col))
    w = Window.partitionBy(source_col).orderBy(id_col)
    cum = F.sum("n_tok").over(w)
    packed = df.select(
        F.col(source_col), F.col(id_col), n_tok.alias("n_tok")
    ).select(
        source_col,
        id_col,
        "n_tok",
        F.floor((cum - F.col("n_tok")) / seq_len).cast("long").alias("bin_id"),
    )
    return (
        packed.groupBy(source_col, "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def source_mix_weights(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling weight per source:
    ``w_s = tokens_s^alpha / Σ_t tokens_t^alpha`` (alpha<1 upsamples small
    sources — the multilingual-training mixing rule). Returns
    ``(source, n_docs, n_tokens, weight)``, weight rounded to 6 dp.

    Two-phase aggregate down to one row per source, then a single-partition
    window for the normalizing constant — fine at any scale because the
    source-level table is tiny."""
    per_src = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(word_token_count(F.col(text_col))).alias("n_tokens"),
    )
    # alpha=0.5 → sqrt, which IEEE 754 requires to be correctly rounded in
    # every engine; Math.pow(x, 0.5) carries no such guarantee, so the
    # oracle comparison pins the sqrt path
    if alpha == 0.5:
        powed = F.sqrt(F.col("n_tokens").cast("double"))
    else:
        powed = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    total = F.sum(powed).over(Window.partitionBy())
    return per_src.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(powed / total, 6).alias("weight"),
    )


HEX_CHARS = "0123456789abcdef"


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_chars: int = 1,
    seed: int = 0,
) -> DataFrame:
    """Deterministic pseudorandom training order (the final step before a
    corpus feeds a data loader — FineWeb publishes its corpus in exactly
    this shard-shuffled layout): every row gets a ``shard`` and a dense
    0-based ``shard_pos`` within it, both pure functions of (seed, id).

    key = md5(seed || ':' || id); shard = integer value of the first
    ``shard_chars`` hex chars (16 or 256 shards); shard_pos orders by the
    remaining hex string. Everything is string arithmetic on the md5 hex
    form — bit-identical across engines (the repo's established protocol:
    compare md5-hex as strings, never via hex→int conversion wide enough
    to overflow; here each char converts through a 16-char lookup).

    100-TB shape: NO global sort. The window partitions by shard, so each
    shard sorts independently inside its shuffle partition — pick
    ``shard_chars`` so a shard fits one task's external-sort budget
    (2 hex chars = 256 shards ≈ 400 GB/shard at 100 TB; real deployments
    use more chars / a wider slice of the hash). Re-running on a grown
    corpus preserves relative order of surviving rows within a shard —
    the property loaders rely on for resumable epoch schedules."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = F.lit(0)
    for i in range(shard_chars):
        shard = shard * 16 + (
            F.instr(F.lit(HEX_CHARS), F.substring(h, i + 1, 1)) - 1
        )
    rest = F.substring(h, shard_chars + 1, 32 - shard_chars)
    w = Window.partitionBy("shard").orderBy("_hrest", id_col)
    return (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("_hrest", rest)
        .withColumn("shard_pos", F.row_number().over(w) - 1)
        .drop("_hrest")
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    order_by: list | None = None,
    id_col: str = "doc_id",
    n_salts: int = 8,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, best-first — the
    anti-domination quota every large webtext release applies so a
    handful of mega-domains (forums, wikis, mirrors) cannot dominate
    the corpus (FineWeb and RefinedWeb both publish per-domain caps as
    a top-level pipeline stage).

    ``order_by`` is the best-first total order (default:
    ``[id_col]``) — make it total (append the id) or survivors are
    nondeterministic.

    100-TB shape: the naive single window over ``domain_col`` puts an
    entire mega-domain in ONE task's sort. This runs the same salted
    two-phase scheme as the politeness slot assigner
    (operators/politeness.py::assign_fetch_slots): phase 1 takes the
    per-(domain, salt) top-``cap`` — bounding phase 2's input to
    ``n_salts × cap`` rows per domain regardless of skew — and the salt
    is a pure function of the row id, so the result is deterministic
    and identical to the unsalted answer (a row in the true top-cap is
    in the top-cap of its own salt bucket a fortiori)."""
    order_by = list(order_by) if order_by is not None else [F.col(id_col)]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col), F.lit(11)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(domain_col, "_salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
    )
    w2 = Window.partitionBy(domain_col).orderBy(*order_by)
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= cap)
        .drop("_salt", "_r1", "_r2")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM 2007): a
    deterministic weight-proportional sample of ``k`` rows WITHOUT
    replacement, with the variance-optimal subset-sum estimator.

    Every row gets priority q = w / u with u ~ Uniform(0,1]; the sample
    is the k largest priorities and tau is the (k+1)-th: each kept row
    estimates its weight class as ``est_weight = max(w, tau)``, making
    ``sum(est_weight)`` over ANY selected subset an unbiased estimate of
    that subset's true weight total — the primitive behind "subsample
    10^7 docs from 10^10 ∝ token count, but keep per-slice token
    accounting honest" (the paper proves no other k-sample does better).

    Determinism/cross-engine protocol: u is built from the first 13 hex
    chars of md5(seed:id) — 52 bits, exact in a double — via the repo's
    per-char lookup fold (no wide hex→int builtin), u = (v+1)/2^52 ∈
    (0,1]. The priority is then ONE correctly-rounded IEEE division of
    exact inputs, so Spark and the DuckDB oracle produce bit-identical
    keys and the ranked cutoff cannot straddle engines (the established
    no-transcendentals-in-ranked-keys rule; A-ES exponential keys would
    need pow/log and were rejected for exactly that reason).

    Rows with w <= 0 (or null) carry no mass and are excluded up front,
    matching the estimator's domain.

    100-TB shape: the weight column and the id are the only inputs; the
    top-(k+1) runs through :func:`priority_schedule`'s range-partitioned
    two-pass (per-partition counts decide the cutoff; no single-task
    TakeOrderedAndProject merge), tau is ONE collected row, and the
    estimate is a map-only expression over the k survivors.
    """
    from go_crawler_spark.operators.sequence import priority_schedule

    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    v = F.lit(0).cast("long")
    for i in range(13):
        v = v * 16 + (F.instr(F.lit(HEX_CHARS), F.substring(h, i + 1, 1)) - 1)
    u = (v + 1).cast("double") / F.lit(float(1 << 52))
    cand = (
        df.filter(F.col(weight_col) > 0)
        .withColumn(
            "priority", F.col(weight_col).cast("double") / u
        )
        .withColumn("_negp", -F.col("priority"))
    )
    topk1 = priority_schedule(
        cand, ["_negp", id_col], k + 1, num_partitions=num_partitions
    ).persist()
    # tau = the (k+1)-th priority — the threshold below which nothing was
    # kept; 0.0 when the population is <= k (then every row keeps w
    # exactly, the paper's degenerate case). ONE bounded row collected.
    tau_rows = topk1.filter(F.col("seq") == k).select("priority").collect()
    tau = float(tau_rows[0]["priority"]) if tau_rows else 0.0
    out = (
        topk1.filter(F.col("seq") < k)
        .withColumn(
            "est_weight",
            F.greatest(F.col(weight_col).cast("double"), F.lit(tau)),
        )
        .drop("_negp", "seq")
    )
    return out


def priority_sample_stratified(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    n_salts: int = 8,
) -> DataFrame:
    """Per-stratum priority sampling: an independent Duffield-Lund-Thorup
    k-sample (see :func:`priority_sample`) inside EVERY stratum — "sample
    k docs per language ∝ token count with honest per-slice weight
    accounting", the stratified subsampling step of a multilingual corpus
    release. Priorities use the identical 52-bit md5 uniform, so a row's
    key is the same whether it is sampled globally or per-stratum.

    tau is per-stratum — the (k+1)-th priority within the stratum (0 when
    the stratum has ≤ k weighted rows) — and ``est_weight = max(w, tau)``
    keeps each stratum's subset-sum estimator unbiased independently.

    100-TB shape: the top-(k+1) per stratum runs through the salted
    two-phase scheme (:func:`domain_cap` — phase 2 is bounded to
    n_salts·(k+1) rows per stratum, so a mega-stratum never serializes
    one task); the tau/rank pass is a window over ≤ k+1 rows per stratum,
    bounded by construction. No transcendentals anywhere near a cutoff.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    v = F.lit(0).cast("long")
    for i in range(13):
        v = v * 16 + (F.instr(F.lit(HEX_CHARS), F.substring(h, i + 1, 1)) - 1)
    u = (v + 1).cast("double") / F.lit(float(1 << 52))
    cand = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", F.col(weight_col).cast("double") / u)
        .withColumn("_negp", -F.col("priority"))
    )
    top = domain_cap(
        cand,
        stratum_col,
        cap=k + 1,
        order_by=[F.col("_negp"), F.col(id_col)],
        id_col=id_col,
        n_salts=n_salts,
    )
    w_rank = Window.partitionBy(stratum_col).orderBy("_negp", id_col)
    w_all = Window.partitionBy(stratum_col)
    ranked = top.withColumn("_r", F.row_number().over(w_rank))
    tau = F.coalesce(
        F.max(F.when(F.col("_r") == k + 1, F.col("priority"))).over(w_all),
        F.lit(0.0),
    )
    return (
        ranked.withColumn(
            "est_weight",
            F.greatest(F.col(weight_col).cast("double"), tau),
        )
        .filter(F.col("_r") <= k)
        .drop("_negp", "_r")
    )
