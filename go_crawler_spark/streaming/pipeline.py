"""Structured Streaming face of the engine.

The reference's crawl loop is iterative batch (SURVEY §2 Q3/Q4, §3.1) and
stays that way in ``plans/crawl.py``.  This module hosts the *continuous*
half the north rule's production posture needs: a Common-Crawl-style pages
firehose (WARC partitions landing as parquet files) processed incrementally —

- ``stream_pages``            file-source stream over the (url, warc_ts,
                              html, text, lang) table; ``maxFilesPerTrigger``
                              is the back-pressure knob that replaces the
                              reference's 2×-worker channel buffers
                              (cmd/crawler/main.go:57-60);
- ``extract_children_stream`` the SAME fused Arrow UDF as the batch path
                              (P1–P6, functions/htmlx.py) run map-only over
                              micro-batches — no shuffle, linear scale-out;
- ``windowed_host_metrics``   event-time windowed per-host discovery rates
                              with a watermark for late WARC partitions —
                              the streaming form of M1
                              (internal/metrics.go:14-18);
- ``text_quality_stream``     per-micro-batch text analysis (token counts,
                              quality, lang-id) for a training-data ingest
                              pipeline.

Every transformation here is expressible on both a batch and a streaming
DataFrame — tests assert batch/stream result equality on the same input
(the micro-batch model guarantees it for these map-only / windowed-agg
plans).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_crawler_spark.datagen import PAGES_SCHEMA
from go_crawler_spark.functions.htmlx import extract_resolved_udf
from go_crawler_spark.functions.text import lang_id, quality_score, token_count
from go_crawler_spark.functions.urls import registrable_host_udf


def stream_pages(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source stream over a directory of pages parquet (the landing
    zone of a WARC-ingest job). New files are discovered per trigger;
    ``maxFilesPerTrigger`` bounds micro-batch size (back-pressure)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(src_dir)


def extract_children_stream(pages: DataFrame) -> DataFrame:
    """P1–P6 over a (possibly streaming) pages DataFrame: one fused Arrow
    batch pass, exploded to child rows. Map-only — Catalyst keeps it a
    single stage, so throughput scales with executor count."""
    return (
        pages.select(
            F.col("url").alias("parent_url"),
            "warc_ts",
            F.explode(extract_resolved_udf("url", "html")).alias("c"),
        )
        .select(
            "parent_url",
            "warc_ts",
            F.col("c.kind").alias("kind"),
            F.col("c.url").alias("url"),
            F.col("c.pos").alias("pos"),
        )
        .withColumn("host", registrable_host_udf("url"))
    )


def windowed_host_metrics(
    children: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed per-host discovery metrics with late-data bound.

    Streaming form of M1: links_discovered / assets_found per (window, host).
    ``approx_count_distinct`` (HLL) instead of exact distinct — exact
    distinct aggregation is unsupported in streaming and unnecessary for a
    rate metric at 10^10-URL scale.
    """
    return (
        children.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(
            F.sum(F.when(F.col("kind") == "page", 1).otherwise(0)).alias(
                "links_discovered"
            ),
            F.sum(F.when(F.col("kind") != "page", 1).otherwise(0)).alias(
                "assets_found"
            ),
            F.approx_count_distinct("url").alias("approx_distinct_urls"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "host",
            "links_discovered",
            "assets_found",
            "approx_distinct_urls",
        )
    )


def text_quality_stream(
    pages: DataFrame, id_cols: tuple[str, ...] = ("url", "warc_ts")
) -> DataFrame:
    """Training-data ingest analysis over the stream: token count, quality
    score, n-gram lang-id — all vectorized, map-only (stateless: no
    window/watermark, so the stream result is bit-identical to running
    the same expressions in batch — pinned by the
    ``streaming_quality_scores`` SQL oracle)."""
    return pages.select(
        *id_cols,
        token_count(F.col("text")).alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        lang_id(F.col("text")).alias("lang_pred"),
    )
