"""Structured Streaming face: batch/stream equivalence of the extraction
and analysis plans, windowed metrics, and the stateful seen filter
(streaming Q1), including state survival across query restarts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_crawler_spark.datagen import generate_pages_df
from go_crawler_spark.streaming.pipeline import (
    extract_children_stream,
    stream_pages,
    text_quality_stream,
    windowed_host_metrics,
)
from go_crawler_spark.streaming.seen_state import streaming_seen_filter


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    pages = generate_pages_df(spark, 48, seed=42)
    pages.repartition(3).write.mode("overwrite").parquet(d)
    return d


def _run_available_now(stream_df, sink_dir, checkpoint, output_mode="append"):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_extract_stream_matches_batch(spark, pages_dir, tmp_path):
    batch = spark.read.parquet(pages_dir)
    expected = sorted(
        (r["parent_url"], r["kind"], r["url"], r["pos"])
        for r in extract_children_stream(batch).collect()
    )
    sink = str(tmp_path / "sink")
    _run_available_now(
        extract_children_stream(stream_pages(spark, pages_dir, max_files_per_trigger=1)),
        sink,
        str(tmp_path / "ckpt"),
    )
    got = sorted(
        (r["parent_url"], r["kind"], r["url"], r["pos"])
        for r in spark.read.parquet(sink).collect()
    )
    assert got == expected
    assert len(got) > 0


def test_text_quality_stream_matches_batch(spark, pages_dir, tmp_path):
    batch = spark.read.parquet(pages_dir)
    expected = sorted(
        (r["url"], r["n_tokens"], r["quality"], r["lang_pred"])
        for r in text_quality_stream(batch).collect()
    )
    sink = str(tmp_path / "sink")
    _run_available_now(
        text_quality_stream(stream_pages(spark, pages_dir)),
        sink,
        str(tmp_path / "ckpt"),
    )
    got = sorted(
        (r["url"], r["n_tokens"], r["quality"], r["lang_pred"])
        for r in spark.read.parquet(sink).collect()
    )
    assert got == expected


def test_windowed_host_metrics_matches_batch(spark, pages_dir, tmp_path):
    batch_children = extract_children_stream(spark.read.parquet(pages_dir))
    expected = {
        (r["win_start"], r["host"]): (r["links_discovered"], r["assets_found"])
        for r in windowed_host_metrics(batch_children).collect()
    }
    # complete mode (memory sink): the live-dashboard shape — append mode
    # would hold windows until the watermark passes their end, and the
    # corpus's event times all land in one still-open window
    q = (
        windowed_host_metrics(extract_children_stream(stream_pages(spark, pages_dir)))
        .writeStream.format("memory")
        .queryName("host_metrics")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["host"]): (r["links_discovered"], r["assets_found"])
        for r in spark.sql("SELECT * FROM host_metrics").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_streaming_seen_filter_dedups_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    urls1 = [f"https://site-{i % 7}.example/p/{i}" for i in range(40)] + [
        "https://site-0.example/p/0",  # in-batch duplicate
    ]
    spark.createDataFrame([(u,) for u in urls1], "url string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema("url string").parquet(src)
    _run_available_now(streaming_seen_filter(stream, n_shards=8), sink, ckpt)
    first = [r["url"] for r in spark.read.parquet(sink).collect()]
    assert sorted(first) == sorted(set(urls1))

    # second run, same checkpoint: overlap must NOT re-emit
    urls2 = [f"https://site-{i % 7}.example/p/{i}" for i in range(30, 60)]
    spark.createDataFrame([(u,) for u in urls2], "url string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema("url string").parquet(src)
    _run_available_now(streaming_seen_filter(stream2, n_shards=8), sink, ckpt)

    all_emitted = [r["url"] for r in spark.read.parquet(sink).collect()]
    assert len(all_emitted) == len(set(all_emitted)), "URL re-emitted after restart"
    assert sorted(set(all_emitted)) == sorted(set(urls1) | set(urls2))


def test_text_quality_stream_equals_batch(spark, tmp_path):
    """Stateless ingest analysis: the streamed result must be row-for-row
    identical to the same expressions run in batch (the property the
    streaming_quality_scores SQL oracle pins cross-engine)."""
    import uuid

    from pyspark.sql import functions as F

    from go_crawler_spark.functions.text import (
        lang_id,
        quality_score,
        token_count,
    )
    from go_crawler_spark.streaming.pipeline import text_quality_stream

    src = str(tmp_path / "docs_src")
    rows = [
        (0, "the quick brown fox and the lazy dog of the day"),
        (1, ""),
        (2, "der und die das ist ein"),
        (3, "?!?!?! 123"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.coalesce(1).write.parquet(src)

    st = spark.readStream.schema("doc_id long, text string").parquet(src)
    qname = f"tq_{uuid.uuid4().hex[:8]}"
    q = (
        text_quality_stream(st, id_cols=("doc_id",))
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(tuple(r) for r in spark.table(qname).collect())

    batch = sorted(
        tuple(r)
        for r in docs.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            F.round(quality_score(F.col("text")), 6).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        ).collect()
    )
    assert streamed == batch
    # spot-pin semantics: empty text -> 0 tokens / 'und'
    by_id = {t[0]: t for t in streamed}
    assert by_id[1][1] == 0 and by_id[1][3] == "und"
    assert by_id[2][3] == "de"
