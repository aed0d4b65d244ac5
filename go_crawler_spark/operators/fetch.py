"""Fetch stage (S2/S3): lookup equi-join against the pages corpus + size gate.

The reference does HTTP HEAD (size gate, cmd/crawler/main.go:311-343) then
GET (pkg/httpclient/client.go:48-71); non-200 or network failure marks the
item ``SetSkipped("download")`` and the item *continues through the
pipeline* (main.go:158-163). In the sandbox table model the web is the
Common-Crawl-style ``pages`` table, so:

- GET        → ``frontier LEFT JOIN pages ON url`` (match ⇔ status 200)
- HEAD gate  → ``length(html) > max_file_size`` ⇒ content dropped,
               status = 'skipped_download' (exact size known in the model)
- failure    → no match ⇒ html NULL, status = 'skipped_download'; the row
               is preserved (row-preserving skip, SURVEY §3.2)

For a real cluster the join's build side is the frontier batch (small vs a
100 TB pages table); Catalyst/AQE picks broadcast when the batch fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fetch_round(frontier: DataFrame, pages: DataFrame, max_file_size: int) -> DataFrame:
    """Join one frontier batch against the pages corpus.

    Returns frontier columns + (html, text, lang, warc_ts, size, status).
    """
    corpus = pages.select(
        "url",
        F.col("html").alias("_html"),
        F.col("text").alias("_text"),
        "lang",
        "warc_ts",
    )
    joined = frontier.join(corpus, on="url", how="left")
    oversized = F.length(F.col("_html")) > F.lit(max_file_size)
    missing = F.col("_html").isNull()
    return (
        joined.withColumn(
            "status",
            F.when(missing | oversized, F.lit("skipped_download")).otherwise(F.lit("ok")),
        )
        # size gate: content never downloaded (main.go:324-330) → null out
        .withColumn("html", F.when(oversized | missing, F.lit(None)).otherwise(F.col("_html")))
        .withColumn("text", F.when(oversized | missing, F.lit(None)).otherwise(F.col("_text")))
        .withColumn("size", F.coalesce(F.length(F.col("html")), F.lit(0)))
        .drop("_html", "_text")
    )
