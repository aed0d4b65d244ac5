"""WARC 1.0 response records — the container format Common Crawl ships,
and the natural interchange format for a crawler writing fetched pages
(ISO 28500, public spec). The reference crawler writes loose files
(cmd/crawler/main.go save path logic); a 10^10-URL crawl writes WARC
segments instead, so the engine provides both directions:

- :func:`to_warc_records` — pages → one WARC response record per row,
  pure JVM string/binary concat (codegen'd, map-only);
- :func:`pack_segments` — records → one multi-record segment per
  (partition-sized) group, mirroring Common Crawl's ~1 GB WARC files;
- :func:`parse_warc_segments` — segment bytes → records, an Arrow-batched
  ``mapInPandas`` scanner that walks records by ``Content-Length`` (the
  only correct way: payloads may contain the header delimiter), exactly
  how real WARC readers work.

Scale shape: writing is map-only; packing groups by an explicit segment
key so segment size is caller-controlled (no global shuffle beyond the
one groupBy); parsing is embarrassingly parallel over segments — one
python pass per segment file, never per record across the boundary, and
the payload bytes cross the Arrow boundary exactly once.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_CRLF = "\r\n"
_WARC_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"

WARC_RECORD_SCHEMA = "url string, warc_date string, payload binary"


def to_warc_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """One ``WARC/1.0`` response record per page as ``(url, record
    binary)``. Header block + CRLFCRLF + payload + CRLFCRLF trailer,
    Content-Length = payload octets (ISO 28500 §4). All JVM built-ins."""
    payload = F.coalesce(F.col(payload_col), F.lit(b""))
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.concat(F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(_CRLF)),
        F.concat(
            F.lit("WARC-Date: "),
            F.date_format(F.col(ts_col), _WARC_TS_FMT),
            F.lit(_CRLF),
        ),
        F.concat(
            F.lit("Content-Length: "),
            F.length(payload).cast("string"),
            F.lit(_CRLF),
        ),
        F.lit(_CRLF),
    )
    record = F.concat(
        header.cast("binary"), payload, F.lit((_CRLF + _CRLF).encode())
    )
    return pages.select(F.col(url_col).alias("url"), record.alias("record"))


def to_wet_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """WET conversion records — the extracted-plain-text sibling Common
    Crawl publishes next to every crawl (``*.warc.wet.gz``: one
    ``WARC-Type: conversion`` record per page, ``Content-Type:
    text/plain``, payload = the page's extracted text). This is the
    natural EXPORT of the engine's text tier: crawl → extract_text →
    WET segments is exactly the CC derivation pipeline.

    Same map-only JVM concat as :func:`to_warc_records`; Content-Length
    counts UTF-8 octets of the text (encode first — §4 counts octets,
    not characters), and :func:`parse_warc_segments` reads the records
    back unchanged (the scanner is Content-Length-driven and
    type-agnostic). Null text → empty conversion record, row kept.
    """
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.concat(F.lit("WARC-Target-URI: "), F.col(url_col), F.lit(_CRLF)),
        F.concat(
            F.lit("WARC-Date: "),
            F.date_format(F.col(ts_col), _WARC_TS_FMT),
            F.lit(_CRLF),
        ),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.concat(
            F.lit("Content-Length: "),
            F.length(payload).cast("string"),
            F.lit(_CRLF),
        ),
        F.lit(_CRLF),
    )
    record = F.concat(
        header.cast("binary"), payload, F.lit((_CRLF + _CRLF).encode())
    )
    return pages.select(F.col(url_col).alias("url"), record.alias("record"))


def pack_segments(
    records: DataFrame, segment_col: "F.Column", order_col: str = "url"
) -> DataFrame:
    """Concatenate records into multi-record segments keyed by
    ``segment_col`` (e.g. ``pmod(xxhash64(url), n_segments)`` or a
    host/date bucket) — the WARC-file granularity. Deterministic: records
    are ordered by ``order_col`` within a segment."""
    return (
        records.withColumn("_seg", segment_col)
        .groupBy("_seg")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(order_col).alias("k"), "record"))
                    ),
                    lambda s: s["record"],
                ),
                F.lit(b""),
                lambda acc, r: F.concat(acc, r),
            ).alias("segment")
        )
        .select(F.col("_seg").alias("segment_id"), "segment")
    )


def parse_warc_bytes(blob: bytes) -> List[Tuple[str, str, bytes]]:
    """Walk one WARC segment's records by Content-Length (pure function —
    unit-tested directly). Returns ``(target_uri, warc_date, payload)``
    per record; tolerates header-delimiter bytes inside payloads."""
    out: List[Tuple[str, str, bytes]] = []
    sep = (_CRLF + _CRLF).encode()
    pos = 0
    n = len(blob)
    while pos < n:
        end_hdr = blob.find(sep, pos)
        if end_hdr < 0:
            break  # trailing garbage / truncated record: stop cleanly
        headers = blob[pos:end_hdr].decode("utf-8", "replace")
        fields = {}
        for line in headers.split(_CRLF)[1:]:  # [0] is the version line
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            break
        body_start = end_hdr + len(sep)
        payload = blob[body_start : body_start + clen]
        out.append(
            (fields.get("warc-target-uri", ""), fields.get("warc-date", ""), payload)
        )
        pos = body_start + clen + len(sep)  # skip the CRLFCRLF trailer
    return out


def parse_warc_segments(df: DataFrame, segment_col: str = "segment") -> DataFrame:
    """Segments → ``(url, warc_date, payload)`` records. One Arrow batch
    in, one python scan per segment, one Arrow batch out."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, payloads = [], [], []
            for blob in pdf[segment_col]:
                for uri, date, payload in parse_warc_bytes(bytes(blob)):
                    urls.append(uri)
                    dates.append(date)
                    payloads.append(payload)
            yield pd.DataFrame(
                {"url": urls, "warc_date": dates, "payload": payloads}
            )

    return df.select(segment_col).mapInPandas(scan, WARC_RECORD_SCHEMA)
