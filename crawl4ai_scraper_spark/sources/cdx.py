"""CDX index source: the query-before-fetch side of a Common-Crawl-style
lakehouse.

Common Crawl ships a URL index alongside the WARC shards — CDXJ lines of
``<urlkey> <timestamp> <json>`` where the JSON carries (url, status, mime,
digest, length, offset, filename). Consumers query this index FIRST: pick
the capture set (statuses, mime types, newest capture per URL), then fetch
only those WARC byte ranges. This module is that index edge for the engine:
CDXJ shards → a typed captures frame → fetch candidates / recrawl seeds.

Everything is JVM-native (``spark.read.text`` → split + ``from_json`` +
``to_timestamp``): the parse runs at scan speed inside whole-stage codegen,
no UDFs, and a malformed line degrades to NULL fields rather than a task
failure (PERMISSIVE semantics — count them via ``url IS NULL``). Candidate
selection is one max-struct groupBy per URL key (keep-latest, the same
no-window shape as ``temporal.latest_revision``), so at the full 10^10-URL
index scale there is exactly one shuffle, keyed uniformly by url.

A writer (``cdxj_line``) exists so tests and fixtures can round-trip:
captures → CDXJ shards → ``read_cdxj`` → field-identical frames.

Reference parity note: the reference crawler has no index ingestion (it
fetches live); this is a task-mandate source for the Common-Crawl-style
lakehouse input (BASELINE.json input_hint), sibling of sources/warc.py.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The JSON payload fields of a CDXJ line (Common Crawl index convention).
CDX_JSON_SCHEMA = (
    "url string, status string, mime string, digest string, "
    "length string, offset string, filename string"
)

CAPTURES_COLUMNS = (
    "urlkey", "capture_ts", "url", "status", "mime", "digest",
    "warc_length", "warc_offset", "warc_filename",
)


def cdxj_line(
    urlkey: str,
    ts: str,
    url: str,
    status: int = 200,
    mime: str = "text/html",
    digest: str = "",
    length: int = 0,
    offset: int = 0,
    filename: str = "",
) -> str:
    """One CDXJ index line (writer side — fixtures and tests)."""
    payload = {
        "url": url,
        "status": str(status),
        "mime": mime,
        "digest": digest,
        "length": str(length),
        "offset": str(offset),
        "filename": filename,
    }
    return f"{urlkey} {ts} {json.dumps(payload, sort_keys=True)}"


def parse_cdxj(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """CDXJ text lines → typed captures frame (native split + from_json +
    to_timestamp; malformed lines yield NULL fields, never task failures).

    ``capture_ts`` parses the 14-digit CDX timestamp (yyyyMMddHHmmss) as a
    timezone-free timestamp_ntz — CDX times are UTC wall-clock; NTZ keeps
    the value identical under any session timezone (same convention as the
    sitemap ``lastmod`` path)."""
    v = F.col(value_col)
    first = F.split(v, " ", 3)
    j = F.from_json(F.element_at(first, 3), CDX_JSON_SCHEMA)
    return lines.select(
        F.element_at(first, 1).alias("urlkey"),
        F.to_timestamp_ntz(F.element_at(first, 2), F.lit("yyyyMMddHHmmss")).alias(
            "capture_ts"
        ),
        j["url"].alias("url"),
        j["status"].cast("int").alias("status"),
        j["mime"].alias("mime"),
        j["digest"].alias("digest"),
        j["length"].cast("long").alias("warc_length"),
        j["offset"].cast("long").alias("warc_offset"),
        j["filename"].alias("warc_filename"),
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ index shards (plain or .gz — Spark's text source handles
    the compression codec per file) into the captures frame."""
    return parse_cdxj(spark.read.text(path))


def fetch_candidates(
    captures: DataFrame,
    statuses: tuple = (200,),
    mime_prefix: Optional[str] = "text/",
) -> DataFrame:
    """Index-side capture selection: keep the NEWEST capture per URL among
    the wanted statuses/mime types → (url, capture_ts, digest, warc_length,
    warc_offset, warc_filename).

    One max-struct groupBy on the url key — no window, map-side combine,
    uniform keys (ties broken by digest then filename/offset so the pick is
    total and engine-independent). The output is exactly the fetch list a
    WARC-range reader consumes, and the (url, digest) pairs feed
    ``dedup_cross_corpus`` / ``temporal.snapshot_delta`` for recrawl
    planning."""
    wanted = captures.filter(
        F.col("status").isin(*[int(s) for s in statuses])
        & F.col("url").isNotNull()
        & F.col("capture_ts").isNotNull()
    )
    if mime_prefix is not None:
        wanted = wanted.filter(F.col("mime").startswith(mime_prefix))
    pick = F.max(
        F.struct(
            "capture_ts", "digest", "warc_filename", "warc_offset", "warc_length"
        )
    ).alias("_p")
    return (
        wanted.groupBy("url")
        .agg(pick)
        .select(
            "url",
            F.col("_p.capture_ts").alias("capture_ts"),
            F.col("_p.digest").alias("digest"),
            F.col("_p.warc_length").alias("warc_length"),
            F.col("_p.warc_offset").alias("warc_offset"),
            F.col("_p.warc_filename").alias("warc_filename"),
        )
    )
