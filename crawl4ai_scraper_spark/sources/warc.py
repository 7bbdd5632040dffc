"""WARC source: read Common-Crawl-style WARC shards into the pages table.

The north-star input is "an Iceberg lakehouse of Common-Crawl-style pages";
the canonical on-disk interchange for that corpus is WARC (ISO 28500) —
per-record framed archives, usually with each record its own gzip member
(``.warc.gz``). This module is the ingestion edge: WARC shards → the
engine's ``(url, warc_ts, html, text, lang)`` pages schema, after which
everything (bucketing, crawl, dedup, extraction) is format-agnostic.

Scale shape: ``spark.read.format("binaryFile")`` gives one row per shard
(Common Crawl shards are ~1 GB — one task each, the same unit CC consumers
use), and the record parse runs inside ``mapInPandas`` on executors. The
parser is pure-stdlib framing: WARC headers up to CRLFCRLF, Content-Length
payload, HTTP header strip for response records. No driver-side work at all;
re-bucketing to the pbucket layout happens in the normal distributed write.

A writer (``write_warc_bytes``) exists so tests and fixtures can round-trip:
corpus → WARC shards → ``read_warc`` → byte-identical pages.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from crawl4ai_scraper_spark.sources.pages import PAGES_SCHEMA

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# record-level codec (pure functions — unit-testable without Spark)
# ---------------------------------------------------------------------------

def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(_CRLF)[1:]:  # line 0 = "WARC/1.0"
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = v.strip()
    return headers


def iter_warc_records(data: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield (warc_headers, payload) per record from raw (uncompressed) WARC
    bytes. Framing per ISO 28500: header block to CRLFCRLF, Content-Length
    payload, two CRLFs of record separator."""
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # trailing garbage: stop rather than misframe
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", b"0"))
        except ValueError:
            break
        body_start = hdr_end + len(_HDR_END)
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope of a ``response`` record (status
    line + headers up to CRLFCRLF); non-HTTP payloads pass through."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(_HDR_END)
        if sep >= 0:
            return payload[sep + len(_HDR_END):]
    return payload


def _maybe_gunzip(data: bytes) -> bytes:
    """Transparent multi-member gzip (the .warc.gz convention: one member
    per record — GzipFile reads concatenated members natively)."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            return fh.read()
    return data


def parse_warc_shard(data: bytes) -> Iterator[Tuple[str, Optional[datetime], bytes]]:
    """→ (url, warc_ts, html) per *response* record of one shard (plain or
    gzipped); warcinfo/request/metadata records are skipped."""
    for headers, payload in iter_warc_records(_maybe_gunzip(data)):
        if headers.get("warc-type", b"").lower() != b"response":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        ts = None
        raw_ts = headers.get("warc-date")
        if raw_ts:
            try:
                ts = datetime.strptime(
                    raw_ts.decode("ascii"), "%Y-%m-%dT%H:%M:%SZ"
                ).replace(tzinfo=timezone.utc).replace(tzinfo=None)
            except ValueError:
                ts = None
        yield uri.decode("utf-8", "replace"), ts, http_body(payload)


def write_warc_bytes(
    records: List[Tuple[str, Optional[datetime], bytes]],
    per_record_gzip: bool = False,
    with_http_envelope: bool = True,
) -> bytes:
    """Serialize (url, warc_ts, html) rows as a WARC shard (test/fixture
    writer; per_record_gzip=True emits the .warc.gz member-per-record form)."""
    out = io.BytesIO()
    for url, ts, html in records:
        payload = html or b""
        if with_http_envelope:
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(payload)).encode() + _HDR_END
                + payload
            )
        date = (ts or datetime(2025, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + date.encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _HDR_END
            + payload + _CRLF + _CRLF
        )
        # mtime=0: gzip members carry no wall-clock — shard bytes are a pure
        # function of the records (byte-level artifact diffing/dedup works)
        out.write(gzip.compress(rec, mtime=0) if per_record_gzip else rec)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC shards (``*.warc`` / ``*.warc.gz``) → pages-schema DataFrame.

    One binaryFile row per shard; the parse is an Arrow pass on executors.
    ``text``/``lang`` come back NULL (they are extraction OUTPUTS); run
    ``sources.pages.with_pbucket`` + write to get the crawlable layout."""
    import pandas as pd

    shards = spark.read.format("binaryFile").load(path).select("content")

    def _expand(batches):
        for pdf in batches:
            urls, tss, htmls = [], [], []
            for blob in pdf["content"]:
                for url, ts, html in parse_warc_shard(bytes(blob)):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls,
                 "text": [None] * len(urls), "lang": [None] * len(urls)}
            )

    return shards.mapInPandas(_expand, PAGES_SCHEMA)
