"""WET source/sink: the extracted-text side of a Common-Crawl-style lakehouse.

Common Crawl publishes three artifact families per crawl: WARC (raw
responses — ``sources/warc.py``), the CDX URL index (``sources/cdx.py``),
and WET — "conversion" records carrying the extracted plain text per URL.
WET is the format most LLM-training-data pipelines actually start from
(C4, OSCAR, RefinedWeb all begin at WET or a WET-equivalent text layer),
so the engine speaks it in both directions:

- ``read_wet``: WET shards → ``(url, warc_ts, text)`` frame, i.e. the
  text-bearing subset of the pages schema, ready for the textops / dedup /
  quality operators without any crawl or extraction step.
- ``wet_shard_bytes`` / ``write_wet``: the crawl's extraction output
  (url, ts, extracted text) → WET conversion shards, one shard per
  partition, serialized entirely on executors.

Framing reuses the ISO 28500 record machinery from ``sources/warc.py``
(``iter_warc_records`` / ``_maybe_gunzip``) — WET files ARE WARC files
whose records have ``WARC-Type: conversion`` and a bare ``text/plain``
payload (no HTTP envelope). Real WET shards open with a ``warcinfo``
record; the writer emits one and the reader skips it, along with any
other non-conversion record type.

Scale shape: identical to the WARC reader — ``binaryFile`` gives one row
per shard (one task per ~150 MB WET shard, the unit CC consumers use) and
the parse is an Arrow ``mapInPandas`` pass on executors; the writer is a
per-partition serialization with no driver-side work. Determinism: record
ids are content-addressed (md5 of url+text), never random, so fixture
round-trips are byte-stable.

Reference parity note: the reference crawler's analogue is its markdown
file sink (/root/reference/output_manager.py) — one text artifact per
page. WET is that same artifact stream in the interchange format the
Common-Crawl-style lakehouse input (BASELINE.json input_hint) implies.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from crawl4ai_scraper_spark.sources.warc import (
    _CRLF,
    _HDR_END,
    _maybe_gunzip,
    iter_warc_records,
)

WET_SCHEMA = "url string, warc_ts timestamp, text string"


# ---------------------------------------------------------------------------
# record-level codec (pure functions — unit-testable without Spark)
# ---------------------------------------------------------------------------

def wet_record_bytes(url: str, ts: Optional[datetime], text: str) -> bytes:
    """One ``WARC-Type: conversion`` record. The record id is
    content-addressed (md5 over url + text) so writes are deterministic."""
    payload = (text or "").encode("utf-8")
    date = (ts or datetime(2025, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    digest = hashlib.md5(url.encode("utf-8") + b"\x00" + payload).hexdigest()
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + date.encode("ascii") + _CRLF
        + b"WARC-Record-ID: <urn:md5:" + digest.encode("ascii") + b">" + _CRLF
        + b"Content-Type: text/plain\r\n"
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _HDR_END
        + payload + _CRLF + _CRLF
    )


def warcinfo_record_bytes(description: str = "crawl4ai_scraper_spark WET") -> bytes:
    """The leading ``warcinfo`` record real WET shards open with."""
    payload = ("software: " + description + "\r\n").encode("utf-8")
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(payload)).encode("ascii") + _HDR_END
        + payload + _CRLF + _CRLF
    )


def write_wet_bytes(
    records: List[Tuple[str, Optional[datetime], str]],
    per_record_gzip: bool = False,
    with_warcinfo: bool = True,
) -> bytes:
    """Serialize (url, warc_ts, text) rows as one WET shard.
    ``per_record_gzip=True`` emits the ``.warc.wet.gz`` member-per-record
    form (multi-member gzip, same convention as ``.warc.gz``)."""
    out = io.BytesIO()
    chunks: List[bytes] = []
    if with_warcinfo:
        chunks.append(warcinfo_record_bytes())
    chunks.extend(wet_record_bytes(url, ts, text) for url, ts, text in records)
    for rec in chunks:
        # mtime=0: gzip members carry no wall-clock — shard bytes are a pure
        # function of the records (byte-level artifact diffing/dedup works)
        out.write(gzip.compress(rec, mtime=0) if per_record_gzip else rec)
    return out.getvalue()


def parse_wet_shard(data: bytes) -> Iterator[Tuple[str, Optional[datetime], str]]:
    """→ (url, warc_ts, text) per *conversion* record of one shard (plain
    or gzipped); warcinfo/other record types are skipped, and a payload
    with broken UTF-8 degrades via replacement characters rather than a
    task failure."""
    for headers, payload in iter_warc_records(_maybe_gunzip(data)):
        if headers.get("warc-type", b"").lower() != b"conversion":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        ts = None
        raw_ts = headers.get("warc-date")
        if raw_ts:
            try:
                ts = datetime.strptime(raw_ts.decode("ascii"), "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                ts = None
        yield uri.decode("utf-8", "replace"), ts, payload.decode("utf-8", "replace")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET shards (``*.warc.wet`` / ``*.warc.wet.gz``) → (url, warc_ts,
    text) DataFrame. One binaryFile row per shard; the parse is an Arrow
    pass on executors — no driver-side work."""
    import pandas as pd

    shards = spark.read.format("binaryFile").load(path).select("content")

    def _expand(batches):
        for pdf in batches:
            urls, tss, texts = [], [], []
            for blob in pdf["content"]:
                for url, ts, text in parse_wet_shard(bytes(blob)):
                    urls.append(url)
                    tss.append(ts)
                    texts.append(text)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "text": texts})

    return shards.mapInPandas(_expand, WET_SCHEMA)


def wet_shards(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    per_record_gzip: bool = False,
) -> DataFrame:
    """(url, ts, text) frame → one WET shard per partition, as a
    ``(shard binary, n_records long, n_bytes long)`` frame. Serialization
    happens inside ``mapInPandas`` on executors; the driver never touches
    record bytes. Pair with ``write_wet`` (or any binary sink) to land the
    shards; control shard size with ``df.repartition(n)`` upstream."""
    import pandas as pd

    src = df.select(url_col, ts_col, text_col)

    def _pack(batches):
        records: List[Tuple[str, Optional[datetime], str]] = []
        for pdf in batches:
            for url, ts, text in zip(pdf[url_col], pdf[ts_col], pdf[text_col]):
                records.append(
                    (url, None if pd.isnull(ts) else ts.to_pydatetime(), text)
                )
        blob = write_wet_bytes(records, per_record_gzip=per_record_gzip)
        yield pd.DataFrame(
            {"shard": [blob], "n_records": [len(records)], "n_bytes": [len(blob)]}
        )

    return src.mapInPandas(_pack, "shard binary, n_records long, n_bytes long")


def write_wet(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    per_record_gzip: bool = True,
) -> int:
    """Land (url, ts, text) as ``part-NNNNN.warc.wet[.gz]`` shard files in
    ``out_dir`` (one per partition, written by executors via
    ``foreachPartition``). Returns the number of shards written."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wet.gz" if per_record_gzip else ".warc.wet"
    src = df.select(url_col, ts_col, text_col)
    n_parts = src.rdd.getNumPartitions()

    def _write(idx, rows):
        records = [(r[0], r[1], r[2]) for r in rows]
        if records:
            blob = write_wet_bytes(records, per_record_gzip=per_record_gzip)
            with open(os.path.join(out_dir, f"part-{idx:05d}{ext}"), "wb") as fh:
                fh.write(blob)
            yield 1

    written = src.rdd.mapPartitionsWithIndex(_write).sum()
    return int(written)
