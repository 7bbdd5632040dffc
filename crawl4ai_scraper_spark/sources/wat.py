"""WAT source/sink: the metadata sidecar of a Common-Crawl-style lakehouse.

Common Crawl's fourth artifact family (next to WARC / WET / CDX, see the
sibling modules): WAT records are ``WARC-Type: metadata`` whose JSON payload
("Envelope") describes the corresponding response — target URI, page title,
and the outlink list. WAT is what link-graph builders consume: computing
PageRank/HITS/anchor signals from WAT costs ~5% of re-parsing the raw WARC
HTML, because the link extraction already happened at archive time.

- ``read_wat``   — WAT shards → ``(url, warc_ts, title, links)`` frame,
                   ready for ``operators/graph.py`` (edges = url → explode
                   links) without touching HTML.
- ``wat_shards`` / ``write_wat`` — (url, ts, title, links) → WAT shards,
  serialized per-partition on executors, content-addressed record ids.

Framing reuses the ISO 28500 machinery from ``sources/warc.py``; the JSON
envelope carries the Common-Crawl field spine
``Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata`` with
``Head.Title`` and ``Links: [{"url": ...}]`` — the subset every public WAT
consumer reads. Parsing tolerates records without HTML-Metadata (non-HTML
responses have none) by yielding empty titles/links.

Scale shape: identical to WARC/WET — one ``binaryFile`` row per shard, the
parse is an Arrow ``mapInPandas`` pass on executors, the writer is
per-partition serialization with no driver work.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
from datetime import datetime
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from crawl4ai_scraper_spark.sources.warc import (
    _CRLF,
    _HDR_END,
    _maybe_gunzip,
    iter_warc_records,
)

WAT_SCHEMA = "url string, warc_ts timestamp, title string, links array<string>"


# ---------------------------------------------------------------------------
# record-level codec (pure functions — unit-testable without Spark)
# ---------------------------------------------------------------------------

def wat_envelope(url: str, title: str, links: List[str]) -> str:
    """The Common-Crawl WAT envelope subset every consumer reads. Key order
    is fixed (sort_keys) so serialization is deterministic."""
    return json.dumps(
        {
            "Envelope": {
                "WARC-Header-Metadata": {"WARC-Target-URI": url},
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": title or ""},
                            "Links": [{"url": l} for l in (links or [])],
                        }
                    }
                },
            }
        },
        sort_keys=True,
        separators=(",", ":"),
    )


def wat_record_bytes(
    url: str, ts: Optional[datetime], title: str, links: List[str]
) -> bytes:
    """One ``WARC-Type: metadata`` record; content-addressed id (md5 over
    url + envelope) so writes are deterministic."""
    payload = wat_envelope(url, title, links).encode("utf-8")
    date = (ts or datetime(2025, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    digest = hashlib.md5(url.encode("utf-8") + b"\x00" + payload).hexdigest()
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + date.encode("ascii") + _CRLF
        + b"WARC-Record-ID: <urn:md5:" + digest.encode("ascii") + b">" + _CRLF
        + b"Content-Type: application/json\r\n"
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _HDR_END
        + payload + _CRLF + _CRLF
    )


def write_wat_bytes(
    records: List[Tuple[str, Optional[datetime], str, List[str]]],
    per_record_gzip: bool = False,
) -> bytes:
    """Serialize (url, ts, title, links) rows as one WAT shard
    (member-per-record gzip when ``per_record_gzip``)."""
    out = io.BytesIO()
    for url, ts, title, links in records:
        rec = wat_record_bytes(url, ts, title, links)
        # mtime=0: gzip members carry no wall-clock — shard bytes are a pure
        # function of the records (byte-level artifact diffing/dedup works)
        out.write(gzip.compress(rec, mtime=0) if per_record_gzip else rec)
    return out.getvalue()


def parse_wat_shard(
    data: bytes,
) -> Iterator[Tuple[str, Optional[datetime], str, List[str]]]:
    """→ (url, warc_ts, title, links) per *metadata* record of one shard;
    other record types are skipped; a record without HTML-Metadata (non-HTML
    response) yields an empty title and link list; broken JSON degrades to
    the same empty metadata rather than a task failure."""
    for headers, payload in iter_warc_records(_maybe_gunzip(data)):
        if headers.get("warc-type", b"").lower() != b"metadata":
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
        title, links = "", []
        try:
            env = json.loads(payload.decode("utf-8", "replace"))
            html_md = (
                env.get("Envelope", {})
                .get("Payload-Metadata", {})
                .get("HTTP-Response-Metadata", {})
                .get("HTML-Metadata", {})
            )
            title = html_md.get("Head", {}).get("Title", "") or ""
            links = [
                l["url"] for l in html_md.get("Links", []) if isinstance(l, dict) and "url" in l
            ]
        except (ValueError, AttributeError, TypeError):
            pass
        yield uri.decode("utf-8", "replace"), ts, title, links


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT shards → (url, warc_ts, title, links) DataFrame. One binaryFile
    row per shard; the parse is an Arrow pass on executors."""
    import pandas as pd

    shards = spark.read.format("binaryFile").load(path).select("content")

    def _expand(batches):
        for pdf in batches:
            urls, tss, titles, linkss = [], [], [], []
            for blob in pdf["content"]:
                for url, ts, title, links in parse_wat_shard(bytes(blob)):
                    urls.append(url)
                    tss.append(ts)
                    titles.append(title)
                    linkss.append(links)
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "title": titles, "links": linkss}
            )

    return shards.mapInPandas(_expand, WAT_SCHEMA)


def wat_shards(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    title_col: str = "title",
    links_col: str = "links",
    per_record_gzip: bool = False,
) -> DataFrame:
    """(url, ts, title, links) frame → one WAT shard per partition as a
    ``(shard binary, n_records long, n_bytes long)`` frame — serialization
    inside ``mapInPandas`` on executors, no driver bytes."""
    import pandas as pd

    src = df.select(url_col, ts_col, title_col, links_col)

    def _pack(batches):
        records: List[Tuple[str, Optional[datetime], str, List[str]]] = []
        for pdf in batches:
            for url, ts, title, links in zip(
                pdf[url_col], pdf[ts_col], pdf[title_col], pdf[links_col]
            ):
                records.append(
                    (
                        url,
                        None if pd.isnull(ts) else ts.to_pydatetime(),
                        title,
                        list(links) if links is not None else [],
                    )
                )
        if not records:  # empty partitions yield no shard row (write_wat parity)
            return
        blob = write_wat_bytes(records, per_record_gzip=per_record_gzip)
        yield pd.DataFrame(
            {"shard": [blob], "n_records": [len(records)], "n_bytes": [len(blob)]}
        )

    return src.mapInPandas(_pack, "shard binary, n_records long, n_bytes long")


def write_wat(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    title_col: str = "title",
    links_col: str = "links",
    per_record_gzip: bool = True,
) -> int:
    """Land (url, ts, title, links) as ``part-NNNNN.warc.wat[.gz]`` shard
    files, one per partition, written by executors. Returns shard count."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wat.gz" if per_record_gzip else ".warc.wat"
    src = df.select(url_col, ts_col, title_col, links_col)

    def _write(idx, rows):
        records = [
            (r[0], r[1], r[2], list(r[3]) if r[3] is not None else []) for r in rows
        ]
        if records:
            blob = write_wat_bytes(records, per_record_gzip=per_record_gzip)
            with open(os.path.join(out_dir, f"part-{idx:05d}{ext}"), "wb") as fh:
                fh.write(blob)
            yield 1

    written = src.rdd.mapPartitionsWithIndex(_write).sum()
    return int(written)
