"""WARC source round-trip + crawl-from-WARC parity."""

import shutil
from datetime import datetime
from pathlib import Path

from pyspark.sql import functions as F

from crawl4ai_scraper_spark.fixtures.webgen import WebSpec, iter_pages
from crawl4ai_scraper_spark.sources.warc import (
    http_body,
    iter_warc_records,
    parse_warc_shard,
    read_warc,
    write_warc_bytes,
)

TMP = Path(__file__).resolve().parent.parent / ".tmp" / "pytest_warc"


def _corpus_records(spec):
    return [
        (r["url"], r["warc_ts"].replace(tzinfo=None) if r["warc_ts"] else None,
         r["html"]) for r in iter_pages(spec)
    ]


def test_record_codec_roundtrip_plain_and_gzip():
    recs = [
        ("https://a.example/x", datetime(2025, 1, 2, 3, 4, 5), b"<html>1</html>"),
        ("https://a.example/y", None, b""),
        ("https://b.example/z?q=1", datetime(2024, 12, 31), b"\x00binary\xff"),
    ]
    for gz in (False, True):
        blob = write_warc_bytes(recs, per_record_gzip=gz)
        got = list(parse_warc_shard(blob))
        assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in recs]
        assert got[0][1] == datetime(2025, 1, 2, 3, 4, 5)
        assert got[1][1] == datetime(2025, 1, 1)  # default ts stamped by writer


def test_non_response_records_and_garbage_are_skipped():
    body = b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
    resp = write_warc_bytes([("https://a.example/", None, b"<p>k</p>")])
    got = list(parse_warc_shard(body + resp + b"trailing-garbage"))
    assert [u for u, _, _ in got] == ["https://a.example/"]
    assert got[0][2] == b"<p>k</p>"


def test_http_envelope_strip():
    assert http_body(b"HTTP/1.1 200 OK\r\nA: b\r\n\r\n<x/>") == b"<x/>"
    assert http_body(b"<no-envelope/>") == b"<no-envelope/>"
    # record without HTTP envelope parses too
    blob = write_warc_bytes([("https://a.example/", None, b"<raw/>")],
                            with_http_envelope=False)
    assert list(parse_warc_shard(blob))[0][2] == b"<raw/>"


def test_read_warc_matches_parquet_pages_and_crawl_parity(spark, pages3, web3, chk_dir):
    """The SAME corpus via WARC shards must produce byte-identical html to
    the parquet pages table, and a crawl over the WARC-sourced table must
    equal the crawl over the parquet table (order + text)."""
    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl
    from crawl4ai_scraper_spark.sources.pages import with_pbucket

    spec, corpus, _fetch = web3
    recs = _corpus_records(spec)
    shutil.rmtree(TMP, ignore_errors=True)
    TMP.mkdir(parents=True)
    # two shards, one plain + one gzipped — both forms in one read glob
    half = len(recs) // 2
    (TMP / "part-0.warc").write_bytes(write_warc_bytes(recs[:half]))
    (TMP / "part-1.warc.gz").write_bytes(
        write_warc_bytes(recs[half:], per_record_gzip=True))

    warc_pages = read_warc(spark, str(TMP / "*.warc*"))
    got = {r["url"]: bytes(r["html"]) for r in warc_pages.collect()}
    want = {u: bytes(h) for u, _, h in recs}
    assert got == want  # byte-identical html for every url

    # crawl over a pbucketed write of the WARC-sourced table
    wdir = str(TMP / "pages_from_warc")
    with_pbucket(warc_pages, 8).write.partitionBy("pbucket").parquet(wdir)
    cfg = CrawlJobConfig(max_depth=2, max_pages=40, shuffle_partitions=4)
    res_w = run_crawl(spark, spark.read.parquet(wdir), "https://site0.example/",
                      cfg, chk_dir + "_w", n_buckets=8)
    res_p = run_crawl(spark, pages3, "https://site0.example/", cfg, chk_dir + "_p")
    vw = [r["url"] for r in res_w.visited.orderBy("seq").collect()]
    vp = [r["url"] for r in res_p.visited.orderBy("seq").collect()]
    assert vw == vp and vw
    dw = {r["url"]: r["markdown"] for r in res_w.documents.collect()}
    dp = {r["url"]: r["markdown"] for r in res_p.documents.collect()}
    assert dw == dp
    shutil.rmtree(TMP, ignore_errors=True)


def test_full_journey_warc_to_clean_corpus(spark, web3, chk_dir, tmp_path):
    """End-to-end composition: WARC shards → pages table → frontier crawl →
    extracted documents → corpus pipeline (filter/dedup/enrich) — the full
    path a reference user would run, every stage consuming the previous
    stage's real output."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl
    from crawl4ai_scraper_spark.sources.pages import with_pbucket

    spec, corpus, _fetch = web3
    recs = _corpus_records(spec)
    wdir = tmp_path / "shards"
    wdir.mkdir()
    (wdir / "s.warc.gz").write_bytes(write_warc_bytes(recs, per_record_gzip=True))

    pages = read_warc(spark, str(wdir / "*.warc.gz"))
    pdir = str(tmp_path / "pages")
    with_pbucket(pages, 8).write.partitionBy("pbucket").parquet(pdir)

    cfg = CrawlJobConfig(max_depth=2, max_pages=40, shuffle_partitions=4)
    res = run_crawl(spark, spark.read.parquet(pdir), "https://site0.example/",
                    cfg, chk_dir, n_buckets=8)
    docs = res.documents.filter(F.col("success"))
    ddir = str(tmp_path / "docs")
    docs.select("url", "markdown").write.parquet(ddir)
    n_docs = docs.count()
    assert n_docs > 10

    out = str(tmp_path / "clean")
    # --skip-filter: markdown link syntax is legitimately symbol-heavy, so the
    # Gopher symbol-ratio rule (correctly) rejects rendered markdown — the
    # filter is meant for plain text; here the journey under test is the
    # dedup/enrichment composition.
    args = parse_args(["--input", ddir, "--output", out, "--skip-filter",
                       "--id-col", "url", "--text-col", "markdown",
                       "--min-jaccard", "0.6"])
    summary = run_pipeline(spark, args)
    assert summary["input_rows"] == n_docs
    assert 0 < summary["output_rows"] <= n_docs
    kept = spark.read.parquet(out)
    assert {"url", "markdown", "quality", "fp", "lang_pred"} <= set(kept.columns)


def test_cdxj_round_trip_and_candidates(spark, tmp_path):
    from crawl4ai_scraper_spark.sources.cdx import (
        cdxj_line,
        fetch_candidates,
        read_cdxj,
    )

    lines = [
        cdxj_line("k1", "20240101120000", "https://a.example/x", 200,
                  "text/html", "d1", 100, 0, "w1.warc.gz"),
        cdxj_line("k1", "20240301120000", "https://a.example/x", 200,
                  "text/html", "d2", 120, 555, "w2.warc.gz"),   # newest → wins
        cdxj_line("k1", "20240401120000", "https://a.example/x", 404,
                  "text/html", "d3", 10, 9, "w3.warc.gz"),      # 404 → skipped
        cdxj_line("k2", "20240201120000", "https://b.example/y", 200,
                  "image/png", "d4", 50, 1, "w1.warc.gz"),      # non-text → skipped
        "this line is not cdxj at all",                          # malformed → NULLs
    ]
    p = tmp_path / "idx.cdxj"
    p.write_text("\n".join(lines) + "\n")

    caps = read_cdxj(spark, str(p))
    assert caps.count() == 5
    assert caps.filter("url IS NULL").count() == 1  # malformed line degraded

    cands = {r.url: r for r in fetch_candidates(caps).collect()}
    assert list(cands) == ["https://a.example/x"]
    pick = cands["https://a.example/x"]
    assert (pick.digest, pick.warc_offset, pick.warc_filename) == ("d2", 555, "w2.warc.gz")
    assert str(pick.capture_ts) == "2024-03-01 12:00:00"
