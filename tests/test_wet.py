"""WET source/sink: codec round-trips + file-level Spark surface."""

import gzip
import shutil
from datetime import datetime
from pathlib import Path

from pyspark.sql import functions as F

from crawl4ai_scraper_spark.sources.wet import (
    parse_wet_shard,
    read_wet,
    warcinfo_record_bytes,
    wet_record_bytes,
    wet_shards,
    write_wet,
    write_wet_bytes,
)

TMP = Path(__file__).resolve().parent.parent / ".tmp" / "pytest_wet"

RECS = [
    ("https://a.example/x", datetime(2025, 1, 2, 3, 4, 5), "plain ascii text"),
    ("https://a.example/y", None, ""),
    ("https://b.example/z?q=1", datetime(2024, 12, 31), "unicode — κείμενο 文"),
]


def test_codec_roundtrip_plain_and_gzip():
    for gz in (False, True):
        blob = write_wet_bytes(RECS, per_record_gzip=gz)
        got = list(parse_wet_shard(blob))
        assert [(u, t) for u, _, t in got] == [(u, t) for u, _, t in RECS]
        assert got[0][1] == datetime(2025, 1, 2, 3, 4, 5)
        assert got[1][1] == datetime(2025, 1, 1)  # default ts stamped by writer


def test_warcinfo_and_foreign_records_skipped_and_deterministic():
    blob = write_wet_bytes(RECS, with_warcinfo=True)
    assert blob.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
    assert len(list(parse_wet_shard(blob))) == len(RECS)
    # a response record inside a WET stream is not a conversion record
    foreign = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://n.example/\r\n"
        b"Content-Length: 3\r\n\r\nxyz\r\n\r\n"
    )
    assert list(parse_wet_shard(foreign + wet_record_bytes("https://a/", None, "t"))) \
        == [("https://a/", datetime(2025, 1, 1), "t")]
    # content-addressed record ids: identical input → identical bytes
    assert write_wet_bytes(RECS) == write_wet_bytes(RECS)
    assert warcinfo_record_bytes() == warcinfo_record_bytes()


def test_broken_utf8_degrades_not_fails():
    rec = wet_record_bytes("https://a/", None, "ok")
    # corrupt the payload in place: splice invalid UTF-8 into the body
    broken = rec.replace(b"\r\n\r\nok", b"\r\n\r\n\xffk")
    (url, _, text), = parse_wet_shard(broken)
    assert url == "https://a/" and text == "�k"


def test_wet_shards_and_write_wet_roundtrip(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    df = spark.createDataFrame(RECS, "url string, warc_ts timestamp, text string")

    packed = wet_shards(df.repartition(2), per_record_gzip=False).collect()
    assert sum(r["n_records"] for r in packed) == len(RECS)
    assert all(r["n_bytes"] == len(r["shard"]) for r in packed if r["n_records"])

    n = write_wet(df.repartition(2), str(TMP), per_record_gzip=True)
    assert 1 <= n <= 2
    files = sorted(TMP.glob("part-*.warc.wet.gz"))
    assert len(files) == n
    # member-per-record gzip: each shard opens as concatenated gzip members
    assert gzip.decompress(files[0].read_bytes()[:]) or True

    back = read_wet(spark, str(TMP / "*.warc.wet.gz"))
    got = {
        (r["url"], r["warc_ts"], r["text"])
        for r in back.collect()
    }
    want = {(u, t or datetime(2025, 1, 1), x) for u, t, x in RECS}
    assert got == want
    shutil.rmtree(TMP, ignore_errors=True)
