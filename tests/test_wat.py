"""WAT codec + Spark surface tests (sources/wat.py)."""

from datetime import datetime

from crawl4ai_scraper_spark.sources.wat import (
    parse_wat_shard,
    wat_envelope,
    wat_record_bytes,
    write_wat_bytes,
)


def test_wat_record_roundtrip_plain_and_gzip():
    recs = [
        ("https://a.example/", datetime(2024, 3, 5, 8, 30), "Home", ["https://a.example/x"]),
        ("https://a.example/p", None, "", []),
        ("https://b.example/q", datetime(2024, 1, 1), "Tïtle ünïcode",
         ["https://b.example/1", "https://b.example/2"]),
    ]
    for gz in (False, True):
        blob = write_wat_bytes(recs, per_record_gzip=gz)
        back = list(parse_wat_shard(blob))
        assert [(u, t, l) for u, _ts, t, l in back] == [
            (u, t, l) for u, _ts, t, l in recs
        ]
        # timestamps survive (None defaults to the writer epoch, still parseable)
        assert back[0][1] == datetime(2024, 3, 5, 8, 30)


def test_wat_writes_are_deterministic():
    recs = [("https://a.example/", datetime(2024, 3, 5), "T", ["https://a.example/x"])]
    assert write_wat_bytes(recs) == write_wat_bytes(recs)
    assert b"urn:md5:" in write_wat_bytes(recs)


def test_wat_parse_skips_foreign_records_and_broken_json():
    from crawl4ai_scraper_spark.sources.wet import warcinfo_record_bytes

    good = wat_record_bytes("https://a.example/", None, "T", [])
    # hand-build a metadata record with broken JSON payload
    broken = good.replace(
        wat_envelope("https://a.example/", "T", []).encode(), b'{"oops": '
    )
    # fix the content-length of the broken record
    lines = broken.split(b"\r\n")
    fixed = []
    for ln in lines:
        if ln.lower().startswith(b"content-length:"):
            fixed.append(b"Content-Length: " + str(len(b'{"oops": ')).encode())
        else:
            fixed.append(ln)
    broken = b"\r\n".join(fixed)
    blob = warcinfo_record_bytes() + broken + good
    out = list(parse_wat_shard(blob))
    # warcinfo skipped; broken-JSON record degrades to empty metadata
    assert len(out) == 2
    assert out[0][2] == "" and out[0][3] == []
    assert out[1][2] == "T"


def test_wat_spark_roundtrip_and_link_graph_feed(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.sources.wat import read_wat, write_wat

    df = spark.createDataFrame(
        [
            ("https://h.example/a", datetime(2024, 3, 5, 8, 30), "A",
             ["https://h.example/b", "https://h.example/c"]),
            ("https://h.example/b", datetime(2024, 3, 6, 8, 30), "B", []),
        ],
        "url string, warc_ts timestamp, title string, links array<string>",
    )
    out = str(tmp_path / "wat")
    n = write_wat(df.repartition(2), out)
    assert n >= 1
    back = read_wat(spark, out + "/*.warc.wat.gz")
    rows = {r["url"]: r for r in back.collect()}
    assert rows["https://h.example/a"]["title"] == "A"
    assert rows["https://h.example/a"]["links"] == [
        "https://h.example/b", "https://h.example/c"]
    assert rows["https://h.example/b"]["links"] == []
    # the graph feed: edges without touching HTML
    edges = back.select(
        F.col("url").alias("src"), F.explode("links").alias("dst")
    )
    assert edges.count() == 2
