"""Structured Streaming surfaces: incremental extraction is exactly-once and
byte-identical to the batch kernel; the host-rate aggregate windows correctly."""

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from crawl4ai_scraper_spark.fixtures.webgen import WebSpec, iter_host_urls, page_row
from crawl4ai_scraper_spark.kernel.cleaning import CleaningConfig
from crawl4ai_scraper_spark.kernel.extraction import extract_record
from crawl4ai_scraper_spark.sources.pages import with_pbucket

TMP = Path(__file__).resolve().parent.parent / ".tmp" / "pytest_stream"


def _write_host_batch(spark, spec, k, pages_dir):
    rows = [page_row(spec, u) for u in iter_host_urls(spec, k)]
    rows = [r for r in rows if r is not None]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    with_pbucket(df, 8).write.mode("append").parquet(pages_dir)
    return rows


def test_stream_extract_incremental_and_byte_identical(spark):
    from crawl4ai_scraper_spark.streaming import stream_extract

    shutil.rmtree(TMP, ignore_errors=True)
    pages_dir, out_dir, chk = str(TMP / "pages"), str(TMP / "docs"), str(TMP / "chk")
    spec = WebSpec(n_hosts=2, max_secs=3, max_pages=4)

    batch1 = _write_host_batch(spark, spec, 0, pages_dir)
    stream_extract(spark, pages_dir, out_dir, chk)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == len(batch1)

    # second drain picks up ONLY the new files (exactly-once over restarts)
    batch2 = _write_host_batch(spark, spec, 1, pages_dir)
    stream_extract(spark, pages_dir, out_dir, chk)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(batch1) + len(batch2)
    assert got2.select("url").distinct().count() == got2.count()

    # byte-identical to the batch kernel on a sample row
    sample = batch2[3]
    streamed = got2.filter(F.col("url") == sample["url"]).collect()[0]
    batch = extract_record(sample["url"], sample["html"], "2025-01-01T00:00:00",
                           CleaningConfig.build())
    assert streamed["markdown"] == batch["markdown"]
    assert streamed["title"] == batch["title"]

    shutil.rmtree(TMP, ignore_errors=True)


def test_host_rate_stream_windows(spark):
    from crawl4ai_scraper_spark.streaming import host_rate_stream, read_pages_stream

    shutil.rmtree(TMP, ignore_errors=True)
    pages_dir, out_chk = str(TMP / "pages"), str(TMP / "chk_rate")
    spec = WebSpec(n_hosts=2, max_secs=3, max_pages=4)
    rows = _write_host_batch(spark, spec, 0, pages_dir) + _write_host_batch(
        spark, spec, 1, pages_dir
    )

    rates = host_rate_stream(read_pages_stream(spark, pages_dir), "1 day", "2 days")
    q = (
        rates.writeStream.format("memory").queryName("rates")
        .outputMode("append")  # watermark-expired windows only
        .option("checkpointLocation", out_chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits nothing until the watermark passes — use a complete-
    # mode run for value assertions
    q2 = (
        rates.writeStream.format("memory").queryName("rates_all")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got = {
        (r["host"], str(r["window_start"])): r["fetches"]
        for r in spark.table("rates_all").collect()
    }
    # golden: group the known rows by host × day in plain python
    from collections import Counter

    golden = Counter()
    for r in rows:
        day = r["warc_ts"].strftime("%Y-%m-%d")
        host = r["url"].split("/")[2]
        golden[(host, day)] += 1
    spark_days = Counter()
    for (host, ws), n in got.items():
        spark_days[(host, ws[:10])] += n
    assert spark_days == golden
    shutil.rmtree(TMP, ignore_errors=True)


def test_host_sessions_stateful_stream(spark):
    """applyInPandasWithState sessionizer: gap-based per-host sessions match
    a plain-python oracle over the same rows (sessions closed either by a
    later in-stream gap or by the event-time timeout at stream end)."""
    from crawl4ai_scraper_spark.streaming import read_pages_stream
    from crawl4ai_scraper_spark.streaming.sessions import host_sessions_stream

    shutil.rmtree(TMP, ignore_errors=True)
    pages_dir = str(TMP / "pages")
    spec = WebSpec(n_hosts=2, max_secs=3, max_pages=4)
    rows = _write_host_batch(spark, spec, 0, pages_dir) + _write_host_batch(
        spark, spec, 1, pages_dir
    )

    GAP = 6 * 3600  # 6h gap splits sessions; warc_ts spans ~30 days
    q = (
        host_sessions_stream(read_pages_stream(spark, pages_dir), gap_seconds=GAP,
                             watermark="0 seconds")
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(TMP / "chk_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["host"], r["session_start"].isoformat()): (r["fetches"], r["bytes"])
        for r in spark.table("sessions").collect()
    }

    # plain-python oracle (all sessions — the final open one may not flush
    # until the next trigger, so compare as a superset + spot-check counts)
    from collections import defaultdict

    per_host = defaultdict(list)
    for r in rows:
        host = r["url"].split("/")[2]
        # Spark collect() returns naive UTC datetimes; normalize the oracle's
        per_host[host].append((r["warc_ts"].replace(tzinfo=None), len(r["html"])))
    want = {}
    open_sessions = set()
    for host, evts in per_host.items():
        evts.sort()
        start = end = None
        fetches = nbytes = 0
        for ts, nb in evts:
            if start is None:
                start, end, fetches, nbytes = ts, ts, 0, 0
            elif (ts - end).total_seconds() > GAP:
                want[(host, start.isoformat())] = (fetches, nbytes)
                start, end, fetches, nbytes = ts, ts, 0, 0
            end = max(end, ts)
            fetches += 1
            nbytes += nb
        want[(host, start.isoformat())] = (fetches, nbytes)
        open_sessions.add((host, start.isoformat()))

    assert len(want) > 4  # the gap actually splits sessions
    for key, val in got.items():
        assert want[key] == val, key
    # everything except possibly the last open session per host was emitted
    missing = set(want) - set(got)
    assert missing <= open_sessions, missing
    shutil.rmtree(TMP, ignore_errors=True)


def test_url_dedup_stream_within_and_across_drains(spark):
    """Streaming URL-seen dedup: duplicate page records for the same url are
    dropped within a drain AND across checkpointed restarts (state survives
    in the state store while the url is inside the watermark horizon)."""
    from crawl4ai_scraper_spark.streaming import read_pages_stream, url_dedup_stream

    shutil.rmtree(TMP, ignore_errors=True)
    pages_dir, out_dir, chk = str(TMP / "pages"), str(TMP / "uniq"), str(TMP / "chk_dedup")
    spec = WebSpec(n_hosts=2, max_secs=3, max_pages=4)

    # drain 1: the host-0 batch written TWICE (fetcher race: same urls, two files)
    batch = _write_host_batch(spark, spec, 0, pages_dir)
    _write_host_batch(spark, spec, 0, pages_dir)

    def drain():
        q = (
            url_dedup_stream(read_pages_stream(spark, pages_dir), watermark="3650 days")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == len(batch)
    assert got1.select("url").distinct().count() == len(batch)

    # drain 2: a file re-delivering already-seen urls plus genuinely new ones —
    # the re-deliveries are dropped by restored state, the new urls pass
    _write_host_batch(spark, spec, 0, pages_dir)
    new_rows = _write_host_batch(spark, spec, 1, pages_dir)
    drain()
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(batch) + len(new_rows)
    assert got2.select("url").distinct().count() == got2.count()
    shutil.rmtree(TMP, ignore_errors=True)


def test_stream_dedup_extract_composed(spark):
    """Composed incremental pipeline: duplicate page records are dropped
    BEFORE extraction, output docs are unique per url and byte-identical to
    the batch kernel; exactly-once across a second drain that re-delivers."""
    from crawl4ai_scraper_spark.streaming import stream_dedup_extract

    shutil.rmtree(TMP, ignore_errors=True)
    pages_dir, out_dir, chk = str(TMP / "pages"), str(TMP / "docs2"), str(TMP / "chk_de")
    spec = WebSpec(n_hosts=2, max_secs=3, max_pages=4)
    batch = _write_host_batch(spark, spec, 0, pages_dir)
    _write_host_batch(spark, spec, 0, pages_dir)  # duplicate delivery

    stream_dedup_extract(spark, pages_dir, out_dir, chk, watermark="3650 days")
    got = spark.read.parquet(out_dir)
    assert got.count() == len(batch)
    assert got.select("url").distinct().count() == len(batch)

    sample = batch[1]
    streamed = got.filter(F.col("url") == sample["url"]).collect()[0]
    ref = extract_record(sample["url"], sample["html"], "2025-01-01T00:00:00",
                         CleaningConfig.build())
    assert streamed["markdown"] == ref["markdown"]

    # second drain: only genuinely-new urls flow through to extraction
    _write_host_batch(spark, spec, 0, pages_dir)
    new_rows = _write_host_batch(spark, spec, 1, pages_dir)
    stream_dedup_extract(spark, pages_dir, out_dir, chk, watermark="3650 days")
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(batch) + len(new_rows)
    assert got2.select("url").distinct().count() == got2.count()
    shutil.rmtree(TMP, ignore_errors=True)


def test_content_dedup_stream_drops_mirrors(spark):
    """Streaming content dedup: the same html bytes arriving under a SECOND
    url (mirror / alias) are dropped within a drain and across restarts;
    genuinely new content passes. Composed behind the URL stage via
    stream_dedup_extract(content_dedup=True)."""
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.streaming import stream_dedup_extract

    shutil.rmtree(TMP, ignore_errors=True)
    pages_dir, out_dir, chk = str(TMP / "pages"), str(TMP / "cdocs"), str(TMP / "chk_cd")

    def write(rows):
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        with_pbucket(df, 8).write.mode("append").parquet(pages_dir)

    import datetime
    ts = datetime.datetime(2025, 1, 1)
    html = b"<html><head><title>m</title></head><body><p>mirrored body text</p></body></html>"
    other = b"<html><head><title>o</title></head><body><p>genuinely different</p></body></html>"
    write([("https://a.example/p", ts, html, "", "en"),
           ("https://b.example/mirror-of-p", ts, html, "", "en"),
           ("https://a.example/q", ts, other, "", "en")])
    stream_dedup_extract(spark, pages_dir, out_dir, chk,
                         watermark="3650 days", content_dedup=True)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 2  # mirror dropped before extraction
    assert got1.select("url").distinct().count() == 2

    # second drain: the mirror re-delivered under a THIRD url + new content
    third = b"<html><head><title>t</title></head><body><p>third body here</p></body></html>"
    write([("https://c.example/also-mirror", ts, html, "", "en"),
           ("https://a.example/r", ts, third, "", "en")])
    stream_dedup_extract(spark, pages_dir, out_dir, chk,
                         watermark="3650 days", content_dedup=True)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 3  # state survived the restart; only 'third' passed
    names = {u[0].split("/")[-1] for u in got2.select("url").collect()}
    # which alias of the mirrored bytes wins within the first drain is not
    # defined — but exactly ONE of them survives, plus q and r
    assert len(names & {"p", "mirror-of-p"}) == 1 and {"q", "r"} <= names
    shutil.rmtree(TMP, ignore_errors=True)


def test_distinct_estimate_stream_matches_batch_hll(spark):
    """The streaming HLL synopsis (bounded ≤2^b-row state), drained in two
    availableNow passes over the same checkpoint, must finish to EXACTLY
    the batch hll_distinct estimate over everything the stream saw —
    per-bucket max is order- and batching-insensitive."""
    from crawl4ai_scraper_spark.operators.sketches import hll_distinct, hll_finish
    from crawl4ai_scraper_spark.streaming import (
        distinct_estimate_stream,
        read_pages_stream,
    )

    shutil.rmtree(TMP, ignore_errors=True)
    pages_dir, chk = str(TMP / "pages"), str(TMP / "chk_hll")
    spec = WebSpec(n_hosts=3, max_secs=3, max_pages=4)

    def drain(qname):
        syn = distinct_estimate_stream(
            read_pages_stream(spark, pages_dir), key="url", b=8
        )
        q = (
            syn.writeStream.format("memory").queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(qname)

    _write_host_batch(spark, spec, 0, pages_dir)
    drain("hll_syn_1")

    # restart with MORE data: state resumes from the checkpoint
    _write_host_batch(spark, spec, 1, pages_dir)
    _write_host_batch(spark, spec, 2, pages_dir)
    syn = drain("hll_syn_2")
    assert syn.count() <= 256  # bounded state: at most 2^b buckets

    streamed = hll_finish(syn, b=8).collect()[0]
    batch = hll_distinct(spark.read.parquet(pages_dir), "url", b=8).collect()[0]
    assert streamed.estimate == batch.estimate
    assert streamed.n_zero_buckets == batch.n_zero_buckets
    shutil.rmtree(TMP, ignore_errors=True)


def test_transitions_stream_matches_batch_across_drains(spark):
    """Streaming transition extraction reproduces the batch lead()-window
    matrix exactly over two checkpointed drains — including the pairs that
    STRADDLE the drain boundary (carried by per-user single-row state)."""
    from crawl4ai_scraper_spark.operators.funnel import event_transitions
    from crawl4ai_scraper_spark.streaming import transitions_stream

    shutil.rmtree(TMP, ignore_errors=True)
    ev_dir, out_dir, chk = str(TMP / "ev"), str(TMP / "trans"), str(TMP / "chk_tr")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "event_type", "ts"
    )
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    cut = lo + (hi - lo) / 2
    early = events.filter(F.col("ts") <= F.lit(cut))
    late = events.filter(F.col("ts") > F.lit(cut))
    assert early.count() > 0 and late.count() > 0
    early.coalesce(1).write.parquet(ev_dir)

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(ev_dir)
        q = (
            transitions_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(out_dir).count()
    late.coalesce(1).write.mode("append").parquet(ev_dir)
    drain()

    got = {
        (r.from_type, r.to_type): r.n
        for r in spark.read.parquet(out_dir)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transitions(events).collect()
    }
    assert got == want
    # the second drain really contributed (boundary pairs included)
    assert sum(got.values()) > n1
    shutil.rmtree(TMP, ignore_errors=True)


def test_near_dup_flags_stream_vs_bank(spark):
    """Streaming near-dup screen: arriving docs probe the banked corpus's
    band table via a stream-static join; near-dups of banked docs flag, new
    content passes clean."""
    import shutil
    from datetime import datetime

    from crawl4ai_scraper_spark.operators.dedup import band_table
    from crawl4ai_scraper_spark.streaming.ingest import near_dup_flags_stream

    TMP2 = TMP / "neardup"
    shutil.rmtree(TMP2, ignore_errors=True)
    docs_dir = str(TMP2 / "docs")

    banked_text = ("the quick brown fox jumps over the lazy dog while the band "
                   "plays on and the crowd cheers loudly tonight")
    bank = spark.createDataFrame(
        [(0, banked_text)], "doc_id long, text string"
    )
    banked_bands = band_table(bank, "text", "doc_id")

    arriving = spark.createDataFrame(
        [
            (100, banked_text, datetime(2024, 1, 2)),          # verbatim re-post
            (101, banked_text[10:], datetime(2024, 1, 2)),     # lightly edited
            (102, "completely unrelated words about spark structured "
                  "streaming and parquet sinks tonight", datetime(2024, 1, 2)),
        ],
        "doc_id long, text string, warc_ts timestamp",
    )
    arriving.coalesce(1).write.mode("append").parquet(docs_dir)

    stream = spark.readStream.schema(
        "doc_id long, text string, warc_ts timestamp"
    ).parquet(docs_dir)
    flags = near_dup_flags_stream(stream, banked_bands)
    q = (
        flags.writeStream.format("memory").queryName("neardup_flags")
        .outputMode("complete")  # append would hold rows until the watermark passes
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["id"]: r for r in spark.sql("SELECT * FROM neardup_flags").collect()}
    assert rows[100]["is_suspect"] is True and rows[100]["n_hit_bands"] >= 1
    assert rows[101]["is_suspect"] is True
    assert rows[102]["is_suspect"] is False and rows[102]["n_hit_bands"] == 0
    shutil.rmtree(TMP2, ignore_errors=True)
