"""Structured Streaming surfaces: continuous page ingest + extraction.

The reference crawler is batch-iterative, and so is this engine's BFS
(SURVEY §2.9: level-synchronous rounds ARE the correct mapping of a FIFO
frontier — exact crawl-order parity needs a barrier per level). What IS
streaming-shaped in a production crawl lakehouse is everything around the
frontier:

* new fetched pages land as files (WARC dumps, fetcher output) and must be
  text-extracted exactly once, incrementally — ``stream_extract``;
* per-host fetch-rate accounting for politeness monitoring needs event-time
  windows with late data handled — ``host_rate_stream`` (watermark +
  windowed count, the canonical Structured Streaming stateful aggregate).

Both run on ``readStream``/``writeStream`` with checkpointed exactly-once
file-source progress — ``Trigger.AvailableNow`` drains whatever is new and
stops, which is how an incremental extraction job runs from cron/Airflow on
a real cluster.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.functions.udfs import EXTRACTED_SCHEMA, extract_documents

# File-source schema: the pages table (BASELINE.json input_hint) plus the
# physical bucket column the batch writer adds.
STREAM_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, pbucket int"
)


def read_pages_stream(
    spark: SparkSession,
    pages_path: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming view of a pages directory: every parquet file that appears
    under it is processed exactly once (file-source tracks progress in the
    sink's checkpoint)."""
    reader = spark.readStream.schema(STREAM_PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_path)


def stream_extract(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    checkpoint: str,
    cleaning_kwargs: Optional[dict] = None,
    run_ts_iso: str = "2025-01-01T00:00:00",
    await_termination: bool = True,
):
    """Incremental extraction: drain new page files → byte-identical text
    records appended to ``out_path``, exactly once (AvailableNow trigger).

    The extraction UDF is the SAME Arrow kernel the batch pass uses
    (functions/udfs.py extract_documents), so a document extracted by the
    stream is byte-identical to one extracted by the batch engine."""
    stream = read_pages_stream(spark, pages_path).select(
        "url", "html", F.lit(run_ts_iso).alias("crawled_at")
    )
    docs = stream.mapInPandas(extract_documents(cleaning_kwargs or {}), EXTRACTED_SCHEMA)
    query = (
        docs.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query


def url_dedup_stream(
    pages_stream: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming URL-seen dedup — the incremental analog of the frontier's
    visited anti-join (O-16): of all page records for the same url arriving
    within the watermark horizon, only the FIRST survives; re-fetches and
    fetcher races are dropped before they reach the extraction sink.

    Built on ``dropDuplicatesWithinWatermark``: per-url state lives in the
    streaming state store (RocksDB on a real cluster), sharded by url hash —
    uniform keys, no skew — and is evicted once the event-time watermark
    passes, so state stays bounded by (url arrival rate × watermark) instead
    of growing with the whole 10^10-URL history. The batch engine's
    bloom-gated anti-join covers the unbounded-history case; this covers the
    always-on ingest path."""
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def content_dedup_stream(
    pages_stream: DataFrame,
    watermark: Optional[str] = "1 day",
) -> DataFrame:
    """Streaming CONTENT dedup — the incremental analog of the batch
    ``dedup_exact`` groupBy: of all records whose html bytes hash identically
    within the watermark horizon (mirrors, tracking-parameter aliases, CDN
    hosts), only the first survives. Same state-store mechanics as
    ``url_dedup_stream`` (keys are md5 hex — uniform, no skew; state evicted
    at the watermark), composable behind it so a re-fetch never even reaches
    the content hash. Pass ``watermark=None`` when the input stream already
    carries one (chained after url_dedup_stream — Spark forbids redefining
    it)."""
    if watermark is not None:
        pages_stream = pages_stream.withWatermark("warc_ts", watermark)
    return (
        pages_stream
        .withColumn("_content_md5", F.md5(F.col("html")))
        .dropDuplicatesWithinWatermark(["_content_md5"])
        .drop("_content_md5")
    )


def stream_dedup_extract(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    checkpoint: str,
    watermark: str = "1 day",
    cleaning_kwargs: Optional[dict] = None,
    run_ts_iso: str = "2025-01-01T00:00:00",
    await_termination: bool = True,
    content_dedup: bool = False,
):
    """The composed incremental ingest pipeline: URL-seen dedup IN FRONT OF
    extraction — re-fetches are dropped from state before any Arrow compute
    is spent on them, and the sink stays append-only-unique. One streaming
    query: file source → dropDuplicatesWithinWatermark → mapInPandas
    extraction → parquet sink, exactly-once across restarts.
    ``content_dedup`` chains the content-hash stage behind the URL stage
    (mirror suppression: same bytes under a second url never reach Arrow)."""
    deduped = url_dedup_stream(read_pages_stream(spark, pages_path), watermark)
    if content_dedup:
        deduped = content_dedup_stream(deduped, watermark=None)
    docs = deduped.select(
        "url", "html", F.lit(run_ts_iso).alias("crawled_at")
    ).mapInPandas(extract_documents(cleaning_kwargs or {}), EXTRACTED_SCHEMA)
    query = (
        docs.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query


def distinct_estimate_stream(
    pages_stream: DataFrame, key: str = "url", b: int = 12, salt: str = "hll1"
) -> DataFrame:
    """Streaming HyperLogLog synopsis: the per-bucket max-rank aggregation
    maintained incrementally by the state store → (bucket, max_rank).

    The crawl-monitoring question "how many distinct URLs have we ever
    ingested?" kept live without ever storing the URL set: state is AT
    MOST 2^b rows no matter how many pages flow through (HLL merge is a
    per-bucket max, which is exactly what an incremental aggregation
    state update is), and the synopsis survives restarts through the
    checkpoint like any streaming aggregate. Finish a materialized
    synopsis with operators.sketches.hll_finish(df, b) — the estimate
    equals the batch hll_distinct over everything the stream has seen
    (tested in tests/test_streaming.py)."""
    from crawl4ai_scraper_spark.operators.sketches import hll_bucket_rank

    bucket, rank = hll_bucket_rank(F.col(key), b, salt)
    return (
        pages_stream.select(bucket, rank)
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def host_rate_stream(
    pages_stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-host fetch counts over event-time (warc_ts) windows with a
    watermark for late arrivals — the politeness-monitoring aggregate.
    Returns (host, window_start, window_end, fetches, bytes)."""
    hosts = pages_stream.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.col("warc_ts"),
        F.length(F.col("html")).alias("nbytes"),
    )
    return (
        hosts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("fetches"), F.sum("nbytes").alias("bytes"))
        .select(
            "host",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "fetches",
            "bytes",
        )
    )


def near_dup_flags_stream(
    docs_stream: DataFrame,
    banked_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "warc_ts",
    watermark: Optional[str] = "1 day",
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Streaming NEAR-dup screen against the banked corpus: each arriving
    document is minhash-banded (pure column math — the same
    ``dedup.band_table`` expressions the batch path uses) and its band keys
    are probed against the static band table of the already-accepted corpus
    via a STREAM-STATIC equi-join; a watermarked per-doc aggregation then
    collapses the n_bands probe rows into one verdict row.

    This is the incremental complement of ``content_dedup_stream`` (exact
    bytes) and batch ``minhash_lsh_pairs`` (within-corpus): it catches the
    lightly-edited re-post of something ALREADY IN THE BANK the moment it
    arrives, at band-key cost — no text shuffles, state bounded by the
    watermark, the static side maintained incrementally by appending
    accepted docs' band rows. Flagged docs are candidates: route them to
    the batch exact-Jaccard verifier, don't drop on the screen alone.

    Returns a streaming frame (id, <ts_col>, n_hit_bands, is_suspect)."""
    from crawl4ai_scraper_spark.operators.dedup import band_table

    src = docs_stream
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    probes = band_table(
        src, text_col, id_col,
        k=k, n_hashes=n_hashes, n_bands=n_bands, carry=[ts_col],
    )
    bank = banked_bands.select("band", "bhash").distinct().withColumn("m", F.lit(1))
    joined = probes.join(bank, ["band", "bhash"], "left")
    return (
        joined.groupBy("id", ts_col)
        .agg(F.sum(F.coalesce(F.col("m"), F.lit(0))).alias("n_hit_bands"))
        .select(
            "id",
            ts_col,
            F.col("n_hit_bands").cast("int").alias("n_hit_bands"),
            (F.col("n_hit_bands") > 0).alias("is_suspect"),
        )
    )
