"""Pages-table IO and seed readers.

The pages table is the engine's "web": schema per BASELINE.json input_hint
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus a physical ``pbucket`` partition column = ``pmod(xxhash64(url), N)``.

Why pbucket: the fetch "join" (frontier ⋈ pages, SURVEY §2 O-4/O-18) is a
needle-in-haystack lookup — a few million frontier rows against ~10^10 stored
pages. Hash-bucketing the table by url and adding the bucket to the join key
turns the scan into partition-pruned reads of only the buckets the frontier
touches (plus Spark's runtime bloom filter inside each bucket). Iceberg's
``bucket(N, url)`` partition transform is the same idea; no Iceberg jars ship
with this PySpark build, so plain parquet partitioning carries it.

Synthesis is DISTRIBUTED: hosts are sharded with ``spark.range`` and each
executor renders its hosts' pages via the deterministic webgen — nothing is
materialized on the driver, so the same code scales the corpus up for bench.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
DEFAULT_PBUCKETS = 32


def with_pbucket(df: DataFrame, n_buckets: int = DEFAULT_PBUCKETS) -> DataFrame:
    return df.withColumn("pbucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int"))


def synthesize_pages(
    spark: SparkSession,
    out_path: str,
    n_hosts: int = 4,
    max_secs: int = 4,
    max_pages: int = 8,
    seed: int = 42,
    n_buckets: int = DEFAULT_PBUCKETS,
    golden_text: bool = True,
) -> str:
    """Render the synthetic web to a bucketed parquet pages table.

    Parallelism unit = a SECTION shard (host, sec), not a host: a hot host's
    pages render across all its section shards, so a skewed corpus (host 0
    carries most of the web) still synthesizes on every core. The write is
    repartitioned to the bucket layout — one file per pbucket, url-hash
    balanced — instead of fanning every task out into all bucket dirs."""
    from crawl4ai_scraper_spark.fixtures.webgen import WebSpec, iter_shard_urls, iter_shards, page_row

    spec = WebSpec(n_hosts=n_hosts, max_secs=max_secs, max_pages=max_pages, seed=seed)
    shards = spark.createDataFrame(list(iter_shards(spec)), "k int, i int")

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for k, i in zip(pdf["k"], pdf["i"]):
                rows: List[dict] = []
                for url in iter_shard_urls(spec, int(k), int(i)):
                    row = page_row(spec, url, golden_text=golden_text)
                    if row is not None:
                        rows.append(row)
                yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    n_shards = shards.count()
    pages = (
        shards.repartition(min(n_shards, 1024))
        .mapInPandas(render, schema=PAGES_SCHEMA)
    )
    (
        with_pbucket(pages, n_buckets)
        .repartition(n_buckets, F.col("pbucket"))
        .write.mode("overwrite")
        .partitionBy("pbucket")
        .parquet(out_path)
    )
    with open(os.path.join(out_path, "_table_meta.json"), "w") as fh:
        json.dump({"n_buckets": n_buckets}, fh)
    return out_path


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def pages_n_buckets(path: str, default: int = DEFAULT_PBUCKETS) -> int:
    """The bucket count the table was WRITTEN with — the join side must
    compute pbucket with the same modulus or the lookup silently misses."""
    meta = os.path.join(path, "_table_meta.json")
    if os.path.exists(meta):
        with open(meta) as fh:
            return int(json.load(fh)["n_buckets"])
    return default


def seed_frame(spark: SparkSession, seeds: List[str]) -> DataFrame:
    """Seed list → one-column DataFrame with the interactive prompts' scheme
    fix-up (main.py:247-249 / 337-356) applied natively."""
    df = spark.createDataFrame([(s.strip(),) for s in seeds if s.strip()], "url string")
    return df.withColumn(
        "url",
        F.when(F.col("url").rlike("^https?://"), F.col("url")).otherwise(
            F.concat(F.lit("https://"), F.col("url"))
        ),
    )


def seeds_from_file(spark: SparkSession, path: str) -> DataFrame:
    """Seed-file reader ≙ main.py:358-369: skip blanks and ``#`` comments,
    then the same scheme fix-up."""
    lines = (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter((F.length("url") > 0) & (~F.col("url").startswith("#")))
    )
    return lines.withColumn(
        "url",
        F.when(F.col("url").rlike("^https?://"), F.col("url")).otherwise(
            F.concat(F.lit("https://"), F.col("url"))
        ),
    )
