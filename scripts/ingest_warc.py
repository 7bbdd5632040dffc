#!/usr/bin/env python3
"""Ingest Common-Crawl-style WARC shards into the engine's bucketed pages
table (the format every other job consumes):

    spark-submit --py-files crawl4ai_scraper_spark.zip scripts/ingest_warc.py \
        --warc 's3://cc/segments/*.warc.gz' --out s3://lake/pages --buckets 1024

One task per shard (binaryFile), Arrow-side record parsing, distributed
re-bucketed write — no driver-side data movement.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main(argv=None):
    p = argparse.ArgumentParser(description="WARC → pages table ingestion")
    p.add_argument("--warc", required=True, help="WARC shard path/glob (*.warc, *.warc.gz)")
    p.add_argument("--out", required=True, help="output pages table path")
    p.add_argument("--buckets", type=int, default=32, help="pbucket count")
    args = p.parse_args(argv)

    from crawl4ai_scraper_spark.session import build_session
    from crawl4ai_scraper_spark.sources.pages import with_pbucket
    from crawl4ai_scraper_spark.sources.warc import read_warc

    spark = build_session(app_name="warc-ingest")
    spark.sparkContext.setLogLevel("WARN")
    pages = with_pbucket(read_warc(spark, args.warc), args.buckets)
    pages.write.mode("overwrite").partitionBy("pbucket").parquet(args.out)
    # bucket-count marker: the crawl's fetch probe must use the same modulus.
    # builtin open() only works for local paths; on object stores
    # (s3://, hdfs://) pass --n-buckets to submit_crawl.py instead.
    if "://" not in args.out:
        with open(f"{args.out}/_table_meta.json", "w") as fh:
            json.dump({"n_buckets": args.buckets}, fh)
    else:
        print(f"note: no _table_meta.json on {args.out} — "
              f"run crawls with --n-buckets {args.buckets}", file=sys.stderr)
    out = spark.read.parquet(args.out)
    print(json.dumps({"pages": out.count(), "out": args.out, "buckets": args.buckets}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
