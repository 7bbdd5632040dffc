#!/usr/bin/env python3
"""Re-organize an already-crawled documents snapshot under a new output
config — the reference's scrape-now-save-later flow
(crawler.crawl_urls(save_immediately=False) → OutputManager reconfiguration,
reference tests/test_output_manager.py) without recrawling anything:

    python scripts/reorganize_output.py \
        --documents /path/to/chk/outputs/documents \
        --out /path/to/new_layout \
        --organization-strategy domain --naming-convention title_based

Only (url, title) pass through the path kernel; the text columns are copied
through untouched (no shuffle, no re-extraction).
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
    p = argparse.ArgumentParser(description="Deferred output reconfiguration")
    p.add_argument("--documents", required=True, help="crawled documents parquet")
    p.add_argument("--out", required=True, help="output parquet path")
    p.add_argument("--organization-strategy", default="flat",
                   choices=["flat", "domain", "mirror", "date", "custom"])
    p.add_argument("--naming-convention", default="url_based",
                   choices=["url_based", "title_based", "timestamp", "hash"])
    p.add_argument("--no-metadata", action="store_true",
                   help="plain markdown payloads (no YAML front matter)")
    args = p.parse_args(argv)

    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import rematerialize_documents
    from crawl4ai_scraper_spark.session import build_session

    spark = build_session(app_name="reorganize-output")
    spark.sparkContext.setLogLevel("WARN")
    cfg = CrawlJobConfig(
        organization_strategy=args.organization_strategy,
        naming_convention=args.naming_convention,
        include_metadata=not args.no_metadata,
    )
    docs = spark.read.parquet(args.documents)
    out = rematerialize_documents(spark, docs, cfg, out_dir=args.out)
    print(json.dumps({"rows": out.count(), "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
