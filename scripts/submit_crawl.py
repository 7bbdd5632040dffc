#!/usr/bin/env python3
"""Cluster job entry point — the spark-submit surface of the engine.

    spark-submit --py-files crawl4ai_scraper_spark.zip scripts/submit_crawl.py \
        --pages s3://lake/pages --seed https://example.org/ \
        --checkpoint s3://lake/crawls/run-42 \
        --max-depth 2 --max-pages 50 --patterns 'https://example.org/docs/**' \
        --resume

Locally (this sandbox) it runs the same job on local[N]:

    python scripts/submit_crawl.py --pages /root/repo/.tmp/bench_pages_v4 \
        --seed https://site0.example/ --checkpoint /root/repo/.tmp/job_chk \
        --max-depth 2 --max-pages 100

The driver loop holds four integers of state; everything else lives in the
checkpointed snapshot tables, so ``--resume`` continues an interrupted crawl
from its last committed round (exactly-once commit via manifest rename).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Frontier crawl + extraction job")
    p.add_argument("--pages", required=True, help="pages table path (parquet, pbucket layout)")
    p.add_argument("--seed", action="append", required=True,
                   help="seed URL (repeat for multi-seed discovery union)")
    p.add_argument("--checkpoint", required=True, help="checkpoint/snapshot root")
    p.add_argument("--max-depth", type=int, default=2)
    p.add_argument("--max-pages", type=int, default=50)
    p.add_argument("--patterns", action="append", default=[])
    p.add_argument("--exclude-patterns", action="append", default=[])
    p.add_argument("--include-external", action="store_true")
    p.add_argument("--delay", type=float, default=1.0, help="politeness delay (virtual s)")
    p.add_argument("--host-rules", help="parquet path: host, crawl_delay, disallow_prefixes")
    p.add_argument("--organization-strategy", default="flat")
    p.add_argument("--naming-convention", default="url_based")
    p.add_argument("--selector-template",
                   choices=["blog", "news", "documentation", "ecommerce", "forum"],
                   help="selector-based extraction template (CSS/XPath subset engine)")
    p.add_argument("--css-selector", action="append", default=[],
                   help="explicit content CSS selector (repeatable)")
    p.add_argument("--exclude-css-selector", action="append", default=[])
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dry-run", action="store_true",
                   help="discovery only (≙ reference --dry-run): no extraction pass")
    p.add_argument("--preset", choices=["default", "fast", "comprehensive", "api_docs"])
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from crawl4ai_scraper_spark.config import PRESETS, CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl, run_multi_seed
    from crawl4ai_scraper_spark.session import build_session
    from crawl4ai_scraper_spark.sources.pages import pages_n_buckets, read_pages

    import dataclasses
    cfg = dataclasses.replace(PRESETS[args.preset]) if args.preset else CrawlJobConfig()
    cfg.max_depth = args.max_depth
    cfg.max_pages = args.max_pages
    cfg.patterns = args.patterns
    cfg.exclude_patterns = args.exclude_patterns
    cfg.include_external = args.include_external
    cfg.delay_between_requests = args.delay
    cfg.organization_strategy = args.organization_strategy
    cfg.naming_convention = args.naming_convention
    cfg.selector_template = args.selector_template or ""
    cfg.content_css_selectors = args.css_selector
    cfg.exclude_css_selectors = args.exclude_css_selector
    if args.shuffle_partitions:
        cfg.shuffle_partitions = args.shuffle_partitions

    spark = build_session(app_name="crawl-job", shuffle_partitions=cfg.shuffle_partitions)
    spark.sparkContext.setLogLevel("WARN")
    pages = read_pages(spark, args.pages)
    n_buckets = pages_n_buckets(args.pages)
    host_rules = read_pages(spark, args.host_rules) if args.host_rules else None

    if len(args.seed) > 1:
        discovered = run_multi_seed(spark, pages, args.seed, cfg, args.checkpoint,
                                    host_rules=host_rules, n_buckets=n_buckets)
        print(json.dumps({"multi_seed": True, "discovered": discovered.count()}))
        return

    res = run_crawl(spark, pages, args.seed[0], cfg, args.checkpoint,
                    host_rules=host_rules, resume=args.resume,
                    extract=not args.dry_run, n_buckets=n_buckets)
    out = {"rounds": res.rounds, **res.summary}
    if args.dry_run:
        # ≙ crawl_with_discovery dry-run payload (reference crawler.py:620-637)
        out["dry_run"] = True
        out["file_preview"] = [r["url"] for r in res.discovered.limit(10).collect()]
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
