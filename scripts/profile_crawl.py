#!/usr/bin/env python3
"""Phase-level profiling of the bench crawl: discovery rounds vs extraction,
at a given parallelism. Usage:
    SPARK_GRAFT_PROFILE=1 python scripts/profile_crawl.py [cpus]
Uses the same cached corpus as bench.py."""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def main():
    import bench
    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl, extract_pass
    from crawl4ai_scraper_spark.session import build_session
    from crawl4ai_scraper_spark.sources.pages import pages_n_buckets, read_pages

    spark = build_session(app_name="profile", master=f"local[{CPUS}]",
                          shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    bench.ensure_corpus(spark)
    pages = read_pages(spark, bench.BENCH_WEB)
    n_buckets = pages_n_buckets(bench.BENCH_WEB)
    bench.warmup_workers(spark, pages)

    chk = str(REPO / ".tmp" / f"profile_chk_{CPUS}")
    shutil.rmtree(chk, ignore_errors=True)
    cfg = CrawlJobConfig(max_depth=3, max_pages=10_000_000,
                         shuffle_partitions=max(8, CPUS))

    t0 = time.perf_counter()
    res = run_crawl(spark, pages, "https://site0.example/", cfg, chk,
                    extract=False, n_buckets=n_buckets)
    t_discovery = time.perf_counter() - t0
    n_visited = res.visited.count()

    t0 = time.perf_counter()
    docs, summary = extract_pass(spark, pages, res.discovered, cfg, chk, n_buckets,
                                 n_discovered=res.summary["discovered"])
    t_extract = time.perf_counter() - t0
    shutil.rmtree(chk, ignore_errors=True)

    print(json.dumps({
        "cpus": CPUS,
        "rounds": res.rounds,
        "visited": n_visited,
        "extracted": summary.get("successful"),
        "discovery_sec": round(t_discovery, 2),
        "discovery_sec_per_round": round(t_discovery / max(res.rounds, 1), 2),
        "extract_sec": round(t_extract, 2),
    }))


if __name__ == "__main__":
    main()
