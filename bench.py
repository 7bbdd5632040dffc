#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32; master = local[N]).

Two workload groups:
* contract queries — the heavy relational/training-data operators over the
  driver's testdata at SF (timed individually);
* the crawl engine — synthesize a bench web corpus (cached across runs) and
  run a full frontier crawl + extraction; reported both as seconds and as
  urls/sec (crawl_urls_per_sec in the queries dict).

Scaling evidence (N vs 4N cores) is produced by scripts/scaling_bench.py,
which shells out to this file at two parallelism levels and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_WEB = str(REPO / ".tmp" / "bench_pages_v3")
# Hot host 0 carries the crawl (same-domain gating keeps the crawl on the
# seed's host): 40 secs × 40 pages × (page + ?v=1) + extras ≈ 7.5k URLs.
CRAWL_SPEC = dict(n_hosts=4, max_secs=40, max_pages=40)

# The headline operator subset (heaviest / most representative).
QUERY_NAMES = [
    "pushdown_filter_agg",
    "fetch_equi_join",
    "broadcast_rules_join",
    "first_appender_window",
    "budget_truncation",
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "lang_id_stopwords",
    "quality_score",
    "token_counts",
    "doc_fingerprint",
    "multimodal_decode_meta",
]


def bench_queries(spark) -> dict:
    from crawl4ai_scraper_spark import contract

    registry = contract.queries()
    timings = {}
    for name in QUERY_NAMES:
        fn = registry[name]
        start = time.perf_counter()
        # count() forces full execution without driver-side collect of rows
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - start, 3)
    return timings


def bench_crawl(spark) -> dict:
    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl
    from crawl4ai_scraper_spark.sources.pages import read_pages, synthesize_pages

    marker = Path(BENCH_WEB) / "_SUCCESS_META"
    if not marker.exists():
        shutil.rmtree(BENCH_WEB, ignore_errors=True)
        synthesize_pages(spark, BENCH_WEB, **CRAWL_SPEC)
        marker.write_text(json.dumps(CRAWL_SPEC))
    pages = read_pages(spark, BENCH_WEB)

    chk = str(REPO / ".tmp" / f"bench_chk_{CPUS}")
    shutil.rmtree(chk, ignore_errors=True)
    cfg = CrawlJobConfig(max_depth=3, max_pages=100_000, shuffle_partitions=max(8, CPUS))
    start = time.perf_counter()
    res = run_crawl(spark, pages, "https://site0.example/", cfg, chk)
    elapsed = time.perf_counter() - start
    visited = res.visited.count()
    extracted = res.summary.get("successful", 0)
    return {
        "crawl_sec": round(elapsed, 3),
        "crawl_visited": visited,
        "crawl_extracted": extracted,
        "crawl_urls_per_sec": round((visited + extracted) / elapsed, 2),
    }


def main():
    from crawl4ai_scraper_spark.session import build_session

    spark = build_session(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=max(8, CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    total_start = time.perf_counter()
    timings = bench_queries(spark)
    crawl = bench_crawl(spark)
    total = round(time.perf_counter() - total_start, 3)

    queries = dict(timings)
    queries["crawl_full"] = crawl["crawl_sec"]
    queries["crawl_urls_per_sec"] = crawl["crawl_urls_per_sec"]

    out = {
        "metric": "bench_total_sec (operators @ SF + full frontier crawl; "
        "crawl_urls_per_sec = (visited+extracted)/sec)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "crawl": crawl,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
