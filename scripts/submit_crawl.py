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
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Frontier crawl + extraction job")
    p.add_argument("--pages", help="pages table path (parquet, pbucket layout)")
    p.add_argument("--seed", action="append", default=[],
                   help="seed URL (repeat for multi-seed discovery union)")
    p.add_argument("--checkpoint", help="checkpoint/snapshot root")
    p.add_argument("--max-depth", type=int, default=None)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--patterns", action="append", default=[])
    p.add_argument("--exclude-patterns", action="append", default=[])
    p.add_argument("--include-external", action="store_true")
    p.add_argument("--delay", type=float, default=None, help="politeness delay (virtual s)")
    p.add_argument("--host-rules", help="parquet path: host, crawl_delay, disallow_prefixes")
    p.add_argument("--n-buckets", type=int, default=None,
                   help="pbucket modulus of the pages table (overrides the "
                        "_table_meta.json marker; REQUIRED to be correct — a "
                        "mismatched modulus silently misses pages)")
    p.add_argument("--robots-from-pages", action="store_true",
                   help="derive host rules by parsing the robots.txt documents "
                        "stored in the pages table (kernel/robots.py)")
    p.add_argument("--organization-strategy", default=None)
    p.add_argument("--naming-convention", default=None)
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
    # Named-config store (≙ config_manager.py CRUD; files live in conf/ by
    # default, one JSON per config):
    p.add_argument("--config", help="start from a NAMED stored config")
    p.add_argument("--config-dir", help="config store directory (default: repo conf/)")
    p.add_argument("--save-config", metavar="NAME",
                   help="save the effective config under NAME and continue")
    p.add_argument("--list-configs", action="store_true",
                   help="list stored configs as JSON and exit")
    p.add_argument("--delete-config", metavar="NAME",
                   help="delete a stored config and exit")
    p.add_argument("--export-config", nargs=2, metavar=("NAME", "PATH"),
                   help="export a stored config to PATH and exit")
    p.add_argument("--import-config", metavar="PATH",
                   help="import a config file into the store and exit")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--hygiene", action="store_true",
                   help="enable crawler-trap hygiene screens on the frontier")
    p.add_argument("--trap-screen", action="store_true",
                   help="statistical trap screening: per-round (host, "
                        "path-template) duplicate-content detection; flagged "
                        "templates are blocked for later rounds")
    p.add_argument("--trap-min-urls", type=int, default=None)
    p.add_argument("--trap-max-dup-ratio", type=float, default=None)
    p.add_argument("--host-cap", type=int, default=None,
                   help="max NEW urls enqueued per host per round (fairness cap)")
    p.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default=None,
                   help="URL-seen pre-filter family (north_rule Bloom/cuckoo)")
    p.add_argument("--spam-threshold", type=float, default=None,
                   help="drop candidate links whose weighted banned-term URL "
                        "score reaches this (RefinedWeb-style soft screen)")
    p.add_argument("--blocked-hosts", default=None,
                   help="host blocklist: parquet path (first column = host) "
                        "or a .txt file with one host per line")
    # Priority frontier (our extension; north_star "BFS-with-priority"):
    p.add_argument("--priority-signal", default=None,
                   help="parquet path of a (url, priority) or (host, priority) "
                        "signal frame — pagerank, host reputation, sitemap "
                        "lastmod…; switches frontier_order to 'priority'")
    p.add_argument("--recrawl-from", default=None, metavar="HISTORY",
                   help="REFRESH crawl: parquet revision history "
                        "(url, fetched_at, content-hashable column) → "
                        "per-url change-rate priorities (Cho/Garcia-Molina) "
                        "feed the frontier; switches frontier_order to "
                        "'priority'")
    p.add_argument("--history-key", default="url")
    p.add_argument("--history-ts", default="fetched_at")
    p.add_argument("--history-content", default="content")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from crawl4ai_scraper_spark.config import PRESETS, ConfigStore, CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl, run_multi_seed
    from crawl4ai_scraper_spark.session import build_session
    from crawl4ai_scraper_spark.sources.pages import pages_n_buckets, read_pages

    store = ConfigStore(args.config_dir) if args.config_dir else ConfigStore()
    # store-only maintenance modes: act and exit (no Spark session needed)
    if args.list_configs:
        print(json.dumps(store.list(), indent=2))
        return
    if args.delete_config:
        ok = store.delete(args.delete_config)
        print(json.dumps({"deleted": ok, "name": args.delete_config}))
        return
    if args.export_config:
        name, path = args.export_config
        print(json.dumps({"exported": store.export_config(name, Path(path)), "name": name}))
        return
    if args.import_config:
        final = store.import_config(Path(args.import_config))
        print(json.dumps({"imported": final is not None, "name": final}))
        return

    import dataclasses
    if args.config:
        cfg = store.load(args.config)
        if cfg is None:
            p_err = f"named config {args.config!r} not found in {store.config_dir}"
            raise SystemExit(p_err)
    elif args.preset:
        cfg = dataclasses.replace(PRESETS[args.preset])
    else:
        cfg = CrawlJobConfig()
    # CLI flags override the base config only when explicitly given
    if args.max_depth is not None:
        cfg.max_depth = args.max_depth
    if args.max_pages is not None:
        cfg.max_pages = args.max_pages
    if args.patterns:
        cfg.patterns = args.patterns
    if args.exclude_patterns:
        cfg.exclude_patterns = args.exclude_patterns
    if args.include_external:
        cfg.include_external = True
    if args.delay is not None:
        cfg.delay_between_requests = args.delay
    if args.organization_strategy is not None:
        cfg.organization_strategy = args.organization_strategy
    if args.naming_convention is not None:
        cfg.naming_convention = args.naming_convention
    if args.selector_template:
        cfg.selector_template = args.selector_template
    if args.css_selector:
        cfg.content_css_selectors = args.css_selector
    if args.exclude_css_selector:
        cfg.exclude_css_selectors = args.exclude_css_selector
    if args.shuffle_partitions:
        cfg.shuffle_partitions = args.shuffle_partitions
    if args.hygiene:
        cfg.hygiene_enabled = True
    if args.trap_screen:
        cfg.trap_screen = True
    if args.trap_min_urls is not None:
        cfg.trap_min_urls = args.trap_min_urls
    if args.trap_max_dup_ratio is not None:
        cfg.trap_max_dup_ratio = args.trap_max_dup_ratio
    if args.host_cap is not None:
        cfg.max_new_urls_per_host_round = args.host_cap
    if args.seen_filter:
        cfg.seen_filter = args.seen_filter
    if args.spam_threshold is not None:
        cfg.url_spam_threshold = args.spam_threshold

    if args.save_config:
        store.save(args.save_config, cfg)

    if not args.pages or not args.seed or not args.checkpoint:
        raise SystemExit("--pages, --seed and --checkpoint are required to run a crawl")

    # Self-size from the input's parquet footers (VERDICT r4 #2): shuffle
    # partitions + driver heap derive from input bytes/rows, asserted
    # against host memory at submit time (fail fast, not mid-crawl).
    # --shuffle-partitions / SPARK_GRAFT_SHUFFLE / SPARK_DRIVER_MEMORY
    # remain explicit overrides.
    from crawl4ai_scraper_spark.sizing import autosize_path

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sizing = autosize_path(args.pages, cpus)
    cfg.shuffle_partitions = (args.shuffle_partitions
                              or sizing.shuffle_partitions)
    spark = build_session(app_name="crawl-job",
                          shuffle_partitions=cfg.shuffle_partitions,
                          extra_conf={"spark.driver.memory": sizing.driver_memory})
    print(f"[sizing] input={sizing.stats.total_bytes/1e9:.2f} GB "
          f"rows={sizing.stats.total_rows:,} -> shuffle_partitions="
          f"{cfg.shuffle_partitions} driver_memory={sizing.driver_memory}"
          f"{' (overridden)' if sizing.shuffle_overridden or sizing.driver_overridden or args.shuffle_partitions else ''}",
          file=sys.stderr)
    spark.sparkContext.setLogLevel("WARN")
    pages = read_pages(spark, args.pages)
    n_buckets = args.n_buckets if args.n_buckets else pages_n_buckets(args.pages)
    if args.host_rules:
        host_rules = read_pages(spark, args.host_rules)
    elif args.robots_from_pages:
        from crawl4ai_scraper_spark.plans.politeness import rules_from_robots

        host_rules = rules_from_robots(pages)
    else:
        host_rules = None

    blocked_hosts = None
    if args.blocked_hosts:
        if args.blocked_hosts.endswith(".txt"):
            hosts = [(h,) for h in map(str.strip, Path(args.blocked_hosts).read_text().splitlines())
                     if h and not h.startswith("#")]
            blocked_hosts = spark.createDataFrame(hosts, "host string")
        else:
            blocked_hosts = spark.read.parquet(args.blocked_hosts)

    priority_col = None
    if args.priority_signal:
        # caller-supplied (url|host, priority) frame; persist — the round
        # loop consumes it once per round
        priority_col = spark.read.parquet(args.priority_signal).persist()
        cfg.frontier_order = "priority"
    elif args.recrawl_from:
        from crawl4ai_scraper_spark.operators.temporal import recrawl_priorities

        history = spark.read.parquet(args.recrawl_from)
        priority_col = recrawl_priorities(
            history, args.history_key, args.history_ts, args.history_content
        ).persist()
        cfg.frontier_order = "priority"

    if len(args.seed) > 1:
        discovered = run_multi_seed(spark, pages, args.seed, cfg, args.checkpoint,
                                    host_rules=host_rules, n_buckets=n_buckets,
                                    blocked_hosts=blocked_hosts)
        print(json.dumps({"multi_seed": True, "discovered": discovered.count()}))
        return

    res = run_crawl(spark, pages, args.seed[0], cfg, args.checkpoint,
                    host_rules=host_rules, resume=args.resume,
                    extract=not args.dry_run, n_buckets=n_buckets,
                    blocked_hosts=blocked_hosts, priority_col=priority_col)
    out = {"rounds": res.rounds, **res.summary}
    if args.dry_run:
        # ≙ crawl_with_discovery dry-run payload (reference crawler.py:620-637)
        out["dry_run"] = True
        out["file_preview"] = [r["url"] for r in res.discovered.limit(10).collect()]
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
