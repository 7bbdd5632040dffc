#!/usr/bin/env python3
"""Fold a crawl checkpoint's per-round frontier snapshots into one base
table (plans/checkpoint.py compact_checkpoint) — run between crawl sessions
to keep a 10^4-round checkpoint's file count flat:

    python scripts/compact_checkpoint.py --checkpoint <chk_dir> [--upto N]
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
    p = argparse.ArgumentParser(description="compact crawl checkpoint frontier snapshots")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--upto", type=int, default=None,
                   help="highest round to fold (default: latest committed)")
    args = p.parse_args(argv)

    from crawl4ai_scraper_spark.plans.checkpoint import compact_checkpoint, latest_round
    from crawl4ai_scraper_spark.session import build_session

    spark = build_session(app_name="compact-checkpoint")
    spark.sparkContext.setLogLevel("WARN")
    upto = compact_checkpoint(spark, args.checkpoint, args.upto)
    print(json.dumps({"compacted_upto": upto, "latest_round": latest_round(args.checkpoint)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
