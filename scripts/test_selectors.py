#!/usr/bin/env python3
"""Selector debugging tool over the pages table (≙ the reference's
selector-test flow, main.py:534-604 + selector_utils.py:262-289).

Single-page mode — fetch ONE stored page and report each selector's validity,
match count and preview, plus the css/xpath/combined extraction outputs:

    python scripts/test_selectors.py --pages .tmp/pytest/pages3 \
        --url https://site0.example/ --css article --css .post-content \
        --xpath "//main//p"

Corpus mode (no --url) — evaluate the selectors against a SAMPLE of pages in
one Arrow pass and report per-selector aggregate match-rates (pages matched,
total matches). This is the Spark-shaped version of "does my selector work on
this site": the html column is only decoded inside the batch UDF, nothing
wide shuffles.

    python scripts/test_selectors.py --pages .tmp/pytest/pages3 \
        --template blog --sample 200
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Iterator

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Selector test tool over the pages table")
    p.add_argument("--pages", required=True, help="pages table path (parquet)")
    p.add_argument("--url", help="test ONE stored page (omit for corpus mode)")
    p.add_argument("--css", action="append", default=[], help="CSS selector (repeatable)")
    p.add_argument("--xpath", action="append", default=[], help="XPath expression (repeatable)")
    p.add_argument("--template",
                   choices=["blog", "news", "documentation", "ecommerce", "forum"],
                   help="use a selector template's css+xpath lists")
    p.add_argument("--sample", type=int, default=100,
                   help="corpus mode: number of pages to sample")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from crawl4ai_scraper_spark.kernel.selectors import get_template

    css, xpath = list(args.css), list(args.xpath)
    if args.template:
        tpl = get_template(args.template) or {}
        css += tpl.get("css", [])
        xpath += tpl.get("xpath", [])
    if not css and not xpath:
        raise SystemExit("give at least one --css/--xpath selector or a --template")

    from crawl4ai_scraper_spark.session import build_session
    from crawl4ai_scraper_spark.sources.pages import read_pages

    spark = build_session(app_name="selector-test")
    spark.sparkContext.setLogLevel("ERROR")
    pages = read_pages(spark, args.pages)

    if args.url:
        row = pages.filter(pages.url == args.url).select("url", "html").limit(1).collect()
        if not row:
            raise SystemExit(f"url not found in pages table: {args.url}")
        html = row[0]["html"]
        html = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
        from crawl4ai_scraper_spark.kernel.selectors import selector_report, test_selectors

        report = {
            "url": args.url,
            "selectors": selector_report(html, css, xpath),
            "extraction": {k: {"length": len(v), "preview": " ".join(v.split())[:200]}
                           for k, v in test_selectors(html, css, xpath).items()},
        }
        print(json.dumps(report, indent=2))
        return report

    # ---- corpus mode: one Arrow pass over a page sample ----
    import pandas as pd

    sels = [("css", s) for s in css] + [("xpath", s) for s in xpath]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crawl4ai_scraper_spark.kernel.selectors import selector_report

        for pdf in batches:
            counts = {i: [0, 0, 0, ""] for i in range(len(sels))}  # pages, matches, invalid, preview
            for html in pdf["html"]:
                if isinstance(html, (bytes, bytearray)):
                    html = html.decode("utf-8", "replace")
                rows = selector_report(html, css, xpath)
                for i, r in enumerate(rows):
                    if not r["valid"]:
                        counts[i][2] += 1
                    elif r["matches"]:
                        counts[i][0] += 1
                        counts[i][1] += r["matches"]
                        if not counts[i][3]:
                            counts[i][3] = r["preview"]
            yield pd.DataFrame({
                "idx": list(counts),
                "pages_matched": [v[0] for v in counts.values()],
                "total_matches": [v[1] for v in counts.values()],
                "invalid": [v[2] for v in counts.values()],
                "preview": [v[3] for v in counts.values()],
            })

    sample = pages.select("html").limit(args.sample)
    agg = (
        sample.mapInPandas(probe, "idx int, pages_matched long, total_matches long, "
                                  "invalid long, preview string")
        .groupBy("idx")
        .agg({"pages_matched": "sum", "total_matches": "sum", "invalid": "max",
              "preview": "first"})
        .collect()
    )
    by_idx = {r["idx"]: r for r in agg}
    report = {"sampled_pages": args.sample, "selectors": []}
    for i, (kind, sel) in enumerate(sels):
        r = by_idx.get(i)
        report["selectors"].append({
            "kind": kind,
            "selector": sel,
            "valid": not (r and r["max(invalid)"]),
            "pages_matched": int(r["sum(pages_matched)"]) if r else 0,
            "total_matches": int(r["sum(total_matches)"]) if r else 0,
            "preview": (r["first(preview)"] if r else "") or "",
        })
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
