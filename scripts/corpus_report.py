#!/usr/bin/env python3
"""Data card for a documents corpus — the one-file JSON a dataset release
ships next to the parquet: volume, language mix, length/quality
distributions, duplication rates, and (optionally) LM-naturalness
quantiles. Everything composes the repo's operators; ONE pass per section,
no driver-side row loops.

    python scripts/corpus_report.py --input /root/testdata/sf0.01/documents.parquet
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
    p = argparse.ArgumentParser(description="Corpus data-card report")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--lang-col", default=None,
                   help="use a stored language column instead of lang_id")
    p.add_argument("--top-langs", type=int, default=10)
    p.add_argument("--ppl", action="store_true",
                   help="add bigram-LM naturalness quantiles (one extra "
                        "training + scoring pass)")
    p.add_argument("--sketch-distinct", action="store_true",
                   help="add KMV + HLL distinct-text estimates (the 100-TB "
                        "path — tiny synopses instead of the exact "
                        "countDistinct shuffle; operators/sketches.py)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--out", help="also write the JSON here")
    return p.parse_args(argv)


def build_report(spark, args) -> dict:
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators import textops as T
    from crawl4ai_scraper_spark.operators.dedup import text_key

    ic, tc = args.id_col, args.text_col
    docs = spark.read.parquet(args.input)
    report: dict = {"input": args.input}

    lang = (F.col(args.lang_col) if args.lang_col
            else T.lang_id(F.col(tc))).alias("lang")
    enriched = docs.select(
        F.col(ic).alias("id"), lang,
        T.token_count_ws(F.col(tc)).alias("n_tokens"),
        F.length(tc).alias("n_chars"),
        T.quality_score(F.col(tc)).alias("quality"),
        text_key(F.col(tc)).alias("text_md5"),
    ).persist()

    # volume + exact duplication (one pass each)
    tot = enriched.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("text_md5").alias("n_distinct_texts"),
    ).collect()[0]
    report["n_docs"] = tot["n_docs"]
    report["total_tokens"] = tot["total_tokens"]
    report["total_chars"] = tot["total_chars"]
    report["exact_dup_rate"] = round(
        1.0 - tot["n_distinct_texts"] / max(tot["n_docs"], 1), 6)

    if args.sketch_distinct:
        from crawl4ai_scraper_spark.operators.sketches import (
            hll_distinct, kmv_distinct,
        )

        kr = kmv_distinct(docs, tc, k=1024).collect()[0]
        hr = hll_distinct(docs, tc).collect()[0]
        report["distinct_texts_kmv"] = kr["estimate"]
        report["distinct_texts_hll"] = hr["estimate"]

    # language mix (doc + token share), top-N by docs
    mix = (
        enriched.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens"))
        .orderBy(F.col("docs").desc(), "lang")
        .limit(args.top_langs)
        .collect()
    )
    report["languages"] = [
        {"lang": r["lang"], "docs": r["docs"], "tokens": r["tokens"],
         "doc_share": round(r["docs"] / max(tot["n_docs"], 1), 6)}
        for r in mix
    ]

    # distribution sketches: exact percentiles (Spark exact percentile agg)
    def pct(col):
        row = enriched.agg(
            *[F.percentile(F.col(col), q).alias(f"p{int(q * 100)}")
              for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)]
        ).collect()[0]
        return {k: round(float(row[k]), 4) for k in row.asDict()}

    report["tokens_per_doc"] = pct("n_tokens")
    report["quality"] = pct("quality")

    if args.ppl:
        scored = T.bigram_lm_perplexity(docs, tc, ic)
        row = scored.agg(
            *[F.percentile(F.col("ppl"), q).alias(f"p{int(q * 100)}")
              for q in (0.1, 0.5, 0.9)]
        ).collect()[0]
        report["ppl"] = {k: round(float(row[k]), 4) for k in row.asDict()}

    enriched.unpersist()
    return report


def main(argv=None):
    args = parse_args(argv)
    from crawl4ai_scraper_spark.session import build_session

    spark = build_session(app_name="corpus-report",
                          shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("WARN")
    report = build_report(spark, args)
    line = json.dumps(report)
    print(line)
    if args.out:
        Path(args.out).write_text(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
