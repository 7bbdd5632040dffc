#!/usr/bin/env python3
"""Search the crawled corpus from the command line — the user surface over
operators/search.py (the Spark-shaped version of grepping the reference's
saved-markdown directory, main.py's saved-file workflow).

Conjunctive ranked search (AND of terms, tf-idf):

    python scripts/search_corpus.py --docs /root/testdata/sf0.01/documents.parquet \
        --terms spark window merge --k 10

Exact phrase (adjacent tokens, positional index):

    python scripts/search_corpus.py --docs ... --phrase "hash value"

Keyword-in-context previews (±N tokens around the first hit):

    python scripts/search_corpus.py --docs ... --kwic spark --window 4 --k 10

Index statistics (top-df terms of the inverted index):

    python scripts/search_corpus.py --docs ... --index-stats --k 20

Any parquet with (doc_id, text) works — including a crawl snapshot's
extracted-text table. Output is JSONL on stdout (one hit per line), so the
tool composes with jq the way the reference's saved files compose with grep.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--docs", required=True, help="parquet with (doc_id, text)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--terms", nargs="+", help="conjunctive tf-idf search")
    ap.add_argument("--phrase", help="two-token exact phrase, e.g. 'hash value'")
    ap.add_argument("--kwic", help="keyword-in-context previews for TERM")
    ap.add_argument("--index-stats", action="store_true", help="top-df terms")
    ap.add_argument("--window", type=int, default=3, help="KWIC context tokens")
    ap.add_argument("--k", type=int, default=10, help="result cap")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()
    modes = [bool(args.terms), bool(args.phrase), bool(args.kwic), args.index_stats]
    if sum(modes) != 1:
        ap.error("pick exactly one of --terms / --phrase / --kwic / --index-stats")

    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators import search as S
    from crawl4ai_scraper_spark.session import build_session

    spark = build_session(app_name="search-corpus", master=args.master,
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.docs)

    if args.terms:
        out = S.tfidf_search(docs, args.terms, k=args.k,
                             id_col=args.id_col, text_col=args.text_col)
    elif args.phrase:
        toks = args.phrase.split()
        if len(toks) != 2:
            ap.error("--phrase takes exactly two tokens (bigram phrase)")
        out = (
            S.phrase_search(docs, toks[0], toks[1],
                            id_col=args.id_col, text_col=args.text_col)
            .orderBy(F.desc("n_occurrences"), "doc_id")
            .limit(args.k)
        )
    elif args.kwic:
        out = (
            S.kwic_snippets(docs, args.kwic, window=args.window,
                            id_col=args.id_col, text_col=args.text_col)
            .orderBy("doc_id")
            .limit(args.k)
        )
    else:
        out = (
            S.inverted_postings(docs, id_col=args.id_col, text_col=args.text_col)
            .groupBy("term")
            .agg(F.max("df").alias("df"), F.max("cf").alias("cf"))
            .orderBy(F.desc("df"), "term")
            .limit(args.k)
        )

    for row in out.collect():
        print(json.dumps(row.asDict(), default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
