"""Full-text search over the crawled corpus: inverted-index construction and
conjunctive tf-idf retrieval.

A crawl engine's output is only useful if you can FIND things in it; the
reference greps its saved markdown on disk (one process, one directory —
/root/reference/main.py's saved-file workflow). At 100 TB the equivalent is a
distributed inverted index: postings built by ONE map-side-combined groupBy
over the token stream, per-term statistics (df, cf) attached by a window that
reuses the term partitioning — no join, no second corpus scan — and queries
answered by scanning only the q query terms' postings (predicate pushdown on
``term``), never the corpus.

Scale notes:
- The postings groupBy key is (term, doc_id) — stopword skew is bounded
  because every (term, doc) pair is distinct; the per-term window that
  follows is the only place a single hot term concentrates, and its input is
  one row per document containing the term (already tf-collapsed).
- ``tfidf_search`` filters postings to the literal query terms FIRST, so the
  conjunctive groupBy sees at most q rows per candidate document.
- All ranking math follows the repo-wide oracle conventions: exact integer
  tf/df, ln() on clean double ratios, ROUND(..., 6) on the final score, full
  deterministic tiebreaks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize(text) -> F.Column:
    """Whitespace tokens of lowercased text — the repo-wide convention
    (textops.tokens), kept identical so index terms line up with every other
    text operator and with the DuckDB oracles' string_split_regex."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def inverted_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Build the inverted index as flat posting rows
    ``(term, doc_id, tf, df, cf)``.

    One corpus-volume shuffle: groupBy(term, doc_id) with map-side combine
    collapses repeated occurrences before the exchange. df (documents
    containing the term) and cf (total occurrences) come from an unbounded
    window over ``term`` — count/sum need no ordering, and the window's
    exchange moves the already-collapsed postings (one row per term-doc),
    never the raw token stream. ``min_df`` prunes hapax noise after stats
    are computed (the filter must not bias df/cf)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    postings = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("term")
    return (
        postings.withColumn("df", F.count(F.lit(1)).over(w))
        .withColumn("cf", F.sum("tf").over(w))
        .filter(F.col("df") >= min_df)
    )


def tfidf_search(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND) search: the top-``k`` documents containing EVERY
    term in ``terms``, ranked by smoothed tf-idf.

    score = Σ_t tf(t, d) · (ln((N + 1) / (df(t) + 1)) + 1).

    Per-term idf values are rounded to 12dp and carried as DECIMAL(28,12)
    (the repo-wide order-free-sum convention — see unigram_lm_ppl): tf is an
    exact integer, tf·idf and the per-doc sum stay exact decimals in any
    addition order, and only the final score is cast to DOUBLE and rounded
    to 6dp.

    Plan shape: the token stream is filtered to the q literal query terms
    BEFORE the postings groupBy (the only corpus-volume stage and it carries
    ≤ q rows per doc); df per term is a q-row aggregate joined back by
    broadcast; N is a one-row broadcast; conjunction = HAVING
    count(distinct term) == q on the doc groupBy; ranking is
    TakeOrderedAndProject. Nothing after the first filter scales with corpus
    vocabulary."""
    terms = [t.lower() for t in terms]
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    ).filter(F.col("term").isin(terms))
    postings = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    dfs = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0, 12
            ).cast("decimal(28,12)"),
        )
        .withColumn("contrib", F.col("tf").cast("decimal(10,0)") * F.col("idf"))
    )
    hits = (
        scored.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("_nt"),
            F.round(F.sum("contrib").cast("double"), 6).alias("score"),
        )
        .filter(F.col("_nt") == len(terms))
        .drop("_nt")
    )
    return hits.orderBy(F.desc("score"), "doc_id").limit(k)
