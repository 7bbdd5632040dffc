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


def positional_postings(
    docs: DataFrame,
    terms: Sequence[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional index rows ``(doc_id, term, pos)`` (1-based token
    positions). Pass ``terms`` to filter the token stream to the query's
    literals BEFORE anything shuffles — for phrase queries that makes every
    downstream stage O(query-term occurrences), never O(corpus)."""
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    if terms is not None:
        t = t.filter(F.col("term").isin([x.lower() for x in terms]))
    else:
        t = t.filter(F.col("term") != "")
    return t


def phrase_search(
    docs: DataFrame,
    first: str,
    second: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact bigram-phrase retrieval: documents where ``first`` is
    IMMEDIATELY followed by ``second``, with occurrence counts.

    The tf-only inverted index can't answer this (it proves co-occurrence,
    not adjacency); the positional index can: filter positions to the two
    literals, then an EQUI-join on (doc_id, pos+1 == pos₂) — Catalyst plans
    the arithmetic equality as a hash-join key, so adjacency costs one join
    over the two terms' occurrence lists only. The scan-speed alternative
    (zip_with over consecutive token pairs, zero shuffle) wins for ONE
    ad-hoc phrase; the positional index wins when many phrases probe the
    same corpus. Output: (doc_id, n_occurrences)."""
    t = positional_postings(docs, [first, second], id_col, text_col)
    p1 = t.filter(F.col("term") == first.lower()).select("doc_id", "pos")
    p2 = t.filter(F.col("term") == second.lower()).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    return (
        p1.join(
            p2,
            (p1["doc_id"] == p2["doc_id2"]) & (p2["pos2"] == p1["pos"] + 1),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def kwic_snippets(
    docs: DataFrame,
    term: str,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context result rendering: for every document containing
    ``term``, the ±``window``-token snippet around its FIRST occurrence.

    Pure column math — array_position / slice / array_join over the token
    array, no explode, no shuffle at all: the whole operator is a
    projection + filter at scan speed (the plan is FileScan → Filter →
    Project). Output: (doc_id, first_pos, snippet)."""
    w = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("w")
    )
    fp = F.array_position("w", term.lower())
    start = F.greatest(F.lit(1), F.col("first_pos") - window)
    end = F.least(F.size("w"), F.col("first_pos") + window)
    return (
        w.withColumn("first_pos", fp)
        .filter(F.col("first_pos") > 0)
        .select(
            "doc_id",
            "first_pos",
            F.array_join(
                F.slice("w", start, end - start + 1), " "
            ).alias("snippet"),
        )
    )


def feature_hash_vectors(
    docs: DataFrame,
    dim: int = 64,
    salt: str = "fh1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick document vectors (Weinberger et al. / Vowpal Wabbit /
    fastText bucket embeddings): every token hashes to a dimension
    ``h mod dim`` with a signed contribution ``±1`` drawn from an
    independent bit of the same digest, and the doc's vector is the signed
    count per dimension. The sign bit makes collisions cancel in
    expectation — the property that lets a 64-dim table stand in for an
    unbounded vocabulary with bounded distortion.

    This is the JVM-side bridge from raw text into the embedding toolchain
    (ANN cells, LSH buckets, semantic dedup) with NO model artifact and no
    Python: one token-volume groupBy on (doc, dim) with map-side combine,
    exact integer values — deterministic, oracle-replicable via the shared
    48-bit md5 digest. Output: sparse rows (doc_id, dim, value), zero
    dimensions omitted (sparse by construction)."""
    from crawl4ai_scraper_spark.operators.sketches import digest48

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    hashed = toks.select("doc_id", digest48(F.col("term"), salt).alias("h"))
    return (
        hashed.select(
            "doc_id",
            (F.col("h") % dim).cast("int").alias("dim"),
            # integer DIV keeps the sign bit exact (no double division)
            F.when(F.expr(f"(h DIV {dim}) % 2") == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("sign"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sign").alias("value"))
        .filter(F.col("value") != 0)
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: adjacent token pairs ranked by pointwise mutual
    information, PMI = ln(P(w1,w2) / (P(w1)·P(w2))) — the corpus-statistics
    tool behind phrase vocabularies (word2vec phrase pass, subword-merge
    seeding) and boilerplate discovery (high-count low-PMI pairs are
    templates).

    Both count tables come from the SAME positional token stream: unigrams
    are one token-volume groupBy, bigrams one self-join on (doc, pos+1)
    (the phrase_search adjacency shape, unfiltered) plus a pair groupBy
    with map-side combine. Every probability input is an exact BIGINT;
    the PMI is ONE double expression over them, written identically in the
    DuckDB oracle (same association order), rounded to 6dp. ``min_count``
    drops noise pairs AFTER counting, so probabilities are unbiased.
    Output: (w1, w2, n_ab, pmi)."""
    t = positional_postings(docs, None, id_col, text_col)
    uni = t.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = uni.agg(F.sum("n").cast("double").alias("total"))
    a = t.select(F.col("doc_id").alias("d"), F.col("pos").alias("p"), F.col("term").alias("w1"))
    b = t.select(F.col("doc_id").alias("d"), (F.col("pos") - 1).alias("p"), F.col("term").alias("w2"))
    big = a.join(b, ["d", "p"]).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    nb = big.agg(F.sum("n_ab").cast("double").alias("total_bigrams"))
    return (
        big.filter(F.col("n_ab") >= min_count)
        .join(F.broadcast(uni.withColumnsRenamed({"term": "w1", "n": "n1"})), "w1")
        .join(F.broadcast(uni.withColumnsRenamed({"term": "w2", "n": "n2"})), "w2")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2", "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("total") * F.col("total"))
                    / (F.col("total_bigrams") * F.col("n1") * F.col("n2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def doc_top_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the top-``k`` terms of each document
    by smoothed tf-idf — the standard metadata-enrichment pass a training-
    data pipeline runs to tag every page with its salient vocabulary
    (topic routing, quality heuristics, dedup explainability).

    score(t, d) = tf(t, d) · (ln((N + 1) / (df(t) + 1)) + 1), idf rounded to
    12dp and carried as DECIMAL(28,12) (the repo-wide order-free convention);
    only the final score is cast to DOUBLE and rounded to 6dp. Ties break by
    term ascending so ranks are engine-stable.

    Plan shape: ONE corpus-volume shuffle (the (term, doc) postings groupBy
    with map-side combine — raw tokens never cross the wire more than once);
    df comes from an unbounded window over the already-collapsed postings;
    N is a one-row broadcast; the per-doc top-k is a window over ≤ |vocab ∩
    doc| rows per doc. Nothing downstream of the postings groupBy scales
    with raw token volume."""
    postings = inverted_postings(docs, id_col, text_col)
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        postings.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0, 12
            ).cast("decimal(28,12)"),
        )
        .withColumn(
            "score",
            F.round(
                (F.col("tf").cast("decimal(10,0)") * F.col("idf")).cast("double"), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "score")
    )
