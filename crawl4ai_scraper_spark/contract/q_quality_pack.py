"""C4/CCNet cleaning, LM scoring, packing, trap mining, sources.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# C4 cleaning, CCNet-style LM scoring, corpus length distribution
# ---------------------------------------------------------------------------


@_q(
    "c4_quality_filter",
    """WITH l AS (
      SELECT doc_id, regexp_replace(text, ' the ', chr(10), 'g') AS nt
      FROM documents
    ), s AS (
      SELECT doc_id, nt, string_split(nt, chr(10)) AS lines FROM l
    ), k AS (
      SELECT doc_id, nt, lines,
             list_filter(lines, x -> len(list_filter(
                 string_split_regex(trim(x), '\\s+'), w -> w <> '')) >= 8) AS kept
      FROM s
    )
    SELECT doc_id,
           CAST(len(lines) AS INT) AS n_lines,
           CAST(len(kept) AS INT) AS n_kept_lines,
           -- empty list: DuckDB array_to_string → NULL, Spark array_join → ''
           COALESCE(array_to_string(kept, chr(10)), '') AS kept_text,
           contains(lower(nt), 'lorem ipsum') AS has_lorem,
           contains(nt, '{') AS has_brace,
           (len(kept) >= 2 AND NOT contains(lower(nt), 'lorem ipsum')
            AND NOT contains(nt, '{')) AS keep
    FROM k""",
)
def c4_quality_filter(spark, sf):
    """C4-style line/doc cleaning over a deterministically line-broken copy
    of the corpus (every ' the ' becomes a newline — the testdata has no
    newlines of its own): lines under 8 words are dropped, docs keeping
    fewer than 2 lines (or containing 'lorem ipsum'/'{') are rejected.
    Pure column math, scan speed. The terminal-punctuation rule is exercised
    in pytest (the synthetic corpus has no sentence punctuation)."""
    docs = _t(spark, sf, "documents").select(
        "doc_id", F.regexp_replace(F.col("text"), " the ", "\n").alias("text")
    )
    return T.c4_filter(
        docs, "text", "doc_id",
        min_words_per_line=8, min_lines=2, require_terminal_punct=False,
    )


# Shared by unigram_lm_ppl and ccnet_quality_buckets.
_UNIGRAM_SQL = """WITH w AS (SELECT doc_id,
           string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
    t AS (SELECT doc_id, UNNEST(w) AS tok FROM w),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM t),
    v AS (SELECT tok, CAST(ROUND(ln(cnt / total), 12) AS DECIMAL(28,12)) AS logp
          FROM (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok) c CROSS JOIN tot
          ORDER BY cnt DESC, tok LIMIT 30),
    s AS (SELECT t.doc_id,
                 COALESCE(v.logp,
                          CAST(ROUND(ln(0.5 / total), 12) AS DECIMAL(28,12))) AS lp
          FROM t CROSS JOIN tot LEFT JOIN v USING (tok))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob,
           ROUND(exp(-(CAST(SUM(lp) AS DOUBLE) / COUNT(*))), 4) AS perplexity
    FROM s GROUP BY doc_id"""


@_q("unigram_lm_ppl", _UNIGRAM_SQL)
def unigram_lm_ppl(spark, sf):
    """CCNet-style unigram-LM document scoring: top-30 vocabulary fit on the
    corpus (TakeOrdered, no global sort), broadcast into the token stream,
    OOV floored at ln(0.5/total); per-token log-probs rounded to 12dp and
    summed in DECIMAL so the mean is order-free in both engines."""
    return T.unigram_lm_scores(
        _t(spark, sf, "documents"), "text", "doc_id", vocab_size=30, alpha=0.5
    )


@_q(
    "ccnet_quality_buckets",
    f"""WITH u AS ({_UNIGRAM_SQL}),
    cuts AS (SELECT ROUND(quantile_cont(perplexity, 1.0/3), 6) AS c1,
                    ROUND(quantile_cont(perplexity, 2.0/3), 6) AS c2 FROM u)
    SELECT doc_id, perplexity,
           CASE WHEN perplexity <= c1 THEN 'head'
                WHEN perplexity <= c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM u CROSS JOIN cuts""",
)
def ccnet_quality_buckets(spark, sf):
    """CCNet head/middle/tail bucketing by unigram-LM perplexity terciles —
    the cut points come from a 2-value exact-percentile aggregate broadcast
    back into the scored frame (NOT a whole-corpus ntile window: no single
    partition ever orders the corpus)."""
    return T.quality_buckets(
        _t(spark, sf, "documents"), "text", "doc_id", vocab_size=30, alpha=0.5
    )


@_q(
    "mixture_rebalance",
    """WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+'))
                      END) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ), tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS total FROM s),
    t AS (SELECT s.*, total,
                 -- CAST: DuckDB types this CASE as DECIMAL(2,1), Spark map
                 -- values are DOUBLE
                 CAST(CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
                                  WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1
                                  ELSE 0.0 END AS DOUBLE) AS target_share
          FROM s CROSS JOIN tot)
    SELECT source, n_docs, tokens,
           ROUND(tokens / total, 6) AS actual_share,
           target_share,
           ROUND(LEAST(1.0, target_share * total / tokens), 6) AS keep_rate,
           ROUND(target_share * total / tokens, 4) AS oversample_factor
    FROM t""",
)
def mixture_rebalance(spark, sf):
    """Data-mixture rebalancing: per-source token shares vs a target mixture
    (src0..src3 at 40/30/20/10%, the rest dropped) → deterministic keep
    rates for the hash_sample pass; one map-side-combined groupBy(source) +
    a scalar total broadcast."""
    return T.mixture_weights(
        _t(spark, sf, "documents"), "source", "text",
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
    )


@_q(
    "crawl_snapshot_delta",
    """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0),
    n AS (SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
                      ELSE text END AS text
          FROM documents WHERE doc_id % 7 <> 0)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           -- the operator compares md5(content); equal-hash ⇔ equal-text here
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text <> n.text THEN 'changed'
                ELSE 'same' END AS status
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""",
)
def crawl_snapshot_delta(spark, sf):
    """Recrawl snapshot diff over two deterministic slices of the corpus
    (doc_id%11 dropped from old → added; doc_id%7 dropped from new →
    removed; doc_id%5 rewritten → changed): full-outer key join comparing
    md5 content hashes — the content itself never shuffles."""
    from crawl4ai_scraper_spark.operators.temporal import snapshot_delta

    docs = _t(spark, sf, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" updated")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_delta(old, new, "doc_id", "text")


@_q(
    "sequence_pack",
    """WITH n AS (
      SELECT doc_id,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\\s+'))
                  END AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      -- CAST: DuckDB's SUM(BIGINT) is HUGEINT; pandas renders HUGEINT and
      -- int64 differently, so narrow to BIGINT before output (r2 audit).
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS cum_before
      FROM n)
    SELECT doc_id, n_tokens, cum_before,
           CAST(cum_before // 512 AS BIGINT) AS seq_id,
           CAST(cum_before % 512 AS BIGINT) AS offset_in_seq
    FROM c""",
)
def sequence_pack_q(spark, sf):
    """Training-sequence packing layout: docs laid end-to-end in doc_id
    order into 512-token sequences. The oracle's single-partition
    ``SUM OVER (ORDER BY)`` is replaced by the two-phase bucketed global
    cumsum (bucket_size=64 here so even the contract input crosses
    buckets); integer math end to end."""
    from crawl4ai_scraper_spark.operators.packing import sequence_pack

    docs = _t(spark, sf, "documents")
    return sequence_pack(docs, "doc_id", T.token_count_ws(F.col("text")),
                         seq_len=512, bucket_size=64)


@_q(
    "doc_length_stats",
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 6) AS mean_val,
           ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
           ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
           ROUND(quantile_cont(n_chars, 0.75), 6) AS p75,
           ROUND(quantile_cont(n_chars, 0.9), 6) AS p90
    FROM documents GROUP BY lang""",
)
def doc_length_stats(spark, sf):
    """Exact per-language length quantiles (truncation/packing budget
    report): Spark's exact ``percentile`` aggregate uses the same linear
    interpolation as DuckDB quantile_cont, so the values hash-match at 6dp;
    one group-key shuffle, map-side partials."""
    return T.length_percentiles(_t(spark, sf, "documents"), "n_chars", "lang")


@_q(
    "anchor_text_agg",
    """WITH l AS (
      SELECT 'https://' || source || '.example/d' || CAST(doc_id % 50 AS VARCHAR) AS target,
             source || ' ref ' || CAST(doc_id % 7 AS VARCHAR) AS anchor
      FROM documents
      UNION ALL
      SELECT 'https://' || source || '.example/d' || CAST((doc_id + 1) % 50 AS VARCHAR) AS target,
             'go ' || CAST(doc_id % 5 AS VARCHAR) AS anchor
      FROM documents)
    SELECT target, COUNT(*) AS n_inlinks,
           array_to_string(list_slice(list_sort(list(DISTINCT anchor)), 1, 8), '|') AS anchors
    FROM l GROUP BY target""",
)
def anchor_text_agg_q(spark, sf):
    """Inbound anchor-text aggregation (operators.graph.page_anchor_texts):
    the Spark side renders a real HTML page per document (two links with
    known labels; one relative href, one absolute with a trailing slash) and
    runs the FULL pipeline — Arrow-batched kernel parse, urljoin + canon of
    each href, pair-grouped shuffle, top-8 distinct labels per target —
    while the oracle computes the expected targets/labels arithmetically.
    Parser, canonicalizer and both aggregation phases are all load-bearing
    for the hash to match."""
    from crawl4ai_scraper_spark.operators.graph import page_anchor_texts

    docs = _t(spark, sf, "documents")
    html = F.concat(
        F.lit('<html><body><p><a href="/d'),
        (F.col("doc_id") % 50).cast("string"),
        F.lit('">'),
        F.col("source"), F.lit(" ref "), (F.col("doc_id") % 7).cast("string"),
        F.lit('</a> and <a href="https://'),
        F.col("source"), F.lit(".example/d"),
        ((F.col("doc_id") + 1) % 50).cast("string"),
        F.lit('/">go '), (F.col("doc_id") % 5).cast("string"),
        F.lit("</a></p></body></html>"),
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/docs/d"),
        F.col("doc_id").cast("string"),
    )
    pages = docs.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))
    return page_anchor_texts(pages, max_anchors=8)


@_q(
    "dataset_split",
    """SELECT doc_id, source,
           CASE WHEN substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 3) < '029'
                    THEN 'validation'
                WHEN substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 3) < '052'
                    THEN 'test'
                ELSE 'train' END AS split
    FROM documents""",
)
def dataset_split_q(spark, sf):
    """Deterministic train/val/test split (textops.dataset_split, 1%/1%):
    md5-band assignment — stable across engines, runs and partitionings;
    thresholds 0x029 (41/4096) and 0x052 (82/4096) reproduced literally in
    the oracle."""
    docs = _t(spark, sf, "documents").select("doc_id", "source")
    return T.dataset_split(docs, "doc_id", val_rate=0.01, test_rate=0.01)


@_q(
    "dup_span_stats",
    """WITH corpus AS (
      SELECT doc_id AS id, text FROM documents WHERE doc_id < 80
      UNION ALL
      SELECT doc_id + 100000, substr(text, 30) FROM documents WHERE doc_id < 80
    ), base AS (
      SELECT id, string_split_regex(trim(lower(text)), '\\s+') AS t,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n
      FROM corpus
    ), wins AS (
      SELECT id, n, CAST(s.i AS INT) AS s,
             md5(array_to_string(list_slice(t, CAST(s.i AS INT) + 1,
                                            CAST(s.i AS INT) + 12), ' ')) AS h
      FROM base, UNNEST(range(0, n - 12 + 1)) AS s(i)
      WHERE n >= 12
    ), cnts AS (SELECT h, COUNT(*) AS cnt FROM wins GROUP BY h),
    dup AS (SELECT w.id, w.n, w.s FROM wins w JOIN cnts c ON c.h = w.h WHERE c.cnt >= 2),
    cov AS (
      SELECT id, n, s,
             LEAST(12, COALESCE(LEAD(s) OVER (PARTITION BY id ORDER BY s) - s, n - s)) AS c
      FROM dup
    ), per AS (
      SELECT id, COUNT(*) AS n_dup_windows, CAST(SUM(c) AS BIGINT) AS covered_tokens
      FROM cov GROUP BY id)
    SELECT b.id, b.n AS n_tokens,
           CAST(COALESCE(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(p.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           ROUND(CAST(COALESCE(p.covered_tokens, 0) AS DOUBLE)
                 / GREATEST(b.n, 1), 6) AS dup_fraction
    FROM base b LEFT JOIN per p ON p.id = b.id""",
)
def dup_span_stats_q(spark, sf):
    """Duplicate-span detection (operators.dedup.dup_span_stats, k=12) over
    the corpus + planted shared-suffix twins (each doc's text minus its
    first 29 chars): every repeated 12-token window counts, interval-union
    coverage per doc — the Lee-et-al exact-substring-dedup removal budget."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 80).select(
        F.col("doc_id").alias("id"), "text"
    )
    variants = docs.select((F.col("id") + 100000).alias("id"),
                           F.expr("substr(text, 30)").alias("text"))
    return D.dup_span_stats(docs.unionByName(variants), "text", "id", k=12)


@_q(
    "strip_dup_spans",
    """WITH corpus AS (
      SELECT doc_id AS id, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 100000, substr(text, 30) FROM documents WHERE doc_id < 60
    ), base AS (
      SELECT id, string_split_regex(trim(lower(text)), '\\s+') AS t,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS n
      FROM corpus
    ), wins AS (
      SELECT id, CAST(s.i AS INT) AS s,
             md5(array_to_string(list_slice(t, CAST(s.i AS INT) + 1,
                                            CAST(s.i AS INT) + 12), ' ')) AS h
      FROM base, UNNEST(range(0, n - 12 + 1)) AS s(i)
      WHERE n >= 12
    ), per_hash AS (
      SELECT h, COUNT(*) AS cnt, MIN({'wid': id, 'ws': s}) AS winner FROM wins GROUP BY h
    ), removal AS (
      SELECT w.id, w.s, w.s + 12 AS e
      FROM wins w JOIN per_hash p ON p.h = w.h
      WHERE p.cnt >= 2 AND NOT (w.id = p.winner.wid AND w.s = p.winner.ws)
    ), isl AS (
      SELECT id, s, e,
             SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
      FROM (SELECT id, s, e,
                   MAX(e) OVER (PARTITION BY id ORDER BY s
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
            FROM removal)
    ), islands AS (
      SELECT id, isl_id, MIN(s) AS s, MAX(e) AS e FROM isl GROUP BY id, isl_id
    ), removed AS (
      SELECT id, CAST(p.pos AS INT) AS pos
      FROM islands, UNNEST(range(s, e)) AS p(pos)
    ), stream AS (
      SELECT b.id, CAST(r.pos AS INT) - 1 AS pos, t[CAST(r.pos AS INT)] AS tok
      FROM base b, UNNEST(range(1, n + 1)) AS r(pos)
      WHERE n > 0
    ), kept AS (
      SELECT st.id, st.pos, st.tok
      FROM stream st LEFT JOIN removed rm ON rm.id = st.id AND rm.pos = st.pos
      WHERE rm.id IS NULL
    ), rebuilt AS (
      SELECT id, COUNT(*) AS kept_tokens,
             array_to_string(list(tok ORDER BY pos), ' ') AS text_stripped
      FROM kept GROUP BY id)
    SELECT b.id, b.n AS n_tokens,
           CAST(COALESCE(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           COALESCE(r.text_stripped, '') AS text_stripped
    FROM base b LEFT JOIN rebuilt r ON r.id = b.id""",
)
def strip_dup_spans_q(spark, sf):
    """Exact-substring dedup rewrite (operators.dedup.strip_dup_spans, k=12)
    over the corpus + planted shared-suffix twins: the globally-first copy
    of every repeated 12-token span survives, later occurrences' islands are
    stripped and the text rebuilt from the surviving tokens. The oracle
    unrolls winner selection, island merging and reassembly with identical
    tie-breaks."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("id"), "text"
    )
    variants = docs.select((F.col("id") + 100000).alias("id"),
                           F.expr("substr(text, 30)").alias("text"))
    return D.strip_dup_spans(docs.unionByName(variants), "text", "id", k=12)


@_q(
    "vocab_encode",
    """WITH tok AS (
      SELECT doc_id, CAST(r.pos AS INT) AS pos, toks[CAST(r.pos AS INT)] AS tok
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents) t,
           UNNEST(range(1, len(toks) + 1)) AS r(pos)
    ), counts AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    vocab AS (
      SELECT tok, tid FROM (
        SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS INT) AS tid
        FROM counts) WHERE tid <= 30
    ), enc AS (
      SELECT t.doc_id, t.pos, COALESCE(v.tid, 0) AS tid
      FROM tok t LEFT JOIN vocab v ON v.tok = t.tok)
    SELECT doc_id AS id, COUNT(*) AS n_tokens,
           array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos), ',') AS ids_csv
    FROM enc GROUP BY doc_id""",
)
def vocab_encode_q(spark, sf):
    """Tokenize-to-ids (textops.vocab_build + vocab_encode, V=30, OOV=0):
    corpus-frequency vocabulary broadcast into the token stream, per-doc id
    sequences reassembled in token order. The array output is joined to a
    CSV scalar for the driver's hash (lists are unhashable in its
    canonicalizer)."""
    docs = _t(spark, sf, "documents")
    vocab = T.vocab_build(docs, "text", vocab_size=30)
    enc = T.vocab_encode(docs, "text", "doc_id", vocab, oov_id=0)
    return enc.select(
        "id", "n_tokens",
        F.concat_ws(",", F.transform("token_ids", lambda x: x.cast("string"))).alias("ids_csv"),
    )


@_q(
    "token_windows",
    """WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
      FROM documents)
    SELECT doc_id AS id,
           CAST(s.i // 24 AS INT) AS win_idx,
           CAST(s.i AS INT) AS win_start,
           CAST(LEAST(32, n - s.i) AS INT) AS n_win_tokens,
           array_to_string(list_slice(toks, CAST(s.i AS INT) + 1,
                                      CAST(s.i AS INT) + 32), ' ') AS win_text
    FROM t, UNNEST(range(0, greatest(n - 1, 0) + 1, 24)) AS s(i)
    WHERE n > 0""",
)
def token_windows_q(spark, sf):
    """Sliding-context chunking (operators.textops.token_windows): 32-token
    windows, stride 24 (8-token overlap) — one narrow Generate, no shuffle;
    short tails kept, empty docs dropped."""
    return T.token_windows(_t(spark, sf, "documents"), "text", "doc_id",
                           window=32, stride=24)


@_q(
    "sitemap_lastmod_priority",
    """WITH sel AS (
      SELECT source, doc_id FROM documents WHERE doc_id % 100 < 20)
    SELECT 'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 3 = 0 THEN 0.0
                ELSE CAST(epoch(CAST(('2024-01-' ||
                         lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0'))
                         AS TIMESTAMP)) AS DOUBLE)
           END AS priority
    FROM sel""",
)
def sitemap_lastmod_priority(spark, sf):
    """Freshness-prioritized sitemap seeding: synthesized sitemap pages carry
    ``<lastmod>`` on 2 of 3 entries; the REAL Arrow parser (kernel
    entries_from_sitemap_xml via plans.politeness.sitemap_entries) scrapes
    (loc, lastmod) blocks and sitemap_seed_priorities converts them to the
    (url, priority=wall-clock epoch of lastmod, else 0) signal frame the
    frontier's priority mode consumes. The oracle computes the expected
    epochs arithmetically; the timestamp math is timezone-free on both
    sides (NTZ round-trip vs DuckDB naive epoch)."""
    from crawl4ai_scraper_spark.plans.politeness import (
        sitemap_entries,
        sitemap_seed_priorities,
    )

    docs = _t(spark, sf, "documents")
    host = F.concat(F.col("source"), F.lit(".example"))
    lastmod = F.concat(
        F.lit("<lastmod>2024-01-"),
        F.lpad((F.col("doc_id") % 27 + 1).cast("string"), 2, "0"),
        F.lit("</lastmod>"),
    )
    entry = F.concat(
        F.lit("<url><loc>https://"), host, F.lit("/docs/d"),
        F.col("doc_id").cast("string"), F.lit("</loc>"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("")).otherwise(lastmod),
        F.lit("</url>"),
    )
    per = docs.filter(F.col("doc_id") % 100 < 20).select(
        "source", F.col("doc_id").alias("k"), entry.alias("e")
    )
    sitemap_pages = per.groupBy("source").agg(
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "e"))), lambda s: s["e"]
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("body")
    ).select(
        F.concat(F.lit("https://"), host, F.lit("/sitemap.xml")).alias("url"),
        F.encode(F.col("body"), "UTF-8").alias("html"),
    )
    sitemaps = sitemap_pages.select(
        F.regexp_extract("url", "^https://([^/]+)/", 1).alias("host"),
        F.col("url").alias("sitemap_url"),
    )
    return sitemap_seed_priorities(sitemap_entries(sitemap_pages, sitemaps))


@_q(
    "hits_hubs_authorities",
    """WITH e AS (
      SELECT DISTINCT src, dst FROM (
        SELECT doc_id % 200 AS src, (doc_id * 7 + 1) % 200 AS dst
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id % 200, (doc_id * 3 + 2) % 200
        FROM documents WHERE doc_id < 400)
    ), nodes AS (
      SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    h0 AS (SELECT id, CAST(ROUND(1.0 / n, 12) AS DECIMAL(28,12)) AS s FROM nodes, nn),
    a1r AS (SELECT e.dst AS id, CAST(SUM(h0.s) AS DECIMAL(28,12)) AS raw
            FROM e JOIN h0 ON h0.id = e.src GROUP BY e.dst),
    a1t AS (SELECT CAST(SUM(raw) AS DOUBLE) AS t FROM a1r),
    a1 AS (SELECT nodes.id,
                  CAST(ROUND(CAST(COALESCE(a1r.raw, 0) AS DOUBLE) / a1t.t, 12)
                       AS DECIMAL(28,12)) AS s
           FROM nodes LEFT JOIN a1r ON a1r.id = nodes.id, a1t),
    h1r AS (SELECT e.src AS id, CAST(SUM(a1.s) AS DECIMAL(28,12)) AS raw
            FROM e JOIN a1 ON a1.id = e.dst GROUP BY e.src),
    h1t AS (SELECT CAST(SUM(raw) AS DOUBLE) AS t FROM h1r),
    h1 AS (SELECT nodes.id,
                  CAST(ROUND(CAST(COALESCE(h1r.raw, 0) AS DOUBLE) / h1t.t, 12)
                       AS DECIMAL(28,12)) AS s
           FROM nodes LEFT JOIN h1r ON h1r.id = nodes.id, h1t),
    a2r AS (SELECT e.dst AS id, CAST(SUM(h1.s) AS DECIMAL(28,12)) AS raw
            FROM e JOIN h1 ON h1.id = e.src GROUP BY e.dst),
    a2t AS (SELECT CAST(SUM(raw) AS DOUBLE) AS t FROM a2r),
    a2 AS (SELECT nodes.id,
                  CAST(ROUND(CAST(COALESCE(a2r.raw, 0) AS DOUBLE) / a2t.t, 12)
                       AS DECIMAL(28,12)) AS s
           FROM nodes LEFT JOIN a2r ON a2r.id = nodes.id, a2t),
    h2r AS (SELECT e.src AS id, CAST(SUM(a2.s) AS DECIMAL(28,12)) AS raw
            FROM e JOIN a2 ON a2.id = e.dst GROUP BY e.src),
    h2t AS (SELECT CAST(SUM(raw) AS DOUBLE) AS t FROM h2r),
    h2 AS (SELECT nodes.id,
                  CAST(ROUND(CAST(COALESCE(h2r.raw, 0) AS DOUBLE) / h2t.t, 12)
                       AS DECIMAL(28,12)) AS s
           FROM nodes LEFT JOIN h2r ON h2r.id = nodes.id, h2t)
    SELECT nodes.id, CAST(h2.s AS DOUBLE) AS hub, CAST(a2.s AS DOUBLE) AS auth
    FROM nodes JOIN h2 ON h2.id = nodes.id JOIN a2 ON a2.id = nodes.id""",
)
def hits_hubs_authorities(spark, sf):
    """HITS over a deterministic 200-node link graph derived from doc ids
    (operators.graph.hits, 2 iterations): per-half-step L1 normalization with
    12dp-rounded DECIMAL scores — the oracle unrolls both iterations with the
    identical rounding points, so hubs/authorities hash-match exactly."""
    from crawl4ai_scraper_spark.operators.graph import hits

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    e1 = docs.select((F.col("doc_id") % 200).alias("src"),
                     ((F.col("doc_id") * 7 + 1) % 200).alias("dst"))
    e2 = docs.select((F.col("doc_id") % 200).alias("src"),
                     ((F.col("doc_id") * 3 + 2) % 200).alias("dst"))
    return hits(e1.unionByName(e2), n_iter=2)


@_q(
    "recrawl_change_rate",
    """WITH h AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    o AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             CASE WHEN prev IS NOT NULL AND prev <> event_type THEN 1 ELSE 0 END AS chg
      FROM h)
    SELECT user_id,
           COUNT(*) AS n_visits,
           CAST(SUM(chg) AS BIGINT) AS n_changes,
           ROUND(CAST(SUM(chg) AS DOUBLE) / GREATEST(COUNT(*) - 1, 1), 4) AS change_ratio,
           ROUND(CAST(SUM(chg) AS DOUBLE) * 86400.0
                 / GREATEST(MAX(es) - MIN(es), 1), 6) AS changes_per_day
    FROM o GROUP BY user_id""",
)
def recrawl_change_rate(spark, sf):
    """Recrawl scheduling input (operators.temporal.recrawl_stats): each
    user's event stream plays a URL's revisit history (event_type = content
    hash proxy); adjacent-observation change counting via one lag window +
    groupBy sharing a single key shuffle. ``changes_per_day`` is the revisit
    priority an incremental crawler feeds back into the frontier."""
    from crawl4ai_scraper_spark.operators.temporal import recrawl_stats

    ev = _t(spark, sf, "events")
    return recrawl_stats(ev, "user_id", "ts", "event_type", tiebreak="event_id")


# Shared by the BPE contracts: the 3-merge unrolled training oracle.
# Symbol sequences use the operators/bpe.py double-space protocol; each step
# is pair-counts → argmax (cnt desc, a, b) → one-pass native replace, exactly
# the engine's loop.
_BPE_MERGES_SQL = r"""WITH wf AS (
  SELECT w AS word, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w FROM documents)
  WHERE w <> '' GROUP BY w),
ws0 AS (
  SELECT word, freq, '  ' || array_to_string(
    list_transform(range(1, length(word)+1), i -> substr(word, CAST(i AS INT), 1)),
    '  ') || '  ' AS s
  FROM wf),
pc1 AS (SELECT t[CAST(i AS INT)] AS a, t[CAST(i AS INT)+1] AS b, SUM(freq) AS cnt
        FROM (SELECT freq, string_split(trim(s), '  ') AS t FROM ws0),
             UNNEST(range(1, len(t))) AS r(i)
        GROUP BY 1,2),
b1 AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM pc1 ORDER BY cnt DESC, a, b LIMIT 1),
ws1 AS (SELECT word, freq,
               replace(s, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS s
        FROM ws0 CROSS JOIN b1),
pc2 AS (SELECT t[CAST(i AS INT)] AS a, t[CAST(i AS INT)+1] AS b, SUM(freq) AS cnt
        FROM (SELECT freq, string_split(trim(s), '  ') AS t FROM ws1),
             UNNEST(range(1, len(t))) AS r(i)
        GROUP BY 1,2),
b2 AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM pc2 ORDER BY cnt DESC, a, b LIMIT 1),
ws2 AS (SELECT word, freq,
               replace(s, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS s
        FROM ws1 CROSS JOIN b2),
pc3 AS (SELECT t[CAST(i AS INT)] AS a, t[CAST(i AS INT)+1] AS b, SUM(freq) AS cnt
        FROM (SELECT freq, string_split(trim(s), '  ') AS t FROM ws2),
             UNNEST(range(1, len(t))) AS r(i)
        GROUP BY 1,2),
b3 AS (SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM pc3 ORDER BY cnt DESC, a, b LIMIT 1),
ws3 AS (SELECT word, freq,
               replace(s, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS s
        FROM ws2 CROSS JOIN b3)"""


@_q(
    "bpe_pair_counts",
    r"""WITH wf AS (
  SELECT w AS word, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w FROM documents)
  WHERE w <> '' GROUP BY w)
SELECT substr(word, CAST(i AS INT), 1) AS a, substr(word, CAST(i AS INT)+1, 1) AS b,
       CAST(SUM(freq) AS BIGINT) AS cnt
FROM wf, UNNEST(range(1, length(word))) AS r(i)
GROUP BY 1, 2
ORDER BY cnt DESC, a, b LIMIT 50""",
)
def bpe_pair_counts_q(spark, sf):
    """BPE training statistics (operators.bpe.pair_counts over word_syms):
    the top-50 adjacent-character pair counts of the corpus, weighted by
    word frequency — one corpus-volume explode collapses to the distinct-
    word table, then a narrow Generate + one small groupBy; the top-50 cut
    is TakeOrderedAndProject."""
    from crawl4ai_scraper_spark.operators import bpe as B

    ws = B.word_syms(_t(spark, sf, "documents"), "text")
    return (
        B.pair_counts(ws)
        .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
        .limit(50)
    )


@_q(
    "bpe_learned_merges",
    _BPE_MERGES_SQL
    + """
SELECT 1 AS merge_rank, a, b, cnt FROM b1
UNION ALL SELECT 2, a, b, cnt FROM b2
UNION ALL SELECT 3, a, b, cnt FROM b3""",
)
def bpe_learned_merges_q(spark, sf):
    """Distributed BPE tokenizer training (operators.bpe.bpe_train, 3
    merges): per iteration one pair-count groupBy over the distinct-word
    table + a single-row argmax collect (the model artifact), with a native
    one-pass string replace applying the merge. The oracle unrolls all 3
    iterations with identical tie-breaks (cnt desc, a, b)."""
    from crawl4ai_scraper_spark.operators import bpe as B

    merges, _ = B.bpe_train(_t(spark, sf, "documents"), "text", n_merges=3)
    return spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "merge_rank int, a string, b string, cnt long",
    )


@_q(
    "bpe_segment",
    _BPE_MERGES_SQL
    + r""",
tok AS (
  SELECT doc_id, CAST(r.pos AS INT) AS pos, toks[CAST(r.pos AS INT)] AS word
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents) t,
       UNNEST(range(1, len(toks) + 1)) AS r(pos)),
seg AS (
  SELECT tok.doc_id, tok.pos, trim(ws3.s) AS wseg,
         len(string_split(trim(ws3.s), '  ')) AS np
  FROM tok JOIN ws3 ON ws3.word = tok.word)
SELECT doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(np) AS BIGINT) AS n_pieces,
       array_to_string(list(wseg ORDER BY pos), '  ') AS pieces
FROM seg GROUP BY doc_id""",
)
def bpe_segment_q(spark, sf):
    """BPE segmentation under the 3 learned merges (operators.bpe.
    bpe_segment): the trained word→pieces map (distinct-word volume) is
    broadcast into the document token stream; per-doc subword streams are
    reassembled in token order — the same single-shuffle shape as
    vocab_encode. Every word is in the model here (trained on the same
    corpus), so the inline char-fallback path is exercised in pytest
    instead."""
    from crawl4ai_scraper_spark.operators import bpe as B

    docs = _t(spark, sf, "documents")
    merges, word_pieces = B.bpe_train(docs, "text", n_merges=3)
    return B.bpe_segment(docs, "text", "doc_id", word_pieces)


@_q(
    "bpe_piece_vocab",
    _BPE_MERGES_SQL
    + """,
p AS (SELECT freq, UNNEST(string_split(trim(s), '  ')) AS piece FROM ws3),
c AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM p GROUP BY piece)
SELECT piece, cnt,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS INT) AS piece_id
FROM c ORDER BY cnt DESC, piece LIMIT 64""",
)
def bpe_piece_vocab_q(spark, sf):
    """Trained-tokenizer vocabulary (operators.bpe.piece_vocab over the
    3-merge serving map): every emitted subword with corpus frequency and
    dense id. Counting runs at distinct-word volume (pieces weighted by
    word freq); the id window covers only the top-V artifact."""
    from crawl4ai_scraper_spark.operators import bpe as B

    docs = _t(spark, sf, "documents")
    _, word_pieces = B.bpe_train(docs, "text", n_merges=3)
    return B.piece_vocab(word_pieces, vocab_size=64)


# shared by nb_classifier_score and classifier_pr_table: the trained-NB
# per-doc score stream (t/c/tot/v/s CTE bodies)
_NB_SCORE_CTES = r"""t AS (SELECT doc_id, (lang = 'en') AS y,
        UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents),
c AS (SELECT tok, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos_cnt,
             SUM(CASE WHEN y THEN 0 ELSE 1 END) AS neg_cnt FROM t GROUP BY tok),
tot AS (SELECT CAST(SUM(pos_cnt) AS DOUBLE) AS pt, CAST(SUM(neg_cnt) AS DOUBLE) AS nt FROM c),
v AS (SELECT tok, CAST(ROUND(ln((pos_cnt+1.0)/(pt+200.0))
                           - ln((neg_cnt+1.0)/(nt+200.0)), 12) AS DECIMAL(28,12)) AS w
      FROM c CROSS JOIN tot ORDER BY pos_cnt+neg_cnt DESC, tok LIMIT 200),
s AS (SELECT t.doc_id, COALESCE(v.w, CAST(0 AS DECIMAL(28,12))) AS w
      FROM t LEFT JOIN v USING (tok))"""


@_q(
    "nb_classifier_score",
    f"""WITH {_NB_SCORE_CTES}
SELECT doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(CAST(SUM(w) AS DECIMAL(38,12)) AS DOUBLE) AS score, (SUM(w) > 0) AS keep
FROM s GROUP BY doc_id""",
)
def nb_classifier_score_q(spark, sf):
    """Model-based quality filtering (textops.nb_token_weights + nb_score):
    a Laplace-smoothed naive-Bayes classifier trained on the corpus
    (label = English) — the distributed stand-in for the fastText quality
    classifier in GPT-3/LLaMA/RefinedWeb pipelines. Training is one
    map-side-combined token groupBy with per-class conditional sums; the
    top-200 weight table (12dp-rounded DECIMAL log-odds) broadcasts into
    the scoring scan; per-doc sums are exact and order-free."""
    docs = _t(spark, sf, "documents")
    labeled = docs.withColumn("_y", F.col("lang") == "en")
    w = T.nb_token_weights(labeled, "text", "_y", vocab_size=200)
    return T.nb_score(docs, "text", "doc_id", w, prior=0.0)


@_q(
    "dedup_cross_corpus",
    """WITH ref AS (SELECT DISTINCT md5(text) AS text_md5 FROM documents
                    WHERE doc_id % 5 < 2)
SELECT d.doc_id AS id, md5(d.text) AS text_md5
FROM documents d LEFT JOIN ref r ON r.text_md5 = md5(d.text)
WHERE d.doc_id % 5 >= 2 AND r.text_md5 IS NULL""",
)
def dedup_cross_corpus_q(spark, sf):
    """Incremental-crawl dedup (operators.dedup.dedup_cross_corpus): the
    fresh batch (doc_id % 5 >= 2) anti-joined on content md5 against the
    banked reference corpus (doc_id % 5 < 2). Both sides collapse to hash
    keys before the exchange — text never shuffles; the reference side
    reduces to its distinct hash set with map-side combine."""
    docs = _t(spark, sf, "documents")
    new_df = docs.filter(F.col("doc_id") % 5 >= 2)
    ref_df = docs.filter(F.col("doc_id") % 5 < 2)
    return D.dedup_cross_corpus(new_df, ref_df, "text", "doc_id")


@_q(
    "cdx_fetch_candidates",
    """WITH sel AS (
      SELECT doc_id, source, text, n_chars FROM documents WHERE doc_id % 100 < 30
    ), caps AS (
      SELECT 'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR) AS url,
             CAST(('2024-01-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
                   || ' 12:00:00') AS TIMESTAMP) AS ts,
             200 AS status, 'text/html' AS mime, md5(text) AS digest,
             CAST(n_chars AS BIGINT) AS warc_length,
             CAST(doc_id * 1000 AS BIGINT) AS warc_offset,
             'shard-w1.warc.gz' AS warc_filename
      FROM sel
      UNION ALL
      SELECT 'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR),
             CAST(('2024-02-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
                   || ' 12:00:00') AS TIMESTAMP),
             CASE WHEN doc_id % 4 = 0 THEN 404 ELSE 200 END,
             CASE WHEN doc_id % 7 = 0 THEN 'image/png' ELSE 'text/html' END,
             md5(text || 'b'),
             CAST(n_chars + 1 AS BIGINT),
             CAST(doc_id * 2000 AS BIGINT),
             'shard-w2.warc.gz'
      FROM sel
    ), w AS (
      SELECT * FROM caps WHERE status = 200 AND mime LIKE 'text/%'
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY url
        ORDER BY ts DESC, digest DESC, warc_filename DESC,
                 warc_offset DESC, warc_length DESC) AS rn
      FROM w)
    SELECT url, strftime(ts, '%Y-%m-%d %H:%M:%S') AS capture_ts_str,
           digest, warc_length, warc_offset, warc_filename
    FROM r WHERE rn = 1""",
)
def cdx_fetch_candidates(spark, sf):
    """Common-Crawl-style CDX index ingestion (sources/cdx.py): two
    synthesized CDXJ captures per selected URL (the February one sometimes
    404/non-text), rendered as real index lines, parsed by the REAL native
    parser (split + from_json + to_timestamp_ntz — parse is load-bearing),
    then fetch_candidates keeps the newest wanted capture per URL via ONE
    max-struct groupBy (no window). The oracle reproduces the selection
    with an explicit QUALIFY-style ranking."""
    from crawl4ai_scraper_spark.sources.cdx import fetch_candidates, parse_cdxj

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 100 < 30)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/docs/d"),
        F.col("doc_id").cast("string"),
    )
    dd = F.lpad((F.col("doc_id") % 27 + 1).cast("string"), 2, "0")

    def line(ts_prefix, status, mime, digest, length, offset, fname):
        payload = F.to_json(
            F.struct(
                url.alias("url"),
                status.cast("string").alias("status"),
                mime.alias("mime"),
                digest.alias("digest"),
                length.cast("string").alias("length"),
                offset.cast("string").alias("offset"),
                F.lit(fname).alias("filename"),
            )
        )
        ts = F.concat(F.lit(ts_prefix), dd, F.lit("120000"))
        urlkey = F.concat(F.lit("k"), F.col("doc_id").cast("string"))
        return F.concat_ws(" ", urlkey, ts, payload)

    cap_a = docs.select(
        line(
            "202401", F.lit(200), F.lit("text/html"), F.md5("text"),
            F.col("n_chars"), F.col("doc_id") * 1000, "shard-w1.warc.gz",
        ).alias("value")
    )
    cap_b = docs.select(
        line(
            "202402",
            F.when(F.col("doc_id") % 4 == 0, F.lit(404)).otherwise(F.lit(200)),
            F.when(F.col("doc_id") % 7 == 0, F.lit("image/png")).otherwise(
                F.lit("text/html")
            ),
            F.md5(F.concat(F.col("text"), F.lit("b"))),
            F.col("n_chars") + 1, F.col("doc_id") * 2000, "shard-w2.warc.gz",
        ).alias("value")
    )
    captures = parse_cdxj(cap_a.unionByName(cap_b))
    cands = fetch_candidates(captures, statuses=(200,), mime_prefix="text/")
    return cands.select(
        "url",
        F.date_format("capture_ts", "yyyy-MM-dd HH:mm:ss").alias("capture_ts_str"),
        "digest", "warc_length", "warc_offset", "warc_filename",
    )


@_q(
    "wet_roundtrip_fidelity",
    """SELECT 'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR) AS url,
       '2024-03-' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0') || ' 08:30:00' AS ts_str,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_rt,
       md5(text) AS text_md5
    FROM documents WHERE doc_id % 100 < 25""",
)
def wet_roundtrip_fidelity(spark, sf):
    """Common-Crawl WET interchange (sources/wet.py): the selected documents
    are serialized into real WET conversion shards by the production packer
    (``wet_shards`` — per-partition serialization, member-per-record gzip,
    leading warcinfo record) and parsed back by the REAL reader codec
    (``parse_wet_shard`` — warcinfo skipped, UTF-8 payloads). Both codec
    directions are load-bearing: the output (url, timestamp, char count,
    text md5) only matches the oracle — which reads the documents table
    directly — if the round-trip is byte-faithful."""
    import pandas as pd

    from crawl4ai_scraper_spark.sources.wet import (
        WET_SCHEMA,
        parse_wet_shard,
        wet_shards,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 100 < 25)
    dd = F.lpad((F.col("doc_id") % 27 + 1).cast("string"), 2, "0")
    recs = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/docs/d"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.to_timestamp(
            F.concat(F.lit("2024-03-"), dd, F.lit(" 08:30:00"))
        ).alias("warc_ts"),
        "text",
    )
    shards = wet_shards(recs.repartition(8), per_record_gzip=True)

    def _unpack(batches):
        for pdf in batches:
            urls, tss, texts = [], [], []
            for blob in pdf["shard"]:
                for url, ts, text in parse_wet_shard(bytes(blob)):
                    urls.append(url)
                    tss.append(ts)
                    texts.append(text)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "text": texts})

    parsed = shards.mapInPandas(_unpack, WET_SCHEMA)
    return parsed.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.length("text").cast("long").alias("n_chars_rt"),
        F.md5("text").alias("text_md5"),
    )


@_q(
    "lm_perplexity",
    """WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM (SELECT UNNEST(w) AS w1 FROM w) GROUP BY w1
    ), tot AS (
      SELECT CAST(SUM(c1) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v FROM uni
    ), dg AS (
      SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS gram
      FROM (SELECT doc_id, w, UNNEST(range(1, len(w))) AS i FROM w WHERE len(w) >= 2)
    ), big AS (
      SELECT gram, COUNT(*) AS c2 FROM dg GROUP BY gram
    ), bt AS (
      SELECT dg.doc_id,
             SUM(-log2((big.c2 + 0.5) / (uni.c1 + 0.5 * tot.v))) AS bs
      FROM dg JOIN big USING (gram) JOIN uni ON uni.w1 = dg.w1 CROSS JOIN tot
      GROUP BY dg.doc_id
    ), ft AS (
      SELECT w.doc_id, len(w.w) AS n_tokens,
             -log2((uni.c1 + 0.5) / (tot.n + 0.5 * tot.v)) AS t0
      FROM w JOIN uni ON uni.w1 = w.w[1] CROSS JOIN tot
    )
    SELECT ft.doc_id, CAST(ft.n_tokens AS BIGINT) AS n_tokens,
           ROUND((ft.t0 + COALESCE(bt.bs, 0)) / ft.n_tokens, 4) AS xent_bits,
           ROUND(POWER(2, ROUND((ft.t0 + COALESCE(bt.bs, 0)) / ft.n_tokens, 4)), 4) AS ppl
    FROM ft LEFT JOIN bt ON bt.doc_id = ft.doc_id""",
)
def lm_perplexity(spark, sf):
    """CCNet-style bigram-LM perplexity (operators.textops.
    bigram_lm_perplexity): every document scored by its cross-entropy under
    an add-0.5-smoothed bigram model trained on the same corpus — two count
    aggregations, two scoring joins, one per-doc sum. The oracle unrolls the
    identical model in SQL (unigram/bigram CTEs, same smoothing, same
    first-token unigram term, ppl derived from the 4-decimal-rounded
    cross-entropy on both sides)."""
    return T.bigram_lm_perplexity(
        _t(spark, sf, "documents"), "text", "doc_id", alpha=0.5
    )


@_q(
    "bpe_encode_ids",
    _BPE_MERGES_SQL
    + r""",
p AS (SELECT freq, UNNEST(string_split(trim(s), '  ')) AS piece FROM ws3),
c AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM p GROUP BY piece),
v AS (SELECT piece, piece_id FROM (
    SELECT piece, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS INT) AS piece_id
    FROM c) WHERE piece_id <= 64),
wp AS (SELECT word, CAST(r.i AS INT) AS ppos, t[CAST(r.i AS INT)] AS piece
       FROM (SELECT word, string_split(trim(s), '  ') AS t FROM ws3),
            UNNEST(range(1, len(t) + 1)) AS r(i)),
tok AS (SELECT doc_id, CAST(r.pos AS INT) AS pos, toks[CAST(r.pos AS INT)] AS word
        FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
              FROM documents) t,
             UNNEST(range(1, len(toks) + 1)) AS r(pos)),
enc AS (SELECT tok.doc_id, tok.pos, wp.ppos, COALESCE(v.piece_id, 0) AS pid
        FROM tok JOIN wp ON wp.word = tok.word
        LEFT JOIN v ON v.piece = wp.piece)
SELECT doc_id AS id, CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_pieces,
       array_to_string(list(CAST(pid AS VARCHAR) ORDER BY pos, ppos), ',') AS ids_csv
FROM enc GROUP BY doc_id""",
)
def bpe_encode_ids_q(spark, sf):
    """Tokenize-to-ids under the TRAINED tokenizer (operators.bpe.
    bpe_encode_ids over the 3-merge model + top-64 piece_vocab, unk_id=0):
    the word -> id-array encode map is built at distinct-word volume (pieces
    resolved against the broadcast vocabulary; tail pieces outside the top-V
    become unk — exercised here since V=64 cuts the real piece set), then
    broadcast into the document token stream with one per-doc reassembly
    shuffle. The id arrays are joined to a CSV scalar for the driver's hash
    (lists are unhashable in its canonicalizer); the char-fallback path for
    serving-time OOV words is pytest-covered (the contract corpus is the
    training corpus, so every word is in the model)."""
    from crawl4ai_scraper_spark.operators import bpe as B

    docs = _t(spark, sf, "documents")
    _, word_pieces = B.bpe_train(docs, "text", n_merges=3)
    vocab = B.piece_vocab(word_pieces, vocab_size=64)
    enc = B.bpe_encode_ids(docs, "text", "doc_id", word_pieces, vocab, unk_id=0)
    return enc.select(
        "id", "n_words", "n_pieces",
        F.concat_ws(
            ",", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids_csv"),
    )


@_q(
    "sequence_pack_ids",
    r"""WITH tok AS (
  SELECT doc_id, CAST(r.pos AS INT) AS pos, toks[CAST(r.pos AS INT)] AS tok
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents) t,
       UNNEST(range(1, len(toks) + 1)) AS r(pos)
), counts AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
vocab AS (
  SELECT tok, tid FROM (
    SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS INT) AS tid
    FROM counts) WHERE tid <= 30
), enc AS (
  SELECT t.doc_id, t.pos, COALESCE(v.tid, 0) AS tid
  FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
), n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM enc GROUP BY doc_id),
c AS (SELECT doc_id,
             -- CAST: SUM(BIGINT) is HUGEINT in DuckDB; narrow before output
             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      FROM n),
g AS (SELECT e.doc_id, c.cum_before + e.pos - 1 AS gp, e.tid
      FROM enc e JOIN c USING (doc_id)),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM n)
SELECT CAST(gp // 128 AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_filled,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       array_to_string(list(CAST(tid AS VARCHAR) ORDER BY gp), ',') AS ids_csv
FROM g CROSS JOIN tot
WHERE (gp // 128 + 1) * 128 <= t
GROUP BY 1""",
)
def sequence_pack_ids_q(spark, sf):
    """MATERIALIZED training sequences (operators.packing.pack_token_ids +
    packed_sequences over vocab_encode ids, V=30, OOV=0, seq_len=128):
    documents' id arrays laid end-to-end in doc_id order, exploded to global
    token positions via the two-phase bucketed cumsum (bucket_size=64 so the
    contract input crosses buckets), trailing partial sequence dropped via
    the broadcast total (training-loader drop-last). The oracle's
    single-partition SUM OVER window is the semantic spec the bucketed
    cumsum must equal; each sequence's ids join to a CSV scalar for the
    driver's hash."""
    from crawl4ai_scraper_spark.operators.packing import (
        pack_token_ids,
        packed_sequences,
    )

    docs = _t(spark, sf, "documents")
    vocab = T.vocab_build(docs, "text", vocab_size=30)
    enc = T.vocab_encode(docs, "text", "doc_id", vocab, oov_id=0)
    packed = pack_token_ids(enc, "id", "token_ids", seq_len=128, bucket_size=64)
    seqs = packed_sequences(packed, "id", 128)
    return seqs.select(
        "seq_id",
        F.size("token_ids").cast("long").alias("n_filled"),
        "n_docs",
        F.concat_ws(
            ",", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids_csv"),
    )


@_q(
    "weighted_sample",
    r"""WITH s AS (
  SELECT doc_id, n_chars,
         -ln((CAST('0x' || substr(md5('w1:' || CAST(doc_id AS VARCHAR)), 1, 12)
                   AS BIGINT) + 1.0) / 281474976710656.0)
             / (CAST(n_chars AS DOUBLE) + 1.0) AS samp_key
  FROM documents
  WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) + 1.0 > 0)
SELECT doc_id, n_chars, ROUND(samp_key, 6) AS samp_key
FROM s ORDER BY s.samp_key, doc_id LIMIT 50""",
)
def weighted_sample_q(spark, sf):
    """Deterministic weighted sampling without replacement (textops.
    weighted_sample — Efraimidis-Spirakis A-Res, length-weighted here):
    every doc draws u from its md5 digest (first 12 hex digits, so the draw
    is engine-reproducible) and ranks by -ln(u)/weight; the 50 smallest keys
    win via TakeOrderedAndProject — per-partition heaps, no global sort, no
    RNG state. The oracle replays the identical digest -> u -> key math;
    keys rounded to 6dp for the hash (selection uses the unrounded key on
    both sides)."""
    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    out = T.weighted_sample(
        docs, "doc_id", F.col("n_chars").cast("double") + F.lit(1.0), k=50,
        salt="w1",
    )
    return out.select("doc_id", "n_chars", F.round("samp_key", 6).alias("samp_key"))


@_q(
    "host_trap_stats",
    r"""WITH u AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
         CASE WHEN doc_id % 5 = 0
              THEN '/cal/2024/' || CAST(doc_id AS VARCHAR)
              ELSE '/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) END AS path,
         CASE WHEN doc_id % 5 = 0 THEN 'trap page content' ELSE text END AS body
  FROM documents
), t AS (
  SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS tpl, md5(body) AS th
  FROM u
), a AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT tpl) AS BIGINT) AS n_templates,
         CAST(COUNT(DISTINCT th) AS BIGINT) AS n_distinct_texts
  FROM t GROUP BY host)
SELECT host, n_urls, n_templates, n_distinct_texts,
       ROUND(n_urls / n_templates, 4) AS urls_per_template,
       ROUND(1.0 - n_distinct_texts / n_urls, 4) AS dup_content_ratio,
       (n_urls >= 20 AND ROUND(n_urls / n_templates, 4) > 10.0
        AND ROUND(1.0 - n_distinct_texts / n_urls, 4) > 0.5) AS trap_suspect
FROM a""",
)
def host_trap_stats_q(spark, sf):
    """Statistical per-host trap detection (plans.politeness.
    host_trap_stats) over a deterministically trap-seeded frontier: host h0
    serves a calendar-style URL space (digit-normalized templates collapse
    to ONE) with duplicated content, the other hosts mint hash-distinct
    paths with their real texts. Template + content hash are scan-speed
    projections; ONE host-keyed groupBy (shared Expand for the two exact
    distinct counts) yields urls_per_template and dup_content_ratio, and
    ``trap_suspect`` composes them — the behavioral complement to the
    per-URL hygiene_flags heuristics, feeding url_blocklist_filter."""
    from crawl4ai_scraper_spark.plans.politeness import host_trap_stats

    docs = _t(spark, sf, "documents")
    is_trap = F.col("doc_id") % 5 == 0
    host = F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"),
                    F.lit(".example"))
    path = F.when(
        is_trap,
        F.concat(F.lit("/cal/2024/"), F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(F.lit("/"),
                 F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6))
    )
    frame = docs.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url"),
        F.when(is_trap, F.lit("trap page content")).otherwise(F.col("text"))
        .alias("body"),
    )
    return host_trap_stats(frame, "host", "url", "body")


@_q(
    "template_trap_stats",
    r"""WITH u AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 5 AS VARCHAR) || '.example' AS host,
         CASE WHEN doc_id % 3 = 0 THEN '/cal/2024/' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 3 = 1 THEN '/tag/' || CAST(doc_id AS VARCHAR)
              ELSE '/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) END AS path,
         CASE WHEN doc_id % 3 = 0
              THEN 'event listing for 2024/' || CAST(doc_id AS VARCHAR)
              ELSE text END AS body
  FROM documents
), t AS (
  SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS tpl,
         md5(regexp_replace(body, '[0-9]+', 'N', 'g')) AS th
  FROM u
), a AS (
  SELECT host, tpl, CAST(COUNT(*) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT th) AS BIGINT) AS n_distinct_texts
  FROM t GROUP BY host, tpl)
SELECT host, tpl, n_urls, n_distinct_texts,
       ROUND(1.0 - n_distinct_texts / n_urls, 4) AS dup_content_ratio,
       (n_urls >= 20 AND ROUND(1.0 - n_distinct_texts / n_urls, 4) > 0.5)
           AS trap_suspect
FROM a""",
)
def template_trap_stats_q(spark, sf):
    """Trap detection at the (host, path-template) grain — the unit the
    LIVE crawl screens on (plans.politeness.template_trap_stats, wired into
    run_crawl via cfg.trap_screen → run_round(blocked_templates=...)). The
    content fingerprint gets the same digit-collapse as the URL template,
    so calendar pages that echo their own date into the body collapse to
    one fingerprint while the /tag/N pages carrying real distinct texts do
    not. One (host, tpl)-keyed groupBy; text never shuffles — only its
    normalized md5."""
    from crawl4ai_scraper_spark.plans.politeness import template_trap_stats

    docs = _t(spark, sf, "documents")
    m3 = F.col("doc_id") % 3
    host = F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"),
                    F.lit(".example"))
    path = (
        F.when(m3 == 0, F.concat(F.lit("/cal/2024/"),
                                 F.col("doc_id").cast("string")))
        .when(m3 == 1, F.concat(F.lit("/tag/"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(
            F.lit("/"), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6)))
    )
    body = F.when(
        m3 == 0,
        F.concat(F.lit("event listing for 2024/"), F.col("doc_id").cast("string")),
    ).otherwise(F.col("text"))
    frame = docs.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url"),
        body.alias("body"),
    )
    return template_trap_stats(frame, "host", "url", "body")


@_q(
    "kn_perplexity",
    r"""WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents
), tev AS (
  SELECT w[CAST(i AS INT)] AS w1,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] AS gram,
         w[CAST(i AS INT)+1] AS w2
  FROM (SELECT w FROM tok WHERE doc_id % 2 = 0) t,
       UNNEST(range(1, len(w))) AS r(i)
), c2 AS (SELECT gram, CAST(COUNT(*) AS DOUBLE) AS c2 FROM tev GROUP BY gram),
ctx AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1,
               CAST(COUNT(DISTINCT w2) AS DOUBLE) AS nfol
        FROM tev GROUP BY w1),
pred AS (SELECT w2, CAST(COUNT(DISTINCT w1) AS DOUBLE) AS npred
         FROM tev GROUP BY w2),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt FROM c2),
vc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vcont FROM pred),
dev AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1,
         w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1] AS gram,
         w[CAST(i AS INT)+1] AS w2
  FROM tok, UNNEST(range(1, len(w))) AS r(i)
), ft AS (
  SELECT tok.doc_id, len(tok.w) AS n_tokens,
         CAST(ROUND(-log2((COALESCE(p.npred, 0) + 1)
                          / (tot.nt + vc.vcont + 1)), 12)
              AS DECIMAL(28,12)) AS t0
  FROM tok LEFT JOIN pred p ON p.w2 = tok.w[1] CROSS JOIN tot CROSS JOIN vc
), sc AS (
  SELECT d.doc_id,
         CAST(ROUND(-log2(CASE WHEN x.c1 IS NULL
             THEN (COALESCE(p.npred, 0) + 1) / (tot.nt + vc.vcont + 1)
             ELSE GREATEST(COALESCE(b.c2, 0) - 0.75, 0) / x.c1
                  + 0.75 * x.nfol / x.c1
                    * ((COALESCE(p.npred, 0) + 1) / (tot.nt + vc.vcont + 1))
             END), 12) AS DECIMAL(28,12)) AS t
  FROM dev d LEFT JOIN c2 b USING (gram) LEFT JOIN ctx x USING (w1)
       LEFT JOIN pred p USING (w2) CROSS JOIN tot CROSS JOIN vc
), bs AS (SELECT doc_id, CAST(SUM(t) AS DECIMAL(38,12)) AS bs
          FROM sc GROUP BY doc_id)
SELECT ft.doc_id, CAST(ft.n_tokens AS BIGINT) AS n_tokens,
       ROUND((CAST(ft.t0 AS DOUBLE) + COALESCE(CAST(bs.bs AS DOUBLE), 0.0))
             / ft.n_tokens, 4) AS xent_bits,
       ROUND(POWER(2, ROUND((CAST(ft.t0 AS DOUBLE)
             + COALESCE(CAST(bs.bs AS DOUBLE), 0.0)) / ft.n_tokens, 4)), 4)
           AS ppl
FROM ft LEFT JOIN bs USING (doc_id)""",
)
def kn_perplexity_q(spark, sf):
    """Interpolated Kneser-Ney bigram perplexity (textops.kn_lm_perplexity,
    D=0.75) — the smoothing family KenLM/CCNet actually use — trained on
    the EVEN-doc_id half of the corpus and scoring every doc, so the
    unseen-bigram backoff, unseen-context and unseen-continuation floors
    are all live in the contract. Per-event bits are 12dp-rounded and
    summed as DECIMAL(28,12) (exact, order-free — partitioning/engine
    independent); the oracle replays the identical model: continuation
    counts, discount, floors, final 4dp rounding."""
    docs = _t(spark, sf, "documents")
    return T.kn_lm_perplexity(
        docs, "text", "doc_id",
        train=docs.filter(F.col("doc_id") % 2 == 0), discount=0.75,
    )


