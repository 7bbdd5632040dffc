"""Sessionization, quality-filter signals, dup clusters, temporal ops, frontier hygiene.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403
from crawl4ai_scraper_spark.contract.q_crawl import _SW_EN

# ---------------------------------------------------------------------------
# Sessionization (streaming-adjacent stateful op, batch-expressible)
# ---------------------------------------------------------------------------

@_q(
    "sessionize_events",
    """SELECT user_id, session_id, COUNT(*) AS n_events
    FROM (
      SELECT user_id, event_id,
             -- CAST: DuckDB windowed SUM yields HUGEINT; pin to BIGINT to
             -- match Spark so the driver's value hash agrees.
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events))
    GROUP BY user_id, session_id""",
)
def sessionize_events(spark, sf):
    """Gap-based sessionization (the stateful-op pattern behind
    applyInPandasWithState, expressed as windows for the batch oracle)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    is_new = F.when(
        lag_ts.isNull() | (F.col("ts") - lag_ts > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(run))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


_BM25_TERMS = ["spark", "shuffle", "vector"]


def _bm25_sql(terms, k1=1.2, b=0.75) -> str:
    tf = {t: f"CAST(len(list_filter(w, x -> x = '{t}')) AS DOUBLE)" for t in terms}
    dfs = ", ".join(
        f"CAST(SUM(CASE WHEN {tf[t]} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i, t in enumerate(terms)
    )
    parts = " + ".join(
        f"ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * ({tf[t]} * {k1 + 1.0}) / ({tf[t]} + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        for i, t in enumerate(terms)
    )
    return f"""WITH d AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS dl
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {dfs}
      FROM d)
    SELECT doc_id, ROUND({parts}, 4) AS bm25 FROM d, stats"""


@_q("bm25_scores", _bm25_sql(_BM25_TERMS))
def bm25_scores_q(spark, sf):
    """Okapi BM25 of every doc against a fixed query-term set — per-row array
    math + ONE scalar-row corpus-stats aggregate broadcast back (no explode,
    no payload shuffle); identical float expression tree in the oracle."""
    return T.bm25_scores(_t(spark, sf, "documents"), "text", "doc_id", _BM25_TERMS)


# ---------------------------------------------------------------------------
# Repetition / quality-filter signals (Gopher-style)
# ---------------------------------------------------------------------------

_W_SQL = """SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\\s+') AS w,
         length(regexp_replace(trim(text), '\\s+', '', 'g')) AS chars
    FROM documents"""

# CASE: a doc shorter than n words yields ONE whole-text gram — the Spark
# side's ngrams_from_tokens convention (range(...) alone would yield an
# EMPTY list there, flipping dup fractions / dropping top-ngram rows for
# ultra-short docs).
_G2_SQL = ("CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')] "
           "ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END")
_G3_SQL = ("CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
           "ELSE list_transform(range(1, len(w) - 1), "
           "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END")


@_q(
    "repetition_signals",
    f"""WITH w AS ({_W_SQL})
    SELECT doc_id,
      CAST(len(w) AS BIGINT) AS n_words,
      ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1), 4) AS dup_word_frac,
      ROUND(1.0 - CAST(len(list_distinct({_G2_SQL})) AS DOUBLE)
            / greatest(len({_G2_SQL}), 1), 4) AS dup_2gram_frac,
      ROUND(1.0 - CAST(len(list_distinct({_G3_SQL})) AS DOUBLE)
            / greatest(len({_G3_SQL}), 1), 4) AS dup_3gram_frac,
      ROUND(CAST(chars AS DOUBLE) / greatest(len(w), 1), 4) AS mean_word_len,
      ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
            / greatest(len(w), 1), 4) AS symbol_ratio
    FROM w""",
)
def repetition_signals(spark, sf):
    """Gopher-style repetition/shape signals per doc — pure column math (no
    shuffle, codegen'd): duplicate word/2-gram/3-gram fractions, mean word
    length, symbol-to-word ratio."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).cast("bigint").alias("n_words"),
        T.dup_word_fraction(F.col("text")).alias("dup_word_frac"),
        T.dup_ngram_fraction(F.col("text"), 2).alias("dup_2gram_frac"),
        T.dup_ngram_fraction(F.col("text"), 3).alias("dup_3gram_frac"),
        T.mean_word_length(F.col("text")).alias("mean_word_len"),
        T.symbol_word_ratio(F.col("text")).alias("symbol_ratio"),
    )


@_q(
    "gopher_quality_filter",
    f"""WITH w AS ({_W_SQL}), m AS (
      SELECT doc_id,
        len(w) AS n,
        ROUND(CAST(chars AS DOUBLE) / greatest(len(w), 1), 4) AS mwl,
        ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
              / greatest(len(w), 1), 4) AS sym,
        len(list_filter(w, t -> t IN ({_SW_EN}))) AS sw_hits,
        ROUND(1.0 - CAST(len(list_distinct({_G3_SQL})) AS DOUBLE)
              / greatest(len({_G3_SQL}), 1), 4) AS dup3
      FROM w)
    SELECT doc_id,
      n >= {T.GOPHER_MIN_WORDS} AND n <= {T.GOPHER_MAX_WORDS} AS ok_word_count,
      mwl >= {T.GOPHER_MIN_MEAN_WORD_LEN} AND mwl <= {T.GOPHER_MAX_MEAN_WORD_LEN} AS ok_mean_word_len,
      sym <= {T.GOPHER_MAX_SYMBOL_RATIO} AS ok_symbol_ratio,
      sw_hits >= {T.GOPHER_MIN_STOPWORD_HITS} AS ok_stopwords,
      dup3 <= {T.GOPHER_MAX_DUP_3GRAM_FRAC} AS ok_dup_3gram,
      (n >= {T.GOPHER_MIN_WORDS} AND n <= {T.GOPHER_MAX_WORDS})
        AND (mwl >= {T.GOPHER_MIN_MEAN_WORD_LEN} AND mwl <= {T.GOPHER_MAX_MEAN_WORD_LEN})
        AND sym <= {T.GOPHER_MAX_SYMBOL_RATIO}
        AND sw_hits >= {T.GOPHER_MIN_STOPWORD_HITS}
        AND dup3 <= {T.GOPHER_MAX_DUP_3GRAM_FRAC} AS keep
    FROM m""",
)
def gopher_quality_filter(spark, sf):
    """Gopher-rule corpus filter: per-rule pass flags + overall keep verdict
    (the pre-dedup filter pass of an LLM-training-data pipeline). Thresholds
    are compared on the same 4dp-rounded signals in both engines."""
    return T.gopher_filter(_t(spark, sf, "documents"), "text", "doc_id")


@_q(
    "top_ngram_stats",
    f"""WITH w AS ({_W_SQL}), g AS (
      SELECT doc_id, chars, UNNEST({_G2_SQL}) AS gram FROM w
    ), c AS (
      SELECT doc_id, chars, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, chars, gram)
    SELECT doc_id, gram AS top_gram, CAST(cnt AS BIGINT) AS top_count,
           ROUND(CAST(cnt AS DOUBLE) * length(replace(gram, ' ', ''))
                 / greatest(CAST(chars AS DOUBLE), 1.0), 4) AS top_char_frac
    FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) = 1""",
)
def top_ngram_stats_q(spark, sf):
    """Most-frequent 2-gram per doc + its character fraction (Gopher's
    top-n-gram rule) — explode → count → min-struct argmax (map-side
    combine; the oracle's window is the same argmax)."""
    return T.top_ngram_stats(_t(spark, sf, "documents"), "text", "doc_id", n=2)


@_q(
    "topk_ngrams",
    f"""WITH w AS ({_W_SQL}), g AS (SELECT UNNEST({_G2_SQL}) AS gram FROM w)
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM g GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20""",
)
def topk_ngrams(spark, sf):
    """Corpus-level top-20 word 2-grams (vocabulary head) — groupBy with
    map-side combine + TakeOrderedAndProject (no global sort)."""
    return T.corpus_topk_ngrams(_t(spark, sf, "documents"), "text", n=2, k=20)


_PII_T_SQL = ("text || ' contact user' || CAST(doc_id AS VARCHAR) || "
              "'@mail.example.com or +1 555-123-4567 from 10.0.' || "
              "CAST(doc_id % 256 AS VARCHAR) || '.7'")


@_q(
    "pii_redaction",
    f"""WITH p AS (SELECT doc_id, {_PII_T_SQL} AS t FROM documents)
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(t,
        '{T.EMAIL_RX}', '<EMAIL>', 'g'),
        '{T.PHONE_RX}', '<PHONE>', 'g'),
        '{T.IPV4_RX}', '<IP>', 'g') AS redacted,
      len(regexp_extract_all(t, '{T.EMAIL_RX}')) AS n_emails,
      len(regexp_extract_all(t, '{T.PHONE_RX}')) AS n_phones,
      len(regexp_extract_all(t, '{T.IPV4_RX}')) AS n_ips
    FROM p""",
)
def pii_redaction(spark, sf):
    """PII redaction + per-kind counts over docs with planted email / phone /
    IPv4 (same Java∩RE2 regex literals in both engines) — pure regexp chain,
    scan speed."""
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1 555-123-4567 from 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ).alias("t"),
    )
    counts = T.pii_counts(F.col("t"))
    return docs.select(
        "doc_id",
        T.redact_pii(F.col("t")).alias("redacted"),
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
    )


@_q(
    "stratified_sample",
    """SELECT doc_id, lang FROM documents
    WHERE CASE
      WHEN lang = 'de' THEN substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 3) < '800'
      WHEN lang = 'en' THEN substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 3) < '400'
      ELSE substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 3) < '080'
    END""",
)
def stratified_sample_q(spark, sf):
    """Per-language deterministic sampling (corpus rebalancing: keep 1/2 of
    de, 1/4 of en, 1/32 of everything else) — one CASE'd md5-threshold
    filter, pushed to the scan."""
    return T.stratified_sample(
        _t(spark, sf, "documents").select("doc_id", "lang"),
        key_col="doc_id", strata_col="lang",
        rates={"de": 0.5, "en": 0.25}, default_rate=1 / 32, salt="s1",
    )


@_q(
    "normalize_text",
    """SELECT doc_id,
      trim(regexp_replace(
        regexp_replace(
          nfc_normalize(text || ' combi e' || chr(769) || chr(9) || 'tail' || chr(7)),
          '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
        '\\s+', ' ', 'g')) AS norm_text
    FROM documents""",
)
def normalize_text_q(spark, sf):
    """Unicode NFC + control strip + whitespace collapse over docs with a
    planted combining sequence (e + U+0301 → é) , tab and BEL — the
    canonicalization pass before fingerprint/dedup. NFC runs as an Arrow
    pandas_udf (Spark has no native NFC); DuckDB's nfc_normalize is the
    oracle."""
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" combi é\ttail\x07")).alias("t"),
    )
    return docs.select("doc_id", T.normalize_text(F.col("t")).alias("norm_text"))


@_q(
    "hash_sample",
    """SELECT doc_id, lang FROM documents
    WHERE substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 3) < '200'""",
)
def hash_sample_q(spark, sf):
    """Deterministic md5-threshold sampling at rate 1/8 — same rows selected
    by both engines regardless of partitioning (the repeatable dev-slice
    primitive; at 100 TB the filter pushes to the scan)."""
    return T.hash_sample(_t(spark, sf, "documents").select("doc_id", "lang"),
                         "doc_id", rate=0.125, salt="s1")


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components over the pair graph)
# ---------------------------------------------------------------------------

@_q(
    "dedup_clusters",
    """WITH RECURSIVE e1 AS (
      SELECT doc_id AS src, doc_id - (doc_id % 5) AS dst
      FROM documents WHERE doc_id < 200 AND doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, doc_id + 5 FROM documents WHERE doc_id < 195 AND doc_id % 15 = 0
    ), eb AS (
      SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1
    ), nodes AS (SELECT DISTINCT src AS id FROM eb
    ), reach AS (
      SELECT id, id AS lbl FROM nodes
      UNION
      SELECT eb.src AS id, r.lbl FROM reach r JOIN eb ON eb.dst = r.id
    )
    SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id""",
)
def dedup_clusters_q(spark, sf):
    """Connected components over a deterministic near-dup pair graph (5-node
    stars bridged into chains every 15 ids — multi-round merges exercised).
    Spark runs iterative min-label propagation (operators.clustering);
    the oracle computes the same components by recursive transitive closure.
    The minhash→clusters composition is pytest-verified against a union-find
    oracle (tests/test_kernel.py)."""
    from crawl4ai_scraper_spark.operators.clustering import dup_clusters

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    star = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("id_b"),
    )
    bridge = docs.filter((F.col("doc_id") < 195) & (F.col("doc_id") % 15 == 0)).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 5).alias("id_b")
    )
    return dup_clusters(star.unionByName(bridge))


_CLUSTER_SQL = """WITH RECURSIVE e1 AS (
      SELECT doc_id AS src, doc_id - (doc_id % 5) AS dst
      FROM documents WHERE doc_id < 200 AND doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, doc_id + 5 FROM documents WHERE doc_id < 195 AND doc_id % 15 = 0
    ), eb AS (
      SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1
    ), nodes AS (SELECT DISTINCT src AS id FROM eb
    ), reach AS (
      SELECT id, id AS lbl FROM nodes
      UNION
      SELECT eb.src AS id, r.lbl FROM reach r JOIN eb ON eb.dst = r.id
    ), comp AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)"""


@_q(
    "dedup_survivors",
    f"""{_CLUSTER_SQL}
    SELECT d.doc_id, d.lang FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
    WHERE d.doc_id < 200 AND (comp.id IS NULL OR comp.cluster_id = d.doc_id)""",
)
def dedup_survivors_q(spark, sf):
    """Keep-one-per-cluster over the deterministic pair graph: the corpus
    joined to the component map, rows kept iff unmatched (singleton) or the
    component minimum — the final stage of the near-dup dedup pipeline."""
    from crawl4ai_scraper_spark.operators.clustering import dedup_survivors, dup_clusters

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    ids = docs.select("doc_id")
    star = ids.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("id_b"),
    )
    bridge = ids.filter((F.col("doc_id") < 195) & (F.col("doc_id") % 15 == 0)).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 5).alias("id_b")
    )
    clusters = dup_clusters(star.unionByName(bridge))
    return dedup_survivors(docs.select("doc_id", "lang"), clusters, "doc_id")


@_q(
    "embedding_quantize",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    m AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
                 list_aggregate(list_transform(e, x -> abs(x)), 'max') AS mx FROM v)
    SELECT vec_id, CAST(i AS INT) AS dim_idx,
           -- + 0: collapse IEEE negative zero (Spark and DuckDB format it
           -- differently after ROUND of a tiny negative quotient)
           ROUND(e[CAST(i AS INT) + 1] / nrm, 4) + 0 AS unit_val,
           -- floor(x+0.5), not round(): DuckDB rounds half-to-even, Spark HALF_UP
           GREATEST(-127, LEAST(127,
             CAST(floor(e[CAST(i AS INT) + 1] * 127.0 / mx + 0.5) AS INT))) AS q8
    FROM m, UNNEST(range(0, 64)) AS t(i)""",
)
def embedding_quantize_q(spark, sf):
    """L2-normalize + symmetric int8 quantization per dimension (exploded
    scalar rows) — vector preprocessing for the ANN stages; same sequential
    fold and floor-based rounding in both engines."""
    return S.embedding_quantize(_t(spark, sf, "embeddings"))


@_q(
    "pagerank_step",
    """WITH e1 AS (
      SELECT doc_id AS src, doc_id - (doc_id % 5) AS dst
      FROM documents WHERE doc_id < 200 AND doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, doc_id + 5 FROM documents WHERE doc_id < 195 AND doc_id % 15 = 0
    ), eb AS (
      SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1
    ), nodes AS (SELECT DISTINCT src AS id FROM eb
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
    ), deg AS (SELECT src, COUNT(*) AS outdeg FROM eb GROUP BY src
    ), r0 AS (
      SELECT id, CAST(ROUND(1.0 / n, 12) AS DECIMAL(28,12)) AS rank FROM nodes, nn
    ), contrib AS (
      SELECT eb.dst AS id,
             CAST(SUM(CAST(ROUND(0.85 * CAST(r0.rank AS DOUBLE) / deg.outdeg, 12)
                           AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS in_sum
      FROM eb JOIN deg ON deg.src = eb.src JOIN r0 ON r0.id = eb.src
      GROUP BY eb.dst)
    SELECT nodes.id,
           CAST(CAST(ROUND(0.15 / n, 12) AS DECIMAL(28,12))
                + COALESCE(in_sum, CAST(0 AS DECIMAL(28,12))) AS DOUBLE) AS rank
    FROM nodes CROSS JOIN nn LEFT JOIN contrib ON contrib.id = nodes.id""",
)
def pagerank_step_q(spark, sf):
    """One PageRank power iteration over the deterministic link graph (the
    same star/bridge topology as dedup_clusters, both directions): per-edge
    contributions rounded to 12dp and summed in DECIMAL — order-free, so
    the oracle reproduces the ranks bit-for-bit. Multi-iteration pagerank()
    is pytest-verified against a python oracle."""
    from crawl4ai_scraper_spark.operators.graph import pagerank

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    star = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("dst"),
    )
    bridge = docs.filter((F.col("doc_id") < 195) & (F.col("doc_id") % 15 == 0)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 5).alias("dst")
    )
    directed = star.unionByName(bridge)
    edges = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return pagerank(edges, n_iter=1)


# ---------------------------------------------------------------------------
# Temporal: as-of join + keep-latest revision dedup
# ---------------------------------------------------------------------------

@_q(
    "events_asof_join",
    """WITH p AS (
      SELECT user_id, ts, MAX(event_id) AS purchase_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id,
           p.purchase_event_id AS asof_purchase_event_id,
           -- microsecond DIFFERENCE: exact and timezone-convention-free
           date_diff('microsecond', p.ts, e.ts) AS gap_us
    FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts""",
)
def events_asof_join(spark, sf):
    """Backward-inclusive as-of join: each event gains the latest purchase
    event at-or-before it for the same user. Spark composes the
    union-sort-carry pattern (operators.temporal.asof_join — one shuffle);
    the oracle is DuckDB's native ASOF LEFT JOIN."""
    from crawl4ai_scraper_spark.operators.temporal import asof_join

    ev = _t(spark, sf, "events")
    left = ev.select("event_id", "user_id", "ts")
    markers = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    joined = asof_join(left, markers, key="user_id", left_ts="ts", right_ts="ts",
                       payload=["purchase_event_id"])
    return joined.select(
        "event_id", "user_id",
        F.col("asof_purchase_event_id"),
        # ts is TIMESTAMP_NTZ; the cast to (session-tz) TIMESTAMP shifts both
        # operands identically, so the microsecond difference is exact.
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


@_q(
    "url_latest_revision",
    """WITH revs AS (
      SELECT doc_id % 100 AS url_key,
             1700000000 + (doc_id * 37) % 1000 AS warc_ts,
             doc_id, n_chars
      FROM documents)
    SELECT url_key, warc_ts, doc_id, n_chars FROM revs
    QUALIFY ROW_NUMBER() OVER (PARTITION BY url_key
                               ORDER BY warc_ts DESC, doc_id DESC) = 1""",
)
def url_latest_revision(spark, sf):
    """Keep-latest revision per URL (recrawl snapshot collapse): single
    max-struct groupBy — no window, map-side combine — vs the oracle's
    windowed argmax. Ties on warc_ts break by highest doc_id."""
    from crawl4ai_scraper_spark.operators.temporal import latest_revision

    revs = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 100).alias("url_key"),
        (F.lit(1700000000) + (F.col("doc_id") * 37) % 1000).alias("warc_ts"),
        "doc_id", "n_chars",
    )
    return latest_revision(revs, key="url_key", ts_col="warc_ts", tiebreak="doc_id")


# ---------------------------------------------------------------------------
# Corpus-hygiene passes: segment-level dedup + benchmark decontamination
# ---------------------------------------------------------------------------


@_q(
    "segment_dedup",
    """WITH w AS (SELECT doc_id,
           string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
    s AS (SELECT doc_id, CAST(ceil(len(w)/3.0) AS BIGINT) AS n_segments,
                 u.pos, u.seg FROM (
        SELECT doc_id, len(w) AS lw,
               UNNEST(list_transform(range(0, CAST(ceil(len(w)/3.0) AS BIGINT)),
                   i -> {'pos': CAST(i AS INTEGER),
                         'seg': array_to_string(w[(i*3+1):(i*3+3)], ' ')})) AS u,
               w FROM w)),
    k AS (SELECT doc_id, n_segments, pos, seg FROM s
          QUALIFY ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1)
    SELECT doc_id, n_segments, CAST(COUNT(*) AS BIGINT) AS n_kept,
           array_to_string(list(seg ORDER BY pos), ' ') AS dedup_text
    FROM k GROUP BY doc_id, n_segments""",
)
def segment_dedup_q(spark, sf):
    """Paragraph-surrogate segment dedup: globally-first occurrence of every
    3-word segment survives (min-struct first-appender on md5(segment), one
    uniform shuffle), docs reassembled positionally. The oracle's windowed
    ROW_NUMBER()=1 is the same first-appender."""
    return D.segment_dedup(_t(spark, sf, "documents"), "text", "doc_id", seg_words=3)


@_q(
    "decontaminate_ngrams",
    f"""WITH w AS ({_W_SQL}),
    g AS (SELECT doc_id, UNNEST(list_distinct({_G3_SQL})) AS gram FROM w),
    b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    t AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(COUNT(b.gram) AS BIGINT) AS n_hits
          FROM g LEFT JOIN b USING (gram)
          WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id)
    SELECT doc_id, n_grams, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_grams, 4) AS contaminated_frac,
           ROUND(CAST(n_hits AS DOUBLE) / n_grams, 4) >= 0.05 AS contaminated
    FROM t""",
)
def decontaminate_ngrams(spark, sf):
    """Benchmark decontamination: per-train-doc distinct-3-gram overlap vs
    the deterministic eval slice (doc_id % 97 = 0) — eval gram set broadcast
    into the train scan (no corpus-wide gram shuffle); flag at 5% set
    overlap on the 4dp-rounded fraction in both engines."""
    return T.contamination(
        _t(spark, sf, "documents"), "text", "doc_id",
        eval_mod=97, n=3, threshold=0.05,
    )


# ---------------------------------------------------------------------------
# Frontier hygiene (crawler-trap defenses) + per-host budget cap
# ---------------------------------------------------------------------------


@_q(
    "frontier_hygiene",
    """WITH u AS (
      SELECT doc_id,
             'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example'
             || repeat('/s' || CAST(doc_id % 7 AS VARCHAR),
                       CAST(1 + doc_id % 6 AS INT))
             || CASE WHEN doc_id % 17 = 0 THEN '/img.jpg' ELSE '' END
             || CASE WHEN doc_id % 13 = 0 THEN '?a=1&b=2&c=3&d=4&e=5'
                     WHEN doc_id % 3 = 0 THEN '?a=1' ELSE '' END AS url
      FROM documents
    ), p AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(url, '^[a-z]+://[^/]*', ''),
                            '[?#].*$', '') AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS qs
      FROM u
    ), s AS (
      SELECT doc_id, url, path,
             list_filter(string_split(path, '/'), x -> x <> '') AS segs,
             CASE WHEN qs = '' THEN 0
                  ELSE len(string_split(qs, '&')) END AS n_params
      FROM p
    )
    SELECT doc_id, url,
           length(url) > 45 AS too_long,
           len(segs) > 4 AS too_deep,
           n_params > 3 AS too_many_params,
           (len(segs) - len(list_distinct(segs))) > 2 AS loop_suspect,
           regexp_matches(lower(path),
               '\\.(jpg|jpeg|png|gif|webp|ico|svg|css|js|mp3|mp4|avi|mov|zip|gz|tar|rar|7z|exe|dmg|iso|pdf|doc|docx|ppt|xls)$')
               AS blocked_ext,
           (length(url) <= 45 AND len(segs) <= 4 AND n_params <= 3
            AND (len(segs) - len(list_distinct(segs))) <= 2
            AND NOT regexp_matches(lower(path),
                '\\.(jpg|jpeg|png|gif|webp|ico|svg|css|js|mp3|mp4|avi|mov|zip|gz|tar|rar|7z|exe|dmg|iso|pdf|doc|docx|ppt|xls)$'))
               AS keep
    FROM s""",
)
def frontier_hygiene(spark, sf):
    """Crawler-trap defenses over a deterministically trap-seeded synthetic
    frontier (repeated path segments, query-param explosions, asset
    extensions, over-long URLs): every flag is a pure Column predicate —
    frontier candidates are screened at scan speed BEFORE the seen-set
    anti-join, because a trap mints unbounded NEW urls the anti-join alone
    cannot contain."""
    from crawl4ai_scraper_spark.plans.politeness import hygiene_flags

    seg = F.concat(F.lit("/s"), (F.col("doc_id") % 7).cast("string"))
    url = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 5).cast("string"), F.lit(".example"),
        F.repeat(seg, (F.lit(1) + F.col("doc_id") % 6).cast("int")),
        F.when(F.col("doc_id") % 17 == 0, F.lit("/img.jpg")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit("?a=1&b=2&c=3&d=4&e=5"))
        .when(F.col("doc_id") % 3 == 0, F.lit("?a=1"))
        .otherwise(F.lit("")),
    )
    docs = _t(spark, sf, "documents").select("doc_id", url.alias("url"))
    flags = hygiene_flags(
        F.col("url"), max_url_len=45, max_path_depth=4,
        max_query_params=3, max_repeated_segments=2,
    )
    order = ["too_long", "too_deep", "too_many_params", "loop_suspect", "blocked_ext"]
    keep = F.lit(True)
    for k in order:
        keep = keep & ~flags[k]
    return docs.select(
        "doc_id", "url", *[flags[k].alias(k) for k in order], keep.alias("keep")
    )


def _spam_score_sql(url_expr: str) -> str:
    """DuckDB weighted banned-term score — the SAME sorted-order addition
    tree as plans.politeness.url_spam_score (identical IEEE sums)."""
    from crawl4ai_scraper_spark.plans.politeness import URL_SPAM_TERMS

    parts = [
        # CAST: a bare 0.8 literal is DECIMAL in DuckDB — the sum must be
        # DOUBLE term-by-term to match Spark's IEEE addition tree and type.
        f"CASE WHEN strpos(lower({url_expr}), '{t}') > 0"
        f" THEN CAST({float(w)} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
        for t, w in sorted(URL_SPAM_TERMS.items())
    ]
    return "ROUND(" + " + ".join(parts) + ", 4)"


_SPAM_URL_SQL = (
    _URL_SQL
    + " || CASE WHEN doc_id % 7 = 0 THEN '/casino/poker-night'"
    + " WHEN doc_id % 11 = 3 THEN '?ref=poker' ELSE '' END"
)


@_q(
    "url_spam_filter",
    f"""WITH u AS (SELECT doc_id, {_SPAM_URL_SQL} AS url FROM documents)
    SELECT doc_id, url, {_spam_score_sql("url")} AS spam_score
    FROM u
    WHERE regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/]+)', 1)
          NOT IN ('src3.example', 'src7.example')
      AND {_spam_score_sql("url")} < 0.9""",
)
def url_spam_filter(spark, sf):
    """RefinedWeb-style URL screening (hard host blocklist + soft weighted
    banned-term score) over a deterministically spam-seeded URL corpus:
    doc_id%7 urls gain casino+poker (score 1.3 → dropped), doc_id%11=3 urls
    gain poker alone (0.5 → kept, score surfaced), src3/src7 hosts are
    block-listed. plans.politeness.url_blocklist_filter — broadcast anti-join
    + scan-speed score, upstream of the fetch join."""
    from crawl4ai_scraper_spark.plans.politeness import url_blocklist_filter

    url = F.concat(
        _url_col(),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/casino/poker-night"))
        .when(F.col("doc_id") % 11 == 3, F.lit("?ref=poker"))
        .otherwise(F.lit("")),
    )
    docs = _t(spark, sf, "documents").select("doc_id", url.alias("url"))
    blocked = spark.createDataFrame(
        [("src3.example",), ("src7.example",)], "host string"
    )
    return url_blocklist_filter(docs, "url", blocked, spam_threshold=0.9)


@_q(
    "host_budget_cap",
    """SELECT doc_id, 'h' || CAST(doc_id % 5 AS VARCHAR) AS host
    FROM documents
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id % 5 ORDER BY doc_id) <= 30""",
)
def host_budget_cap_q(spark, sf):
    """Per-host frontier fairness cap: first 30 candidates per host in
    arrival order, via the skew-proof two-phase bucketed rank (bucket_size
    64 here so even the small contract input exercises the multi-bucket
    offset path); the oracle is the naive window it must equal."""
    from crawl4ai_scraper_spark.plans.politeness import host_budget_cap

    fr = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string")).alias("host"),
        F.col("doc_id").alias("arrival_rank"),
    )
    return host_budget_cap(fr, 30, bucket_size=64).select("doc_id", "host")


@_q(
    "sitemap_seed_expansion",
    """WITH sel AS (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1
                  AS BIGINT) AS loc_pos
      FROM documents WHERE doc_id % 100 < 20)
    SELECT source || '.example' AS host,
           'https://' || source || '.example/sitemap.xml' AS sitemap_url,
           'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 200 < 20 THEN '?a=1&b=2' ELSE '' END
             AS seed_url,
           loc_pos
    FROM sel""",
)
def sitemap_seed_expansion(spark, sf):
    """Sitemap discovery end-to-end: robots ``Sitemap:`` directives → broadcast
    sitemap fetch join → ``<loc>`` scrape (plans/politeness.py
    sitemaps_from_robots + seeds_from_sitemaps; REP sitemap semantics per
    reference seed handling, main.py:247-269 analogue). Synthesizes a pages
    table (one robots.txt + one sitemap.xml per source host) from
    ``documents`` with the REAL Arrow-side parsers in the path; the oracle
    constructs the expected (host, sitemap_url, seed_url, loc_pos) rows
    directly. Duplicate/lowercase ``Sitemap:`` directives, comment lines,
    ``<loc>`` whitespace trimming and ``&amp;`` entity-unescaping are all
    exercised on the way."""
    from crawl4ai_scraper_spark.plans.politeness import (
        seeds_from_sitemaps,
        sitemaps_from_robots,
    )

    docs = _t(spark, sf, "documents")
    host = F.concat(F.col("source"), F.lit(".example"))
    robots_body = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\nDisallow: /private\nSitemap: https://"),
        host,
        F.lit("/sitemap.xml\nsitemap: https://"),
        host,
        F.lit("/sitemap.xml\n"),
    )
    robots = docs.select("source").distinct().select(
        F.concat(F.lit("https://"), host, F.lit("/robots.txt")).alias("url"),
        F.encode(robots_body, "UTF-8").alias("html"),
    )
    loc_entry = F.concat(
        F.lit("<url><loc> https://"),
        host,
        F.lit("/docs/d"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 200 < 20, F.lit("?a=1&amp;b=2")).otherwise(F.lit("")),
        F.lit(" </loc></url>"),
    )
    per = docs.filter(F.col("doc_id") % 100 < 20).select(
        "source", F.col("doc_id").alias("k"), loc_entry.alias("e")
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
    pages = robots.unionByName(sitemap_pages)
    seeds = seeds_from_sitemaps(pages, sitemaps_from_robots(pages))
    return seeds.withColumn("loc_pos", F.col("loc_pos").cast("long"))


@_q(
    "robots_rules_parse",
    """WITH s AS (
      SELECT DISTINCT source, CAST(substr(source, 4, 10) AS BIGINT) AS i
      FROM documents)
    SELECT source || '.example' AS host,
           CAST((i % 7) + 0.5 AS DOUBLE) AS crawl_delay,
           '/private' || CAST(i AS VARCHAR) || '|/tmp' AS disallow,
           '/private' || CAST(i AS VARCHAR) || '/ok' AS allow
    FROM s""",
)
def robots_rules_parse(spark, sf):
    """REP parser end-to-end (north_rule: robots rules evaluated in Arrow
    UDFs): synthesized robots.txt bodies — per-host Disallow prefixes, an
    Allow carve-out (RFC 9309 longest-match input), fractional Crawl-delay,
    a non-matching agent group, comments, empty Disallow/Allow no-ops, and
    a SECOND ``*`` group that must merge — flow through the real pipeline
    (pushed-down robots url scan → kernel.robots.parse_robots_rules in
    mapInPandas → latest-revision collapse; plans/politeness.py
    rules_from_robots). The oracle constructs the expected rules directly;
    the array columns are joined to scalars for the driver's hash."""
    from crawl4ai_scraper_spark.plans.politeness import rules_from_robots

    docs = _t(spark, sf, "documents")
    i = F.expr("CAST(substring(source, 4, 10) AS BIGINT)")
    host = F.concat(F.col("source"), F.lit(".example"))
    body = F.concat(
        F.lit("# synthetic robots\nUser-Agent: googlebot\nDisallow: /gb\n\n"
              "User-agent: *\nDisallow: /private"),
        i.cast("string"),
        F.lit("\nAllow: /private"),
        i.cast("string"),
        F.lit("/ok\nCrawl-Delay: "),
        (i % 7).cast("string"),
        F.lit(".5\nDisallow:\nAllow:\nUser-agent: *\nDisallow: /tmp\n"),
    )
    robots = docs.select("source").distinct().select(
        F.concat(F.lit("https://"), host, F.lit("/robots.txt")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    decoys = docs.filter(F.col("doc_id") % 100 == 1).select(
        F.concat(F.lit("https://"), host, F.lit("/docs/d"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
    )
    rules = rules_from_robots(robots.unionByName(decoys))
    return rules.select(
        "host",
        F.col("crawl_delay").cast("double").alias("crawl_delay"),
        F.concat_ws("|", "disallow_prefixes").alias("disallow"),
        F.concat_ws("|", "allow_prefixes").alias("allow"),
    )


