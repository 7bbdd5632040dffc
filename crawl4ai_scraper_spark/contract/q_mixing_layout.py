"""Corpus mixing, boilerplate strip, packing layouts.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403
from crawl4ai_scraper_spark.contract.q_dedup_ann import _VARIANT_SQL, _sh3

# ---------------------------------------------------------------------------
# Corpus mixing + token-budget selection (operators/mixing.py): the
# data-recipe passes between dedup/filtering and tokenization. Shared
# conventions: token weight = whitespace token count, targets are
# binary-exact float literals (identical doubles in both engines), rates
# quantized to 1/4096 via FLOOR on identically-ordered IEEE expressions.
# ---------------------------------------------------------------------------

_MIX_TARGET = {"en": 0.5, "de": 0.125, "fr": 0.125, "es": 0.125, "zh": 0.125}
_MIX_TGT_SQL = (
    "(VALUES ('de', 0.125), ('en', 0.5), ('es', 0.125), ('fr', 0.125),"
    " ('zh', 0.125)) t(lang, target_share)"
)
_MIX_PLAN_SQL = f"""WITH w AS (
      SELECT lang, COUNT(*) AS n_rows,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS weight
      FROM documents GROUP BY lang
    ), tgt AS (SELECT lang, CAST(target_share AS DOUBLE) AS target_share
               FROM {_MIX_TGT_SQL}),
    j AS (SELECT w.*, tgt.target_share FROM w JOIN tgt USING (lang)),
    tt AS (SELECT MIN(CAST(weight AS DOUBLE) / target_share) AS _t FROM j),
    g AS (SELECT CAST(SUM(weight) AS BIGINT) AS _wall FROM w),
    r AS (
      SELECT j.*, CAST(FLOOR(((j.target_share * tt._t)
                 / CAST(j.weight AS DOUBLE)) * 4096) AS BIGINT) AS steps
      FROM j, tt
    )
    SELECT lang, n_rows, weight,
           ROUND(CAST(weight AS DOUBLE) / CAST(g._wall AS DOUBLE), 6) AS share,
           ROUND(target_share, 6) AS target_share,
           CAST(FLOOR(steps / 4096.0) AS INT) AS epochs,
           CAST(steps % 4096 AS INT) AS rate_steps,
           ROUND(CAST(steps AS DOUBLE) / 4096, 6) AS keep_rate
    FROM r, g"""


@_q("corpus_mix_plan", _MIX_PLAN_SQL)
def corpus_mix_plan_q(spark, sf):
    """Data-recipe mixing plan: per-language keep rates hitting target token
    shares from whatever mix the crawl produced. Downsample-only mode — the
    most under-represented-vs-target language keeps everything (rate 1.0)
    and every other language is cut to match its share. One G-row groupBy +
    broadcast target join; rates quantized to 1/4096."""
    from crawl4ai_scraper_spark.operators.mixing import corpus_mix_plan

    docs = _t(spark, sf, "documents").select(
        "lang", F.size(F.split(F.trim("text"), "\\s+")).alias("w")
    )
    return corpus_mix_plan(docs, "lang", "w", _MIX_TARGET)


@_q(
    "corpus_mix_apply",
    f"""WITH w AS (
      SELECT lang, COUNT(*) AS n_rows,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS weight
      FROM documents GROUP BY lang
    ), tgt AS (SELECT lang, CAST(target_share AS DOUBLE) AS target_share
               FROM {_MIX_TGT_SQL}),
    j AS (SELECT w.*, tgt.target_share FROM w JOIN tgt USING (lang)),
    r AS (
      SELECT j.lang, CAST(FLOOR(((j.target_share * 40000.0)
                 / CAST(j.weight AS DOUBLE)) * 4096) AS BIGINT) AS steps
      FROM j
    ), plan AS (
      SELECT lang, CAST(FLOOR(steps / 4096.0) AS INT) AS epochs,
             CAST(steps % 4096 AS INT) AS rate_steps
      FROM r
    ), e AS (SELECT UNNEST(range(0, 64)) AS epoch)
    SELECT d.doc_id, d.lang, CAST(e.epoch AS INT) AS epoch
    FROM documents d JOIN plan p USING (lang), e
    WHERE e.epoch <= p.epochs
      AND (e.epoch < p.epochs
           OR CAST('0x' || substr(md5('mix1:' || CAST(d.doc_id AS VARCHAR)), 1, 3)
                   AS INT) < p.rate_steps)""",
)
def corpus_mix_apply_q(spark, sf):
    """Materialized mix at a PINNED 40k-token output (larger than the sf0.01
    corpus → fractional-epoch UPSAMPLING: every doc keeps epochs full copies
    plus a deterministic md5-threshold extra copy; at sf0.1 the same pin
    downsamples instead — both regimes one explode + scan-speed digest
    compare). Oracle's epoch range is a constant 64 — rates stay far below
    64 epochs at every shipped sf."""
    from crawl4ai_scraper_spark.operators.mixing import (
        corpus_mix_apply,
        corpus_mix_plan,
    )

    docs = _t(spark, sf, "documents")
    weighted = docs.select(
        "lang", F.size(F.split(F.trim("text"), "\\s+")).alias("w")
    )
    plan = corpus_mix_plan(weighted, "lang", "w", _MIX_TARGET, total_out=40000.0)
    return corpus_mix_apply(
        docs.select("doc_id", "lang"), "doc_id", "lang", plan
    ).select("doc_id", "lang", F.col("epoch").cast("int").alias("epoch"))


@_q(
    "token_budget_select",
    """WITH q AS (
      SELECT doc_id AS id,
             CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
               / len(string_split_regex(trim(text), '\\s+')) AS quality,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT id, quality, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, id)
                  - n_tokens AS BIGINT) AS cum_before
      FROM q
    )
    SELECT id, quality, n_tokens, cum_before FROM c WHERE cum_before < 8000""",
)
def token_budget_select_q(spark, sf):
    """Best-first selection under an 8k-token budget: docs ranked by
    lexical-diversity quality (distinct-token fraction), kept while the
    running token total is under budget (straddler included). The Spark
    side never runs the oracle's whole-corpus ORDER BY window — the
    two-phase bucketed cumsum produces the identical BIGINT prefix sums."""
    from crawl4ai_scraper_spark.operators.mixing import token_budget_select

    toks = F.split(F.trim("text"), "\\s+")
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("qual"),
        F.size(toks).alias("ntok"),
    )
    return token_budget_select(docs, "doc_id", "ntok", "qual", budget=8000)


# ---------------------------------------------------------------------------
# Host-scoped boilerplate strip + URL template mining
# ---------------------------------------------------------------------------

@_q(
    "host_boilerplate_strip",
    """WITH w AS (SELECT doc_id, source AS host,
           string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
    hd AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS host_docs FROM w GROUP BY host),
    s AS (SELECT doc_id, host, n_segments, u.pos, u.seg FROM (
        SELECT doc_id, host, CAST(ceil(len(w)/3.0) AS BIGINT) AS n_segments,
               UNNEST(list_transform(range(0, CAST(ceil(len(w)/3.0) AS BIGINT)),
                   i -> {'pos': CAST(i AS INTEGER),
                         'seg': array_to_string(w[(i*3+1):(i*3+3)], ' ')})) AS u
        FROM w)),
    b AS (SELECT hl.host, hl.seg
          FROM (SELECT host, seg, COUNT(DISTINCT doc_id) AS nd
                FROM s GROUP BY host, seg) hl
          JOIN hd USING (host)
          WHERE nd >= 2 AND nd * 100 >= 8 * host_docs),
    k AS (SELECT s.* FROM s ANTI JOIN b ON s.host = b.host AND s.seg = b.seg)
    SELECT doc_id, host, n_segments, CAST(COUNT(*) AS BIGINT) AS n_kept,
           array_to_string(list(seg ORDER BY pos), ' ') AS clean_text
    FROM k GROUP BY doc_id, host, n_segments""",
)
def host_boilerplate_strip_q(spark, sf):
    """Host-conditioned boilerplate removal (CCNet/Onion "common lines per
    site"): 3-word segments appearing in >=2 docs AND >=8% of one host's
    documents are stripped from that host only; cross-host repeats survive
    (vs global segment_dedup's keep-one-copy). Integer threshold math
    (nd*100 >= pct*host_docs) keeps the gate cross-engine exact; the oracle's
    ANTI JOIN is the same keep-join."""
    docs = _t(spark, sf, "documents")
    return D.host_boilerplate_strip(
        docs, "text", "doc_id", "source", seg_words=3, min_docs=2, ratio_pct=8
    ).withColumnRenamed("source", "host")


# moduli COPRIME to 20 (the testdata's source = src{doc_id % 20} correlation)
# so every host sees every URL class: ~1/7 literal /about, the rest split
# over numeric-id / mixed-token / hex-id generated spaces.
_TRAP_URL_SQL = (
    "'https://' || source || '.example' || "
    "CASE WHEN doc_id % 7 = 0 THEN '/about' "
    "WHEN doc_id % 3 = 0 THEN '/post/' || CAST(doc_id AS VARCHAR) "
    "WHEN doc_id % 3 = 1 THEN '/item/a' || CAST(doc_id AS VARCHAR) || 'x' "
    "ELSE '/s/' || md5(CAST(doc_id AS VARCHAR)) END"
)


def _trap_url_col() -> F.Column:
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/about"))
        .when(F.col("doc_id") % 3 == 0, F.concat(F.lit("/post/"), did))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("/item/a"), did, F.lit("x")))
        .otherwise(F.concat(F.lit("/s/"), F.md5(did))),
    )


@_q(
    "url_path_templates",
    """WITH u AS (SELECT DISTINCT """ + _TRAP_URL_SQL + """ AS url FROM documents),
    t AS (SELECT
        regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1) AS host,
        '/' || array_to_string(list_transform(
            list_filter(string_split(
                regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/'),
                x -> x <> ''),
            x -> CASE WHEN regexp_matches(x, '^[0-9]+$') THEN '{d}'
                      WHEN regexp_matches(x, '^[0-9a-f]{8,}$') THEN '{h}'
                      WHEN regexp_matches(x, '[0-9]') THEN '{a}'
                      ELSE x END), '/') AS template,
        url FROM u)
    SELECT host, template, CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
           MIN(url) AS example_url,
           COUNT(DISTINCT url) >= 5 AS trap_suspect
    FROM t GROUP BY host, template""",
)
def url_path_templates_q(spark, sf):
    """Crawler-trap detection by URL template mining: path segments
    generalized (digits -> {d}, >=8-char hex ids -> {h}, other digit-bearing
    tokens -> {a}), distinct-URL counts per (host, template). The planted URL
    mix yields per host: a numeric-id template, a mixed-token template, a
    hex-id template (~6 distinct urls each -> trap_suspect at min_urls=5) and
    one literal /about (n_urls=1, clean). Pattern-level trap signal the
    per-URL hygiene screens can't see (every trap URL is individually clean)."""
    from crawl4ai_scraper_spark.operators.webmeta import url_path_templates

    urls = _t(spark, sf, "documents").select(_trap_url_col().alias("url")).distinct()
    return url_path_templates(urls, "url", min_urls=5)


_SIG8_SQL = "[" + ",".join(
    f"list_min(list_transform(sh, x -> md5('{i}:' || x)))" for i in range(8)
) + "]"


@_q(
    "contrastive_pairs",
    f"""WITH corpus AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 100000, {_VARIANT_SQL} FROM documents WHERE doc_id < 60
    ), sh AS (
      SELECT doc, {_sh3('text')} AS sh FROM corpus
    ), sig AS (
      SELECT doc, sh, {_SIG8_SQL} AS sig FROM sh
    ), banded AS (
      SELECT doc, b.band, md5(sig[b.band+1]) AS bhash
      FROM sig, (SELECT UNNEST([0,1,2,3,4,5,6,7]) AS band) b
    ), cand AS (
      SELECT DISTINCT l.doc AS id_a, r.doc AS id_b
      FROM banded l JOIN banded r ON l.band = r.band AND l.bhash = r.bhash AND l.doc < r.doc
    ), jt AS (
      SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
           / len(list_distinct(list_concat(list_distinct(a.sh), list_distinct(b.sh)))) AS j
      FROM cand c JOIN sh a ON a.doc = c.id_a JOIN sh b ON b.doc = c.id_b)
    SELECT id_a, id_b, ROUND(j, 4) AS jaccard,
           CASE WHEN j >= 0.5 THEN 'pos' ELSE 'hard_neg' END AS label
    FROM jt WHERE (j >= 0.5 AND j < 0.95) OR j < 0.2""",
)
def contrastive_pairs_q(spark, sf):
    """Contrastive pair mining over corpus + planted near-dups: single-row
    LSH bands (collision prob per band = j) surface both true positives
    (j in [0.5, 0.95) — exact-ish dups excluded as leaky) and hard negatives
    (band-colliding pairs with j < 0.2) from ONE id-only candidate stream;
    the ambiguous middle is dropped. The label windows gate the UNROUNDED
    Jaccard in both engines."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("doc"), "text"
    )
    variants = docs.select((F.col("doc") + 100000).alias("doc"),
                           F.expr("substr(text, 8)").alias("text"))
    corpus = docs.unionByName(variants)
    return D.contrastive_pairs(
        corpus, "text", "doc", k=3, n_hashes=8, n_bands=8,
        pos_lo=0.5, pos_hi=0.95, neg_hi=0.2,
    )


@_q(
    "template_dup_stats",
    """WITH pages AS (
      SELECT """ + _TRAP_URL_SQL + """ AS url,
             CASE WHEN doc_id % 7 = 0 THEN 'about page content'
                  WHEN doc_id % 3 = 0 THEN 'generated calendar content'
                  ELSE text END AS text
      FROM documents),
    t AS (SELECT
        regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1) AS host,
        '/' || array_to_string(list_transform(
            list_filter(string_split(
                regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/'),
                x -> x <> ''),
            x -> CASE WHEN regexp_matches(x, '^[0-9]+$') THEN '{d}'
                      WHEN regexp_matches(x, '^[0-9a-f]{8,}$') THEN '{h}'
                      WHEN regexp_matches(x, '[0-9]') THEN '{a}'
                      ELSE x END), '/') AS template,
        url, md5(text) AS th FROM pages),
    a AS (SELECT host, template,
                 CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
                 CAST(COUNT(DISTINCT th) AS BIGINT) AS n_texts
          FROM t GROUP BY host, template)
    SELECT host, template, n_urls, n_texts,
           ROUND(1.0 - CAST(n_texts AS DOUBLE) / n_urls, 4) AS dup_ratio,
           n_urls >= 5 AND n_texts * 2 <= n_urls AS generated_suspect
    FROM a""",
)
def template_dup_stats_q(spark, sf):
    """Duplicate-content rate per URL template (the trap-mining follow-up:
    many urls is only a problem when they serve the SAME content). Planted
    mix: the /post/{d} space serves one identical calendar page (dup_ratio
    near 1, generated_suspect), /item/{a} and /s/{h} serve real per-doc
    texts (dup_ratio 0), /about is a single url. Text never shuffles — only
    md5; integer suspect gate, one double expression for dup_ratio."""
    from crawl4ai_scraper_spark.operators.webmeta import template_dup_stats

    pages = _t(spark, sf, "documents").select(
        _trap_url_col().alias("url"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("about page content"))
        .when(F.col("doc_id") % 3 == 0, F.lit("generated calendar content"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return template_dup_stats(pages, "url", "text", min_urls=5)


@_q(
    "revision_drift",
    f"""WITH revs AS (
      SELECT 'u' || CAST(doc_id AS VARCHAR) AS url, 1 AS ts, text FROM documents
      UNION ALL
      SELECT 'u' || CAST(doc_id AS VARCHAR), 2, substr(text, 8) FROM documents
      UNION ALL
      SELECT 'u' || CAST(doc_id AS VARCHAR), 3, upper(substr(text, 8)) FROM documents
    ), sh AS (
      SELECT url, ts, list_distinct({_sh3('text')}) AS sh FROM revs
    ), p AS (
      SELECT url, ts AS ts_prev, lead(ts) OVER w AS ts_next,
             sh, lead(sh) OVER w AS sh_next
      FROM sh WINDOW w AS (PARTITION BY url ORDER BY ts)
    )
    SELECT url, ts_prev, ts_next,
           ROUND(CAST(len(list_intersect(sh, sh_next)) AS DOUBLE)
                 / len(list_distinct(list_concat(sh, sh_next))), 4) AS jaccard,
           CAST(len(list_intersect(sh, sh_next)) AS DOUBLE)
             / len(list_distinct(list_concat(sh, sh_next))) < 1.0 AS changed
    FROM p WHERE ts_next IS NOT NULL""",
)
def revision_drift_q(spark, sf):
    """Per-url content drift between consecutive revisions: rev2 drops the
    first 7 chars (0 < jaccard < 1, changed), rev3 only changes case —
    shingles lowercase, so jaccard = 1 and changed = false (set-based
    change detection ignores cosmetic edits). One lead() window keyed by
    url; the shingle sets ride the same shuffle."""
    from crawl4ai_scraper_spark.operators.temporal import revision_drift

    docs = _t(spark, sf, "documents")
    url = F.concat(F.lit("u"), F.col("doc_id").cast("string"))
    revs = (
        docs.select(url.alias("url"), F.lit(1).alias("ts"), "text")
        .unionByName(
            docs.select(url.alias("url"), F.lit(2).alias("ts"),
                        F.expr("substr(text, 8)").alias("text"))
        )
        .unionByName(
            docs.select(url.alias("url"), F.lit(3).alias("ts"),
                        F.upper(F.expr("substr(text, 8)")).alias("text"))
        )
    )
    return revision_drift(revs, "url", "ts", "text", k=3)


@_q(
    "politeness_audit",
    """WITH v AS (
      SELECT source AS host, doc_id AS r,
             CAST((doc_id // 20) AS DOUBLE)
               * (CASE WHEN (doc_id % 20) % 3 = 0 THEN 0.5 ELSE 1.5 END) AS ts
      FROM documents),
    g AS (SELECT host, ts - lag(ts) OVER (PARTITION BY host ORDER BY r) AS gap FROM v),
    a AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_visits,
                 MAX(ts) - MIN(ts) AS span FROM v GROUP BY host),
    gg AS (SELECT host, MIN(gap) AS min_gap,
                  SUM(CASE WHEN gap < 1.0 - 1e-9 THEN 1 ELSE 0 END) AS viol
           FROM g WHERE gap IS NOT NULL GROUP BY host)
    SELECT a.host, n_visits, CAST(1.0 AS DOUBLE) AS crawl_delay,
           ROUND(min_gap, 4) AS min_gap,
           CAST(COALESCE(viol, 0) AS BIGINT) AS violations,
           ROUND(span, 4) AS span_sec,
           COALESCE(viol, 0) = 0 AS ok
    FROM a LEFT JOIN gg USING (host)""",
)
def politeness_audit_q(spark, sf):
    """Schedule-compliance audit over a planted visit log: every third host
    is scheduled at 0.5 s gaps (violating the 1.0 s default delay), the rest
    at 1.5 s. The Spark side audits with the skew-proof bucketed rank +
    (host, rank+1) self-join; the oracle's lag() window is the naive
    equivalent. Identical double products both sides, 1e-9 epsilon keeps
    exact-delay schedules green."""
    from crawl4ai_scraper_spark.plans.politeness import politeness_audit

    docs = _t(spark, sf, "documents")
    gap = F.when((F.col("doc_id") % 20) % 3 == 0, F.lit(0.5)).otherwise(F.lit(1.5))
    visits = docs.select(
        F.col("source").alias("host"),
        F.col("doc_id").alias("arrival_rank"),
        (F.expr("doc_id div 20").cast("double") * gap).alias("sched_ts"),
    )
    return politeness_audit(visits, None, 1.0)


@_q(
    "quota_sample",
    """SELECT doc_id, lang, CAST(rn AS INT) AS sample_rank FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY substr(md5('q1:' || CAST(doc_id AS VARCHAR)), 1, 12),
                        doc_id) AS rn
      FROM documents) t WHERE rn <= 10""",
)
def quota_sample_q(spark, sf):
    """Exact 10-docs-per-language quota sample: the Spark side runs the
    screen-then-trim plan (per-group digest threshold at scan speed, exact
    row_number only over the ~overshoot×quota candidates, rescue union for
    undershooting groups); the oracle IS the naive hot-group window the
    plan avoids — output must be identical."""
    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    return T.quota_sample(docs, "doc_id", "lang", 10, salt="q1")


@_q(
    "grouped_topk_longest",
    """SELECT doc_id, lang, n_tokens, CAST(rn AS INT) AS topk_rank FROM (
      SELECT doc_id, lang, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_tokens DESC, doc_id) AS rn
      FROM (SELECT doc_id, lang,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                     AS n_tokens
            FROM documents) b) t WHERE rn <= 10""",
)
def grouped_topk_longest_q(spark, sf):
    """Exact top-10 longest docs per language via the learned-threshold
    screen-then-trim plan (sampled score-quantile estimate -> scan-speed
    candidate filter -> bounded row_number -> detected-undershoot rescue);
    the oracle IS the naive hot-group window it avoids."""
    docs = _t(spark, sf, "documents").select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), "\\s+")).cast("bigint").alias("n_tokens"),
    )
    return T.grouped_topk(docs, "doc_id", "lang", "n_tokens", 10)


_COV_URL_SQL = "'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR)"


@_q(
    "sitemap_coverage",
    f"""WITH d AS (SELECT DISTINCT {_COV_URL_SQL} AS u FROM documents
                  WHERE doc_id % 100 < 20),
    v AS (SELECT DISTINCT {_COV_URL_SQL} AS u FROM documents WHERE doc_id % 3 = 0),
    j AS (SELECT COALESCE(d.u, v.u) AS u, d.u IS NOT NULL AS ind,
                 v.u IS NOT NULL AS inv
          FROM d FULL JOIN v ON d.u = v.u)
    SELECT regexp_extract(u, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1) AS host,
           CAST(SUM(CASE WHEN ind THEN 1 ELSE 0 END) AS BIGINT) AS n_declared,
           CAST(SUM(CASE WHEN inv THEN 1 ELSE 0 END) AS BIGINT) AS n_visited,
           CAST(SUM(CASE WHEN ind AND inv THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           CAST(SUM(CASE WHEN ind AND NOT inv THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
           CAST(SUM(CASE WHEN NOT ind AND inv THEN 1 ELSE 0 END) AS BIGINT) AS n_extra,
           CASE WHEN SUM(CASE WHEN ind THEN 1 ELSE 0 END) > 0 THEN
             ROUND(CAST(SUM(CASE WHEN ind AND inv THEN 1 ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN ind THEN 1 ELSE 0 END), 4) END AS coverage
    FROM j GROUP BY 1""",
)
def sitemap_coverage_q(spark, sf):
    """Sitemap-vs-crawl coverage per host: docs with doc_id%100<20 stand in
    for the sitemap-declared set, doc_id%3==0 for the visited set — partial
    overlap in both directions, so n_both/n_missed/n_extra are all
    exercised. One full-outer url join + one host groupBy."""
    from crawl4ai_scraper_spark.plans.politeness import sitemap_coverage

    docs = _t(spark, sf, "documents")
    u = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/docs/d"),
        F.col("doc_id").cast("string"),
    )
    declared = docs.filter(F.col("doc_id") % 100 < 20).select(u.alias("seed_url"))
    visited = docs.filter(F.col("doc_id") % 3 == 0).select(u.alias("url"))
    return sitemap_coverage(declared, visited)


@_q(
    "near_dup_threshold_sweep",
    f"""WITH corpus AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 100000, {_VARIANT_SQL} FROM documents WHERE doc_id < 60
    ), sh AS (
      SELECT doc, {_sh3('text')} AS sh FROM corpus
    ), sig AS (
      SELECT doc, sh, {_SIG8_SQL} AS sig FROM sh
    ), banded AS (
      SELECT doc, b.band, md5(sig[b.band*2+1] || '|' || sig[b.band*2+2]) AS bhash
      FROM sig, (SELECT UNNEST([0,1,2,3]) AS band) b
    ), cand AS (
      SELECT DISTINCT l.doc AS id_a, r.doc AS id_b
      FROM banded l JOIN banded r ON l.band = r.band AND l.bhash = r.bhash AND l.doc < r.doc
    ), jt AS (
      SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
           / len(list_distinct(list_concat(list_distinct(a.sh), list_distinct(b.sh)))) AS j
      FROM cand c JOIN sh a ON a.doc = c.id_a JOIN sh b ON b.doc = c.id_b
    ), th AS (SELECT UNNEST([CAST(0.3 AS DOUBLE), CAST(0.5 AS DOUBLE),
                             CAST(0.7 AS DOUBLE), CAST(0.9 AS DOUBLE),
                             CAST(0.99 AS DOUBLE)]) AS threshold),
    hits AS (SELECT th.threshold, jt.id_a, jt.id_b FROM jt, th
             WHERE jt.j >= th.threshold),
    pc AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
           FROM hits GROUP BY threshold),
    dc AS (SELECT threshold, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs FROM (
             SELECT threshold, id_a AS d FROM hits
             UNION ALL SELECT threshold, id_b FROM hits) u GROUP BY threshold)
    SELECT th.threshold, COALESCE(pc.n_pairs, 0) AS n_pairs,
           COALESCE(dc.n_docs, 0) AS n_docs
    FROM th LEFT JOIN pc USING (threshold) LEFT JOIN dc USING (threshold)""",
)
def near_dup_threshold_sweep_q(spark, sf):
    """Dedup-threshold planning sweep over corpus + planted near-dups: pair
    and affected-doc counts at 5 thresholds from ONE LSH-candidate +
    exact-Jaccard pass (the fan-out happens on verified pair rows only);
    zero-pair thresholds still report 0."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("doc"), "text"
    )
    variants = docs.select((F.col("doc") + 100000).alias("doc"),
                           F.expr("substr(text, 8)").alias("text"))
    corpus = docs.unionByName(variants)
    return D.near_dup_threshold_sweep(
        corpus, "text", "doc", [0.3, 0.5, 0.7, 0.9, 0.99]
    )


@_q(
    "corpus_shuffle_pack",
    """WITH c AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('sh1:' || CAST(doc_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS shuffle_key,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents),
    s AS (SELECT doc_id, shuffle_key, n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id)
                      - n_tokens AS BIGINT) AS cum_before
          FROM c)
    SELECT doc_id, shuffle_key, n_tokens, cum_before,
           CAST(cum_before // 512 AS BIGINT) AS seq_id,
           CAST(cum_before % 512 AS BIGINT) AS offset_in_seq
    FROM s""",
)
def corpus_shuffle_pack_q(spark, sf):
    """Deterministic SHUFFLED sequence packing (training-order shuffle
    without RNG state): docs laid end-to-end in 48-bit-md5-digest order
    into 512-token sequences via the two-phase bucketed cumsum — the
    oracle's whole-corpus ORDER BY window is exactly the plan the operator
    avoids. Digest ties (if any) break by doc_id in both engines."""
    from crawl4ai_scraper_spark.operators.packing import corpus_shuffle_pack

    docs = _t(spark, sf, "documents")
    return corpus_shuffle_pack(
        docs, "doc_id",
        F.size(F.split(F.trim("text"), "\\s+")),
        seq_len=512, salt="sh1",
    )


@_q(
    "curriculum_shuffle_pack",
    """WITH c AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5('cu1:' || CAST(doc_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS shuffle_key
      FROM documents),
    b AS (SELECT *,
             CAST(CASE WHEN n_tokens >= 60 THEN 0
                       WHEN n_tokens >= 30 THEN 1 ELSE 2 END AS BIGINT) AS band
          FROM c),
    s AS (SELECT doc_id, band, shuffle_key, n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY band, shuffle_key, doc_id)
                      - n_tokens AS BIGINT) AS cum_before
          FROM b)
    SELECT doc_id, band, shuffle_key, n_tokens, cum_before,
           CAST(cum_before // 512 AS BIGINT) AS seq_id,
           CAST(cum_before % 512 AS BIGINT) AS offset_in_seq
    FROM s""",
)
def curriculum_shuffle_pack_q(spark, sf):
    """Curriculum training order: long/clean docs (band 0) pack first,
    short-tail bands later, md5-shuffled WITHIN each band — one composite
    BIGINT order key through the two-phase bucketed cumsum; the oracle's
    whole-corpus (band, digest, id) window is the plan avoided."""
    from crawl4ai_scraper_spark.operators.packing import curriculum_shuffle_pack

    docs = _t(spark, sf, "documents")
    nt = F.size(F.split(F.trim("text"), "\\s+"))
    band = F.when(nt >= 60, F.lit(0)).when(nt >= 30, F.lit(1)).otherwise(F.lit(2))
    return curriculum_shuffle_pack(
        docs, "doc_id", nt, band, seq_len=512, salt="cu1"
    )


@_q(
    "layout_adjacency",
    """WITH d AS (SELECT doc_id, source,
           CAST(substr(source, 4) AS BIGINT) AS hi,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
      FROM documents),
    hg AS (SELECT source, lag(source) OVER (ORDER BY hi * 1000000 + doc_id) AS p
           FROM d WHERE n > 0),
    sh AS (SELECT source, lag(source) OVER (
             ORDER BY CAST('0x' || substr(md5('sh1:' || CAST(doc_id AS VARCHAR)), 1, 12)
                      AS BIGINT), doc_id) AS p
           FROM d WHERE n > 0)
    SELECT 'host_grouped' AS layout, CAST(COUNT(p) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN p = source THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
           ROUND(CAST(SUM(CASE WHEN p = source THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(p), 4) AS same_ratio
    FROM hg WHERE p IS NOT NULL
    UNION ALL
    SELECT 'shuffled', CAST(COUNT(p) AS BIGINT),
           CAST(SUM(CASE WHEN p = source THEN 1 ELSE 0 END) AS BIGINT),
           ROUND(CAST(SUM(CASE WHEN p = source THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(p), 4)
    FROM sh WHERE p IS NOT NULL""",
)
def layout_adjacency_q(spark, sf):
    """Shuffle-quality evidence: same-host fraction of adjacent doc pairs
    under a host-grouped layout (crawl order surrogate — near 1) vs the
    md5-shuffled layout (near 1/|hosts|). The Spark side derives adjacency
    from each layout's cum_before offsets via the windowless equi-join; the
    oracle's lag() over the same total orders is the naive equivalent."""
    from crawl4ai_scraper_spark.operators.packing import (
        corpus_shuffle_pack,
        layout_adjacency_stats,
        sequence_pack,
    )

    docs = _t(spark, sf, "documents")
    nt = F.size(F.split(F.trim("text"), "\\s+"))
    hi = F.regexp_extract("source", "^src([0-9]+)$", 1).cast("bigint")
    hg_docs = docs.select(
        (hi * 1000000 + F.col("doc_id")).alias("sid"),
        nt.alias("nt"), F.col("source"),
    )
    hg = layout_adjacency_stats(
        sequence_pack(hg_docs, "sid", F.col("nt"), seq_len=512),
        hg_docs.select("sid", "source"), "sid", "source", "host_grouped",
    )
    sh = layout_adjacency_stats(
        corpus_shuffle_pack(docs, "doc_id", nt, seq_len=512, salt="sh1"),
        docs.select("doc_id", "source"), "doc_id", "source", "shuffled",
    )
    return hg.unionByName(sh)


