"""DSIR selection, cardinality sketches, classifiers, search, graph ops.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403
from crawl4ai_scraper_spark.contract.q_quality_pack import _NB_SCORE_CTES

# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/selection.py)
# ---------------------------------------------------------------------------

# Shared gram→bucket stream: word unigrams + bigrams (degenerate short-doc
# rule matches ngrams_from_tokens), 48-bit md5 prefix mod 256.
_DSIR_B_SQL = """w AS (SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
    g AS (SELECT doc_id, UNNEST(w) AS gram FROM w
          UNION ALL
          SELECT doc_id, UNNEST(CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                 ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS gram
          FROM w),
    b AS (SELECT g.doc_id,
                 CAST('0x' || substr(md5(gram), 1, 12) AS BIGINT) % 256 AS bucket
          FROM g),
    tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS t_cnt
            FROM b JOIN documents d USING (doc_id) WHERE d.lang = 'en'
            GROUP BY bucket),
    raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_cnt FROM b GROUP BY bucket),
    tot AS (SELECT (SELECT CAST(SUM(t_cnt) AS DOUBLE) FROM tgt) AS t_tot,
                   (SELECT CAST(SUM(r_cnt) AS DOUBLE) FROM raw) AS r_tot),
    sc AS (SELECT b.doc_id,
                  CAST(ROUND(ln((COALESCE(t.t_cnt, 0) + 1.0) / (tot.t_tot + 256))
                             - ln((COALESCE(r.r_cnt, 0) + 1.0) / (tot.r_tot + 256)),
                             12) AS DECIMAL(28,12)) AS lr
           FROM b LEFT JOIN tgt t USING (bucket) LEFT JOIN raw r USING (bucket)
                CROSS JOIN tot),
    lw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                  ROUND(CAST(SUM(lr) AS DOUBLE), 6) AS log_weight
           FROM sc GROUP BY doc_id)"""


def _dsir_weights(spark, sf):
    docs = _t(spark, sf, "documents")
    target = docs.filter(F.col("lang") == "en")
    tp = SEL.dsir_profile(target, "text", "doc_id", n_buckets=256)
    rp = SEL.dsir_profile(docs, "text", "doc_id", n_buckets=256)
    return SEL.dsir_log_weights(docs, "text", "doc_id", tp, rp, n_buckets=256)


@_q("dsir_log_weights", f"WITH {_DSIR_B_SQL} SELECT doc_id, n_grams, log_weight FROM lw")
def dsir_log_weights_q(spark, sf):
    """DSIR (Xie et al. 2023) hashed-ngram importance weights: target =
    lang='en' slice, raw = whole corpus, 256 buckets, add-one smoothing.
    Gram stream is a flatMap off the scan; both profiles are ≤B-row
    broadcast joins; ONE uniform groupBy(doc_id). Per-gram log-ratio
    12dp-rounded, summed in DECIMAL(28,12) (order-free), 6dp final."""
    return _dsir_weights(spark, sf)


@_q(
    "dsir_select_topk",
    f"""WITH {_DSIR_B_SQL}
    SELECT doc_id, n_grams, log_weight,
           -- +0.5 keeps u in the OPEN interval (0,1): u=1 would make
           -- ln(-ln(u)) diverge differently per engine (r2 ADVICE fix)
           ROUND(log_weight
                 - ln(-ln((CAST('0x' || substr(md5('g1:' || CAST(doc_id AS VARCHAR)), 1, 12)
                                AS BIGINT) + 0.5) / 281474976710656.0)),
                 6) AS gumbel_key
    FROM lw ORDER BY gumbel_key DESC, doc_id LIMIT 50""",
)
def dsir_select_topk_q(spark, sf):
    """Gumbel-top-k resampling over the DSIR weights (exact
    without-replacement sample ∝ exp(log_weight)): per-doc Gumbel noise from
    the shared md5 digest scheme, top-50 via orderBy+limit
    (TakeOrderedAndProject — no global sort)."""
    return SEL.dsir_select(_dsir_weights(spark, sf), "doc_id", k=50, salt="g1")


# ---------------------------------------------------------------------------
# Cardinality sketches (operators/sketches.py) — the 100-TB distinct-count
# tools, deterministic via the shared md5 digest so a SQL oracle can
# replicate them bit-for-bit (integer bin-length ranks, order-free dyadic
# harmonic sum; see the module docstring).
# ---------------------------------------------------------------------------

_HLL_AM2 = (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096
_HLL_HARM = "present_harm + CAST(4096 - n_present AS DOUBLE)"


@_q(
    "sketch_kmv_distinct",
    """WITH u AS (
      SELECT DISTINCT (CAST('0x' || substr(md5('kmv1:' || text), 1, 12) AS BIGINT) + 0.5)
                      / 281474976710656.0 AS u
      FROM documents
    ), t AS (SELECT u FROM u ORDER BY u LIMIT 256)
    SELECT CAST(256 AS INT) AS k, COUNT(*) AS n_min,
           ROUND(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE 255.0 / MAX(u) END, 6) AS estimate
    FROM t""",
)
def sketch_kmv_distinct_q(spark, sf):
    """K-minimum-values distinct-text estimate (k=256): map-side-combined
    DISTINCT over the 48-bit digests, TakeOrdered k smallest, (k-1)/u_(k).
    The synopsis the driver sees is k rows no matter the corpus size."""
    from crawl4ai_scraper_spark.operators.sketches import kmv_distinct

    return kmv_distinct(_t(spark, sf, "documents"), "text", k=256, salt="kmv1")


@_q(
    "sketch_hll_distinct",
    f"""WITH h AS (
      SELECT CAST('0x' || substr(md5('hll1:' || text), 1, 12) AS BIGINT) AS h
      FROM documents
    ), pb AS (
      SELECT h % 4096 AS bucket,
             MAX(CASE WHEN h // 4096 = 0 THEN 37
                      ELSE 36 - length(bin(h // 4096)) + 1 END) AS max_rank
      FROM h GROUP BY h % 4096
    ), agg AS (
      SELECT SUM(POWER(2.0, -max_rank)) AS present_harm,
             COUNT(*) AS n_present
      FROM pb
    )
    SELECT CAST(4096 AS INT) AS m,
           (4096 - n_present) AS n_zero_buckets,
           ROUND(CASE WHEN ({_HLL_AM2!r} / ({_HLL_HARM}) <= 10240.0)
                       AND (4096 - n_present > 0)
                      THEN 4096.0 * ln(4096.0 / CAST(4096 - n_present AS DOUBLE))
                      ELSE {_HLL_AM2!r} / ({_HLL_HARM}) END, 6) AS estimate
    FROM agg""",
)
def sketch_hll_distinct_q(spark, sf):
    """HyperLogLog distinct-text estimate (b=12, m=4096 buckets): one
    bounded-key groupBy builds the bucket synopsis; the harmonic sum is
    order-free (exact dyadic doubles), linear counting kicks in at small
    range — both branches reproduced verbatim by the oracle."""
    from crawl4ai_scraper_spark.operators.sketches import hll_distinct

    return hll_distinct(_t(spark, sf, "documents"), "text", b=12, salt="hll1")


_W_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


@_q(
    "dedup_containment",
    f"""WITH base AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id < 40
    ), wsrc AS (
      SELECT doc, string_split_regex(trim(text), '\\s+') AS w FROM base
    ), corpus AS (
      SELECT doc, text FROM base
      UNION ALL
      SELECT doc + 200000,
             array_to_string(w[1:greatest(len(w)//2, 5)], ' ')
      FROM wsrc
    ), sh AS (
      SELECT doc,
             list_distinct(list_transform(range(1, greatest(len({_W_SQL}) - 1, 1)),
               i -> {_W_SQL}[i] || ' ' || {_W_SQL}[i+1] || ' ' || {_W_SQL}[i+2])) AS sh
      FROM corpus
    ), g AS (
      SELECT doc, UNNEST(sh) AS gram FROM sh
    ), sizes AS (
      SELECT doc, len(sh) AS n FROM sh
    ), freq AS (
      SELECT gram, COUNT(*) AS df FROM g GROUP BY gram
    ), ranked AS (
      SELECT g.doc, g.gram, s.n,
             ROW_NUMBER() OVER (PARTITION BY g.doc ORDER BY f.df, g.gram) AS rnk
      FROM g JOIN freq f ON g.gram = f.gram JOIN sizes s ON s.doc = g.doc
    ), prefix AS (
      SELECT doc, gram FROM ranked WHERE rnk <= n - ((4*n + 4)//5) + 1
    ), cand AS (
      SELECT DISTINCT least(p.doc, o.doc) AS id_a, greatest(p.doc, o.doc) AS id_b
      FROM prefix p JOIN g o ON p.gram = o.gram AND p.doc <> o.doc
    ), inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM cand c JOIN g a ON a.doc = c.id_a
                  JOIN g b ON b.doc = c.id_b AND a.gram = b.gram
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           ROUND(CAST(n_inter AS DOUBLE) / least(sa.n, sb.n), 4) AS containment
    FROM inter i JOIN sizes sa ON sa.doc = i.id_a
                 JOIN sizes sb ON sb.doc = i.id_b
    WHERE 5 * n_inter >= 4 * least(sa.n, sb.n)""",
)
def dedup_containment_q(spark, sf):
    """One-sided near-dup (containment ≥ 0.8) via prefix filtering, over the
    corpus + planted excerpts (the first half of each doc's words, ≥5):
    excerpt⊂doc pairs have containment 1.0 but Jaccard ≈ 0.5 — invisible to
    the symmetric MinHash path, found here with zero false negatives
    (operators/dedup.py containment_pairs; prefix-filter guarantee in the
    docstring)."""
    from crawl4ai_scraper_spark.operators.dedup import containment_pairs

    base = _t(spark, sf, "documents").filter(F.col("doc_id") < 40).select(
        F.col("doc_id").alias("doc"), "text"
    )
    toks = F.split(F.trim(F.col("text")), "\\s+")
    m = F.greatest(F.floor(F.size(toks) / F.lit(2)), F.lit(5))
    excerpts = base.select(
        (F.col("doc") + 200000).alias("doc"),
        F.concat_ws(" ", F.slice(toks, F.lit(1), m)).alias("text"),
    )
    corpus = base.unionByName(excerpts)
    return containment_pairs(corpus, "text", "doc", k=3, num=4, den=5)


_PR_THRESHOLDS = [-5.0, -2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0, 5.0]


@_q(
    "classifier_pr_table",
    f"""WITH {_NB_SCORE_CTES},
    scores AS (SELECT doc_id, CAST(CAST(SUM(w) AS DECIMAL(38,12)) AS DOUBLE) AS score
               FROM s GROUP BY doc_id),
    lab AS (SELECT doc_id, (lang = 'en') AS y FROM documents),
    e AS (SELECT y, score,
                 UNNEST(CAST({_PR_THRESHOLDS} AS DOUBLE[])) AS threshold
          FROM scores JOIN lab USING (doc_id)),
    a AS (SELECT threshold,
            COUNT(CASE WHEN y AND score >= threshold THEN 1 END) AS tp,
            COUNT(CASE WHEN NOT y AND score >= threshold THEN 1 END) AS fp,
            COUNT(CASE WHEN y AND score < threshold THEN 1 END) AS fn
          FROM e GROUP BY threshold)
    SELECT threshold, tp, fp, fn,
      CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE)/(tp+fp), 6) END AS prec,
      CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE)/(tp+fn), 6) END AS rec,
      CASE WHEN 2*tp + fp + fn > 0
           THEN ROUND(2.0*CAST(tp AS DOUBLE)/(2*tp+fp+fn), 6) END AS f1
    FROM a""",
)
def classifier_pr_table_q(spark, sf):
    """Filter-calibration table (textops.classifier_pr_table): precision /
    recall / F1 of the trained NB quality score against the language labels
    at 9 thresholds — ONE corpus pass (row stream fanned onto the literal
    threshold list, map-side-combined conditional counts), exact-integer
    ratios. This is how a pipeline picks the score cut before committing a
    corpus-wide filter."""
    docs = _t(spark, sf, "documents")
    labeled = docs.withColumn("_y", F.col("lang") == "en")
    w = T.nb_token_weights(labeled, "text", "_y", vocab_size=200)
    scored = T.nb_score(docs, "text", "doc_id", w, prior=0.0).select(
        F.col("id").alias("doc_id"), "score"
    )
    joined = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")), "doc_id"
    )
    return T.classifier_pr_table(joined, "y", "score", _PR_THRESHOLDS).select(
        "threshold", "tp", "fp", "fn",
        F.col("precision").alias("prec"), F.col("recall").alias("rec"), "f1",
    )


@_q(
    "events_hopping_window",
    """WITH e AS (
      SELECT ts, event_type, CAST(ROUND(value, 2) AS DECIMAL(18,2)) AS v
      FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    ), h AS (
      SELECT event_type, v,
             UNNEST([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws
      FROM e
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start, event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(v) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
    FROM h GROUP BY ws, event_type""",
)
def events_hopping_window_q(spark, sf):
    """Hopping (sliding) 1h/30m window aggregation over the events table —
    the BATCH twin of the streaming windowed aggs (streaming/ingest.py):
    F.window(ts, '1 hour', '30 minutes') fans each event onto its two
    containing windows (both engines epoch-aligned for 30-minute slides),
    then one map-side-combined groupBy per (window, type)."""
    ev = _t(spark, sf, "events").filter(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    val = F.round(F.col("value"), 2).cast("decimal(18,2)")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(val).cast("decimal(38,2)").cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type", "n", "total_value",
        )
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_q(
    "events_pivot_type_counts",
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY strftime(ts, '%Y-%m-%d')""",
)
def events_pivot_type_counts_q(spark, sf):
    """PIVOT: per-day event counts widened into one column per event type
    (explicit value list → deterministic schema; Spark compiles it to a
    single Expand + aggregate, never N scans). Missing cells fill as 0."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# Sketch family round-out: per-group HLL, Count-Min frequency, exact
# histogram quantiles, and temperature data-mixing (operators/sketches.py,
# operators/selection.py) — the per-source corpus dashboard at 100 TB.
# ---------------------------------------------------------------------------

@_q(
    "sketch_hll_by_lang",
    f"""WITH h AS (
      SELECT lang, CAST('0x' || substr(md5('hll1:' || text), 1, 12) AS BIGINT) AS h
      FROM documents
    ), pb AS (
      SELECT lang, h % 4096 AS bucket,
             MAX(CASE WHEN h // 4096 = 0 THEN 37
                      ELSE 36 - length(bin(h // 4096)) + 1 END) AS max_rank
      FROM h GROUP BY lang, h % 4096
    ), agg AS (
      SELECT lang, SUM(POWER(2.0, -max_rank)) AS present_harm,
             COUNT(*) AS n_present
      FROM pb GROUP BY lang
    )
    SELECT lang, CAST(4096 AS INT) AS m,
           (4096 - n_present) AS n_zero_buckets,
           ROUND(CASE WHEN ({_HLL_AM2!r} / ({_HLL_HARM}) <= 10240.0)
                       AND (4096 - n_present > 0)
                      THEN 4096.0 * ln(4096.0 / CAST(4096 - n_present AS DOUBLE))
                      ELSE {_HLL_AM2!r} / ({_HLL_HARM}) END, 6) AS estimate
    FROM agg""",
)
def sketch_hll_by_lang_q(spark, sf):
    """Per-language HLL distinct-text panel: same digest/rank math as
    sketch_hll_distinct restricted per group, ONE groupBy over
    ≤ |langs|·4096 keys. The per-source dedup-health dashboard a crawl
    pipeline watches — at 100 TB each group's synopsis is still 4096
    rows."""
    from crawl4ai_scraper_spark.operators.sketches import hll_distinct_by

    return hll_distinct_by(
        _t(spark, sf, "documents"), "text", "lang", b=12, salt="hll1"
    )


_CMS_PROBES = ["scan", "join", "window", "shuffle", "quantile", "zzzmissing"]
_CMS_PROBES_SQL = ", ".join(f"('{p}')" for p in _CMS_PROBES)
_CMS_CELL_SQL = (
    "CAST('0x' || substr(md5('cms' || CAST(rw AS VARCHAR) || ':' || {key}), 1, 12)"
    " AS BIGINT) % 1024"
)


@_q(
    "sketch_cms_freq",
    f"""WITH toks AS (
      SELECT t.tok FROM documents,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ), rows_ AS (SELECT * FROM (VALUES (0), (1), (2), (3)) r(rw)),
    syn AS (
      SELECT rw, {_CMS_CELL_SQL.format(key='tok')} AS bucket, COUNT(*) AS cnt
      FROM toks CROSS JOIN rows_ GROUP BY 1, 2
    ), probes AS (SELECT * FROM (VALUES {_CMS_PROBES_SQL}) p(token)),
    pc AS (
      SELECT token, rw, {_CMS_CELL_SQL.format(key='token')} AS bucket
      FROM probes CROSS JOIN rows_
    ), est AS (
      SELECT token, MIN(COALESCE(cnt, 0)) AS cms_est
      FROM pc LEFT JOIN syn USING (rw, bucket) GROUP BY token
    ), tru AS (
      SELECT tok AS token, COUNT(*) AS true_cnt FROM toks
      WHERE tok IN (SELECT token FROM probes) GROUP BY 1
    )
    SELECT token, COALESCE(true_cnt, 0) AS true_cnt, cms_est,
           cms_est - COALESCE(true_cnt, 0) AS overcount
    FROM est LEFT JOIN tru USING (token)""",
)
def sketch_cms_freq_q(spark, sf):
    """Count-Min token-frequency estimates (d=4 rows × w=1024 buckets) for
    a fixed probe set, with the true counts and the (always ≥ 0)
    overcounts alongside. The build is one groupBy over ≤ 4096 cells —
    the heavy-hitter monitor that replaces a full token count at corpus
    scale. 'zzzmissing' shows the collision-only floor for an absent
    key."""
    from crawl4ai_scraper_spark.operators.sketches import cms_build, cms_estimate

    docs = _t(spark, sf, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    syn = cms_build(toks, F.col("tok"), d=4, w=1024, salt="cms")
    probes = spark.createDataFrame([(p,) for p in _CMS_PROBES], "token string")
    est = cms_estimate(syn, F.broadcast(probes), "token", d=4, w=1024, salt="cms")
    true_cnt = (
        toks.filter(F.col("tok").isin(_CMS_PROBES))
        .groupBy(F.col("tok").alias("token"))
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    return est.join(F.broadcast(true_cnt), "token", "left").select(
        "token",
        F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
        "cms_est",
        (F.col("cms_est") - F.coalesce("true_cnt", F.lit(0))).alias("overcount"),
    )


@_q(
    "token_len_quantiles",
    """WITH vals AS (
      SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS v
      FROM documents
    ), hist AS (SELECT v, COUNT(*) AS cnt FROM vals GROUP BY v),
    cum AS (
      SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM hist
    ), qs AS (
      SELECT CAST(q AS DOUBLE) AS q, num, den
      FROM (VALUES (0.25, 1, 4), (0.5, 1, 2), (0.75, 3, 4), (0.95, 19, 20))
           t(q, num, den)
    )
    SELECT q, MIN(v) AS value
    FROM cum CROSS JOIN qs WHERE cum * den >= num * n GROUP BY q""",
)
def token_len_quantiles_q(spark, sf):
    """EXACT p25/p50/p75/p95 of whitespace-token counts per document via
    the histogram two-phase plan (sketches.exact_quantiles): the only
    corpus shuffle is groupBy(length); the cumulative window runs on the
    bounded histogram, never the raw rows, and the rank test is the pure
    integer predicate cum·den ≥ num·N. The length-distribution panel every
    training-data pipeline reports."""
    from crawl4ai_scraper_spark.operators.sketches import exact_quantiles

    docs = _t(spark, sf, "documents")
    lens = docs.select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok")
    )
    return exact_quantiles(lens, "n_tok")


@_q(
    "mixture_temperature_weights",
    """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    t AS (
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE) AS p_raw
      FROM c
    ), s AS (
      SELECT lang, n_docs, p_raw,
             CAST(ROUND(sqrt(p_raw), 12) AS DECIMAL(28,12)) AS s
      FROM t
    ), f AS (
      SELECT lang, n_docs, p_raw,
             CAST(s AS DOUBLE) / CAST(SUM(s) OVER () AS DOUBLE) AS w_raw
      FROM s
    )
    SELECT lang, n_docs, ROUND(p_raw, 6) AS p, ROUND(w_raw, 6) AS mix_weight,
           ROUND(LEAST(1.0, w_raw * 100.0 / CAST(n_docs AS DOUBLE)), 6)
             AS sample_rate
    FROM f""",
)
def mixture_temperature_weights_q(spark, sf):
    """τ=1/2 temperature mixing over languages (selection.mixture_weights,
    target 100 docs): sqrt is correctly rounded (bit-identical across
    engines, unlike pow), the normalizer is the DSIR-style 12dp-DECIMAL
    exact sum, and the output sample_rate feeds the scan-speed
    md5-threshold sampler. One corpus groupBy; the rest runs on the
    |langs|-row synopsis."""
    from crawl4ai_scraper_spark.operators.selection import mixture_weights

    return mixture_weights(_t(spark, sf, "documents"), "lang", target_total=100)


# ---------------------------------------------------------------------------
# Sketch set algebra (operators/sketches.py kmv_overlap / hll_setops): the
# cross-snapshot overlap questions answered from synopses — "how much of
# crawl B did crawl A already have?" without joining the two corpora.
# Slices: A = doc_id%10 < 6, B = doc_id%10 >= 4 (20% designed overlap).
# ---------------------------------------------------------------------------

_HLL_RANK_SQL = (
    "CASE WHEN h // 4096 = 0 THEN 37 ELSE 36 - length(bin(h // 4096)) + 1 END"
)


@_q(
    "sketch_kmv_overlap",
    """WITH lab AS (
      SELECT (CAST('0x' || substr(md5('kmv1:' || text), 1, 12) AS BIGINT) + 0.5)
             / 281474976710656.0 AS u,
             MAX(CASE WHEN doc_id % 10 < 6 THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN doc_id % 10 >= 4 THEN 1 ELSE 0 END) AS in_b
      FROM documents GROUP BY 1
    ), t AS (SELECT * FROM lab ORDER BY u LIMIT 256),
    a AS (
      SELECT COUNT(*) AS n_min, MAX(u) AS u_k,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
      FROM t
    )
    SELECT CAST(256 AS INT) AS k, n_min, n_both,
           ROUND(CASE WHEN n_min < 256 THEN CAST(n_min AS DOUBLE)
                      ELSE 255.0 / u_k END, 6) AS union_est,
           ROUND(CAST(n_both AS DOUBLE) / CAST(n_min AS DOUBLE), 6)
             AS jaccard_est,
           ROUND((CAST(n_both AS DOUBLE) / CAST(n_min AS DOUBLE))
                 * (CASE WHEN n_min < 256 THEN CAST(n_min AS DOUBLE)
                         ELSE 255.0 / u_k END), 6) AS inter_est
    FROM a""",
)
def sketch_kmv_overlap_q(spark, sf):
    """KMV union sketch with membership flags between two crawl slices
    (Broder/theta-sketch estimator, k=256): neither slice ever joins the
    other — tagged streams OR their flags in ONE bounded groupBy, the k
    smallest hashes survive via TakeOrdered, Jaccard is the flagged-both
    fraction, |A∪B| = (k-1)/u_(k), |A∩B| their product. Below k distinct
    union values the answer is collision-exact."""
    from crawl4ai_scraper_spark.operators.sketches import kmv_overlap

    docs = _t(spark, sf, "documents")
    return kmv_overlap(
        docs.filter(F.col("doc_id") % 10 < 6),
        docs.filter(F.col("doc_id") % 10 >= 4),
        "text",
        k=256,
        salt="kmv1",
    )


@_q(
    "sketch_hll_setops",
    f"""WITH h AS (
      SELECT 'a' AS side,
             CAST('0x' || substr(md5('hll1:' || text), 1, 12) AS BIGINT) AS h
      FROM documents WHERE doc_id % 10 < 6
      UNION ALL
      SELECT 'b' AS side,
             CAST('0x' || substr(md5('hll1:' || text), 1, 12) AS BIGINT) AS h
      FROM documents WHERE doc_id % 10 >= 4
    ), pb AS (
      SELECT side, h % 4096 AS bucket, MAX({_HLL_RANK_SQL}) AS max_rank
      FROM h GROUP BY side, h % 4096
    ), pbu AS (
      SELECT side, bucket, max_rank FROM pb
      UNION ALL
      SELECT 'union' AS side, bucket, MAX(max_rank) AS max_rank
      FROM pb GROUP BY bucket
    ), agg AS (
      SELECT side, SUM(POWER(2.0, -max_rank)) AS present_harm,
             COUNT(*) AS n_present
      FROM pbu GROUP BY side
    ), est AS (
      SELECT side,
             ROUND(CASE WHEN ({_HLL_AM2!r} / ({_HLL_HARM}) <= 10240.0)
                         AND (4096 - n_present > 0)
                        THEN 4096.0 * ln(4096.0 / CAST(4096 - n_present AS DOUBLE))
                        ELSE {_HLL_AM2!r} / ({_HLL_HARM}) END, 6) AS estimate
      FROM agg
    ), piv AS (
      SELECT MAX(CASE WHEN side = 'a' THEN estimate END) AS est_a,
             MAX(CASE WHEN side = 'b' THEN estimate END) AS est_b,
             MAX(CASE WHEN side = 'union' THEN estimate END) AS est_union
      FROM est
    )
    SELECT est_a, est_b, est_union,
           ROUND(GREATEST(0.0, est_a + est_b - est_union), 6) AS inter_est
    FROM piv""",
)
def sketch_hll_setops_q(spark, sf):
    """HLL set algebra between two crawl slices: per-side bucket synopses
    from ONE bounded groupBy, union synopsis = per-bucket max (HLL merge
    is lossless — exactly the sketch of the concatenated stream),
    intersection by inclusion-exclusion clamped at 0. The incremental-
    crawl coverage dashboard at 100 TB: three estimates, zero joins."""
    from crawl4ai_scraper_spark.operators.sketches import hll_setops

    docs = _t(spark, sf, "documents")
    return hll_setops(
        docs.filter(F.col("doc_id") % 10 < 6),
        docs.filter(F.col("doc_id") % 10 >= 4),
        "text",
        b=12,
        salt="hll1",
    )


@_q(
    "heavy_hitter_bigrams",
    """WITH w AS (
      SELECT string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents
    ), g AS (
      SELECT UNNEST(CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
             END) AS k
      FROM w
    ), n AS (SELECT COUNT(*) AS n FROM g)
    SELECT k, COUNT(*) AS cnt FROM g
    GROUP BY k HAVING COUNT(*) * 1000 >= (SELECT n FROM n)""",
)
def heavy_hitter_bigrams_q(spark, sf):
    """EXACT φ=1/1000 heavy-hitter bigrams via the Count-Min two-pass
    (sketches.cms_heavy_hitters, d=4 w=4096): pass 1 is the bounded
    synopsis groupBy (collected driver-side — a d·w model artifact, like
    k-means centroids); pass 2 screens every occurrence with a literal-
    array lookup PROJECTION — no join — and the exact verification
    groupBy runs over ≤1/φ' surviving keys with map-side combine. CMS
    never underestimates, so no true heavy hitter can be screened out:
    the output is exactly the naive GROUP BY ... HAVING, at synopsis cost
    instead of a corpus-distinct shuffle. The oracle IS the naive form."""
    from crawl4ai_scraper_spark.operators.sketches import cms_heavy_hitters
    from crawl4ai_scraper_spark.operators.textops import ngrams_from_tokens

    docs = _t(spark, sf, "documents")
    grams = docs.select(
        F.explode(
            ngrams_from_tokens(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 2)
        ).alias("k")
    )
    return cms_heavy_hitters(
        grams, F.col("k"), phi_num=1, phi_den=1000, d=4, w=4096, salt="cms"
    )


@_q(
    "inverted_index_postings",
    """WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), p AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY term, doc_id
    ), s AS (
      SELECT term, doc_id, tf,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
             CAST(SUM(tf) OVER (PARTITION BY term) AS BIGINT) AS cf
      FROM p
    )
    SELECT term, doc_id, tf, df, cf FROM s WHERE df >= 3""",
)
def inverted_index_postings_q(spark, sf):
    """Distributed inverted index over the corpus: flat posting rows
    (term, doc_id, tf) from ONE map-side-combined groupBy, per-term df/cf
    from an unbounded window over the already-tf-collapsed postings — the
    raw token stream is shuffled exactly once and the corpus text never
    moves again. The searchable-archive layer the reference delegates to
    on-disk grep (main.py saved-markdown workflow)."""
    from crawl4ai_scraper_spark.operators.search import inverted_postings

    return inverted_postings(_t(spark, sf, "documents"), min_df=3).select(
        "term", "doc_id", "tf",
        F.col("df").cast("long").alias("df"),
        F.col("cf").cast("long").alias("cf"),
    )


@_q(
    "tfidf_conjunctive_search",
    """WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), p AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ('spark', 'window', 'merge')
      GROUP BY term, doc_id
    ), d AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    sc AS (
      SELECT p.doc_id,
             p.term,
             CAST(p.tf AS DECIMAL(10,0))
               * CAST(ROUND(ln((n_docs + 1) / (df + 1)) + 1, 12)
                      AS DECIMAL(28,12)) AS contrib
      FROM p JOIN d USING (term) CROSS JOIN n
    ), h AS (
      SELECT doc_id, COUNT(DISTINCT term) AS nt,
             ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS score
      FROM sc GROUP BY doc_id
    )
    SELECT doc_id, score FROM h WHERE nt = 3
    ORDER BY score DESC, doc_id LIMIT 15""",
)
def tfidf_conjunctive_search_q(spark, sf):
    """Conjunctive (AND-of-terms) tf-idf retrieval: token stream filtered to
    the 3 literal query terms BEFORE the postings groupBy, df as a 3-row
    broadcast join, N as a one-row broadcast, conjunction via
    count(distinct term)==3, top-k as TakeOrderedAndProject. idf rounded to
    12dp and carried as DECIMAL(28,12) so the per-doc score sum is
    order-free in both engines (the unigram_lm_ppl convention)."""
    from crawl4ai_scraper_spark.operators.search import tfidf_search

    return tfidf_search(
        _t(spark, sf, "documents"), ["spark", "window", "merge"], k=15
    )


@_q(
    "interval_containment_join",
    """WITH iv AS (
      SELECT event_id AS interval_id, ts AS t0,
             ts + INTERVAL 30 MINUTE AS t1
      FROM events WHERE event_id % 197 = 0
    )
    SELECT iv.interval_id, e.event_id
    FROM events e JOIN iv ON e.ts >= iv.t0 AND e.ts < iv.t1""",
)
def interval_containment_join_q(spark, sf):
    """Range join (point-in-interval containment) — every event matched to
    every 30-minute window anchored at a sampled event. Spark would plan the
    bare non-equi condition as BroadcastNestedLoopJoin (O(points ×
    intervals)); interval_bucket_join manufactures a shared 10-minute
    time-bucket EQUI key (intervals explode to their ≤4 covered buckets, a
    point projects its single bucket), so the physical plan is a plain
    equi-join + post-filter and each qualifying pair is emitted exactly
    once. The DuckDB oracle uses its native inequality join (IEJoin)."""
    from crawl4ai_scraper_spark.operators.temporal import interval_bucket_join

    ev = _t(spark, sf, "events")
    iv = ev.filter(F.col("event_id") % 197 == 0).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t1"),
    )
    pts = ev.select("event_id", "ts")
    return interval_bucket_join(pts, iv, "ts", "t0", "t1", 600).select(
        "interval_id", "event_id"
    )


@_q(
    "skew_salted_join",
    """WITH d AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n,
             CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS type_avg
      FROM events GROUP BY event_type
    ), w AS (
      SELECT event_type, type_n,
             CAST(ROUND(type_avg, 6) AS DECIMAL(18,6)) AS wgt
      FROM d
    )
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(ROUND(e.value, 4) AS DECIMAL(18,4)) * w.wgt)
                      AS DOUBLE), 4) AS weighted_sum
    FROM events e JOIN w USING (event_type)
    GROUP BY e.user_id""",
)
def skew_salted_join_q(spark, sf):
    """Salted shuffle join on the maximally skewed key (event_type: 5
    values over the whole fact table — at scale, one reducer per value).
    The fact side salts 8 ways by event_id, the 5-row weight dim explodes
    to 40 (key, salt) copies, and the merge-hinted equi-join on
    (event_type, _salt) spreads each hot key over 8 reducers. The oracle is
    the PLAIN join — salting must be invisible in the result. Weights are
    decimal-exact (round→DECIMAL before every sum) so the per-user rollup
    is order-free in both engines."""
    from crawl4ai_scraper_spark.operators.joins import salted_join

    ev = _t(spark, sf, "events")
    dim = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("type_n"),
            (
                F.sum(F.round("value", 4).cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("type_avg"),
        )
        .select(
            "event_type",
            "type_n",
            F.round("type_avg", 6).cast("decimal(18,6)").alias("wgt"),
        )
    )
    fact = ev.select("event_id", "user_id", "event_type", "value")
    joined = salted_join(fact, dim, "event_type", F.col("event_id"), n_salts=8)
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.round("value", 4).cast("decimal(18,4)") * F.col("wgt"))
            .cast("double"),
            4,
        ).alias("weighted_sum"),
    )


@_q(
    "export_shard_manifest",
    """WITH d AS (
      SELECT doc_id,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+'))
                  END AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             -- CAST: DuckDB windowed SUM(BIGINT) is HUGEINT (pandas float64)
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM d
    )
    SELECT cum_before // 2048 AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY cum_before // 2048""",
)
def export_shard_manifest_q(spark, sf):
    """Token-budgeted export sharding (2048 tokens/shard): documents laid
    end-to-end in doc_id order, a doc belongs to the shard its first token
    lands in. The global running sum is the two-phase bucketed cumsum (no
    whole-corpus single-partition window — the oracle's ORDER BY window is
    the semantics, not the plan); the manifest is one bounded groupBy.
    write_jsonl_shards materializes this layout to disk (pytest
    round-trip)."""
    from crawl4ai_scraper_spark.operators.export import shard_manifest, shard_plan

    plan = shard_plan(_t(spark, sf, "documents"), target_tokens=2048)
    return shard_manifest(plan).select(
        "shard_id",
        "n_docs",
        F.col("shard_tokens").cast("long").alias("shard_tokens"),
        "first_doc",
        "last_doc",
    )


@_q(
    "phrase_search_positions",
    """WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ), t AS (
      SELECT doc_id, UNNEST(w) AS term, UNNEST(range(1, len(w)+1)) AS pos
      FROM w
    ),
    p1 AS (SELECT doc_id, pos FROM t WHERE term = 'hash'),
    p2 AS (SELECT doc_id, pos FROM t WHERE term = 'value')
    SELECT p1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
    GROUP BY p1.doc_id""",
)
def phrase_search_positions_q(spark, sf):
    """Exact phrase retrieval ('hash value' as adjacent tokens) over the
    positional index: the token stream is filtered to the two literal terms
    before anything shuffles, and adjacency is an EQUI-join on
    (doc_id, pos+1) — Catalyst hash-joins the arithmetic equality, so the
    join touches only the two terms' occurrence lists. tf-only postings
    prove co-occurrence; positions prove order."""
    from crawl4ai_scraper_spark.operators.search import phrase_search

    return phrase_search(_t(spark, sf, "documents"), "hash", "value")


@_q(
    "kwic_snippets",
    """WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ), f AS (
      SELECT doc_id, w, list_position(w, 'spark') AS first_pos
      FROM w WHERE list_position(w, 'spark') > 0
    )
    SELECT doc_id, CAST(first_pos AS BIGINT) AS first_pos,
           array_to_string(
             w[GREATEST(1, first_pos - 3):LEAST(len(w), first_pos + 3)],
             ' ') AS snippet
    FROM f""",
)
def kwic_snippets_q(spark, sf):
    """Keyword-in-context search-result rendering: the ±3-token snippet
    around the first occurrence of 'spark' in every matching document.
    Zero shuffles — array_position/slice/array_join are a pure projection,
    the whole operator runs at scan speed (FileScan → Filter → Project;
    plan-gated). DuckDB twin: list_position + inclusive list slicing."""
    from crawl4ai_scraper_spark.operators.search import kwic_snippets

    return kwic_snippets(_t(spark, sf, "documents"), "spark", window=3)


@_q(
    "event_funnel_counts",
    """WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT CAST(1 AS INT) AS stage_idx, 'view' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
    UNION ALL SELECT CAST(2 AS INT), 'click', CAST(COUNT(*) AS BIGINT) FROM s2
    UNION ALL SELECT CAST(3 AS INT), 'purchase', CAST(COUNT(*) AS BIGINT)
    FROM s3""",
)
def event_funnel_counts_q(spark, sf):
    """Strict-ordering funnel view → click → purchase: stage i+1 is the
    user's earliest matching event STRICTLY AFTER stage i. k chained
    (user-keyed equi-join + min-aggregate) rounds — the per-user ordered
    scan a single-partition sort would need is never materialized, the
    surviving-user frame shrinks every round, and every stage reuses the
    user_id partitioning."""
    from crawl4ai_scraper_spark.operators.funnel import funnel_counts

    return funnel_counts(
        _t(spark, sf, "events"), ["view", "click", "purchase"]
    )


@_q(
    "cohort_retention_daily",
    """WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.d0, a.d) AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2""",
)
def cohort_retention_daily_q(spark, sf):
    """Day-grain cohort retention matrix: users bucketed by first-activity
    day, counted on each later active day. Two user-keyed aggregates + one
    co-partitioned join; day offsets are integral; cohort_day ships as an
    ISO string so the comparison never depends on date dtype plumbing."""
    from crawl4ai_scraper_spark.operators.funnel import cohort_retention

    return cohort_retention(_t(spark, sf, "events"))


@_q(
    "event_transition_matrix",
    """WITH s AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2""",
)
def event_transition_matrix_q(spark, sf):
    """First-order Markov transition counts between consecutive same-user
    events: lead() inside a user-partitioned window (each partition is one
    user's bounded list, never the corpus), event_id tiebreak so the
    sequence is deterministic in both engines, then one bounded
    (from, to)-keyed groupBy."""
    from crawl4ai_scraper_spark.operators.funnel import event_transitions

    return event_transitions(_t(spark, sf, "events"))


@_q(
    "daily_volume_zscores",
    """WITH daily AS (
      SELECT event_type AS etype,
             strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n) AS BIGINT) AS sum_n,
             CAST(SUM(n * n) AS BIGINT) AS sum_sq
      FROM daily GROUP BY etype
    )
    SELECT d.etype AS event_type, d.day, d.n,
           ROUND(CAST(sum_n AS DOUBLE) / n_days, 6) AS mean_daily,
           CASE WHEN n_days > 1
                 AND (CAST(sum_sq AS DOUBLE)
                      - CAST(sum_n AS DOUBLE) * sum_n / n_days)
                     / (n_days - 1) > 0
                THEN ROUND((d.n - CAST(sum_n AS DOUBLE) / n_days)
                     / sqrt((CAST(sum_sq AS DOUBLE)
                             - CAST(sum_n AS DOUBLE) * sum_n / n_days)
                            / (n_days - 1)), 6)
                END AS zscore
    FROM daily d JOIN stats USING (etype)""",
)
def daily_volume_zscores_q(spark, sf):
    """Ingest-volume anomaly screen: per-(type, day) count z-scored against
    the type's daily history. Every moment comes from EXACT integer sums
    (Σx, Σx² as BIGINT; variance in one fixed double expression), so the
    result is order-free and cross-engine exact — never the STDDEV
    aggregate, whose floating accumulation order differs per engine. Two
    bounded groupBys + a broadcast stats join."""
    from crawl4ai_scraper_spark.operators.funnel import daily_volume_zscores

    return daily_volume_zscores(_t(spark, sf, "events"))


@_q(
    "graph_triangle_counts",
    """WITH e0 AS (
      SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id < 239
      UNION ALL
      SELECT doc_id, doc_id + 2 FROM documents
      WHERE doc_id < 238 AND doc_id % 2 = 0
      UNION ALL
      SELECT 0, doc_id FROM documents
      WHERE doc_id % 10 = 0 AND doc_id > 0 AND doc_id < 240
    ), und AS (
      SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e0
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1 JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT t.id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM tri, UNNEST([tri.a, tri.b, tri.c]) AS t(id)
    GROUP BY t.id""",
)
def graph_triangle_counts_q(spark, sf):
    """Per-vertex triangle participation over a deterministic ring+chord
    graph with a high-degree hub (vertex 0 links every 10th node — degree
    skew with NO triangles of its own, exactly the regime the
    degree-ordered orientation exists for). The operator orients each edge
    low→high (degree, id) so wedge enumeration at any vertex is O(√m)
    regardless of hubs, counts each triangle once at its lowest-ranked
    corner via a closing-edge equi-join, and credits all three corners.
    The oracle counts the same triangles by canonical (u<v<w) joins."""
    from crawl4ai_scraper_spark.operators.graph import triangle_counts

    docs = _t(spark, sf, "documents").select("doc_id")
    e0 = (
        docs.filter(F.col("doc_id") < 239)
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
        .unionAll(
            docs.filter((F.col("doc_id") < 238) & (F.col("doc_id") % 2 == 0))
            .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 2).alias("dst"))
        )
        .unionAll(
            docs.filter(
                (F.col("doc_id") % 10 == 0)
                & (F.col("doc_id") > 0)
                & (F.col("doc_id") < 240)
            ).select(F.lit(0).cast("long").alias("src"), F.col("doc_id").alias("dst"))
        )
    )
    return triangle_counts(e0)


@_q(
    "session_top_paths",
    """WITH s AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS sid
      FROM (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events)
    ), p AS (
      SELECT user_id, sid,
             array_to_string(list(event_type ORDER BY ts, event_id), '>')
               AS path
      FROM s GROUP BY user_id, sid
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20""",
)
def session_top_paths_q(spark, sf):
    """Top user journeys: the 20 most common ordered event-type paths over
    30-minute-gap sessions (the sessionize_events boundaries). In-session
    order is deterministic in BOTH engines — Spark sorts the collected
    (ts, id, type) structs (collect_list alone guarantees nothing), DuckDB
    uses list(... ORDER BY ts, event_id); count-DESC + path tiebreak; the
    top-k is TakeOrderedAndProject, never a global sort."""
    from crawl4ai_scraper_spark.operators.funnel import top_session_paths

    return top_session_paths(_t(spark, sf, "events"), k=20)


@_q(
    "feature_hash_vectors",
    """WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('fh1:' || term), 1, 12) AS BIGINT) AS h
      FROM toks WHERE term <> ''
    ), s AS (
      SELECT doc_id, CAST(h % 64 AS INT) AS dim,
             CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM h
    )
    SELECT doc_id, dim, CAST(SUM(sign) AS BIGINT) AS value
    FROM s GROUP BY doc_id, dim HAVING SUM(sign) <> 0""",
)
def feature_hash_vectors_q(spark, sf):
    """Hashing-trick document vectors (Weinberger/VW/fastText buckets):
    token → dimension h%64 with a ±1 sign from an independent digest bit,
    vector = signed count per dim. Collisions cancel in expectation — a
    64-dim table stands in for an unbounded vocabulary. One token-volume
    groupBy with map-side combine, exact integers, no model artifact, no
    Python; the JVM-side bridge from raw text into the ANN/LSH/semantic-
    dedup toolchain. Oracle via the shared 48-bit md5 digest idiom."""
    from crawl4ai_scraper_spark.operators.search import feature_hash_vectors

    return feature_hash_vectors(_t(spark, sf, "documents"), dim=64, salt="fh1")


@_q(
    "pmi_collocations",
    """WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ), t AS (
      SELECT doc_id, UNNEST(w) AS term, UNNEST(range(1, len(w)+1)) AS pos
      FROM w
    ), uni AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY term
    ), tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM uni),
    big AS (
      SELECT a.term AS w1, b.term AS w2, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY a.term, b.term
    ), nb AS (SELECT CAST(SUM(n_ab) AS DOUBLE) AS total_bigrams FROM big)
    SELECT w1, w2, n_ab,
           ROUND(ln((n_ab * total * total)
                    / (total_bigrams * u1.n * u2.n)), 6) AS pmi
    FROM big JOIN uni u1 ON u1.term = big.w1
             JOIN uni u2 ON u2.term = big.w2
    CROSS JOIN tot CROSS JOIN nb
    WHERE n_ab >= 5""",
)
def pmi_collocations_q(spark, sf):
    """Collocation mining: adjacent-pair PMI = ln(P(w1,w2)/(P(w1)P(w2))) —
    the phrase-vocabulary/boilerplate-discovery statistic. Unigram and
    bigram tables from the SAME positional stream (one groupBy + one
    (doc, pos+1) adjacency join); every probability input is an exact
    BIGINT and the PMI is one double expression written with identical
    association order in both engines, rounded to 6dp. min_count=5 drops
    noise AFTER counting so probabilities stay unbiased."""
    from crawl4ai_scraper_spark.operators.search import pmi_collocations

    return pmi_collocations(_t(spark, sf, "documents"), min_count=5)


@_q(
    "graph_connected_components",
    """WITH RECURSIVE nodes AS (
      SELECT doc_id AS node FROM documents WHERE doc_id < 520
    ), e0 AS (
      SELECT doc_id AS a, doc_id + 1 AS b FROM documents
      WHERE doc_id < 499 AND doc_id % 50 <> 49
      UNION ALL
      SELECT doc_id, doc_id + 100 FROM documents
      WHERE doc_id < 400 AND doc_id % 200 = 0
    ), und AS (
      SELECT a AS s, b AS t FROM e0 UNION ALL SELECT b, a FROM e0
    ), reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT und.t, r.lbl FROM reach r JOIN und ON und.s = r.node
    )
    SELECT node, MIN(lbl) AS component FROM reach GROUP BY node""",
)
def graph_connected_components_q(spark, sf):
    """Connected components by alternating large-star/small-star (Kiveris
    et al. 2014) over a deterministic graph of ten 50-node chains, two
    long-range merge chords, and 20 isolated vertices — chains are the
    adversarial case for min-label propagation (O(diameter) rounds); the
    star contraction closes them in O(log n). The oracle computes true
    min-reachable labels with a recursive CTE. Integer-only math."""
    from crawl4ai_scraper_spark.operators.graph import connected_components

    docs = _t(spark, sf, "documents").select("doc_id")
    chain = docs.filter((F.col("doc_id") < 499) & (F.col("doc_id") % 50 != 49)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
    )
    chords = docs.filter((F.col("doc_id") < 400) & (F.col("doc_id") % 200 == 0)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 100).alias("dst")
    )
    nodes = docs.filter(F.col("doc_id") < 520)
    return connected_components(chain.unionAll(chords), nodes=nodes)


@_q(
    "doc_top_keywords",
    """WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
    toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM d0
    ), p AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY term, doc_id
    ), pd AS (
      SELECT term, doc_id, tf,
             CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
      FROM p
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM d0),
    sc AS (
      SELECT doc_id, term,
             ROUND(CAST(CAST(tf AS DECIMAL(10,0))
               * CAST(ROUND(ln((n_docs + 1) / (df + 1)) + 1, 12)
                      AS DECIMAL(28,12)) AS DOUBLE), 6) AS score
      FROM pd CROSS JOIN n
    ), r AS (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
      FROM sc)
    SELECT doc_id, term, rank, score FROM r WHERE rank <= 3""",
)
def doc_top_keywords_q(spark, sf):
    """Per-doc keyword extraction: top-3 terms by smoothed tf-idf (idf
    rounded to 12dp DECIMAL, exact tf·idf product, 6dp double output, term-
    ascending ties). ONE corpus-volume shuffle (postings groupBy with
    map-side combine); df over the collapsed postings; N broadcast."""
    from crawl4ai_scraper_spark.operators.search import doc_top_keywords

    return doc_top_keywords(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 300).select("doc_id", "text")
    )


