"""Crawl relational operators (SURVEY §2.1-2.8) + text-analysis operators.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# §2.1 scans / seeds
# ---------------------------------------------------------------------------

@_q(
    "seed_scheme_fixup",
    f"""SELECT doc_id,
           CASE WHEN raw LIKE 'http://%' OR raw LIKE 'https://%' THEN raw
                ELSE 'https://' || raw END AS url
    FROM (SELECT doc_id, source || '.example/d' || CAST(doc_id AS VARCHAR) AS raw
          FROM documents)""",
)
def seed_scheme_fixup(spark, sf):
    """O-1/O-2/O-3: https:// prefixing of scheme-less seeds (main.py:247-249)."""
    raw = F.concat(F.col("source"), F.lit(".example/d"), F.col("doc_id").cast("string"))
    docs = _t(spark, sf, "documents").select("doc_id", raw.alias("raw"))
    fixed = F.when(F.col("raw").rlike("^https?://"), F.col("raw")).otherwise(
        F.concat(F.lit("https://"), F.col("raw"))
    )
    return docs.select("doc_id", fixed.alias("url"))


# ---------------------------------------------------------------------------
# §2.2 projections / filters / url functions
# ---------------------------------------------------------------------------

@_q(
    "url_canonicalize",
    f"""SELECT doc_id,
           regexp_replace(regexp_replace({_URL_SQL}, '#.*$', ''), '/$', '') AS canon
    FROM documents""",
)
def url_canonicalize(spark, sf):
    """O-9: fragment strip + trailing-slash strip (crawler.py:150-165), run
    through the KERNEL pandas UDF on the Spark side and equivalent string SQL
    on the oracle side — a UDF-vs-SQL cross-check on controlled inputs."""
    from crawl4ai_scraper_spark.functions.udfs import canon_url_udf

    docs = _t(spark, sf, "documents").select("doc_id", _url_col().alias("url"))
    return docs.select("doc_id", canon_url_udf(F.col("url"), F.lit(None)).alias("canon"))


_INC = wildcard_to_regex("**/docs/**")
_EXC = wildcard_to_regex("**?x=1*")

@_q(
    "wildcard_include_exclude",
    f"""SELECT doc_id, url FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    WHERE NOT regexp_matches(url, '{_EXC}') AND regexp_matches(url, '{_INC}')""",
)
def wildcard_include_exclude(spark, sf):
    """O-10/O-11: wildcard→regex with exclusions-first (crawler.py:84-130).
    Same kernel-generated regex literal in both engines; rlike is unanchored
    but the kernel emits ^...$ anchors."""
    from crawl4ai_scraper_spark.functions.udfs import include_exclude_predicate

    docs = _t(spark, sf, "documents").select("doc_id", _url_col().alias("url"))
    return docs.filter(include_exclude_predicate(F.col("url"), ["**/docs/**"], ["**?x=1*"]))


@_q(
    "domain_extract",
    f"""SELECT doc_id, regexp_extract({_URL_SQL}, '^([a-z]+://[^/]+)', 1) AS domain
    FROM documents""",
)
def domain_extract(spark, sf):
    """O-12: scheme://netloc (crawler.py:141-144)."""
    docs = _t(spark, sf, "documents").select("doc_id", _url_col().alias("url"))
    return docs.select(
        "doc_id", F.regexp_extract(F.col("url"), "^([a-z]+://[^/]+)", 1).alias("domain")
    )


@_q(
    "same_domain_gate",
    f"""WITH u AS (SELECT doc_id, regexp_extract({_URL_SQL}, '^([a-z]+://[^/]+)', 1) AS domain
                 FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM u a JOIN u b ON a.domain = b.domain AND a.doc_id < b.doc_id""",
)
def same_domain_gate(spark, sf):
    """O-13: same-domain predicate as an equi-join on extracted domain."""
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.regexp_extract(_url_col(), "^([a-z]+://[^/]+)", 1).alias("domain"),
    )
    a = docs.select(F.col("doc_id").alias("id_a"), "domain")
    b = docs.select(F.col("doc_id").alias("id_b"), "domain")
    return a.join(b, "domain").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")


@_q(
    "pushdown_filter_agg",
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def pushdown_filter_agg(spark, sf):
    """O-14/O-15 at scale: predicate + column pruning down to the parquet
    scan (TPC-H Q6 shape). DECIMAL accumulation → order-independent sum."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * F.col("l_discount").cast("decimal(18,4)")
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

@_q(
    "visited_anti_join",
    """SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def visited_anti_join(spark, sf):
    """O-16: URL-seen dedup as left-anti join (the exact arm behind the bloom
    pre-filter)."""
    cust, orders = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "fetch_equi_join",
    """SELECT o.o_orderkey, c.c_name, CAST(o.o_totalprice AS DOUBLE) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'""",
)
def fetch_equi_join(spark, sf):
    """O-4/O-18: the fetch join — frontier(url) ⋈ pages(url) shape."""
    orders, cust = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name", F.col("o_totalprice").cast("double").alias("total"))
    )


@_q(
    "broadcast_rules_join",
    """SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name""",
)
def broadcast_rules_join(spark, sf):
    """O-19: politeness/robots rules as a broadcast dim join (host_rules is a
    tiny table exactly like nation/region here)."""
    c = _t(spark, sf, "customer")
    n = F.broadcast(_t(spark, sf, "nation"))
    r = F.broadcast(_t(spark, sf, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double").alias("balance"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

@_q(
    "run_summary_agg",
    """SELECT COUNT(*) AS total_urls,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS successful,
           COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS failed,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
                               THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE)
               AS total_content_length
    FROM orders""",
)
def run_summary_agg(spark, sf):
    """O-20/O-22: the crawl-summary conditional aggregate (crawler.py:580-592)."""
    orders = _t(spark, sf, "orders")
    ok = F.col("o_orderstatus") == "F"
    return orders.agg(
        F.count(F.lit(1)).alias("total_urls"),
        F.count(F.when(ok, 1)).alias("successful"),
        F.count(F.when(~ok, 1)).alias("failed"),
        F.round(F.sum(F.when(ok, F.col("o_totalprice").cast("decimal(18,4)"))), 2)
        .cast("double").alias("total_content_length"),
    )


@_q(
    "links_count_agg",
    """SELECT CAST(len(embedding) AS BIGINT) AS dim, COUNT(*) AS n_vectors
    FROM embeddings GROUP BY 1""",
)
def links_count_agg(spark, sf):
    """O-21: links_count = size(array) aggregation."""
    emb = _t(spark, sf, "embeddings")
    return emb.groupBy(F.size("embedding").cast("bigint").alias("dim")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


# ---------------------------------------------------------------------------
# §2.5 windows / ordering
# ---------------------------------------------------------------------------

@_q(
    "first_appender_window",
    """SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1""",
)
def first_appender_window(spark, sf):
    """O-17/O-25: first-appender-wins dedup (earliest (ts, id) per key)."""
    ev = _t(spark, sf, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@_q(
    "bfs_level_rank",
    """SELECT event_type, event_id,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS seq
    FROM events""",
)
def bfs_level_rank(spark, sf):
    """O-24: the intra-level visit sequence window."""
    ev = _t(spark, sf, "events")
    win = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select("event_type", "event_id", F.row_number().over(win).alias("seq"))


@_q(
    "adjacency_collect",
    """SELECT source, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS children
    FROM documents GROUP BY source""",
)
def adjacency_collect(spark, sf):
    """O-26: relationship adjacency — ordered collect per parent."""
    docs = _t(spark, sf, "documents")
    children = F.concat_ws(
        ",", F.transform(F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string"))
    )
    return docs.groupBy("source").agg(children.alias("children"))


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / budget
# ---------------------------------------------------------------------------

@_q(
    "final_sort_limit",
    """SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20""",
)
def final_sort_limit(spark, sf):
    """O-27/O-29: deterministic top-k (TakeOrderedAndProject)."""
    return (
        _t(spark, sf, "documents")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "n_chars")
    )


@_q(
    "budget_truncation",
    """SELECT event_id, ts FROM (
        SELECT event_id, ts,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   OVER (ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched
        FROM events)
    WHERE matched <= 100""",
)
def budget_truncation(spark, sf):
    """O-28: the mid-stream max_pages cut — keep rows until the 100th match
    (running matched-count over the global visit order)."""
    ev = _t(spark, sf, "events")
    win = Window.orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    matched = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).over(win)
    return ev.withColumn("matched", matched).filter(F.col("matched") <= 100).select("event_id", "ts")


# ---------------------------------------------------------------------------
# §2.7 set ops
# ---------------------------------------------------------------------------

@_q(
    "union_distinct_seeds",
    """SELECT DISTINCT doc_id, source FROM (
        SELECT doc_id, source FROM documents WHERE lang = 'en'
        UNION ALL
        SELECT doc_id, source FROM documents WHERE n_chars > 200)""",
)
def union_distinct_seeds(spark, sf):
    """O-30: multi-seed union-distinct (crawler.py:695-703)."""
    docs = _t(spark, sf, "documents")
    a = docs.filter(F.col("lang") == "en").select("doc_id", "source")
    b = docs.filter(F.col("n_chars") > 200).select("doc_id", "source")
    return a.unionByName(b).dropDuplicates(["doc_id", "source"])


# ---------------------------------------------------------------------------
# §2.8 string/scalar functions (naming + formatting)
# ---------------------------------------------------------------------------

@_q(
    "url_to_filename",
    f"""SELECT doc_id,
           trim(translate(regexp_extract(url, '^[a-z]+://(.*)$', 1),
                          '/\\:*?"<>|', '_________'), '_') || '.md' AS filename
    FROM (SELECT doc_id, regexp_replace(regexp_replace({_URL_SQL}, '#.*$', ''), '\\?.*$', '') AS url
          FROM documents)""",
)
def url_to_filename(spark, sf):
    """O-32: netloc+path → _-sanitized .md filename (crawler.py:361-386).
    Spark side runs the kernel logic natively (translate+trim) — same ops."""
    docs = _t(spark, sf, "documents").select("doc_id", _url_col().alias("raw"))
    # netloc+path of the canon url (the query/fragment are stripped first,
    # mirroring url_to_filename's urlparse which keeps netloc+path only)
    nofrag = F.regexp_replace(F.regexp_replace(F.col("raw"), "#.*$", ""), "\\?.*$", "")
    hostpath = F.regexp_extract(nofrag, "^[a-z]+://(.*)$", 1)
    sanitized = F.translate(hostpath, '/\\:*?"<>|', "_________")
    return (
        docs.withColumn("sanitized_col", sanitized)
        .select("doc_id", F.concat(F.expr("trim(BOTH '_' FROM sanitized_col)"), F.lit(".md")).alias("filename"))
    )


@_q(
    "filename_hash_convention",
    f"""SELECT doc_id, source || '.example_' || substr(md5({_URL_SQL}), 1, 12) || '.md' AS filename
    FROM documents""",
)
def filename_hash_convention(spark, sf):
    """O-33 hash convention: domain_md5(url)[:12].md (output_manager.py:328-333)."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit(".example_"), F.substring(F.md5(_url_col()), 1, 12), F.lit(".md")
        ).alias("filename"),
    )


@_q(
    "title_based_filename",
    """SELECT doc_id,
           regexp_replace(regexp_replace(lower(substr(text, 1, 30)), '[^\\w\\s-]', '', 'g'),
                          '[-\\s]+', '_', 'g') || '.md' AS filename
    FROM documents""",
)
def title_based_filename(spark, sf):
    """O-33 title convention (output_manager.py:314-319)."""
    docs = _t(spark, sf, "documents")
    title = F.lower(F.substring("text", 1, 30))
    fname = F.concat(
        F.regexp_replace(F.regexp_replace(title, "[^\\w\\s-]", ""), "[-\\s]+", "_"),
        F.lit(".md"),
    )
    return docs.select("doc_id", fname.alias("filename"))


@_q(
    "custom_pattern_path",
    """SELECT doc_id,
           source || '.example/2025/' || CAST(doc_id AS VARCHAR) || '.md' AS path
    FROM documents""",
)
def custom_pattern_path(spark, sf):
    """O-35/O-36: {domain}/{year}/{filename} template (output_manager.py:367-396)."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit(".example/2025/"), F.col("doc_id").cast("string"), F.lit(".md")
        ).alias("path"),
    )


@_q(
    "yaml_front_matter",
    """SELECT doc_id,
           '---' || chr(10) || 'url: src://' || CAST(doc_id AS VARCHAR)
           || chr(10) || 'title: doc ' || CAST(doc_id AS VARCHAR)
           || chr(10) || 'content_length: ' || CAST(n_chars AS VARCHAR)
           || chr(10) || 'capture_mode: enhanced' || chr(10) || '---' AS front
    FROM documents""",
)
def yaml_front_matter(spark, sf):
    """O-37: fixed-key-order unescaped front matter (output_manager.py:477-500)."""
    docs = _t(spark, sf, "documents")
    nl = F.lit("\n")
    front = F.concat(
        F.lit("---"), nl, F.lit("url: src://"), F.col("doc_id").cast("string"),
        nl, F.lit("title: doc "), F.col("doc_id").cast("string"),
        nl, F.lit("content_length: "), F.col("n_chars").cast("string"),
        nl, F.lit("capture_mode: enhanced"), nl, F.lit("---"),
    )
    return docs.select("doc_id", front.alias("front"))


# ---------------------------------------------------------------------------
# Text-analysis operators (training-data pipeline)
# ---------------------------------------------------------------------------

_SW_EN = "'the','a','of','and','to','in','is'"
_SW_DE = "'der','die','das','und','ist','ein','zu'"
_SW_FR = "'le','la','les','et','est','un','une'"
_SW_ES = "'el','la','los','y','es','un','una'"

_TOKS = "string_split_regex(trim(text), '\\s+')"
_LTOKS = "string_split_regex(trim(lower(text)), '\\s+')"


@_q(
    "token_counts",
    f"""SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
    FROM documents""",
)
def token_counts(spark, sf):
    """Token counting: whitespace + BPE-ish regex pieces."""
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).alias("n_ws_tokens"),
        T.token_count_bpe(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
    )


@_q(
    "lang_id_stopwords",
    f"""WITH s AS (
      SELECT doc_id, lang,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_EN}))) AS s_en,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_DE}))) AS s_de,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_FR}))) AS s_fr,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_ES}))) AS s_es
      FROM documents)
    SELECT doc_id, lang,
      CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
           WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
           WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
           WHEN s_es > 0 THEN 'es'
           ELSE 'und' END AS lang_pred
    FROM s""",
)
def lang_id_stopwords(spark, sf):
    """Language-ID via stopword-hit scoring (n-gram-free heuristic)."""
    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", "lang", T.lang_id(F.col("text")).alias("lang_pred"))


# The per-doc composite quality expression (shared by quality_score and
# host_reputation — ONE source of truth for the oracle-side formula).
_QUALITY_EXPR = f"""ROUND(0.4 * least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0
                                   ELSE len({_TOKS}) END) / 100.0)
          + 0.3 * least(1.0, 4.0 * len(list_filter({_LTOKS}, t -> t IN ({_SW_EN})))
                              / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                              ELSE len({_TOKS}) END, 1))
          + 0.3 * greatest(0.0, 1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                                    / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                                    ELSE len({_TOKS}) END, 1)), 4)"""


@_q(
    "quality_score",
    f"""SELECT doc_id, {_QUALITY_EXPR} AS quality
    FROM documents""",
)
def quality_score(spark, sf):
    """Quality scoring: length saturation + stopword ratio + punct density."""
    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


@_q(
    "host_reputation",
    f"""WITH q AS (SELECT source, {_QUALITY_EXPR} AS quality FROM documents)
    SELECT source AS host,
           ROUND((CAST(SUM(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) + 12.5)
                 / (COUNT(*) + 25.0), 4) AS reputation,
           COUNT(*) AS n_docs
    FROM q GROUP BY source""",
)
def host_reputation(spark, sf):
    """Bayesian-smoothed per-host quality (w=25, m=0.5) — the crawl frontier's
    host-prioritization signal; exact DECIMAL sums make the mean order-free."""
    docs = _t(spark, sf, "documents")
    return T.host_reputation(docs, "source", "text")


@_q(
    "doc_fingerprint",
    """SELECT doc_id,
           md5(substr(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 100)) AS fp
    FROM documents""",
)
def doc_fingerprint(spark, sf):
    """Document fingerprint — the reference's normalized-prefix dedup key
    (selector_utils.py:199-210) as a document operator."""
    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


