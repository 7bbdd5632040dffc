"""Politeness: robots rules + per-host virtual-time scheduling (O-19, §2.9).

The reference's only politeness is one global wall-clock sleep
(crawler.py:33, 237-238) — it never affects WHAT is crawled or in what order,
only when. This engine keeps that contract:

* ``robots_filter`` (our extension; the reference merely advises robots.txt in
  README.md:609) drops candidates whose path matches a host's disallow
  prefixes BEFORE they are enqueued. With an empty rules table the engine is
  bit-identical to the reference. Rules are a tiny dimension table →
  broadcast join.
* ``virtual_schedule`` assigns each visit a deterministic virtual timestamp:
  within a round, the i-th visit of a host h departs at
  ``round_vt + i * crawl_delay(h)``. Pure metadata (recorded on visited rows,
  exposed for budget accounting); the crawl order is fixed by the FIFO
  ranks, never by the schedule — which is exactly how the reference behaves.

``host_rules`` schema, two accepted shapes (robots_filter dispatches on the
columns present):
* minimal/hand-built: ``host, crawl_delay, disallow_prefixes array<string>``
  → any-matching-disallow-prefix semantics (the original contract);
* ``rules_from_robots`` output adds ``allow_prefixes`` (LITERAL rules only)
  and ``disallow_rules``/``allow_rules`` ``array<struct<rx,n>>`` (the
  WILDCARD rules pre-translated to anchored regexes) → full RFC 9309
  longest-match, Allow winning length ties; literal rules match via cheap
  startswith, only genuine wildcard rules pay regexp evaluation.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HOST_RULES_SCHEMA = "host string, crawl_delay double, disallow_prefixes array<string>"


def empty_host_rules(spark) -> DataFrame:
    return spark.createDataFrame([], HOST_RULES_SCHEMA)


def rules_from_robots(pages: DataFrame, default_agent: str = "*") -> DataFrame:
    """Build the host_rules dimension table from raw robots.txt documents in
    the pages table (north_rule: robots rules evaluated in vectorized
    pandas/Arrow UDFs).

    Scan shape: the robots filter is a pushed-down url predicate — of a
    10^10-page lake only the ~one-row-per-host robots bodies reach the Arrow
    parse pass, and the output is the same tiny broadcastable dimension the
    rest of the politeness layer already consumes."""
    import pandas as pd

    from crawl4ai_scraper_spark.kernel.robots import (
        is_wildcard_rule,
        parse_robots_rules,
        robots_rules_structs,
    )
    from crawl4ai_scraper_spark.kernel.htmlkit import decode_html

    if "warc_ts" not in pages.columns:  # ad-hoc frames; real tables have it
        pages = pages.withColumn("warc_ts", F.lit(None).cast("timestamp"))
    robots = pages.filter(
        F.col("url").rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt$")
    ).select("url", "warc_ts", "html")

    def _parse(batches):
        from crawl4ai_scraper_spark.kernel.urls import safe_urlparse as urlparse

        for pdf in batches:
            hosts, urls, tss, delays, prefixes, allows = [], [], [], [], [], []
            drules, arules = [], []
            for url, ts, body in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                delay, dis, allow = parse_robots_rules(decode_html(body), default_agent)
                hosts.append(urlparse(url).netloc)
                urls.append(url)
                tss.append(ts)
                delays.append(delay)
                # literal rules stay prefixes (cheap startswith in the
                # filter); only genuine wildcard rules become regex structs
                prefixes.append([r for r in dis if not is_wildcard_rule(r)])
                allows.append([r for r in allow if not is_wildcard_rule(r)])
                drules.append(robots_rules_structs([r for r in dis if is_wildcard_rule(r)]))
                arules.append(robots_rules_structs([r for r in allow if is_wildcard_rule(r)]))
            yield pd.DataFrame(
                {"host": hosts, "url": urls, "warc_ts": tss,
                 "crawl_delay": delays, "disallow_prefixes": prefixes,
                 "allow_prefixes": allows,
                 "disallow_rules": drules, "allow_rules": arules}
            )

    parsed = robots.mapInPandas(
        _parse,
        "host string, url string, warc_ts timestamp, "
        + HOST_RULES_SCHEMA.split(", ", 1)[1]
        + ", allow_prefixes array<string>"
        + ", disallow_rules array<struct<rx: string, n: int>>"
        + ", allow_rules array<struct<rx: string, n: int>>",
    )
    # EXACTLY one row per host: duplicate robots records (http/https variants,
    # recrawl revisions — both arise from WARC ingests) would otherwise fan
    # out every left join downstream (virtual_schedule, robots_filter),
    # duplicating visit rows. Keep the latest (warc_ts, url) revision.
    from crawl4ai_scraper_spark.operators.temporal import latest_revision

    return latest_revision(parsed, key="host", ts_col="warc_ts", tiebreak="url").drop(
        "url", "warc_ts"
    )


def robots_filter(candidates: DataFrame, host_rules: Optional[DataFrame]) -> DataFrame:
    """Drop robots-disallowed candidates. Broadcast the (tiny) rules table;
    the rule test is native array math over the prefix lists — no UDF, no
    per-url aggregation. When the rules table carries ``allow_prefixes``
    (rules_from_robots output), RFC 9309 longest-match precedence applies:
    the longest matching prefix decides, Allow winning length ties; plain
    3-column rules tables keep the original any-disallow-prefix semantics."""
    if host_rules is None:
        return candidates
    has_rx = "disallow_rules" in host_rules.columns  # rules_from_robots output
    has_allow = "allow_prefixes" in host_rules.columns
    if has_rx:
        cols = ["disallow_prefixes", "allow_prefixes", "disallow_rules", "allow_rules"]
    else:
        cols = ["disallow_prefixes"] + (["allow_prefixes"] if has_allow else [])
    rules = F.broadcast(host_rules.select(
        F.col("host").alias("child_host"), *cols
    ))
    joined = candidates.join(rules, "child_host", "left")
    path = F.regexp_replace(F.col("child_url"), r"^[a-z]+://[^/]*", "")

    def _longest_prefix(col: str):
        # max RFC precedence length (octets) over the prefixes that match;
        # null when none do
        return F.array_max(
            F.transform(
                F.filter(F.coalesce(F.col(col), F.array()),
                         lambda p: path.startswith(p)),
                F.octet_length,
            )
        )

    def _longest_rx(col: str):
        # max RFC precedence length over the wildcard rules that match
        return F.array_max(
            F.transform(
                F.coalesce(F.col(col), F.array()),
                lambda s: F.when(F.regexp_like(path, s.rx), s.n),
            )
        )

    if has_rx:
        # literal rules (the overwhelming majority in real robots.txt) match
        # via cheap startswith; only wildcard rules pay per-rule regex cost.
        # F.greatest skips nulls, so either family alone decides when the
        # other has no match.
        dmax = F.greatest(_longest_prefix("disallow_prefixes"), _longest_rx("disallow_rules"))
        amax = F.greatest(_longest_prefix("allow_prefixes"), _longest_rx("allow_rules"))
        disallowed = dmax.isNotNull() & (amax.isNull() | (amax < dmax))
    elif has_allow:
        dmax, amax = _longest_prefix("disallow_prefixes"), _longest_prefix("allow_prefixes")
        disallowed = dmax.isNotNull() & (amax.isNull() | (amax < dmax))
    else:
        disallowed = F.exists(
            F.coalesce(F.col("disallow_prefixes"), F.array()),
            lambda p: path.startswith(p),
        )
    return joined.filter(~disallowed).drop(*cols)


def virtual_schedule(
    visits: DataFrame,
    host_rules: Optional[DataFrame],
    default_delay: float,
    round_vt: float,
    bucket_size: int = 1 << 16,
) -> DataFrame:
    """Attach ``sched_ts`` (seconds of virtual time) per visit: rank within
    host × that host's crawl delay.

    Skew-proof host rank: a plain ``row_number() OVER (PARTITION BY host)``
    puts a hot host's entire round into ONE window partition — 10^8 rows of
    sort-and-spill when a single domain dominates the frontier. Instead the
    rank is computed in two bounded phases over ``arrival_rank`` buckets:

      1. per-(host, bucket) row counts → per-host running offsets via a
         window over BUCKET IDS (≤ round_size/bucket_size rows per host);
      2. local row_number within (host, bucket) (≤ bucket_size rows per
         window partition) + offset.

    Identical output to the naive window (arrival_rank is a global total
    order), bounded partition sizes everywhere.
    """
    if host_rules is not None:
        delays = F.broadcast(host_rules.select("host", "crawl_delay"))
        visits = visits.join(delays, "host", "left")
    else:
        visits = visits.withColumn("crawl_delay", F.lit(None).cast("double"))

    visits = visits.withColumn("_b", (F.col("arrival_rank") / bucket_size).cast("long"))
    offsets = (
        visits.groupBy("host", "_b").agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.partitionBy("host").orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("host", "_b", "_off")
    )
    local = F.row_number().over(Window.partitionBy("host", "_b").orderBy("arrival_rank"))
    return (
        visits.join(offsets, ["host", "_b"])
        .withColumn(
            "sched_ts",
            F.lit(round_vt)
            + (F.col("_off") + local - F.lit(1))
            * F.coalesce(F.col("crawl_delay"), F.lit(default_delay)),
        )
        .drop("crawl_delay", "_b", "_off")
    )


def bucketed_rank(
    df: DataFrame,
    part_col: str,
    order_col: str,
    bucket_size: int = 1 << 16,
    out_col: str = "_rank",
) -> DataFrame:
    """Skew-proof per-group rank (the virtual_schedule two-phase trick as a
    reusable primitive): per-(group, bucket) counts → running offsets over
    bucket IDS, plus a local row_number bounded by ``bucket_size`` rows per
    window partition. Identical to ``row_number() OVER (PARTITION BY group
    ORDER BY order_col)`` when ``order_col`` is globally unique, without
    ever sorting a hot group's 10^8 rows in one partition."""
    df = df.withColumn("_b", (F.col(order_col) / bucket_size).cast("long"))
    offsets = (
        df.groupBy(part_col, "_b").agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.partitionBy(part_col).orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(part_col, "_b", "_off")
    )
    local = F.row_number().over(
        Window.partitionBy(part_col, "_b").orderBy(order_col)
    )
    return (
        df.join(offsets, [part_col, "_b"])
        .withColumn(out_col, (F.col("_off") + local).cast("long"))
        .drop("_b", "_off")
    )


def host_budget_cap(
    frontier: DataFrame,
    max_per_host: int,
    host_col: str = "host",
    order_col: str = "arrival_rank",
    bucket_size: int = 1 << 16,
) -> DataFrame:
    """Per-host frontier budget: keep each host's first ``max_per_host``
    candidates in arrival order (fairness cap — one huge site must not
    monopolize a crawl round). Built on the bucketed rank so a host holding
    30% of a 10^10-URL frontier still ranks in bounded partitions."""
    ranked = bucketed_rank(
        frontier, host_col, order_col, bucket_size=bucket_size, out_col="_host_rank"
    )
    return ranked.filter(F.col("_host_rank") <= max_per_host).drop("_host_rank")


# Media/asset extensions a text crawl never fetches.
BLOCKED_EXTENSIONS = (
    "jpg|jpeg|png|gif|webp|ico|svg|css|js|mp3|mp4|avi|mov|"
    "zip|gz|tar|rar|7z|exe|dmg|iso|pdf|doc|docx|ppt|xls"
)


def hygiene_flags(url: F.Column, *, max_url_len: int = 2048,
                  max_path_depth: int = 16, max_query_params: int = 8,
                  max_repeated_segments: int = 2) -> dict:
    """Crawler-trap heuristics as pure Column predicates (no UDF, scan
    speed): over-long URLs, calendar/faceted-search query explosions,
    path-loop traps (/a/b/a/b/a/b — repeated path segments), excessive path
    depth, and binary/asset extensions. These guard the frontier BEFORE the
    seen-set: a trap generates unbounded NEW urls, so the anti-join alone
    cannot contain it."""
    path_q = F.regexp_replace(url, "^[a-z]+://[^/]*", "")
    path = F.regexp_replace(path_q, "[?#].*$", "")
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    qs = F.regexp_extract(url, "\\?([^#]*)", 1)
    n_params = F.when(qs == "", F.lit(0)).otherwise(F.size(F.split(qs, "&")))
    return {
        "too_long": F.length(url) > max_url_len,
        "too_deep": F.size(segs) > max_path_depth,
        "too_many_params": n_params > max_query_params,
        "loop_suspect": (F.size(segs) - F.size(F.array_distinct(segs)))
        > max_repeated_segments,
        "blocked_ext": F.lower(path).rlike(
            f"\\.({BLOCKED_EXTENSIONS})$"
        ),
    }


def hygiene_filter(candidates: DataFrame, url_col: str = "child_url",
                   **limits) -> DataFrame:
    """Drop frontier candidates that trip any hygiene flag."""
    flags = hygiene_flags(F.col(url_col), **limits)
    keep = ~flags["too_long"]
    for name in ("too_deep", "too_many_params", "loop_suspect", "blocked_ext"):
        keep = keep & ~flags[name]
    return candidates.filter(keep)


def sitemaps_from_robots(pages: DataFrame) -> DataFrame:
    """(host, sitemap_url) rows from the ``Sitemap:`` directives of stored
    robots.txt documents — same pushed-down robots scan as
    ``rules_from_robots``, Arrow-side parse, tiny output."""
    import pandas as pd

    from crawl4ai_scraper_spark.kernel.htmlkit import decode_html
    from crawl4ai_scraper_spark.kernel.robots import parse_sitemaps

    robots = pages.filter(
        F.col("url").rlike(r"^[a-z][a-z0-9+.-]*://[^/]+/robots\.txt$")
    ).select("url", "html")

    def _parse(batches):
        from crawl4ai_scraper_spark.kernel.urls import safe_urlparse as urlparse

        for pdf in batches:
            hosts, sitemap_urls = [], []
            for url, body in zip(pdf["url"], pdf["html"]):
                host = urlparse(url).netloc
                for sm in parse_sitemaps(decode_html(body)):
                    hosts.append(host)
                    sitemap_urls.append(sm)
            yield pd.DataFrame({"host": hosts, "sitemap_url": sitemap_urls})

    return robots.mapInPandas(_parse, "host string, sitemap_url string").dropDuplicates(
        ["host", "sitemap_url"]
    )


def seeds_from_sitemaps(pages: DataFrame, sitemaps: DataFrame) -> DataFrame:
    """Expand stored sitemap documents into a seed-URL frame: the (tiny)
    sitemap-url list is broadcast against the pages scan (needles into the
    haystack, like the fetch join), each hit's ``<loc>`` entries scraped in
    one Arrow pass. Single-level: sitemap-INDEX entries come back as rows
    too and can be fed through a second call. Output: (host, sitemap_url,
    seed_url, loc_pos) — the lastmod-free projection of ``sitemap_entries``
    (one scrape pipeline, so the seed set and the freshness signal can never
    disagree)."""
    return sitemap_entries(pages, sitemaps).select(
        "host", "sitemap_url", "seed_url", "loc_pos"
    )


def sitemap_entries(pages: DataFrame, sitemaps: DataFrame) -> DataFrame:
    """``seeds_from_sitemaps`` with the protocol's freshness signal: one row
    per ``<url>``/``<sitemap>`` block carrying the optional ``<lastmod>``
    (null when absent). Same broadcast-needles shape — the sitemap-url list
    is broadcast into the pages scan, blocks scraped in one Arrow pass.
    Output: (host, sitemap_url, seed_url, loc_pos, lastmod)."""
    import pandas as pd

    from crawl4ai_scraper_spark.kernel.htmlkit import decode_html
    from crawl4ai_scraper_spark.kernel.robots import entries_from_sitemap_xml

    hits = pages.select("url", "html").join(
        F.broadcast(sitemaps.select("host", F.col("sitemap_url").alias("url"))),
        "url",
    )

    def _parse(batches):
        for pdf in batches:
            rows = {"host": [], "sitemap_url": [], "seed_url": [],
                    "loc_pos": [], "lastmod": []}
            for host, url, body in zip(pdf["host"], pdf["url"], pdf["html"]):
                for i, rec in enumerate(entries_from_sitemap_xml(decode_html(body))):
                    rows["host"].append(host)
                    rows["sitemap_url"].append(url)
                    rows["seed_url"].append(rec["loc"])
                    rows["loc_pos"].append(i)
                    rows["lastmod"].append(rec["lastmod"])
            yield pd.DataFrame(rows)

    return hits.mapInPandas(
        _parse,
        "host string, sitemap_url string, seed_url string, loc_pos int, lastmod string",
    )


def sitemap_seed_priorities(entries: DataFrame) -> DataFrame:
    """Sitemap entries → the (url, priority) signal frame the frontier's
    priority mode consumes: priority = the lastmod wall-clock epoch second
    (newer pages first), 0 for entries without a lastmod. Timezone-free: the
    parsed timestamp round-trips through TIMESTAMP_NTZ so the session zone
    cancels. Compose with run_crawl(priority_col=..., cfg.frontier_order=
    "priority") — the sitemap-declared freshest pages are fetched first."""
    # try_to_timestamp: real sitemaps carry junk lastmod values, and under
    # Spark 4's default ANSI mode a plain to_timestamp would crash the whole
    # job on the first one — unparseable values become NULL → priority 0.
    epoch_s = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        "cast(try_to_timestamp(lastmod) as timestamp_ntz))"
    )
    return (
        entries.select(
            F.col("seed_url").alias("url"),
            F.coalesce(epoch_s.cast("double"), F.lit(0.0)).alias("priority"),
        )
        .groupBy("url")
        .agg(F.max("priority").alias("priority"))
    )


# ---------------------------------------------------------------------------
# RefinedWeb/FineWeb-style URL filtering (Penedo et al. 2023 §3.1): a hard
# domain blocklist plus a soft weighted banned-word score over the URL string
# — the standard pre-fetch screen of a Common-Crawl training-data pipeline.
# Deterministic literal weights so the DuckDB oracle reproduces the math.
# ---------------------------------------------------------------------------

URL_SPAM_TERMS = {
    "betting": 0.5,
    "casino": 0.8,
    "crypto-giveaway": 0.8,
    "escort": 0.9,
    "free-money": 0.6,
    "pharmacy-online": 0.6,
    "poker": 0.5,
    "porn": 1.0,
    "torrent": 0.4,
    "viagra": 0.9,
    "warez": 0.7,
    "xxx": 0.9,
}


def url_spam_score(url: Column, terms: Optional[dict] = None) -> Column:
    """Soft URL-spam score: Σ weight over banned terms contained in the
    lowercased URL. Pure column math (codegen'd, scan speed); terms are
    summed in sorted order so the IEEE addition tree is identical in any
    engine that mirrors the same order."""
    t = terms or URL_SPAM_TERMS
    u = F.lower(url)
    score = F.lit(0.0)
    for term in sorted(t):
        score = score + F.when(F.instr(u, term) > 0, F.lit(float(t[term]))).otherwise(
            F.lit(0.0)
        )
    return F.round(score, 4)


def url_blocklist_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_hosts: Optional[DataFrame] = None,
    spam_threshold: Optional[float] = 0.9,
    terms: Optional[dict] = None,
    broadcast_blocklist: bool = True,
    host_col: Optional[str] = None,
) -> DataFrame:
    """Hard + soft URL filtering: drop rows whose host is on the blocklist
    (left ANTI join — broadcast by default, since even a 10M-domain list is
    a few hundred MB of strings; pass ``broadcast_blocklist=False`` to let
    the anti-join shuffle when the list outgrows the driver), then drop rows
    whose ``url_spam_score`` reaches ``spam_threshold``. Adds the
    ``spam_score`` column to the survivors (useful as a quality signal
    downstream). Runs BEFORE the fetch join, so blocked URLs never touch
    the pages scan. ``spam_threshold=None`` disables the soft screen
    (blocklist only); the ``spam_score`` column is attached either way.
    ``host_col`` names a precomputed host column (the crawl round's
    ``child_host``) — skips the per-row regex re-derivation."""
    host = (
        F.col(host_col)
        if host_col
        else F.regexp_extract(F.col(url_col), "^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    )
    out = df.withColumn("_host", host)
    if blocked_hosts is not None:
        bl = blocked_hosts.select(F.col(blocked_hosts.columns[0]).alias("_host"))
        if broadcast_blocklist:
            bl = F.broadcast(bl)
        out = out.join(bl, "_host", "left_anti")
    out = out.withColumn("spam_score", url_spam_score(F.col(url_col), terms))
    if spam_threshold is not None:
        out = out.filter(F.col("spam_score") < F.lit(spam_threshold))
    return out.drop("_host")


def host_trap_stats(
    df: DataFrame,
    host_col: str,
    url_col: str,
    text_col: str,
    min_urls: int = 20,
    max_urls_per_template: float = 10.0,
    max_dup_ratio: float = 0.5,
) -> DataFrame:
    """STATISTICAL trap detection per host — the behavioral complement to
    ``hygiene_flags``'s per-URL heuristics. A calendar/faceted/session-id
    trap looks like: many URLs that collapse to few path TEMPLATES
    (digit runs normalized to 'N') while serving near-identical content.
    Per host over already-visited pages:

      urls_per_template = n_urls / n_templates      (URL-space explosion)
      dup_content_ratio = 1 - n_distinct_texts/n    (content productivity)

    ``trap_suspect`` fires when a host minted ≥ ``min_urls`` URLs AND both
    signals cross their thresholds — feed it into the frontier as a
    blocklist (``url_blocklist_filter``) or a negative priority, the same
    way ``host_reputation`` feeds the positive one.

    Scale shape: template + content hash are pure projections at scan
    speed; ONE groupBy on the host key computes all counts (the two exact
    distinct aggregates share the single Expand pass — constant-factor,
    map-side combined, no skew beyond the host key itself). text never
    shuffles — only its md5."""
    template = url_path_template(F.col(url_col))
    per = df.select(
        F.col(host_col).alias("host"),
        template.alias("_tpl"),
        F.md5(F.col(text_col)).alias("_th"),
    )
    n = F.count(F.lit(1))
    n_tpl = F.countDistinct(F.col("_tpl"))
    n_txt = F.countDistinct(F.col("_th"))
    agg = per.groupBy("host").agg(
        n.alias("n_urls"),
        n_tpl.alias("n_templates"),
        n_txt.alias("n_distinct_texts"),
    )
    upt = F.round(F.col("n_urls") / F.col("n_templates"), 4)
    dup = F.round(
        F.lit(1.0) - F.col("n_distinct_texts") / F.col("n_urls"), 4
    )
    return agg.select(
        "host",
        "n_urls",
        "n_templates",
        "n_distinct_texts",
        upt.alias("urls_per_template"),
        dup.alias("dup_content_ratio"),
        (
            (F.col("n_urls") >= min_urls)
            & (upt > max_urls_per_template)
            & (dup > max_dup_ratio)
        ).alias("trap_suspect"),
    )


def url_path_template(url: Column) -> Column:
    """Digit-normalized path template of a URL (scheme/host and
    query/fragment stripped, digit runs → 'N') — the trap-space collapse
    unit shared by host_trap_stats, template_trap_stats and the in-crawl
    template screen. /cal/2024/03/17 and /cal/2025/01/02 are the SAME
    template."""
    path = F.regexp_replace(
        F.regexp_replace(url, "^[a-z]+://[^/]*", ""), "[?#].*$", ""
    )
    return F.regexp_replace(path, "[0-9]+", "N")


def template_trap_stats(
    df: DataFrame,
    host_col: str,
    url_col: str,
    text_col: str,
    min_urls: int = 20,
    max_dup_ratio: float = 0.5,
) -> DataFrame:
    """Trap detection at the (host, path-template) grain — the unit the
    LIVE crawl screens on. The same-domain gate means a calendar/faceted
    trap usually lives on the host being crawled, so blocking the whole
    host would kill the crawl; blocking its exploding TEMPLATE only
    removes the trap's URL space. ``trap_suspect`` fires when one template
    minted ≥ ``min_urls`` URLs whose contents are ≥ ``max_dup_ratio``
    duplicate. The content fingerprint gets the SAME digit-collapse as the
    URL template before hashing: trap pages echo their own URL/date into
    the title and body ("Calendar — 2024/03/17"), so raw md5 would see
    every page as unique; with digit runs normalized, pages that differ
    only by their calendar position collapse to one fingerprint while
    genuinely distinct articles stay distinct. Same scale shape as
    host_trap_stats: projections at scan speed, ONE (host, tpl)-keyed
    groupBy, text never shuffles — only its md5. Feed the flagged pairs to
    ``run_round(blocked_templates=...)``."""
    per = df.select(
        F.col(host_col).alias("host"),
        url_path_template(F.col(url_col)).alias("tpl"),
        F.md5(F.regexp_replace(F.col(text_col), "[0-9]+", "N")).alias("_th"),
    )
    agg = per.groupBy("host", "tpl").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(F.col("_th")).alias("n_distinct_texts"),
    )
    dup = F.round(F.lit(1.0) - F.col("n_distinct_texts") / F.col("n_urls"), 4)
    return agg.select(
        "host",
        "tpl",
        "n_urls",
        "n_distinct_texts",
        dup.alias("dup_content_ratio"),
        ((F.col("n_urls") >= min_urls) & (dup > max_dup_ratio)).alias(
            "trap_suspect"
        ),
    )


def template_blocklist_filter(
    candidates: DataFrame,
    url_col: str,
    host_col: str,
    blocked_templates: DataFrame,
) -> DataFrame:
    """Drop frontier candidates whose (host, digit-normalized template)
    pair is on the trap blocklist — a broadcast LEFT ANTI join, so the
    candidate stream is never exchanged and the (small, bounded-by-trap-
    count) blocklist ships to every task."""
    bl = F.broadcast(
        blocked_templates.select(
            F.col("host").alias("_bl_host"), F.col("tpl").alias("_bl_tpl")
        )
    )
    out = candidates.withColumn("_tpl", url_path_template(F.col(url_col)))
    out = out.join(
        bl,
        (F.col(host_col) == F.col("_bl_host")) & (F.col("_tpl") == F.col("_bl_tpl")),
        "left_anti",
    )
    return out.drop("_tpl")


def politeness_audit(
    visits: DataFrame,
    host_rules: Optional[DataFrame],
    default_delay: float,
    host_col: str = "host",
    ts_col: str = "sched_ts",
    order_col: str = "arrival_rank",
    bucket_size: int = 1 << 16,
    rules_host_col: str = "host",
    rules_delay_col: str = "crawl_delay",
) -> DataFrame:
    """Post-hoc politeness compliance audit of a visit schedule: per host,
    the minimum gap between consecutive visits, how many gaps undercut the
    host's crawl-delay, and the host's serial span — the report that proves
    (or disproves) a round's schedule honored robots crawl-delays, run over
    the schedule table instead of trusting the scheduler.

    ``order_col`` must be a dense unique numeric visit order consistent with
    ``ts_col`` per host (arrival_rank in this engine). Gaps come from a
    self-join on (host, rank+1) — rank via the skew-proof ``bucketed_rank``,
    so a hot host's 10^8-visit round never sorts in one window partition;
    the join is co-partitioned with the rank's own shuffle. Violations gate
    with a 1e-9 epsilon so an exact-delay schedule (gap == delay in the
    same double arithmetic) never flags.

    ``host_rules`` (optional) supplies per-host delays; name its columns
    with ``rules_host_col``/``rules_delay_col`` (aliased internally, so a
    renamed rules table works). Hosts without a rule use ``default_delay``.

    Output: (host, n_visits, crawl_delay, min_gap, violations, span_sec,
    ok) — single-visit hosts have NULL min_gap, zero violations, ok=true.
    """
    base = visits.select(
        F.col(host_col).alias("host"),
        F.col(ts_col).cast("double").alias("_ts"),
        F.col(order_col).alias("_o"),
    )
    ranked = bucketed_rank(base, "host", "_o", bucket_size=bucket_size, out_col="_r")
    nxt = ranked.select(
        "host", (F.col("_r") - 1).alias("_r"), F.col("_ts").alias("_ts_next")
    )
    gaps = ranked.join(nxt, ["host", "_r"]).select(
        "host", (F.col("_ts_next") - F.col("_ts")).alias("_gap")
    )
    if host_rules is not None:
        delays = F.broadcast(
            host_rules.select(
                F.col(rules_host_col).alias("host"),
                F.col(rules_delay_col).alias("crawl_delay"),
            )
        )
    else:
        delays = None
    per_host = visits.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_visits"),
        (F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double"))).alias("span_sec"),
    )
    if delays is not None:
        per_host = per_host.join(delays, "host", "left")
        per_host = per_host.withColumn(
            "crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(default_delay))
        )
    else:
        per_host = per_host.withColumn("crawl_delay", F.lit(default_delay))
    gagg = (
        gaps.join(F.broadcast(per_host.select("host", "crawl_delay")), "host")
        .groupBy("host")
        .agg(
            F.min("_gap").alias("min_gap"),
            F.sum(
                F.when(F.col("_gap") < F.col("crawl_delay") - F.lit(1e-9), 1).otherwise(0)
            ).alias("violations"),
        )
    )
    out = per_host.join(gagg, "host", "left")
    return out.select(
        "host",
        "n_visits",
        "crawl_delay",
        F.round("min_gap", 4).alias("min_gap"),
        F.coalesce(F.col("violations"), F.lit(0)).cast("bigint").alias("violations"),
        F.round("span_sec", 4).alias("span_sec"),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("ok"),
    )


def sitemap_coverage(
    declared: DataFrame,
    visited: DataFrame,
    declared_url_col: str = "seed_url",
    visited_url_col: str = "url",
) -> DataFrame:
    """Per-host sitemap-vs-crawl coverage: of the URLs a host DECLARES in
    its sitemaps, how many did the crawl actually visit — and how much did
    the crawl fetch that the host never declared. The closing report of the
    sitemap story (sitemaps_from_robots → seeds_from_sitemaps → crawl →
    THIS): low coverage means budget/depth cut declared content (raise
    priority for that host), a large undeclared surplus means the crawl is
    wandering generated spaces the publisher doesn't even index (tighten
    hygiene/templates for that host).

    One full-outer equi-join on the url (co-partitioned; urls unique per
    side after the distinct) and one groupBy host with map-side combine;
    coverage is a single ROUND(double/double) expression.

    Output: (host, n_declared, n_visited, n_both, n_missed, n_extra,
    coverage) — ``coverage`` NULL for hosts that declared nothing.
    """
    d = declared.select(F.col(declared_url_col).alias("u")).distinct().withColumn(
        "_d", F.lit(1)
    )
    v = visited.select(F.col(visited_url_col).alias("u")).distinct().withColumn(
        "_v", F.lit(1)
    )
    j = d.join(v, "u", "full_outer")
    host = F.regexp_extract(F.col("u"), "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    agg = j.groupBy(host.alias("host")).agg(
        F.sum(F.coalesce(F.col("_d"), F.lit(0))).alias("n_declared"),
        F.sum(F.coalesce(F.col("_v"), F.lit(0))).alias("n_visited"),
        F.sum(
            F.when(F.col("_d").isNotNull() & F.col("_v").isNotNull(), 1).otherwise(0)
        ).alias("n_both"),
        F.sum(
            F.when(F.col("_d").isNotNull() & F.col("_v").isNull(), 1).otherwise(0)
        ).alias("n_missed"),
        F.sum(
            F.when(F.col("_d").isNull() & F.col("_v").isNotNull(), 1).otherwise(0)
        ).alias("n_extra"),
    )
    coverage = F.when(
        F.col("n_declared") > 0,
        F.round(F.col("n_both").cast("double") / F.col("n_declared"), 4),
    )
    return agg.select(
        "host", "n_declared", "n_visited", "n_both", "n_missed", "n_extra",
        coverage.alias("coverage"),
    )
