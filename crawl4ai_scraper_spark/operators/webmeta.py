"""Page-metadata crawl hygiene: rel=canonical collapse and meta-robots
gating over the stored pages table.

The reference scraper has neither (crawler.py consumes crawl4ai's markdown/
links result only) — these are the additive hygiene passes a production
crawl runs between fetch and indexing:

* ``rel=canonical`` groups are PUBLISHER-DECLARED duplicate clusters
  (print views, tracking-parameter URL variants, m.-mirrors). Collapsing
  them is cheaper and earlier than content dedup — no second fetch, no
  text hashing — and catches pairs whose extracted text differs (ads,
  timestamps) so hash dedup would miss them.
* ``<meta name=robots>`` noindex/nofollow is the in-page half of the
  politeness contract (robots.txt is the out-of-band half, handled in
  plans/politeness.py): noindex pages must not be indexed/exported,
  nofollow pages contribute no outlinks to the frontier.

Both flags come out of ONE narrow Arrow pass over (url, html) — the html
column never enters a shuffle; downstream operators see only the small
metadata rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_META_SCHEMA = "url string, canonical string, noindex boolean, nofollow boolean"


def _extract_meta_rows(it):
    import pandas as pd

    from crawl4ai_scraper_spark.kernel.htmlkit import decode_html, page_meta_fields

    for pdf in it:
        urls, canon, noidx, nofol = [], [], [], []
        for url, html in zip(pdf["url"], pdf["html"]):
            c, ni, nf = page_meta_fields(decode_html(html), url)
            urls.append(url)
            canon.append(c if c else url)  # absent declaration = self-canonical
            noidx.append(ni)
            nofol.append(nf)
        yield pd.DataFrame(
            {"url": urls, "canonical": canon, "noindex": noidx, "nofollow": nofol}
        )


def page_meta(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, canonical, noindex, nofollow) per page — one Arrow batch pass,
    html never shuffled."""
    return pages.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    ).mapInPandas(_extract_meta_rows, PAGE_META_SCHEMA)


def canonical_collapse(meta: DataFrame) -> DataFrame:
    """Collapse canonical groups: every URL labeled with its group's
    SURVIVOR — the canonical target itself when it was crawled, else the
    lexicographically-first member (deterministic; the target may 404 or
    sit outside the crawl budget).

    Shape: one groupBy(canonical) whose min-struct prefers a self-canonical
    member (map-side combine, group keys ≈ distinct targets), then one
    co-partitioned join back — the standard first-appender dedup shape, so
    a hot canonical target (every product variant pointing at one page)
    collapses map-side instead of skewing a reducer.

    Returns (url, canonical, survivor_url, is_survivor)."""
    survivors = (
        meta.groupBy("canonical")
        .agg(
            F.min(
                F.struct((F.col("url") != F.col("canonical")), F.col("url"))
            ).alias("pick")
        )
        .select("canonical", F.col("pick.url").alias("survivor_url"))
    )
    return meta.select("url", "canonical").join(survivors, "canonical").select(
        "url",
        "canonical",
        "survivor_url",
        (F.col("url") == F.col("survivor_url")).alias("is_survivor"),
    )


def robots_meta_gate(meta: DataFrame) -> DataFrame:
    """Split read-out of the meta-robots directives: (url, indexable,
    followable) — the predicates the exporter (noindex) and the frontier
    expansion (nofollow) consume."""
    return meta.select(
        "url",
        (~F.col("noindex")).alias("indexable"),
        (~F.col("nofollow")).alias("followable"),
    )


def index_hygiene(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """The one-stop page-hygiene view an exporter consults: canonical-group
    survivor labels + meta-robots gates per URL, from ONE Arrow metadata
    pass over (url, html) followed by the survivor groupBy and a co-keyed
    url join. A page reaches the index/export iff ``is_survivor AND
    indexable``; the frontier consults ``followable`` before expanding its
    outlinks. Returns (url, survivor_url, is_survivor, indexable,
    followable)."""
    meta = page_meta(pages, url_col, html_col).localCheckpoint(eager=False)
    collapsed = canonical_collapse(meta)
    gate = robots_meta_gate(meta)
    return collapsed.join(gate, "url").select(
        "url", "survivor_url", "is_survivor", "indexable", "followable"
    )


def exportable_pages(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Filter helper over index_hygiene: the URLs that should reach the
    markdown/WET export — canonical survivors that are not noindex'd."""
    h = index_hygiene(pages, url_col, html_col)
    return h.filter(F.col("is_survivor") & F.col("indexable")).select("url")


TABLE_SCHEMA = "url string, table_idx int, row_idx int, cells array<string>"


def _extract_table_rows(it):
    import pandas as pd

    from crawl4ai_scraper_spark.kernel.htmlkit import page_tables

    for pdf in it:
        urls, t_idx, r_idx, cells = [], [], [], []
        for url, html in zip(pdf["url"], pdf["html"]):
            for ti, table in enumerate(page_tables(html)):
                for ri, row in enumerate(table):
                    urls.append(url)
                    t_idx.append(ti)
                    r_idx.append(ri)
                    cells.append(row)
        yield pd.DataFrame(
            {"url": urls, "table_idx": t_idx, "row_idx": r_idx, "cells": cells}
        )


def extract_tables(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Structured table scrape: every <table> grid of every page as
    (url, table_idx, row_idx, cells) rows — the price/spec/roster tables a
    scraping user targets, as relational rows instead of a text blob. ONE
    Arrow pass over (url, html) (html never shuffles); downstream pivots or
    header-keyed selects are plain DataFrame ops on the small cell rows."""
    return pages.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    ).mapInPandas(_extract_table_rows, TABLE_SCHEMA)


def url_template_cols(url: "F.Column"):
    """(host, template) column pair — the shared URL-generalization used by
    ``url_path_templates`` (trap mining) and ``template_dup_stats``
    (duplicate-content-by-template): path segments become ``{d}`` (all
    digits), ``{h}`` (>=8-char hex id), ``{a}`` (any other digit-bearing
    token) or stay literal; query string and fragment never enter."""
    host = F.regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(url, "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    tsegs = F.transform(
        segs,
        lambda x: F.when(x.rlike("^[0-9]+$"), F.lit("{d}"))
        .when(x.rlike("^[0-9a-f]{8,}$"), F.lit("{h}"))
        .when(x.rlike("[0-9]"), F.lit("{a}"))
        .otherwise(x),
    )
    template = F.concat(F.lit("/"), F.array_join(tsegs, "/"))
    return host, template


def url_path_templates(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 10,
) -> DataFrame:
    """URL template mining for crawler-trap / infinite-URL-space detection:
    generalize each URL's path segments (all-digits -> ``{d}``, long hex ids
    -> ``{h}``, any other digit-bearing token -> ``{a}``, pure words kept
    literally), then count distinct URLs per (host, template). A template
    that matches thousands of URLs on one host is a generated URL space —
    calendars, faceted search, session ids, print views — the pattern-level
    signal the per-URL hygiene screens (plans/politeness.py hygiene_flags:
    length / depth / param-count / path-loop) structurally cannot see,
    because every individual URL in the trap looks clean.

    The reference has no equivalent (its trap defense is max_pages +
    max_depth only, crawler.py); this is the corpus-level statistic a
    production frontier feeds back into scheduling: templates over
    ``min_urls`` get rate-limited or cut.

    Everything is native column math (regexp + array transform at scan
    speed) into ONE groupBy on (host, template) with map-side combine — a
    trap template with 10^8 URLs collapses to one row per input partition.
    Query strings and fragments never enter the template (a trap that
    varies only ``?page=N`` collapses via the path alone; param-name
    templating is the hygiene screen's param-count job).

    Output: (host, template, n_urls, example_url, trap_suspect), one row
    per (host, template); ``example_url`` = lexicographic min, deterministic.
    """
    host, template = url_template_cols(F.col(url_col))
    return (
        urls.select(
            host.alias("host"),
            template.alias("template"),
            F.col(url_col).alias("u"),
        )
        .groupBy("host", "template")
        .agg(
            F.countDistinct("u").alias("n_urls"),
            F.min("u").alias("example_url"),
        )
        .withColumn("trap_suspect", F.col("n_urls") >= F.lit(min_urls))
    )


def template_dup_stats(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_urls: int = 5,
) -> DataFrame:
    """Duplicate-content rate per URL template — the follow-up question to
    ``url_path_templates``: a template with many URLs is only a PROBLEM if
    those URLs serve the same content (calendar pages, session-id mirrors,
    print views). Templates with many urls AND high text duplication are
    "generated spaces": cut them from the frontier and the corpus loses
    nothing. Templates with many urls but distinct content (real article
    ids) must NOT be cut — this operator is what tells them apart.

    Cost: the text column never shuffles — only its md5 does; one groupBy
    on (host, template) with two distinct-counts (Spark expands the
    multi-distinct into an Expand at 2× the hash rows, still map-side
    combined and uniform).

    ``dup_ratio`` = 1 - n_texts/n_urls as ONE double expression (identical
    in both engines); ``generated_suspect`` gates on integers only:
    n_urls >= min_urls AND 2*n_texts <= n_urls (over half the urls are
    content-duplicates).

    Output: (host, template, n_urls, n_texts, dup_ratio, generated_suspect).
    """
    host, template = url_template_cols(F.col(url_col))
    base = pages.select(
        host.alias("host"),
        template.alias("template"),
        F.col(url_col).alias("u"),
        F.md5(F.col(text_col).cast("binary")).alias("th"),
    )
    agg = base.groupBy("host", "template").agg(
        F.countDistinct("u").alias("n_urls"),
        F.countDistinct("th").alias("n_texts"),
    )
    dup_ratio = F.round(
        F.lit(1.0) - F.col("n_texts").cast("double") / F.col("n_urls"), 4
    )
    return agg.select(
        "host",
        "template",
        "n_urls",
        "n_texts",
        dup_ratio.alias("dup_ratio"),
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & (F.col("n_texts") * 2 <= F.col("n_urls"))
        ).alias("generated_suspect"),
    )
