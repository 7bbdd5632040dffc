"""One BFS round as a DataFrame plan (SURVEY §3 "Spark lifecycle equivalent").

    frontier_r ─⋈ pages (pbucket+url equi-join, runtime-bloom pushed)─► fetched
      ─ budget truncation (exact mid-level max_pages cut, O-28) ─► visits
      ─ mapInPandas expand_links (render + canon + domain, one Arrow pass)
      ─ native filters (same-domain O-13, robots O-19)
      ─ first-appender min(struct) agg (O-17/O-25 — map-side combine, so the
        hot keys every page links to, like "/", never skew a shuffle)
      ─ bloom pre-split + EXACT left-anti join vs enqueued (O-16)
      ─ two-phase global rank → frontier_{r+1} queue order (O-24)

Parity invariants with the reference loop (crawler.py:179-238):
* ``matched`` requires fetch success — a 404 never counts toward max_pages
  (the reference's discovered.add sits inside ``if result.success``).
* The budget is checked per dequeue, so a level can be cut mid-way: the stop
  position is the arrival_rank of the (max_pages - discovered_so_far)-th
  successful match, found with TakeOrderedAndProject (orderBy+limit), not a
  single-partition window. Visits AND expansions beyond it are discarded.
* Within-round dedup keeps the earliest (parent_seq, link_pos) appearance —
  "first appender wins" — and the anti-join target is the ever-enqueued set
  (≡ visited ∪ to_visit: the queue never holds duplicates, so membership in
  either is exactly the reference's double ``not in`` test, crawler.py:223).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.config import CrawlJobConfig
from crawl4ai_scraper_spark.functions.udfs import (
    EXPANDED_LINKS_SCHEMA,
    expand_links,
    include_exclude_predicate,
)
from crawl4ai_scraper_spark.plans.bloom import BloomFilter, might_contain_col
from crawl4ai_scraper_spark.plans.politeness import robots_filter
from crawl4ai_scraper_spark.plans.ranking import global_rank
from crawl4ai_scraper_spark.sources.pages import with_pbucket

FRONTIER_SCHEMA = "url string, host string, depth int, arrival_rank long"


@dataclass
class RoundResult:
    visits: DataFrame          # url, host, depth, seq, success, matched
    new_frontier: DataFrame    # url, host, depth, arrival_rank
    new_edges: DataFrame       # parent_url, child_url, link_pos
    counts: Dict[str, int] = field(default_factory=dict)
    truncated: bool = False
    lineage: Optional[DataFrame] = None


def _partition_counts(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts → lineage rows (north_star: per-partition
    frontier-in / fetched / deduped / frontier-out)."""
    return df.groupBy(F.spark_partition_id().alias("partition")).agg(
        F.count(F.lit(1)).alias("rows")
    ).select(F.lit(stage).alias("stage"), "partition", "rows")


def run_round(
    pages: DataFrame,
    frontier: DataFrame,
    enqueued: DataFrame,
    cfg: CrawlJobConfig,
    seed_domain: str,
    seq_base: int,
    discovered_so_far: int,
    host_rules: Optional[DataFrame] = None,
    bloom: Optional[BloomFilter] = None,
    n_buckets: int = 32,
    priority_col: Optional[Callable[[DataFrame], Column]] = None,
    frontier_count: Optional[int] = None,  # tracked by the driver — saves a job
) -> RoundResult:
    # ---- fetch join (O-4/O-18): bucket-pruned needle-in-haystack lookup ----
    fr = with_pbucket(frontier, n_buckets)
    page_side = pages.select("pbucket", "url", "html")  # column pruning: never warc_ts/text here
    fetched = fr.join(page_side, ["pbucket", "url"], "left").drop("pbucket")

    matched_pred = include_exclude_predicate(F.col("url"), cfg.patterns, cfg.exclude_patterns)
    fetched = (
        fetched.withColumn("success", F.col("html").isNotNull())
        .withColumn("matched", F.col("success") & matched_pred)
    )
    fetched = fetched.persist()

    # ---- exact mid-level budget truncation (O-28) ----
    remaining = cfg.max_pages - discovered_so_far
    matched_count = fetched.filter("matched").count()
    truncated = matched_count >= remaining
    if truncated:
        stop = (
            fetched.filter("matched")
            .select("arrival_rank")
            .orderBy("arrival_rank")
            .limit(remaining)
            .agg(F.max("arrival_rank"))
            .collect()[0][0]
        )
        fetched = fetched.filter(F.col("arrival_rank") <= stop)

    visits = fetched.withColumn("seq", (F.lit(seq_base) + F.col("arrival_rank")).cast("long"))

    # ---- link expansion (O-9 canon + O-13 domain gate inside one Arrow pass) ----
    to_expand = visits.filter(F.col("success") & (F.col("depth") < F.lit(cfg.max_depth))).select(
        "url", "seq", "depth", "html"
    )
    candidates = to_expand.mapInPandas(expand_links, EXPANDED_LINKS_SCHEMA)
    if not cfg.include_external:
        candidates = candidates.filter(F.col("child_domain") == F.lit(seed_domain))
    candidates = robots_filter(candidates, host_rules)

    # ---- first-appender-wins (O-17/O-25): min(struct) keeps the earliest
    # (parent_seq, link_pos); partial aggregation combines hot children
    # map-side, so nav targets linked from every page don't skew the shuffle.
    first = (
        candidates.groupBy("child_url")
        .agg(
            F.min(
                F.struct("parent_seq", "link_pos", "parent_depth", "parent_url", "child_host")
            ).alias("f")
        )
        .select("child_url", "f.*")
    )

    # ---- URL-seen dedup (O-16): bloom pre-split, exact anti-join decides ----
    seen = enqueued.select(F.col("url").alias("child_url"))
    if bloom is not None:
        probed = first.withColumn("maybe_seen", might_contain_col(first, bloom, "child_url"))
        probed = probed.persist()
        definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        needs_check = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        survivors = needs_check.join(seen, "child_url", "left_anti").unionByName(definitely_new)
    else:
        survivors = first.join(seen, "child_url", "left_anti")

    # ---- next-round queue order (O-24): two-phase global rank, FIFO by
    # (parent's global seq, in-page link position); "priority" mode (our
    # extension) pre-orders by a caller-supplied column.
    next_rows = survivors.select(
        F.col("child_url").alias("url"),
        F.col("child_host").alias("host"),
        (F.col("parent_depth") + 1).cast("int").alias("depth"),
        "parent_seq",
        "link_pos",
        F.col("parent_url"),
    )
    if cfg.frontier_order == "priority" and priority_col is not None:
        next_rows = next_rows.withColumn("neg_priority", -priority_col(next_rows))
        order_cols = ["neg_priority", "parent_seq", "link_pos"]
    else:
        order_cols = ["parent_seq", "link_pos"]
    ranked = global_rank(next_rows, order_cols, "arrival_rank").persist()

    new_edges = ranked.select("parent_url", F.col("url").alias("child_url"), "link_pos")
    new_frontier = ranked.select("url", "host", "depth", "arrival_rank")

    # Counts come only from persisted/cached frames — recounting ``candidates``
    # would re-run the whole Arrow expansion pass, so dedup attrition is
    # reported per-partition in lineage instead of as a scalar here. The
    # visited/fetched pair is ONE aggregation job over the persisted fetch.
    vrow = visits.agg(
        F.count(F.lit(1)).alias("v"), F.count(F.when(F.col("success"), 1)).alias("ok")
    ).collect()[0]
    counts = {
        "frontier_in": frontier_count if frontier_count is not None else frontier.count(),
        "visited": int(vrow["v"]),
        "fetched_ok": int(vrow["ok"]),
        "matched_new": min(matched_count, remaining),
        "frontier_out": new_frontier.count(),  # materializes the rank cache for the commits
    }

    lineage = (
        _partition_counts(frontier, "frontier_in")
        .unionByName(_partition_counts(visits.filter("success"), "fetched"))
        .unionByName(_partition_counts(ranked, "frontier_out"))
    )

    return RoundResult(
        visits=visits.select("url", "host", "depth", "seq", "success", "matched", "arrival_rank"),
        new_frontier=new_frontier,
        new_edges=new_edges,
        counts=counts,
        truncated=truncated,
        lineage=lineage,
    )
