"""Temporal operators: as-of join and keep-latest dedup.

Spark has no native ASOF JOIN (DuckDB does — the contract oracle uses it);
the scalable composition is the union-sort-carry pattern:

    union(left tagged 0-payload, right tagged payload)
      → window over (key ORDER BY ts, is_left) carrying last non-null payload
      → filter to left rows

ONE shuffle on the join key, no range explosion, no per-row Python. The sort
inside each key partition is Spark's normal window sort. Hot keys: a single
user/host with millions of events sorts within one task — for that regime,
range-bucket the ts into coarse buckets, carry each bucket's closing payload
into the next (two passes), same as politeness.py's two-phase rank. The
simple form here is the right default: key cardinality ≫ executor count and
per-key row counts are bounded.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Optional[List[str]] = None,
) -> DataFrame:
    """Backward (inclusive) as-of join: each left row gains the payload of
    the latest right row with right.ts <= left.ts for the same key; left rows
    with no prior right row keep NULL payload. Matches DuckDB
    ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``.

    `payload` defaults to all right columns except key/ts. The right side
    must be unique per (key, ts) — pre-aggregate if it is not, or the carried
    row is ill-defined (DuckDB ASOF has the same requirement).
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (key, right_ts)]
    for reserved in ("_pack", "_is_left", "_ts"):
        if reserved in left.columns:
            raise ValueError(f"asof_join: left column name {reserved!r} is reserved")

    # The whole right row rides in ONE struct; left rows carry a NULL struct.
    # last(_pack, ignorenulls) then means "latest RIGHT row" regardless of
    # column-name overlap with the left side, and a legitimately-NULL payload
    # FIELD inside a matched right row is preserved (DuckDB ASOF semantics) —
    # per-column last() would both read left values on name collision and
    # skip NULL payloads back to a stale older row.
    pack = F.struct(
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(c).alias(c) for c in payload],
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        pack.alias("_pack"),
    )
    pack_type = rhs.schema["_pack"].dataType
    lhs = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(pack_type).alias("_pack"),
    )
    lhs_types = {f.name: f.dataType for f in lhs.schema.fields}
    for c, t in lhs_types.items():
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(t))
    both = lhs.select(*sorted(lhs.columns)).unionByName(rhs.select(*sorted(rhs.columns)))

    # right rows sort BEFORE left rows at equal ts (_is_left asc) → inclusive.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *[c for c in left.columns],
        F.col("_is_left"),
        F.last("_pack", ignorenulls=True).over(w).alias("_carried"),
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .select(
            *[c for c in left.columns],
            F.col("_carried._asof_ts").alias("asof_ts"),
            *[F.col(f"_carried.{c}").alias(f"asof_{c}") for c in payload],
        )
    )


def latest_revision(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """Keep-latest dedup: one row per key — the max (ts, tiebreak) revision —
    via a single max-struct groupBy (map-side combine, no window, no second
    pass; the struct's leading fields give lexicographic argmax). This is the
    snapshot-collapse step of a recrawled corpus: many (url, warc_ts)
    revisions → newest page wins."""
    others = [c for c in df.columns if c != key]
    packed = df.groupBy(key).agg(
        F.max(F.struct(F.col(ts_col), F.col(tiebreak),
                       *[F.col(c) for c in others if c not in (ts_col, tiebreak)])).alias("r")
    )
    return packed.select(key, *[F.col(f"r.{c}").alias(c) for c in others])


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key: str,
    content_col: str,
) -> DataFrame:
    """Recrawl snapshot diff: classify every URL across two crawl snapshots
    as ``added`` (new only), ``removed`` (old only), ``changed`` (content
    hash differs), or ``same``. The scheduling signal for incremental
    recrawls — changed/added urls feed the next frontier with priority.

    One full-outer equi-join on the key, hash comparison on md5(content):
    co-partitioned by the join key, no skew (urls are unique per side), and
    the content column never shuffles — only its 32-char hash does."""
    o = old.select(
        F.col(key), F.md5(F.col(content_col).cast("binary")).alias("_oh")
    )
    n = new.select(
        F.col(key), F.md5(F.col(content_col).cast("binary")).alias("_nh")
    )
    joined = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return joined.select(F.col(key), status.alias("status"))


def recrawl_stats(
    history: DataFrame,
    key: str,
    ts_col: str,
    content_col: str,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Per-URL change-rate estimation from revisit history — the scheduling
    input of an incremental crawler (Cho & Garcia-Molina-style: how often a
    page changed across the times we actually observed it decides how soon to
    revisit). Input: one row per (url, fetch ts) with the fetched content (or
    its hash); output per url:

      n_visits         observations
      n_changes        adjacent observation pairs whose content hash differs
      change_ratio     n_changes / (n_visits - 1), 4dp (0 for single visits)
      changes_per_day  n_changes · 86400 / observed-span-seconds, 6dp

    ONE shuffle on the key: the lag window and the groupBy share the hash
    partitioning, and per-key history (revisits of one URL) is naturally
    short, so the window sort can't skew. Content never shuffles — rows are
    reduced to (key, ts, md5) before the exchange. ``changes_per_day`` ranks
    directly as revisit priority (feed it to run_crawl's priority mode)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    slim = history.select(
        F.col(key),
        F.col(ts_col),
        *( [F.col(tiebreak)] if tiebreak and tiebreak != ts_col else [] ),
        F.md5(F.col(content_col).cast("binary")).alias("_h"),
    )
    changed = (
        F.lag("_h").over(w).isNotNull() & (F.lag("_h").over(w) != F.col("_h"))
    ).cast("int")
    obs = slim.select(
        F.col(key),
        # timestamp → whole epoch seconds, timezone-free (works on NTZ
        # columns; equals the oracle's floor(epoch(ts)) for positive epochs)
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            f"date_trunc('second', `{ts_col}`))"  # backticks: non-identifier names
        ).alias("_es"),
        changed.alias("_chg"),
    )
    n_visits = F.count(F.lit(1))
    n_changes = F.sum("_chg").cast("bigint")
    span_s = F.greatest(F.max("_es") - F.min("_es"), F.lit(1))
    return obs.groupBy(key).agg(
        n_visits.alias("n_visits"),
        n_changes.alias("n_changes"),
        F.round(
            n_changes.cast("double") / F.greatest(n_visits - 1, F.lit(1)), 4
        ).alias("change_ratio"),
        F.round(n_changes.cast("double") * 86400.0 / span_s, 6).alias("changes_per_day"),
    )


def recrawl_priorities(
    history: DataFrame,
    key: str,
    ts_col: str,
    content_col: str,
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """recrawl_stats projected to the (url, priority) signal shape the
    frontier's priority mode consumes (run_crawl(priority_col=<this frame>,
    cfg.frontier_order="priority")): pages that changed more often per
    observed day are re-fetched first. Persist the result before the crawl —
    the round loop consumes it once per round."""
    stats = recrawl_stats(history, key, ts_col, content_col, tiebreak)
    return stats.select(F.col(key).alias("url"), F.col("changes_per_day").alias("priority"))


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 600,
) -> DataFrame:
    """Range (interval-containment) join without a nested-loop: match every
    point row to every interval with ``start <= ts < end``.

    Spark's optimizer turns a bare non-equi join condition into
    BroadcastNestedLoopJoin (or worse, CartesianProduct) — O(points ×
    intervals). The scalable composition materializes an EQUI key both
    sides share: time buckets of ``bucket_seconds``. Each interval explodes
    to the ≤ (len/bucket)+1 buckets it overlaps (bounded by the interval
    length, NOT the data size); each point computes its single bucket as a
    projection. The join is then a plain hash/sort-merge equi-join on
    ``bucket`` with the range predicate as a post-filter, and every
    qualifying (point, interval) pair is emitted exactly once — a point
    lives in exactly one bucket, so no distinct is needed.

    Pick ``bucket_seconds`` near the typical interval length: too small
    inflates the interval explosion, too large degrades bucket selectivity.
    Both are linear knobs; there is no quadratic regime.

    Output: all columns of ``points`` + all columns of ``intervals``
    (callers project). Epoch math is integral (unix seconds) so bucket
    assignment is engine-exact.
    """
    p = points.withColumn(
        "_bkt", (F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
    )
    i = intervals.withColumn(
        "_bkts",
        F.sequence(
            (F.unix_timestamp(F.col(start_col)) / bucket_seconds).cast("long"),
            # unix_timestamp truncates sub-second parts, so the exclusive
            # end maps to its containing bucket unconditionally — at worst
            # one extra bucket per interval, and the range post-filter
            # discards any non-match; pair exactness is unaffected because
            # a point lives in exactly one bucket.
            (F.unix_timestamp(F.col(end_col)) / bucket_seconds).cast("long"),
        ),
    ).withColumn("_bkt", F.explode("_bkts")).drop("_bkts")
    return (
        p.join(i, "_bkt")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bkt")
    )


def scd2_history(
    revs: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 history from a revision stream: each
    revision of a URL becomes an interval row (valid_from, valid_to) with
    the open-ended current revision flagged — the warehouse layout that lets
    any downstream query ask "what did this URL serve AT time t" with a
    BETWEEN predicate instead of replaying the revision log.

    ONE key-partitioned lead() window — a single exchange on the url key,
    no joins, no state; ties on the timestamp are ordered by ``tiebreak`` so
    the intervals are deterministic.
    Returns (key, tiebreak, valid_from, valid_to, is_current)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    nxt = F.lead(ts_col).over(w)
    return revs.select(
        key,
        tiebreak,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def revision_drift(
    df: DataFrame,
    key: str,
    ts_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Content drift between CONSECUTIVE revisions of the same URL: the
    shingle-set Jaccard of each revision against the next one. This is the
    magnitude signal behind recrawl scheduling — ``recrawl_stats`` counts
    HOW OFTEN a page's hash flips, this measures HOW MUCH the content moves
    per flip (a news front page rewrites wholesale, a docs page edits one
    paragraph), and the two together calibrate revisit frequency and
    "re-extract vs keep" decisions in an incremental crawl.

    One shuffle: the lead() window partitions by the url key (per-url
    revision counts are small and bounded by crawl policy, so no skewed
    window partitions), and the shingle sets ride the SAME shuffle — no
    self-join of the revision table, no second pass over the text.

    Output: (<key>, ts_prev, ts_next, jaccard 4dp, changed) — one row per
    consecutive revision pair; single-revision urls emit nothing. ``changed``
    is set-based (jaccard < 1), byte-identical texts are never "changed".
    """
    from crawl4ai_scraper_spark.operators.dedup import shingles

    w = Window.partitionBy(key).orderBy(ts_col)
    base = df.select(
        F.col(key),
        F.col(ts_col),
        F.array_distinct(shingles(F.col(text_col), k)).alias("_sh"),
    )
    nxt = base.select(
        F.col(key),
        F.col(ts_col).alias("ts_prev"),
        F.lead(ts_col).over(w).alias("ts_next"),
        F.col("_sh"),
        F.lead("_sh").over(w).alias("_sh_next"),
    ).filter(F.col("ts_next").isNotNull())
    j = (
        F.size(F.array_intersect("_sh", "_sh_next")).cast("double")
        / F.size(F.array_union("_sh", "_sh_next"))
    )
    return nxt.select(
        F.col(key),
        "ts_prev",
        "ts_next",
        F.round(j, 4).alias("jaccard"),
        (j < 1.0).alias("changed"),
    )
