"""Ordered-sequence analytics over the event stream: funnels and cohort
retention.

The crawl/event side of the pipeline (sessionization, as-of joins, hopping
windows) answers "what happened when"; these answer "in what ORDER" — the
product-analytics pair every event warehouse ships:

- ``funnel``: how many users progressed view → click → purchase, where each
  step must happen STRICTLY AFTER the user's previous step. Naive form is a
  per-user ordered scan (single-partition sort at corpus scale); this one is
  k chained (equi-join on user + min-aggregate) rounds — every round
  re-uses the user_id partitioning, the event payload is never carried, and
  each round's state is one (user, ts) row per surviving user.
- ``cohort_retention``: users bucketed by their first-activity day, counted
  on each later activity day. Two user-keyed aggregates and one broadcast-
  sized join — day-offset math stays integral.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel progression: one row per user who completed at least
    step 1, with the timestamp of each step reached (NULL once the chain
    breaks). Step i+1 is the user's EARLIEST step-(i+1) event strictly
    after their step-i time — the standard strict-ordering funnel.

    Each round is an equi-join on ``user_col`` plus a min-aggregate; the
    surviving-user frame shrinks monotonically, so later rounds get cheaper
    and at scale every stage is co-partitioned on the same key. Output
    columns: (user, t1..tk)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = cur
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, F.col(f"t{i-1}").alias("_prev")), user_col)
            .filter(F.col(ts_col) > F.col("_prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
        cur = nxt.select(user_col, f"t{i}")
    return out


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel report: (stage_idx, stage, n_users) — users reaching each
    stage under strict ordering. Built on ``funnel``; counting t_i non-null
    over the per-user frame is one bounded aggregate."""
    per_user = funnel(events, steps, user_col, ts_col, type_col)
    counts = per_user.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for i, step in enumerate(steps, start=1):
        r = counts.select(
            F.lit(i).alias("stage_idx"),
            F.lit(step).alias("stage"),
            F.col(f"n{i}").alias("n_users"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-grain cohort retention: (cohort_day, day_offset, n_users) —
    users whose FIRST activity fell on cohort_day and who were active
    day_offset days later (offset 0 = the cohort's size).

    Shape: per-user first day (one user-keyed aggregate), distinct
    (user, day) activity (same key), join on user, integral datediff,
    bounded groupBy. cohort_day is rendered as an ISO string so the
    cross-engine comparison never depends on date dtype plumbing."""
    d = F.to_date(F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(d).alias("d0"))
    active = events.select(user_col, d.alias("d")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("d0")).cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts between consecutive events of
    the same user: (from_type, to_type, n_transitions).

    The per-user ordering runs inside a window PARTITIONED BY user — each
    partition is one user's bounded event list, never the corpus (the
    pathological all-events-one-user corpus needs the bucketed two-phase
    rank instead; web/event data keys on millions of users). ``id_col``
    breaks timestamp ties so the sequence — and therefore the counts — is
    deterministic in both engines."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def daily_volume_zscores(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Volume-anomaly screen: z-score of each (event_type, day) count
    against that type's daily history — the monitoring query a production
    ingest runs to catch a dead source or a crawler trap flooding one
    event class.

    All moments come from EXACT integer sums (daily counts are integers:
    Σx and Σx² are BIGINTs; variance = (Σx² − (Σx)²/n)/(n−1) evaluated in
    one fixed double expression), so the result is order-free and
    cross-engine exact — no STDDEV aggregate, whose floating accumulation
    order differs per engine. Two bounded groupBys (days × types, then
    types); the per-type stats frame broadcasts back onto the daily rows."""
    daily = events.groupBy(
        F.col(type_col).alias("etype"),
        F.date_format(F.to_date(F.col(ts_col)), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("etype").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    )
    joined = daily.join(F.broadcast(stats), "etype")
    mean = F.col("sum_n").cast("double") / F.col("n_days")
    var = (
        F.col("sum_sq").cast("double")
        - F.col("sum_n").cast("double") * F.col("sum_n") / F.col("n_days")
    ) / (F.col("n_days") - 1)
    return joined.select(
        F.col("etype").alias("event_type"),
        "day",
        "n",
        F.round(mean, 6).alias("mean_daily"),
        F.when(
            (F.col("n_days") > 1) & (var > 0),
            F.round((F.col("n") - mean) / F.sqrt(var), 6),
        ).alias("zscore"),
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-journeys input: one row per gap-based session with its ordered
    event-type path ('view>click>purchase'). Session boundaries are the
    repo-wide 30-minute-gap convention (sessionize_events); the in-session
    ordering is made deterministic by sorting collected (ts, id, type)
    structs — collect_list alone has no order guarantee across retries or
    engines. Per-session lists are bounded; nothing corpus-sized sorts."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    lag_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        lag_ts.isNull()
        | (F.col(ts_col) - lag_ts > F.expr(f"INTERVAL {gap_minutes} MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = events.withColumn("_sid", F.sum(is_new).over(run))
    return sess.groupBy(user_col, "_sid").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(ts_col, id_col, type_col))
                ),
                lambda s: s[type_col],
            ),
            ">",
        ).alias("path")
    )


def top_session_paths(
    events: DataFrame,
    k: int = 20,
    gap_minutes: int = 30,
    **kw,
) -> DataFrame:
    """The 'top user journeys' report: (path, n_sessions), most common
    first, full deterministic tiebreak (count DESC, path ASC), top-k as
    TakeOrderedAndProject. Path cardinality is bounded by observed journey
    diversity — the groupBy key space, not the event volume."""
    paths = session_paths(events, gap_minutes=gap_minutes, **kw)
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )
