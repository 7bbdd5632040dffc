"""Corpus mixing and budgeted selection — the data-recipe operators that sit
between filtering/dedup and tokenization in an LLM training pipeline.

The reference scraper stops at "write the pages out"
(/root/reference/crawler.py save step); these are the additive passes a
training-data build runs on the resulting corpus:

* ``corpus_mix_plan`` / ``corpus_mix_apply`` — hit a TARGET group mix
  (language, source, domain-bucket shares BY TOKEN VOLUME, the way public
  recipes state them) from whatever mix the crawl produced, by
  deterministic per-group down-sampling and — when a total output size is
  pinned — fractional-epoch UP-sampling (the "N epochs of Wikipedia"
  convention: rate 2.3 = every doc twice + a 0.3-rate third copy).
* ``token_budget_select`` — "best docs first until the token budget is
  spent": the quality-pruning-to-budget cut that turns a scored corpus
  plus a compute budget into the actual training subset.

Scale shapes: the plan is one map-side-combined groupBy over G groups
(languages/sources — tiny) joined to a G-row broadcast target table; the
apply is a broadcast plan join + md5-threshold projection at scan speed
(same ``sample_digest`` protocol as textops.hash_sample — repeatable,
engine/partitioning-independent). The budget cut reuses the two-phase
global-cumsum trick (packing.global_cumsum / politeness.bucketed_rank):
per-quality-bucket token sums → running offsets over BUCKET ids, local
window bounded per bucket — never a whole-corpus single-partition sort.

Parity: every keep/drop decision is integer math on md5 digests or IEEE
double comparisons whose operand order the DuckDB oracles replay exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 1/4096-granularity sampling steps — the repo-wide repeatable-slice
# protocol (textops.sample_digest compares 3 hex digits of md5).
_STEPS = 4096


def _digest_int(key: Column, salt: str) -> Column:
    """sample_digest as an INT in [0, 4096): first 3 hex digits of
    md5(salt:key). Integer compare (`< steps`) instead of the hex-string
    compare so per-group thresholds computed IN the plan table need no
    hex formatting (Spark hex() is uppercase, DuckDB's lowercase)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 3),
        16,
        10,
    ).cast("int")


def corpus_mix_plan(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    target: Dict[str, float],
    total_out: Optional[float] = None,
) -> DataFrame:
    """Per-group sampling plan to hit ``target`` shares by ``weight_col``
    volume (weights are token counts in the canonical use).

    With ``total_out=None`` the plan is DOWNSAMPLE-ONLY: the output total is
    the largest T such that every group can supply its share from existing
    data — T = min_g(W_g / t_g) — so the binding (most under-represented
    relative to target) group keeps everything and every other group is
    cut to match. With ``total_out`` pinned, rate_g = t_g·T / W_g may
    exceed 1: the integer part is full epochs (every row repeated), the
    remainder a deterministic fractional epoch.

    Rates are quantized to 1/4096 via floor (the sample_digest protocol's
    granularity), so ``corpus_mix_apply`` and the SQL oracle reproduce the
    exact same keep set. Groups absent from ``target`` get rate 0 (dropped
    — a recipe IS an allowlist); target shares are normalized over the
    provided groups.

    Returns one row per target group:
    (group, n_rows, weight, share, target_share, epochs, rate_steps,
    keep_rate) — keep_rate = epochs + rate_steps/4096 for display.
    """
    spark = df.sparkSession
    tsum = float(sum(target.values()))
    rows = [(k, float(v) / tsum) for k, v in sorted(target.items())]
    tgt = spark.createDataFrame(rows, f"{group_col} string, target_share double")

    w = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(weight_col).cast("long")).alias("weight"),
    )
    j = w.join(F.broadcast(tgt), group_col)
    # T: pinned, or the downsample-only feasibility bound min_g(W_g / t_g).
    if total_out is None:
        t_total = j.agg(
            F.min(F.col("weight").cast("double") / F.col("target_share")).alias("_t")
        )
    else:
        t_total = spark.range(1).select(F.lit(float(total_out)).alias("_t"))
    grand = w.agg(F.sum("weight").alias("_wall"))
    rate = (F.col("target_share") * F.col("_t")) / F.col("weight").cast("double")
    steps_total = F.floor(rate * _STEPS).cast("long")
    return (
        j.crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(grand))
        .select(
            group_col,
            "n_rows",
            "weight",
            F.round(F.col("weight").cast("double") / F.col("_wall"), 6).alias("share"),
            F.round("target_share", 6).alias("target_share"),
            # explicit floor: DuckDB CAST(double AS INT) rounds, Spark
            # truncates — floor-then-cast is the one portable spelling
            F.floor(steps_total / _STEPS).cast("int").alias("epochs"),
            (steps_total % _STEPS).cast("int").alias("rate_steps"),
            F.round(steps_total.cast("double") / _STEPS, 6).alias("keep_rate"),
        )
    )


def corpus_mix_apply(
    df: DataFrame,
    key_col: str,
    group_col: str,
    plan: DataFrame,
    salt: str = "mix1",
) -> DataFrame:
    """Materialize a ``corpus_mix_plan``: each row is kept ``epochs`` full
    copies plus one more iff its digest clears the group's fractional-epoch
    threshold. Output carries an ``epoch`` column (0-based copy index) so
    upsampled corpora stay row-distinct; pure downsampling always yields
    epoch 0 only.

    Shape: broadcast G-row plan join, then ONE explode over
    sequence(0, epochs) and a projected integer digest compare — scan
    speed, no shuffle, nothing collected. The digest is salted with the
    key only (not the epoch): the fractional copy selects the SAME
    deterministic row subset a plain hash_sample at that rate would,
    keeping mix slices nested across recipe revisions."""
    p = plan.select(group_col, "epochs", "rate_steps")
    keep = (F.col("epoch") < F.col("epochs")) | (
        _digest_int(F.col(key_col), salt) < F.col("rate_steps")
    )
    return (
        df.join(F.broadcast(p), group_col)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("epochs"))))
        .filter(keep)
        .drop("epochs", "rate_steps")
    )


def token_budget_select(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    quality_col: str,
    budget: int,
    quality_scale: int = 1_000_000,
) -> DataFrame:
    """Best-first selection under a token budget: documents ordered by
    (quality DESC, id ASC) are kept while the running token total is under
    ``budget``; the straddling document (the one the budget lands inside)
    is INCLUDED, matching the packing convention that a layout decision
    never splits mid-document here.

    Scale shape — the naive ``SUM(tokens) OVER (ORDER BY quality DESC)``
    is a whole-corpus single-partition sort; this is the two-phase
    global-cumsum instead: quality quantized to 1/quality_scale buckets,
    per-bucket token sums run through ONE tiny window over bucket IDS,
    then a per-bucket local window (rows per bucket bounded by the score
    distribution's granularity) adds the exclusive within-bucket cumsum.
    Ties inside a bucket order by exact quality then id — identical to the
    oracle's total order because bucketing is floor on the same doubles.

    Returns kept rows: (id, quality, n_tokens, cum_before).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(quality_col).cast("double").alias("quality"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).withColumn("_qb", F.floor(F.col("quality") * quality_scale).cast("long"))
    offsets = (
        base.groupBy("_qb")
        .agg(F.sum("n_tokens").alias("_s"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_s").over(
                    Window.orderBy(F.desc("_qb")).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_qb", "_off")
    )
    local = F.coalesce(
        F.sum("n_tokens").over(
            Window.partitionBy("_qb")
            .orderBy(F.desc("quality"), F.asc("id"))
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        base.join(offsets, "_qb")
        .withColumn("cum_before", (F.col("_off") + local).cast("long"))
        .filter(F.col("cum_before") < budget)
        .select("id", "quality", "n_tokens", "cum_before")
    )
