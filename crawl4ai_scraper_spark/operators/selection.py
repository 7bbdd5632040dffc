"""DSIR-style importance resampling for training-data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023): fit
bag-of-hashed-ngram categorical distributions over B buckets on a TARGET
corpus (the distribution you want more of) and on the RAW corpus, score every
raw document with the log importance weight

    log w(x) = sum_{gram in x} [ ln p_target(bucket(gram)) - ln p_raw(bucket(gram)) ]

and resample with Gumbel-top-k (equivalently: weighted sampling without
replacement in weight space).

Scale shape (100 TB raw corpus):
* the gram stream (word unigrams + bigrams) is a flatMap off the scan — no
  shuffle, no UDF (split / transform / explode are native);
* each profile is a B-row aggregate with map-side combine — B is fixed
  (10^4-ish) regardless of corpus size, so the profile shuffle is O(B) per
  task and the result is kilobytes;
* scoring left-joins the two B-row profiles (hint-broadcast) into the gram
  stream and sums per doc — ONE uniform groupBy(doc_id) shuffle;
* selection is Gumbel-top-k via orderBy+limit (TakeOrderedAndProject — a
  per-partition heap + driver merge of k rows, never a global sort).

Cross-engine determinism (the contract oracle runs in DuckDB): bucket =
48-bit md5 prefix mod B (`conv(substr(md5(gram),1,12),16,10) % B` ↔
`CAST('0x' || substr(md5(gram),1,12) AS BIGINT) % B`); the per-gram log
ratio is rounded to 12dp and summed in DECIMAL(28,12) so the fold is
order-free — same discipline as textops.unigram_lm_scores.

Reference anchor: the reference engine has no data-selection stage (it stops
at scrape + clean, crawler.py:547-599); this module is part of the
training-data mandate layered on top (SURVEY §7 "beyond the reference").
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.operators.textops import ngrams_from_tokens, words

_MD5_48 = 281474976710656.0  # 2^48, the 12-hex-digit md5 prefix space


def gram_bucket(gram: Column, n_buckets: int) -> Column:
    """Hash a gram to a bucket id in [0, n_buckets): 48-bit md5 prefix mod B.

    md5 keeps the bucketing engine-reproducible (DuckDB oracle) AND uniform
    even when one host/template dominates the corpus — the same
    hot-key-proofing argument as the url xxhash64 keys in plans/frontier.
    """
    h = F.conv(F.substring(F.md5(gram), 1, 12), 16, 10).cast("long")
    return h % F.lit(n_buckets)


def gram_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) rows: word unigrams + bigrams, duplicates KEPT (DSIR scores
    are count-weighted). Tokens are materialized in a separate select before
    the generator — see ngrams_from_tokens' O(words^2) warning."""
    toks = df.select(F.col(id_col), words(F.col(text_col)).alias("_w"))
    grams = toks.select(
        id_col,
        F.concat(F.col("_w"), ngrams_from_tokens(F.col("_w"), 2)).alias("_g"),
    )
    return grams.select(id_col, F.explode("_g").alias("gram"))


def dsir_profile(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int = 4096
) -> DataFrame:
    """Bag-of-hashed-ngram bucket counts: (bucket, cnt) with at most B rows.

    One explode (flatMap, no shuffle) + one O(B)-key groupBy with map-side
    combine; the output is broadcastable at any corpus size.
    """
    g = gram_stream(df, text_col, id_col)
    return (
        g.select(gram_bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _profile_total(profile: DataFrame) -> int:
    row = profile.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("t")).collect()[0]
    return int(row["t"])  # scalar action — never a data-row collect


def dsir_log_weights(
    raw: DataFrame,
    text_col: str,
    id_col: str,
    target_profile: DataFrame,
    raw_profile: DataFrame,
    n_buckets: int = 4096,
    totals: Optional[Tuple[int, int]] = None,
) -> DataFrame:
    """Per-raw-doc DSIR log importance weight.

    Returns (id, n_grams, log_weight): log_weight = Σ_gram
    [ln p_t(bucket) − ln p_r(bucket)], add-one smoothed over B buckets, each
    per-gram term rounded to 12dp and summed in DECIMAL(28,12) (order-free),
    the total rounded to 6dp. ``totals`` = (target_total, raw_total) skips
    the two scalar recounts when the caller already has them.
    """
    if totals is None:
        # each profile is consumed twice (scalar total + scoring join). A
        # profile is ≤ B rows (model-sized, like k-means centroids), so
        # collect it ONCE, total it driver-side, and rebuild a local frame
        # for the broadcast join — one job per profile, nothing left cached
        # for the session (the r2 ADVICE persist-leak).
        spark = raw.sparkSession
        t_rows = [(int(r["bucket"]), int(r["cnt"]))
                  for r in target_profile.select("bucket", "cnt").collect()]
        r_rows = [(int(r["bucket"]), int(r["cnt"]))
                  for r in raw_profile.select("bucket", "cnt").collect()]
        t_tot, r_tot = sum(c for _, c in t_rows), sum(c for _, c in r_rows)
        schema = "bucket long, cnt long"
        target_profile = spark.createDataFrame(t_rows, schema)
        raw_profile = spark.createDataFrame(r_rows, schema)
    else:
        t_tot, r_tot = totals

    tp = F.broadcast(
        target_profile.select(F.col("bucket"), F.col("cnt").alias("t_cnt")))
    rp = F.broadcast(
        raw_profile.select(F.col("bucket"), F.col("cnt").alias("r_cnt")))

    g = gram_stream(raw, text_col, id_col).select(
        id_col, gram_bucket(F.col("gram"), n_buckets).alias("bucket")
    )
    scored = (
        g.join(tp, "bucket", "left")
        .join(rp, "bucket", "left")
        .select(
            id_col,
            F.round(
                F.log((F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(1.0))
                      / F.lit(float(t_tot + n_buckets)))
                - F.log((F.coalesce(F.col("r_cnt"), F.lit(0)) + F.lit(1.0))
                        / F.lit(float(r_tot + n_buckets))),
                12,
            ).cast("decimal(28,12)").alias("_lr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.round(F.sum("_lr").cast("double"), 6).alias("log_weight"),
    )


def dsir_gumbel_key(log_weight: Column, id_col: Column, salt: str = "g1") -> Column:
    """Gumbel perturbation key: log_weight + G where G = -ln(-ln(u)) and
    u = (48-bit md5(salt:id) + 0.5) / 2^48 — engine/run/partitioning stable
    (same digest scheme as textops.weighted_sample). The +0.5 keeps u in the
    OPEN interval (0, 1): with +1, the digest 2^48−1 gives u=1 and ln(ln(1))
    diverges — NULL in Spark vs an error/±inf in DuckDB (r2 ADVICE)."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 12),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_MD5_48)
    return log_weight + (-F.log(-F.log(u)))


def dsir_select(
    weights: DataFrame,
    id_col: str,
    k: int,
    salt: str = "g1",
) -> DataFrame:
    """Gumbel-top-k resampling over (id, log_weight) rows: the classic
    exponential-clocks equivalence makes top-k by (log_weight + Gumbel) an
    exact without-replacement sample ∝ exp(log_weight). orderBy+limit →
    TakeOrderedAndProject (no single-partition sort)."""
    key = F.round(
        dsir_gumbel_key(F.col("log_weight"), F.col(id_col), salt), 6
    ).alias("gumbel_key")
    return (
        weights.select(id_col, "n_grams", "log_weight", key)
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )


def mixture_weights(
    df: DataFrame, group_col: str, target_total: int
) -> DataFrame:
    """Temperature-based data-mixing weights per group (the multilingual /
    multi-source mixing rule of mC4 / XLM-R / Llama: q_g ∝ p_g^τ with
    τ = 1/2, which up-weights tail groups and damps the head) →
    (group, n_docs, p, mix_weight, sample_rate).

    τ is FIXED at 1/2 so the reweighting is sqrt(p) — IEEE-754 sqrt is
    correctly rounded, hence bit-identical across engines, unlike pow().
    The normalizer Σ sqrt(p_g) follows the house DSIR convention: each
    term 12dp-rounded into DECIMAL(28,12), summed exactly (order-free),
    cast to DOUBLE only for the final ratios. sample_rate is the per-group
    keep probability that hits ``target_total`` docs in expectation,
    capped at 1 (a group smaller than its quota is taken whole).

    Scale shape: ONE map-side-combined groupBy(group) over the corpus;
    everything after runs on the |groups|-row synopsis (the empty-frame
    windows are single-partition BY DESIGN there). The rates then drive a
    scan-speed md5-threshold filter (textops.weighted_sample) — no second
    shuffle of the data.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    everything = Window.partitionBy()
    p_raw = F.col("n_docs").cast("double") / F.sum("n_docs").over(everything).cast(
        "double"
    )
    s = F.round(F.sqrt(p_raw), 12).cast("decimal(28,12)")
    syn = counts.select(group_col, "n_docs", p_raw.alias("p_raw"), s.alias("s"))
    w_raw = F.col("s").cast("double") / F.sum("s").over(everything).cast("double")
    rate = F.least(
        F.lit(1.0),
        w_raw * F.lit(float(target_total)) / F.col("n_docs").cast("double"),
    )
    return syn.select(
        group_col,
        "n_docs",
        F.round("p_raw", 6).alias("p"),
        F.round(w_raw, 6).alias("mix_weight"),
        F.round(rate, 6).alias("sample_rate"),
    )
