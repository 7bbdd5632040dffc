"""Corpus-distribution health checks and shuffle-key diagnostics.

A 100 TB webtext corpus is only healthy if its distributions look like the
web's: document lengths follow a power law, token frequencies follow Zipf,
and no join/groupBy key carries a pathological share of the rows. These
operators are the dashboard a pipeline runs per crawl snapshot — each is a
scalar-output aggregation (model-sized results), engine-exact via the
round-to-12dp-before-DECIMAL-sum convention so a SQL oracle reproduces the
bits.

Scale shapes:
* power-law fit  — ONE filter + ONE all-partial aggregate (two scalars).
* Zipf fit       — one token-count groupBy (map-side combined, vocab-sized
                   output), a row_number over the vocab table, OLS over the
                   top-N rows (N is a constant).
* skew report    — one key-count groupBy + one window over the KEY-COUNT
                   table (|keys| rows, not |rows|) for the Gini cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.operators.textops import words

_D = "decimal(28,12)"


def length_powerlaw_fit(
    docs: DataFrame, len_col: str = "n_chars", x_min: int = 50
) -> DataFrame:
    """Continuous-MLE power-law exponent over document lengths (Clauset,
    Shalizi, Newman 2009 eq. 3.1): alpha = 1 + n / Σ ln(x_i / x_min) for
    x_i ≥ x_min. Web page and document sizes are canonically power-law; an
    alpha drifting run-over-run means the crawl's content mix changed
    (trap farms and mills show up as alpha dropping toward 1).

    ONE aggregate: per-row ln ratio rounded to 12dp and summed in DECIMAL
    (order-free), n alongside — two scalars, exact in any engine.
    Returns one row (n, x_min, alpha)."""
    x = F.col(len_col).cast("double")
    kept = docs.filter(F.col(len_col) >= x_min)
    agg = kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.log(x / F.lit(float(x_min))), 12).cast(_D)).alias("lsum"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(x_min).cast("int").alias("x_min"),
        F.round(
            F.lit(1.0) + F.col("n").cast("double") / F.col("lsum").cast("double"), 6
        ).alias("alpha"),
    )


def zipf_fit(
    docs: DataFrame, text_col: str = "text", top_n: int = 500
) -> DataFrame:
    """Zipf-law slope of the token frequency spectrum: OLS of ln(count) on
    ln(rank) over the top-N vocabulary (slope ≈ -1 on natural language;
    boilerplate-heavy or template-mill corpora flatten it). Token counting
    is one map-side-combined groupBy to vocab size; ranking and the OLS
    aggregate run over the vocab-sized count table, never the token stream.
    Per-point 12dp rounding + DECIMAL sums keep the five OLS sums
    order-free. Returns one row (n_points, slope, intercept)."""
    counts = (
        docs.select(F.explode(words(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = counts.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("tok")))
        .alias("rank"),
    ).filter(F.col("rank") <= top_n)
    pts = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 12).cast(_D).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 12).cast(_D).alias("y"),
        F.round(
            F.log(F.col("rank").cast("double")) * F.log(F.col("cnt").cast("double")),
            12,
        ).cast(_D).alias("xy"),
        F.round(
            F.log(F.col("rank").cast("double")) * F.log(F.col("rank").cast("double")),
            12,
        ).cast(_D).alias("xx"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Shuffle-key skew diagnostic: before hash-partitioning 100 TB on a
    key, measure how the rows distribute over it — the single hottest key's
    share (the straggler-task bound: one partition is at least that share)
    and the Gini coefficient of the key-count distribution (0 = uniform,
    →1 = one key owns everything; >0.6 wants salting or AQE skew-join).

    One key-count groupBy (map-side combined), then the Gini cumsum window
    runs over the KEY-COUNT table (|keys| rows, not |rows|). Integer window
    math; only the final ratios are doubles.
    Returns one row (n_keys, n_rows, top_key, top_share, gini)."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    ranked = counts.select(
        "k",
        "c",
        F.row_number().over(Window.orderBy(F.asc("c"), F.asc("k"))).alias("i"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max(F.struct(F.col("c"), F.col("k"))).alias("top"),
        F.sum(F.col("i").cast("bigint") * F.col("c").cast("bigint")).alias("ic"),
    )
    nk = F.col("n_keys").cast("double")
    return agg.select(
        F.col("n_keys").cast("bigint").alias("n_keys"),
        "n_rows",
        F.col("top.k").cast("string").alias("top_key"),
        F.round(F.col("top.c").cast("double") / F.col("n_rows"), 6).alias("top_share"),
        F.round(
            F.lit(2.0) * F.col("ic").cast("double")
            / (nk * F.col("n_rows").cast("double"))
            - (nk + 1.0) / nk,
            6,
        ).alias("gini"),
    )
