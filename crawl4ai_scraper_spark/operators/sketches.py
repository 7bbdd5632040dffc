"""Deterministic cardinality sketches — KMV and HyperLogLog over md5.

The 100-TB question "how many distinct URLs / pages / texts do we have?"
cannot afford COUNT(DISTINCT x) (a full shuffle of every distinct value).
Both sketches here answer it from tiny synopses:

* kmv_distinct — K-minimum-values (Bar-Yossef et al. 2002): keep the k
  smallest distinct hash values; estimate = (k-1)/u_(k). The candidate
  stream is deduplicated with a map-side-combined DISTINCT (the exchange
  carries per-partition-distinct hashes only, keys uniform by construction)
  and the k smallest survive via TakeOrderedAndProject (per-partition
  heaps) — the driver only ever sees k values.
* hll_distinct — HyperLogLog (Flajolet et al. 2007): 2^b buckets from the
  low b bits of the hash, per-bucket max leading-zero rank from the high
  bits, harmonic-mean estimate with the standard small-range linear
  counting correction. One map-side-combined groupBy over ≤2^b keys; the
  synopsis is 2^b rows regardless of corpus size.

Determinism (the contract requirement): "randomness" is the repo's shared
48-bit md5 digest (selection.py:_MD5_48 convention, u=(h+0.5)/2^48 open
interval), ranks are computed with integer bin-length (never floating
log2), and the HLL harmonic sum is ORDER-FREE in IEEE double arithmetic:
every 2^-rank term is a multiple of 2^-(48-b+1) and the total stays under
2^b+1, so every partial sum is exactly representable (< 53 mantissa bits)
and addition order cannot change the result. Final estimates round to 6dp
per the house ln() convention (contract.py weighted_sample / dsir).

No reference counterpart (the reference never counts at this scale) — this
extends the pipeline the way SURVEY §2's training-data ops do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MD5_48 = 281474976710656  # 2^48 — the 12-hex-digit md5 prefix space


def digest48(col: Column, salt: str) -> Column:
    """The shared 48-bit md5 digest as a non-negative long."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 12),
        16, 10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame, key_col: str, k: int = 256, salt: str = "kmv1"
) -> DataFrame:
    """KMV distinct-count estimate → one row (k, n_min, estimate).

    u = (h+0.5)/2^48 per distinct hash; with ≥k distinct values the
    estimator is (k-1)/u_(k); below k the k-th minimum does not exist and
    the observed distinct-hash count IS the (collision-exact) answer.
    """
    u = (digest48(F.col(key_col), salt) + F.lit(0.5)) / F.lit(float(_MD5_48))
    topk = df.select(u.alias("u")).distinct().orderBy("u").limit(k)
    agg = topk.agg(
        F.count(F.lit(1)).alias("n_min"), F.max("u").alias("u_k")
    )
    return agg.select(
        F.lit(k).cast("int").alias("k"),
        F.col("n_min"),
        F.round(
            F.when(F.col("n_min") < k, F.col("n_min").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("u_k")),
            6,
        ).alias("estimate"),
    )


def hll_bucket_rank(col: Column, b: int = 12, salt: str = "hll1"):
    """(bucket, rank) columns for one key: bucket = h mod 2^b (low bits);
    rank = leading zeros of the remaining 48-b high bits + 1, via integer
    bin-length (never floating log2) — empty rest → rest_bits + 1."""
    m = 1 << b
    rest_bits = 48 - b
    h = digest48(col, salt)
    rest = (h / F.lit(m)).cast("long")
    rank = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + F.lit(1)
    )
    return (h % F.lit(m)).alias("bucket"), rank.alias("rank")


def hll_finish(per_bucket: DataFrame, b: int = 12, group_cols=()) -> DataFrame:
    """Estimate from a (…group_cols, bucket, max_rank) synopsis: harmonic
    mean with the standard small-range linear-counting correction
    (Flajolet et al. §4). One row per group (or one total row)."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    am2 = alpha * m * m  # folded driver-side; the oracle inlines repr(am2)
    aggs = [
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("present_harm"),
        F.count(F.lit(1)).alias("n_present"),
    ]
    agg = (per_bucket.groupBy(*group_cols).agg(*aggs)
           if group_cols else per_bucket.agg(*aggs))
    zeros = (F.lit(m) - F.col("n_present")).cast("long")
    harm = F.col("present_harm") + zeros.cast("double")
    e_raw = F.lit(am2) / harm
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return agg.select(
        *group_cols,
        F.lit(m).cast("int").alias("m"),
        zeros.alias("n_zero_buckets"),
        F.round(
            F.when((e_raw <= F.lit(2.5 * m)) & (zeros > 0), linear)
            .otherwise(e_raw),
            6,
        ).alias("estimate"),
    )


def hll_distinct(
    df: DataFrame, key_col: str, b: int = 12, salt: str = "hll1"
) -> DataFrame:
    """HyperLogLog distinct-count estimate → one row
    (m, n_zero_buckets, estimate). See hll_bucket_rank / hll_finish."""
    bucket, rank = hll_bucket_rank(F.col(key_col), b, salt)
    per_bucket = (
        df.select(bucket, rank).groupBy("bucket").agg(F.max("rank").alias("max_rank"))
    )
    return hll_finish(per_bucket, b)
