"""Deterministic distribution synopses — KMV / HyperLogLog cardinality,
Count-Min frequency, and exact histogram quantiles, all over md5.

The 100-TB question "how many distinct URLs / pages / texts do we have?"
cannot afford COUNT(DISTINCT x) (a full shuffle of every distinct value).
The sketches here answer it (and "how often does token t occur?" /
"what is the p95 document length?") from tiny synopses:

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
  synopsis is 2^b rows regardless of corpus size. ``hll_distinct_by``
  is the grouped form (≤ groups×2^b synopsis rows, one shuffle).
* cms_build / cms_estimate — Count-Min (Cormode & Muthukrishnan 2005):
  d independent md5-salted hash rows × w buckets; a point query is the
  min of its d cells, guaranteed ≥ the true count. The build is ONE
  map-side-combined groupBy over ≤ d·w keys — the token stream itself
  never shuffles at more than synopsis width.
* kmv_overlap / hll_setops — sketch SET ALGEBRA: the cross-snapshot
  questions ("how much of crawl B did crawl A already have?") answered
  without ever joining the two corpora. KMV keeps membership flags on
  the k smallest union hashes (Jaccard = flagged-both fraction — the
  Broder/theta-sketch estimator); HLL merges per-bucket maxima (the
  union sketch is EXACTLY the sketch of the unioned stream) and gets
  the intersection by inclusion-exclusion.
* exact_quantiles — not a sketch but the same scale shape: exact
  order statistics from a value HISTOGRAM (groupBy value → counts,
  cumulative sum over the bounded synopsis), never a global sort of
  the raw rows. Rank targets use pure integer math (cum·den ≥ num·N),
  so the answer is reproducible to the bit in any engine.

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


def hll_distinct_by(
    df: DataFrame, key_col: str, group_col: str, b: int = 12, salt: str = "hll1"
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimates → one row per group
    (group_col, m, n_zero_buckets, estimate).

    Identical math to hll_distinct restricted to each group's rows (same
    digest, so the per-group estimate equals hll_distinct of the filtered
    slice). ONE map-side-combined groupBy over ≤ |groups|·2^b keys — the
    per-group distinct-URL / distinct-text panel at corpus scale."""
    bucket, rank = hll_bucket_rank(F.col(key_col), b, salt)
    per_bucket = (
        df.select(F.col(group_col), bucket, rank)
        .groupBy(group_col, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    return hll_finish(per_bucket, b, group_cols=(group_col,))


def kmv_overlap(
    df_a: DataFrame, df_b: DataFrame, key_col: str, k: int = 256, salt: str = "kmv1"
) -> DataFrame:
    """KMV union sketch with membership flags → one row
    (k, n_min, n_both, union_est, jaccard_est, inter_est).

    The two key streams are tagged and unioned (a projection — neither
    corpus joins the other, ever); ONE map-side-combined groupBy over the
    hash space ORs the flags per distinct hash, and the k smallest survive
    via TakeOrdered. On that k-row synopsis, Jaccard is the flagged-both
    fraction (Broder 1997 / the theta-sketch estimator), the union size is
    (k-1)/u_(k), and the intersection is their product. Below k distinct
    union values, n_min and the flags are collision-exact, so jaccard_est
    IS the true Jaccard.

    At 100 TB this replaces the cross-crawl distinct-join ("how much of
    snapshot B is new?") with two scans and a k-row synopsis.
    """
    u = (digest48(F.col(key_col), salt) + F.lit(0.5)) / F.lit(float(_MD5_48))

    def tag(df: DataFrame, a: int, b: int) -> DataFrame:
        return df.select(
            u.alias("u"), F.lit(a).alias("in_a"), F.lit(b).alias("in_b")
        )

    lab = (
        tag(df_a, 1, 0)
        .unionByName(tag(df_b, 0, 1))
        .groupBy("u")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    topk = lab.orderBy("u").limit(k)
    agg = topk.agg(
        F.count(F.lit(1)).alias("n_min"),
        F.max("u").alias("u_k"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    union_est = F.when(F.col("n_min") < k, F.col("n_min").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("u_k")
    )
    jacc = F.col("n_both").cast("double") / F.col("n_min").cast("double")
    return agg.select(
        F.lit(k).cast("int").alias("k"),
        "n_min",
        "n_both",
        F.round(union_est, 6).alias("union_est"),
        F.round(jacc, 6).alias("jaccard_est"),
        F.round(jacc * union_est, 6).alias("inter_est"),
    )


def hll_setops(
    df_a: DataFrame, df_b: DataFrame, key_col: str, b: int = 12, salt: str = "hll1"
) -> DataFrame:
    """HLL set algebra → one row (est_a, est_b, est_union, inter_est).

    Both streams fan into tagged (side, bucket, rank) rows; ONE
    map-side-combined groupBy over ≤ 2·2^b keys builds each side's
    synopsis, and the union synopsis is the per-bucket max of the two —
    by construction EXACTLY the sketch of the concatenated stream (HLL
    merge is lossless, the property that makes the sketch distributable).
    The intersection falls out by inclusion-exclusion on the three 6dp
    estimates, clamped at 0 (IE can go slightly negative at sketch
    error); identical float ops in both engines keep it bit-equal.
    """
    bucket, rank = hll_bucket_rank(F.col(key_col), b, salt)
    both = df_a.select(F.lit("a").alias("side"), bucket, rank).unionByName(
        df_b.select(F.lit("b").alias("side"), bucket, rank)
    )
    per = both.groupBy("side", "bucket").agg(F.max("rank").alias("max_rank"))
    union_pb = (
        per.groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
        .select(F.lit("union").alias("side"), "bucket", "max_rank")
    )
    est = hll_finish(per.unionByName(union_pb), b, group_cols=("side",))
    pivot = est.agg(
        F.max(F.when(F.col("side") == "a", F.col("estimate"))).alias("est_a"),
        F.max(F.when(F.col("side") == "b", F.col("estimate"))).alias("est_b"),
        F.max(F.when(F.col("side") == "union", F.col("estimate"))).alias("est_union"),
    )
    return pivot.select(
        "est_a",
        "est_b",
        "est_union",
        F.round(
            F.greatest(
                F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
            ),
            6,
        ).alias("inter_est"),
    )


def cms_cells(col: Column, d: int, w: int, salt: str) -> Column:
    """array<struct<row,bucket>> of the d Count-Min cells for one key:
    row i uses the shared digest under salt ``f"{salt}{i}"``, bucket =
    digest mod w. Shared by the build and the point-query sides so they
    hash identically by construction."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (digest48(col, f"{salt}{i}") % F.lit(w)).alias("bucket"),
            )
            for i in range(d)
        ]
    )


def cms_build(
    df: DataFrame, col: Column, d: int = 4, w: int = 1024, salt: str = "cms"
) -> DataFrame:
    """Count-Min synopsis (row, bucket, cnt) from a key stream.

    The stream fans onto its d cells (a projection, no shuffle), then ONE
    groupBy over ≤ d·w keys with map-side combine — at 100 TB the exchange
    carries at most d·w rows per input partition no matter the corpus size.
    Estimates are biased UP only (every cell ≥ its true mass): with
    ε = e/w and δ = e^-d, est ≤ true + ε·N with probability ≥ 1-δ.
    """
    return (
        df.select(F.explode(cms_cells(col, d, w, salt)).alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    synopsis: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the synopsis: per probe key, min over its d cells
    (absent cell = 0). The probe frame is tiny → broadcast join against
    the ≤ d·w-row synopsis; output is (key_col, cms_est)."""
    cells = probes.select(
        key_col, F.explode(cms_cells(F.col(key_col), d, w, salt)).alias("c")
    ).select(key_col, "c.row", "c.bucket")
    return (
        cells.join(synopsis, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: Column,
    phi_num: int,
    phi_den: int,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """EXACT φ-heavy hitters (keys with count ≥ φ·N, φ = phi_num/phi_den)
    via the classic two-pass sketch screen → (key, cnt), cnt exact.

    Pass 1 builds the Count-Min synopsis (ONE bounded ≤d·w-key groupBy)
    and collects it driver-side — d·w cells, a model-sized artifact like
    k-means centroids — into a flat literal lookup array. Pass 2 screens
    every occurrence with a pure PROJECTION (min over d literal-array
    lookups — no join, no shuffle, evaluated inside the scan stage):
    because CMS never underestimates, every true heavy hitter survives
    the screen (NO false negatives, unconditionally), and at most ~1/φ'
    distinct keys pass, so the exact verification groupBy runs over a
    BOUNDED key space with map-side combine. The final integer predicate
    cnt·phi_den ≥ phi_num·N removes the screen's false positives — the
    output is therefore EXACTLY the naive `GROUP BY key HAVING count ≥
    φ·N`, at synopsis cost instead of a corpus-distinct shuffle.

    N is read off the synopsis itself (each of the d rows sums to N), so
    the screen needs no second pass over the data.

    Hash family: a PRIVATE xxhash64 per row (seeded by salt+row index) —
    unlike the md5-derived `digest48` used by the oracle-replicated
    sketch queries, nothing downstream replays these cells, and the
    output is EXACT regardless of hash family, so the screen uses the
    cheapest JVM hash available. The key stream is hashed d times in
    each pass; md5+conv here was the dominant cost of the whole job.
    """
    toks = df.select(col.alias("k"))

    def _bucket(i: int) -> Column:
        return F.pmod(F.xxhash64(F.lit(f"{salt}{i}"), F.col("k")), F.lit(w))

    syn_rows = (
        toks.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("row"), _bucket(i).alias("bucket"))
                    for i in range(d)
                ])
            ).alias("c")
        )
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    n_total = sum(r.cnt for r in syn_rows if r.row == 0)
    cells = [0] * (d * w)
    for r in syn_rows:
        cells[r.row * w + r.bucket] = r.cnt
    lut = F.lit(cells)  # ONE array literal (not d·w expressions)
    est = F.least(
        *[
            F.element_at(lut, (F.lit(i * w) + _bucket(i) + F.lit(1)).cast("int"))
            for i in range(d)
        ]
    )
    return (
        toks.filter(est * F.lit(phi_den) >= F.lit(phi_num * n_total))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * F.lit(phi_den) >= F.lit(phi_num * n_total))
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple = ((1, 4), (1, 2), (3, 4), (19, 20)),
) -> DataFrame:
    """EXACT discrete quantiles via the histogram two-phase plan →
    (q double, value) per requested quantile.

    Phase 1: groupBy(value) → counts — the only corpus-wide shuffle, and
    it carries one row per DISTINCT value (bounded synopsis: token counts,
    lengths, scores). Phase 2: cumulative sum ordered by value over the
    synopsis (single-partition window is correct here BECAUSE it runs on
    the histogram, never the raw rows — the classic exact-quantile-at-scale
    shape; a global sort of the input is the anti-pattern this replaces).
    The q-quantile is the smallest v whose cumulative count reaches
    ceil(q·N), tested as the pure-integer predicate cum·den ≥ num·N so
    there is no float rank anywhere.
    """
    from pyspark.sql import Window

    hist = (
        df.select(F.col(value_col).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.select(
        "v",
        F.sum("cnt").over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    spark = df.sparkSession
    qframe = spark.createDataFrame(
        [(float(num) / den, num, den) for num, den in qs], "q double, num long, den long"
    )
    return (
        cum.crossJoin(F.broadcast(qframe))
        .filter(F.col("cum") * F.col("den") >= F.col("num") * F.col("n"))
        .groupBy("q")
        .agg(F.min("v").alias("value"))
    )
