"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:

* exact       — md5(text) groupBy with ``min(id)`` survivor: one shuffle on a
                uniform 128-bit key, map-side combined, no skew.
* MinHash+LSH — shingle → H order-preserving min-hashes → B bands; candidate
                pairs come from an equi-join on (band_idx, band_hash), i.e.
                only colliding documents ever meet (the classic
                shingle→minhash→band→bucket-join pipeline). Verification
                joins back to exact shingle sets for true Jaccard.
* SimHash     — per-token hash bits weighted-summed per position via a single
                explode(token × bit) aggregation (native, no UDF).
* n-gram Jaccard — exact set similarity for candidate pairs.

Hash primitive: md5 hex strings (lexicographic MIN over hex = a valid
min-hash permutation surrogate). Chosen deliberately over xxhash64 because
DuckDB and Spark produce IDENTICAL md5 hex — the correctness oracle can
replay every operator bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def text_key(text: Column) -> Column:
    return F.md5(text)


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Survivor per exact-duplicate group: min id; also group size."""
    return (
        df.groupBy(text_key(F.col(text_col)).alias("text_md5"))
        .agg(F.min(F.col(id_col)).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array (distinct not applied — Jaccard uses sets
    via array_distinct at comparison time)."""
    toks = F.split(F.trim(F.lower(text)), "\\s+")
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def minhash_signature(shingle_arr: Column, n_hashes: int = 8) -> Column:
    """H min-hashes: for seed s, MIN over shingles of md5('s:'||shingle).
    Returns array<string> of hex minima (order-preserving surrogate)."""
    sigs = [
        F.array_min(F.transform(shingle_arr, lambda sh: F.md5(F.concat(F.lit(f"{s}:"), sh))))
        for s in range(n_hashes)
    ]
    return F.array(*sigs)


def lsh_bands(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """Band signatures: md5 over the concatenation of each band's rows.
    Returns array<struct<band:int, bhash:string>>."""
    bands = []
    for b in range(n_bands):
        piece = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        bands.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", piece)).alias("bhash")))
    return F.array(*bands)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash, verified with exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b."""
    rows_per_band = n_hashes // n_bands
    base = df.select(
        F.col(id_col).alias("doc"),
        shingles(F.col(text_col), k).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))

    banded = base.select(
        "doc", "sh", F.explode(lsh_bands(F.col("sig"), n_bands, rows_per_band)).alias("b")
    ).select("doc", "sh", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash"))

    left = banded.select(
        F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"), "band", "bhash"
    )
    right = banded.select(
        F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"), "band", "bhash"
    )
    cand = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect(F.array_distinct("sh_a"), F.array_distinct("sh_b")))
    union = F.size(F.array_union(F.array_distinct("sh_a"), F.array_distinct("sh_b")))
    return (
        cand.withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard(text_a: Column, text_b: Column, k: int = 3) -> Column:
    """Exact k-shingle Jaccard between two text columns."""
    sa, sb = F.array_distinct(shingles(text_a, k)), F.array_distinct(shingles(text_b, k))
    return F.round(
        F.size(F.array_intersect(sa, sb)).cast("double") / F.size(F.array_union(sa, sb)), 4
    )


def simhash(df: DataFrame, text_col: str, id_col: str, n_bits: int = 32) -> DataFrame:
    """Per-document SimHash: explode tokens × bit positions; bit b of
    md5(token) votes ±1; sign of the per-position sum sets the bit. One
    shuffle on (id), fully native. Returns (id, simhash:bigint)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), "\\s+"))).alias("tok"),
    )
    # bit b of the token hash: use hex nibble arithmetic on md5 —
    # bit(b) = (nibble(b/4) >> (b%4)) & 1, nibble via conv(hexchar,16,10)
    bits = toks.select(
        "doc",
        F.col("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("b"),
    ).withColumn(
        "bit",
        # NB: floor(), not CAST(double AS INT) — DuckDB's cast ROUNDS while
        # Spark's truncates; floor is unambiguous in both engines.
        F.expr(
            "CASE WHEN (locate(substring(md5(tok), CAST(floor(b/4) AS INT) + 1, 1), "
            "'0123456789abcdef') - 1) & shiftleft(1, b % 4) > 0 THEN 1 ELSE 0 END"
        ),
    )
    votes = bits.groupBy("doc", "b").agg(F.sum(F.col("bit") * 2 - 1).alias("vote"))
    return votes.groupBy("doc").agg(
        F.sum(
            F.expr("CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END")
        ).alias("simhash")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine ≥ threshold).

    Scale path: at 10^8+ vectors the quadratic join is gated behind the
    sign-random-projection LSH buckets (similarity.lsh_hyperplane_buckets) —
    join within bucket, then exact-cosine verify; this function is the exact
    verify step and doubles as the brute-force baseline. The dot products are
    JVM-side (``aggregate``/``zip_with`` — no Python worker in the loop).
    """
    from crawl4ai_scraper_spark.operators.similarity import cosine

    v = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("e")
    )
    a = v.select(F.col("id").alias("id_a"), F.col("e").alias("ea"))
    b = v.select(F.col("id").alias("id_b"), F.col("e").alias("eb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
