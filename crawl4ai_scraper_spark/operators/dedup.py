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

from typing import Optional, Sequence

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


def lsh_candidate_jaccard(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, j) for every LSH band-collision candidate pair, with the
    UNROUNDED exact shingle-set Jaccard — the shared candidate stream behind
    ``minhash_lsh_pairs`` (threshold filter) and ``contrastive_pairs``
    (band-window labeling)."""
    rows_per_band = n_hashes // n_bands
    base = df.select(
        F.col(id_col).alias("doc"),
        shingles(F.col(text_col), k).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))

    # Side table of exact shingle sets, joined back only AFTER pair dedup.
    # The band join itself carries (band, bhash, doc) — three scalar columns —
    # so the ×n_bands explode and the candidate-pair shuffle never replicate
    # the shingle arrays (at corpus scale those arrays dominate the row size).
    shingle_tbl = base.select("doc", F.array_distinct("sh").alias("shset"))

    banded = base.select(
        "doc", F.explode(lsh_bands(F.col("sig"), n_bands, rows_per_band)).alias("b")
    ).select("doc", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash"))

    left = banded.select(F.col("doc").alias("id_a"), "band", "bhash")
    right = banded.select(F.col("doc").alias("id_b"), "band", "bhash")
    cand = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = cand.join(
        shingle_tbl.select(F.col("doc").alias("id_a"), F.col("shset").alias("sh_a")), "id_a"
    ).join(
        shingle_tbl.select(F.col("doc").alias("id_b"), F.col("shset").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return pairs.select(
        "id_a", "id_b", (inter.cast("double") / union).alias("j")
    )


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
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Thresholds the UNROUNDED ratio (rounding is display-only): a true
    Jaccard in [threshold - 5e-5, threshold) must not pass just because
    it rounds up to the threshold at 4dp."""
    cand = lsh_candidate_jaccard(df, text_col, id_col, k, n_hashes, n_bands)
    return (
        cand.filter(F.col("j") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("j", 4).alias("jaccard"))
    )


def contrastive_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 8,
    pos_lo: float = 0.5,
    pos_hi: float = 0.95,
    neg_hi: float = 0.2,
) -> DataFrame:
    """Weak-supervision pair mining for embedding-model training (the
    E5/GTE-style recipe run over a crawl corpus): label LSH band-collision
    candidates by their MEASURED Jaccard —

    * ``pos``      — j in [pos_lo, pos_hi): same content, different surface
      (revisions, syndicated copies, paraphrase-ish) — exact duplicates
      (j >= pos_hi) are excluded as trivial/leaky positives;
    * ``hard_neg`` — j < neg_hi: docs lexically close enough to collide in a
      band yet actually dissimilar — exactly the "retrieved but wrong"
      negatives contrastive losses need (random negatives are too easy);
    * the ambiguous middle (neg_hi <= j < pos_lo) is dropped.

    Both classes come from ONE candidate stream (the id-only band join of
    ``lsh_candidate_jaccard`` — no second pipeline, no all-pairs join), so
    the mining cost at 100 TB is the near-dup pass the corpus already runs.
    Default ``n_bands = n_hashes`` (single-row bands): collision probability
    per band equals j itself, which is what lets genuinely-dissimilar pairs
    surface as candidates at all (multi-row bands suppress them — right for
    dedup, wrong for negative mining).

    Output: (id_a, id_b, jaccard 4dp, label), id_a < id_b, deterministic.
    """
    cand = lsh_candidate_jaccard(df, text_col, id_col, k, n_hashes, n_bands)
    label = (
        F.when((F.col("j") >= pos_lo) & (F.col("j") < pos_hi), F.lit("pos"))
        .when(F.col("j") < neg_hi, F.lit("hard_neg"))
    )
    return (
        cand.select("id_a", "id_b", F.round("j", 4).alias("jaccard"), label.alias("label"))
        .filter(F.col("label").isNotNull())
    )


def ngram_jaccard(text_a: Column, text_b: Column, k: int = 3) -> Column:
    """Exact k-shingle Jaccard between two text columns."""
    sa, sb = F.array_distinct(shingles(text_a, k)), F.array_distinct(shingles(text_b, k))
    return F.round(
        F.size(F.array_intersect(sa, sb)).cast("double") / F.size(F.array_union(sa, sb)), 4
    )


def simhash(df: DataFrame, text_col: str, id_col: str, n_bits: int = 32) -> DataFrame:
    """Per-document SimHash: bit b of md5(token) votes ±1; sign of the
    per-position sum sets the bit. Returns (id, simhash:bigint).

    Scale shape: ONE shuffle at 1× token volume. Each (doc, token) row carries
    its n_bits vote columns natively (hex-nibble arithmetic on the token md5 —
    no UDF, no row blowup), and the per-doc groupBy map-side-combines them
    into a single row per doc per partition. The earlier design exploded
    token × bit (a ×n_bits pre-shuffle row blowup) — at web-corpus token
    volumes that multiplier IS the shuffle cost, so it's gone."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), "\\s+"))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    # vote for bit b: +1 if bit set in the token hash, else -1.
    # bit(b) = (nibble(b/4) >> (b%4)) & 1, nibble via hex-char position — the
    # same arithmetic the DuckDB oracle replays (positions are 1-based).
    votes = [
        F.expr(
            f"CASE WHEN (locate(substring(h, {b // 4 + 1}, 1), '0123456789abcdef') - 1) "
            f"& {1 << (b % 4)} > 0 THEN 1 ELSE -1 END"
        ).alias(f"v{b}")
        for b in range(n_bits)
    ]
    per_tok = toks.select("doc", *votes)
    agg = per_tok.groupBy("doc").agg(
        *[F.sum(f"v{b}").alias(f"s{b}") for b in range(n_bits)]
    )
    # shiftleft, not a precomputed literal: 1<<63 written as a literal
    # overflows BIGINT (nulls the whole hash under non-ANSI casts), while
    # shiftleft(1L, 63) is the correct two's-complement min-long bit.
    fold = " + ".join(
        f"CASE WHEN s{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) "
        f"ELSE CAST(0 AS BIGINT) END"
        for b in range(n_bits)
    )
    return agg.select("doc", F.expr(fold).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 32,
    n_pieces: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation: each simhash splits into ``n_pieces`` bit-slices
    and candidates come from an equi-join on (piece_idx, piece_value). By
    pigeonhole, any pair within Hamming distance < n_pieces agrees on at
    least one whole piece — so with ``max_hamming < n_pieces`` the banding
    is EXACT (zero recall loss), while the join only ever compares documents
    that collide on a slice. Verify: ``bit_count(xor)`` ≤ max_hamming.
    Scale shape mirrors MinHash-LSH: a ×n_pieces explode of three scalar
    columns, one hash-shuffle on the slice key, no quadratic stage.
    Returns (id_a, id_b, hamming) with id_a < id_b."""
    assert max_hamming < n_pieces, "banding is exact only when max_hamming < n_pieces"
    piece_bits = n_bits // n_pieces
    mask = (1 << piece_bits) - 1
    sims = simhash(df, text_col, id_col, n_bits)  # (doc, simhash)
    pieces = sims.select(
        "doc", "simhash",
        F.explode(F.array(*[F.lit(p) for p in range(n_pieces)])).alias("p"),
    ).withColumn(
        "piece",
        F.expr(f"(simhash >> (p * {piece_bits})) & {mask}"),
    )
    left = pieces.select(F.col("doc").alias("id_a"), "p", "piece")
    right = pieces.select(F.col("doc").alias("id_b"), "p", "piece")
    cand = (
        left.join(right, ["p", "piece"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sims.select(F.col("doc").alias("id_a"), F.col("simhash").alias("sim_a"))
    sb = sims.select(F.col("doc").alias("id_b"), F.col("simhash").alias("sim_b"))
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("hamming", F.expr("CAST(bit_count(sim_a ^ sim_b) AS INT)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
) -> DataFrame:
    """BRUTE-FORCE embedding-cosine near-dup pairs: (id_a < id_b, cos ≥ t).

    This is the O(n²) all-pairs baseline — correct, and fine for a small
    verification corpus, but NOT the scale path: use
    ``embedding_near_dup_bucketed`` for real corpora (LSH bucket equi-join →
    exact verify). The dot products are JVM-side (``aggregate``/``zip_with``
    — no Python worker in the loop).
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


def embedding_near_dup_bucketed(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    n_probe_seeds: int = 1,
) -> DataFrame:
    """LSH-bucketed embedding near-dup — the 100-TB scale path.

    Pipeline: sign-random-projection bucket per vector
    (similarity.lsh_hyperplane_buckets, deterministic literal planes) →
    self equi-join on the bucket key (expected bucket population n/2^planes,
    so candidate generation is a plain hash shuffle, never an all-pairs
    product) → join the vectors back onto the surviving (id_a, id_b)
    candidates → exact-cosine verify (JVM-side math).

    Recall is the standard LSH trade-off: only pairs whose sign patterns
    agree on every plane collide (single-probe). ``n_probe_seeds > 1`` is
    the multi-probe variant: an independent plane set per seed, the bucket
    joins unioned and pair-deduped before the verify — recall loss decays
    exponentially in the number of probes while the join shape (hash
    shuffle on the bucket key) is unchanged. Returns (id_a, id_b, cos)
    with id_a < id_b.
    """
    from crawl4ai_scraper_spark.operators.similarity import (
        cosine,
        lsh_hyperplane_buckets,
    )

    v = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("e")
    )
    cand = None
    for probe in range(n_probe_seeds):
        buckets = lsh_hyperplane_buckets(
            v, "id", "e", n_planes=n_planes, dim=dim, seed=seed + probe
        )
        left = buckets.select(F.col("vec_id").alias("id_a"), "bucket")
        right = buckets.select(F.col("vec_id").alias("id_b"), "bucket")
        probe_cand = (
            left.join(right, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = probe_cand if cand is None else cand.unionByName(probe_cand)
    if n_probe_seeds > 1:
        cand = cand.dropDuplicates(["id_a", "id_b"])
    pairs = cand.join(
        v.select(F.col("id").alias("id_a"), F.col("e").alias("ea")), "id_a"
    ).join(v.select(F.col("id").alias("id_b"), F.col("e").alias("eb")), "id_b")
    return (
        pairs.withColumn("cos", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )


def segment_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seg_words: int = 3,
) -> DataFrame:
    """Paragraph/segment-level exact dedup: chop each doc into consecutive
    non-overlapping ``seg_words``-word segments, keep only the globally FIRST
    occurrence of every distinct segment (first appender = min (doc_id, pos)),
    and reassemble each doc from its surviving segments in original order.

    This is the segment analogue of corpus paragraph dedup (the C4/RefinedWeb
    "drop repeated boilerplate paragraphs" pass); real pipelines split on
    paragraph/sentence boundaries — the synthetic corpus is single-line, so
    the segment boundary stands in. The plan is what survives 100 TB:

    * one shuffle on md5(segment) — a uniform 128-bit key (boilerplate-hot
      segments collapse map-side in the min-struct partial agg, so a segment
      repeated 10^6× contributes ONE row per input partition to the shuffle);
    * first-appender = ``min(struct(doc_id, pos))`` — agg, not a window (no
      per-key sort, no skewed window partition);
    * keep-join back on the same md5 key (co-partitioned with the agg — AQE
      reuses the exchange) and one shuffle on doc_id for positional
      reassembly via sort_array(collect_list(struct(pos, seg))).

    Docs whose every segment was seen earlier vanish from the output (no
    surviving segments), same as the oracle's GROUP BY over kept rows.

    Output: (doc_id, n_segments, n_kept, dedup_text).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    n_segs = F.ceil(F.size(toks) / F.lit(float(seg_words))).cast("bigint")
    seg_arr = F.transform(
        F.sequence(F.lit(0), (n_segs - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i * seg_words + 1, seg_words)),
    )
    base = df.select(
        F.col(id_col),
        n_segs.alias("n_segments"),
        F.posexplode(seg_arr).alias("pos", "seg"),
    ).withColumn("skey", F.md5("seg"))
    firsts = base.groupBy("skey").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first")
    )
    kept = base.join(firsts, "skey").where(
        (F.col(id_col) == F.col(f"first.{id_col}")) & (F.col("pos") == F.col("first.pos"))
    )
    return kept.groupBy(id_col).agg(
        F.first("n_segments").alias("n_segments"),
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("dedup_text"),
    )


def _span_windows(df: DataFrame, text_col: str, id_col: str, k: int):
    """Shared tokenize + window-hash pipeline of the two span-dedup passes
    (detection and rewrite MUST hash identically or the rewrite diverges
    from the budget): → (base(id, _t, n_tokens), wins(id, s, h)). ``wins``
    is localCheckpoint'd lazily — the md5-of-slice per token position is the
    dominant cost and several downstream branches consume it."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(toks))
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t"), n.alias("n_tokens"))
    wins = (
        base.filter(F.col("n_tokens") >= k)
        .select("id", "n_tokens",
                F.explode(F.sequence(F.lit(0), F.col("n_tokens") - k)).alias("s"), "_t")
        .select("id", "n_tokens", "s",
                F.md5(F.concat_ws(" ", F.slice("_t", F.col("s") + 1, k))).alias("h"))
        .localCheckpoint(eager=False)
    )
    return base, wins


def dup_span_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Duplicate-SPAN detection at arbitrary offsets (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" signal, made
    join-friendly): every k-token window of every document is hashed; a
    window whose hash occurs ≥2 times corpus-wide is a duplicated span, and
    each document reports how much of it is covered by such spans.

    → (id, n_tokens, n_dup_windows, covered_tokens, dup_fraction) — docs
    shorter than k tokens report zeros. ``dup_fraction`` is the removal
    budget an exact-substring dedup pass would cut; the spans themselves are
    recoverable from (id, window start) if a rewrite stage wants them.

    Scale shape: the window stream is ONE row per token position carrying a
    32-char md5 (never the window text); counting shuffles at window volume
    with map-side combine, the dup join is co-keyed on the same hash, and
    the per-doc coverage union is a lead() window over each doc's duplicated
    starts only (interval-union arithmetic, no position explode). At 100 TB
    the md5-of-slice becomes a rolling hash in an Arrow pass — same plan,
    cheaper per-window bytes."""
    base, wins = _span_windows(df, text_col, id_col, k)
    counts = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    dup = wins.join(counts.filter(F.col("cnt") >= 2), "h").select("id", "n_tokens", "s")

    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("s")
    nxt = F.lead("s").over(w)
    contrib = F.when(nxt.isNull(), F.least(F.lit(k), F.col("n_tokens") - F.col("s"))) \
               .otherwise(F.least(F.lit(k), nxt - F.col("s")))
    per_doc = (
        dup.select("id", "n_tokens", "s", contrib.alias("c"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("c").cast("bigint").alias("covered_tokens"),
        )
    )
    all_docs = base.select("id", "n_tokens")
    out = all_docs.join(per_doc, "id", "left")
    return out.select(
        "id",
        "n_tokens",
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("bigint").alias("n_dup_windows"),
        F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("bigint").alias("covered_tokens"),
        F.round(
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ).alias("dup_fraction"),
    )


def strip_dup_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Exact-substring dedup REWRITE (the removal pass dup_span_stats
    budgets): for every k-token window repeated corpus-wide, the globally
    FIRST occurrence (lexicographic min (id, start)) keeps its tokens; every
    other occurrence's token range is removed, overlapping removals merged
    into islands first so positions are never double-counted. Output:
    (id, n_tokens, kept_tokens, text_stripped) with the surviving tokens
    rejoined by single spaces (whitespace-normalizing, like every token op
    here).

    Scale shape: windows shuffle as (id, s, md5) rows; the winner per hash
    is one min(struct) aggregate (map-side combine); island merging is a
    per-doc running-max window over REMOVAL starts only; only merged
    islands explode to removed positions. The token stream shuffles once
    for the anti-join + ordered reassembly."""
    from pyspark.sql import Window

    base, wins = _span_windows(df, text_col, id_col, k)
    per_hash = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(F.struct("id", "s")).alias("winner")
    )
    removal = (
        wins.join(per_hash.filter(F.col("cnt") >= 2), "h")
        .filter(~((F.col("id") == F.col("winner.id")) & (F.col("s") == F.col("winner.s"))))
        .select("id", "s", (F.col("s") + k).alias("e"))
    )

    w = Window.partitionBy("id").orderBy("s")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        removal.withColumn(
            "_new", F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0)
        )
        .withColumn("_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("id", "_isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    removed_pos = islands.select(
        "id", F.explode(F.sequence(F.col("s"), F.col("e") - 1)).alias("pos")
    )

    # n_tokens==0 docs would still posexplode their [''] split artifact —
    # keep them out of the stream so kept_tokens stays <= n_tokens
    stream = base.filter(F.col("n_tokens") > 0).select(
        "id", F.posexplode("_t").alias("pos", "tok")
    )
    kept = stream.join(removed_pos, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda st: st["tok"]),
        ).alias("text_stripped"),
    )
    return (
        base.select("id", "n_tokens")
        .join(rebuilt, "id", "left")
        .select(
            "id", "n_tokens",
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("bigint").alias("kept_tokens"),
            F.coalesce(F.col("text_stripped"), F.lit("")).alias("text_stripped"),
        )
    )


def lsh_recall(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 8,
    dim: int = 64,
    n_probe_seeds: int = 1,
) -> DataFrame:
    """Recall of the LSH-bucketed near-dup path against brute-force truth —
    the measurement that justifies (or tunes) the approximate scale path:
    run both pipelines on the SAME corpus, count true pairs found vs missed.
    → one row (n_true_pairs, n_found_pairs, recall). Precision is 1.0 by
    construction (the bucketed path exact-verifies every candidate), so
    recall is the only quality axis.

    Production shape: run this on a hash_sample slice (brute force is O(n²)
    — that is WHY the bucketed path exists), then crank ``n_probe_seeds``
    or ``n_planes`` until recall clears the bar before the full-corpus run."""
    truth = embedding_near_dup_pairs(embeddings, id_col, vec_col, threshold).select(
        "id_a", "id_b"
    )
    found = embedding_near_dup_bucketed(
        embeddings, id_col, vec_col, threshold,
        n_planes=n_planes, dim=dim, n_probe_seeds=n_probe_seeds,
    ).select("id_a", "id_b", F.lit(1).alias("_in"))
    joined = truth.join(found, ["id_a", "id_b"], "left")
    # Empty truth set (possible on a small hash_sample slice): SUM over zero
    # rows is NULL — pin n_found_pairs to 0 and define recall as 1.0 (nothing
    # to find, nothing missed) so tuning scripts can compare numerically.
    return joined.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.coalesce(F.sum(F.coalesce(F.col("_in"), F.lit(0))), F.lit(0))
        .cast("bigint").alias("n_found_pairs"),
        F.coalesce(
            F.round(
                F.sum(F.coalesce(F.col("_in"), F.lit(0))).cast("double")
                / F.greatest(F.count(F.lit(1)), F.lit(1)),
                4,
            ),
            F.lit(1.0),
        ).alias("recall"),
    )


def minhash_recall(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Recall of the banded-MinHash near-dup path against brute-force truth —
    the text-side twin of ``lsh_recall``: run the all-pairs exact-Jaccard
    pipeline and the banded pipeline on the SAME corpus, count true pairs
    found vs missed. → one row (n_true_pairs, n_found_pairs, recall).
    Precision is 1.0 by construction (the banded path exact-verifies every
    candidate against the same unrounded-Jaccard threshold), so recall is the only
    quality axis; it rises with n_bands (more, smaller bands → more candidate
    collisions) at the cost of a wider band shuffle.

    Production shape: run on a ``hash_sample`` slice (truth is O(n²) — that
    is WHY the banded path exists), tune (n_hashes, n_bands) until recall
    clears the bar, then run the banded pipeline alone on the full corpus."""
    base = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("shset"),
    )
    a = base.select(F.col("doc").alias("id_a"), F.col("shset").alias("sh_a"))
    b = base.select(F.col("doc").alias("id_b"), F.col("shset").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter((inter.cast("double") / union) >= jaccard_threshold)
        .select("id_a", "id_b")
    )
    found = minhash_lsh_pairs(
        df, text_col, id_col, k=k, n_hashes=n_hashes, n_bands=n_bands,
        jaccard_threshold=jaccard_threshold,
    ).select("id_a", "id_b", F.lit(1).alias("_in"))
    joined = truth.join(found, ["id_a", "id_b"], "left")
    # Empty truth set (possible on a small hash_sample slice): SUM over zero
    # rows is NULL — pin n_found_pairs to 0 and define recall as 1.0 (nothing
    # to find, nothing missed) so tuning scripts can compare numerically.
    return joined.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.coalesce(F.sum(F.coalesce(F.col("_in"), F.lit(0))), F.lit(0))
        .cast("bigint").alias("n_found_pairs"),
        F.coalesce(
            F.round(
                F.sum(F.coalesce(F.col("_in"), F.lit(0))).cast("double")
                / F.greatest(F.count(F.lit(1)), F.lit(1)),
                4,
            ),
            F.lit(1.0),
        ).alias("recall"),
    )


def dedup_cross_corpus(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Incremental-crawl dedup: keep only new-batch documents whose exact
    content does not already exist in a reference corpus (the
    every-recrawl-round pass — dedup the fresh crawl against everything
    already banked before it enters the training pool).

    Scale shape: BOTH sides collapse to md5 keys before any exchange — the
    reference corpus reduces to its DISTINCT hash set (map-side combine;
    text never shuffles) and the new batch ships (id, hash) only; the
    left-anti equi-join is one co-keyed shuffle at hash volume. Within-batch
    duplicates are not collapsed here (that is ``dedup_exact`` /
    ``dedup_survivors``); composing the two gives the full C4-style
    exact-dedup story for a rolling corpus.

    Output: (id, text_md5) survivors."""
    new_keys = new_df.select(
        F.col(id_col).alias("id"), text_key(F.col(text_col)).alias("text_md5")
    )
    ref_keys = ref_df.select(text_key(F.col(text_col)).alias("text_md5")).distinct()
    return new_keys.join(ref_keys, "text_md5", "left_anti").select("id", "text_md5")


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num: int = 4,
    den: int = 5,
) -> DataFrame:
    """One-sided near-dup pairs: containment C(A,B) = |A∩B| / min(|A|,|B|)
    over distinct word k-shingle sets, threshold num/den (default 4/5).

    This catches what symmetric Jaccard dedup structurally misses: an
    excerpt fully contained in a longer document has C = 1 but Jaccard ≈
    |excerpt|/|document| — below every LSH band threshold. (The RealNews /
    Common-Crawl overlap class; quoted-copy and page-plus-boilerplate
    duplicates look the same.)

    Scale shape — prefix filtering (the SSJoin/PPJoin family): order each
    doc's shingles by GLOBAL document frequency (rarest first; ties by gram
    — a deterministic total order), keep only the first
    n − ceil(t·n) + 1 as the doc's probe prefix. If C(A,B) ≥ t then
    |A∩B| ≥ ceil(t·n_min), so the SMALLER doc must have an intersection
    gram inside its prefix — probing every doc's prefix against the FULL
    gram table (asymmetric, the classic overlap-join fix) finds every
    qualifying pair with zero false negatives; the candidate join keys are
    by construction the corpus's RAREST grams, so the fan-out is
    skew-controlled where a naive shared-gram self-join explodes on hot
    boilerplate. Threshold math is integer-exact cross-engine:
    ceil(t·n) = (num·n + den − 1) // den and the final filter is the
    cross-multiplied den·|A∩B| ≥ num·min(|A|,|B|), never a float compare.

    Returns (id_a, id_b, containment) with id_a < id_b, containment
    rounded to 4dp.
    """
    from pyspark.sql import Window

    g = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("gram"),
    )
    sizes = g.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        g.join(freq, "gram")
        .join(sizes, "doc")
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("doc").orderBy("df", "gram")),
        )
    )
    # prefix length n - ceil(t*n) + 1, integer-exact
    ceil_tn = F.floor((F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den))
    prefix = ranked.filter(F.col("rnk") <= F.col("n") - ceil_tn + 1).select(
        "doc", "gram"
    )
    other = g.select(F.col("doc").alias("odoc"), "gram")
    cand = (
        prefix.join(other, "gram")
        .filter(F.col("doc") != F.col("odoc"))
        .select(
            F.least("doc", "odoc").alias("id_a"),
            F.greatest("doc", "odoc").alias("id_b"),
        )
        .distinct()
    )
    ga = g.select(F.col("doc").alias("id_a"), "gram")
    gb = g.select(F.col("doc").alias("id_b"), "gram")
    inter = (
        cand.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .filter(
            F.lit(den) * F.col("inter") >= F.lit(num) * F.least("n_a", "n_b")
        )
        .select(
            "id_a", "id_b",
            F.round(
                F.col("inter").cast("double") / F.least("n_a", "n_b"), 4
            ).alias("containment"),
        )
    )


# --- content-defined chunking (Rabin-style boundaries) -----------------------

def cdc_chunks(
    docs: DataFrame,
    mask_bits: int = 5,
    salt: str = "cdc1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking: split each document at TOKENS whose digest
    satisfies ``h % 2^mask_bits == 0`` (expected chunk length 2^mask_bits
    tokens). Because boundaries are a function of local content only — not
    of offsets — an insertion or deletion reshuffles just the one or two
    chunks it touches while every other chunk keeps its hash, which is the
    property that lets chunk-hash dedup catch shifted/partially-edited
    near-duplicates that fixed windows (dup_span_stats) and whole-doc
    hashes structurally miss (the rsync / LBFS / backup-dedup trick,
    Muthitacharoen et al. SOSP'01, applied to webtext).

    The boundary token CLOSES its chunk: chunk_id = running count of
    boundary tokens strictly BEFORE the current one — a closed-form window
    expression like chunk_sentences, no per-doc sequential state. Digest is
    the shared 48-bit md5 (sketches.digest48), so a SQL oracle reproduces
    the cut points exactly.

    Scale shape: Generate off the pruned scan, ONE doc-key window for the
    cumulative boundary count, one (doc, chunk) groupBy with map-side
    combine (AQE co-partitions it with the window exchange); ordered
    reassembly via array_sort(struct) — no second window. Token volume
    moves once.

    Returns (doc_id, chunk_id, n_tokens, chunk_hash) where chunk_hash =
    md5 of the space-joined chunk text — the key a groupBy/anti-join dedup
    consumes downstream."""
    from pyspark.sql import Window

    from crawl4ai_scraper_spark.operators.search import tokenize
    from crawl4ai_scraper_spark.operators.sketches import digest48

    mask = 1 << mask_bits
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
        .select(
            "doc_id",
            "pos",
            "term",
            F.when(digest48(F.col("term"), salt) % mask == 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("b"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = toks.select(
        "doc_id",
        "pos",
        "term",
        F.coalesce(F.sum("b").over(w), F.lit(0)).cast("int").alias("chunk_id"),
    )
    return (
        staged.groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "term"))),
                        lambda x: x["term"],
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        )
        .select("doc_id", "chunk_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "chunk_hash")
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    the MOSS algorithm): hash every k-gram, then in every window of ``w``
    consecutive k-gram hashes select the minimum (rightmost on ties). The
    selected set is position-aware and LOCAL — any shared substring of
    length ≥ w+k-1 between two documents is guaranteed to share a
    fingerprint, with expected density 2/(w+1) instead of all n grams.
    This is the fingerprint family for plagiarism-style overlap detection
    where MinHash's whole-document Jaccard is too coarse.

    Scale shape: the gram stream is ONE row per token position (md5 only,
    never text — shared with dup_span_stats); selection is a doc-keyed
    running-window MIN (one exchange on doc id), dedup of the selected
    (pos, hash) pairs rides the same partitioning. Docs with fewer than
    w complete windows yield no fingerprints (below the guarantee length).
    Returns (id, pos, fp) — pos is the k-gram start token offset."""
    from pyspark.sql import Window

    base, wins = _span_windows(df, text_col, id_col, k)
    frame = Window.partitionBy("id").orderBy("s").rowsBetween(Window.currentRow, w - 1)
    sel = wins.select(
        "id",
        # min struct = (smallest hash, then most-negative -s = RIGHTMOST tie)
        F.min(F.struct(F.col("h"), (-F.col("s")).alias("ns"))).over(frame).alias("m"),
        F.count(F.lit(1)).over(frame).alias("wn"),
    ).filter(F.col("wn") == w)
    return (
        sel.select(
            "id",
            (-F.col("m.ns")).cast("int").alias("pos"),
            F.col("m.h").alias("fp"),
        )
        .distinct()
    )


def mirror_host_pairs(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    max_hosts_per_hash: int = 8,
    min_shared: int = 2,
) -> DataFrame:
    """MIRROR detection: host pairs that serve the same content (exact-text
    hash overlap) — the www./m./CDN/alias clusters a crawler must collapse
    before host-level budgets and rank make sense.

    Shape: distinct (md5(text), host) → per-hash host-degree count; hashes
    shared by > ``max_hosts_per_hash`` hosts are DROPPED before pairing
    (universal boilerplate — empty pages, parked-domain templates — would
    otherwise explode degree² pairs per hash; real mirrors are low-degree).
    The pair join is then equi on the hash with bounded fan-out, and the
    (host_a, host_b) groupBy is map-side combined. ``containment`` =
    shared / min(|texts_a|, |texts_b|) — 1.0 means the smaller host is a
    full mirror of the larger.
    Returns (host_a, host_b, shared, containment)."""
    hh = docs.select(
        F.md5(F.col(text_col)).alias("h"), F.col(host_col).alias("host")
    ).distinct()
    deg = hh.groupBy("h").agg(F.count(F.lit(1)).alias("nh"))
    ok = hh.join(
        deg.filter((F.col("nh") >= 2) & (F.col("nh") <= max_hosts_per_hash)).select("h"),
        "h",
    )
    per_host = hh.groupBy("host").agg(F.count(F.lit(1)).alias("n_texts"))
    pairs = (
        ok.select("h", F.col("host").alias("host_a"))
        .join(ok.select("h", F.col("host").alias("host_b")), "h")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            per_host.select(F.col("host").alias("host_a"), F.col("n_texts").alias("n_a")),
            "host_a",
        )
        .join(
            per_host.select(F.col("host").alias("host_b"), F.col("n_texts").alias("n_b")),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.round(
                F.col("shared").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )


def fuzzy_decontaminate(
    train: DataFrame,
    evals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    eval_id_col: str = "eval_id",
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """NEAR-DUPLICATE decontamination: flag training documents whose
    shingle-set Jaccard against ANY eval/benchmark document clears the
    threshold — the paraphrased / partially-edited leakage that exact
    n-gram matching (textops.decontaminate_ngrams) misses entirely.

    Asymmetric LSH: the eval set is benchmark-sized (10^3-10^5 docs), so its
    banded hashes AND shingle sets are BROADCAST; the training side explodes
    to n_bands scalar rows per doc (never carrying shingles — the
    minhash_lsh_pairs convention) and candidates come from a broadcast band
    equi-join. The only corpus-volume shuffle is the train-side shingle
    join-back, co-keyed on the train id. Verification is exact Jaccard.
    Returns (id, eval_id, jaccard) — one row per contaminated (train, eval)
    pair; anti-join the distinct ids to purge."""
    t_band = band_table(
        train, text_col, id_col, k=k, n_hashes=n_hashes, n_bands=n_bands
    )
    e_band = band_table(
        evals, eval_text_col, eval_id_col,
        k=k, n_hashes=n_hashes, n_bands=n_bands, id_out="eval_id",
    )

    cand = (
        t_band.join(F.broadcast(e_band), ["band", "bhash"])
        .select("id", "eval_id")
        .dropDuplicates(["id", "eval_id"])
    )
    t_sh = train.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("sh_t"),
    )
    e_sh = evals.select(
        F.col(eval_id_col).alias("eval_id"),
        F.array_distinct(shingles(F.col(eval_text_col), k)).alias("sh_e"),
    )
    pairs = cand.join(t_sh, "id").join(F.broadcast(e_sh), "eval_id")
    inter = F.size(F.array_intersect(F.col("sh_t"), F.col("sh_e")))
    union = F.size(F.array_union(F.col("sh_t"), F.col("sh_e")))
    # Unrounded-threshold convention (see minhash_lsh_pairs): rounding is
    # display-only, never part of the keep/drop decision.
    raw = inter.cast("double") / union
    return (
        pairs.filter(raw >= jaccard_threshold)
        .select("id", "eval_id", F.round(raw, 4).alias("jaccard"))
    )


def band_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
    id_out: str = "id",
    carry: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(<id_out>, [carry...,] band, bhash) rows — the bucketed near-dup key
    stream shared by the batch LSH pairs join, the eval decontaminator
    (``fuzzy_decontaminate``), and the streaming near-dup screen
    (``streaming.ingest.near_dup_flags_stream``). Pure column expressions
    (shingle → minhash → band), so it works identically on batch and
    streaming frames; the output carries only scalar columns, never the
    shingles. ``carry`` passes extra columns through untouched (the stream's
    event-time column rides along for its watermark)."""
    rows_per_band = n_hashes // n_bands
    extra = list(carry or [])
    base = df.select(
        F.col(id_col).alias(id_out),
        *[F.col(c) for c in extra],
        shingles(F.col(text_col), k).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    return base.select(
        id_out,
        *extra,
        F.explode(lsh_bands(F.col("sig"), n_bands, rows_per_band)).alias("b"),
    ).select(
        id_out, *extra, F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash")
    )


def host_boilerplate_strip(
    df: DataFrame,
    text_col: str,
    id_col: str,
    host_col: str,
    seg_words: int = 3,
    min_docs: int = 3,
    ratio_pct: int = 10,
) -> DataFrame:
    """Host-scoped boilerplate removal (the CCNet / Onion "common lines per
    site" pass): a segment is boilerplate on host H when it appears in at
    least ``min_docs`` distinct documents of H AND in at least ``ratio_pct``
    percent of H's documents — nav bars, cookie banners, footers repeat on
    most pages of a site, body text does not. Flagged segments are stripped
    from that host's documents only (the same words on another host are
    untouched — host-conditioning is what separates this from global
    ``segment_dedup``, which keeps ONE copy corpus-wide; here every doc loses
    ALL copies of its host's chrome but cross-host repeats survive).

    Real pipelines split on line/paragraph boundaries; the synthetic corpus
    is single-line, so consecutive ``seg_words``-word segments stand in
    (same convention as ``segment_dedup``).

    Threshold math is integer-exact cross-engine:
    ``nd >= min_docs AND nd * 100 >= ratio_pct * host_docs`` — no float
    ratios, no rounding mode to disagree on.

    Scale shape (the plan that survives a 100-TB corpus):
    * segment stream keyed by (host, md5(seg)) — ONE shuffle at segment
      volume with map-side combine (a banner repeated on 10^6 pages of one
      host contributes one row per input partition to the shuffle);
    * host doc counts are a |hosts|-row broadcast;
    * the boilerplate set joins back on the SAME (host, skey) partitioning
      (AQE reuses the exchange) as a left-anti keep-join;
    * one doc-key shuffle reassembles survivors positionally.

    Output: (<id_col>, <host_col>, n_segments, n_kept, clean_text) — docs
    made of nothing but boilerplate vanish (0 surviving segments), matching
    the oracle's GROUP BY over kept rows.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
    n_segs = F.ceil(F.size(toks) / F.lit(float(seg_words))).cast("bigint")
    seg_arr = F.transform(
        F.sequence(F.lit(0), (n_segs - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i * seg_words + 1, seg_words)),
    )
    base = df.select(
        F.col(id_col),
        F.col(host_col),
        n_segs.alias("n_segments"),
        F.posexplode(seg_arr).alias("pos", "seg"),
    ).withColumn("skey", F.md5("seg"))
    host_docs = df.groupBy(host_col).agg(F.count(F.lit(1)).alias("host_docs"))
    hostline = base.groupBy(host_col, "skey").agg(
        F.countDistinct(id_col).alias("nd")
    )
    boiler = (
        hostline.join(F.broadcast(host_docs), host_col)
        .where(
            (F.col("nd") >= F.lit(min_docs))
            & (F.col("nd") * 100 >= F.lit(ratio_pct) * F.col("host_docs"))
        )
        .select(host_col, "skey")
    )
    kept = base.join(boiler, [host_col, "skey"], "left_anti")
    return kept.groupBy(id_col).agg(
        F.first(host_col).alias(host_col),
        F.first("n_segments").alias("n_segments"),
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )


def near_dup_threshold_sweep(
    df: DataFrame,
    text_col: str,
    id_col: str,
    thresholds,
    k: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Dedup-threshold planning in ONE near-dup pass: for every candidate
    threshold t, how many verified pairs have Jaccard >= t and how many
    distinct documents those pairs touch (the upper bound on what a dedup
    at t would remove). This is the sweep a pipeline runs BEFORE committing
    a full-corpus dedup — the pair counts fall off a cliff at the boundary
    between "same page re-rendered" and "same template, different article",
    and that cliff is corpus-specific.

    Cost: the LSH candidate stream (id-only band join) and exact-Jaccard
    verify are computed ONCE; the |thresholds|-way fan-out happens on the
    verified PAIR rows (tiny relative to the corpus), never on documents.

    Output: (threshold, n_pairs, n_docs), one row per threshold — zero-pair
    thresholds still appear (counts 0).
    """
    cand = lsh_candidate_jaccard(df, text_col, id_col, k, n_hashes, n_bands)
    tcol = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    hits = cand.select(tcol, "id_a", "id_b", "j").filter(
        F.col("j") >= F.col("threshold")
    )
    pair_counts = hits.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    docs = hits.select("threshold", F.col("id_a").alias("d")).unionByName(
        hits.select("threshold", F.col("id_b").alias("d"))
    )
    doc_counts = docs.groupBy("threshold").agg(
        F.countDistinct("d").alias("n_docs")
    )
    grid = df.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    return (
        grid.join(pair_counts, "threshold", "left")
        .join(doc_counts, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
        )
    )
