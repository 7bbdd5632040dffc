"""Sequence packing for training-data prep: assign documents to fixed-size
token sequences by a deterministic global order.

The hard part at 100 TB is the GLOBAL running sum: ``sum(n_tokens) OVER
(ORDER BY doc_id)`` is a single-partition window — one task sorts and scans
the whole corpus. ``global_cumsum`` replaces it with the same two-phase
shape as ``plans.ranking.global_rank`` / ``politeness.bucketed_rank``:

  1. per-bucket (``order_col DIV bucket_size``) sums → running offsets over
     BUCKET IDS (corpus_size / bucket_size rows — thousands, not billions —
     through the one tiny ordering window);
  2. an exclusive within-bucket cumsum (≤ bucket_size rows per window
     partition) plus the bucket offset.

All math is BIGINT — exact, order-free, oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    bucket_size: int = 1 << 16,
    tiebreak: str | None = None,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_col`` order
    (the sum of all STRICTLY EARLIER rows), without a whole-corpus
    single-partition window. ``order_col`` must be a non-negative integral
    total order (doc ids, arrival ranks) — or, with ``tiebreak``, a
    non-negative integral PARTIAL order made total by the tiebreak column
    (hash order keys, where rare equal digests must still sum in one
    well-defined engine-independent order)."""
    df = df.withColumn("_b", F.expr(f"{order_col} DIV {bucket_size}"))
    offsets = (
        df.groupBy("_b").agg(F.sum(value_col).alias("_s"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_s").over(
                    Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_b", "_off")
    )
    order_cols = [order_col] + ([tiebreak] if tiebreak else [])
    local = F.coalesce(
        F.sum(value_col).over(
            Window.partitionBy("_b").orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        df.join(offsets, "_b")
        .withColumn(out_col, (F.col("_off") + local).cast("long"))
        .drop("_b", "_off")
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    seq_len: int,
    bucket_size: int = 1 << 16,
) -> DataFrame:
    """Greedy in-order packing: documents are laid end-to-end in ``id_col``
    order into sequences of ``seq_len`` tokens; each doc reports the
    sequence its FIRST token lands in and the offset within it. (A doc may
    straddle a boundary — the downstream tokenizer decides truncate vs
    continue; this operator fixes the deterministic layout.)

    Output: (id, n_tokens, cum_before, seq_id, offset_in_seq); integer math
    throughout."""
    counted = df.select(F.col(id_col), token_count.cast("long").alias("n_tokens"))
    c = global_cumsum(counted, id_col, "n_tokens", bucket_size=bucket_size)
    return c.select(
        F.col(id_col),
        "n_tokens",
        "cum_before",
        F.expr(f"cum_before DIV {seq_len}").alias("seq_id"),
        (F.col("cum_before") % seq_len).alias("offset_in_seq"),
    )


def pack_token_ids(
    enc: DataFrame,
    id_col: str,
    ids_col: str,
    seq_len: int,
    bucket_size: int = 1 << 16,
    shuffle_bucket_size: int = 1 << 33,
    complete_only: bool = True,
    eos_id: int | None = None,
    shuffle_salt: str | None = None,
) -> DataFrame:
    """MATERIALIZE the training sequences ``sequence_pack`` only lays out:
    documents' token-id arrays (from ``vocab_encode`` / ``bpe_encode_ids``)
    are laid end-to-end in ``id_col`` order and exploded to one row per
    token position → ``(seq_id, pos_in_seq, token_id, <id_col>)``.

    Global position = two-phase ``global_cumsum`` offset + the token's index
    in its document — no whole-corpus window. ``complete_only`` keeps only
    sequences with all ``seq_len`` positions filled (the trailing partial
    sequence is dropped via a broadcast single-row total, the usual
    drop-last of training loaders). ``eos_id`` appends a document separator
    to every doc's ids before layout (GPT-style packing; the EOS position is
    attributed to its document). Docs with empty id arrays contribute
    nothing and never shift the layout.

    ``shuffle_salt`` switches the layout from id order to the
    deterministic pseudo-random order of ``corpus_shuffle_pack`` (48-bit
    md5 order key, (digest, id)-totalized) — the per-epoch training
    shuffle, materialized.  The shuffle path buckets the 2^48 digest space
    with ``shuffle_bucket_size`` (must divide 2^48); ``bucket_size`` only
    applies to the id-order path, where keys are dense doc ids."""
    ids = F.col(ids_col)
    if eos_id is not None:
        # only docs that contribute tokens get a separator — an empty doc
        # must not materialize as a lone EOS
        ids = F.when(
            F.size(ids) > 0,
            F.concat(ids, F.array(F.lit(int(eos_id)).cast("int"))),
        ).otherwise(ids)
    counted = enc.select(
        F.col(id_col), ids.alias("_ids")
    ).withColumn("n_tokens", F.size("_ids").cast("long"))
    nonempty = counted.filter(F.col("n_tokens") > 0)
    if shuffle_salt is not None:
        ord48 = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(shuffle_salt + ":"),
                               F.col(id_col).cast("string"))), 1, 12
            ),
            16, 10,
        ).cast("bigint")
        c = global_cumsum(
            nonempty.withColumn("_ord", ord48),
            "_ord",
            "n_tokens",
            bucket_size=shuffle_bucket_size,
            tiebreak=id_col,
        ).drop("_ord")
    else:
        c = global_cumsum(
            nonempty,
            id_col,
            "n_tokens",
            bucket_size=bucket_size,
        )
    ex = c.select(
        F.col(id_col),
        "cum_before",
        F.posexplode("_ids").alias("pos", "token_id"),
    )
    gp = F.col("cum_before") + F.col("pos")
    out = ex.select(
        F.expr(f"(cum_before + pos) DIV {seq_len}").alias("seq_id"),
        (gp % seq_len).cast("long").alias("pos_in_seq"),
        F.col("token_id").cast("int").alias("token_id"),
        F.col(id_col),
    )
    if complete_only:
        tot = counted.agg(F.sum("n_tokens").alias("_tot"))
        out = (
            out.crossJoin(F.broadcast(tot))
            .filter((F.col("seq_id") + 1) * seq_len <= F.col("_tot"))
            .drop("_tot")
        )
    return out


def packed_sequences(
    packed: DataFrame,
    id_col: str,
    seq_len: int,
) -> DataFrame:
    """Collapse ``pack_token_ids`` rows to one row per training sequence →
    ``(seq_id, n_docs, token_ids array<int>)`` — the tensor the training
    loader reads. One groupBy over seq_id (uniform keys, ≤ seq_len rows per
    group); position order restored by the in-group array sort."""
    return packed.groupBy("seq_id").agg(
        F.countDistinct(F.col(id_col)).cast("long").alias("n_docs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos_in_seq", "token_id"))),
            lambda s: s["token_id"],
        ).alias("token_ids"),
    )


def corpus_shuffle_pack(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    seq_len: int,
    salt: str = "sh1",
    bucket_size: int = 1 << 33,
) -> DataFrame:
    """SHUFFLED sequence packing: the same greedy end-to-end layout as
    ``sequence_pack``, but in deterministic PSEUDO-RANDOM order instead of
    id order — the training-order shuffle SGD needs (id order is crawl
    order: one host's pages would otherwise fill whole batches), computed
    without any RNG state and identical across runs, engines, partitionings
    and cluster sizes.

    Order key = the 48-bit md5 prefix of (salt:id) as a BIGINT; the global
    exclusive cumsum runs through the same two-phase bucketed shape as
    ``sequence_pack`` (``bucket_size`` covers the 2^48 digest space in
    2^15 value-range buckets — uniform digests make the per-bucket row
    counts uniform, so every window partition stays bounded). Digest
    collisions (P ≈ n²/2^49) are made harmless, not assumed away: the
    in-bucket window orders by (digest, id), a total order both engines
    agree on.

    A different ``salt`` is a fresh, independent epoch shuffle — the
    standard per-epoch reshuffle is |epochs| cheap plan re-runs, no
    materialized permutation table.

    Output: (id, shuffle_key, n_tokens, cum_before, seq_id, offset_in_seq).
    """
    ord48 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 12
        ),
        16, 10,
    ).cast("bigint")
    counted = df.select(
        F.col(id_col),
        ord48.alias("shuffle_key"),
        token_count.cast("long").alias("n_tokens"),
    )
    c = global_cumsum(
        counted, "shuffle_key", "n_tokens",
        bucket_size=bucket_size, tiebreak=id_col,
    )
    return c.select(
        F.col(id_col),
        "shuffle_key",
        "n_tokens",
        "cum_before",
        F.expr(f"cum_before DIV {seq_len}").alias("seq_id"),
        (F.col("cum_before") % seq_len).alias("offset_in_seq"),
    )


def curriculum_shuffle_pack(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    quality_band: Column,
    seq_len: int,
    salt: str = "cu1",
    bucket_size: int = 1 << 33,
) -> DataFrame:
    """Curriculum packing: sequences fill in QUALITY-BAND-major order —
    band 0 (e.g. highest-quality ntile) first, then band 1, ... — with the
    deterministic md5 shuffle of ``corpus_shuffle_pack`` WITHIN each band.
    This is the curriculum-learning data order (easy/clean first, noisy
    tail last) without sacrificing the in-band shuffle SGD needs; an
    anti-curriculum or staged-mix is just a different band expression.

    Order key = band * 2^48 + digest48 — one BIGINT (bands < 2^15 keep it
    inside 63 bits), so the same two-phase bucketed cumsum machinery
    applies unchanged: band boundaries fall on bucket boundaries
    (``bucket_size`` divides 2^48), per-bucket counts stay uniform within
    each band, ties totalized by (key, id) in both engines.

    ``quality_band`` must be a non-negative integral column expression
    (e.g. ``F.ntile`` output minus 1, or a CASE over score cuts) that is
    itself deterministic.

    Output: (id, band, shuffle_key, n_tokens, cum_before, seq_id,
    offset_in_seq).
    """
    dig48 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 12
        ),
        16, 10,
    ).cast("bigint")
    band_raw = quality_band.cast("bigint")
    # band * 2^48 + digest must fit 63 bits: fail loudly on band outside
    # [0, 2^15) instead of silently overflowing to a negative order key.
    band = F.when(
        (band_raw >= 0) & (band_raw < 32768), band_raw
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("curriculum_shuffle_pack: quality_band out of [0, 32768): "),
                band_raw.cast("string"),
            )
        )
    )
    counted = df.select(
        F.col(id_col),
        band.alias("band"),
        dig48.alias("shuffle_key"),
        token_count.cast("long").alias("n_tokens"),
    ).withColumn(
        "_ord", F.col("band") * F.lit(281474976710656) + F.col("shuffle_key")
    )
    c = global_cumsum(
        counted, "_ord", "n_tokens", bucket_size=bucket_size, tiebreak=id_col
    ).drop("_ord")
    return c.select(
        F.col(id_col),
        "band",
        "shuffle_key",
        "n_tokens",
        "cum_before",
        F.expr(f"cum_before DIV {seq_len}").alias("seq_id"),
        (F.col("cum_before") % seq_len).alias("offset_in_seq"),
    )


def layout_adjacency_stats(
    plan: DataFrame,
    attrs: DataFrame,
    id_col: str,
    attr_col: str,
    label: str,
) -> DataFrame:
    """Shuffle-quality diagnostic for a packing layout: of all ADJACENT
    document pairs in the training order, what fraction shares the same
    attribute (host, language, source shard)? Crawl order feeds whole runs
    of one host into consecutive batches (same_ratio near 1 for a
    host-grouped layout); a good shuffle drives it to ~1/|attr values|.
    Run over both layouts, the two rows are the before/after evidence the
    data-order stage ships with.

    The trick: NO global window. A doc's successor in the layout is the
    row whose ``cum_before`` equals this row's ``cum_before + n_tokens``
    (strictly increasing when every doc has tokens — zero-token docs are
    excluded, they'd self-pair), so adjacency is ONE co-partitioned
    equi-join on the offset key, at any corpus size.

    Output: one row (layout, n_pairs, n_same, same_ratio 4dp).
    """
    a = (
        plan.select(F.col(id_col), "cum_before", "n_tokens")
        .filter(F.col("n_tokens") > 0)
        .join(attrs.select(F.col(id_col), F.col(attr_col).alias("_attr")), id_col)
    )
    left = a.select(
        (F.col("cum_before") + F.col("n_tokens")).alias("k"),
        F.col("_attr").alias("attr_a"),
    )
    right = a.select(F.col("cum_before").alias("k"), F.col("_attr").alias("attr_b"))
    pairs = left.join(right, "k")
    # coalesce: a layout with <2 nonzero-token docs has no pairs — report an
    # explicit 0-count row (n_same=0, same_ratio NULL-gated), not NULLs.
    same = F.coalesce(
        F.sum(F.when(F.col("attr_a") == F.col("attr_b"), 1).otherwise(0)),
        F.lit(0),
    )
    n_pairs = F.count(F.lit(1))
    return (
        pairs.agg(
            n_pairs.alias("n_pairs"),
            same.cast("bigint").alias("n_same"),
            F.when(
                n_pairs > 0, F.round(same.cast("double") / n_pairs, 4)
            ).alias("same_ratio"),
        )
        .withColumn("layout", F.lit(label))
        .select("layout", "n_pairs", "n_same", "same_ratio")
    )
