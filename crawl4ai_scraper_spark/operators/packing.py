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
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_col`` order
    (the sum of all STRICTLY EARLIER rows), without a whole-corpus
    single-partition window. ``order_col`` must be a non-negative integral
    total order (doc ids, arrival ranks)."""
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
    local = F.coalesce(
        F.sum(value_col).over(
            Window.partitionBy("_b").orderBy(order_col)
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
