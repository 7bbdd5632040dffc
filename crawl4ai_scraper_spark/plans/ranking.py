"""Scalable global total-order ranking.

The BFS needs a GLOBAL visit sequence (SURVEY §2 O-24): every frontier row of
a round gets ``arrival_rank`` = its position in the reference's FIFO queue.
A naive ``row_number() OVER (ORDER BY …)`` collapses to one partition — fine
at 10^3 rows, fatal at 10^8. This does the classic two-phase rank instead:

  1. range-repartition by the order columns (RangePartitioner gives
     partition i < partition j ⇒ all keys in i sort before j),
  2. local ``row_number`` within each partition,
  3. add per-partition offsets (a tiny driver-side cumulative sum — one count
     per partition, NOT per row).

Wall-clock is one shuffle + one tiny collect; no single-partition sort ever.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: List[str], out_col: str = "arrival_rank",
                num_partitions: int | None = None, caches: list | None = None) -> DataFrame:
    """Attach a 1-based dense global rank by ``order_cols`` (must be a total
    order — ties would make the rank nondeterministic). Persisted
    intermediates are appended to ``caches`` (if given) so the caller can
    unpersist them once the result is materialized."""
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn("_part", F.spark_partition_id())
    # RangePartitioner SAMPLES its boundaries — two executions of the same
    # plan can partition differently. Pin one materialization so the offset
    # job and the rank job see identical partitions.
    ranged = ranged.persist()
    if caches is not None:
        caches.append(ranged)
    local = F.row_number().over(
        Window.partitionBy("_part").orderBy(*[F.col(c) for c in order_cols])
    )
    ranked = ranged.withColumn("_local", local)

    counts = {r["_part"]: r["cnt"] for r in
              ranged.groupBy("_part").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for part in sorted(counts):
        offsets[part] = acc
        acc += counts[part]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))

    offset_map = F.create_map(
        *[F.lit(x) for pair in offsets.items() for x in pair]
    )
    return (
        ranked.withColumn(out_col, (F.element_at(offset_map, F.col("_part")) + F.col("_local")).cast("long"))
        .drop("_part", "_local")
    )
