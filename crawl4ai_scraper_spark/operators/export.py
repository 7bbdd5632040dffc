"""Training-data export: deterministic token-budgeted sharding of the corpus
into JSONL files plus a manifest.

The last mile of the pipeline: after dedup/filter/mixing, the corpus ships
to the trainer as N roughly-equal shards whose layout must be REPRODUCIBLE
(resume a half-finished export, or re-run and get byte-identical shards).
Random repartition can't promise that; this uses the same two-phase global
cumsum as ``packing.sequence_pack`` — documents laid end-to-end in id order,
a doc belongs to the shard its FIRST token lands in — so shard membership is
a pure function of (corpus, target_tokens), computed without any
whole-corpus single-partition window.

Shard sizes: every shard except possibly the last holds ≥ target_tokens −
(max doc len − 1) and < target_tokens + max doc len tokens; exact counts go
in the manifest, nothing is silently dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.operators.packing import sequence_pack


def whitespace_token_count(text: Column) -> Column:
    """Token count convention shared with mixture_rebalance's oracle: zero
    for blank text, else whitespace-split length."""
    return (
        F.when(F.length(F.trim(text)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(text), r"\s+")))
        .cast("long")
    )


def shard_plan(
    docs: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    token_count: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, cum_before, shard_id, offset_in_shard) — the
    deterministic layout. Identical math to sequence packing with
    seq_len = target_tokens; named separately because the downstream
    contract differs (shards are files, sequences are training rows)."""
    tc = token_count if token_count is not None else whitespace_token_count(F.col(text_col))
    plan = sequence_pack(docs, id_col, tc, seq_len=target_tokens)
    return plan.withColumnsRenamed(
        {"seq_id": "shard_id", "offset_in_seq": "offset_in_shard"}
    )


def shard_manifest(plan: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-shard audit row: (shard_id, n_docs, shard_tokens, first_doc,
    last_doc). One bounded groupBy over the plan."""
    return plan.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def write_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    target_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "error",
) -> DataFrame:
    """Materialize the export: JSONL files under ``out_dir/shard_id=N/`` via
    ``partitionBy`` (each shard's rows co-located by an explicit
    repartition on shard_id first, so a shard is one writer task → one
    file per shard, not one file per (task × shard)), and the manifest as
    JSON under ``out_dir/_manifest/``. Returns the manifest DataFrame.

    The manifest directory name starts with ``_`` so Spark/Hadoop readers
    of ``out_dir`` ignore it as metadata, mirroring ``_SUCCESS`` semantics.
    """
    plan = shard_plan(docs, target_tokens, id_col=id_col, text_col=text_col)
    assigned = docs.join(
        plan.select(id_col, "shard_id", "n_tokens"), id_col
    )
    (
        assigned.repartition("shard_id")
        .write.partitionBy("shard_id")
        .mode(mode)
        .json(out_dir)
    )
    manifest = shard_manifest(plan, id_col=id_col)
    manifest.coalesce(1).write.mode("overwrite").json(f"{out_dir}/_manifest")
    return manifest
