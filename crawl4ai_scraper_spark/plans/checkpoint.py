"""Checkpointed crawl rounds — Parquet delta snapshots with atomic manifests.

Layout under a checkpoint root:

    state/visited/round=N/…    append-only deltas, one partition per round
    state/lineage/round=N/…
    round=NNNN/frontier/…      the FULL queue for round N (url, host, depth,
                               arrival_rank, parent_url, link_pos, round)
    round=NNNN/manifest.json   written LAST via tmp+rename → commit marker

The frontier snapshot doubles as two more tables, so a round commits THREE
writes instead of five:

* ever-enqueued set  = ∪ frontier snapshots 0..N (the queue never holds
  duplicates, so the union of queues IS the reference's visited ∪ to_visit
  membership test, crawler.py:223);
* edges table        = frontier rows' (parent_url → url, link_pos), minus the
  parentless seed rows.

Commit protocol (Iceberg-shaped on purpose — no Iceberg jars ship with this
PySpark build, but swapping these writes for ``writeTo(...).append()`` +
snapshot metadata is mechanical):

* Cumulative tables are written as per-round DELTAS using dynamic partition
  overwrite, so re-running a crashed round replaces exactly its own
  ``round=N`` partition — no duplicates, no O(rounds²) rewrite of state that
  at 10^10-URL scale is terabytes.
* A round is visible iff its manifest exists. Readers enumerate committed
  rounds / filter ``round <= last_committed``, so orphan files from a dead
  half-written round are invisible (and get overwritten on retry).
* Reading state back each round truncates the iterative plan lineage — the
  DAG never grows across rounds (SURVEY §4.2).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELTA_TABLES = ("visited", "lineage")

# Bump when the on-disk layout changes incompatibly. Format 2: enqueued/edges
# are DERIVED from frontier snapshots carrying (parent_url, link_pos); format-1
# checkpoints (separate state/enqueued + state/edges tables, frontier without
# parent columns) cannot be resumed by this code.
CHECKPOINT_FORMAT = 2


def check_format(manifest: Dict, chk_dir: str) -> None:
    """Fail resume EARLY and clearly on a checkpoint written by an
    incompatible layout (instead of an AnalysisException mid-plan)."""
    found = manifest.get("format", 1)
    if found != CHECKPOINT_FORMAT:
        raise ValueError(
            f"checkpoint at {chk_dir} has layout format {found}, this engine "
            f"writes format {CHECKPOINT_FORMAT}; re-run the crawl from scratch "
            "(old checkpoints cannot be resumed across layout changes)"
        )


def _state_dir(chk_dir: str, name: str) -> str:
    return os.path.join(chk_dir, "state", name)


def round_dir(chk_dir: str, rnd: int) -> str:
    return os.path.join(chk_dir, f"round={rnd:04d}")


def _coalesced(df: DataFrame, rows: Optional[int]) -> DataFrame:
    """Right-size a snapshot write: small states become a handful of files
    instead of one near-empty file per shuffle partition (metadata pressure ×
    rounds × tables at 10^10 scale)."""
    if rows is None:
        return df
    return df.coalesce(max(1, min(64, rows // 250_000 + 1)))


def commit_round(
    chk_dir: str,
    rnd: int,
    frontier_next: DataFrame,
    deltas: Dict[str, DataFrame],
    meta: Dict,
    sizes: Optional[Dict[str, int]] = None,
) -> None:
    """Write this round's deltas + next frontier, then the manifest marker.
    ``sizes`` (rows per table name, plus "frontier") drives file coalescing."""
    spark = frontier_next.sparkSession
    sizes = sizes or {}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for name, df in deltas.items():
        (
            _coalesced(df, sizes.get(name))
            .withColumn("round", F.lit(rnd))
            .write.mode("overwrite")
            .partitionBy("round")
            .parquet(_state_dir(chk_dir, name))
        )
    base = round_dir(chk_dir, rnd)
    (
        _coalesced(frontier_next, sizes.get("frontier"))
        .withColumn("round", F.lit(rnd))
        .write.mode("overwrite")
        .parquet(os.path.join(base, "frontier"))
    )

    manifest = dict(meta)
    manifest["round"] = rnd
    manifest["format"] = CHECKPOINT_FORMAT
    tmp = os.path.join(base, ".manifest.tmp")
    os.makedirs(base, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(base, "manifest.json"))  # atomic commit


def read_state(spark: SparkSession, chk_dir: str, name: str, upto_round: int) -> DataFrame:
    """Cumulative view of a delta table at round ``upto_round`` (inclusive).
    The round filter is partition pruning — orphan rounds never get read."""
    df = spark.read.parquet(_state_dir(chk_dir, name))
    return df.filter(F.col("round") <= upto_round)


def _frontier_paths(chk_dir: str, upto_round: int) -> list:
    return [os.path.join(round_dir(chk_dir, r), "frontier") for r in range(upto_round + 1)]


def read_frontier(spark: SparkSession, chk_dir: str, rnd: int) -> DataFrame:
    """The round-``rnd`` queue, trimmed to the loop's working columns."""
    return spark.read.parquet(os.path.join(round_dir(chk_dir, rnd), "frontier")).select(
        "url", "host", "depth", "arrival_rank"
    )


def read_enqueued(spark: SparkSession, chk_dir: str, upto_round: int) -> DataFrame:
    """Ever-enqueued URL set ≡ union of the committed frontier snapshots."""
    return spark.read.parquet(*_frontier_paths(chk_dir, upto_round)).select("url")


def read_edges(spark: SparkSession, chk_dir: str, upto_round: int) -> DataFrame:
    """Edges view over the frontier snapshots (seed rows have no parent)."""
    df = spark.read.parquet(*_frontier_paths(chk_dir, upto_round))
    return df.filter(F.col("parent_url").isNotNull()).select(
        "parent_url", F.col("url").alias("child_url"), "link_pos", "round"
    )


def latest_round(chk_dir: str) -> Optional[int]:
    if not os.path.isdir(chk_dir):
        return None
    best = None
    for entry in os.listdir(chk_dir):
        if entry.startswith("round=") and os.path.exists(
            os.path.join(chk_dir, entry, "manifest.json")
        ):
            best = max(best if best is not None else -1, int(entry.split("=")[1]))
    return best


def load_manifest(chk_dir: str, rnd: int) -> Dict:
    with open(os.path.join(round_dir(chk_dir, rnd), "manifest.json")) as fh:
        return json.load(fh)
