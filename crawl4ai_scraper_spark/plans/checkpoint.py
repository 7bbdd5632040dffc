"""Checkpointed crawl rounds — Parquet delta snapshots with atomic manifests.

Layout under a checkpoint root:

    state/visited/round=N/…    append-only deltas, one partition per round
    state/enqueued/round=N/…   (url set delta)
    state/edges/round=N/…
    state/lineage/round=N/…
    round=NNNN/frontier/…      the FULL queue for round N (small)
    round=NNNN/manifest.json   written LAST via tmp+rename → commit marker

Commit protocol (Iceberg-shaped on purpose — no Iceberg jars ship with this
PySpark build, but swapping these writes for ``writeTo(...).append()`` +
snapshot metadata is mechanical):

* Cumulative tables are written as per-round DELTAS using dynamic partition
  overwrite, so re-running a crashed round replaces exactly its own
  ``round=N`` partition — no duplicates, no O(rounds²) rewrite of state that
  at 10^10-URL scale is terabytes.
* A round is visible iff its manifest exists. Readers filter
  ``round <= last_committed``, so orphan files from a dead half-written round
  are invisible (and get overwritten on retry).
* Reading state back each round truncates the iterative plan lineage — the
  DAG never grows across rounds (SURVEY §4.2).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELTA_TABLES = ("visited", "enqueued", "edges", "lineage")


def _state_dir(chk_dir: str, name: str) -> str:
    return os.path.join(chk_dir, "state", name)


def round_dir(chk_dir: str, rnd: int) -> str:
    return os.path.join(chk_dir, f"round={rnd:04d}")


def commit_round(
    chk_dir: str,
    rnd: int,
    frontier_next: DataFrame,
    deltas: Dict[str, DataFrame],
    meta: Dict,
) -> None:
    """Write this round's deltas + next frontier, then the manifest marker."""
    spark = frontier_next.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for name, df in deltas.items():
        (
            df.withColumn("round", F.lit(rnd))
            .write.mode("overwrite")
            .partitionBy("round")
            .parquet(_state_dir(chk_dir, name))
        )
    base = round_dir(chk_dir, rnd)
    frontier_next.write.mode("overwrite").parquet(os.path.join(base, "frontier"))

    manifest = dict(meta)
    manifest["round"] = rnd
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


def read_frontier(spark: SparkSession, chk_dir: str, rnd: int) -> DataFrame:
    return spark.read.parquet(os.path.join(round_dir(chk_dir, rnd), "frontier"))


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
