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

import glob
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Optional, Tuple

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
    meta_late: Optional[Callable[[], Dict]] = None,
) -> None:
    """Write this round's deltas + next frontier, then the manifest marker.
    ``sizes`` (rows per table name, plus "frontier") drives file coalescing.

    The data writes run CONCURRENTLY (one Spark job per table from a small
    thread pool): the three writes are independent, each is dominated by a
    fixed per-job cost at small round sizes, and overlapping them cuts the
    per-round serial share that caps N→4N scaling efficiency (VERDICT r2
    fix #3). Shared upstream caches are materialized once — Spark's block
    manager serializes per-partition computes across the jobs.

    ``meta_late`` (optional) is called AFTER the data writes and its dict is
    merged into the manifest — the hook that lets the driver derive scalars
    (frontier size, max sched_ts) from the freshly-written parquet footers
    instead of running extra Spark jobs, while keeping the manifest complete."""
    spark = frontier_next.sparkSession
    sizes = sizes or {}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    base = round_dir(chk_dir, rnd)

    def _write_delta(name: str, df: DataFrame) -> None:
        (
            _coalesced(df, sizes.get(name))
            .withColumn("round", F.lit(rnd))
            .write.mode("overwrite")
            .partitionBy("round")
            .parquet(_state_dir(chk_dir, name))
        )

    def _write_frontier() -> None:
        (
            _coalesced(frontier_next, sizes.get("frontier"))
            .withColumn("round", F.lit(rnd))
            .write.mode("overwrite")
            .parquet(os.path.join(base, "frontier"))
        )

    with ThreadPoolExecutor(max_workers=len(deltas) + 1) as pool:
        futs = [pool.submit(_write_delta, n, df) for n, df in deltas.items()]
        futs.append(pool.submit(_write_frontier))
        for f in futs:
            f.result()  # surface the first failure; manifest is never written

    manifest = dict(meta)
    if meta_late is not None:
        manifest.update(meta_late())
    manifest["round"] = rnd
    manifest["format"] = CHECKPOINT_FORMAT
    tmp = os.path.join(base, ".manifest.tmp")
    os.makedirs(base, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(base, "manifest.json"))  # atomic commit


def _parquet_dir_stats(path: str, max_cols: Tuple[str, ...] = ()) -> Tuple[int, Dict[str, object]]:
    """Driver-side footer scan of a written parquet dir: (total rows,
    {col: max over all row groups}). Costs O(files) metadata reads and ZERO
    Spark jobs — the point is deriving post-commit scalars (frontier size,
    max sched_ts) without re-running the round's plan. Parquet writers emit
    row-group min/max statistics for primitive columns by default; a column
    with no stats anywhere maps to None (caller falls back)."""
    import pyarrow.parquet as pq

    total = 0
    maxes: Dict[str, object] = {c: None for c in max_cols}
    for fpath in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        md = pq.ParquetFile(fpath).metadata
        total += md.num_rows
        if not max_cols:
            continue
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in max_cols:
            if c not in idx:
                continue
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                if maxes[c] is None or st.max > maxes[c]:
                    maxes[c] = st.max
    return total, maxes


class RoundCommit:
    """Handle for a round commit whose heavy delta writes overlap the next
    round's computation (``commit_round_start``). ``finalize`` joins the
    in-flight writes, merges ``meta_late`` into the manifest, and writes the
    atomic manifest marker — until then the round is UNcommitted, so a crash
    mid-overlap resumes from the previous manifest and replays exactly one
    round (the same replay-on-crash model as the synchronous path, shifted
    one round later)."""

    def __init__(self, chk_dir: str, rnd: int, meta: Dict, futures, pool):
        self._chk_dir = chk_dir
        self._rnd = rnd
        self._meta = meta
        self._futures = futures
        self._pool = pool

    def finalize(self, meta_late: Optional[Callable[[], Dict]] = None) -> None:
        try:
            for f in self._futures:
                f.result()  # surface the first failure; manifest never lands
        finally:
            self._pool.shutdown(wait=True)
        manifest = dict(self._meta)
        if meta_late is not None:
            manifest.update(meta_late())
        manifest["round"] = self._rnd
        manifest["format"] = CHECKPOINT_FORMAT
        base = round_dir(self._chk_dir, self._rnd)
        tmp = os.path.join(base, ".manifest.tmp")
        os.makedirs(base, exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(base, "manifest.json"))

    def abort(self) -> None:
        """Drain the in-flight writes WITHOUT writing the manifest — the
        round stays uncommitted (resume replays it). For error paths."""
        self._pool.shutdown(wait=True)


def commit_round_start(
    chk_dir: str,
    rnd: int,
    frontier_next: DataFrame,
    deltas: Dict[str, DataFrame],
    meta: Dict,
    sizes: Optional[Dict[str, int]] = None,
    heavy: Tuple[str, ...] = ("visited",),
) -> RoundCommit:
    """Two-phase variant of ``commit_round`` for the hot round loop: the
    frontier (the NEXT round's input) and the light deltas are written
    before returning, while the ``heavy`` deltas (the fused visited table —
    ~1 KB of markdown per row, the bulk of the commit wall) keep writing in
    the background. The caller overlaps the next round's scan with those
    writes and calls ``finalize`` when it needs the manifest (or the
    visited-footer scalars) — cutting the per-round serial share that caps
    N→4N scaling efficiency (VERDICT r3 next-round #2/#5).

    Persisted frames feeding the heavy deltas must stay cached until
    ``finalize`` returns."""
    spark = frontier_next.sparkSession
    sizes = sizes or {}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    base = round_dir(chk_dir, rnd)

    def _write_delta(name: str, df: DataFrame) -> None:
        (
            _coalesced(df, sizes.get(name))
            .withColumn("round", F.lit(rnd))
            .write.mode("overwrite")
            .partitionBy("round")
            .parquet(_state_dir(chk_dir, name))
        )

    def _write_frontier() -> None:
        (
            _coalesced(frontier_next, sizes.get("frontier"))
            .withColumn("round", F.lit(rnd))
            .write.mode("overwrite")
            .parquet(os.path.join(base, "frontier"))
        )

    pool = ThreadPoolExecutor(max_workers=len(deltas) + 1)
    # Light writes run FIRST and alone — under FIFO job scheduling an
    # already-submitted heavy write would hog the task slots and serialize
    # phase A behind it. The heavy writes start only once the light ones
    # land, so their whole cost falls inside the next round's scan.
    light_futs = [
        pool.submit(_write_delta, n, df)
        for n, df in deltas.items()
        if n not in heavy
    ]
    light_futs.append(pool.submit(_write_frontier))
    try:
        for f in light_futs:
            f.result()
    except Exception:
        pool.shutdown(wait=True)
        raise
    heavy_futs = [
        pool.submit(_write_delta, n, df) for n, df in deltas.items() if n in heavy
    ]
    return RoundCommit(chk_dir, rnd, dict(meta), heavy_futs, pool)


def frontier_rows(chk_dir: str, rnd: int) -> int:
    """Row count of round ``rnd``'s written frontier, from parquet footers
    (no Spark job) — available as soon as ``commit_round_start`` returns."""
    n, _ = _parquet_dir_stats(os.path.join(round_dir(chk_dir, rnd), "frontier"))
    return n


def visited_vt_max(chk_dir: str, rnd: int) -> Optional[float]:
    """Max visited ``sched_ts`` for round ``rnd`` from the visited delta's
    parquet footers alone (the frontier half of ``round_write_stats`` is
    already known at commit start — no need to re-scan it at finalize)."""
    _, vmax = _parquet_dir_stats(
        os.path.join(_state_dir(chk_dir, "visited"), f"round={rnd}"), ("sched_ts",)
    )
    v = vmax.get("sched_ts")
    return float(v) if v is not None else None


def round_write_stats(chk_dir: str, rnd: int) -> Tuple[int, Optional[float]]:
    """Post-commit scalars for round ``rnd`` from parquet footers (no Spark
    job): (frontier_out rows, max visited sched_ts). ``sched_ts`` max is None
    when the round visited nothing (caller keeps the previous virtual time)."""
    f_n, _ = _parquet_dir_stats(os.path.join(round_dir(chk_dir, rnd), "frontier"))
    _, vmax = _parquet_dir_stats(
        os.path.join(_state_dir(chk_dir, "visited"), f"round={rnd}"), ("sched_ts",)
    )
    v = vmax.get("sched_ts")
    return f_n, (float(v) if v is not None else None)


def read_state(spark: SparkSession, chk_dir: str, name: str, upto_round: int) -> DataFrame:
    """Cumulative view of a delta table at round ``upto_round`` (inclusive).
    The round filter is partition pruning — orphan rounds never get read."""
    df = spark.read.parquet(_state_dir(chk_dir, name))
    return df.filter(F.col("round") <= upto_round)


# --- frontier-snapshot compaction -------------------------------------------
# A 10^4-round crawl leaves 10^4 frontier dirs (+ files): every enqueued-set /
# edges read opens all of them. ``compact_checkpoint`` consolidates rounds
# 0..C into ONE base table behind an atomic marker; per-round dirs above C
# keep working as before, so compaction can run while the crawl is stopped at
# any point and be repeated as the crawl grows.

COMPACTION_MARKER = "compaction.json"


def compacted_upto(chk_dir: str) -> Optional[int]:
    p = os.path.join(chk_dir, COMPACTION_MARKER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)["upto"]


def _base_dir(chk_dir: str, upto: int) -> str:
    return _state_dir(chk_dir, f"frontier_base_{upto:04d}")


def _frontier_df(spark: SparkSession, chk_dir: str, upto_round: int) -> DataFrame:
    """All frontier snapshot rows for rounds ≤ ``upto_round`` (every row
    carries its ``round``), reading the compacted base where one exists."""
    c = compacted_upto(chk_dir)
    parts = []
    start = 0
    if c is not None:
        parts.append(
            spark.read.parquet(_base_dir(chk_dir, c)).filter(F.col("round") <= upto_round)
        )
        start = c + 1
    live = [
        os.path.join(round_dir(chk_dir, r), "frontier")
        for r in range(start, upto_round + 1)
    ]
    if live:
        parts.append(spark.read.parquet(*live))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_frontier(spark: SparkSession, chk_dir: str, rnd: int) -> DataFrame:
    """The round-``rnd`` queue, trimmed to the loop's working columns."""
    direct = os.path.join(round_dir(chk_dir, rnd), "frontier")
    if os.path.isdir(direct):
        df = spark.read.parquet(direct)
    else:  # round folded into the compacted base
        df = _frontier_df(spark, chk_dir, rnd).filter(F.col("round") == rnd)
    return df.select("url", "host", "depth", "arrival_rank")


def read_enqueued(spark: SparkSession, chk_dir: str, upto_round: int) -> DataFrame:
    """Ever-enqueued URL set ≡ union of the committed frontier snapshots."""
    return _frontier_df(spark, chk_dir, upto_round).select("url")


def read_edges(spark: SparkSession, chk_dir: str, upto_round: int) -> DataFrame:
    """Edges view over the frontier snapshots (seed rows have no parent)."""
    df = _frontier_df(spark, chk_dir, upto_round)
    return df.filter(F.col("parent_url").isNotNull()).select(
        "parent_url", F.col("url").alias("child_url"), "link_pos", "round"
    )


def compact_checkpoint(
    spark: SparkSession, chk_dir: str, upto_round: Optional[int] = None
) -> int:
    """Fold the frontier snapshots of rounds 0..``upto_round`` (default: the
    latest committed round) into one consolidated base table. Protocol:
    write the new base dir → atomically replace the marker → delete the
    superseded per-round frontier dirs and any previous base. Round
    manifests are kept (commit history + resume validation), state delta
    tables are untouched (they are already round-partitioned and coalesced).
    Safe to re-run as the crawl grows; every reader keeps working for any
    ``upto_round`` because base rows retain their ``round`` column."""
    import shutil

    last = latest_round(chk_dir)
    if last is None:
        raise ValueError(f"no committed rounds under {chk_dir}")
    upto = last if upto_round is None else min(upto_round, last)
    prev = compacted_upto(chk_dir)
    if prev is not None and upto <= prev:
        return prev  # nothing new to fold

    rows = _frontier_df(spark, chk_dir, upto)
    n = rows.count()
    target = _base_dir(chk_dir, upto)
    shutil.rmtree(target, ignore_errors=True)
    _coalesced(rows, n).write.mode("overwrite").parquet(target)

    tmp = os.path.join(chk_dir, ".compaction.tmp")
    with open(tmp, "w") as fh:
        json.dump({"upto": upto, "format": CHECKPOINT_FORMAT, "rows": n}, fh)
    os.replace(tmp, os.path.join(chk_dir, COMPACTION_MARKER))  # atomic cut-over

    for r in range((prev + 1) if prev is not None else 0, upto + 1):
        shutil.rmtree(os.path.join(round_dir(chk_dir, r), "frontier"), ignore_errors=True)
    if prev is not None:
        shutil.rmtree(_base_dir(chk_dir, prev), ignore_errors=True)
    return upto


def reset_checkpoint(chk_dir: str) -> None:
    """Clear ALL prior checkpoint state so a fresh (non-resume) crawl into a
    reused directory starts from nothing. Without this, a dir that was
    previously crawled AND compacted keeps its ``compaction.json`` +
    ``frontier_base_NNNN``, and the new crawl's enqueued/edges reads would
    silently include the OLD crawl's rows (the marker shadows the new
    per-round frontier dirs for rounds ≤ its ``upto``)."""
    import shutil

    if not os.path.isdir(chk_dir):
        return
    for entry in os.listdir(chk_dir):
        if entry.startswith("round=") or entry == "state":
            shutil.rmtree(os.path.join(chk_dir, entry), ignore_errors=True)
    marker = os.path.join(chk_dir, COMPACTION_MARKER)
    if os.path.exists(marker):
        os.remove(marker)


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
