"""Application-level Bloom filter over the URL-seen set (north_rule component).

Role: a cheap broadcast PRE-filter in front of the authoritative anti-join
(SURVEY §2 O-16). Candidates whose hash misses the bloom are definitely new —
they skip nothing; candidates that hit MIGHT be seen and flow into the exact
left-anti join. Correctness therefore NEVER depends on the bloom (no false
negatives by construction: every enqueued url is added).

Build is distributed and driver-memory-bounded: the hashed keys are coalesced
to at most ``max_fold_partitions`` tasks, each task folds its xxhash64 keys
into a local numpy bit array straight off the Arrow batches (no per-row
Python), and the partial arrays are OR-folded on the driver one at a time via
``toLocalIterator`` — at any moment the driver holds the accumulator plus ONE
partial, never the whole set of partials.

Scale path (10^10 enqueued URLs): a single bit array at 1% fpp is ~12 GB —
too big to broadcast. ``ShardedBloom`` splits the key space by
``pmod(xxhash64(url), S)`` into S independent slices, built with a
``repartition(S, shard)`` so each build task owns exactly one slice and the
driver streams S (shard, bits) rows. Probes dispatch on the same pmod, so
each executor touches only the slices its rows need; on a real cluster the
slices ship as S separate (smaller) broadcasts. Keys are ``xxhash64(url)``
(Spark-side), double-hashed into k probe positions; salting hot hosts is free
since xxhash64 of full urls is uniform even when one host dominates.
"""

from __future__ import annotations

import math
from typing import List, Optional, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


class BloomFilter:
    def __init__(self, n_bits: int, n_hashes: int, bits: Optional[np.ndarray] = None):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bits if bits is not None else np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, capacity: int, fpp: float) -> "BloomFilter":
        n_bits = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        n_hashes = max(1, int(round(n_bits / max(capacity, 1) * math.log(2))))
        return cls(n_bits, min(n_hashes, 8))

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) probe positions via double hashing on the 64-bit key."""
        h = hashes.astype(np.uint64)
        h1 = h % np.uint64(self.n_bits)
        h2 = (h >> np.uint64(33) | np.uint64(1)) % np.uint64(self.n_bits)
        ks = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_many(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        probed = (self.bits[(pos >> 3).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return probed.all(axis=1)

    # --- signed-hash entry point + broadcastable state (shared protocol) ---

    def probe_signed(self, hashes_i64: np.ndarray) -> np.ndarray:
        return self.might_contain(hashes_i64.view(np.uint64))

    def state(self) -> tuple:
        return ("single", self.n_bits, self.n_hashes, self.bits)

    @staticmethod
    def from_state(state: tuple) -> "AnyBloom":
        if state[0] == "single":
            _, n_bits, n_hashes, bits = state
            return BloomFilter(n_bits, n_hashes, bits)
        if state[0] == "cuckoo":
            return CuckooFilter.from_parts(state[1], state[2], state[3])
        if state[0] == "sharded_cuckoo":
            _, n_buckets, tables, stashes = state
            return ShardedCuckoo(
                [CuckooFilter.from_parts(n_buckets, t, s)
                 for t, s in zip(tables, stashes)]
            )
        _, n_bits, n_hashes, shard_bits = state
        return ShardedBloom([BloomFilter(n_bits, n_hashes, b) for b in shard_bits])


class ShardedBloom:
    """S independent bloom slices keyed by ``pmod(hash, S)``.

    Equivalent membership semantics to one big filter (each key lives in
    exactly one slice), but every slice is 1/S the size — buildable,
    shippable and probeable independently at 10^10-key scale.
    """

    def __init__(self, shards: List[BloomFilter]):
        assert shards, "at least one shard"
        self.shards = shards
        self.n_shards = len(shards)

    def probe_signed(self, hashes_i64: np.ndarray) -> np.ndarray:
        if len(hashes_i64) == 0:
            return np.zeros(0, dtype=bool)
        s = np.mod(hashes_i64, self.n_shards)  # numpy % on int64 is pmod (sign of divisor)
        out = np.zeros(len(hashes_i64), dtype=bool)
        for i, shard in enumerate(self.shards):
            mask = s == i
            if mask.any():
                out[mask] = shard.probe_signed(hashes_i64[mask])
        return out

    def state(self) -> tuple:
        first = self.shards[0]
        return ("sharded", first.n_bits, first.n_hashes, [sh.bits for sh in self.shards])


_CUCKOO_SLOTS = 4
_CUCKOO_MAX_KICKS = 500
_CUCKOO_ALT_MULT = 0x5BD1E995  # partial-key hash for the alternate bucket


class CuckooFilter:
    """Cuckoo filter (Fan et al., CoNEXT '14) — the north_rule's "cuckoo"
    alternative to the bloom URL-seen pre-filter. 16-bit fingerprints in
    power-of-two buckets of 4 slots; partial-key cuckoo hashing derives the
    alternate bucket as ``i ^ (fp * const)``, so probe AND DELETE need only
    the key's xxhash64. Denser than a same-fpp bloom (~2.4 bytes/key at 0.9
    load for fpp ≈ 2·slots/2^16 ≈ 1.2e-4) and supports deletion (recrawl:
    un-mark a URL so the next round's pre-filter lets it through), at the
    cost of an insert-time kick loop.

    Insert path stays vectorized: two bulk-placement rounds (stable-sort keys
    by bucket, rank-within-bucket vs free-slot count, one scatter per round)
    place ~99% of keys at 0.9 load; only keys whose BOTH buckets are full
    walk the classic per-key kick loop (bounded; expected O(1) amortized),
    and a small stash absorbs pathological overflow instead of failing.

    Same broadcast-state protocol as BloomFilter (``state()`` /
    ``BloomFilter.from_state`` / ``probe_signed``), so ``might_contain_col``
    and the frontier pre-split work unchanged."""

    def __init__(self, n_buckets: int, table: Optional[np.ndarray] = None,
                 stash: Optional[List[int]] = None):
        assert n_buckets >= 1 and (n_buckets & (n_buckets - 1)) == 0, \
            "n_buckets must be a power of two (alt-bucket XOR trick)"
        self.n_buckets = n_buckets
        self.table = (table if table is not None
                      else np.zeros((n_buckets, _CUCKOO_SLOTS), dtype=np.uint16))
        # stash entries are (bucket << 16) | fingerprint
        self.stash: List[int] = list(stash or [])

    @classmethod
    def sized(cls, capacity: int, load: float = 0.9) -> "CuckooFilter":
        need = max(64, int(capacity / load))
        n = 1
        while n * _CUCKOO_SLOTS < need:
            n <<= 1
        return cls(n)

    @classmethod
    def from_parts(cls, n_buckets: int, table_bytes: bytes,
                   stash: List[int]) -> "CuckooFilter":
        table = np.frombuffer(table_bytes, dtype=np.uint16).reshape(
            n_buckets, _CUCKOO_SLOTS).copy()
        return cls(n_buckets, table, stash)

    # --- key → (fingerprint, bucket, alt bucket) -------------------------

    def _parts(self, h_u64: np.ndarray):
        fp = ((h_u64 >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty-slot marker
        mask = np.int64(self.n_buckets - 1)
        i1 = (h_u64 & np.uint64(self.n_buckets - 1)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * _CUCKOO_ALT_MULT)) & mask
        return fp, i1, i2

    # --- vectorized bulk placement ---------------------------------------

    def _bulk_place(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Place each (bucket, fp) into a free slot of its bucket where
        capacity allows, one numpy scatter; returns a placed mask."""
        if len(idx) == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(idx, kind="stable")
        si, sf = idx[order], fp[order]
        uniq, start, count = np.unique(si, return_index=True, return_counts=True)
        rank = np.arange(len(si)) - np.repeat(start, count)
        empty = self.table[uniq] == 0                       # (u, SLOTS)
        can = rank < np.repeat(empty.sum(axis=1), count)
        # rank-th empty slot of each bucket: argsort puts empties first
        slot_order = np.argsort(~empty, axis=1, kind="stable")
        urow = np.repeat(np.arange(len(uniq)), count)
        slots = slot_order[urow[can], rank[can]]
        self.table[si[can], slots] = sf[can]
        placed = np.zeros(len(idx), dtype=bool)
        placed[order[can]] = True
        return placed

    def _kick_insert(self, fp: int, idx: int) -> None:
        mask = self.n_buckets - 1
        cur_fp, cur = int(fp), int(idx)
        for _ in range(_CUCKOO_MAX_KICKS):
            row = self.table[cur]
            free = np.nonzero(row == 0)[0]
            if free.size:
                self.table[cur, free[0]] = cur_fp
                return
            v = cur_fp % _CUCKOO_SLOTS  # deterministic victim slot
            victim = int(row[v])
            self.table[cur, v] = cur_fp
            cur_fp = victim
            cur = (cur ^ (victim * _CUCKOO_ALT_MULT)) & mask
        self.stash.append((cur << 16) | cur_fp)

    def add_many(self, hashes_u64: np.ndarray) -> None:
        if len(hashes_u64) == 0:
            return
        # set-semantics per batch: duplicates would eat slots
        fp, i1, i2 = self._parts(np.unique(hashes_u64))
        placed = self._bulk_place(i1, fp)
        rem = ~placed
        if rem.any():
            placed2 = self._bulk_place(i2[rem], fp[rem])
            for j in np.nonzero(rem)[0][~placed2]:
                self._kick_insert(int(fp[j]), int(i1[j]))

    # --- probe / delete ----------------------------------------------------

    def probe_signed(self, hashes_i64: np.ndarray) -> np.ndarray:
        if len(hashes_i64) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._parts(hashes_i64.view(np.uint64))
        hit = ((self.table[i1] == fp[:, None]).any(axis=1)
               | (self.table[i2] == fp[:, None]).any(axis=1))
        if self.stash:
            st = np.asarray(self.stash, dtype=np.int64)
            f = fp.astype(np.int64)
            hit |= np.isin((i1 << 16) | f, st) | np.isin((i2 << 16) | f, st)
        return hit

    def delete_many(self, hashes_i64: np.ndarray) -> int:
        """Remove ONE stored copy per key; returns how many were found.
        Standard cuckoo caveat: only delete keys that were actually added
        (deleting an absent key can false-negativize a colliding one)."""
        removed = 0
        fp, i1, i2 = self._parts(hashes_i64.view(np.uint64))
        for k in range(len(fp)):  # admin-path volume; per-key is fine
            f = int(fp[k])
            done = False
            for idx in (int(i1[k]), int(i2[k])):
                m = np.nonzero(self.table[idx] == f)[0]
                if m.size:
                    self.table[idx, m[0]] = 0
                    removed += 1
                    done = True
                    break
            if not done:
                for idx in (int(i1[k]), int(i2[k])):
                    key = (idx << 16) | f
                    if key in self.stash:
                        self.stash.remove(key)
                        removed += 1
                        break
        return removed

    def state(self) -> tuple:
        return ("cuckoo", self.n_buckets, self.table.tobytes(), list(self.stash))


class ShardedCuckoo:
    """S independent cuckoo slices keyed by ``pmod(hash, S)`` — same scale
    story as ShardedBloom: each slice builds in its own task and ships as a
    separate (smaller) broadcast at 10^10-key scale."""

    def __init__(self, shards: List[CuckooFilter]):
        assert shards, "at least one shard"
        self.shards = shards
        self.n_shards = len(shards)

    def probe_signed(self, hashes_i64: np.ndarray) -> np.ndarray:
        if len(hashes_i64) == 0:
            return np.zeros(0, dtype=bool)
        s = np.mod(hashes_i64, self.n_shards)
        out = np.zeros(len(hashes_i64), dtype=bool)
        for i, shard in enumerate(self.shards):
            mask = s == i
            if mask.any():
                out[mask] = shard.probe_signed(hashes_i64[mask])
        return out

    def delete_many(self, hashes_i64: np.ndarray) -> int:
        s = np.mod(hashes_i64, self.n_shards)
        return sum(self.shards[i].delete_many(hashes_i64[s == i])
                   for i in range(self.n_shards))

    def state(self) -> tuple:
        first = self.shards[0]
        return ("sharded_cuckoo", first.n_buckets,
                [sh.table.tobytes() for sh in self.shards],
                [list(sh.stash) for sh in self.shards])


AnyBloom = Union[BloomFilter, ShardedBloom, CuckooFilter, ShardedCuckoo]


def _fold_bits(n_bits: int, n_hashes: int):
    """mapInPandas fold: each task's hashes → one local bit-array row."""

    def fold(batches):
        local = BloomFilter(n_bits, n_hashes)
        any_rows = False
        for pdf in batches:
            hs = pdf["h"].to_numpy(dtype=np.int64)
            if len(hs):
                any_rows = True
                local.add_many(hs.view(np.uint64))
        if any_rows:
            yield pd.DataFrame({"bits": [local.bits.tobytes()]})

    return fold


def build_bloom(
    df: DataFrame,
    url_col: str,
    capacity: int,
    fpp: float = 0.01,
    max_fold_partitions: int = 64,
) -> BloomFilter:
    """Distributed single-filter build, driver-memory-bounded: at most
    ``max_fold_partitions`` partial bit arrays exist, and they stream to the
    driver one at a time (``toLocalIterator``), so peak driver memory is
    2× the filter size regardless of input partition count."""
    proto = BloomFilter.sized(capacity, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes
    hashed = df.select(F.xxhash64(F.col(url_col)).alias("h")).coalesce(max_fold_partitions)
    partials = hashed.mapInPandas(_fold_bits(n_bits, n_hashes), "bits binary")
    bits = proto.bits
    for row in partials.toLocalIterator():
        bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return BloomFilter(n_bits, n_hashes, bits)


def add_to_bloom(
    bloom: "Union[BloomFilter, ShardedBloom]",
    df: DataFrame,
    url_col: str,
    max_fold_partitions: int = 64,
) -> None:
    """Incremental filter maintenance: fold ONLY the new keys into partial
    bit arrays with the existing filter's geometry and OR them in place.

    This is the long-crawl scale path: rebuilding the URL-seen filter from
    the full enqueued set every round is O(rounds × total-enqueued); adding
    each round's new-frontier delta is O(new). Bloom bit arrays OR-merge, so
    the delta build is exactly the normal build minus the sizing step.
    (Cuckoo tables don't OR-merge — the cuckoo family rebuilds instead.)

    No false negatives by construction: the filter was complete for the set
    it was built over, and every later-enqueued url flows through here."""
    if isinstance(bloom, ShardedBloom):
        first = bloom.shards[0]
        n_bits, n_hashes, n_shards = first.n_bits, first.n_hashes, bloom.n_shards
        hashed = df.select(F.xxhash64(F.col(url_col)).alias("h")).withColumn(
            "shard", F.pmod(F.col("h"), F.lit(n_shards))
        )

        def fold(batches):
            locals_: dict = {}
            for pdf in batches:
                hs = pdf["h"].to_numpy(dtype=np.int64)
                sh = pdf["shard"].to_numpy(dtype=np.int64)
                for s in np.unique(sh):
                    filt = locals_.setdefault(int(s), BloomFilter(n_bits, n_hashes))
                    filt.add_many(hs[sh == s].view(np.uint64))
            for s, filt in locals_.items():
                yield pd.DataFrame({"shard": [s], "bits": [filt.bits.tobytes()]})

        partials = hashed.repartition(n_shards, "shard").mapInPandas(
            fold, "shard int, bits binary"
        )
        for row in partials.toLocalIterator():
            bloom.shards[int(row["shard"])].bits |= np.frombuffer(
                row["bits"], dtype=np.uint8
            )
        return
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes
    hashed = df.select(F.xxhash64(F.col(url_col)).alias("h")).coalesce(
        max_fold_partitions
    )
    partials = hashed.mapInPandas(_fold_bits(n_bits, n_hashes), "bits binary")
    for row in partials.toLocalIterator():
        bloom.bits |= np.frombuffer(row["bits"], dtype=np.uint8)


def build_sharded_bloom(
    df: DataFrame,
    url_col: str,
    capacity: int,
    fpp: float = 0.01,
    n_shards: int = 8,
) -> ShardedBloom:
    """Sharded build: keys shuffle once on ``pmod(h, S)`` so each of the S
    tasks folds exactly one slice (sized for capacity/S keys); the driver
    streams S (shard, bits) rows and never holds more than the assembled
    filter plus one slice."""
    proto = BloomFilter.sized(max(capacity // n_shards, 1), fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes
    hashed = df.select(F.xxhash64(F.col(url_col)).alias("h")).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards))
    )

    def fold(batches):
        locals_: dict = {}
        for pdf in batches:
            hs = pdf["h"].to_numpy(dtype=np.int64)
            sh = pdf["shard"].to_numpy(dtype=np.int64)
            for s in np.unique(sh):
                filt = locals_.setdefault(int(s), BloomFilter(n_bits, n_hashes))
                filt.add_many(hs[sh == s].view(np.uint64))
        for s, filt in locals_.items():
            yield pd.DataFrame({"shard": [s], "bits": [filt.bits.tobytes()]})

    partials = hashed.repartition(n_shards, "shard").mapInPandas(
        fold, "shard int, bits binary"
    )
    shards = [BloomFilter(n_bits, n_hashes) for _ in range(n_shards)]
    for row in partials.toLocalIterator():
        shards[int(row["shard"])].bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return ShardedBloom(shards)


def build_sharded_cuckoo(
    df: DataFrame,
    url_col: str,
    capacity: int,
    n_shards: int = 8,
    load: float = 0.9,
) -> ShardedCuckoo:
    """Distributed cuckoo build: keys shuffle once on ``pmod(h, S)``; each
    slice (sized for capacity/S keys) is built whole inside one task — cuckoo
    tables, unlike bloom bit arrays, don't OR-merge, so a shard is never
    split across partials — and the driver streams S (shard, table, stash)
    rows via ``toLocalIterator``."""
    import json

    proto = CuckooFilter.sized(max(capacity // n_shards, 1), load)
    n_buckets = proto.n_buckets
    hashed = df.select(F.xxhash64(F.col(url_col)).alias("h")).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards))
    )

    def fold(batches):
        locals_: dict = {}
        for pdf in batches:
            hs = pdf["h"].to_numpy(dtype=np.int64)
            sh = pdf["shard"].to_numpy(dtype=np.int64)
            for s in np.unique(sh):
                filt = locals_.setdefault(int(s), CuckooFilter(n_buckets))
                filt.add_many(hs[sh == s].view(np.uint64))
        for s, filt in locals_.items():
            yield pd.DataFrame({
                "shard": [s],
                "table": [filt.table.tobytes()],
                "stash": [json.dumps(filt.stash)],
            })

    partials = hashed.repartition(n_shards, "shard").mapInPandas(
        fold, "shard int, table binary, stash string"
    )
    shards = [CuckooFilter(n_buckets) for _ in range(n_shards)]
    for row in partials.toLocalIterator():
        shards[int(row["shard"])] = CuckooFilter.from_parts(
            n_buckets, row["table"], json.loads(row["stash"])
        )
    return ShardedCuckoo(shards)


def might_contain_col(spark_df: DataFrame, bloom: AnyBloom, url_col: str) -> Column:
    """Column: True when the bloom says "possibly seen". Works for single and
    sharded filters (both broadcast their state tuple once per round);
    numpy-vectorized probe inside a pandas UDF."""
    sc = spark_df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.state())

    @pandas_udf(BooleanType())
    def _probe(hashes: pd.Series) -> pd.Series:
        bf = BloomFilter.from_state(bc.value)
        out = bf.probe_signed(hashes.to_numpy(dtype=np.int64))
        return pd.Series(out)

    return _probe(F.xxhash64(F.col(url_col)))
