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
    def from_state(state: tuple) -> "Union[BloomFilter, ShardedBloom]":
        if state[0] == "single":
            _, n_bits, n_hashes, bits = state
            return BloomFilter(n_bits, n_hashes, bits)
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


AnyBloom = Union[BloomFilter, ShardedBloom]


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
