"""Application-level Bloom filter over the URL-seen set (north_rule component).

Role: a cheap broadcast PRE-filter in front of the authoritative anti-join
(SURVEY §2 O-16). Candidates whose hash misses the bloom are definitely new —
they skip nothing; candidates that hit MIGHT be seen and flow into the exact
left-anti join. Correctness therefore NEVER depends on the bloom (no false
negatives by construction: every enqueued url is added).

Build is distributed: per-partition numpy bit arrays OR-reduced (the lone RDD
use in this codebase — a bitwise treeReduce has no DataFrame equivalent).
Membership probes are numpy-vectorized inside a pandas UDF — no per-row
Python. Keys are ``xxhash64(url)`` (Spark-side), double-hashed into k probe
positions; at 10^10-frontier scale the same structure shards by
``pmod(hash, S)`` into S per-executor slices (salting hot hosts is free since
xxhash64 of full urls is uniform even when one host dominates).
"""

from __future__ import annotations

import math
from typing import Optional

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


def build_bloom(df: DataFrame, url_col: str, capacity: int, fpp: float = 0.01) -> BloomFilter:
    """Distributed build: each partition folds its xxhash64 keys into a local
    bit array (numpy-vectorized straight off the Arrow batches — no per-row
    Python); the per-partition arrays are OR-reduced on the driver."""
    proto = BloomFilter.sized(capacity, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes
    hashed = df.select(F.xxhash64(F.col(url_col)).alias("h"))

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

    parts = hashed.mapInPandas(fold, "bits binary").collect()
    bits = proto.bits
    for row in parts:
        bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return BloomFilter(n_bits, n_hashes, bits)


def might_contain_col(spark_df: DataFrame, bloom: BloomFilter, url_col: str) -> Column:
    """Column: True when the bloom says "possibly seen". Broadcast once per
    round; numpy-vectorized probe inside a pandas UDF."""
    sc = spark_df.sparkSession.sparkContext
    bc = sc.broadcast((bloom.n_bits, bloom.n_hashes, bloom.bits))

    @pandas_udf(BooleanType())
    def _probe(hashes: pd.Series) -> pd.Series:
        n_bits, n_hashes, bits = bc.value
        bf = BloomFilter(n_bits, n_hashes, bits)
        out = bf.might_contain(hashes.to_numpy(dtype=np.int64).view(np.uint64))
        return pd.Series(out)

    return _probe(F.xxhash64(F.col(url_col)))
