"""Skew-resilient join strategies.

At 100 TB the frontier/fact tables key on low-cardinality, Zipf-distributed
columns (event_type: 5 values; host: a few hot CDNs own half the rows). A
shuffle join on such a key sends each hot key's entire row set to ONE reducer
— the straggler that defines the stage's wall-clock. AQE's skew-join split
helps only sort-merge joins it can see at runtime; **salting** is the
deterministic, planner-independent fix and works for any join the dimension
side can afford to replicate into:

  fact:  _salt = deterministic int in [0, S)   (a projection, free)
  dim:   exploded S× — one copy per salt value  (dim is small; S·|dim| rows)
  join:  equi-join on (key, _salt) → each hot key now spreads over S reducers

The join RESULT is identical to the unsalted join (every fact row still meets
exactly one copy of its dim row) — which is precisely what the contract
oracle checks, with a plain join on the DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_salt: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key``, salted ``n_salts`` ways.

    ``fact_salt`` is any deterministic integral expression over fact columns
    (a row id works; it only needs to spread rows, not be uniform-random —
    it never influences the result). The dim side is exploded via
    ``sequence(0, S-1)`` so every (key, salt) probe finds its row. Both
    sides carry a ``merge`` hint: the point of salting is the shuffle-join
    regime (a broadcastable dim needs no salt), so the demo must not be
    silently rescued by a broadcast.

    Supports inner and left joins (a left-outer keeps unmatched fact rows
    exactly once — their (key, salt) misses every dim copy or hits one)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f = fact.withColumn("_salt", (fact_salt % n_salts).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        f.hint("merge")
        .join(d.hint("merge"), [key, "_salt"], how)
        .drop("_salt")
    )
