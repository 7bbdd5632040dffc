"""Self-sizing runtime config (crawl4ai_scraper_spark/sizing.py).

VERDICT r4 #2: shuffle-partition count and driver heap must derive from
input statistics, monotonically, with env vars as overrides — the 16×-corpus
bench OOM'd at hand-set defaults. Anchors below are the measured round-4
values: 1× corpus (633 MB / 1.79M rows) ran at 32 partitions / 12g; the 16×
corpus (~9.4 GB / 15.8M rows) needed 64 / 48g.
"""

from __future__ import annotations

import math

import pytest

from crawl4ai_scraper_spark.sizing import (
    MAX_SHUFFLE_PARTITIONS,
    InputStats,
    SizingDecision,
    assert_driver_headroom,
    autosize,
    derive_driver_memory_gb,
    derive_shuffle_partitions,
    parquet_footer_stats,
)

GB = 1024 ** 3
STATS_1X = InputStats(total_bytes=633_017_359, total_rows=1_790_336)
STATS_16X = InputStats(total_bytes=int(9.4 * GB), total_rows=15_800_000)


def test_anchor_1x_corpus():
    assert derive_shuffle_partitions(STATS_1X, 32) == 32
    assert derive_driver_memory_gb(STATS_1X) == 12


def test_anchor_16x_corpus_matches_manual_fix():
    # the values the r4 16× run needed by hand must now be derived
    assert derive_shuffle_partitions(STATS_16X, 32) == 64
    assert derive_driver_memory_gb(STATS_16X) == 48


def test_partitions_monotone_in_bytes():
    sizes = [0, 1 * GB, 4 * GB, 9 * GB, 40 * GB, 100 * GB, 1000 * GB]
    derived = [derive_shuffle_partitions(InputStats(total_bytes=b), 32)
               for b in sizes]
    assert derived == sorted(derived)
    assert derived[-1] > derived[0]  # actually grows, not constant


def test_partitions_monotone_in_rows():
    rows = [0, 1_000_000, 10_000_000, 100_000_000, 1_000_000_000]
    derived = [derive_shuffle_partitions(InputStats(total_rows=r), 32)
               for r in rows]
    assert derived == sorted(derived)
    assert derived[-1] > derived[0]


def test_partitions_whole_waves_and_floor():
    # always a multiple of the core count (whole task waves), never below
    # max(8, cores)
    for cores in (4, 8, 32):
        for b in (0, 1 * GB, 7 * GB, 33 * GB):
            n = derive_shuffle_partitions(InputStats(total_bytes=b), cores)
            floor = max(8, cores)
            assert n >= floor
            assert n % floor == 0


def test_partitions_capped():
    huge = InputStats(total_bytes=10_000 * GB, total_rows=10 ** 13)
    assert derive_shuffle_partitions(huge, 32) == MAX_SHUFFLE_PARTITIONS


def test_driver_memory_monotone():
    sizes = [0, 1 * GB, 5 * GB, 10 * GB, 20 * GB]
    derived = [derive_driver_memory_gb(InputStats(total_bytes=b))
               for b in sizes]
    assert derived == sorted(derived)
    assert derived[0] == 12  # never below the baseline heap


def test_env_overrides_win():
    d = autosize(STATS_16X, 32,
                 env={"SPARK_GRAFT_SHUFFLE": "128",
                      "SPARK_DRIVER_MEMORY": "20g"})
    assert d.shuffle_partitions == 128 and d.shuffle_overridden
    assert d.driver_memory == "20g" and d.driver_overridden
    # derived stats still carried for lineage
    assert d.stats.total_rows == STATS_16X.total_rows


def test_autosize_derives_without_env():
    d = autosize(STATS_16X, 32, env={})
    assert d == SizingDecision(shuffle_partitions=64, driver_memory="48g",
                               stats=STATS_16X)


def test_headroom_assertion_fires():
    # a petabyte input on this host must fail at submit time, loudly
    with pytest.raises(MemoryError, match="SPARK_DRIVER_MEMORY"):
        assert_driver_headroom(10 ** 6)
    assert_driver_headroom(1)  # tiny ask never raises


def test_footer_stats_on_real_testdata():
    stats = parquet_footer_stats("/root/testdata/sf0.001")
    assert stats.n_files > 0
    assert stats.total_rows > 0
    assert stats.total_bytes > 0
    # derived sizing for tiny data collapses to the floor
    assert derive_shuffle_partitions(stats, 8) == 8
