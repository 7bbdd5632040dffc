#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north_rule): run the SAME crawl job at
local[N] and local[4N] on the same input and report throughput at both plus
scaling efficiency = (thr_4N / thr_N) / 4. Writes/updates BENCH.md.

Each measurement runs in its own subprocess (a JVM can't change master);
the synthesized bench corpus is shared via bench.py's on-disk cache, and the
runs are crawl-only (SPARK_GRAFT_BENCH_ONLY=crawl) — the per-operator timings
live in the driver-recorded BENCH_r{N}.json instead.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N = int(os.environ.get("SCALE_N", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_BENCH_ONLY="crawl", PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    small = run_bench(N)
    big = run_bench(4 * N)
    thr_small = small["crawl"]["crawl_urls_per_sec"]
    thr_big = big["crawl"]["crawl_urls_per_sec"]
    efficiency = round((thr_big / thr_small) / 4.0, 3)
    report = {
        "n_cores": N,
        "n4_cores": 4 * N,
        "throughput_small": thr_small,
        "throughput_big": thr_big,
        "scaling_efficiency": efficiency,
        "bench_small": small,
        "bench_big": big,
        "generated": datetime.now(timezone.utc).isoformat(),
    }
    print(json.dumps(report, indent=2))

    visited = big["crawl"]["crawl_visited"]
    md = REPO / "BENCH.md"
    lines = [
        "# BENCH — measured results",
        "",
        f"_Updated {report['generated']}; hardware: this sandbox "
        f"({os.cpu_count()} cores, single node standing in for a cluster)._",
        "",
        "## Two-parallelism scaling (sandbox evidence for the N→4N executor rule)",
        "",
        "The same crawl job — full frontier discovery + extraction over a cached",
        f"~1.9M-page synthetic web corpus ({visited:,} pages visited, each visited",
        "page link-expanded and text-extracted through the Arrow UDF kernel) — at",
        "two parallelism levels, per BASELINE.json north_rule; local[N] stands in",
        "for an N-executor cluster:",
        "",
        "| cores | crawl urls/sec | crawl sec |",
        "|---|---|---|",
        f"| local[{N}] | {thr_small} | {small['crawl']['crawl_sec']} |",
        f"| local[{4*N}] | {thr_big} | {big['crawl']['crawl_sec']} |",
        "",
        f"**Scaling efficiency (throughput ratio / 4): {efficiency}**",
        "",
        "urls/sec counts visited + extracted (every visited page is also",
        "extracted, so ≈ 2× pages/sec). Per-operator timings at SF are in the",
        "driver-recorded `BENCH_r{N}.json` (produced by `python bench.py`).",
        "",
        "Raw scaling JSON: rerun `python scripts/scaling_bench.py`.",
    ]
    md.write_text("\n".join(lines) + "\n")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
