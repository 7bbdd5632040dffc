#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north_rule): run the SAME crawl job at
local[N] and local[4N] on the same input and report throughput at both plus
scaling efficiency = (thr_4N / thr_N) / 4. Prints a JSON report; the
measured rows are folded into BENCH.md's hand-curated run-history table
(every run listed, none dropped).

Methodology notes (this sandbox is a shared VM):

* Each measurement runs in its own subprocess (a JVM can't change master);
  the synthesized bench corpus is shared via bench.py's on-disk cache, and
  the runs are crawl-only (SPARK_GRAFT_BENCH_ONLY=crawl).
* The box's own parallel-CPU ceiling is measured alongside with a pure-Python
  multiprocessing probe (sum-of-squares burn): per-core throughput on this VM
  degrades with concurrency (host contention / memory bandwidth), so the
  probe's N→4N speedup is the maximum ANY CPU-bound job can achieve here.
  The report shows raw efficiency AND efficiency normalized to that ceiling.
* Short runs are repeated and the median is taken (host noise).

Env: SCALE_N (default 2 → spans 2→8), SCALE_REPS (default 3),
     SCALE_SECONDARY=8 adds an 8→32 row (0 disables),
     SCALE_WRITE_MD=1 additionally rewrites BENCH.md's scaling section with
     a single-run skeleton (default 0 = JSON only; the curated BENCH.md
     lists every run). SPARK_GRAFT_CORPUS_X measures the same spans on an
     X× corpus (the big-corpus serial-share-amortization runs).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
N = int(os.environ.get("SCALE_N", "2"))
REPS = int(os.environ.get("SCALE_REPS", "3"))
SECONDARY = int(os.environ.get("SCALE_SECONDARY", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def hw_probe(procs: int, chunk: int = 6_000_000, rounds: int = 6) -> float:
    """Pure-CPU chunks/sec at a given process count (warm pool)."""
    with mp.Pool(procs) as pool:
        pool.map(_burn, [chunk] * procs)  # warm
        t0 = time.perf_counter()
        pool.map(_burn, [chunk] * procs * rounds)
        dt = time.perf_counter() - t0
    return procs * rounds / dt


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_BENCH_ONLY="crawl", PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        # preserve the evidence — a swallowed subprocess stderr cost a whole
        # 20-minute scaling attempt once (round 5)
        dump = REPO / "logs" / f"scaling_fail_cpus{cpus}_{int(time.time())}.log"
        dump.write_text("RC=%s\n--- stdout ---\n%s\n--- stderr ---\n%s\n"
                        % (out.returncode, out.stdout[-8000:], out.stderr[-12000:]))
        raise RuntimeError(f"bench subprocess @local[{cpus}] produced no JSON; "
                           f"rc={out.returncode}, dump: {dump}")
    return json.loads(lines[-1])


def measure_span(n: int, reps_small: int, reps_big: int) -> dict:
    small = [run_bench(n) for _ in range(reps_small)]
    big = [run_bench(4 * n) for _ in range(reps_big)]
    thr = lambda runs: statistics.median(r["crawl"]["crawl_urls_per_sec"] for r in runs)
    sec = lambda runs: statistics.median(r["crawl"]["crawl_sec"] for r in runs)
    hw_small, hw_big = hw_probe(n), hw_probe(4 * n)
    raw = (thr(big) / thr(small)) / 4.0
    hw_ratio = hw_big / hw_small
    return {
        "n": n, "n4": 4 * n,
        "thr_small": round(thr(small), 2), "thr_big": round(thr(big), 2),
        "sec_small": sec(small), "sec_big": sec(big),
        "raw_efficiency": round(raw, 3),
        "hw_speedup": round(hw_ratio, 2),
        "hw_efficiency_ceiling": round(hw_ratio / 4.0, 3),
        "normalized_efficiency": round((thr(big) / thr(small)) / hw_ratio, 3),
        "visited": big[0]["crawl"]["crawl_visited"],
        # each run carries its own host-load telemetry (bench.py "load"
        # snapshots) so window quality is adjudicable per measurement
        "runs_small": [{**r["crawl"], "load": r.get("load")} for r in small],
        "runs_big": [{**r["crawl"], "load": r.get("load")} for r in big],
    }


def main():
    spans = [measure_span(N, reps_small=1 if N <= 2 else REPS, reps_big=REPS)]
    if SECONDARY:
        spans.append(measure_span(SECONDARY, reps_small=REPS, reps_big=REPS))
    report = {
        "spans": spans,
        "corpus_x": int(os.environ.get("SPARK_GRAFT_CORPUS_X", "1")),
        "generated": datetime.now(timezone.utc).isoformat(),
    }
    print(json.dumps(report, indent=2))
    # Default is JSON-only: BENCH.md's scaling section is hand-curated (it
    # lists EVERY run of this script under the no-run-dropped policy plus
    # the 4×-corpus amortization tables, which this writer would clobber).
    # Set SCALE_WRITE_MD=1 to regenerate the single-run scaling skeleton.
    if os.environ.get("SCALE_WRITE_MD", "0") != "1":
        return

    p = spans[0]
    lines = [
        "# BENCH — measured results",
        "",
        f"_Updated {report['generated']}; hardware: this sandbox "
        f"({os.cpu_count()} logical cores on a shared VM, single node standing "
        "in for a cluster)._",
        "",
        "## Two-parallelism scaling (sandbox evidence for the N→4N executor rule)",
        "",
        "The same crawl job — full frontier discovery + extraction over a cached",
        f"~1.9M-page synthetic web corpus ({p['visited']:,} pages visited, every",
        "visited page link-expanded and text-extracted through the Arrow UDF",
        "kernel) — at two parallelism levels, per BASELINE.json north_rule;",
        "local[N] stands in for an N-executor cluster. urls/sec counts visited +",
        "extracted (every visited page is also extracted, so ≈ 2× pages/sec).",
        "",
        "Because this sandbox is a shared VM whose per-core throughput drops as",
        "more cores run (host contention), the table also shows the box's own",
        "pure-CPU N→4N ceiling, measured with a multiprocessing burn probe in",
        "the same script — no job can scale better than the machine it runs on.",
        "",
        "| span | urls/sec @N | urls/sec @4N | raw efficiency | HW ceiling (probe) | normalized efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for s in spans:
        lines.append(
            f"| local[{s['n']}] → local[{s['n4']}] | {s['thr_small']} | {s['thr_big']} "
            f"| {s['raw_efficiency']} | {s['hw_efficiency_ceiling']} "
            f"| **{s['normalized_efficiency']}** |"
        )
    lines += [
        "",
        "normalized efficiency = (job N→4N speedup) / (machine's pure-CPU N→4N",
        "speedup): the fraction of the achievable scaling the job captures.",
        "",
        "Median of repeated runs; crawl wall seconds per span: "
        + "; ".join(f"{s['sec_small']}s @{s['n']} → {s['sec_big']}s @{s['n4']}" for s in spans)
        + ".",
        "",
        "Per-operator timings at SF are in the driver-recorded `BENCH_r{N}.json`",
        "(produced by `python bench.py`). Raw scaling JSON: rerun",
        "`python scripts/scaling_bench.py`.",
    ]
    # Preserve everything from the per-operator section on (written by hand
    # from bench.py runs) — this script owns only the scaling section above.
    bench_md = REPO / "BENCH.md"
    tail = ""
    if bench_md.exists():
        old = bench_md.read_text()
        for marker in ("## Scaling interpretation", "## Per-operator timings",
                       "## Host-variance disclosure"):
            if marker in old:
                tail = "\n\n" + old[old.index(marker):].rstrip() + "\n"
                break
    bench_md.write_text("\n".join(lines) + "\n" + tail)
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
