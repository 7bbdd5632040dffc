"""spark-submit --py-files smoke test — the north-rule cluster surface.

The package must run as a real `spark-submit --py-files crawl4ai_scraper_spark
.zip` job (BASELINE.json north_rule), not just as an in-process import. This
test zips the package, copies scripts/submit_crawl.py into a scratch cwd
OUTSIDE the repo (so `import crawl4ai_scraper_spark` can only resolve from
the --py-files zip), submits a small crawl against a synthesized pages
table, and checks the committed summary. ~60-90 s (one JVM cold start);
skipped when spark-submit is absent.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(), reason="no spark-submit")
def test_spark_submit_py_files_crawl(spark, tmp_path):
    pages = str(tmp_path / "pages")
    from crawl4ai_scraper_spark.sources.pages import synthesize_pages

    synthesize_pages(spark, pages, n_hosts=2, max_secs=3, max_pages=4,
                     n_buckets=8)

    pkg_zip = tmp_path / "crawl4ai_scraper_spark.zip"
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted((REPO / "crawl4ai_scraper_spark").rglob("*.py")):
            zf.write(f, f.relative_to(REPO))
    shutil.copy(REPO / "scripts" / "submit_crawl.py", tmp_path / "submit_crawl.py")

    chk = tmp_path / "chk"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(pkg_zip), str(tmp_path / "submit_crawl.py"),
         "--pages", pages, "--seed", "https://site0.example/",
         "--checkpoint", str(chk), "--config-dir", str(tmp_path / "conf"),
         "--max-depth", "3", "--max-pages", "60"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads((chk / "outputs" / "crawl_summary.json").read_text())
    assert summary["total_urls"] > 0
    assert summary["successful"] > 0


def _load_submit_crawl():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "submit_crawl_mod", REPO / "scripts" / "submit_crawl.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_submit_recrawl_priority_in_process(spark, tmp_path, capsys):
    """--recrawl-from: a revision history turns into per-url change-rate
    priorities (Cho/Garcia-Molina) feeding the priority frontier — the
    REFRESH-crawl loop as one CLI invocation. In-process (no spark-submit
    JVM): main() reuses the session via getOrCreate."""
    import datetime as dt
    import json

    from crawl4ai_scraper_spark.sources.pages import synthesize_pages

    pages = str(tmp_path / "pages")
    synthesize_pages(spark, pages, n_hosts=2, max_secs=3, max_pages=4, n_buckets=8)

    # revision history: /sec0 changed every observation, /sec1 never
    t0 = dt.datetime(2025, 1, 1)
    rows = []
    for i in range(4):
        rows.append(("https://site0.example/sec0", t0 + dt.timedelta(days=i), f"v{i}"))
        rows.append(("https://site0.example/sec1", t0 + dt.timedelta(days=i), "same"))
    hist = spark.createDataFrame(
        rows, "url string, fetched_at timestamp, content string"
    )
    hist_path = str(tmp_path / "history")
    hist.write.parquet(hist_path)

    chk = str(tmp_path / "chk")
    mod = _load_submit_crawl()
    mod.main([
        "--pages", pages, "--seed", "https://site0.example/",
        "--checkpoint", chk, "--config-dir", str(tmp_path / "conf"),
        "--max-depth", "2", "--max-pages", "200", "--dry-run",
        "--recrawl-from", hist_path,
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rounds"] >= 2 and out["discovered"] > 0

    # the changed URL outranks the unchanged one in round-2 queue order
    vis = spark.read.parquet(f"{chk}/state/visited").orderBy("seq").collect()
    order = [r["url"] for r in vis]
    assert order.index("https://site0.example/sec0") < order.index(
        "https://site0.example/sec1"
    )


def test_submit_priority_signal_in_process(spark, tmp_path, capsys):
    """--priority-signal: a caller-supplied (url, priority) frame reorders
    the frontier."""
    import json

    from crawl4ai_scraper_spark.sources.pages import synthesize_pages

    pages = str(tmp_path / "pages")
    synthesize_pages(spark, pages, n_hosts=2, max_secs=3, max_pages=4, n_buckets=8)
    sig = spark.createDataFrame(
        [("https://site0.example/sec2", 100.0)], "url string, priority double"
    )
    sig_path = str(tmp_path / "signal")
    sig.write.parquet(sig_path)

    chk = str(tmp_path / "chk2")
    mod = _load_submit_crawl()
    mod.main([
        "--pages", pages, "--seed", "https://site0.example/",
        "--checkpoint", chk, "--config-dir", str(tmp_path / "conf"),
        "--max-depth", "2", "--max-pages", "200", "--dry-run",
        "--priority-signal", sig_path,
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["discovered"] > 0
    vis = spark.read.parquet(f"{chk}/state/visited").orderBy("seq").collect()
    order = [r["url"] for r in vis]
    sec2 = order.index("https://site0.example/sec2")
    others = [order.index(u) for u in order
              if u.startswith("https://site0.example/sec") and u != "https://site0.example/sec2"]
    assert others and sec2 < min(others)
