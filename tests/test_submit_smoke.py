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
