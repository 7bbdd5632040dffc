import shutil
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TMP = REPO / ".tmp" / "pytest"


@pytest.fixture(scope="session")
def spark():
    from crawl4ai_scraper_spark.session import build_session

    s = build_session(app_name="pytest", master="local[8]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def web3():
    """Shared deterministic 3-host corpus + in-memory fetch fn."""
    from crawl4ai_scraper_spark.fixtures.webgen import WebSpec, iter_pages

    spec = WebSpec(n_hosts=3)
    corpus = {r["url"]: r for r in iter_pages(spec)}
    return spec, corpus, (lambda u: corpus[u]["html"] if u in corpus else None)


@pytest.fixture(scope="session")
def pages3(spark, web3):
    """The same corpus as a bucketed parquet pages table."""
    from crawl4ai_scraper_spark.sources.pages import read_pages, synthesize_pages

    path = str(TMP / "pages3")
    shutil.rmtree(path, ignore_errors=True)
    synthesize_pages(spark, path, n_hosts=3)
    return read_pages(spark, path)


@pytest.fixture()
def chk_dir(request):
    d = TMP / "chk" / request.node.name
    shutil.rmtree(d, ignore_errors=True)
    d.mkdir(parents=True, exist_ok=True)
    return str(d)
