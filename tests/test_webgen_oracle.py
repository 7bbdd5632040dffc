"""Determinism and structure of the synthetic web + oracle sanity (no Spark)."""

from crawl4ai_scraper_spark.config import CrawlJobConfig
from crawl4ai_scraper_spark.fixtures.webgen import (
    WebSpec,
    iter_pages,
    iter_urls,
    page_exists,
    page_html,
)
from crawl4ai_scraper_spark.kernel.extraction import extract_text
from crawl4ai_scraper_spark.oracle import oracle_crawl, oracle_discover


def test_pages_are_pure_functions_of_url():
    spec = WebSpec(n_hosts=2)
    urls = list(iter_urls(spec))
    assert len(urls) == len(set(urls))
    for url in urls[:20]:
        assert page_html(spec, url) == page_html(spec, url)
        assert page_exists(spec, url)
    assert page_html(spec, "https://site0.example/nope") is None
    assert page_html(spec, "https://other.example/") is None


def test_golden_text_column_matches_kernel():
    spec = WebSpec(n_hosts=2)
    for row in list(iter_pages(spec))[:15]:
        assert row["text"] == extract_text(row["html"], row["url"])


def test_corpus_has_required_shapes():
    spec = WebSpec(n_hosts=3)
    rows = list(iter_pages(spec))
    texts = {r["url"]: r["text"] for r in rows}
    # short-content fallback pages exist (crawler.py:475-484 path)
    assert any(t.startswith("[Note:") for t in texts.values())
    # hot host 0 is the biggest (skew fixture)
    by_host = {}
    for r in rows:
        host = r["url"].split("/")[2]
        by_host[host] = by_host.get(host, 0) + 1
    assert by_host["site0.example"] == max(by_host.values())


def test_oracle_bfs_is_level_ordered():
    spec = WebSpec(n_hosts=2)
    corpus = {r["url"]: r for r in iter_pages(spec)}
    cfg = CrawlJobConfig(max_depth=3, max_pages=10_000)
    res = oracle_discover(lambda u: corpus[u]["html"] if u in corpus else None,
                          "https://site0.example/", cfg)
    depths = [d for _, d in res.visit_order]
    assert depths == sorted(depths)  # strict level order
    assert max(depths) == 3
    assert res.discovered == sorted(res.discovered)


def test_oracle_budget_checked_per_dequeue():
    spec = WebSpec(n_hosts=2)
    corpus = {r["url"]: r for r in iter_pages(spec)}
    fetch = lambda u: corpus[u]["html"] if u in corpus else None
    cfg = CrawlJobConfig(max_depth=3, max_pages=5)
    res = oracle_crawl(fetch, "https://site0.example/", cfg)
    assert len(res.discovered) == 5
    # the crawl may visit MORE than 5 urls (failures / non-matching visits)
    assert len(res.visit_order) >= 5
