"""Sequential reference simulator — the golden-output generator.

A faithful, single-threaded transcription of the reference's discovery loop
(URLDiscovery.discover_urls, /root/reference/crawler.py:167-250) and content
pass (ContentCrawler.crawl_urls → crawl_single_url, crawler.py:418-599),
with the network replaced by a page lookup (``fetch``: url → html bytes or
None). Everything nondeterministic in the reference — the live network,
``random.choice`` UA rotation (no text effect), wall clock — is removed; the
extraction pipeline is the shared kernel, so oracle text == engine text byte
for byte.

The Spark engine's pytest parity gate asserts, against this oracle:
  * crawl order   (visit sequence)    — list-equal
  * URL-seen set  (visited)           — set-equal
  * discovered    (sorted output)     — list-equal (crawler.py:250 sorts)
  * extracted text per url            — byte-equal
  * run summary                       — field-equal (crawler.py:584-592)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Set, Tuple

from crawl4ai_scraper_spark.config import CrawlJobConfig
from crawl4ai_scraper_spark.kernel.cleaning import CleaningConfig
from crawl4ai_scraper_spark.kernel.extraction import extract_record, failure_record
from crawl4ai_scraper_spark.kernel.htmlkit import extract_links
from crawl4ai_scraper_spark.kernel.urls import canon_url, is_same_domain, match_url_pattern

Fetch = Callable[[str], Optional[bytes]]


@dataclass
class OracleResult:
    visit_order: List[Tuple[str, int]] = field(default_factory=list)  # (url, depth), seq = index
    visited: Set[str] = field(default_factory=set)
    discovered: List[str] = field(default_factory=list)  # sorted final output
    relationships: Dict[str, List[str]] = field(default_factory=dict)
    records: List[dict] = field(default_factory=list)
    summary: Dict = field(default_factory=dict)


def oracle_discover(
    fetch: Fetch,
    start_url: str,
    cfg: CrawlJobConfig,
) -> OracleResult:
    """BFS discovery, statement-for-statement ≙ crawler.py:167-250."""
    res = OracleResult()
    discovered: Set[str] = set()
    to_visit: List[str] = [start_url]
    visited: Set[str] = set()
    depth_map: Dict[str, int] = {start_url: 0}

    while to_visit and len(discovered) < cfg.max_pages:
        current = to_visit.pop(0)
        if current in visited:  # unreachable for unique seeds; kept for parity
            continue
        depth = depth_map.get(current, 0)
        if depth > cfg.max_depth:
            continue
        visited.add(current)
        res.visit_order.append((current, depth))

        html = fetch(current)
        if html is not None:  # fetch success
            if match_url_pattern(current, cfg.patterns, cfg.exclude_patterns):
                discovered.add(current)
            if depth < cfg.max_depth:
                for link in extract_links(html.decode("utf-8", errors="replace"), current):
                    if not link["is_internal"]:
                        continue  # reference iterates links['internal'] only
                    href = link["href"]
                    if not href:
                        continue
                    normalized = canon_url(href, current)
                    if not cfg.include_external and not is_same_domain(normalized, start_url):
                        continue
                    if normalized not in visited and normalized not in to_visit:
                        to_visit.append(normalized)
                        depth_map[normalized] = depth + 1
                        res.relationships.setdefault(current, []).append(normalized)
        # fetch failure ≙ result.success False: nothing recorded, crawl moves on

    res.visited = visited
    res.discovered = sorted(discovered)
    return res


def oracle_extract(fetch: Fetch, urls: List[str], cfg: CrawlJobConfig,
                   crawled_at: str = "2025-01-01T00:00:00") -> Tuple[List[dict], Dict]:
    """Content pass ≙ crawler.py:547-599 (order: input list order — the
    reference gathers concurrently but crawls the sorted discovery output; the
    summary is order-insensitive)."""
    cleaning = CleaningConfig.build(**cfg.cleaning_kwargs())
    records: List[dict] = []
    for url in urls:
        html = fetch(url)
        if html is None:
            records.append(failure_record(url, "Crawl failed: Unknown error"))
        else:
            records.append(extract_record(url, html, crawled_at, cleaning))
    ok = [r for r in records if r.get("success")]
    bad = [r for r in records if not r.get("success")]
    summary = {
        "total_urls": len(urls),
        "successful": len(ok),
        "failed": len(bad),
        "total_content_length": sum(r.get("content_length", 0) for r in ok),
    }
    return records, summary


def oracle_crawl(fetch: Fetch, start_url: str, cfg: CrawlJobConfig) -> OracleResult:
    """Discovery + extraction ≙ crawl_with_discovery (crawler.py:602-655)."""
    res = oracle_discover(fetch, start_url, cfg)
    res.records, res.summary = oracle_extract(fetch, res.discovered, cfg)
    return res


def oracle_multi_seed(fetch: Fetch, seeds: List[str], cfg: CrawlJobConfig) -> List[str]:
    """Union-distinct across per-seed discoveries ≙ crawl_multiple
    (crawler.py:693-703)."""
    all_discovered: Set[str] = set()
    for seed in seeds:
        all_discovered.update(oracle_discover(fetch, seed, cfg).discovered)
    return sorted(all_discovered)
