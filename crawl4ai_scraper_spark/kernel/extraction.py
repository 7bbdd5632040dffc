"""Per-page extraction record assembly — the content-crawl inner loop.

``extract_record`` composes the same steps as the reference's
ContentCrawler.crawl_single_url success path (crawler.py:465-496): render the
page, clean the markdown (content_filters pipeline), apply the <100-char
fallback, and build the 9-field content record. One call = one row of the
``documents_out`` table. The sequential oracle and the Spark Arrow UDF both
call this function, so the per-URL ``markdown`` (the extracted text) is
byte-identical between the two by construction.

Determinism deltas vs the reference, by design:
* ``crawled_at`` is the page's ``warc_ts`` (passed in), not wall clock.
* The user agent is picked as ``ua_list[md5(url) % len]`` instead of
  ``random.choice`` (crawler.py:446-452) — the reference's UA rotation has no
  effect on extracted text; ours is recorded as reproducible metadata only.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

from crawl4ai_scraper_spark.kernel.cleaning import (
    CleaningConfig,
    clean_markdown,
    clean_with_selectors,
    finalize_text,
)
from crawl4ai_scraper_spark.kernel.htmlkit import fetch_render

# The reference's rotation pool, verbatim (crawler.py:44-60) — recorded as
# metadata so a downstream fetch layer could replay identical headers.
USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
]


def pick_user_agent(url: str) -> str:
    digest = hashlib.md5(url.encode()).digest()
    return USER_AGENTS[int.from_bytes(digest[:8], "big") % len(USER_AGENTS)]


def _selector_content(html, cfg: CleaningConfig) -> Optional[str]:
    """Combined CSS/XPath extraction when the config carries selectors
    (≙ extract_with_selectors, content_filters.py:427-443)."""
    if not cfg.uses_selectors:
        return None
    from crawl4ai_scraper_spark.kernel.htmlkit import decode_html
    from crawl4ai_scraper_spark.kernel.selectors import extract_combined

    return extract_combined(
        decode_html(html),
        css_selectors=cfg.content_css_selectors,
        xpath_expressions=cfg.content_xpath,
        exclude_css=cfg.exclude_css_selectors,
        exclude_xpath=cfg.exclude_xpath,
    )


def extract_text(html, url: str, cfg: Optional[CleaningConfig] = None,
                 use_selectors: bool = False, selector_content: Optional[str] = None) -> str:
    """html (binary or str) → the final extracted text for this URL."""
    rendered = fetch_render(html, url)
    cfg = cfg or CleaningConfig()
    if selector_content is None and cfg.uses_selectors:
        use_selectors, selector_content = True, _selector_content(html, cfg)
    if use_selectors:
        cleaned = clean_with_selectors(
            "", rendered["markdown"], rendered["title"], cfg, selector_content
        )
    else:
        cleaned = clean_markdown(rendered["markdown"], rendered["title"], cfg)
    return finalize_text(cleaned, rendered["cleaned_html"])


def extract_record(url: str, html, crawled_at: str,
                   cfg: Optional[CleaningConfig] = None) -> Dict:
    """Success-path content record, field-for-field ≙ crawler.py:486-496."""
    rendered = fetch_render(html, url)
    cfg = cfg or CleaningConfig()
    if cfg.uses_selectors:
        cleaned = clean_with_selectors(
            "", rendered["markdown"], rendered["title"], cfg, _selector_content(html, cfg)
        )
    else:
        cleaned = clean_markdown(rendered["markdown"], rendered["title"], cfg)
    text = finalize_text(cleaned, rendered["cleaned_html"])
    return {
        "url": url,
        "title": rendered["title"],
        "description": rendered["description"],
        "markdown": text,
        "content_length": len(text),
        "links_count": rendered["links_internal"] + rendered["links_external"],
        "crawled_at": crawled_at,
        "success": True,
        "user_agent": pick_user_agent(url),
    }


def failure_record(url: str, error: str) -> Dict:
    """≙ crawler.py:520-534 (both the failed-result and exception shapes)."""
    return {"url": url, "success": False, "error": error}
