from crawl4ai_scraper_spark.fixtures.webgen import WebSpec, iter_pages, page_exists, page_html

__all__ = ["WebSpec", "iter_pages", "page_exists", "page_html"]
