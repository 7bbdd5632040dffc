from crawl4ai_scraper_spark.plans.driver import CrawlResult, run_crawl, run_multi_seed

__all__ = ["CrawlResult", "run_crawl", "run_multi_seed"]
