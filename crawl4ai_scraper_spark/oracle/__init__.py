from crawl4ai_scraper_spark.oracle.simulator import (
    OracleResult,
    oracle_crawl,
    oracle_discover,
    oracle_extract,
)

__all__ = ["OracleResult", "oracle_crawl", "oracle_discover", "oracle_extract"]
