from crawl4ai_scraper_spark.streaming.ingest import (
    host_rate_stream,
    read_pages_stream,
    stream_extract,
)

__all__ = ["host_rate_stream", "read_pages_stream", "stream_extract"]
