from crawl4ai_scraper_spark.streaming.ingest import (
    content_dedup_stream,
    distinct_estimate_stream,
    host_rate_stream,
    read_pages_stream,
    stream_dedup_extract,
    stream_extract,
    url_dedup_stream,
)
from crawl4ai_scraper_spark.streaming.sessions import host_sessions_stream
from crawl4ai_scraper_spark.streaming.transitions import transitions_stream

__all__ = ["content_dedup_stream", "distinct_estimate_stream", "host_rate_stream",
           "host_sessions_stream", "read_pages_stream", "stream_dedup_extract",
           "stream_extract", "transitions_stream", "url_dedup_stream"]
