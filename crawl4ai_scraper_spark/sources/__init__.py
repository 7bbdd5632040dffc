from crawl4ai_scraper_spark.sources.pages import (
    PAGES_SCHEMA,
    read_pages,
    seed_frame,
    seeds_from_file,
    synthesize_pages,
)

__all__ = ["PAGES_SCHEMA", "read_pages", "seed_frame", "seeds_from_file", "synthesize_pages"]
