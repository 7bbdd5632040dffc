"""Pure-Python semantics kernel. No Spark imports allowed in this package.

Every function here is deterministic and side-effect free. The sequential
oracle (``crawl4ai_scraper_spark.oracle``) and the vectorized UDFs
(``crawl4ai_scraper_spark.functions``) both call these exact functions, which
is what makes the per-URL extracted text byte-identical between the Spark
engine and the reference semantics.
"""

from crawl4ai_scraper_spark.kernel.urls import (
    canon_url,
    extract_domain,
    fixup_scheme,
    is_same_domain,
    match_url_pattern,
    wildcard_to_regex,
)
from crawl4ai_scraper_spark.kernel.cleaning import clean_markdown, finalize_text
from crawl4ai_scraper_spark.kernel.htmlkit import (
    cleaned_html_of,
    extract_links,
    html_to_markdown,
    page_description,
    page_title,
)
from crawl4ai_scraper_spark.kernel.selectors import (
    SELECTOR_TEMPLATES,
    extract_by_css,
    extract_by_xpath,
    extract_combined,
    extract_with_template,
    get_template,
    validate_css_selector,
    validate_xpath,
)
from crawl4ai_scraper_spark.kernel.naming import (
    clean_filename,
    format_with_metadata,
    generate_filename,
    output_rel_path,
    url_to_filename,
)

__all__ = [
    "canon_url",
    "extract_domain",
    "fixup_scheme",
    "is_same_domain",
    "match_url_pattern",
    "wildcard_to_regex",
    "clean_markdown",
    "finalize_text",
    "extract_links",
    "html_to_markdown",
    "cleaned_html_of",
    "page_title",
    "page_description",
    "url_to_filename",
    "generate_filename",
    "clean_filename",
    "output_rel_path",
    "format_with_metadata",
    "SELECTOR_TEMPLATES",
    "extract_by_css",
    "extract_by_xpath",
    "extract_combined",
    "extract_with_template",
    "get_template",
    "validate_css_selector",
    "validate_xpath",
]
