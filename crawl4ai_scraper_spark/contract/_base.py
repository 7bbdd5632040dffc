"""Driver-contract queries: every operator from SURVEY.md §2 (plus the
training-data operators) expressed over the driver's testdata tables, each
with a DuckDB-SQL oracle that must value-hash-match.

Conventions that make the cross-engine hash hold:
* money aggregates in DECIMAL(18,4)/(38,4) — exact, associative, order-free;
* per-row double math only (identical IEEE expression trees both sides),
  rounded to 4dp; rankings tie-broken by id;
* hashes via md5 hex (identical text output in Spark and DuckDB);
* every computed column aliased identically in both engines.

The synthetic URL column used by the crawl-fragment operators is built from
``documents`` deterministically (same expression in both engines), since the
testdata has no URL column of its own.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.kernel.urls import wildcard_to_regex
from crawl4ai_scraper_spark.operators import dedup as D
from crawl4ai_scraper_spark.operators import selection as SEL
from crawl4ai_scraper_spark.operators import similarity as S
from crawl4ai_scraper_spark.operators import textops as T
from crawl4ai_scraper_spark.operators.multimodal import media_metadata

QueryFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: Dict[str, Tuple[QueryFn, str]] = {}


def _q(name: str, sql: str):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# Synthetic URL fragment shared by the crawl operators (identical in SQL)
# ---------------------------------------------------------------------------

_URL_SQL = (
    "'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN '/' WHEN doc_id % 3 = 1 THEN '?x=1#frag' ELSE '#top' END"
)


def _url_col() -> F.Column:
    return F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/docs/d"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?x=1#frag"))
        .otherwise(F.lit("#top")),
    )




#: Names the section modules (q_*.py) star-import. Underscore helpers are
#: deliberately exported — they are this package's shared private toolkit.
__all__ = [
    "Callable", "DataFrame", "Dict", "F", "QueryFn", "S", "SEL",
    "SparkSession", "T", "Tuple", "Window", "D", "media_metadata",
    "wildcard_to_regex", "_REGISTRY", "_URL_SQL", "_q", "_t", "_url_col",
]
