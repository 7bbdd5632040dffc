"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship pipeline on /root/testdata/sf0.001 (smoke check).
``queries``    — one callable per implemented operator (SURVEY.md §2 + the
                 training-data operators), registered in
                 ``crawl4ai_scraper_spark.contract``.
``oracle_sql`` — matching DuckDB ANSI-SQL oracles (column names aligned).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the training-data text pipeline over the documents corpus —
    language-ID + quality scoring + token counts + fingerprint + exact-dup
    survivor marks, one declarative plan (no UDFs, fully codegen'd)."""
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators import textops as T
    from crawl4ai_scraper_spark.operators.dedup import text_key

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    enriched = docs.select(
        "doc_id",
        "lang",
        T.lang_id(F.col("text")).alias("lang_pred"),
        T.quality_score(F.col("text")).alias("quality"),
        T.token_count_ws(F.col("text")).alias("n_ws_tokens"),
        T.token_count_bpe(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        T.fingerprint(F.col("text")).alias("fp"),
        text_key(F.col("text")).alias("text_md5"),
    )
    return enriched.orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawl4ai_scraper_spark import contract

    return contract.queries()


def oracle_sql() -> dict[str, str]:
    from crawl4ai_scraper_spark import contract

    return contract.oracle_sql()
