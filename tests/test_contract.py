"""Driver-contract guard: a representative subset of the Spark-vs-DuckDB
cross-checks at sf0.001 (the full set runs via tests/contract_check.py; this
keeps `pytest` fast while still failing on any contract regression)."""

import pytest

import __spark_entry__ as entrymod
from tests.contract_check import compare_query, duck_connection

SF = "/root/testdata/sf0.001"

SUBSET = [
    "url_canonicalize",
    "wildcard_include_exclude",
    "visited_anti_join",
    "first_appender_window",
    "budget_truncation",
    "run_summary_agg",
    "adjacency_collect",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "lang_id_stopwords",
    "quality_score",
    "multimodal_decode_meta",
    "segment_dedup",
    "decontaminate_ngrams",
    "sitemap_seed_expansion",
    "robots_rules_parse",
]


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", SUBSET)
def test_contract_query(spark, duck, name):
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    res = compare_query(spark, duck, name, qs[name], oq[name], SF)
    assert res["hash_match"], res


def test_every_query_has_oracle():
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    assert set(oq) <= set(qs)
    missing = set(qs) - set(oq)
    assert missing == set(), f"queries without oracle (rows-only): {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "doc_id", "lang", "lang_pred", "quality", "n_ws_tokens",
        "n_bpe_tokens", "fp", "text_md5",
    ]
