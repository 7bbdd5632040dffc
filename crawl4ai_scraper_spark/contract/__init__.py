"""Driver-contract queries: every operator from SURVEY.md §2 (plus the
training-data operators) expressed over the driver's testdata tables, each
with a DuckDB-SQL oracle that must value-hash-match. Conventions (DECIMAL
money aggregates, identical IEEE double trees, md5 hashes, aligned
aliases) are documented in ``_base`` — the section modules register into
its shared ``_REGISTRY`` via ``_q`` in import order, which therefore IS
the registration order the export rotation below relies on.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import (  # noqa: F401
    QueryFn,
    _REGISTRY,
    _q,
    _t,
    _url_col,
)
from typing import Dict

# Section imports REGISTER the queries — order defines registration order.
from crawl4ai_scraper_spark.contract import q_crawl  # noqa: F401,E402
from crawl4ai_scraper_spark.contract import q_dedup_ann  # noqa: F401,E402
from crawl4ai_scraper_spark.contract import q_tpch  # noqa: F401,E402
from crawl4ai_scraper_spark.contract import q_sessions_hygiene  # noqa: F401,E402
from crawl4ai_scraper_spark.contract import q_quality_pack  # noqa: F401,E402
from crawl4ai_scraper_spark.contract import q_dsir_sketches  # noqa: F401,E402
from crawl4ai_scraper_spark.contract import q_pq_graph  # noqa: F401,E402
from crawl4ai_scraper_spark.contract import q_mixing_layout  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Public registry
# ---------------------------------------------------------------------------

#: Queries the driver has already cross-validated against the DuckDB oracle in
#: rounds 1-3 (union of CORRECTNESS_r0{1,2,3}.json keys).  The driver samples
#: the HEAD of the registry each round, so we export never-sampled queries
#: first — names stay stable, only the iteration order rotates — to maximize
#: independent driver-oracle coverage across rounds (VERDICT r3, next-round #1).
_DRIVER_SAMPLED_R1_R3 = frozenset({
    "adjacency_collect", "ann_cosine_topk", "ann_ivf_assign",
    "ann_ivf_assign_topk", "ann_ivf_kmeans_step", "ann_ivf_topk",
    "ann_lsh_buckets", "bfs_level_rank", "broadcast_rules_join",
    "budget_truncation", "custom_pattern_path", "dedup_embedding_cosine",
    "dedup_embedding_lsh", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_simhash_pairs", "doc_fingerprint",
    "domain_extract", "embedding_cluster_balance", "fetch_equi_join",
    "filename_hash_convention", "final_sort_limit", "first_appender_window",
    "host_reputation", "lang_id_stopwords", "links_count_agg", "lsh_recall",
    "minhash_recall", "multimodal_decode_meta", "multimodal_embed",
    "multimodal_frame_sample", "multimodal_resize_meta",
    "ngram_jaccard_pairs", "pushdown_filter_agg", "quality_score",
    "run_summary_agg", "same_domain_gate", "seed_scheme_fixup",
    "semdedup_survivors", "sessionize_events", "title_based_filename",
    "token_counts", "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "union_distinct_seeds",
    "url_canonicalize", "url_to_filename", "visited_anti_join",
    "wildcard_include_exclude", "yaml_front_matter",
})


def _driver_sampled() -> frozenset:
    """Union of every query the driver has ever cross-validated, read from
    the CORRECTNESS_r*.json artifacts at the repo root when present — so the
    rotation below is SELF-MAINTAINING: each round's new sample is excluded
    from the next round's head automatically. Falls back to the static
    r1-r3 union when the artifacts are absent (e.g. an installed copy of
    the package outside the build repo)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    seen: set = set()
    found = False
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                seen |= set(json.load(fh).keys())
            found = True
        except (OSError, ValueError):
            continue
    return frozenset(seen) if found else _DRIVER_SAMPLED_R1_R3


def _export_order() -> list:
    """Registry keys with never-driver-sampled queries first (each block in
    registration order)."""
    sampled = _driver_sampled()
    fresh = [n for n in _REGISTRY if n not in sampled]
    seen = [n for n in _REGISTRY if n in sampled]
    return fresh + seen


def queries() -> Dict[str, QueryFn]:
    return {name: _REGISTRY[name][0] for name in _export_order()}


def oracle_sql() -> Dict[str, str]:
    return {
        name: _REGISTRY[name][1]
        for name in _export_order()
        if _REGISTRY[name][1]
    }
