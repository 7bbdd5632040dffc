#!/usr/bin/env python3
"""Regenerate PLANS.md: the key physical plans, captured from a live session,
so the optimization claims (broadcast strategy, column pruning, predicate
pushdown) are inspectable without running anything."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def plan_of(df) -> str:
    s = df._jdf.queryExecution().executedPlan().toString()
    s = re.sub(r"#\d+[L]?", "#_", s)           # stable attr ids
    s = re.sub(r"plan_id=\d+", "plan_id=_", s)
    s = re.sub(r"file:[^\],\s]+", "file:<path>", s)
    return s.strip()


def main():
    import shutil

    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark import contract
    from crawl4ai_scraper_spark.plans.frontier import fetch_join
    from crawl4ai_scraper_spark.session import build_session
    from crawl4ai_scraper_spark.sources.pages import read_pages, synthesize_pages

    spark = build_session(app_name="plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    web = str(REPO / ".tmp" / "plans_web")
    shutil.rmtree(web, ignore_errors=True)
    synthesize_pages(spark, web, n_hosts=2, max_secs=3, max_pages=3)
    pages = read_pages(spark, web)
    frontier = spark.createDataFrame(
        [("https://site0.example/", "site0.example", 0, 1)],
        "url string, host string, depth int, arrival_rank long",
    )

    sections = []

    sections.append((
        "Fetch join — broadcast the needles, scan the haystack",
        "The frontier is broadcast INTO the pages scan (inner BHJ, build side = "
        "frontier); the pages table is scanned in place, never shuffled, and the "
        "scan reads only (pbucket, url, html). A left-outer join with the frontier "
        "on the left would instead shuffle the entire stored web every round.",
        plan_of(fetch_join(pages, frontier.select("url"), 32, 1_000_000)),
    ))

    sections.append((
        "Max-depth existence probe — no html at all",
        "Frontier rows at max_depth only need to know the page exists: the join "
        "reads the url column only (ReadSchema has no html).",
        plan_of(
            pages.select("pbucket", "url").join(
                F.broadcast(
                    frontier.withColumn(
                        "pbucket", F.pmod(F.xxhash64("url"), F.lit(32)).cast("int")
                    )
                ),
                ["pbucket", "url"], "inner",
            )
        ),
    ))

    sections.append((
        "Predicate pushdown — filters reach the parquet scan",
        "The contract's scan-heavy query shows PushedFilters at the FileScan.",
        plan_of(contract.queries()["pushdown_filter_agg"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "As-of join — union-sort-carry, one shuffle, no range explosion",
        "Spark has no native ASOF JOIN; operators/temporal.py composes union → "
        "window(last ignorenulls) → filter. The plan has exactly ONE exchange on "
        "the join key feeding the window sort, and no Join operator at all — "
        "contrast with the naive range-join (theta join, O(n·m) compare) or "
        "per-key collect.",
        plan_of(contract.queries()["events_asof_join"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Per-doc top-n-gram — explode → count → min-struct argmax",
        "Both aggregates carry partial_* map-side combine (HashAggregate pairs), "
        "keys are uniform in doc_id so no skew at any corpus size; the argmax is "
        "a min(struct(-cnt, gram)) aggregate, NOT a window over a global sort.",
        plan_of(contract.queries()["top_ngram_stats"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Keep-latest revision — single max-struct groupBy, no window",
        "latest_revision packs (ts, tiebreak, payload) into a struct and takes "
        "MAX — one aggregate with map-side combine; the windowed row_number "
        "equivalent would sort every key group.",
        plan_of(contract.queries()["url_latest_revision"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "TPC-H Q5 — 6-way join, dims broadcast",
        "region/nation/supplier reach the plan as BroadcastHashJoins; only the "
        "fact-side customer⋈orders⋈lineitem chain shuffles. With AQE the "
        "filtered sides can demote to broadcast at runtime too.",
        plan_of(contract.queries()["tpch_q5_local_supplier_volume"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "TPC-H Q21 — correlated EXISTS / NOT EXISTS as physical semi + anti joins",
        "The round-3 TPC-H suite (q2, q4, q6-q22 adapted to the testdata "
        "schema) keeps every classic plan shape; Q21 is the hardest: the "
        "EXISTS ('another supplier touched this order') and NOT EXISTS ('no "
        "OTHER supplier was late') subqueries reach the physical plan as a "
        "LeftSemi and a LeftAnti hash join, each with the non-equi "
        "s2 <> l_suppkey residue in the join condition — never a "
        "CartesianProduct, never a re-scan per outer row. The suite-wide "
        "properties (no cartesian anywhere, TakeOrderedAndProject for the "
        "deterministic top-k queries, broadcast scalar thresholds) are "
        "asserted in tests/test_plans.py::test_tpch_suite_plan_shapes.",
        plan_of(contract.queries()["tpch_q21_suppliers_kept_waiting"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "TPC-H Q11 — grouped value vs a global-scalar HAVING, 1-row broadcast",
        "The 'total stock value' scalar enters as a BroadcastNestedLoopJoin "
        "over a ONE-ROW aggregate (never a cartesian shuffle); the per-part "
        "and total aggregations share the same DECIMAL-exact sum so the "
        "value > total*0.001 comparison is reproducible cross-engine. Q15's "
        "scalar-max filter goes one better: Catalyst rewrites the "
        "crossJoin + equality filter into a broadcast EQUI-join on the max "
        "revenue itself.",
        plan_of(contract.queries()["tpch_q11_important_value"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Anchor-text aggregation — html never shuffles, two bounded exchanges",
        "page_anchor_texts extracts (target, anchor) in a narrow Arrow pass "
        "(MapInPandas directly over the scan — the html binary never enters an "
        "Exchange), then groups by the (target, anchor) PAIR (uniform even for "
        "a target with 10^9 inlinks, map-side combine) before the per-target "
        "window/collect, which sees only distinct labels and keeps at most "
        "max_anchors of them.",
        plan_of(contract.queries()["anchor_text_agg"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "URL blocklist + spam screen — broadcast anti-join, filter pushed to the scan",
        "`plans/politeness.url_blocklist_filter` (wired into `run_round` behind\n"
        "`cfg.url_spam_threshold` / `blocked_hosts`). The executed plan shows the two\n"
        "claims: the blocklist is a BroadcastExchange into a LeftAnti hash join (the\n"
        "url side is never exchanged), and Catalyst pushes the `spam_score < thr`\n"
        "CASE-sum predicate BELOW the join, to the scan side — candidates are\n"
        "score-screened before they even reach the anti-join's probe (hand-reduced\n"
        "capture; the live assertion is tests/test_plans.py\n"
        "test_url_blocklist_filter_broadcast_anti_join):",
        "Project [doc_id, url, round(CASE-sum(betting..xxx), 4) AS spam_score]\n"
        "+- BroadcastHashJoin [_host], [_host], LeftAnti, BuildRight\n"
        "   :- Project [doc_id, url, _host]\n"
        "   :  +- Filter (round(CASE-sum(betting..xxx), 4) < 0.9)     ← pushed down\n"
        "   :     +- <candidate scan>\n"
        "   +- BroadcastExchange HashedRelationBroadcastMode\n"
        "      +- Filter isnotnull(host)\n"
        "         +- <blocklist>",
    ))

    sections.append((
        "NB classifier scoring — model artifact broadcast, token stream unshuffled",
        "nb_token_weights trains at distinct-token key space (map-side combined "
        "conditional sums; the top-V cut is TakeOrderedAndProject); nb_score "
        "broadcasts the ≤V-row weight table into the corpus token stream — the "
        "stream reaches the BroadcastHashJoin with NO exchange, so hot tokens "
        "('the') can never skew a shuffle — and the only corpus-volume exchange "
        "is the per-doc sum with partial_sum combine.",
        plan_of(contract.queries()["nb_classifier_score"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "BPE segmentation — word→pieces serving map broadcast, one reassembly shuffle",
        "bpe_segment joins the trained word→pieces map (distinct-word volume, "
        "broadcast) into the posexploded token stream and reassembles per doc — "
        "the same single-shuffle shape as vocab_encode; training itself never "
        "appears here because it runs over the distinct-word artifact, not the "
        "corpus (bpe_train per-merge groupBys, or bpe_train_local's one "
        "distributed count + driver merge loop).",
        plan_of(contract.queries()["bpe_segment"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Sequence packing — two-phase global cumsum, no whole-corpus window",
        "pack_token_ids lays every doc's id array at an exact global token "
        "position. The plan's ONLY unpartitioned ordering windows run over "
        "BUCKET IDS (corpus/65536 rows) and the ≤V-row vocab; the within-bucket "
        "cumsum window is partitioned by _b so no task ever sorts more than "
        "bucket_size rows. The drop-last cut is a broadcast single-row total "
        "(BroadcastNestedLoopJoin over 1 row), never a recount per partition.",
        plan_of(contract.queries()["sequence_pack_ids"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Weighted sampling — digest math in the scan, top-k without a sort",
        "weighted_sample ranks by -ln(u)/w with u drawn from md5 — a pure "
        "projection evaluated inside the scan stage — and takes the k smallest "
        "via TakeOrderedAndProject: per-partition heaps, ZERO exchanges, no RNG "
        "state to coordinate across executors.",
        plan_of(contract.queries()["weighted_sample"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "DSIR importance weights — profiles broadcast, gram stream unshuffled",
        "dsir_log_weights (operators/selection.py): the unigram+bigram gram "
        "stream is Project→Generate straight off the pruned (doc_id, text) scan "
        "— no shuffle, no UDF; both B-row hashed-ngram profiles enter as "
        "BroadcastHashJoins (each profile is collected ONCE driver-side — "
        "model-sized, like k-means centroids — totaled locally, and rebuilt as "
        "a LocalTableScan for the broadcast, so nothing stays cached for the "
        "session); the per-gram 12dp log-ratio is cast DECIMAL(28,12) and the "
        "gram volume crosses exactly ONE exchange — the map-side-combined "
        "groupBy(doc_id). Selection (second plan) is TakeOrderedAndProject over "
        "the weights with the Gumbel key computed in the scan-side projection. "
        "The n-gram arrays themselves are built with an (n-1)-fold zip_with of "
        "shifted slices (textops.ngrams_from_tokens — 8.7× faster than the "
        "transform(sequence, …) form, identical multiset); every n-gram "
        "consumer (decontamination, repetition signals, top-ngram stats, DSIR) "
        "shares the fixed form. Asserted in tests/test_plans.py.",
        plan_of(contract.queries()["dsir_log_weights"](spark, "/root/testdata/sf0.001"))
        + "\n\n"
        + plan_of(contract.queries()["dsir_select_topk"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "SemDeDup — cell-bounded pairs, loser set rejoins broadcast-able",
        "semdedup (operators/similarity.py): the cell assignment and the "
        "centroid-similarity priority are pure projections over the embeddings "
        "scan (the literal-centroid dot products fold into one Project — no "
        "join, no shuffle, same shape as ann_ivf_assign). Candidate pairs come "
        "from a self equi-join ON THE CELL KEY — a plain hash shuffle whose "
        "per-task volume is bounded by cell population (with trained centroids "
        "the cells are size-controlled; never an all-pairs product). The ≥τ "
        "cosine and the (cs, id) dominance predicate run inside the join's "
        "post-condition, the loser ids collapse through a DISTINCT (map-side "
        "combined), and the final keep flag is a left join of the assignment "
        "stream against that loser set — at production selectivity the loser "
        "side is the small side and AQE picks a broadcast. Two shuffles total "
        "at corpus volume: the cell join and the loser DISTINCT. Skewed cells "
        "are the known failure mode — the SemDeDup paper's answer (more cells) "
        "is ours too: n_cells is a parameter and the trained-quantizer path "
        "(ivf_build) feeds balanced cells the same way.",
        plan_of(contract.queries()["semdedup_survivors"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Sketch family — bounded-key synopses, the corpus never re-shuffles",
        "operators/sketches.py: every sketch shares one plan law — the only "
        "corpus-volume exchange is a map-side-combined groupBy over a key "
        "space FIXED by the sketch parameters, never by the data. Shown "
        "here: (1) hll_setops — two tagged scans union into ONE ≤2·2^b-key "
        "aggregate, the union synopsis is a per-bucket max, and the whole "
        "cross-snapshot overlap dashboard (|A|, |B|, |A∪B|, |A∩B|) contains "
        "NO Join operator at all — the two corpora are never joined; "
        "(2) sketch_cms_freq — the Count-Min build is a ≤d·w-key aggregate "
        "and the probe side enters as a BroadcastHashJoin (probe frame and "
        "synopsis are both tiny); (3) token_len_quantiles — exact order "
        "statistics where the sort/window runs on the bounded value "
        "HISTOGRAM, never the raw rows, and the quantile targets arrive as "
        "a broadcast 4-row frame. Asserted in tests/test_plans.py "
        "(test_sketch_roundout_plan_shapes, test_sketch_setops_plan_shapes).",
        plan_of(contract.queries()["sketch_hll_setops"](spark, "/root/testdata/sf0.001"))
        + "\n\n"
        + plan_of(contract.queries()["sketch_cms_freq"](spark, "/root/testdata/sf0.001"))
        + "\n\n"
        + plan_of(contract.queries()["token_len_quantiles"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Product quantization — Exchange-free encode, ADC over the code table",
        "pq_encode (operators/similarity.py) is a pure scan→Project: every "
        "sub-centroid distance folds into literal column math (no Exchange "
        "anywhere — asserted in tests/test_ops_extra.py). pq_adc_topk "
        "broadcasts the query rows — each carrying its driver-computed m×k "
        "ADC distance LUT (bit-identical IEEE fold to the in-plan tree) — "
        "into a scan of the CODE table (64× less I/O than the float scan); "
        "every candidate distance is m element_at lookups into the LUT, no "
        "per-candidate dot products, and the only exchange is the per-query "
        "top-k window over candidate rows — at production the IVF cell "
        "restriction bounds that to cell size.",
        plan_of(contract.queries()["ann_pq_encode"](spark, "/root/testdata/sf0.001"))
        + "\n\n"
        + plan_of(contract.queries()["ann_pq_adc_topk"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "IVF-PQ top-k — cell restriction × ADC lookups, the 100-TB ANN plan",
        "ann_ivf_pq_topk composes the two scale levers: the IVF coarse cell "
        "assignment restricts each query to its nprobe nearest cells (an "
        "EQUI join on cell id — the only corpus-volume stage sees "
        "|corpus|·nprobe/n_cells rows), and within a cell every candidate "
        "distance is m element_at lookups into the query's broadcast ADC "
        "LUT (computed driver-side once per query from the literal "
        "codebook — zero per-candidate float dot products). The final "
        "top-k window runs per query over cell-bounded candidates.",
        plan_of(contract.queries()["ann_ivf_pq_topk"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Sentence chunking — closed-form chunk ids, zero per-doc state",
        "textops.chunk_sentences splits on sentence boundaries with a "
        "posexplode, then assigns fixed-budget chunk ids in CLOSED FORM "
        "(floor(cum_len/budget) over a doc-keyed running sum window) — no "
        "per-doc sequential scan UDF, no state. One exchange for the "
        "doc-keyed window, one for the chunk reassembly groupBy; both key "
        "on doc_id so hot documents can't skew a reducer beyond their own "
        "sentence count.",
        plan_of(contract.queries()["chunk_sentences"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Connected components — star contraction, O(log n) rounds",
        "graph.connected_components alternates large-star / small-star "
        "(Kiveris et al. 2014): per round two map-side-combined groupBys on "
        "the node key plus one equi-join, lineage truncated with "
        "localCheckpoint — the shown plan is one round's small-star output "
        "(post-checkpoint plans collapse to scans). Min-label propagation "
        "(dup_clusters) needs O(diameter) rounds on chain-shaped graphs; the "
        "star form closes a 33-node chain in ≤8 rounds (pytest-pinned).",
        plan_of(contract.queries()["graph_connected_components"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Per-doc keywords — one corpus shuffle, df over collapsed postings",
        "doc_top_keywords: the raw token stream crosses exactly one exchange "
        "(the (term, doc) postings groupBy with partial_count combine); df "
        "comes from an unbounded window over the ALREADY-COLLAPSED postings "
        "(one row per term-doc), N is a 1-row broadcast, and the per-doc "
        "top-k window sees ≤|doc vocab| rows per key.",
        plan_of(contract.queries()["doc_top_keywords"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "LR classifier training — broadcast weights, two map-side-combined aggs",
        "classifier.lr_train (lr_quality_train): per GD step the 64-row "
        "weight table is BROADCAST into the feature scan (never a shuffled "
        "join), margins collapse in ONE doc-keyed groupBy with "
        "partial_sum, and the gradient groupBy runs over 64 dim keys — "
        "partial aggregation collapses each task to ≤64 rows before the "
        "exchange. The corpus-volume feature table crosses one exchange "
        "per pass; weights are the only driver artifact (model-sized).",
        plan_of(contract.queries()["lr_quality_train"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Content-defined chunking — one doc-key window, no per-doc state",
        "dedup.cdc_chunks (cdc_chunk_hashes): Rabin-style boundaries are a "
        "pure digest predicate per token; chunk ids are CLOSED FORM (a "
        "doc-keyed running count window), so there is no sequential "
        "per-doc UDF and no state. The token stream crosses the doc-keyed "
        "window exchange once; the (doc, chunk) reassembly groupBy keys on "
        "the same doc id.",
        plan_of(contract.queries()["cdc_chunk_hashes"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Corpus novelty — df=1 grams keep their owner, no gram join-back",
        "textops.doc_novelty (doc_novelty_scores): the distinct (doc, gram) "
        "stream feeds TWO map-side-combined aggregations — a doc-keyed "
        "count and a gram-keyed df count whose df=1 rows carry MIN(doc) as "
        "the owner — so per-doc novelty is a 1-row-per-doc join of two "
        "aggregates; the gram table never joins against itself.",
        plan_of(contract.queries()["doc_novelty_scores"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Readability — pure projection at scan speed",
        "textops.readability (readability_scores): syllable/sentence/word "
        "counts are regexp/array expressions inside WholeStageCodegen over "
        "the scan — ZERO exchanges, no Generate, no Python.",
        plan_of(contract.queries()["readability_scores"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "OPIC + TrustRank — the pagerank join/agg shape with rank-vector variants",
        "graph.opic_step banks cash into history and redistributes per step "
        "(dangling mass via one scalar aggregate, re-injected uniformly); "
        "graph.trustrank personalizes the teleport vector to the seed set. "
        "Both reuse the pagerank per-iteration shape: one edges⋈rank "
        "equi-join plus one dst-keyed groupBy with partial DECIMAL sums — "
        "shown here for one OPIC step.",
        plan_of(contract.queries()["opic_cash_step"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Gram matrix — flattened outer product, no self-join, one exchange",
        "similarity.gram_matrix (embedding_gram): the d² per-vector products "
        "are ONE flattened codegen array (no exploded self-join), collapsed "
        "by a single (i,j)-keyed groupBy with partial aggregation — every "
        "task reduces to ≤ d² rows before the only exchange.",
        plan_of(contract.queries()["embedding_gram"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Fuzzy decontamination — eval side broadcast, corpus never re-keyed",
        "dedup.fuzzy_decontaminate (fuzzy_decontaminate): the benchmark-"
        "sized eval bands and shingle sets enter via BroadcastHashJoin; the "
        "training corpus explodes only to scalar band rows and its single "
        "corpus-volume shuffle is the co-keyed shingle join-back on the "
        "train id.",
        plan_of(contract.queries()["fuzzy_decontaminate"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Winnowing — doc-keyed running-window MIN, no joins",
        "dedup.winnowing_fingerprints (winnowing_fingerprints): per-window "
        "argmin (rightmost tie) is a running-frame MIN over the gram stream "
        "keyed on the doc id — selection and dedup ride one doc exchange; "
        "the oracle replays the same set quadratically.",
        plan_of(contract.queries()["winnowing_fingerprints"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Multi-probe IVF — corpus keeps 1 cell/vector, queries explode & broadcast",
        "similarity.ivf_multiprobe_topk (ann_ivf_multiprobe): probe-2 "
        "candidates come from the SAME cell equi-join as single-probe IVF — "
        "only the few queries explode to n_probe rows and broadcast; the "
        "corpus is never re-partitioned or re-scanned per probe.",
        plan_of(contract.queries()["ann_ivf_multiprobe"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Redirect resolution — ceil(log2 L) mapping self-joins (pointer doubling)",
        "graph.resolve_redirects (redirect_resolution): each round jumps "
        "every pointer to its pointer's pointer — the executed plan below is "
        "the final checkpointed mapping scan; the per-round shape is one "
        "co-partitioned equi-join of the 2-column mapping with itself plus "
        "a scalar all-done check, O(log max_hops) rounds total.",
        plan_of(contract.queries()["redirect_resolution"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Host boilerplate strip — tiny boilerplate set broadcast into an anti-join",
        "dedup.host_boilerplate_strip (host_boilerplate_strip): the flagging "
        "side (segments in >=min_docs and >=pct% of a host's docs) is small by "
        "construction, so AQE turns the keep-join into a broadcast LeftAnti "
        "against the full segment stream — the segment text itself shuffles "
        "once for the (host, md5(seg)) count agg (map-side combined) and once "
        "for doc reassembly; host doc counts ride a |hosts|-row broadcast.",
        plan_of(contract.queries()["host_boilerplate_strip"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "URL template mining — scan-speed templating into one grouped count",
        "webmeta.url_path_templates (url_path_templates): host/path regexes "
        "and the per-segment generalization run inside the scan projection "
        "(no Generate, no UDF); the only exchanges are the two-phase "
        "distinct-count on (host, template) — a trap template with 10^8 urls "
        "collapses map-side.",
        plan_of(contract.queries()["url_path_templates"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Contrastive pair mining — id-only band join feeding Jaccard label windows",
        "dedup.contrastive_pairs (contrastive_pairs): single-row LSH bands "
        "(collision probability per band = j) keep hard negatives reachable; "
        "the band self-join carries (band, bhash, doc) only, shingle arrays "
        "re-join AFTER pair dedup — same scale shape as dedup_minhash_lsh, "
        "one extra CASE for the label.",
        plan_of(contract.queries()["contrastive_pairs"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Politeness audit — skew-proof rank + co-partitioned (host, rank+1) gap join",
        "plans/politeness.politeness_audit (politeness_audit): consecutive-"
        "visit gaps come from bucketed_rank (bounded window partitions even "
        "for a 10^8-visit host) and an equi-join on (host, rank+1) that "
        "reuses the rank's own hash partitioning; per-host delay defaults "
        "join in as a broadcast.",
        plan_of(contract.queries()["politeness_audit"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Quota sample — broadcast gates, scan-speed screen, bounded trim window",
        "textops.quota_sample (quota_sample): the per-group thresholds ride a "
        "|groups|-row BroadcastExchange into a scan-side filter; the exact "
        "row_number runs only over the ~overshoot×quota candidates (its "
        "window partition is bounded, never the group), and the rescue "
        "branch is a broadcast anti/semi pair that is empty in the common "
        "case.",
        plan_of(contract.queries()["quota_sample"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Grouped top-k — learned score threshold, same bounded-trim shape",
        "textops.grouped_topk (grouped_topk_longest): the digest sample and "
        "its per-group quantile estimate are broadcast back as a score "
        "threshold; candidates filter at scan speed and only they enter the "
        "final row_number — a hot group never sorts whole unless its "
        "screen provably undershot (detected, rescued).",
        plan_of(contract.queries()["grouped_topk_longest"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "Shuffled packing — global pseudo-random cumsum without a whole-corpus window",
        "packing.corpus_shuffle_pack (corpus_shuffle_pack): the 48-bit md5 "
        "order key is a scan-side projection; the exclusive cumsum is the "
        "two-phase bucketed shape — ONE tiny window over value-range bucket "
        "ids plus bounded (digest, id)-ordered in-bucket windows — so the "
        "training-order shuffle of a 10^10-doc corpus never sorts in one "
        "partition. curriculum_shuffle_pack reuses the identical plan with "
        "a band-composited key.",
        plan_of(contract.queries()["corpus_shuffle_pack"](spark, "/root/testdata/sf0.001")),
    ))

    out = [
        "# PLANS — captured physical plans (evidence for the optimization claims)",
        "",
        "_Regenerate with `python scripts/dump_plans.py`; attribute ids and paths are",
        "normalized. Assertions over these properties run in `tests/test_plans.py`._",
        "",
    ]
    for title, blurb, plan in sections:
        out += [f"## {title}", "", blurb, "", "```", plan, "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out))
    shutil.rmtree(web, ignore_errors=True)
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
