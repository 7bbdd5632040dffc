"""Behavioral tests for the round-2 training-data operators: duplicate
clustering (vs a union-find oracle), as-of join (vs a plain-Python oracle),
keep-latest dedup, and the Gopher-style repetition/quality signals."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.operators import textops as T
from crawl4ai_scraper_spark.operators.clustering import dedup_survivors, dup_clusters
from crawl4ai_scraper_spark.operators.dedup import minhash_lsh_pairs
from crawl4ai_scraper_spark.operators.temporal import asof_join, latest_revision


# ---------------------------------------------------------------------------
# dup_clusters
# ---------------------------------------------------------------------------

def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dup_clusters_matches_union_find(spark):
    # deterministic messy graph: chains, stars, singleton pairs, a big merge
    pairs = [(i, i + 1) for i in range(0, 20, 2)]          # 10 disjoint 2-cliques
    pairs += [(i, i + 2) for i in range(0, 18, 4)]          # merge some into chains
    pairs += [(100, 101), (101, 102), (102, 103), (103, 100)]  # cycle
    pairs += [(200 + i, 200) for i in range(1, 8)]          # star
    pairs += [(7, 207)]                                     # star-to-chain bridge
    expected = _union_find_components(pairs)

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in dup_clusters(df).collect()}
    assert got == expected


def test_minhash_pairs_to_clusters_pipeline(spark):
    # corpus with planted near-dup chains: doc, doc+1000 (prefix-trimmed)
    base = [
        (i, " ".join(f"d{i}w{j}" for j in range(40))) for i in range(12)
    ]
    variants = [(i + 1000, t[t.index(" ") + 1:]) for i, t in base]
    df = spark.createDataFrame(base + variants, "doc long, text string")
    pairs = minhash_lsh_pairs(df, "text", "doc", k=3, n_hashes=8, n_bands=4,
                              jaccard_threshold=0.5)
    clusters = dup_clusters(pairs)
    got = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    # every planted variant clusters with (exactly) its original
    for i, _ in base:
        assert got.get(i + 1000) == i, f"variant {i + 1000} not clustered to {i}"

    survivors = dedup_survivors(df, clusters, "doc")
    kept = sorted(r["doc"] for r in survivors.collect())
    assert kept == [i for i, _ in base]  # originals survive, variants dropped


def test_dedup_survivors_keeps_unmatched_rows(spark):
    corpus = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, t string")
    clusters = spark.createDataFrame([(2, 1), (1, 1)], "id long, cluster_id long")
    kept = sorted(r["id"] for r in dedup_survivors(corpus, clusters, "id").collect())
    assert kept == [1, 3]  # 2 collapsed into 1; 3 untouched (singleton)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

def test_asof_join_matches_python_oracle(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = [  # (event_id, user, ts_min)
        (1, "u1", 5), (2, "u1", 10), (3, "u1", 10), (4, "u1", 2),
        (5, "u2", 7), (6, "u3", 1),
    ]
    right = [  # (user, ts_min, payload)
        ("u1", 3, 30), ("u1", 10, 100), ("u2", 7, 70), ("u2", 9, 90),
    ]
    ldf = spark.createDataFrame(
        [(e, u, ts(m)) for e, u, m in left], "event_id long, user string, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(u, ts(m), p) for u, m, p in right], "user string, ts timestamp, payload long"
    )
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_payload"])
        for r in asof_join(ldf, rdf, key="user", left_ts="ts", right_ts="ts").collect()
    }

    def oracle(user, m):
        cand = [(rm, p) for ru, rm, p in right if ru == user and rm <= m]
        if not cand:
            return (None, None)
        rm, p = max(cand)
        return (ts(rm), p)

    for e, u, m in left:
        assert out[e] == oracle(u, m), f"event {e}"
    # spot-check semantics: equal-ts is inclusive, earlier rows see older marker
    assert out[2] == (ts(10), 100)
    assert out[1] == (ts(3), 30)
    assert out[6] == (None, None)


def test_asof_join_single_shuffle_plan(spark):
    ldf = spark.createDataFrame([(1, "u", dt.datetime(2024, 1, 1))],
                                "event_id long, user string, ts timestamp")
    rdf = spark.createDataFrame([("u", dt.datetime(2024, 1, 1), 9)],
                                "user string, ts timestamp, payload long")
    plan = asof_join(ldf, rdf, key="user", left_ts="ts", right_ts="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    # union-sort-carry: exactly one exchange feeding the window, and no join
    assert plan.count("Exchange") <= 2  # union inputs may each show the same exchange
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# latest_revision
# ---------------------------------------------------------------------------

def test_latest_revision_tiebreak(spark):
    rows = [
        ("u1", 10, 1, "a"), ("u1", 20, 2, "b"), ("u1", 20, 3, "c"),  # ts tie → id 3
        ("u2", 5, 9, "z"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long, rev long, body string")
    got = {r["url"]: (r["warc_ts"], r["rev"], r["body"])
           for r in latest_revision(df, key="url", ts_col="warc_ts", tiebreak="rev").collect()}
    assert got == {"u1": (20, 3, "c"), "u2": (5, 9, "z")}


# ---------------------------------------------------------------------------
# repetition / gopher signals
# ---------------------------------------------------------------------------

def test_repetition_signals_planted(spark):
    clean = "the quick brown fox jumps over the lazy dog near a very calm river " \
            "and then rests while watching distant birds fly south for winter"
    loop = ("spam ham eggs " * 12).strip()
    df = spark.createDataFrame([(1, clean), (2, loop)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            T.dup_word_fraction(F.col("text")).alias("dw"),
            T.dup_ngram_fraction(F.col("text"), 3).alias("d3"),
        ).collect()
    }
    assert out[2]["d3"] > 0.9 > out[1]["d3"]
    assert out[2]["dw"] > 0.9

    flags = {r["doc_id"]: r for r in T.gopher_filter(df, "text", "doc_id").collect()}
    assert flags[1]["keep"] is True
    assert flags[2]["keep"] is False and flags[2]["ok_dup_3gram"] is False


def test_top_ngram_stats_known(spark):
    text = "a b a b a b x y"  # top 2-gram: 'a b' ×3 of 7 grams
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = T.top_ngram_stats(df, "text", "doc_id", n=2).collect()[0]
    assert row["top_gram"] == "a b" and row["top_count"] == 3
    # char fraction: 3 * len('ab') / len('ababab xy' sans spaces = 8 chars)
    assert row["top_char_frac"] == pytest.approx(3 * 2 / 8, abs=1e-4)


def test_corpus_topk_ngrams_known(spark):
    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y z"), (3, "q r")], "doc_id long, text string"
    )
    rows = T.corpus_topk_ngrams(df, "text", n=2, k=2).collect()
    # counts: 'x y'×3, then ties at 1 break lexicographically → 'q r'
    assert [(r["gram"], r["cnt"]) for r in rows] == [("x y", 3), ("q r", 1)]


# ---------------------------------------------------------------------------
# end-to-end corpus pipeline job (scripts/submit_pipeline.py)
# ---------------------------------------------------------------------------

def test_submit_pipeline_end_to_end(spark, tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    # corpus: clean docs + one exact dup + one near dup + one junk doc.
    # Unique tokens interleaved with stopwords → no repeated 3-grams, so the
    # Gopher dup-3gram rule passes on the genuinely-clean docs.
    sw = ["the", "a", "of", "and", "to", "in", "is"]

    def clean_doc(prefix):
        return " ".join(x for i in range(20) for x in (sw[i % 7], f"{prefix}{i}"))

    base = clean_doc("a")
    docs = [
        (1, base),
        (2, base),                         # exact dup of 1 → dropped
        (3, base[base.index(" ") + 1:]),   # near dup of 1 → dropped
        (4, "x " * 5),                     # too short → filtered
        (5, clean_doc("b")),               # clean, distinct
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "clean")

    args = parse_args(["--input", inp, "--output", out, "--min-jaccard", "0.5"])
    summary = run_pipeline(spark, args)

    assert summary["input_rows"] == 5
    assert summary["after_filter"] == 4        # junk dropped
    assert summary["after_exact_dedup"] == 3   # doc 2 dropped
    assert summary["after_near_dup"] == 2      # doc 3 dropped
    kept = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 5]
    assert "quality" in kept.columns and "dup_3gram_frac" in kept.columns


# ---------------------------------------------------------------------------
# hash_sample / redact_pii
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_rate(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "k")
    s1 = sorted(r["k"] for r in T.hash_sample(df, "k", 0.25, salt="a").collect())
    s2 = sorted(r["k"] for r in T.hash_sample(df, "k", 0.25, salt="a").collect())
    assert s1 == s2                                   # repeatable
    assert 0.20 < len(s1) / 4000 < 0.30               # ~rate
    # different salt → a (near-)independent slice, not the same rows
    s3 = set(r["k"] for r in T.hash_sample(df, "k", 0.25, salt="b").collect())
    overlap = len(set(s1) & s3) / max(len(s3), 1)
    assert overlap < 0.40
    # nested property: a lower-rate sample with the same salt is a subset
    s4 = set(r["k"] for r in T.hash_sample(df, "k", 0.10, salt="a").collect())
    assert s4 <= set(s1)
    # rate 1.0 keeps everything
    assert T.hash_sample(df, "k", 1.0).count() == 4000


def test_redact_pii_kinds(spark):
    text = ("reach me at jane.doe+x@corp.example.org or 555-123-4567, "
            "server 192.168.0.1 says hi; not-an-ip 1234.5.6.7890 stays-ish")
    df = spark.createDataFrame([(1, text)], "i long, text string")
    row = df.select(
        T.redact_pii(F.col("text")).alias("r"),
        *[c.alias(n) for n, c in T.pii_counts(F.col("text")).items()],
    ).collect()[0]
    assert "<EMAIL>" in row["r"] and "jane" not in row["r"]
    assert "<PHONE>" in row["r"] and "555-123-4567" not in row["r"]
    assert "<IP>" in row["r"] and "192.168.0.1" not in row["r"]
    assert (row["n_emails"], row["n_phones"], row["n_ips"]) == (1, 1, 1)


# ---------------------------------------------------------------------------
# deferred output reconfiguration (rematerialize_documents)
# ---------------------------------------------------------------------------

def test_rematerialize_documents_parity_and_reorg(spark, pages3, chk_dir):
    """Scrape-now-save-later: rematerializing a crawled documents snapshot
    under the SAME config reproduces rel_path/formatted byte-identically;
    a different organization strategy rewrites paths but not payloads."""
    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import rematerialize_documents, run_crawl

    cfg = CrawlJobConfig(max_depth=2, max_pages=25, shuffle_partitions=4)
    res = run_crawl(spark, pages3, "https://site0.example/", cfg, chk_dir)
    stored = {r["url"]: (r["rel_path"], r["formatted"])
              for r in res.documents.collect()}
    assert stored

    same = rematerialize_documents(spark, res.documents, cfg)
    for r in same.collect():
        assert (r["rel_path"], r["formatted"]) == stored[r["url"]], r["url"]

    dom_cfg = CrawlJobConfig(max_depth=2, max_pages=25, shuffle_partitions=4,
                             organization_strategy="domain", include_metadata=False)
    reorg = {r["url"]: (r["rel_path"], r["formatted"])
             for r in rematerialize_documents(spark, res.documents, dom_cfg).collect()}
    for url, (path, payload) in reorg.items():
        assert path.startswith("site0.example/"), path     # new layout
        assert not payload.startswith("---\n")             # metadata stripped
        assert payload in stored[url][1]                   # markdown unchanged


# ---------------------------------------------------------------------------
# embedding preprocessing (l2_normalize / quantize_int8)
# ---------------------------------------------------------------------------

def test_embedding_quantize_known_vector(spark):
    from crawl4ai_scraper_spark.operators.similarity import embedding_quantize

    df = spark.createDataFrame([(1, [3.0, -4.0, 0.0])], "vec_id long, embedding array<double>")
    rows = {r["dim_idx"]: (r["unit_val"], r["q8"])
            for r in embedding_quantize(df).collect()}
    assert rows[0] == (0.6, 95)      # 3/5; floor(3*127/4 + .5) = floor(95.75)
    assert rows[1] == (-0.8, -127)   # -4/5; max|x|=4 → floor(-126.5) = -127
    assert rows[2] == (0.0, 0)


def test_quantize_int8_bounds(spark):
    from crawl4ai_scraper_spark.operators.similarity import quantize_int8
    from pyspark.sql import functions as F

    df = spark.createDataFrame([([1.0, -1.0, 0.5],)], "e array<double>")
    got = df.select(quantize_int8(F.col("e")).alias("q")).collect()[0]["q"]
    assert got == [127, -127, 64]    # floor(.5*127+.5)=floor(64)=64


# ---------------------------------------------------------------------------
# ivf_build (iterative Lloyd training)
# ---------------------------------------------------------------------------

def test_ivf_build_matches_python_lloyd(spark):
    """Full k-means training vs a plain-python Lloyd oracle on the same
    vectors: identical argmax-dot assignment (sequential-fold dot both
    sides), exact means → centroid histories agree to float precision."""
    import math

    from crawl4ai_scraper_spark.operators.similarity import (
        hyperplanes, ivf_assign_to, ivf_build)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = [[float(x) for x in r["embedding"]] for r in emb.orderBy("vec_id").collect()]
    n_cells, dim, n_iter = 4, 64, 3

    cents, shifts = ivf_build(emb, n_cells=n_cells, dim=dim, n_iter=n_iter)

    # python oracle: same seed centroids, same argmax-first tie-break
    py = [list(c) for c in hyperplanes(n_cells, dim, 7)]
    for _ in range(n_iter):
        members = [[] for _ in range(n_cells)]
        for v in vecs:
            dots = [sum(x * c for x, c in zip(v, cc)) for cc in py]
            members[dots.index(max(dots))].append(v)
        for j, ms in enumerate(members):
            if ms:
                py[j] = [math.fsum(col) / len(ms) for col in zip(*ms)]

    for a, b in zip(cents, py):
        for x, y in zip(a, b):
            assert abs(x - y) < 1e-9, (x, y)
    assert len(shifts) == n_iter and shifts[0] > 0

    # serving assignment against the trained centroids is total + in range
    assign = ivf_assign_to(emb, cents)
    cells = [r["cell"] for r in assign.collect()]
    assert len(cells) == len(vecs) and all(1 <= c <= n_cells for c in cells)


# ---------------------------------------------------------------------------
# stratified_sample / normalize_text
# ---------------------------------------------------------------------------

def test_stratified_sample_rates_and_subset(spark):
    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
            for i in range(6000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    got = T.stratified_sample(df, "k", "lang", {"en": 0.5, "de": 0.1}).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], set()).add(r["k"])
    assert 0.42 < len(by["en"]) / 2000 < 0.58
    assert 0.05 < len(by["de"]) / 2000 < 0.16
    assert "fr" not in by                       # default rate 0 drops stratum
    # per-stratum selection is the plain hash_sample of that stratum
    en_only = set(r["k"] for r in T.hash_sample(
        df.filter(F.col("lang") == "en"), "k", 0.5).collect())
    assert by["en"] == en_only


def test_normalize_text_known(spark):
    raw = "ábc \x07 x\t y  "   # a+combining acute, BEL, runs of ws
    df = spark.createDataFrame([(1, raw)], "i long, t string")
    got = df.select(T.normalize_text(F.col("t")).alias("n")).collect()[0]["n"]
    assert got == "\u00e1bc x y"  # NFC-composed á, BEL stripped, ws collapsed


def test_crawl_report_tool(spark, pages3, chk_dir, capsys):
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl

    import crawl_report

    cfg = CrawlJobConfig(max_depth=2, max_pages=30, shuffle_partitions=4)
    run_crawl(spark, pages3, "https://site0.example/", cfg, chk_dir)
    assert crawl_report.main(["--checkpoint", chk_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["last_manifest"]["done"] is True
    assert out["visited_total"] > 0
    assert out["top_hosts"][0]["host"] == "site0.example"
    assert len(out["lineage_by_round"]) == out["last_round"]


# ---------------------------------------------------------------------------
# asof_join regression: payload name collision + NULL-payload preservation
# ---------------------------------------------------------------------------

def test_asof_join_payload_name_collision_with_left(spark):
    """Right payload column sharing a name with a left column must carry the
    RIGHT side's value, never the left row's own."""
    t0 = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(100, "u", t0 + dt.timedelta(minutes=9))],
        "event_id long, user string, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [("u", t0 + dt.timedelta(minutes=5), 7)],
        "user string, ts timestamp, event_id long",  # collides with left
    )
    row = asof_join(ldf, rdf, key="user", left_ts="ts", right_ts="ts",
                    payload=["event_id"]).collect()[0]
    assert row["event_id"] == 100          # left column untouched
    assert row["asof_event_id"] == 7       # right value, NOT 100


def test_asof_join_null_payload_preserved(spark):
    """A matched right row whose payload is legitimately NULL must yield
    NULL (DuckDB ASOF semantics), not a stale older payload."""
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    ldf = spark.createDataFrame([(1, "u", ts(10))],
                                "event_id long, user string, ts timestamp")
    rdf = spark.createDataFrame(
        [("u", ts(5), 100), ("u", ts(9), None)],
        "user string, ts timestamp, payload long",
    )
    row = asof_join(ldf, rdf, key="user", left_ts="ts", right_ts="ts").collect()[0]
    assert row["asof_ts"] == ts(9)
    assert row["asof_payload"] is None     # not 100


def test_simhash_64bit_no_overflow(spark):
    from crawl4ai_scraper_spark.operators.dedup import simhash

    df = spark.createDataFrame([(1, "alpha beta gamma delta")],
                               "doc_id long, text string")
    rows = simhash(df, "text", "doc_id", n_bits=64).collect()
    assert rows[0]["simhash"] is not None  # bit-63 literal used to null it


def test_ngram_contracts_degenerate_short_docs(spark):
    """Docs shorter than n words: Spark and the DuckDB oracle must agree on
    the one-whole-text-gram convention (was: oracle emitted an empty list)."""
    import pandas as pd

    from tests.contract_check import frame_fingerprint

    from crawl4ai_scraper_spark import contract

    # patch a tiny documents table containing 1- and 2-word docs
    tiny = pd.DataFrame({
        "doc_id": [0, 1, 2], "text": ["one", "two words", "now three words"],
        "lang": ["en"] * 3, "source": ["s"] * 3, "n_chars": [3, 9, 15],
    })
    import tempfile, os
    d = tempfile.mkdtemp()
    tiny.to_parquet(os.path.join(d, "documents.parquet"))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    for name in ("repetition_signals", "top_ngram_stats"):
        fn = contract.queries()[name]
        sql = contract.oracle_sql()[name]
        spdf = fn(spark, d).toPandas()
        ddf = con.execute(sql).fetchdf()
        assert len(spdf) == len(ddf), name
        assert frame_fingerprint(spdf) == frame_fingerprint(ddf), name


def test_rules_from_robots_dedups_per_host(spark):
    """Duplicate robots records (scheme variants / revisions) collapse to ONE
    row per host — the latest warc_ts wins."""
    from crawl4ai_scraper_spark.plans.politeness import rules_from_robots

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        ("https://h.example/robots.txt", t0, b"User-agent: *\nDisallow: /old/\n"),
        ("https://h.example/robots.txt", t0 + dt.timedelta(days=1),
         b"User-agent: *\nDisallow: /new/\nCrawl-delay: 9\n"),
        ("http://h.example/robots.txt", t0 - dt.timedelta(days=1),
         b"User-agent: *\nDisallow: /ancient/\n"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    got = rules_from_robots(pages).collect()
    assert len(got) == 1
    assert got[0]["host"] == "h.example"
    assert list(got[0]["disallow_prefixes"]) == ["/new/"]
    assert got[0]["crawl_delay"] == 9.0


def test_bm25_ranks_relevant_docs_higher(spark):
    docs = [
        (1, "spark shuffle vector spark shuffle"),   # all query terms, repeated
        (2, "spark something else entirely here"),   # one term
        (3, "totally unrelated words only here"),    # none
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"]
           for r in T.bm25_scores(df, "text", "doc_id", ["spark", "shuffle", "vector"]).collect()}
    assert got[1] > got[2] > got[3] == 0.0


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def test_pagerank_matches_python_oracle(spark):
    """3 power iterations vs a plain-python oracle with the identical
    per-edge 12dp rounding; mass conservation and hub dominance checked."""
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]  # 1 is the hub; 4 dangles
    df = spark.createDataFrame(edges, "src long, dst long")
    from crawl4ai_scraper_spark.operators.graph import pagerank

    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=3).collect()}

    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: round(1.0 / n, 12) for v in nodes}
    for _ in range(3):
        in_sum = {v: 0.0 for v in nodes}
        for s, d in edges:
            in_sum[d] += round(0.85 * rank[s] / outdeg[s], 12)
        rank = {v: round(0.15 / n, 12) + in_sum[v] for v in nodes}

    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-9, v
    assert got[1] == max(got.values())            # hub collects the most
    assert got[4] == min(got.values())            # nothing links to 4


# ---------------------------------------------------------------------------
# C4 filter / unigram LM / length percentiles
# ---------------------------------------------------------------------------

def test_c4_filter_rules_planted(spark):
    docs = [
        # keeps 3 lines (≥5 words + terminal punct), drops short + punctless
        (1, "This is a proper sentence with enough words.\n"
            "Too short.\n"
            "this line has many words but no terminal punctuation\n"
            'Another good line that is long enough, yes!\n'
            'A third keeper line with a quoted ending, "done."'),
        # lorem ipsum → rejected even with good lines
        (2, "Lorem Ipsum dolor sit amet consectetur adipiscing elit sed.\n"
            "A second fine sentence with plenty of words here.\n"
            "A third fine sentence with plenty of words here."),
        # curly brace (code page) → rejected
        (3, "function f() { return 1; } is code not prose words.\n"
            "A second fine sentence with plenty of words here.\n"
            "A third fine sentence with plenty of words here."),
        # only 2 keepers < min_lines=3 → rejected
        (4, "One good long sentence that ends properly here.\n"
            "Two good long sentence that ends properly here."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in T.c4_filter(df, "text", "doc_id").collect()
    }
    assert out[1]["keep"] and out[1]["n_kept_lines"] == 3 and out[1]["n_lines"] == 5
    assert "Too short." not in out[1]["kept_text"]
    assert "no terminal punctuation" not in out[1]["kept_text"]
    assert not out[2]["keep"] and out[2]["has_lorem"]
    assert not out[3]["keep"] and out[3]["has_brace"]
    assert not out[4]["keep"] and out[4]["n_kept_lines"] == 2


def test_unigram_lm_matches_python_oracle(spark):
    import math

    texts = {
        10: "a a b c",
        11: "a b b d",
        12: "zz zz zz a",   # zz forced OOV by vocab_size=2
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in T.unigram_lm_scores(df, "text", "doc_id",
                                     vocab_size=2, alpha=0.5).collect()
    }
    # python oracle: counts a=4, b=3, zz=3, c=1, d=1; total=12
    # vocab top-2 by (cnt desc, tok): a(4), b(3); zz, c, d OOV
    toks_all = " ".join(texts.values()).split()
    total = float(len(toks_all))
    cnt = {t: toks_all.count(t) for t in set(toks_all)}
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2])
    floor = round(math.log(0.5 / total), 12)
    for did, text in texts.items():
        lps = [
            round(math.log(vocab[t] / total), 12) if t in vocab else floor
            for t in text.split()
        ]
        avg = sum(lps) / len(lps)
        assert out[did]["n_tokens"] == len(lps)
        assert out[did]["avg_logprob"] == pytest.approx(round(avg, 6), abs=1e-9)
        assert out[did]["perplexity"] == pytest.approx(round(math.exp(-avg), 4), abs=1e-6)
    # OOV-heavy doc must score worse (higher perplexity) than in-vocab docs
    assert out[12]["perplexity"] > out[10]["perplexity"]


def test_length_percentiles_interpolation(spark):
    # one group, values 10..13: p50 of 4 values = 11.5 (linear interpolation)
    df = spark.createDataFrame(
        [("en", v) for v in (10, 11, 12, 13)], "lang string, n_chars int"
    )
    row = T.length_percentiles(df, "n_chars", "lang").collect()[0]
    assert row["n_docs"] == 4
    assert row["p25"] == 10.75
    assert row["p50"] == 11.5
    assert row["p75"] == 12.25
    assert row["p90"] == pytest.approx(12.7)
    assert row["mean_val"] == 11.5


# ---------------------------------------------------------------------------
# Frontier hygiene + host budget cap
# ---------------------------------------------------------------------------

def test_hygiene_flags_planted_traps(spark):
    from crawl4ai_scraper_spark.plans.politeness import hygiene_filter

    urls = [
        (1, "https://ok.example/docs/guide"),                      # clean
        (2, "https://t.example/a/b/a/b/a/b/a"),                    # loop trap
        (3, "https://t.example/img/photo.JPG"),                    # asset ext
        (4, "https://t.example/p?" + "&".join(f"k{i}=v" for i in range(12))),  # param blowup
        (5, "https://t.example/" + "/".join(f"d{i}" for i in range(20))),      # too deep
        (6, "https://t.example/x?page=" + "9" * 3000),             # over-long
    ]
    df = spark.createDataFrame(urls, "id long, child_url string")
    kept = [r["id"] for r in hygiene_filter(df).select("id").collect()]
    assert kept == [1]


def test_host_budget_cap_equals_naive_window(spark):
    from pyspark.sql import Window

    from crawl4ai_scraper_spark.plans.politeness import host_budget_cap

    # skewed hosts: host h0 gets ~70% of arrivals; bucket_size=16 forces the
    # multi-bucket offset path
    rows = [(i, f"h{0 if i % 10 < 7 else i % 10}", i) for i in range(1000)]
    fr = spark.createDataFrame(rows, "id long, host string, arrival_rank long")
    got = {
        r["id"]
        for r in host_budget_cap(fr, 25, bucket_size=16).select("id").collect()
    }
    w = Window.partitionBy("host").orderBy("arrival_rank")
    want = {
        r["id"]
        for r in fr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("id")
        .collect()
    }
    assert got == want and len(got) == 25 * 4  # h0,h7,h8,h9 all hit the cap


def test_quality_buckets_order_consistent(spark):
    # 9 docs with graded OOV fractions → strictly ordered perplexities
    rows = [(i, " ".join(["common"] * (9 - i) + [f"rare{i}x{j}" for j in range(i)]))
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.quality_buckets(df, "text", "doc_id", vocab_size=1).collect()
    by_ppl = sorted(out, key=lambda r: r["perplexity"])
    labels = [r["bucket"] for r in by_ppl]
    # buckets are contiguous runs head → middle → tail over the ppl order
    assert labels == sorted(labels, key=["head", "middle", "tail"].index)
    assert {"head", "middle", "tail"} == set(labels)
    # the lowest-perplexity doc is the all-in-vocab one
    assert by_ppl[0]["doc_id"] == 0


def test_mixture_weights_known(spark):
    rows = [("a", "w " * 80), ("a", "w " * 20),   # a: 100 tokens
            ("b", "w " * 50),                     # b: 50
            ("c", "w " * 50)]                     # c: 50
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in
           T.mixture_weights(df, "source", "text", {"a": 0.25, "b": 0.5}).collect()}
    assert out["a"]["tokens"] == 100 and out["a"]["actual_share"] == 0.5
    # a: target 0.25 of 200 = 50 tokens from 100 → keep half
    assert out["a"]["keep_rate"] == 0.5
    # b: target 0.5 of 200 = 100 from 50 → capped at 1, oversample 2×
    assert out["b"]["keep_rate"] == 1.0 and out["b"]["oversample_factor"] == 2.0
    # c: no target → dropped
    assert out["c"]["keep_rate"] == 0.0 and out["c"]["target_share"] == 0.0


def test_sequence_pack_matches_python_cumsum(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 300)) for i in range(0, 2000, 3)]  # gappy ids
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(8)
    out = {
        r["doc_id"]: r
        for r in __import__(
            "crawl4ai_scraper_spark.operators.packing", fromlist=["sequence_pack"]
        ).sequence_pack(df, "doc_id", F.col("n"), seq_len=256, bucket_size=32).collect()
    }
    cum = 0
    for i, n in rows:  # rows are already in doc_id order
        r = out[i]
        assert (r["cum_before"], r["seq_id"], r["offset_in_seq"]) == (
            cum, cum // 256, cum % 256
        ), f"doc {i}"
        cum += n
    assert max(r["seq_id"] for r in out.values()) > 5  # actually spans sequences


def test_snapshot_delta_statuses(spark):
    from crawl4ai_scraper_spark.operators.temporal import snapshot_delta

    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, body string"
    )
    new = spark.createDataFrame(
        [("u2", "b"), ("u3", "CHANGED"), ("u4", "d")], "url string, body string"
    )
    got = {r["url"]: r["status"]
           for r in snapshot_delta(old, new, "url", "body").collect()}
    assert got == {"u1": "removed", "u2": "same", "u3": "changed", "u4": "added"}


def test_sitemap_discovery_pipeline(spark):
    from crawl4ai_scraper_spark.plans.politeness import (
        seeds_from_sitemaps,
        sitemaps_from_robots,
    )

    robots_body = (b"User-agent: *\nDisallow: /private\n"
                   b"Sitemap: https://s.example/sitemap.xml\n"
                   b"Sitemap: https://s.example/sitemap2.xml\n")
    sm1 = (b"<?xml version='1.0'?><urlset>"
           b"<url><loc>https://s.example/a</loc></url>"
           b"<url><loc> https://s.example/b?x=1&amp;y=2 </loc></url></urlset>")
    rows = [
        ("https://s.example/robots.txt", robots_body),
        ("https://s.example/sitemap.xml", sm1),
        ("https://other.example/robots.txt", b"User-agent: *\nDisallow:\n"),
        ("https://s.example/page", b"<html><body>x</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")

    sms = sitemaps_from_robots(pages)
    got_sms = {(r["host"], r["sitemap_url"]) for r in sms.collect()}
    assert got_sms == {("s.example", "https://s.example/sitemap.xml"),
                       ("s.example", "https://s.example/sitemap2.xml")}

    seeds = seeds_from_sitemaps(pages, sms).orderBy("loc_pos").collect()
    # sitemap2.xml is not stored → contributes nothing; sitemap.xml yields 2
    assert [r["seed_url"] for r in seeds] == [
        "https://s.example/a", "https://s.example/b?x=1&y=2"
    ]
    assert all(r["host"] == "s.example" for r in seeds)


def test_sitemap_index_two_level_chain(spark):
    """A sitemap INDEX's <loc> rows come back as level-1 seeds; feeding them
    through a second seeds_from_sitemaps call expands the sub-sitemaps."""
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.plans.politeness import (
        seeds_from_sitemaps,
        sitemaps_from_robots,
    )

    robots = (b"User-agent: *\n"
              b"Sitemap: https://i.example/sitemap_index.xml\n")
    index = (b"<?xml version='1.0'?><sitemapindex>"
             b"<sitemap><loc>https://i.example/sm_a.xml</loc></sitemap>"
             b"<sitemap><loc>https://i.example/sm_b.xml</loc></sitemap>"
             b"</sitemapindex>")
    sm_a = (b"<urlset><url><loc>https://i.example/p1</loc></url>"
            b"<url><loc>https://i.example/p2</loc></url></urlset>")
    sm_b = b"<urlset><url><loc>https://i.example/p3</loc></url></urlset>"
    pages = spark.createDataFrame(
        [
            ("https://i.example/robots.txt", robots),
            ("https://i.example/sitemap_index.xml", index),
            ("https://i.example/sm_a.xml", sm_a),
            ("https://i.example/sm_b.xml", sm_b),
        ],
        "url string, html binary",
    )

    level1 = seeds_from_sitemaps(pages, sitemaps_from_robots(pages))
    assert sorted(r["seed_url"] for r in level1.collect()) == [
        "https://i.example/sm_a.xml", "https://i.example/sm_b.xml"
    ]

    level2 = seeds_from_sitemaps(
        pages, level1.select("host", F.col("seed_url").alias("sitemap_url"))
    )
    got = sorted((r["sitemap_url"], r["seed_url"]) for r in level2.collect())
    assert got == [
        ("https://i.example/sm_a.xml", "https://i.example/p1"),
        ("https://i.example/sm_a.xml", "https://i.example/p2"),
        ("https://i.example/sm_b.xml", "https://i.example/p3"),
    ]


# ---------------------------------------------------------------------------
# anchor-text aggregation + recrawl change-rate (round-2 crawl-tier ops)
# ---------------------------------------------------------------------------

def test_extract_anchors_labels():
    from crawl4ai_scraper_spark.kernel.htmlkit import extract_anchors

    html = (
        '<html><body><nav><a href="/hidden">nav text</a></nav>'
        '<p>See <a href="/docs/a">the  docs\npage</a> and '
        '<a href="https://other.example/x/">other &amp; more</a>.</p>'
        "<p><a href=\"/open\">unterminated</body></html>"
    )
    got = extract_anchors(html, "https://site.example/base/page")
    by_pos = {r["link_pos"]: r for r in got}
    # drop-tag anchor: href collected, label never rendered → empty
    assert by_pos[0] == {"target": "https://site.example/hidden", "anchor": "", "link_pos": 0}
    # whitespace collapsed exactly like the markdown [label](href) form
    assert by_pos[1]["anchor"] == "the docs page"
    assert by_pos[1]["target"] == "https://site.example/docs/a"
    # entity unescape + canon trailing-slash strip
    assert by_pos[2] == {
        "target": "https://other.example/x", "anchor": "other & more", "link_pos": 2
    }
    # unterminated <a>: no </a> ever fires → label stays empty
    assert by_pos[3]["anchor"] == ""

    # fast tokenizer path and html.parser path produce identical labels
    # (a comment forces the full-parser fallback)
    slow = extract_anchors("<!-- c -->" + html, "https://site.example/base/page")
    assert [(r["target"], r["anchor"]) for r in slow] == [
        (r["target"], r["anchor"]) for r in got
    ]


def test_anchor_text_agg_matches_hand_counts(spark):
    from crawl4ai_scraper_spark.operators.graph import page_anchor_texts

    html_a = (
        '<html><body><p><a href="/t1">alpha</a> <a href="/t1">beta</a> '
        '<a href="/t1">alpha</a></p><nav><a href="/t2">hidden</a></nav></body></html>'
    )
    html_b = '<p><a href="https://s.example/t1/">gamma</a> and <a href="/t2#frag">delta</a></p>'
    pages = spark.createDataFrame(
        [
            ("https://s.example/a", bytearray(html_a.encode())),
            ("https://s.example/b", bytearray(html_b.encode())),
        ],
        "url string, html binary",
    )
    got = {r["target"]: r for r in page_anchor_texts(pages, max_anchors=2).collect()}
    t1 = got["https://s.example/t1"]
    assert t1.n_inlinks == 4  # alpha, beta, alpha, gamma (dup labels still count)
    assert t1.anchors == "alpha|beta"  # top-2 lexicographic DISTINCT labels
    t2 = got["https://s.example/t2"]
    assert t2.n_inlinks == 1  # the nav anchor's label is empty → excluded
    assert t2.anchors == "delta"


def test_recrawl_stats_hand_history(spark):
    from crawl4ai_scraper_spark.operators.temporal import recrawl_stats

    rows = [
        ("u", dt.datetime(2024, 1, 1), 1, "A"),
        ("u", dt.datetime(2024, 1, 2), 2, "A"),  # unchanged
        ("u", dt.datetime(2024, 1, 3), 3, "B"),  # changed
        ("u", dt.datetime(2024, 1, 5), 4, "C"),  # changed
        ("v", dt.datetime(2024, 1, 1), 5, "X"),  # single observation
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, rev bigint, body string")
    got = {r["url"]: r for r in recrawl_stats(df, "url", "ts", "body", tiebreak="rev").collect()}
    u = got["u"]
    assert (u.n_visits, u.n_changes) == (4, 2)
    assert u.change_ratio == round(2 / 3, 4)
    assert u.changes_per_day == round(2 * 86400.0 / (4 * 86400), 6)
    v = got["v"]
    assert (v.n_visits, v.n_changes, v.change_ratio, v.changes_per_day) == (1, 0, 0.0, 0.0)


def test_hits_matches_python_oracle(spark):
    from crawl4ai_scraper_spark.operators.graph import hits

    edges = [(1, 3), (2, 3), (3, 4), (1, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: (r.hub, r.auth) for r in hits(df, n_iter=2).collect()}

    nodes = sorted({u for e in edges for u in e})
    hub = {u: round(1.0 / len(nodes), 12) for u in nodes}

    def half(score, outgoing):
        raw = {}
        for s, d in edges:
            a, b = (s, d) if outgoing else (d, s)
            raw[b] = raw.get(b, 0.0) + score[a]
        t = sum(raw.values())
        return {u: round(raw.get(u, 0.0) / t, 12) for u in nodes}

    for _ in range(2):
        auth = half(hub, outgoing=True)
        hub = half(auth, outgoing=False)

    for u in nodes:
        assert got[u] == (pytest.approx(hub[u], abs=1e-12), pytest.approx(auth[u], abs=1e-12)), u
    # structural sanity: 3 is the strongest authority, 1 the strongest hub
    assert max(nodes, key=lambda u: got[u][1]) == 3
    assert max(nodes, key=lambda u: got[u][0]) == 1


def test_sitemap_entries_lastmod(spark):
    from crawl4ai_scraper_spark.kernel.robots import entries_from_sitemap_xml
    from crawl4ai_scraper_spark.plans.politeness import (
        sitemap_entries,
        sitemap_seed_priorities,
    )

    # kernel vectors: lastmod optional, first loc wins, loc-less block skipped
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.example/p1 </loc><lastmod>2024-01-05</lastmod></url>"
        "<url><loc>https://a.example/p2?x=1&amp;y=2</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://a.example/p1</loc><lastmod>2023-01-01</lastmod></url>"
        "</urlset>"
    )
    assert entries_from_sitemap_xml(xml) == [
        {"loc": "https://a.example/p1", "lastmod": "2024-01-05"},
        {"loc": "https://a.example/p2?x=1&y=2", "lastmod": None},
    ]
    # blockless documents fall back to the bare <loc> scan
    assert entries_from_sitemap_xml("<urlset><loc>https://b.example/</loc></urlset>") == [
        {"loc": "https://b.example/", "lastmod": None}
    ]

    pages = spark.createDataFrame(
        [("https://a.example/sitemap.xml", bytearray(xml.encode()))],
        "url string, html binary",
    )
    sitemaps = spark.createDataFrame(
        [("a.example", "https://a.example/sitemap.xml")], "host string, sitemap_url string"
    )
    entries = sitemap_entries(pages, sitemaps)
    got = {r.seed_url: r.lastmod for r in entries.collect()}
    assert got == {"https://a.example/p1": "2024-01-05",
                   "https://a.example/p2?x=1&y=2": None}
    prio = {r.url: r.priority for r in sitemap_seed_priorities(entries).collect()}
    assert prio["https://a.example/p2?x=1&y=2"] == 0.0
    assert prio["https://a.example/p1"] == dt.datetime(
        2024, 1, 5, tzinfo=dt.timezone.utc
    ).timestamp()


def test_parse_robots_rules_allow():
    from crawl4ai_scraper_spark.kernel.robots import parse_robots, parse_robots_rules

    body = (
        "User-agent: googlebot\nDisallow: /gb\nAllow: /gb/ok\n\n"
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "Allow:\nCrawl-delay: 1.5\n"
        "User-agent: *\nAllow: /public\n"
    )
    delay, dis, allow = parse_robots_rules(body)
    assert (delay, dis, allow) == (1.5, ["/private"], ["/private/ok", "/public"])
    assert parse_robots_rules(body, "googlebot")[1:] == (["/gb"], ["/gb/ok"])
    # Disallow-only view unchanged
    assert parse_robots(body) == (1.5, ["/private"])


def test_robots_filter_longest_match_allow(spark):
    from crawl4ai_scraper_spark.plans.politeness import robots_filter

    cand = spark.createDataFrame(
        [("h.example", f"https://h.example{p}") for p in
         ("/private/ok/page", "/private/secret", "/tie/x", "/free")]
        + [("open.example", "https://open.example/private/anything")],
        "child_host string, child_url string",
    )
    rules4 = spark.createDataFrame(
        [("h.example", 1.0, ["/private", "/tie/x"], ["/private/ok", "/tie/x"])],
        "host string, crawl_delay double, disallow_prefixes array<string>, "
        "allow_prefixes array<string>",
    )
    kept = {r.child_url.split(".example")[1] for r in robots_filter(cand, rules4).collect()}
    # longest match decides; Allow wins the /tie/x length tie; unruled host passes
    assert kept == {"/private/ok/page", "/tie/x", "/free", "/private/anything"}

    # 3-column rules keep the original any-disallow semantics
    rules3 = spark.createDataFrame(
        [("h.example", 1.0, ["/private"])],
        "host string, crawl_delay double, disallow_prefixes array<string>",
    )
    kept3 = {r.child_url.split(".example")[1] for r in robots_filter(cand, rules3).collect()}
    assert kept3 == {"/tie/x", "/free", "/private/anything"}


def test_robots_wildcard_rules(spark):
    from crawl4ai_scraper_spark.kernel.robots import robots_rule_regex
    from crawl4ai_scraper_spark.plans.politeness import robots_filter, rules_from_robots

    assert robots_rule_regex("/private") == "^/private"
    assert robots_rule_regex("/*.json$") == "^/.*\\.json$"
    assert robots_rule_regex("/a*b") == "^/a.*b"

    body = (
        "User-agent: *\n"
        "Disallow: /*.json$\n"        # any .json URL (end-anchored)
        "Disallow: /sec/*/deep\n"     # wildcard in the middle
        "Allow: /sec/ok/deep\n"       # longer than the wildcard rule -> wins
    )
    robots = spark.createDataFrame(
        [("https://w.example/robots.txt", bytearray(body.encode()))],
        "url string, html binary",
    )
    rules = rules_from_robots(robots)
    cand = spark.createDataFrame(
        [("w.example", f"https://w.example{p}") for p in
         ("/api/data.json", "/api/data.json?x=1", "/sec/a/deep", "/sec/ok/deep",
          "/plain", "/file.jsonl")],
        "child_host string, child_url string",
    )
    kept = {r.child_url.split(".example")[1] for r in robots_filter(cand, rules).collect()}
    # .json$ blocks the bare .json URL but NOT the query variant ($-anchored)
    # or .jsonl; the Allow carve-out beats the shorter wildcard Disallow
    assert kept == {"/api/data.json?x=1", "/plain", "/file.jsonl", "/sec/ok/deep"}


def test_sitemap_index_blocks_carry_lastmod():
    from crawl4ai_scraper_spark.kernel.robots import entries_from_sitemap_xml

    idx = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://a.example/sm1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://a.example/sm2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    assert entries_from_sitemap_xml(idx) == [
        {"loc": "https://a.example/sm1.xml", "lastmod": "2024-02-01"},
        {"loc": "https://a.example/sm2.xml", "lastmod": None},
    ]


def test_token_windows_layout(spark):
    from crawl4ai_scraper_spark.operators.textops import token_windows

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "   ")],
        "doc long, text string",
    )
    rows = {(r.id, r.win_idx): r for r in
            token_windows(df, "text", "doc", window=3, stride=2).collect()}
    assert set(rows) == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 0)}  # empty doc dropped
    assert rows[(1, 0)].win_text == "a b c"
    assert rows[(1, 1)].win_text == "c d e"          # 1-token overlap
    assert rows[(1, 3)].win_text == "g"              # short tail kept
    assert rows[(1, 3)].n_win_tokens == 1
    assert rows[(2, 0)].win_text == "x"
    # narrow op: no shuffle of its own
    plan = token_windows(df, "text", "doc")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_encode_known_corpus(spark):
    from crawl4ai_scraper_spark.operators.textops import vocab_build, vocab_encode

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog"), (3, "zebra")],
        "doc long, text string",
    )
    vocab = vocab_build(df, "text", vocab_size=3)
    # counts: the=3; cat/dog/mat/on/sat/zebra=1 → top-3 = the(1), cat(2), dog(3)
    assert {(r.tok, r.token_id) for r in vocab.collect()} == {
        ("the", 1), ("cat", 2), ("dog", 3)
    }
    enc = {r.id: (r.n_tokens, r.token_ids) for r in
           vocab_encode(df, "text", "doc", vocab).collect()}
    assert enc[1] == (6, [1, 2, 0, 0, 1, 0])   # OOV -> 0, order preserved
    assert enc[2] == (2, [1, 3])
    assert enc[3] == (1, [0])


def test_sitemap_priorities_survive_malformed_lastmod(spark):
    from crawl4ai_scraper_spark.plans.politeness import (
        sitemap_entries,
        sitemap_seed_priorities,
    )

    xml = (
        "<urlset>"
        "<url><loc>https://a.example/ok</loc><lastmod>2024-01-02</lastmod></url>"
        "<url><loc>https://a.example/junk</loc><lastmod>yesterday</lastmod></url>"
        "<url><loc>https://a.example/junk2</loc><lastmod>2024-13-45</lastmod></url>"
        "</urlset>"
    )
    pages = spark.createDataFrame(
        [("https://a.example/sitemap.xml", bytearray(xml.encode()))],
        "url string, html binary",
    )
    sitemaps = spark.createDataFrame(
        [("a.example", "https://a.example/sitemap.xml")], "host string, sitemap_url string"
    )
    prio = {r.url: r.priority
            for r in sitemap_seed_priorities(sitemap_entries(pages, sitemaps)).collect()}
    # malformed lastmod values degrade to priority 0 instead of crashing
    assert prio["https://a.example/junk"] == 0.0
    assert prio["https://a.example/junk2"] == 0.0
    assert prio["https://a.example/ok"] > 0


def test_priority_signal_duplicates_collapse(spark, pages3, web3, chk_dir):
    """Duplicate urls in the priority signal frame must not fan out the
    frontier (one visit per url; max priority wins)."""
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl

    SEED = "https://site0.example/"
    signal = pages3.select(
        "url", F.length("url").cast("double").alias("priority")
    ).unionByName(
        pages3.select("url", F.lit(0.0).alias("priority"))  # dup every url
    )
    cfg = CrawlJobConfig(max_depth=2, max_pages=1000, frontier_order="priority")
    res = run_crawl(spark, pages3, SEED, cfg, chk_dir, extract=False,
                    use_bloom=False, priority_col=signal)
    urls = [r["url"] for r in res.visited.select("url").collect()]
    assert len(urls) == len(set(urls))  # no duplicate visits


def test_dup_span_stats_hand_corpus(spark):
    from crawl4ai_scraper_spark.operators.dedup import dup_span_stats

    shared = "one two three four five"           # a 5-token span shared by 1 & 2
    df = spark.createDataFrame(
        [(1, f"aa bb {shared} cc"),              # 8 tokens
         (2, f"{shared} zz yy xx ww"),           # 9 tokens
         (3, "totally unique words here only"),  # 5 tokens, no dups
         (4, "short doc")],                      # < k -> zeros
        "doc long, text string",
    )
    got = {r.id: r for r in dup_span_stats(df, "text", "doc", k=5).collect()}
    # doc 1: windows at s=0..3; only s=2 ("one..five") repeats corpus-wide
    assert (got[1].n_dup_windows, got[1].covered_tokens) == (1, 5)
    assert got[1].dup_fraction == round(5 / 8, 6)
    # doc 2: the shared span sits at s=0
    assert (got[2].n_dup_windows, got[2].covered_tokens) == (1, 5)
    assert got[2].dup_fraction == round(5 / 9, 6)
    assert (got[3].n_dup_windows, got[3].covered_tokens, got[3].dup_fraction) == (0, 0, 0.0)
    assert (got[4].n_tokens, got[4].dup_fraction) == (2, 0.0)
    # overlapping duplicated windows union, not double-count: two copies of
    # a 6-token run share windows at s and s+1 -> covered = 6, not 10
    df2 = spark.createDataFrame(
        [(1, "p q r s t u tail1"), (2, "p q r s t u tail2")],
        "doc long, text string",
    )
    got2 = {r.id: r for r in dup_span_stats(df2, "text", "doc", k=5).collect()}
    assert got2[1].n_dup_windows == 2 and got2[1].covered_tokens == 6


def test_strip_dup_spans_first_copy_survives(spark):
    from crawl4ai_scraper_spark.operators.dedup import strip_dup_spans

    shared = "one two three four five"
    df = spark.createDataFrame(
        [(1, f"aa bb {shared} cc"),       # first occurrence (min id) keeps it
         (2, f"{shared} zz yy xx ww"),    # later occurrence stripped
         (3, "short doc")],
        "doc long, text string",
    )
    got = {r.id: r for r in strip_dup_spans(df, "text", "doc", k=5).collect()}
    assert got[1].text_stripped == f"aa bb {shared} cc"
    assert got[1].kept_tokens == 8
    assert got[2].text_stripped == "zz yy xx ww"
    assert got[2].kept_tokens == 4
    assert got[3].text_stripped == "short doc"
    # overlapping removals merge into one island (no double removal, no gaps)
    df2 = spark.createDataFrame(
        [(1, "p q r s t u tail1"), (2, "p q r s t u tail2")],
        "doc long, text string",
    )
    got2 = {r.id: r for r in strip_dup_spans(df2, "text", "doc", k=5).collect()}
    assert got2[1].text_stripped == "p q r s t u tail1"   # winner intact
    assert got2[2].text_stripped == "tail2"               # 6-token island removed


def test_dataset_split_partition_and_determinism(spark):
    from crawl4ai_scraper_spark.operators.textops import dataset_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    out = dataset_split(df, "k", val_rate=0.05, test_rate=0.1)
    rows = {r.k: r.split for r in out.collect()}
    assert set(rows.values()) == {"train", "validation", "test"}
    # every row in exactly one split; rates in the right ballpark
    from collections import Counter
    c = Counter(rows.values())
    assert sum(c.values()) == 2000
    assert 0.02 < c["validation"] / 2000 < 0.09
    assert 0.06 < c["test"] / 2000 < 0.15
    # determinism: a repartitioned rerun assigns identically
    rows2 = {r.k: r.split for r in
             dataset_split(df.repartition(7), "k", val_rate=0.05, test_rate=0.1).collect()}
    assert rows == rows2


def test_sitemap_stray_locs_not_dropped():
    from crawl4ai_scraper_spark.kernel.robots import entries_from_sitemap_xml

    mixed = ("<urlset><url><loc>https://a.example/A</loc>"
             "<lastmod>2024-01-01</lastmod></url>"
             "<loc>https://a.example/B</loc></urlset>")
    assert entries_from_sitemap_xml(mixed) == [
        {"loc": "https://a.example/A", "lastmod": "2024-01-01"},
        {"loc": "https://a.example/B", "lastmod": None},  # stray loc kept
    ]


def test_dataset_split_full_coverage_rates(spark):
    from collections import Counter

    from crawl4ai_scraper_spark.operators.textops import dataset_split

    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    c = Counter(r.split for r in
                dataset_split(df, "k", val_rate=0.5, test_rate=0.5).collect())
    assert c["train"] == 0  # 50/50 covers everything — no silent leakage
    assert 350 < c["validation"] < 650 and 350 < c["test"] < 650


def test_robots_precedence_uses_octets(spark):
    from crawl4ai_scraper_spark.plans.politeness import robots_filter, rules_from_robots

    # Disallow '/日本' = 3 chars but 7 octets; Allow '/abcde' = 6 octets.
    # RFC most-octets: Disallow wins on a path both match ... they can't both
    # match one path, so use nesting: Disallow /日本 (7 octets) vs Allow
    # /日本x (8 octets) -> allow wins; vs Allow /日 (4 octets) -> disallow wins.
    body = "User-agent: *\nDisallow: /日本\nAllow: /日本x\n".encode()
    robots = spark.createDataFrame(
        [("https://x.example/robots.txt", bytearray(body))], "url string, html binary")
    rules = rules_from_robots(robots)
    cand = spark.createDataFrame(
        [("x.example", "https://x.example/日本x/page"),
         ("x.example", "https://x.example/日本/hidden")],
        "child_host string, child_url string")
    kept = {r.child_url for r in robots_filter(cand, rules).collect()}
    assert kept == {"https://x.example/日本x/page"}


def test_lsh_recall_bounds_and_probe_improvement(spark):
    from crawl4ai_scraper_spark.operators.dedup import lsh_recall

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        F.col("vec_id") < 30
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    variants = base.select((F.col("vec_id") + 100000).alias("vec_id"),
                           F.transform("e", lambda x: x * F.lit(1.02) + F.lit(0.003)).alias("e"))
    corpus = base.unionByName(variants)
    one = lsh_recall(corpus, "vec_id", "e", threshold=0.98).collect()[0]
    assert one.n_true_pairs >= 30          # every planted twin is a true pair
    assert 0.0 <= one.recall <= 1.0
    assert one.n_found_pairs <= one.n_true_pairs
    two = lsh_recall(corpus, "vec_id", "e", threshold=0.98, n_probe_seeds=2).collect()[0]
    assert two.recall >= one.recall        # multi-probe can only help


def test_output_paths_traversal_safe_all_strategies():
    from crawl4ai_scraper_spark.kernel.naming import output_rel_path

    hostile = ["https://../evil", "https://./x", "https:///bare",
               "https://h.example/../../up", "https://h.example/a/./../b"]
    for url in hostile:
        for strategy in ("flat", "mirror", "domain", "date", "custom"):
            rel = output_rel_path(url, "T", strategy, "url_based")
            assert not rel.startswith("/"), (url, strategy, rel)
            assert ".." not in rel.split("/"), (url, strategy, rel)
            assert "." != rel.split("/")[0], (url, strategy, rel)


def test_host_reputation_formula(spark):
    """reputation = (Σq + w·m)/(n + w) with exact DECIMAL sums — checked
    against the per-doc quality scores the same engine computed."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.textops import host_reputation, quality_score

    rows = [
        (0, "alpha beta gamma delta. the of and!", "hostA"),
        (1, "the quick brown fox jumps over the lazy dog " * 20, "hostA"),
        (2, "x", "hostB"),
        (3, "", "hostB"),
        (4, "a sentence with the usual stopwords in it, of course.", "hostB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    per_doc = {
        (r["source"]): r for r in
        df.select("source", quality_score(F.col("text")).alias("q"))
          .groupBy("source")
          .agg(F.sum(F.col("q").cast("decimal(18,4)")).alias("sq"),
               F.count(F.lit(1)).alias("n")).collect()
    }
    got = {r["host"]: r for r in host_reputation(df).collect()}
    assert set(got) == {"hostA", "hostB"}
    for h, agg in per_doc.items():
        expect = round((float(agg["sq"]) + 25.0 * 0.5) / (agg["n"] + 25.0), 4)
        assert got[h]["reputation"] == expect, h
        assert got[h]["n_docs"] == agg["n"]
    # few-doc hosts sit near the prior mean
    assert abs(got["hostB"]["reputation"] - 0.5) < 0.1


def test_minhash_recall_bounds(spark):
    """minhash_recall: planted near-dup twins are true pairs; found ⊆ truth
    (precision 1.0 by construction); more bands can only raise recall."""
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.dedup import minhash_recall

    base = spark.range(30).select(
        F.col("id").alias("doc"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta iota kappa doc "),
            F.col("id").cast("string"),
            F.lit(" lambda mu nu xi omicron pi rho sigma tau upsilon"),
        ).alias("text"),
    )
    variants = base.select(
        (F.col("doc") + 1000).alias("doc"), F.expr("substr(text, 7)").alias("text")
    )
    corpus = base.unionByName(variants)
    one = minhash_recall(corpus, "text", "doc", jaccard_threshold=0.5,
                         n_hashes=8, n_bands=2).collect()[0]
    assert one.n_true_pairs >= 30
    assert 0.0 <= one.recall <= 1.0
    assert one.n_found_pairs <= one.n_true_pairs
    four = minhash_recall(corpus, "text", "doc", jaccard_threshold=0.5,
                          n_hashes=8, n_bands=4).collect()[0]
    assert four.n_true_pairs == one.n_true_pairs  # truth is band-independent
    assert four.recall >= one.recall              # finer bands can only help


def test_url_blocklist_filter(spark):
    """Hard host blocklist + soft spam score: blocked hosts vanish, urls at
    or above the threshold vanish, survivors carry their score."""
    from crawl4ai_scraper_spark.plans.politeness import (
        url_blocklist_filter, url_spam_score)
    from pyspark.sql import functions as F

    rows = [
        (0, "https://good.example/docs/page"),
        (1, "https://good.example/poker/tips"),              # 0.5 — kept
        (2, "https://good.example/casino/poker-bonus"),      # 1.3 — dropped
        (3, "https://spam.example/anything"),                # blocked host
        (4, "https://good.example/xxx"),                     # 0.9 — dropped (>= thr)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = spark.createDataFrame([("spam.example",)], "host string")
    out = {r["doc_id"]: r for r in
           url_blocklist_filter(df, "url", blocked, spam_threshold=0.9).collect()}
    assert set(out) == {0, 1}
    assert out[0]["spam_score"] == 0.0
    assert out[1]["spam_score"] == 0.5
    # the score column builder alone matches the filter's arithmetic
    scores = {r["doc_id"]: r["s"] for r in
              df.select("doc_id", url_spam_score(F.col("url")).alias("s")).collect()}
    assert scores[2] == 1.3 and scores[4] == 0.9 and scores[3] == 0.0


def test_custom_pattern_path_traversal_safe():
    """The CUSTOM strategy's {path} variable: a URL whose entire path is a
    single '..' (or '.') segment must not become a traversal-capable
    directory component."""
    from crawl4ai_scraper_spark.kernel.naming import output_rel_path

    for url in ("https://h.example/..", "https://h.example/.",
                "https://h.example/../", "https://../.."):
        rel = output_rel_path(url, "T", "custom", "url_based",
                              pattern="{domain}/{path}/{filename}")
        assert ".." not in rel.split("/"), (url, rel)
        assert "." not in rel.split("/"), (url, rel)
        assert not rel.startswith("/"), (url, rel)
    # benign paths keep their flattened segment
    rel = output_rel_path("https://h.example/a/b", "T", "custom", "url_based",
                          pattern="{domain}/{path}/{filename}")
    assert "/a_b/" in rel


def test_recall_empty_truth_is_defined(spark):
    """lsh_recall / minhash_recall on a slice with NO true pairs must return
    numeric (0, 1.0), not NULLs (SUM over zero rows) — tuning scripts compare
    recall >= bar numerically."""
    from crawl4ai_scraper_spark.operators.dedup import lsh_recall, minhash_recall

    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    vecs = spark.createDataFrame([(1, e1), (2, e2)], "vec_id int, e array<double>")
    row = lsh_recall(vecs, "vec_id", "e", threshold=0.98).collect()[0]
    assert row.n_true_pairs == 0
    assert row.n_found_pairs == 0
    assert row.recall == 1.0

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc int, text string",
    )
    row = minhash_recall(docs, "text", "doc", jaccard_threshold=0.5).collect()[0]
    assert row.n_true_pairs == 0
    assert row.n_found_pairs == 0
    assert row.recall == 1.0


# ---------------------------------------------------------------------------
# BPE tokenizer training / segmentation (operators/bpe.py)
# ---------------------------------------------------------------------------

def _py_bpe(texts, n_merges):
    """Reference BPE (Sennrich et al.): greedy left-to-right non-overlapping
    merges, argmax tie-broken by (count desc, pair lexicographic)."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.strip().lower().split())
    syms = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        m = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == m)[0]
        merges.append((a, b, m))
        ab = a + b
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_python_oracle(spark):
    from crawl4ai_scraper_spark.operators import bpe as B

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider low new",
        "aaa abab abab",  # overlap (aaa merges once) + back-to-back pairs
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, ws = B.bpe_train(docs, "text", n_merges=8)
    py_merges, py_syms = _py_bpe(texts, 8)
    assert merges == py_merges
    got = {r.word: r.syms.strip().split("  ") for r in ws.collect()}
    assert got == py_syms


def test_bpe_segment_oov_char_fallback(spark):
    from crawl4ai_scraper_spark.operators import bpe as B

    train = spark.createDataFrame([(1, "hello hello help")], "doc_id long, text string")
    merges, wp = B.bpe_train(train, "text", n_merges=3)
    # "zap" never seen in training → inline character segmentation
    test = spark.createDataFrame([(9, "hello zap")], "doc_id long, text string")
    seg = B.bpe_segment(test, "text", "doc_id", wp).collect()[0]
    assert seg.n_words == 2
    pieces = seg.pieces.split("  ")
    assert pieces[-3:] == ["z", "a", "p"]
    assert seg.n_pieces == len(pieces)


def test_bpe_segment_whitespace_edge_tokens(spark):
    """Newline/tab-adjacent text produces empty '' split tokens — they must
    not become phantom pieces; whitespace-only docs have no output row."""
    from crawl4ai_scraper_spark.operators import bpe as B

    train = spark.createDataFrame([(1, "hi hi ho")], "doc_id long, text string")
    _, wp = B.bpe_train(train, "text", n_merges=2)
    test = spark.createDataFrame(
        [(1, "\nhi hi"), (2, "hi\tho"), (3, "  \n ")],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in B.bpe_segment(test, "text", "doc_id", wp).collect()}
    assert rows[1].n_words == 2 and rows[1].n_pieces == 2
    assert rows[1].pieces == "hi  hi"
    assert rows[2].n_words == 2  # tab splits into two real words
    assert 3 not in rows  # whitespace-only doc: no token rows


def test_bpe_merge_overlap_and_adjacent_semantics(spark):
    from crawl4ai_scraper_spark.operators import bpe as B

    # "a a a" overlapping pair merges ONCE; "a b a b" back-to-back merges TWICE
    ws = spark.createDataFrame(
        [("aaa", 1, "  a  a  a  "), ("abab", 1, "  a  b  a  b  ")],
        "word string, freq long, syms string",
    )
    got = {r.word: r.syms for r in B.merge_pair(ws, "a", "a").collect()}
    assert got["aaa"] == "  aa  a  "
    got2 = {r.word: r.syms for r in B.merge_pair(ws, "a", "b").collect()}
    assert got2["abab"] == "  ab  ab  "


def test_bpe_min_freq_early_stop(spark):
    from crawl4ai_scraper_spark.operators import bpe as B

    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    merges, _ = B.bpe_train(docs, "text", n_merges=10, min_freq=2)
    # only (a,b) reaches freq 2; everything else is below min_freq
    assert [(a, b) for a, b, _ in merges] == [("a", "b")]


# ---------------------------------------------------------------------------
# Naive-Bayes quality classifier (textops.nb_token_weights / nb_score)
# ---------------------------------------------------------------------------

def test_nb_classifier_matches_python_oracle(spark):
    import math
    from decimal import Decimal

    texts = [
        (0, "good clean prose text", True),
        (1, "good text text prose", True),
        (2, "spam spam buy now", False),
        (3, "buy spam now now", False),
        (4, "clean prose buy", True),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string, y boolean")
    V = 50
    w = T.nb_token_weights(docs, "text", "y", vocab_size=V)
    got_w = {r.tok: r.weight for r in w.collect()}

    # python oracle
    from collections import Counter
    pos, neg = Counter(), Counter()
    for _, t, y in texts:
        (pos if y else neg).update(t.split())
    pt, nt = sum(pos.values()), sum(neg.values())
    exp_w = {}
    for tok in set(pos) | set(neg):
        lw = math.log((pos[tok] + 1.0) / (pt + V)) - math.log((neg[tok] + 1.0) / (nt + V))
        exp_w[tok] = Decimal(repr(round(lw, 12)))
    assert set(got_w) == set(exp_w)
    for tok in exp_w:
        assert abs(got_w[tok] - exp_w[tok]) <= Decimal("1e-12"), tok

    sc = {r.id: r for r in T.nb_score(docs, "text", "doc_id", w, prior=0.0).collect()}
    for did, t, _ in texts:
        # scores accumulate DECIMAL-exact; the OUTPUT column is DOUBLE
        # (r3 decimal-output sweep), so compare as floats
        expect = float(sum(exp_w[tok] for tok in t.split()))
        assert abs(sc[did].score - expect) <= 1e-9
        assert sc[did].keep == (expect > 0)
    # classifier separates the planted classes
    assert sc[0].keep and sc[1].keep and not sc[2].keep and not sc[3].keep


def test_nb_score_prior_shifts_decision(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", True), (1, "gamma delta", False)],
        "doc_id long, text string, y boolean",
    )
    w = T.nb_token_weights(docs, "text", "y", vocab_size=10)
    neutral = {r.id: r.score for r in T.nb_score(docs, "text", "doc_id", w).collect()}
    shifted = {r.id: r.score for r in
               T.nb_score(docs, "text", "doc_id", w, prior=5.0).collect()}
    for i in neutral:
        assert shifted[i] - neutral[i] == 5


# ---------------------------------------------------------------------------
# Cross-corpus dedup (dedup.dedup_cross_corpus)
# ---------------------------------------------------------------------------

def test_dedup_cross_corpus_drops_banked_texts(spark):
    from crawl4ai_scraper_spark.operators.dedup import dedup_cross_corpus

    ref = spark.createDataFrame(
        [(100, "already banked"), (101, "also banked")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "already banked"),   # exact dup of ref → dropped
         (2, "fresh content"),
         (3, "also banked"),     # dropped
         (4, "fresh content")],  # within-batch dup of 2 → BOTH kept (by design)
        "doc_id long, text string",
    )
    surv = sorted(r.id for r in dedup_cross_corpus(new, ref, "text", "doc_id").collect())
    assert surv == [2, 4]


def test_bpe_train_local_matches_distributed(spark):
    from crawl4ai_scraper_spark.operators import bpe as B

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider low new",
        "aaa abab abab banana bandana",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    dist, _ = B.bpe_train(docs, "text", n_merges=10)
    local = B.bpe_train_local(docs, "text", n_merges=10)
    assert local == dist
    # min_freq is the merge STOP criterion in BOTH trainers (never a word
    # pre-filter: hapax words sharing a pair accumulate counts above it)
    dist2, _ = B.bpe_train(docs, "text", n_merges=10, min_freq=3)
    local2 = B.bpe_train_local(docs, "text", n_merges=10, min_freq=3)
    assert local2 == dist2
    assert all(c >= 3 for _, _, c in local2)
    # max_words / min_word_freq word-table truncation keeps the loop
    # well-defined (documented as approximation, not equivalence-preserving)
    trunc = B.bpe_train_local(docs, "text", n_merges=10, min_freq=2,
                              max_words=6, min_word_freq=2)
    assert all(c >= 2 for _, _, c in trunc)


def test_bpe_truncation_certificate(spark):
    """VERDICT r2 #7: the max_words truncation's effect is BOUNDED — the
    certificate (tail pair-mass vs per-merge argmax margins) proves a prefix
    of the truncated run equals the untruncated trainer's output, verified
    here against the actual untruncated merge list."""
    from crawl4ai_scraper_spark.operators import bpe as B

    # heavy head (clear margins) + a deliberate hapax tail that shares pairs
    texts = [
        "low low low low low low low low lower lower lowest",
        "new new new new new newer newest",
        "wide wider widest banana bandana",
        "lowball newish wideish lowly newly",  # the tail the cutoff drops
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    # untruncated: certificate is exact by construction
    diag_full: dict = {}
    full = B.bpe_train_local(docs, "text", n_merges=8, diagnostics=diag_full)
    assert diag_full["boundary"] is None
    tail_mass, certified = B.bpe_truncation_certificate(docs, "text", diag_full)
    assert (tail_mass, certified) == (0, len(full))
    assert len(diag_full["margins"]) == len(full)

    # truncated: the certified prefix must AGREE with the untruncated list
    diag_tr: dict = {}
    trunc = B.bpe_train_local(docs, "text", n_merges=8, max_words=8,
                              diagnostics=diag_tr)
    assert diag_tr["boundary"] is not None
    tail_mass, certified = B.bpe_truncation_certificate(docs, "text", diag_tr)
    assert tail_mass > 0  # the tail really was dropped
    assert trunc[:certified] == full[:certified]
    # the bound is the documented sum over dropped words of freq*(len-1)
    kept = {w for w, _ in sorted(
        ((r.word, r.freq) for r in B._word_freq_table(docs, "text", 1).collect()),
        key=lambda t: (-t[1], t[0]))[:8]}
    expect_mass = sum(
        r.freq * (len(r.word) - 1)
        for r in B._word_freq_table(docs, "text", 1).collect()
        if r.word not in kept
    )
    assert tail_mass == expect_mass


def test_apply_merges_arrow_equals_native_chain(spark):
    from crawl4ai_scraper_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "banana bandana low lower aaa abab")], "doc_id long, text string"
    )
    merges = B.bpe_train_local(docs, "text", n_merges=12)
    ws = B.word_syms(docs, "text")
    chain = {r.word: r.syms for r in B.apply_merges(ws, merges).collect()}
    arrow = {r.word: r.syms for r in B.apply_merges_arrow(ws, merges).collect()}
    assert arrow == chain
    # and bpe_segment accepts the arrow-produced serving map
    seg = B.bpe_segment(docs, "text", "doc_id",
                        B.apply_merges_arrow(ws, merges)).collect()[0]
    assert seg.n_pieces == len(seg.pieces.split("  "))


def test_submit_pipeline_nb_and_bpe_stages(spark, tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    sw = ["the", "a", "of", "and", "to", "in", "is"]

    def clean_doc(prefix):
        return " ".join(x for i in range(20) for x in (sw[i % 7], f"{prefix}{i}"))

    docs = [(i, clean_doc(chr(97 + i)), "en" if i % 2 == 0 else "de")
            for i in range(8)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string, lang string").write.parquet(inp)
    out = str(tmp_path / "clean")

    args = parse_args([
        "--input", inp, "--output", out, "--skip-near-dup",
        "--nb-label-lang", "en", "--nb-keep-quantile", "0.5",
        "--bpe-merges", "6",
    ])
    summary = run_pipeline(spark, args)
    assert summary["after_nb_filter"] >= 4       # top half kept (ties may add)
    assert summary["bpe_merges_learned"] == 6
    kept = spark.read.parquet(out)
    assert "pieces" in kept.columns and "n_pieces" in kept.columns
    row = kept.collect()[0]
    assert row.n_pieces == len(row.pieces.split("  "))


def test_bpe_piece_vocab_known_corpus(spark):
    from crawl4ai_scraper_spark.operators import bpe as B

    docs = spark.createDataFrame([(1, "low low lower")], "doc_id long, text string")
    # merges: (l,o) cnt 3 -> (lo,w) cnt 3 -> (e,r) cnt 1
    merges, wp = B.bpe_train(docs, "text", n_merges=3)
    vocab = {r.piece: (r.cnt, r.piece_id) for r in B.piece_vocab(wp).collect()}
    # "low" segments to [low] x3 words; "lower" -> [low, er]
    assert vocab["low"] == (3, 1)
    assert vocab["er"] == (1, 2)


class TestBpeProperties:
    """Property-based equivalence for the three BPE merge implementations:
    the candidate-restricted Arrow replay, the double-space string-replace
    protocol (what the native merge_pair compiles to), and the plain
    sequential fold. No Spark involved — these pin the pure semantics the
    engine paths share."""

    def _full_replay(self, word, merges):
        from crawl4ai_scraper_spark.operators.bpe import _merge_syms

        syms = list(word)
        for m in merges:
            syms = _merge_syms(syms, m[0], m[1])
        return syms

    def test_candidate_replay_equals_full_replay(self):
        from hypothesis import given, settings, strategies as st

        from crawl4ai_scraper_spark.operators.bpe import _py_apply_merges

        word_st = st.text(alphabet="abc", min_size=0, max_size=12)
        corpus_st = st.lists(word_st, min_size=1, max_size=8)

        @given(corpus=corpus_st, probe=word_st, n=st.integers(1, 10))
        @settings(max_examples=300, deadline=None)
        def check(corpus, probe, n):
            merges, _ = _py_bpe([" ".join(corpus)], n)
            by_str = {}
            for i, m in enumerate(merges):
                by_str.setdefault(m[0] + m[1], []).append((i, m[0], m[1]))
            assert _py_apply_merges(probe, by_str) == self._full_replay(probe, merges)

        check()

    def test_string_replace_protocol_equals_fold(self):
        """replace('  '-joined syms, ' a  b ', ' ab ') must equal the greedy
        left-to-right fold for ANY symbol sequence and pair — including
        overlapping (aaa) and back-to-back (abab) occurrences. python
        str.replace has the same non-overlapping left-to-right semantics as
        Spark's replace()."""
        from hypothesis import given, settings, strategies as st

        from crawl4ai_scraper_spark.operators.bpe import _SEP, _merge_syms

        sym_st = st.sampled_from(["a", "b", "ab", "ba", "aa"])
        seq_st = st.lists(sym_st, min_size=1, max_size=10)

        @given(syms=seq_st, a=sym_st, b=sym_st)
        @settings(max_examples=300, deadline=None)
        def check(syms, a, b):
            s = _SEP + _SEP.join(syms) + _SEP
            replaced = s.replace(f" {a}{_SEP}{b} ", f" {a}{b} ")
            assert replaced.strip().split(_SEP) == _merge_syms(syms, a, b)

        check()


def test_cluster_balance_flattens_skewed_clusters(spark):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.similarity import cluster_balance

    # 3 clusters: 800 / 100 / 100 docs; uniform share = 1000/3 ≈ 333
    rows = [(i, 1 if i < 800 else (2 if i < 900 else 3)) for i in range(1000)]
    assign = spark.createDataFrame(rows, "vec_id long, cell int")
    kept = cluster_balance(assign)
    by_cell = {r.cell: r for r in
               kept.groupBy("cell").agg(F.count(F.lit(1)).alias("n"),
                                        F.first("keep_steps").alias("s")).collect()}
    # small clusters keep everything
    assert by_cell[2].n == 100 and by_cell[2].s == 4096
    assert by_cell[3].n == 100 and by_cell[3].s == 4096
    # the big cluster downsamples toward the uniform share (rate ≈ 333/800)
    expected_rate = (1000 / 3) / 800
    assert by_cell[1].s == int(expected_rate * 4096)
    assert abs(by_cell[1].n / 800 - expected_rate) < 0.07
    # deterministic: same salt → identical kept set
    again = sorted(r.vec_id for r in cluster_balance(assign).collect())
    assert again == sorted(r.vec_id for r in kept.collect())


def test_bigram_lm_perplexity_orders_and_edges(spark):
    """Formulaic text must score lower perplexity than never-repeating text
    under the self-trained bigram LM; 1-token and blank docs still score
    (unigram term only); a separate train corpus makes unseen grams costly."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the cat sat again"),
            (2, "quixotic zephyrs bewilder jovial marmots nightly"),
            (3, "single"),
            (4, "   "),
            (5, "the cat sat on the mat and the cat sat again"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in T.bigram_lm_perplexity(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # duplicated formulaic doc shares all its bigrams -> cheaper than the
    # all-unique-words doc
    assert out[1]["ppl"] < out[2]["ppl"]
    assert out[1]["xent_bits"] == out[5]["xent_bits"]  # identical text, identical score
    assert out[3]["n_tokens"] == 1 and out[3]["xent_bits"] is not None
    assert out[4]["n_tokens"] == 1  # blank doc tokenizes to [''] by convention
    assert all(r["ppl"] == round(2 ** r["xent_bits"], 4) for r in out.values())

    # train on doc 1 only: doc 2's events are all unseen -> max-cost scores
    train = docs.filter(F.col("doc_id") == 1)
    scored = {
        r["doc_id"]: r
        for r in T.bigram_lm_perplexity(docs, train=train).collect()
    }
    assert scored[2]["ppl"] > scored[1]["ppl"]
    assert scored[2]["ppl"] > out[2]["ppl"]  # stranger under a foreign model


def test_submit_pipeline_ppl_filter_stage(spark, tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    # 6 formulaic docs sharing bigrams + 2 gibberish docs with unique words:
    # the LM filter must keep the formulaic ones and carry ppl columns out
    common = "the cat sat on the mat and the dog ran to the mat"
    docs = [(i, common + f" tail{i % 2}", "en") for i in range(6)] + [
        (6, "qux zorp blen fira mond trell vask", "en"),
        (7, "yilt prav skun dorm welx crag nibs", "en"),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string, lang string").write.parquet(inp)
    out = str(tmp_path / "kept")

    args = parse_args([
        "--input", inp, "--output", out, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--ppl-keep-quantile", "0.75",
    ])
    summary = run_pipeline(spark, args)
    kept = spark.read.parquet(out)
    kept_ids = {r.doc_id for r in kept.collect()}
    assert {0, 1, 2, 3, 4, 5} <= kept_ids and 7 not in kept_ids
    assert {"xent_bits", "ppl"} <= set(kept.columns)
    assert summary["after_ppl_filter"] == len(kept_ids)

    # absolute cut takes precedence and also orders correctly
    args2 = parse_args([
        "--input", inp, "--dry-run", "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--ppl-max", "1e9", "--ppl-train-lang", "en",
    ])
    summary2 = run_pipeline(spark, args2)
    assert summary2["after_ppl_filter"] == 8  # huge cut keeps everything


def test_bpe_encode_ids_artifact_roundtrip_and_oov(spark, tmp_path):
    from crawl4ai_scraper_spark.operators import bpe as B

    train = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer lowest")],
        "doc_id long, text string",
    )
    merges, wp = B.bpe_train(train, "text", n_merges=3)
    vocab = B.piece_vocab(wp, vocab_size=6)  # cuts the tail -> unk path live
    enc = {r["id"]: r for r in
           B.bpe_encode_ids(train, "text", "doc_id", wp, vocab).collect()}
    assert enc[1]["n_words"] == 5 and enc[1]["n_pieces"] == len(enc[1]["token_ids"])

    # artifact round-trip: loaded merges + vocab reproduce the encoding
    art = str(tmp_path / "tok.json")
    B.save_tokenizer(art, merges, vocab)
    m2, v2 = B.load_tokenizer(art)
    assert [tuple(m) for m in m2] == [tuple(m) for m in merges]
    serving2 = B.apply_merges_arrow(B.word_syms(train, "text"), m2)
    enc2 = {r["id"]: r for r in
            B.bpe_encode_ids(train, "text", "doc_id", serving2,
                             B.vocab_frame(spark, v2)).collect()}
    for i in enc:
        assert enc2[i]["token_ids"] == enc[i]["token_ids"]

    # serving-time OOV word -> char fallback, chars resolved via the vocab
    serve = spark.createDataFrame([(9, "low lox")], "doc_id long, text string")
    out = {r["id"]: r for r in
           B.bpe_encode_ids(serve, "text", "doc_id", wp, vocab).collect()}
    vmap = {r["piece"]: r["piece_id"] for r in vocab.collect()}
    # "lox" is not in the model: chars l/o/x, none in the tiny vocab -> unk 0
    assert out[9]["token_ids"] == [vmap["low"], 0, 0, 0]
    assert out[9]["n_words"] == 2 and out[9]["n_pieces"] == 4

    # bad artifact rejected
    (tmp_path / "bad.json").write_text('{"format": "other"}')
    import pytest as _pt
    with _pt.raises(ValueError):
        B.load_tokenizer(str(tmp_path / "bad.json"))


def test_pack_token_ids_layout_properties(spark):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.packing import (
        pack_token_ids,
        packed_sequences,
    )

    rows = [(i, list(range(i * 100, i * 100 + n)))
            for i, n in [(0, 5), (1, 0), (2, 7), (3, 1), (4, 11)]]
    enc = spark.createDataFrame(rows, "id long, token_ids array<int>")
    flat = [t for _, ids in sorted(rows) for t in ids]  # 24 tokens

    packed = pack_token_ids(enc, "id", "token_ids", seq_len=5, bucket_size=2)
    got = sorted((r["seq_id"], r["pos_in_seq"], r["token_id"])
                 for r in packed.collect())
    # drop-last: 24 tokens -> 4 complete sequences of 5
    assert got == [(g // 5, g % 5, t) for g, t in enumerate(flat[:20])]

    seqs = {r["seq_id"]: (r["n_docs"], r["token_ids"])
            for r in packed_sequences(packed, "id", 5).collect()}
    assert seqs[1][1] == flat[5:10]
    assert seqs[2][0] == 3  # docs 2 (tail), 3, and 4 (head) share sequence 2

    # complete_only=False keeps the 4-token tail
    tail = pack_token_ids(enc, "id", "token_ids", seq_len=5, bucket_size=2,
                          complete_only=False)
    assert tail.count() == 24
    assert tail.agg(F.max("seq_id")).first()[0] == 4


def test_submit_pipeline_bpe_artifact_and_packing(spark, tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    docs = [(i, "low lower lowest new newer " + ("alpha beta " * (i % 3 + 1)).strip())
            for i in range(8)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(inp)
    art = str(tmp_path / "tok.json")

    # train + save + encode + pack in one job
    out1 = str(tmp_path / "out1")
    s1 = run_pipeline(spark, parse_args([
        "--input", inp, "--output", out1, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--bpe-merges", "3", "--bpe-save", art,
        "--bpe-vocab-size", "16", "--bpe-encode", "--pack-seq-len", "8",
    ]))
    assert s1["bpe_merges_learned"] == 3 and s1["bpe_artifact"] == art
    kept1 = spark.read.parquet(out1)
    assert {"n_pieces", "pieces", "token_ids"} <= set(kept1.columns)
    seqs = spark.read.parquet(s1["sequences_path"])
    total = kept1.selectExpr("sum(size(token_ids))").first()[0]
    assert s1["sequences_written"] == seqs.count() == total // 8
    assert seqs.selectExpr("max(size(token_ids))").first()[0] == 8

    # second corpus encoded under the LOADED artifact — no training stage
    out2 = str(tmp_path / "out2")
    s2 = run_pipeline(spark, parse_args([
        "--input", inp, "--output", out2, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--bpe-load", art, "--bpe-encode",
    ]))
    assert "bpe_merges_learned" not in s2 and s2["bpe_artifact"] == art
    a = {r["doc_id"]: r["token_ids"] for r in kept1.collect()}
    b = {r["doc_id"]: r["token_ids"]
         for r in spark.read.parquet(out2).collect()}
    assert a == b  # same corpus + same artifact -> identical ids


def test_weighted_sample_determinism_and_bias(spark):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.textops import weighted_sample

    rows = [(i, 1.0) for i in range(40)] + [(100, 5000.0), (101, None), (102, -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    picks = weighted_sample(df, "doc_id", F.col("w"), k=8, salt="sA")
    ids = [r["doc_id"] for r in picks.collect()]
    again = [r["doc_id"] for r in
             weighted_sample(df, "doc_id", F.col("w"), k=8, salt="sA").collect()]
    assert ids == again                       # fully deterministic
    assert 100 in ids                         # 5000x weight dominates k=8
    assert 101 not in ids and 102 not in ids  # null / non-positive excluded
    assert len(ids) == 8 == len(set(ids))     # without replacement

    # different salt -> a genuinely different (but still deterministic) draw
    other = [r["doc_id"] for r in
             weighted_sample(df, "doc_id", F.col("w"), k=8, salt="sB").collect()]
    assert set(other) != set(ids)

    # the heavy row wins across many independent draws; uniform rows rotate
    hits = sum(
        100 in {r["doc_id"] for r in
                weighted_sample(df, "doc_id", F.col("w"), k=2, salt=f"s{i}").collect()}
        for i in range(12)
    )
    assert hits >= 11  # P(miss) per draw is ~(41/5041)^2-scale tiny


def test_pack_token_ids_eos_separator(spark):
    from crawl4ai_scraper_spark.operators.packing import (
        pack_token_ids,
        packed_sequences,
    )

    rows = [(0, [1, 2, 3]), (1, []), (2, [4, 5])]
    enc = spark.createDataFrame(rows, "id long, token_ids array<int>")
    packed = pack_token_ids(enc, "id", "token_ids", seq_len=7, bucket_size=2,
                            eos_id=99, complete_only=False)
    seqs = {r["seq_id"]: r["token_ids"]
            for r in packed_sequences(packed, "id", 7).collect()}
    # doc 0 + EOS, (empty doc 1 contributes NOTHING — no lone EOS), doc 2 + EOS
    assert seqs == {0: [1, 2, 3, 99, 4, 5, 99]}
    # EOS positions are attributed to their documents
    owner = {(r["seq_id"], r["pos_in_seq"]): r["id"] for r in packed.collect()}
    assert owner[(0, 3)] == 0 and owner[(0, 6)] == 2


def test_submit_pipeline_weighted_sample_stage(spark, tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    docs = [(i, f"a readable sentence with enough words to score well {i}")
            for i in range(30)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "kept")

    args = parse_args([
        "--input", inp, "--output", out, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--weighted-sample-k", "10",
    ])
    summary = run_pipeline(spark, args)
    kept = spark.read.parquet(out)
    assert summary["after_weighted_sample"] == 10 == kept.count()

    # deterministic: a re-run with the same salt keeps the same subset
    out2 = str(tmp_path / "kept2")
    args2 = parse_args([
        "--input", inp, "--output", out2, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--weighted-sample-k", "10",
    ])
    run_pipeline(spark, args2)
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in spark.read.parquet(out2).collect()}
    assert a == b


def test_host_trap_stats_flags_trap_and_feeds_blocklist(spark):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.plans.politeness import (
        host_trap_stats,
        url_blocklist_filter,
    )

    # trap.example mints 40 calendar URLs all serving the same page;
    # good.example has 40 genuinely distinct pages
    rows = [(f"https://trap.example/cal/2024/{i}", "trap.example", "same page")
            for i in range(40)]
    rows += [(f"https://good.example/art-{chr(97 + i % 26)}{i}", "good.example",
              f"article body {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "url string, host string, text string")

    stats = {r["host"]: r for r in
             host_trap_stats(df, "host", "url", "text").collect()}
    assert stats["trap.example"]["trap_suspect"]
    assert stats["trap.example"]["n_templates"] == 1
    assert stats["trap.example"]["dup_content_ratio"] > 0.9
    assert not stats["good.example"]["trap_suspect"]

    # the suspect frame feeds the frontier blocklist directly
    blocked = (
        host_trap_stats(df, "host", "url", "text")
        .filter(F.col("trap_suspect")).select("host")
    )
    survivors = url_blocklist_filter(
        df.select("url"), "url", blocked_hosts=blocked
    )
    hosts_left = {r[0] for r in survivors.select(
        F.regexp_extract("url", "^[a-z]+://([^/]+)", 1)).distinct().collect()}
    assert hosts_left == {"good.example"}


def _trap_web_pages(spark, out_path):
    """Tiny same-host web with a calendar trap: seed -> 5 distinct articles
    + /cal/2024/1..8 (identical content), each cal page minting two deeper
    cal children (all one digit-normalized template)."""
    from crawl4ai_scraper_spark.sources.pages import DEFAULT_PBUCKETS, with_pbucket
    from pyspark.sql import functions as F

    def page(path, body, links):
        anchors = "".join(f'<a href="{l}">x</a>' for l in links)
        html = (f"<html><head><title>{path}</title></head><body>"
                f"<p>{body}</p>{anchors}</body></html>")
        return (f"https://t.example{path}", html.encode("utf-8"))

    cal_body = "calendar listing page " + "no events today " * 20
    rows = [page("/", "welcome " * 30,
                 [f"/art-{c}" for c in "abcde"]
                 + [f"/cal/2024/{i}" for i in range(1, 9)])]
    rows += [page(f"/art-{c}", f"article {c} " + f"unique body {c} " * 20, [])
             for c in "abcde"]
    cal_ids = list(range(1, 9))
    deeper = [10 * n + d for n in cal_ids for d in (1, 2)]
    deepest = [10 * n + d for n in deeper for d in (1, 2)]
    for n in cal_ids + deeper:
        rows.append(page(f"/cal/2024/{n}", cal_body,
                         [f"/cal/2024/{10 * n + 1}", f"/cal/2024/{10 * n + 2}"]))
    for n in deepest:
        rows.append(page(f"/cal/2024/{n}", cal_body, []))
    df = spark.createDataFrame(rows, "url string, html binary").select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
        F.lit("").alias("text"), F.lit("en").alias("lang"),
    )
    (with_pbucket(df, DEFAULT_PBUCKETS)
     .repartition(4).write.mode("overwrite").partitionBy("pbucket")
     .parquet(out_path))


def test_trap_screen_contains_calendar_trap(spark, tmp_path):
    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl
    from crawl4ai_scraper_spark.sources.pages import read_pages

    _trap_web_pages(spark, str(tmp_path / "web"))
    pages = read_pages(spark, str(tmp_path / "web"))
    base = dict(max_depth=6, max_pages=500)

    def crawl(name, **kw):
        cfg = CrawlJobConfig(**base, **kw)
        res = run_crawl(spark, pages, "https://t.example/", cfg,
                        str(tmp_path / name), use_bloom=False)
        return res, {r["url"] for r in res.visited.collect()}

    res_off, seen_off = crawl("chk_off")
    res_on, seen_on = crawl("chk_on", trap_screen=True, trap_min_urls=6)

    cal = lambda urls: {u for u in urls if "/cal/" in u}
    # unscreened: the whole 56-page trap space gets crawled
    assert len(cal(seen_off)) == 8 + 16 + 32
    # screened: the template is flagged after the 8 depth-1 pages; the
    # depth-2 pages were already enqueued (one-round containment lag) but
    # the 32 depth-3 pages are never minted
    assert len(cal(seen_on)) == 8 + 16
    assert list(map(tuple, res_on.summary["trap_templates"])) == [
        ("t.example", "/cal/N/N")
    ]
    # the articles are untouched by the screen
    assert {u for u in seen_on if "/art-" in u} == {u for u in seen_off if "/art-" in u}


def test_kn_lm_perplexity_matches_python_oracle(spark):
    import math

    from crawl4ai_scraper_spark.operators.textops import kn_lm_perplexity

    train_rows = [(0, "the cat sat on the mat"), (1, "the dog sat on the rug")]
    score_rows = train_rows + [(2, "the cat sat quietly")]  # 'sat quietly' unseen
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           kn_lm_perplexity(docs, "text", "doc_id", train=train).collect()}

    # plain-python replay
    D = 0.75
    evs = []
    for _, t in train_rows:
        w = t.split()
        evs += [(w[i], w[i + 1]) for i in range(len(w) - 1)]
    from collections import Counter
    c2 = Counter(evs)
    c1 = Counter(w1 for w1, _ in evs)
    nfol = Counter()
    npred = Counter()
    for (w1, w2) in set(evs):
        nfol[w1] += 1
        npred[w2] += 1
    ntypes, vcont = len(c2), len(npred)

    def pcont(w):
        return (npred.get(w, 0) + 1) / (ntypes + vcont + 1)

    def prob(w1, w2):
        if w1 not in c1:
            return pcont(w2)
        return (max(c2.get((w1, w2), 0) - D, 0) / c1[w1]
                + D * nfol[w1] / c1[w1] * pcont(w2))

    for i, t in score_rows:
        w = t.lower().split()
        bits = round(-math.log2(pcont(w[0])), 12)
        bits += sum(round(-math.log2(prob(w[j], w[j + 1])), 12)
                    for j in range(len(w) - 1))
        xent = round(bits / len(w), 4)
        assert abs(got[i]["xent_bits"] - xent) < 1e-9, (i, got[i]["xent_bits"], xent)
        assert got[i]["n_tokens"] == len(w)

    # the doc with the unseen bigram is stranger than the training docs
    assert got[2]["ppl"] > got[0]["ppl"] and got[2]["ppl"] > got[1]["ppl"]


def test_corpus_report_data_card(spark, tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from corpus_report import build_report, parse_args

    rows = [(i, "good text with words " * 5, "en") for i in range(8)]
    rows += [(100 + i, "otro texto util aqui " * 4, "es") for i in range(4)]
    rows += [(200, rows[0][1], "en")]  # one exact dup
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(inp)

    rep = build_report(spark, parse_args(["--input", inp, "--lang-col", "lang"]))
    assert rep["n_docs"] == 13
    assert abs(rep["exact_dup_rate"] - (1 - 2 / 13)) < 1e-6  # 2 distinct texts
    langs = {l["lang"]: l for l in rep["languages"]}
    assert langs["en"]["docs"] == 9 and langs["es"]["docs"] == 4
    assert rep["total_tokens"] == 9 * 20 + 4 * 16  # 4-word phrases x5 / x4
    assert set(rep["tokens_per_doc"]) == {"p10", "p25", "p50", "p75", "p90", "p99"}

    # --sketch-distinct: 2 distinct texts < k=1024 → KMV exact path; HLL
    # linear counting lands on the same tiny truth
    rep2 = build_report(spark, parse_args(
        ["--input", inp, "--lang-col", "lang", "--sketch-distinct"]))
    assert rep2["distinct_texts_kmv"] == 2.0
    assert abs(rep2["distinct_texts_hll"] - 2.0) < 0.01


def test_trap_screen_flags_survive_resume(spark, tmp_path):
    from crawl4ai_scraper_spark.config import CrawlJobConfig
    from crawl4ai_scraper_spark.plans.driver import run_crawl
    from crawl4ai_scraper_spark.sources.pages import read_pages

    _trap_web_pages(spark, str(tmp_path / "web"))
    pages = read_pages(spark, str(tmp_path / "web"))
    cfg = CrawlJobConfig(max_depth=6, max_pages=500, trap_screen=True,
                         trap_min_urls=6)
    chk = str(tmp_path / "chk")

    # kill after round 2 — the round whose manifest first carries the flags
    run_crawl(spark, pages, "https://t.example/", cfg, chk, use_bloom=False,
              max_rounds=2)
    res = run_crawl(spark, pages, "https://t.example/", cfg, chk,
                    use_bloom=False, resume=True)
    seen = {r["url"] for r in res.visited.collect()}
    assert len({u for u in seen if "/cal/" in u}) == 8 + 16  # same containment
    assert list(map(tuple, res.summary["trap_templates"])) == [
        ("t.example", "/cal/N/N")
    ]


def test_contamination_vs_external_eval_and_pipeline_stage(spark, tmp_path):
    import sys

    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.textops import contamination_vs

    eval_df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "eid long, text string",
    )
    docs_rows = [
        (1, "the quick brown fox jumps high today indeed"),  # shares 3-grams
        (2, "completely unrelated training material here now"),
        (3, "of two"),  # < 3 tokens: no gram rows, must survive the stage
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           contamination_vs(docs, "text", "doc_id", eval_df,
                            threshold=0.2).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] >= 3
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    # docs below n tokens carry the degenerate whole-text gram (the
    # ngrams_from_tokens convention) — scored, never spuriously contaminated
    assert out[3]["n_grams"] == 1 and not out[3]["contaminated"]

    # pipeline stage: contaminated doc dropped, short doc kept
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    inp, ev, outp = (str(tmp_path / p) for p in ("docs", "eval", "kept"))
    docs.write.parquet(inp)
    eval_df.write.parquet(ev)
    s = run_pipeline(spark, parse_args([
        "--input", inp, "--output", outp, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--decontaminate", ev,
        "--decontaminate-threshold", "0.2",
    ]))
    kept = {r["doc_id"] for r in spark.read.parquet(outp).collect()}
    assert kept == {2, 3} and s["after_decontaminate"] == 2


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/selection.py)
# ---------------------------------------------------------------------------

def test_dsir_log_weights_matches_python_oracle(spark):
    """Weights on a tiny corpus vs a plain-Python replay of the same model
    (hashed unigram+bigram buckets, add-one smoothing over B)."""
    import hashlib
    import math

    from crawl4ai_scraper_spark.operators import selection as SEL

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog ran", "en"),
        (3, "der hund lief schnell davon", "de"),
        (4, "one", "en"),                      # 1-token doc: degenerate bigram
        (5, "el gato el gato el gato", "es"),  # heavy repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    B = 64

    def grams(text):
        w = text.strip().lower().split()
        w = w if w else [""]
        bi = [" ".join(w)] if len(w) < 2 else [f"{a} {b}" for a, b in zip(w, w[1:])]
        return w + bi

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % B

    tgt, raw = {}, {}
    for did, text, lang in rows:
        for g in grams(text):
            b = bucket(g)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    t_tot, r_tot = sum(tgt.values()), sum(raw.values())

    expected = {}
    for did, text, lang in rows:
        s = 0.0
        for g in grams(text):
            b = bucket(g)
            lr = math.log((tgt.get(b, 0) + 1.0) / (t_tot + B)) - math.log(
                (raw.get(b, 0) + 1.0) / (r_tot + B))
            s += round(lr, 12)
        expected[did] = (len(grams(text)), round(s, 6))

    tp = SEL.dsir_profile(df.filter(F.col("lang") == "en"), "text", "doc_id", B)
    rp = SEL.dsir_profile(df, "text", "doc_id", B)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in SEL.dsir_log_weights(df, "text", "doc_id", tp, rp, B).collect()
    }
    assert got == pytest.approx(expected)
    # English docs must out-weight the German one (that's the point of DSIR)
    assert min(got[1][1], got[2][1]) > got[3][1]


def test_dsir_select_is_weight_biased_without_replacement(spark):
    """Gumbel-top-k returns k distinct ids, and cranking a doc's weight up
    pulls it into every sample (monotonicity in log-weight space)."""
    from crawl4ai_scraper_spark.operators import selection as SEL

    w = spark.createDataFrame(
        [(i, 10, -50.0 if i != 7 else 50.0) for i in range(40)],
        "doc_id long, n_grams long, log_weight double",
    )
    sel = SEL.dsir_select(w, "doc_id", k=10, salt="g1").collect()
    ids = [r["doc_id"] for r in sel]
    assert len(ids) == len(set(ids)) == 10
    assert 7 in ids  # +100 nats of weight dominates any Gumbel draw
    # keys are sorted descending, ties impossible at these magnitudes
    keys = [r["gumbel_key"] for r in sel]
    assert keys == sorted(keys, reverse=True)


def test_submit_pipeline_dsir_stage(spark, tmp_path):
    """--dsir-k keeps exactly K docs, deterministically, and biases the kept
    set toward the target-lang distribution (English docs dominate when
    English is the target)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    en = [(i, f"the quick brown fox jumps over the lazy dog number {i}", "en")
          for i in range(20)]
    de = [(100 + i, f"der schnelle braune fuchs springt ueber den hund {i}", "de")
          for i in range(20)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(en + de, "doc_id long, text string, lang string").write.parquet(inp)

    out = str(tmp_path / "dsir")
    args = parse_args([
        "--input", inp, "--output", out, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--dsir-k", "12", "--dsir-target-lang", "en",
        "--dsir-buckets", "128",
    ])
    summary = run_pipeline(spark, args)
    kept = spark.read.parquet(out)
    assert summary["after_dsir"] == 12 == kept.count()
    langs = [r.lang for r in kept.collect()]
    assert langs.count("en") > langs.count("de")  # distribution matching

    # deterministic under the same salt
    out2 = str(tmp_path / "dsir2")
    run_pipeline(spark, parse_args([
        "--input", inp, "--output", out2, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--dsir-k", "12", "--dsir-target-lang", "en",
        "--dsir-buckets", "128",
    ]))
    assert ({r.doc_id for r in kept.collect()}
            == {r.doc_id for r in spark.read.parquet(out2).collect()})


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_real_decode_unavailable_raises_cleanly():
    """Without pillow, _real_decode on NON-PNG bytes must raise
    NotImplementedError (the documented stub contract) — not ImportError or
    a silent fallback. PNG bytes now decode via the stdlib codec instead."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    if _pil_available():
        pytest.skip("PIL installed — covered by test_real_decode_with_pil")
    with pytest.raises(NotImplementedError):
        M._real_decode(b"\xff\xd8\xff\xe0 jpeg-ish bytes")
    # a truncated PNG is a decode error, not a missing-library error
    with pytest.raises(ValueError):
        M._real_decode(b"\x89PNG\r\n\x1a\n")


def test_png_codec_roundtrip_all_filters_and_color_types():
    """The stdlib PNG codec: every scanline filter type and color type
    round-trips; stats match a direct pixel computation."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    for ctype, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        w, h = 5, 7
        def px(x, y, c):
            return (13 * x + 11 * y + 7 * c) % 256
        for f in range(5):  # each single filter type
            blob = M.png_encode(w, h, px, color_type=ctype,
                                filter_for_row=lambda y, f=f: f)
            meta = M.png_decode(blob)
            vals = [px(x, y, c) for y in range(h) for x in range(w)
                    for c in range(ch)]
            assert meta == {
                "width": w, "height": h, "channels": ch, "bit_depth": 8,
                "px_sum": sum(vals), "px_min": min(vals), "px_max": max(vals),
            }, (ctype, f)
        # mixed filters per row
        blob = M.png_encode(w, h, px, color_type=ctype,
                            filter_for_row=lambda y: y % 5)
        assert M.png_decode(blob)["px_sum"] == sum(
            px(x, y, c) for y in range(h) for x in range(w) for c in range(ch)
        )


def test_png_decode_rejects_unsupported_variants():
    import struct
    import zlib

    from crawl4ai_scraper_spark.operators import multimodal as M

    with pytest.raises(ValueError):
        M.png_decode(b"GIF89a not a png")

    def png_with_ihdr(bit, color, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, bit, color, 0, 0, interlace)
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        return (M._PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                + chunk(b"IEND", b""))

    with pytest.raises(ValueError):  # 16-bit
        M.png_decode(png_with_ihdr(16, 0, 0))
    with pytest.raises(ValueError):  # Adam7 interlace
        M.png_decode(png_with_ihdr(8, 0, 1))
    # malformed inputs keep the documented ValueError contract — a caller
    # catching ValueError to fall back must never see struct/zlib errors
    with pytest.raises(ValueError):  # chunk header claims more than present
        M.png_decode(M._PNG_MAGIC + struct.pack(">I", 13) + b"IHDR" + b"\x00\x01")
    good = M.png_encode(3, 2, lambda x, y, c: x)
    idat_at = good.index(b"IDAT")
    corrupt = bytearray(good)
    corrupt[idat_at + 4:idat_at + 10] = b"\xff" * 6  # trash the zlib stream
    with pytest.raises(ValueError):
        M.png_decode(bytes(corrupt))


def test_real_decode_png_without_pil(spark):
    """PNG real-decode works with no pillow anywhere in the env, including
    through the Arrow decode_media_real pass."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    png = M.png_encode(37, 21, lambda x, y, c: (x + y) % 256, color_type=2)
    meta = M._real_decode(png)
    assert (meta["width"], meta["height"]) == (37, 21)
    assert meta["n_bytes"] == len(png)

    df = spark.createDataFrame(
        [(1, bytearray(png), "image")], "media_id long, blob binary, kind string"
    )
    out = df.mapInPandas(M.decode_media_real, M.MEDIA_META_SCHEMA).collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (37, 21)


@pytest.mark.skipif(not _pil_available(), reason="pillow not installed")
def test_real_decode_with_pil(spark):
    """VERDICT r2 #8: the day the env gains PIL, the real decode path is
    exercised — a generated PNG round-trips through _real_decode and the
    Arrow decode_media_real pass with correct dimensions."""
    import io

    from PIL import Image

    from crawl4ai_scraper_spark.operators import multimodal as M

    buf = io.BytesIO()
    Image.new("RGB", (37, 21), color=(250, 128, 114)).save(buf, format="PNG")
    png = buf.getvalue()

    meta = M._real_decode(png)
    assert (meta["width"], meta["height"]) == (37, 21)
    assert meta["n_bytes"] == len(png)

    df = spark.createDataFrame(
        [(1, bytearray(png), "image")], "media_id long, blob binary, kind string"
    )
    out = df.mapInPandas(M.decode_media_real, M.MEDIA_META_SCHEMA).collect()
    assert len(out) == 1
    assert (out[0].width, out[0].height) == (37, 21)


def test_contract_decode_stays_fake_even_with_pil(spark):
    """decode_media must use the deterministic fake decode UNCONDITIONALLY —
    the DuckDB oracles replicate its md5-derived dimensions, and the
    synthetic blobs are utf-8 text, not images. This holds with or without
    pillow installed."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(7, bytearray(b"not an image at all"), "image")],
        "media_id long, blob binary, kind string",
    )
    row = df.mapInPandas(M.decode_media, M.MEDIA_META_SCHEMA).collect()[0]
    expect = M._fake_decode(b"not an image at all")
    assert (row.width, row.height, row.sha, row.n_bytes) == (
        expect["width"], expect["height"], expect["sha"], expect["n_bytes"],
    )


def test_semdedup_drops_planted_twins_keeps_singletons(spark):
    """SemDeDup: planted near-identical twins lose exactly one member (the
    more centroid-typical one); vectors without a ≥τ neighbor all survive."""
    import math
    import random

    from crawl4ai_scraper_spark.operators.similarity import semdedup

    rng = random.Random(11)
    base = [[round(rng.uniform(-1, 1), 3) for _ in range(64)] for _ in range(12)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, [x * 1.02 + 0.003 for x in v]) for i, v in enumerate(base[:5])]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")

    out = {r.vec_id: r for r in semdedup(df, "vec_id", "e", threshold=0.96).collect()}
    assert len(out) == 17  # every input vector gets a row
    # each twin pair loses exactly one member
    for i in range(5):
        assert out[i].keep != out[100 + i].keep, i
        # the survivor is the one LESS similar to its cell centroid
    # random 64-dim singletons are far from everything: all kept
    for i in range(5, 12):
        assert out[i].keep, i
    # survivor rule check: recompute priorities for one twin pair
    from crawl4ai_scraper_spark.operators.similarity import hyperplanes

    cents = hyperplanes(8, 64, 7)
    for i in range(5):
        for vid, vec in ((i, base[i]), (100 + i, [x * 1.02 + 0.003 for x in base[i]])):
            dots = [sum(a * b for a, b in zip(vec, c)) for c in cents]
            cell = max(range(8), key=lambda j: (dots[j], -j))
            cs = dots[cell] / math.sqrt(sum(x * x for x in vec))
            assert out[vid].cell == cell + 1
            out[vid] = (out[vid], cs)
    for i in range(5):
        (ra, csa), (rb, csb) = out[i], out[100 + i]
        if csa != csb:
            assert (csa < csb) == (ra.keep and not rb.keep)


def test_submit_pipeline_semdedup_stage(spark, tmp_path):
    """--semdedup drops exactly one member of each planted embedding-twin
    pair; docs without an embedding row survive untouched."""
    import random
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    docs = [(i, f"document body number {i} with enough text to keep") for i in range(12)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(inp)

    rng = random.Random(3)
    base = [[round(rng.uniform(-1, 1), 3) for _ in range(16)] for _ in range(10)]
    rows = [(i, v) for i, v in enumerate(base)]
    # twins for ids 0-3 mapped onto ids 6-9 (same doc table)
    rows = rows[:6] + [(6 + i, [x * 1.02 + 0.003 for x in base[i]]) for i in range(4)]
    # ids 10, 11 have NO embedding row
    embp = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(embp)

    out = str(tmp_path / "sdd")
    summary = run_pipeline(spark, parse_args([
        "--input", inp, "--output", out, "--skip-filter", "--skip-near-dup",
        "--skip-exact-dedup", "--semdedup", embp,
        "--semdedup-cells", "4", "--semdedup-dim", "16",
    ]))
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert summary["after_semdedup"] == len(kept) == 8  # 12 - 4 dropped twins
    assert {10, 11} <= kept  # no embedding -> survives
    for i in range(4):
        assert (i in kept) != (6 + i in kept)  # one survivor per twin pair


# ---------------------------------------------------------------------------
# cardinality sketches (operators/sketches.py)
# ---------------------------------------------------------------------------

def test_kmv_exact_below_k(spark):
    """With fewer distinct keys than k, KMV reports the exact distinct-hash
    count (sf0.001 documents: 500 distinct texts < k=1024)."""
    from crawl4ai_scraper_spark.operators.sketches import kmv_distinct

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = kmv_distinct(docs, "text", k=1024).collect()[0]
    assert row.n_min == 500 and row.estimate == 500.0


def test_kmv_estimator_accuracy(spark):
    """k=256 over 20k distinct keys: (k-1)/u_(k) lands within the
    ~n/sqrt(k) band (20% tolerance ≈ 3 sigma)."""
    from crawl4ai_scraper_spark.operators.sketches import kmv_distinct

    df = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    row = kmv_distinct(df, "k", k=256).collect()[0]
    assert row.n_min == 256
    assert abs(row.estimate - 20_000) / 20_000 < 0.20, row.estimate


def test_kmv_duplicates_dont_inflate(spark):
    """Duplicate keys collapse in the DISTINCT: 10x-duplicated input gives
    the same estimate as the unique set."""
    from crawl4ai_scraper_spark.operators.sketches import kmv_distinct

    uniq = spark.range(5_000).select(F.col("id").cast("string").alias("k"))
    dup = spark.range(50_000).select(
        (F.col("id") % 5_000).cast("string").alias("k")
    )
    assert (kmv_distinct(uniq, "k", k=256).collect()[0].estimate
            == kmv_distinct(dup, "k", k=256).collect()[0].estimate)


def test_hll_linear_counting_small_range(spark):
    """n=500 << m=4096 exercises the linear-counting branch; it should be
    within a few percent of truth."""
    from crawl4ai_scraper_spark.operators.sketches import hll_distinct

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = hll_distinct(docs, "text", b=12).collect()[0]
    assert row.m == 4096 and row.n_zero_buckets > 3000
    assert abs(row.estimate - 500) / 500 < 0.10, row.estimate


def test_hll_raw_branch_accuracy(spark):
    """20k distinct keys pushes E_raw past 2.5m (10240) into the raw
    harmonic-mean branch; standard error is ~1.04/sqrt(m) ≈ 1.6%, assert
    within 8%."""
    from crawl4ai_scraper_spark.operators.sketches import hll_distinct

    df = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    row = hll_distinct(df, "k", b=12).collect()[0]
    assert abs(row.estimate - 20_000) / 20_000 < 0.08, row.estimate


# ---------------------------------------------------------------------------
# containment_pairs (prefix-filtering overlap join)
# ---------------------------------------------------------------------------

def test_containment_prefix_filter_no_false_negatives(spark):
    """The prefix-filtered candidate generation must find EVERY pair a
    brute-force all-pairs containment finds (and agree on the values)."""
    from crawl4ai_scraper_spark.operators.dedup import containment_pairs, shingles

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 25)
        .select(F.col("doc_id").alias("doc"), "text")
    )
    toks = F.split(F.trim(F.col("text")), "\\s+")
    m = F.greatest(F.floor(F.size(toks) / F.lit(2)), F.lit(5))
    corpus = docs.unionByName(docs.select(
        (F.col("doc") + 1000).alias("doc"),
        F.concat_ws(" ", F.slice(toks, F.lit(1), m)).alias("text"),
    ))

    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(corpus, "text", "doc").collect()
    }

    # brute force: all pairs, exact shingle-set containment
    sh = corpus.select(
        F.col("doc"), F.array_distinct(shingles(F.col("text"), 3)).alias("sh")
    )
    a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("ninter"),
            F.least(F.size("sh_a"), F.size("sh_b")).alias("nmin"),
        )
        .filter(F.lit(5) * F.col("ninter") >= F.lit(4) * F.col("nmin"))
        .select(
            "id_a", "id_b",
            F.round(F.col("ninter").cast("double") / F.col("nmin"), 4)
            .alias("containment"),
        )
    )
    want = {(r.id_a, r.id_b): r.containment for r in brute.collect()}
    assert got == want
    # every planted excerpt pair is fully contained
    for i in range(25):
        assert got[(i, i + 1000)] == 1.0


def test_pipeline_containment_stage(spark, tmp_path):
    """--containment drops the SHORTER side of each excerpt-in-document
    pair and leaves unrelated docs alone."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    import random
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    for i in range(6):
        words = rng.sample(vocab, 40)
        docs.append((i, " ".join(words)))
        if i < 3:  # excerpts of docs 0-2: first 20 words
            docs.append((100 + i, " ".join(words[:20])))
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "kept")

    summary = run_pipeline(spark, parse_args([
        "--input", inp, "--output", out, "--skip-filter",
        "--skip-exact-dedup", "--skip-near-dup", "--containment",
    ]))
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {0, 1, 2, 3, 4, 5}  # excerpts 100-102 dropped
    assert summary["after_containment"] == 6


class TestContainmentAndSketchProperties:
    """Property tests for the two mathematical claims the round-3 operators
    rest on — pure Python, mirroring the exact arithmetic the Spark/DuckDB
    plans execute."""

    def test_prefix_filter_guarantee_property(self):
        """For ANY family of gram sets: every pair with containment ≥ 4/5
        must be surfaced by probing one side's df-ordered prefix against the
        other side's FULL set (the asymmetric candidate rule
        containment_pairs implements). This is the no-false-negative
        guarantee the operator's correctness rests on."""
        from collections import Counter

        from hypothesis import given, settings, strategies as st

        num, den = 4, 5
        doc_st = st.sets(st.integers(0, 30), min_size=1, max_size=15)

        @given(docs=st.lists(doc_st, min_size=2, max_size=8))
        @settings(max_examples=300, deadline=None)
        def check(docs):
            dfc = Counter(g for d in docs for g in d)

            def prefix(d):
                n = len(d)
                plen = n - ((num * n + den - 1) // den) + 1
                return set(sorted(d, key=lambda g: (dfc[g], g))[:plen])

            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    a, b = docs[i], docs[j]
                    inter = len(a & b)
                    if den * inter >= num * min(len(a), len(b)):
                        assert (prefix(a) & b) or (prefix(b) & a), (a, b)

        check()

    def test_hll_harmonic_sum_is_order_free(self):
        """Every 2^-rank term (rank ≤ 37) is a dyadic rational with
        denominator ≤ 2^37 and the bucket count ≤ 4096, so all partial sums
        fit a double mantissa exactly — IEEE addition commutes bit-for-bit
        (the cross-engine determinism claim of sketches.hll_distinct)."""
        import math

        from hypothesis import given, settings, strategies as st

        @given(
            ranks=st.lists(st.integers(1, 37), min_size=0, max_size=512),
            seed=st.integers(0, 2**32 - 1),
        )
        @settings(max_examples=300, deadline=None)
        def check(ranks, seed):
            import random as _r

            terms = [2.0 ** -r for r in ranks]
            shuffled = terms[:]
            _r.Random(seed).shuffle(shuffled)
            s1, s2, s3 = sum(terms), sum(reversed(terms)), sum(shuffled)
            assert s1 == s2 == s3 == math.fsum(terms)

        check()


# ---------------------------------------------------------------------------
# sketch family round-out: grouped HLL, Count-Min, exact quantiles,
# temperature mixing
# ---------------------------------------------------------------------------

def test_hll_by_lang_matches_per_slice(spark):
    """The grouped HLL must equal hll_distinct run on each filtered slice —
    same digest, same buckets, just one shuffle instead of |langs|."""
    from crawl4ai_scraper_spark.operators.sketches import (
        hll_distinct, hll_distinct_by,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    grouped = {
        r.lang: (r.n_zero_buckets, r.estimate)
        for r in hll_distinct_by(docs, "text", "lang", b=12).collect()
    }
    assert set(grouped) == {"de", "en", "es", "fr", "zh"}
    for lang, got in grouped.items():
        row = hll_distinct(docs.filter(F.col("lang") == lang), "text", b=12).collect()[0]
        assert got == (row.n_zero_buckets, row.estimate), lang


def test_cms_overestimate_guarantee(spark):
    """Count-Min never underestimates: for EVERY distinct token in the
    corpus, min-of-cells ≥ the true count, and the worst overcount stays
    under the e/w·N Markov bound's practical envelope."""
    from crawl4ai_scraper_spark.operators.sketches import cms_build, cms_estimate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    syn = cms_build(toks, F.col("tok"), d=4, w=1024, salt="cms")
    probes = toks.groupBy(F.col("tok").alias("token")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    est = cms_estimate(syn, probes.select("token"), "token", d=4, w=1024, salt="cms")
    joined = est.join(probes, "token").select("token", "cms_est", "true_cnt")
    rows = joined.collect()
    n_total = toks.count()
    assert rows and all(r.cms_est >= r.true_cnt for r in rows)
    import math
    bound = math.e / 1024 * n_total
    # 1-δ = 1-e^-4 ≈ 98.2% per key; allow a handful of tail keys
    n_over = sum(1 for r in rows if r.cms_est - r.true_cnt > bound)
    assert n_over <= max(3, int(0.02 * len(rows))), n_over


def test_cms_synopsis_is_bounded(spark):
    """The synopsis never exceeds d·w rows no matter the input size."""
    from crawl4ai_scraper_spark.operators.sketches import cms_build

    df = spark.range(100_000).select((F.col("id") % 50_000).cast("string").alias("k"))
    assert cms_build(df, F.col("k"), d=4, w=256).count() <= 4 * 256


def test_exact_quantiles_match_sorted(spark):
    """exact_quantiles must equal the ceil(q·N)-rank element of the fully
    sorted value list (quantile_disc semantics), including duplicate-heavy
    and tiny inputs."""
    from crawl4ai_scraper_spark.operators.sketches import exact_quantiles

    for vals in ([5], [3, 1, 4, 1, 5, 9, 2, 6], [7] * 100, list(range(1000))):
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {r.q: r.value for r in exact_quantiles(df, "x").collect()}
        srt, n = sorted(vals), len(vals)
        for (num, den) in ((1, 4), (1, 2), (3, 4), (19, 20)):
            want = srt[-(-num * n // den) - 1]  # ceil(q*n)-th, 1-indexed
            assert got[num / den] == want, (vals, num, den)


def test_kmv_overlap_exact_below_k(spark):
    """With fewer than k distinct union values the KMV overlap row is
    collision-exact: n_min = |A∪B|, n_both = |A∩B|, jaccard exact."""
    from crawl4ai_scraper_spark.operators.sketches import kmv_overlap

    a = spark.createDataFrame([(f"k{i}",) for i in range(0, 60)], "x string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(40, 100)], "x string")
    row = kmv_overlap(a, b, "x", k=256).collect()[0]
    assert (row.n_min, row.n_both) == (100, 20)
    assert row.union_est == 100.0
    assert row.jaccard_est == 0.2
    assert row.inter_est == 20.0


def test_kmv_overlap_estimates_large(spark):
    """Above k the estimator tracks the true Jaccard/union within the
    ~1/sqrt(k) envelope on a 20k-key universe with 25% overlap."""
    from crawl4ai_scraper_spark.operators.sketches import kmv_overlap

    a = spark.range(0, 12_000).select(F.concat(F.lit("u"), F.col("id")).alias("x"))
    b = spark.range(9_000, 20_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("x")
    )
    row = kmv_overlap(a, b, "x", k=512).collect()[0]
    true_j = 3_000 / 20_000
    assert abs(row.union_est - 20_000) / 20_000 < 0.15
    assert abs(row.jaccard_est - true_j) < 3 / (512 ** 0.5)  # ~3σ


def test_hll_setops_union_is_lossless_merge(spark):
    """The merged union estimate must EQUAL hll_distinct run over the
    concatenated stream — per-bucket max merge loses nothing."""
    from crawl4ai_scraper_spark.operators.sketches import hll_distinct, hll_setops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.filter(F.col("doc_id") % 10 < 6)
    b = docs.filter(F.col("doc_id") % 10 >= 4)
    row = hll_setops(a, b, "text", b=12).collect()[0]
    direct = hll_distinct(
        a.select("text").unionAll(b.select("text")), "text", b=12
    ).collect()[0]
    assert row.est_union == direct.estimate
    assert row.inter_est >= 0.0
    # sides estimate their own slices
    ea = hll_distinct(a, "text", b=12).collect()[0].estimate
    eb = hll_distinct(b, "text", b=12).collect()[0].estimate
    assert (row.est_a, row.est_b) == (ea, eb)


def test_cms_heavy_hitters_exact(spark):
    """The two-pass CMS heavy hitter must equal the naive GROUP BY ...
    HAVING exactly — the screen can never drop a true heavy hitter
    (CMS only overestimates) and the verify pass removes every false
    positive. Zipf-ish synthetic stream, several φ values."""
    from crawl4ai_scraper_spark.operators.sketches import cms_heavy_hitters

    # key i appears ~ 3000/i times: true Zipf head
    rows = [(f"k{i}",) for i in range(1, 80) for _ in range(3000 // i)]
    df = spark.createDataFrame(rows, "x string")
    n = len(rows)
    from collections import Counter

    true_counts = Counter(r[0] for r in rows)
    for num, den in ((1, 20), (1, 100), (1, 1000)):
        got = {
            (r.k, r.cnt)
            for r in cms_heavy_hitters(
                df, F.col("x"), num, den, d=4, w=512
            ).collect()
        }
        want = {(k, c) for k, c in true_counts.items() if c * den >= num * n}
        assert got == want, (num, den)


def test_cms_heavy_hitters_small_w_still_exact(spark):
    """Even a deliberately undersized synopsis (w=16 — massive collisions,
    the screen passes almost everything) yields the exact answer: the
    guarantee is correctness-by-construction, width only tunes cost."""
    from crawl4ai_scraper_spark.operators.sketches import cms_heavy_hitters

    rows = [("hot",)] * 500 + [(f"c{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "x string")
    got = cms_heavy_hitters(df, F.col("x"), 1, 10, d=2, w=16).collect()
    assert [(r.k, r.cnt) for r in got] == [("hot", 500)]


def test_mixture_weights_invariants(spark):
    """Mixing weights sum to 1 (6dp), every rate ∈ (0, 1], and a group
    smaller than its quota is taken whole (rate capped at exactly 1.0)."""
    from crawl4ai_scraper_spark.operators.selection import mixture_weights

    rows = [("big", i) for i in range(900)] + [("tiny", i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, i long")
    out = {r.g: r for r in mixture_weights(df, "g", target_total=200).collect()}
    assert abs(out["big"].mix_weight + out["tiny"].mix_weight - 1.0) < 2e-6
    assert out["tiny"].sample_rate == 1.0  # sqrt damping gives tiny > its share
    assert 0.0 < out["big"].sample_rate < 1.0
    # tau=1/2 up-weights the tail: tiny's mix share far exceeds its p
    assert out["tiny"].mix_weight > 10 * out["tiny"].p


def test_pq_encode_shape_and_numpy_oracle(spark):
    """pq_encode: codes are m ints in 1..k, and match an independent numpy
    replication of the codebook argmin for a sample of vectors."""
    import numpy as np
    from crawl4ai_scraper_spark.operators import similarity as S

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = S.pq_encode(emb).filter(F.col("vec_id") < 20).collect()
    assert all(len(r["code"]) == 8 for r in out)
    assert all(1 <= c <= 16 for r in out for c in r["code"])

    books = [np.array(b) for b in S.pq_codebooks()]
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id") < 20).collect()
    }
    for r in out:
        v = vecs[r["vec_id"]]
        for j, book in enumerate(books):
            s = v[j * 8:(j + 1) * 8]
            d = ((s[None, :] - book) ** 2).sum(axis=1)
            assert r["code"][j] == int(np.argmin(d)) + 1, (r["vec_id"], j)


def test_pq_encode_is_narrow_map(spark):
    """The encode plan must be a pure scan→project: no Exchange anywhere."""
    from crawl4ai_scraper_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = S.pq_encode(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_adc_beats_random_and_contains_self_dup(spark):
    """ADC sanity: for a planted exact duplicate (same vector, new id), the
    duplicate must be the query's rank-1 ADC neighbor with distance equal to
    twice the query's own quantization error... precisely: ADC(q, dup(q)) ==
    ADC(q, q) since codes are equal, and no other vector can beat a zero-
    quantization-error match only by chance — so assert the dup is rank 1
    for every query."""
    from crawl4ai_scraper_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    dups = base.select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(dups)
    out = S.pq_adc_topk(corpus, n_queries=10, top_k=1).collect()
    assert len(out) == 10
    for r in out:
        assert r["neighbor_id"] == r["query_id"] + 50000, r


def test_connected_components_star(spark):
    """Alternating-star CC: chain, cycle, isolated vertex, and a two-edge
    merge all resolve to min-id component labels."""
    from crawl4ai_scraper_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [
            # chain 1-2-3-4-5 (worst case for propagation)
            (1, 2), (2, 3), (3, 4), (4, 5),
            # cycle 10-11-12-10 with duplicate + reversed edges
            (10, 11), (11, 12), (12, 10), (11, 10),
            # bridge merging {20,21} into the chain via 5
            (20, 21), (21, 5),
        ],
        "src int, dst int",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 99]], "node int")
    got = {r["node"]: r["component"] for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 20: 1, 21: 1,
                   10: 10, 11: 10, 12: 10, 99: 99}


def test_connected_components_beats_diameter(spark):
    """A 33-node chain must close in far fewer star rounds than its
    diameter: max_rounds=8 (≈ 2·log2 n) suffices where label propagation
    would need 32."""
    from crawl4ai_scraper_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], "src int, dst int"
    )
    got = connected_components(edges, max_rounds=8).collect()
    assert all(r["component"] == 0 for r in got)
    assert {r["node"] for r in got} == set(range(33))


def test_ivf_pq_topk_cell_restriction_and_dup_rank1(spark):
    """IVF-PQ: every returned neighbor shares the query's coarse cell, and a
    planted exact duplicate (same vector → same cell, same code) is rank 1."""
    from crawl4ai_scraper_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding")
    dups = base.select((F.col("vec_id") + 50000).alias("vec_id"), "embedding")
    corpus = base.unionByName(dups)
    out = S.ivf_pq_topk(corpus, n_queries=10, top_k=1).collect()
    assert len(out) == 10
    for r in out:
        assert r["neighbor_id"] == r["query_id"] + 50000, r

    cells = {r["vec_id"]: r["cell"] for r in S.ivf_assign(emb).collect()}
    full = S.ivf_pq_topk(emb, n_queries=10, top_k=5).collect()
    for r in full:
        assert cells[r["neighbor_id"]] == cells[r["query_id"]], r


def test_chunk_sentences_invariants(spark):
    """Sentence chunking: chunks reassemble to the full trimmed sentence
    stream (no sentence ever split), and each chunk's first sentence starts
    inside the chunk's character window [id*max_chars, (id+1)*max_chars)."""
    docs = spark.createDataFrame(
        [
            (1, "One. Two two! Three three three? " * 8),
            (2, "A single very long sentence with no terminator at all " * 12),
            (3, "Tiny."),
            (4, ""),
        ],
        "doc_id int, text string",
    )
    out = T.chunk_sentences(docs, max_chars=60).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc  # empty doc yields no sentences
    assert [r["chunk_id"] for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])] == [0]

    import re

    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        text = {1: "One. Two two! Three three three? " * 8,
                2: "A single very long sentence with no terminator at all " * 12,
                3: "Tiny."}[doc_id]
        sents = [s.strip() for s in re.findall(r"[^.!?]+[.!?]*", text) if s.strip()]
        # reassembly: concatenating chunks in order == the sentence stream
        assert " ".join(r["chunk_text"] for r in rows) == " ".join(sents)
        # boundary: first sentence of chunk k starts at offset in [60k, 60k+60)
        cum = 0
        starts = {}
        for s in sents:
            starts.setdefault(cum // 60, cum)
            cum += len(s)
        for r in rows:
            assert r["chunk_id"] in starts
            assert starts[r["chunk_id"]] // 60 == r["chunk_id"]
            assert r["n_chars"] == len(r["chunk_text"])
            assert r["n_sentences"] >= 1


def test_png_codec_roundtrip_property():
    """Property: for ANY dimensions, color type, per-row filter choice and
    pixel function, decode(encode(...)) recovers the exact header fields and
    pixel stats — the codec pair is a true inverse over its whole domain."""
    from hypothesis import given, settings, strategies as st

    from crawl4ai_scraper_spark.operators import multimodal as M

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 9),
        ctype=st.sampled_from([0, 2, 4, 6]),
        a=st.integers(0, 255),
        b=st.integers(0, 255),
        c=st.integers(0, 255),
        fseed=st.integers(0, 10**6),
    )
    def check(w, h, ctype, a, b, c, fseed):
        ch = M._PNG_CHANNELS[ctype]

        def px(x, y, cc):
            return (a * x + b * y + c * cc + a) % 256

        blob = M.png_encode(
            w, h, px, color_type=ctype,
            filter_for_row=lambda y: (fseed + 31 * y) % 5,
        )
        meta = M.png_decode(blob)
        vals = [px(x, y, cc) for y in range(h) for x in range(w)
                for cc in range(ch)]
        assert meta == {
            "width": w, "height": h, "channels": ch, "bit_depth": 8,
            "px_sum": sum(vals), "px_min": min(vals), "px_max": max(vals),
        }

    check()


# ---------------------------------------------------------------------------
# GIF87a/89a stdlib codec (round-5: second format off the PIL gate,
# VERDICT r4 next-round #6 — the png codec pattern applied to LZW)
# ---------------------------------------------------------------------------

def test_gif_lzw_hand_crafted_bitstream():
    """Decoder vs a hand-packed stream (independent of our encoder): with
    min_code_size=2 the codes [CLEAR=4, 1, 2, 2, END=5] pack LSB-first at 3
    bits into exactly 0x8C 0x54 and must decode to pixels [1, 2, 2]."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    assert bytes(M._lzw_decode(2, b"\x8c\x54", 3)) == b"\x01\x02\x02"


def test_gif_codec_roundtrip_matrix():
    """Palette sizes 2..256, both versions, degenerate 1×1, constant runs
    (max compression), and a stream long enough to force 12-bit code growth
    plus a CLEAR reset — stats always equal the direct pixel computation."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    cases = [(1, 1, 2), (3, 5, 4), (16, 16, 16), (40, 30, 256), (97, 13, 8),
             (5, 4, 4)]  # (5,4,4): widen lands on the final prefix emission
    for w, h, nc in cases:
        for mode, px in enumerate([
            lambda x, y: (x * 7 + y * 3) % nc,
            lambda x, y: 0,
            lambda x, y: (5 * 3 + 3 * x + 11 * y) % nc,
        ]):
            blob = M.gif_encode(w, h, px, n_colors=nc,
                                version=b"GIF87a" if mode == 0 else b"GIF89a")
            meta = M.gif_decode(blob)
            vals = [px(x, y) % nc for y in range(h) for x in range(w)]
            assert meta == {
                "width": w, "height": h, "channels": 1, "bit_depth": 8,
                "n_frames": 1, "px_sum": sum(vals), "px_min": min(vals),
                "px_max": max(vals),
            }, (w, h, nc, mode)

    def rnd(x, y):  # incompressible → exercises 12-bit cap + CLEAR reset
        return (x * 1103515245 + y * 12345 + (x ^ y) * 2654435761) % 256

    meta = M.gif_decode(M.gif_encode(300, 300, rnd, n_colors=256))
    vals = [rnd(x, y) % 256 for y in range(300) for x in range(300)]
    assert meta["px_sum"] == sum(vals) and meta["n_frames"] == 1


def test_gif_decode_rejects_malformed():
    """Malformed inputs keep the documented ValueError contract — a caller
    catching ValueError to fall back must never see struct/IndexError."""
    import pytest as _pytest

    from crawl4ai_scraper_spark.operators import multimodal as M

    for bad in (b"NOTGIF", b"GIF89a", b"GIF89a" + b"\x00" * 20,
                b"\x89PNG\r\n\x1a\n not a gif"):
        with _pytest.raises(ValueError):
            M.gif_decode(bad)
    # truncated mid-LZW: trash the compressed sub-block
    good = bytearray(M.gif_encode(9, 7, lambda x, y: (x + y) % 4, n_colors=4))
    good[-10:-2] = b"\xff" * 8
    with _pytest.raises(ValueError):
        M.gif_decode(bytes(good))


def test_real_decode_gif_without_pil(spark):
    """GIF real-decode works with no pillow anywhere in the env, including
    through the Arrow decode_media_real pass (same contract as PNG)."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    gif = M.gif_encode(29, 17, lambda x, y: (3 * x + y) % 16, n_colors=16)
    meta = M._real_decode(gif)
    assert (meta["width"], meta["height"]) == (29, 17)
    assert meta["n_bytes"] == len(gif)

    df = spark.createDataFrame(
        [(1, bytearray(gif), "image")], "media_id long, blob binary, kind string"
    )
    out = df.mapInPandas(M.decode_media_real, M.MEDIA_META_SCHEMA).collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (29, 17)


def test_gif_lzw_property_roundtrip():
    """Hypothesis: _lzw_decode is an exact inverse of _lzw_encode for any
    byte stream and min code size — dictionary growth, width transitions
    (including a widen landing exactly on the final prefix emission), KwKwK
    sequences, and empty input."""
    from hypothesis import given, settings, strategies as st

    from crawl4ai_scraper_spark.operators import multimodal as M

    @given(
        mcs=st.sampled_from([2, 3, 4, 8]),
        data=st.binary(min_size=0, max_size=400),
        alphabet_bits=st.integers(1, 8),
    )
    @settings(max_examples=400, deadline=None)
    def check(mcs, data, alphabet_bits):
        mask = (1 << min(alphabet_bits, mcs)) - 1
        stream = bytes(b & mask for b in data)
        comp = M._lzw_encode(mcs, stream)
        assert bytes(M._lzw_decode(mcs, comp, len(stream))) == stream

    check()


def test_gif_roundtrip_stats_operator(spark):
    """The Arrow-batched gif_roundtrip_stats operator agrees with the direct
    per-id computation (the contract oracle's closed form)."""
    from crawl4ai_scraper_spark.operators import multimodal as M

    ids = spark.range(0, 40).selectExpr("id as media_id")
    got = {r["media_id"]: r for r in M.gif_roundtrip_stats(ids).collect()}
    for d in range(40):
        w, h = 2 + d % 9, 1 + d % 6
        nc = (4, 16, 256)[d % 3]
        vals = [(5 * d + 3 * x + 11 * y) % nc for y in range(h) for x in range(w)]
        r = got[d]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, 1)
        assert (r["px_sum"], r["px_min"], r["px_max"]) == (
            sum(vals), min(vals), max(vals))
