"""Functional tests for the round-3 additions: inverted-index search, the
bucketed interval join, the salted skew join, and JSONL shard export.

The DuckDB contract oracles prove value parity at sf scale; these tests pin
the SEMANTIC edges the oracles exercise only by accident: conjunction
exclusion, range-boundary inclusivity (incl. sub-second interval ends),
salt invisibility under inner AND left joins, and the on-disk round trip.
"""

import datetime as dt
import json

from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------


def test_inverted_postings_tf_df_cf(spark):
    from crawl4ai_scraper_spark.operators.search import inverted_postings

    docs = spark.createDataFrame(
        [
            (1, "spark spark window"),
            (2, "spark merge"),
            (3, "window   window merge"),  # multi-space: empty tokens dropped
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r.term, r.doc_id): (r.tf, r.df, r.cf)
        for r in inverted_postings(docs).collect()
    }
    assert rows[("spark", 1)] == (2, 2, 3)
    assert rows[("spark", 2)] == (1, 2, 3)
    assert rows[("window", 3)] == (2, 2, 3)
    assert rows[("merge", 2)] == (1, 2, 2)
    assert ("", 3) not in rows  # blank tokens never become terms
    # min_df prunes AFTER stats: df/cf of survivors unchanged
    from crawl4ai_scraper_spark.operators.search import inverted_postings as ip

    pruned = {r.term for r in ip(docs, min_df=2).collect()}
    assert pruned == {"spark", "window", "merge"}


def test_tfidf_search_is_conjunctive_and_ranked(spark):
    from crawl4ai_scraper_spark.operators.search import tfidf_search

    docs = spark.createDataFrame(
        [
            (1, "spark window spark window"),  # both terms, high tf
            (2, "spark window"),  # both terms, low tf
            (3, "spark spark spark spark"),  # missing 'window' → excluded
            (4, "window"),  # missing 'spark' → excluded
        ],
        ["doc_id", "text"],
    )
    hits = tfidf_search(docs, ["spark", "window"], k=10).collect()
    assert [r.doc_id for r in hits] == [1, 2]
    assert hits[0].score > hits[1].score
    # AND of one absent term matches nothing
    assert tfidf_search(docs, ["spark", "absentterm"], k=10).count() == 0


def test_tfidf_search_plan_takeordered_no_cartesian(spark):
    from crawl4ai_scraper_spark import contract

    df = contract.queries()["tfidf_conjunctive_search"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_interval_bucket_join_matches_naive_and_boundaries(spark):
    from crawl4ai_scraper_spark.operators.temporal import interval_bucket_join

    pts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start: included
            (2, _ts("2024-01-01 00:29:59.999999")),  # last µs before end
            (3, _ts("2024-01-01 00:30:00")),  # == end: EXCLUDED
            (4, _ts("2024-01-01 00:59:59.500000")),  # sub-second end edge
            (5, _ts("2024-01-01 02:00:00")),  # outside everything
        ],
        ["event_id", "ts"],
    )
    ivs = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:30:00")),
            # end with fractional seconds, crossing a bucket boundary
            (11, _ts("2024-01-01 00:30:00"), _ts("2024-01-01 00:59:59.600000")),
            # overlapping interval: points may match several intervals
            (12, _ts("2024-01-01 00:15:00"), _ts("2024-01-01 00:45:00")),
        ],
        ["interval_id", "t0", "t1"],
    )
    got = {
        (r.interval_id, r.event_id)
        for r in interval_bucket_join(pts, ivs, "ts", "t0", "t1", 600).collect()
    }
    naive = {
        (r.interval_id, r.event_id)
        for r in pts.crossJoin(ivs)
        .filter((F.col("ts") >= F.col("t0")) & (F.col("ts") < F.col("t1")))
        .collect()
    }
    assert got == naive
    assert (10, 1) in got and (10, 2) in got and (10, 3) not in got
    assert (11, 4) in got  # the sub-second-end bucket must not be dropped
    assert (12, 2) in got and (12, 3) in got  # overlap → multiple matches
    # exactly-once: no pair duplicated
    assert (
        interval_bucket_join(pts, ivs, "ts", "t0", "t1", 600).count()
        == len(got)
    )


def test_interval_join_plan_is_equi_not_nested_loop(spark):
    from crawl4ai_scraper_spark import contract

    df = contract.queries()["interval_containment_join"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


# ---------------------------------------------------------------------------
# salted join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    from crawl4ai_scraper_spark.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(i, "k%d" % (i % 3), i * 1.0) for i in range(100)]
        + [(100, "orphan", 1.0)],  # key absent from dim
        ["id", "k", "v"],
    )
    dim = spark.createDataFrame(
        [("k0", 10), ("k1", 20), ("k2", 30)], ["k", "w"]
    )
    plain = {
        (r.id, r.w)
        for r in fact.join(dim, "k").select("id", "w").collect()
    }
    salted = {
        (r.id, r.w)
        for r in salted_join(fact, dim, "k", F.col("id"), n_salts=4)
        .select("id", "w")
        .collect()
    }
    assert salted == plain
    # left join keeps unmatched fact rows exactly once
    left = salted_join(fact, dim, "k", F.col("id"), n_salts=4, how="left")
    assert left.count() == 101
    assert left.filter(F.col("w").isNull()).count() == 1


def test_salted_join_plan_is_shuffle_join_on_salt(spark):
    from crawl4ai_scraper_spark import contract

    df = contract.queries()["skew_salted_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:1500]
    assert "_salt" in plan  # the salt is a physical join key
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# export shards
# ---------------------------------------------------------------------------


def test_write_jsonl_shards_roundtrip(spark, tmp_path):
    from crawl4ai_scraper_spark.operators.export import write_jsonl_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "export")
    manifest = write_jsonl_shards(docs, out, target_tokens=512)
    man = {r.shard_id: r for r in manifest.collect()}

    back = spark.read.json(out)  # _manifest/ ignored (underscore dir)
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # per-shard token sums on disk match the manifest exactly
    disk = {
        r.shard_id: (r.n, r.tok)
        for r in back.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert set(disk) == set(man)
    for sid, (n, tok) in disk.items():
        assert (man[sid].n_docs, man[sid].shard_tokens) == (n, tok)
    # layout is deterministic: docs appear in id order across shard ids
    ordered = sorted(man.values(), key=lambda r: r.shard_id)
    for a, b in zip(ordered, ordered[1:]):
        assert a.last_doc < b.first_doc
    # every shard except the last reached its budget minus one doc
    for r in ordered[:-1]:
        assert r.shard_tokens >= 512 - 200  # corpus max doc ≪ 200 tokens
    # the manifest on disk parses as JSONL
    mdir = tmp_path / "export" / "_manifest"
    lines = []
    for p in mdir.glob("part-*"):
        lines += [json.loads(x) for x in p.read_text().splitlines() if x]
    assert {l["shard_id"] for l in lines} == set(man)


def test_shard_plan_matches_sequence_pack_math(spark):
    from crawl4ai_scraper_spark.operators.export import (
        shard_plan,
        whitespace_token_count,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * (5 + i))) for i in range(20)]
        + [Row(doc_id=99, text="   ")],  # blank → 0 tokens, shifts nothing
    )
    plan = {r.doc_id: r for r in shard_plan(docs, 32).collect()}
    cum = 0
    for i in range(20):
        assert plan[i].cum_before == cum
        assert plan[i].shard_id == cum // 32
        assert plan[i].offset_in_shard == cum % 32
        cum += 5 + i
    assert plan[99].n_tokens == 0 and plan[99].cum_before == cum
    # convention check: blank text counts zero
    got = docs.select(
        whitespace_token_count(F.col("text")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert got == cum


# ---------------------------------------------------------------------------
# phrase search / KWIC
# ---------------------------------------------------------------------------


def test_phrase_search_requires_adjacency_in_order(spark):
    from crawl4ai_scraper_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big data big data big"),  # 'big data' twice
            (2, "data big"),  # reversed → no match
            (3, "big x data"),  # co-occurring, not adjacent → no match
            (4, "Big Data"),  # case-folded → match
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_occurrences for r in phrase_search(docs, "big", "data").collect()}
    assert got == {1: 2, 4: 1}


def test_kwic_snippets_window_and_edges(spark):
    from crawl4ai_scraper_spark.operators.search import kwic_snippets

    docs = spark.createDataFrame(
        [
            (1, "a b c hit d e f g"),  # interior: full ±2 window
            (2, "hit x y"),  # at start: window clamps left
            (3, "x y hit"),  # at end: clamps right
            (4, "no match here"),  # absent → filtered out
            (5, "pre hit mid hit post"),  # FIRST occurrence only
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.first_pos, r.snippet) for r in kwic_snippets(docs, "hit", 2).collect()}
    assert got == {
        1: (4, "b c hit d e"),
        2: (1, "hit x y"),
        3: (3, "x y hit"),
        5: (2, "pre hit mid hit"),
    }


def test_kwic_plan_is_scan_speed_zero_exchange(spark):
    from crawl4ai_scraper_spark import contract

    df = contract.queries()["kwic_snippets"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1200]
    assert "Generate" not in plan  # no explode — pure array projection


# ---------------------------------------------------------------------------
# funnel / cohort
# ---------------------------------------------------------------------------


def test_funnel_strict_ordering_semantics(spark):
    from crawl4ai_scraper_spark.operators.funnel import funnel, funnel_counts

    T = _ts
    ev = spark.createDataFrame(
        [
            # u1: full funnel in order
            (1, "view", T("2024-01-01 10:00:00")),
            (1, "click", T("2024-01-01 11:00:00")),
            (1, "purchase", T("2024-01-01 12:00:00")),
            # u2: purchase BEFORE click → stops at click
            (2, "view", T("2024-01-01 10:00:00")),
            (2, "purchase", T("2024-01-01 10:30:00")),
            (2, "click", T("2024-01-01 11:00:00")),
            # u3: click only, never viewed → not in funnel at all
            (3, "click", T("2024-01-01 10:00:00")),
            # u4: click SIMULTANEOUS with view → strict > excludes it
            (4, "view", T("2024-01-01 10:00:00")),
            (4, "click", T("2024-01-01 10:00:00")),
            # u5: earliest view is AFTER its only click; later click counts
            (5, "click", T("2024-01-01 09:00:00")),
            (5, "view", T("2024-01-01 10:00:00")),
            (5, "click", T("2024-01-01 10:30:00")),
        ],
        ["user_id", "event_type", "ts"],
    )
    steps = ["view", "click", "purchase"]
    per_user = {r.user_id: r for r in funnel(ev, steps).collect()}
    assert set(per_user) == {1, 2, 4, 5}
    assert per_user[1].t3 is not None
    assert per_user[2].t2 is not None and per_user[2].t3 is None
    assert per_user[4].t2 is None  # simultaneous ≠ after
    assert per_user[5].t2 == T("2024-01-01 10:30:00")  # first click AFTER view
    counts = {r.stage_idx: r.n_users for r in funnel_counts(ev, steps).collect()}
    assert counts == {1: 4, 2: 3, 3: 1}


def test_cohort_retention_offsets(spark):
    from crawl4ai_scraper_spark.operators.funnel import cohort_retention

    T = _ts
    ev = spark.createDataFrame(
        [
            # u1 first seen Jan 1, returns Jan 1 (twice: distinct) and Jan 3
            (1, "view", T("2024-01-01 10:00:00")),
            (1, "view", T("2024-01-01 23:00:00")),
            (1, "view", T("2024-01-03 10:00:00")),
            # u2 first seen Jan 1 only
            (2, "view", T("2024-01-01 08:00:00")),
            # u3 first seen Jan 2, returns Jan 3
            (3, "view", T("2024-01-02 08:00:00")),
            (3, "view", T("2024-01-03 08:00:00")),
        ],
        ["user_id", "event_type", "ts"],
    )
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # u1, u2 on their first day
        ("2024-01-01", 2): 1,  # u1 back on Jan 3
        ("2024-01-02", 0): 1,  # u3 cohort
        ("2024-01-02", 1): 1,  # u3 back on Jan 3
    }


def test_event_transitions_ordering_and_ties(spark):
    from crawl4ai_scraper_spark.operators.funnel import event_transitions

    T = _ts
    ev = spark.createDataFrame(
        [
            # u1: a→b→a; tie at 11:00 broken by event_id (2 before 3)
            (1, 1, "a", T("2024-01-01 10:00:00")),
            (2, 1, "b", T("2024-01-01 11:00:00")),
            (3, 1, "a", T("2024-01-01 11:00:00")),
            # u2: single event → no transitions
            (4, 2, "a", T("2024-01-01 10:00:00")),
            # u3: b→b self-transition
            (5, 3, "b", T("2024-01-01 10:00:00")),
            (6, 3, "b", T("2024-01-01 10:30:00")),
        ],
        ["event_id", "user_id", "event_type", "ts"],
    )
    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transitions(ev).collect()
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_daily_zscores_exact_moments(spark):
    import math

    from crawl4ai_scraper_spark.operators.funnel import daily_volume_zscores

    T = _ts
    # type 'x': daily counts 1, 2, 3 → mean 2, var 1, zscores -1, 0, 1
    rows, eid = [], 0
    for day, k in [("01", 1), ("02", 2), ("03", 3)]:
        for _ in range(k):
            eid += 1
            rows.append((eid, 1, "x", T(f"2024-01-{day} 10:00:00")))
    # type 'y': one day only → zscore NULL (no variance)
    rows.append((99, 1, "y", T("2024-01-01 10:00:00")))
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])
    got = {
        (r.event_type, r.day): (r.n, r.mean_daily, r.zscore)
        for r in daily_volume_zscores(ev).collect()
    }
    assert got[("x", "2024-01-01")] == (1, 2.0, -1.0)
    assert got[("x", "2024-01-02")] == (2, 2.0, 0.0)
    assert got[("x", "2024-01-03")] == (3, 2.0, 1.0)
    assert got[("y", "2024-01-01")][2] is None


def test_search_cli_smoke():
    """The user-facing search tool: real subprocess, JSONL contract."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "search_corpus.py"),
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--phrase", "hash value", "--k", "3", "--master", "local[2]"],
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    hits = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert 1 <= len(hits) <= 3
    assert all(set(h) == {"doc_id", "n_occurrences"} for h in hits)


def test_triangle_counts_k5_and_input_hygiene(spark):
    from itertools import combinations

    from crawl4ai_scraper_spark.operators.graph import triangle_counts

    # K5: every vertex sits in C(4,2) = 6 triangles. Feed the operator
    # dirty input: both directions, duplicates, and a self-loop.
    edges = [(a, b) for a, b in combinations(range(5), 2)]
    dirty = edges + [(b, a) for a, b in edges] + edges[:3] + [(2, 2)]
    df = spark.createDataFrame(dirty, ["src", "dst"])
    got = {r.id: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {i: 6 for i in range(5)}
    # a pendant edge joins no triangle and yields no row
    df2 = spark.createDataFrame(edges + [(4, 99)], ["src", "dst"])
    got2 = {r.id: r.n_triangles for r in triangle_counts(df2).collect()}
    assert 99 not in got2 and got2[4] == 6


def test_triangle_counts_matches_bruteforce_on_hub_graph(spark):
    from crawl4ai_scraper_spark.operators.graph import triangle_counts

    # ring + chords + hub (the contract topology, smaller): brute force in
    # python over the same edge set
    edges = (
        [(i, i + 1) for i in range(40)]
        + [(i, i + 2) for i in range(0, 39, 2)]
        + [(0, j) for j in range(10, 41, 10)]
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in [x for x in adj[a] if x > a]:
            for c in [x for x in adj[a] if x > b]:
                if c in adj[b]:
                    for v in (a, b, c):
                        expect[v] = expect.get(v, 0) + 1
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expect


def test_session_paths_ordering_and_gap_split(spark):
    from crawl4ai_scraper_spark.operators.funnel import (
        session_paths,
        top_session_paths,
    )

    T = _ts
    ev = spark.createDataFrame(
        [
            # u1 session 1: a>b (tie at 10:05 broken by event_id: b then c?
            # no — b(id=2) before c(id=3))
            (1, 1, "a", T("2024-01-01 10:00:00")),
            (2, 1, "b", T("2024-01-01 10:05:00")),
            (3, 1, "c", T("2024-01-01 10:05:00")),
            # >30 min gap → u1 session 2: a>b again
            (4, 1, "a", T("2024-01-01 12:00:00")),
            (5, 1, "b", T("2024-01-01 12:10:00")),
            # u2: single-event session
            (6, 2, "a", T("2024-01-01 10:00:00")),
        ],
        ["event_id", "user_id", "event_type", "ts"],
    )
    got = sorted(r.path for r in session_paths(ev).collect())
    assert got == ["a", "a>b", "a>b>c"]
    top = [(r.path, r.n_sessions) for r in top_session_paths(ev, k=10).collect()]
    # counts all 1 → alphabetical tiebreak
    assert top == [("a", 1), ("a>b", 1), ("a>b>c", 1)]


# ---------------------------------------------------------------------------
# consolidated plan gates for the session-3 operators
# ---------------------------------------------------------------------------


def test_round3_session3_plan_shapes(spark):
    """One sweep over the new contract queries' physical plans: the shapes
    the docstrings promise are the shapes Catalyst actually picks."""
    from crawl4ai_scraper_spark import contract

    sf = "/root/testdata/sf0.001"
    qs = contract.queries()

    def plan(name):
        return qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()

    for name in [
        "event_funnel_counts", "cohort_retention_daily",
        "event_transition_matrix", "daily_volume_zscores",
        "graph_triangle_counts", "session_top_paths",
        "inverted_index_postings", "export_shard_manifest",
    ]:
        assert "CartesianProduct" not in plan(name), name

    # funnel: chained joins + aggregates, never a per-user ordered window
    p = plan("event_funnel_counts")
    assert "Window" not in p
    # cohort: two aggregates + join, no window either
    assert "Window" not in plan("cohort_retention_daily")
    # z-scores: the per-type stats frame comes back as a broadcast join
    p = plan("daily_volume_zscores")
    assert "BroadcastHashJoin" in p and "Window" not in p
    # transitions: the ONLY window partitions by user (bounded lists)
    p = plan("event_transition_matrix")
    assert "Window" in p and "partitionBy" not in p  # sanity: physical node
    # triangles: equi-joins only
    p = plan("graph_triangle_counts")
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p)
    assert "BroadcastNestedLoopJoin" not in p
    # journeys: top-k is TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan("session_top_paths")


def test_feature_hash_vectors_properties(spark):
    from crawl4ai_scraper_spark.operators.search import feature_hash_vectors

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),
            (2, "alpha"),
            (3, "beta beta"),
            (4, "   "),  # blank doc → no rows
        ],
        ["doc_id", "text"],
    )
    vecs = feature_hash_vectors(docs, dim=16).collect()
    by_doc = {}
    for r in vecs:
        by_doc.setdefault(r.doc_id, {})[r.dim] = r.value
        assert 0 <= r.dim < 16 and r.value != 0
    assert 4 not in by_doc
    # determinism + linearity: doc1 = 2*('alpha' vec) + 1*('beta' vec)
    a = by_doc[2]  # alpha × 1
    b = {d: v // 2 for d, v in by_doc[3].items()}  # beta × 2 → unit beta
    expect = {}
    for d, v in a.items():
        expect[d] = expect.get(d, 0) + 2 * v
    for d, v in b.items():
        expect[d] = expect.get(d, 0) + v
    assert by_doc[1] == {d: v for d, v in expect.items() if v != 0}


def test_pmi_collocations_exact_math(spark):
    import math

    from crawl4ai_scraper_spark.operators.search import pmi_collocations

    # corpus: "a b" ×4, "a c" ×2 → unigrams a=6, b=4, c=2 (per doc pair);
    # actually craft explicit docs: each doc is one bigram.
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(4)] + [(i + 10, "a c") for i in range(2)],
        ["doc_id", "text"],
    )
    got = {(r.w1, r.w2): (r.n_ab, r.pmi) for r in pmi_collocations(docs, min_count=1).collect()}
    # totals: unigrams N=12 (a=6,b=4,c=2); bigrams NB=6 (ab=4, ac=2)
    def pmi(nab, n1, n2):
        return round(math.log((nab * 12.0 * 12.0) / (6.0 * n1 * n2)), 6)

    assert got[("a", "b")] == (4, pmi(4, 6, 4))
    assert got[("a", "c")] == (2, pmi(2, 6, 2))
    assert set(got) == {("a", "b"), ("a", "c")}
    # min_count prunes pairs but not the probability denominators
    got5 = {(r.w1, r.w2) for r in pmi_collocations(docs, min_count=3).collect()}
    assert got5 == {("a", "b")}


def test_doc_top_keywords_prefers_rare_terms(spark):
    """A term unique to one doc must outrank a corpus-wide term at equal tf,
    and ranks are term-ascending on exact score ties."""
    from crawl4ai_scraper_spark.operators.search import doc_top_keywords

    docs = spark.createDataFrame(
        [
            (1, "common zebra common zebra"),
            (2, "common common apple apple"),
            (3, "common banana banana cherry"),
        ],
        "doc_id int, text string",
    )
    out = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in doc_top_keywords(docs, k=2).collect()
    }
    assert out[(1, 1)] == "zebra"       # df=1 beats df=3 'common' at tf=2
    assert out[(2, 1)] == "apple"
    assert out[(3, 1)] == "banana"      # tf=2 rare term first
    assert out[(3, 2)] == "cherry"      # then tf=1 rare term over 'common'
