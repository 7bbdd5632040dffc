"""Session-8 operators: host-scoped boilerplate stripping (operators/dedup.py)
and URL template mining for trap detection (operators/webmeta.py)."""

import pytest

from crawl4ai_scraper_spark.operators.dedup import host_boilerplate_strip
from crawl4ai_scraper_spark.operators.webmeta import url_path_templates

BANNER = "accept all cookies"  # one aligned 3-word segment


@pytest.fixture(scope="module")
def corpus(spark):
    # host a: 4 docs, all opening with the banner segment; unique 3-word tails
    rows = [
        (i, "a", f"{BANNER} unique tail {i}") for i in range(4)
    ] + [
        # host b: ONE doc with the same banner words — below any threshold
        (10, "b", f"{BANNER} body text here"),
        (11, "b", "other content entirely distinct words"),
        # host a: a doc that is nothing but the banner
        (5, "a", BANNER),
    ]
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_boilerplate_stripped_only_on_flagging_host(spark, corpus):
    out = host_boilerplate_strip(
        corpus, "text", "doc_id", "host", seg_words=3, min_docs=3, ratio_pct=10
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # host a: banner in 5/5 docs ≥ min_docs=3 and ≥10% → stripped
    for i in range(4):
        assert rows[i]["clean_text"] == f"unique tail {i}"
        assert rows[i]["n_kept"] == 1 and rows[i]["n_segments"] == 2
    # host b keeps the banner (only 1/2 docs there contain it)
    assert rows[10]["clean_text"] == f"{BANNER} body text here"
    assert rows[10]["n_kept"] == 2


def test_all_boilerplate_doc_vanishes(spark, corpus):
    out = host_boilerplate_strip(
        corpus, "text", "doc_id", "host", seg_words=3, min_docs=3, ratio_pct=10
    )
    assert 5 not in {r["doc_id"] for r in out.collect()}


def test_min_docs_gate_holds(spark, corpus):
    # min_docs=6 > the 5 banner carriers on host a → nothing stripped anywhere
    out = host_boilerplate_strip(
        corpus, "text", "doc_id", "host", seg_words=3, min_docs=6, ratio_pct=10
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["clean_text"] == f"{BANNER} unique tail 0"
    assert rows[5]["clean_text"] == BANNER


def test_ratio_gate_holds(spark):
    # segment in 2 of 10 docs: passes min_docs=2 but fails a 30% ratio gate
    rows = [(i, "h", f"shared promo line word{i} word{i} word{i}") for i in range(2)]
    rows += [(i, "h", f"solo text {i} pad pad pad") for i in range(2, 10)]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    kept = host_boilerplate_strip(
        df, "text", "doc_id", "host", seg_words=3, min_docs=2, ratio_pct=30
    )
    r0 = {r["doc_id"]: r for r in kept.collect()}[0]
    assert r0["clean_text"].startswith("shared promo line")
    # at 20% the 2/10 segment flags
    strip = host_boilerplate_strip(
        df, "text", "doc_id", "host", seg_words=3, min_docs=2, ratio_pct=20
    )
    s0 = {r["doc_id"]: r for r in strip.collect()}[0]
    assert not s0["clean_text"].startswith("shared promo line")


def _templates(spark, urls, min_urls=2):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        (r["host"], r["template"]): r
    for r in url_path_templates(df, "url", min_urls=min_urls).collect()}


def test_url_template_classes(spark):
    t = _templates(
        spark,
        [
            "https://h.example/post/123",
            "https://h.example/post/456",
            "https://h.example/x/deadbeefcafe1234",
            "https://h.example/a/v2page",
            "https://h.example/about",
        ],
    )
    assert t[("h.example", "/post/{d}")]["n_urls"] == 2
    assert t[("h.example", "/post/{d}")]["trap_suspect"] is True
    assert t[("h.example", "/post/{d}")]["example_url"] == "https://h.example/post/123"
    assert t[("h.example", "/x/{h}")]["n_urls"] == 1
    assert t[("h.example", "/a/{a}")]["n_urls"] == 1
    assert t[("h.example", "/about")]["trap_suspect"] is False


def test_url_template_ignores_query_and_fragment(spark):
    t = _templates(
        spark,
        [
            "https://h.example/post/7?page=9",
            "https://h.example/post/7#frag",
            "https://h.example/post/8/",
        ],
    )
    assert set(t) == {("h.example", "/post/{d}")}
    # three DISTINCT url strings share the template
    assert t[("h.example", "/post/{d}")]["n_urls"] == 3


def test_url_template_host_scoped(spark):
    t = _templates(
        spark,
        ["https://a.example/p/1", "https://b.example/p/2"],
    )
    assert t[("a.example", "/p/{d}")]["n_urls"] == 1
    assert t[("b.example", "/p/{d}")]["n_urls"] == 1


def test_contrastive_pairs_labels(spark):
    from crawl4ai_scraper_spark.operators.dedup import (
        contrastive_pairs,
        ngram_jaccard,
    )
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1 → excluded (j = 1 ≥ pos_hi)
        (3, base + " extra tail words here"),  # near-dup of 1 → pos
        (4, "totally different content about ships and harbors and tides"),
        (5, "ships and harbors appear here with other unrelated words too"),
    ]
    df = spark.createDataFrame(rows, "doc long, text string")
    out = contrastive_pairs(df, "text", "doc").collect()
    labels = {(r["id_a"], r["id_b"]): r["label"] for r in out}
    assert labels.get((1, 3)) == "pos"
    assert (1, 2) not in labels  # exact dup excluded
    # every emitted label agrees with the brute-force jaccard window
    brute = df.alias("a").crossJoin(df.alias("b")).filter(
        F.col("a.doc") < F.col("b.doc")
    ).select(
        F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"),
        ngram_jaccard(F.col("a.text"), F.col("b.text")).alias("j"),
    ).collect()
    jmap = {(r["id_a"], r["id_b"]): r["j"] for r in brute}
    for (a, b), lab in labels.items():
        j = jmap[(a, b)]
        if lab == "pos":
            assert 0.5 <= j < 0.95
        else:
            assert j < 0.2


def test_revision_drift_windows(spark):
    from crawl4ai_scraper_spark.operators.temporal import revision_drift

    rows = [
        ("A", 1, "one two three four five"),
        ("A", 2, "one two three four five six"),
        ("A", 3, "ONE TWO THREE FOUR FIVE SIX"),  # case-only edit
        ("B", 1, "lonely single revision page"),
    ]
    df = spark.createDataFrame(rows, "url string, ts int, text string")
    out = {(r["url"], r["ts_prev"]): r for r in revision_drift(df, "url", "ts", "text").collect()}
    assert set(out) == {("A", 1), ("A", 2)}  # B emits nothing
    r12 = out[("A", 1)]
    assert r12["ts_next"] == 2 and r12["changed"] is True
    assert 0.0 < r12["jaccard"] < 1.0
    # shingles of 5 tokens: 3; of 6 tokens: 4; intersect 3, union 4
    assert r12["jaccard"] == 0.75
    r23 = out[("A", 2)]
    assert r23["jaccard"] == 1.0 and r23["changed"] is False


def test_template_dup_stats_flags_generated_spaces(spark):
    from crawl4ai_scraper_spark.operators.webmeta import template_dup_stats

    rows = [(f"https://h.example/cal/{i}", "same calendar page") for i in range(4)]
    rows += [(f"https://h.example/art/{i}", f"real article {i}") for i in range(3)]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r["template"]: r for r in template_dup_stats(df, "url", "text", min_urls=3).collect()}
    cal = out["/cal/{d}"]
    assert cal["n_urls"] == 4 and cal["n_texts"] == 1
    assert cal["dup_ratio"] == 0.75 and cal["generated_suspect"] is True
    art = out["/art/{d}"]
    assert art["n_urls"] == 3 and art["n_texts"] == 3
    assert art["dup_ratio"] == 0.0 and art["generated_suspect"] is False


def test_politeness_audit(spark):
    from crawl4ai_scraper_spark.plans.politeness import politeness_audit

    rows = [
        # host fast: 0.4s gaps — violates the 1.0 default
        ("fast", 0, 0.0), ("fast", 1, 0.4), ("fast", 2, 0.8),
        # host ok: exactly-1.0 gaps — epsilon keeps it green
        ("ok", 3, 0.0), ("ok", 4, 1.0), ("ok", 5, 2.0),
        # host solo: single visit — NULL min_gap, ok
        ("solo", 6, 0.0),
    ]
    df = spark.createDataFrame(rows, "host string, arrival_rank long, sched_ts double")
    out = {r["host"]: r for r in politeness_audit(df, None, 1.0).collect()}
    assert out["fast"]["violations"] == 2 and out["fast"]["ok"] is False
    assert out["fast"]["min_gap"] == 0.4
    assert out["ok"]["violations"] == 0 and out["ok"]["ok"] is True
    assert out["ok"]["min_gap"] == 1.0 and out["ok"]["span_sec"] == 2.0
    assert out["solo"]["min_gap"] is None and out["solo"]["ok"] is True
    assert out["solo"]["n_visits"] == 1


def test_politeness_audit_uses_host_rules_delay(spark):
    from crawl4ai_scraper_spark.plans.politeness import politeness_audit

    df = spark.createDataFrame(
        [("h", 0, 0.0), ("h", 1, 1.2), ("u", 2, 0.0), ("u", 3, 1.2)],
        "host string, arrival_rank long, sched_ts double",
    )
    rules = spark.createDataFrame([("h", 2.0)], "host string, crawl_delay double")
    out = {r["host"]: r for r in politeness_audit(df, rules, 1.0).collect()}
    # h's robots delay is 2.0 → the 1.2 gap violates; u falls back to 1.0 → fine
    assert out["h"]["crawl_delay"] == 2.0 and out["h"]["violations"] == 1
    assert out["u"]["crawl_delay"] == 1.0 and out["u"]["violations"] == 0


def _naive_quota(spark, df, key, grp, quota, salt):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dig = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key).cast("string"))), 1, 12
    )
    w = Window.partitionBy(grp).orderBy(dig, key)
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )


def test_quota_sample_equals_naive_on_skew(spark):
    from crawl4ai_scraper_spark.operators.textops import quota_sample

    # hot group (200 rows), mid group (30), tiny group (3 < quota)
    rows = [(i, "hot") for i in range(200)]
    rows += [(1000 + i, "mid") for i in range(30)]
    rows += [(2000 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = quota_sample(df, "doc_id", "lang", 5, salt="q1")
    want = _naive_quota(spark, df, "doc_id", "lang", 5, "q1")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    by_grp = {}
    for r in got.collect():
        by_grp.setdefault(r["lang"], []).append(r["sample_rank"])
    assert sorted(by_grp["hot"]) == [1, 2, 3, 4, 5]
    assert sorted(by_grp["tiny"]) == [1, 2, 3]  # n <= quota keeps all


def test_quota_sample_rescue_path_exact(spark):
    from crawl4ai_scraper_spark.operators.textops import quota_sample

    # salt q5 with overshoot=1 makes the screen keep only 3 < quota=5
    # candidates for this exact 200-row group (precomputed) — the rescue
    # union must still produce the exact naive answer.
    df = spark.createDataFrame([(i, "g") for i in range(200)], "doc_id long, lang string")
    got = quota_sample(df, "doc_id", "lang", 5, salt="q5", overshoot=1)
    want = _naive_quota(spark, df, "doc_id", "lang", 5, "q5")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() == 5


def test_quota_sample_deterministic_and_salt_independent(spark):
    from crawl4ai_scraper_spark.operators.textops import quota_sample

    df = spark.createDataFrame([(i, "g") for i in range(100)], "doc_id long, lang string")
    a = sorted(r["doc_id"] for r in quota_sample(df, "doc_id", "lang", 8, salt="qa").collect())
    b = sorted(r["doc_id"] for r in quota_sample(df, "doc_id", "lang", 8, salt="qa").collect())
    c = sorted(r["doc_id"] for r in quota_sample(df, "doc_id", "lang", 8, salt="qb").collect())
    assert a == b
    assert a != c  # different salt, different slice


def _naive_topk(df, key, grp, score, k):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(grp).orderBy(F.col(score).desc(), F.col(key))
    return (
        df.withColumn("topk_rank", F.row_number().over(w))
        .filter(F.col("topk_rank") <= k)
    )


def test_grouped_topk_equals_naive_on_skew(spark):
    from crawl4ai_scraper_spark.operators.textops import grouped_topk

    rows = [(i, "hot", (i * 37) % 101) for i in range(1500)]
    rows += [(10_000 + i, "mid", (i * 13) % 50) for i in range(40)]
    rows += [(20_000 + i, "tiny", i) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, host string, score long")
    got = grouped_topk(df, "doc_id", "host", "score", 7)
    want = _naive_topk(df, "doc_id", "host", "score", 7)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    by = {}
    for r in got.collect():
        by.setdefault(r["host"], []).append(r["topk_rank"])
    assert sorted(by["hot"]) == list(range(1, 8))
    assert sorted(by["tiny"]) == [1, 2, 3]  # n < k keeps all


def test_grouped_topk_exact_across_salts_and_tiny_samples(spark):
    from crawl4ai_scraper_spark.operators.textops import grouped_topk

    # sample_target=2 over 300 rows: the estimator is deliberately starved,
    # so some salts undershoot and exercise the rescue union — every salt
    # must still reproduce the naive answer exactly.
    df = spark.createDataFrame(
        [(i, "g", (i * 7919) % 1000) for i in range(300)],
        "doc_id long, host string, score long",
    )
    want = sorted(map(tuple, _naive_topk(df, "doc_id", "host", "score", 5).collect()))
    for salt in ("s1", "s2", "s3", "s4", "s5"):
        got = grouped_topk(df, "doc_id", "host", "score", 5, salt=salt, sample_target=2)
        assert sorted(map(tuple, got.collect())) == want, salt


def test_grouped_topk_all_ties(spark):
    from crawl4ai_scraper_spark.operators.textops import grouped_topk

    df = spark.createDataFrame(
        [(i, "g", 42) for i in range(50)], "doc_id long, host string, score long"
    )
    got = grouped_topk(df, "doc_id", "host", "score", 5)
    # tie-break by key: the 5 smallest doc_ids win, ranks 1..5
    assert sorted((r["doc_id"], r["topk_rank"]) for r in got.collect()) == [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 5)
    ]


def test_sitemap_coverage_counts(spark):
    from crawl4ai_scraper_spark.plans.politeness import sitemap_coverage

    declared = spark.createDataFrame(
        [("https://a.example/1",), ("https://a.example/2",), ("https://a.example/3",),
         ("https://b.example/x",)],
        "seed_url string",
    )
    visited = spark.createDataFrame(
        [("https://a.example/1",), ("https://a.example/9",), ("https://c.example/z",)],
        "url string",
    )
    out = {r["host"]: r for r in sitemap_coverage(declared, visited).collect()}
    a = out["a.example"]
    assert (a["n_declared"], a["n_visited"], a["n_both"], a["n_missed"], a["n_extra"]) == (3, 2, 1, 2, 1)
    assert abs(a["coverage"] - 0.3333) < 1e-9
    b = out["b.example"]
    assert b["n_declared"] == 1 and b["n_visited"] == 0 and b["coverage"] == 0.0
    c = out["c.example"]
    assert c["n_declared"] == 0 and c["n_extra"] == 1 and c["coverage"] is None


def test_near_dup_threshold_sweep_monotone(spark):
    from crawl4ai_scraper_spark.operators.dedup import near_dup_threshold_sweep

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = " ".join(base.split()[:-1])  # drop one word: j ≈ 0.909, collides
    rows = [(1, base), (2, base), (3, near),
            (4, "completely different words about maritime trade routes here")]
    df = spark.createDataFrame(rows, "doc long, text string")
    out = {r["threshold"]: r for r in
           near_dup_threshold_sweep(df, "text", "doc", [0.3, 0.9, 1.0]).collect()}
    assert set(out) == {0.3, 0.9, 1.0}
    # monotone non-increasing in threshold; exact pair (1,2) survives t=1.0
    assert out[0.3]["n_pairs"] >= out[0.9]["n_pairs"] >= out[1.0]["n_pairs"] >= 1
    assert out[1.0]["n_docs"] == 2
    assert out[0.3]["n_docs"] >= 3


def test_submit_pipeline_boilerplate_and_quota_stages(spark, tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from submit_pipeline import parse_args, run_pipeline

    sw = ["the", "a", "of", "and", "to", "in", "is"]

    def clean_doc(prefix):
        return " ".join(x for i in range(20) for x in (sw[i % 7], f"{prefix}{i}"))

    chrome = "accept cookies banner"
    rows = [
        (i, "h1", f"{chrome} {clean_doc(f'u{i}x')}") for i in range(4)
    ] + [(10 + i, "h2", clean_doc(f"v{i}x")) for i in range(4)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(inp)
    out = str(tmp_path / "clean")

    args = parse_args([
        "--input", inp, "--output", out,
        "--boilerplate-strip", "--boilerplate-min-docs", "3",
        "--skip-near-dup",
        "--quota-per-group", "2", "--quota-group-col", "source",
    ])
    summary = run_pipeline(spark, args)
    assert summary["after_boilerplate_strip"] == 8
    assert summary["after_quota_sample"] == 4  # exactly 2 per host
    kept = spark.read.parquet(out)
    # the h1 chrome is gone from every surviving h1 doc
    h1 = [r["text"] for r in kept.collect() if r["source"] == "h1"]
    assert h1 and all(chrome not in t for t in h1)
    by = {}
    for r in kept.collect():
        by[r["source"]] = by.get(r["source"], 0) + 1
    assert by == {"h1": 2, "h2": 2}


def test_quota_and_topk_property_random_corpora(spark):
    """Hypothesis-style sweep (deterministic seeds, Spark-session-bound):
    screen-then-trim sampling must equal the naive window on arbitrary
    group-size distributions, quotas, and salts."""
    import random

    from crawl4ai_scraper_spark.operators.textops import grouped_topk, quota_sample

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        rows = []
        nid = 0
        for g in range(rng.randint(1, 5)):
            size = rng.choice([1, 2, 5, 40, 300])
            for _ in range(size):
                rows.append((nid, f"g{g}", rng.randint(0, 30)))
                nid += 1
        df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
        k = rng.randint(1, 12)
        salt = f"s{seed}"
        got_q = quota_sample(df, "doc_id", "grp", k, salt=salt)
        want_q = _naive_quota(spark, df, "doc_id", "grp", k, salt)
        assert sorted(map(tuple, got_q.collect())) == sorted(map(tuple, want_q.collect())), (
            "quota", seed)
        got_t = grouped_topk(df, "doc_id", "grp", "score", k, salt=salt, sample_target=8)
        want_t = _naive_topk(df, "doc_id", "grp", "score", k)
        assert sorted(map(tuple, got_t.collect())) == sorted(map(tuple, want_t.collect())), (
            "topk", seed)


def test_corpus_shuffle_pack_is_exact_permutation_layout(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.packing import corpus_shuffle_pack

    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(200)], "doc_id long, text string"
    )
    tc = F.size(F.split(F.trim("text"), "\\s+"))
    out = corpus_shuffle_pack(df, "doc_id", tc, seq_len=16, salt="sA")
    naive = (
        df.select("doc_id", tc.cast("long").alias("n_tokens"))
        .withColumn(
            "shuffle_key",
            F.conv(F.substring(F.md5(F.concat(F.lit("sA:"), F.col("doc_id").cast("string"))), 1, 12), 16, 10).cast("bigint"),
        )
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tokens").over(
                    Window.orderBy("shuffle_key", "doc_id")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    got = {r["doc_id"]: (r["cum_before"], r["seq_id"], r["offset_in_seq"]) for r in out.collect()}
    want = {r["doc_id"]: r["cum_before"] for r in naive.collect()}
    assert len(got) == 200
    for d, cb in want.items():
        assert got[d] == (cb, cb // 16, cb % 16), d
    # different salt = genuinely different order
    out_b = corpus_shuffle_pack(df, "doc_id", tc, seq_len=16, salt="sB")
    got_b = {r["doc_id"]: r["cum_before"] for r in out_b.collect()}
    assert got_b != {d: v[0] for d, v in got.items()}
    # same salt = identical layout (no RNG state anywhere)
    out_a2 = corpus_shuffle_pack(df, "doc_id", tc, seq_len=16, salt="sA")
    assert {r["doc_id"]: r["cum_before"] for r in out_a2.collect()} == want


def test_pack_token_ids_shuffled_order(spark):
    import hashlib

    from crawl4ai_scraper_spark.operators.packing import (
        pack_token_ids,
        packed_sequences,
    )

    # doc i carries tokens [i*10, i*10+1]; one big sequence captures the order
    rows = [(i, [i * 10, i * 10 + 1]) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    packed = pack_token_ids(df, "doc_id", "token_ids", seq_len=12,
                            shuffle_salt="sX")
    seq = packed_sequences(packed, "doc_id", 12).collect()
    assert len(seq) == 1 and seq[0]["n_docs"] == 6
    got = seq[0]["token_ids"]
    order = sorted(range(6), key=lambda i: (
        hashlib.md5(f"sX:{i}".encode()).hexdigest()[:12], i))
    want = [t for i in order for t in (i * 10, i * 10 + 1)]
    assert got == want
    # id-order layout differs (unless the digest order happens to be 0..5)
    plain = packed_sequences(
        pack_token_ids(df, "doc_id", "token_ids", seq_len=12), "doc_id", 12
    ).collect()[0]["token_ids"]
    assert plain == [t for i in range(6) for t in (i * 10, i * 10 + 1)]
    assert got != plain


def test_curriculum_shuffle_pack_band_major(spark):
    import hashlib

    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.packing import curriculum_shuffle_pack

    # bands: docs 0-2 -> band 0, docs 3-5 -> band 1; 2 tokens each
    rows = [(i, 2, i // 3) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, nt long, band long")
    out = curriculum_shuffle_pack(
        df, "doc_id", F.col("nt"), F.col("band"), seq_len=4, salt="cuT"
    ).collect()
    got = {r["doc_id"]: r for r in out}
    # every band-0 doc packs strictly before every band-1 doc
    max0 = max(got[i]["cum_before"] for i in range(3))
    min1 = min(got[i]["cum_before"] for i in range(3, 6))
    assert max0 < min1
    # within a band the order is the md5 digest order
    def dig(i):
        return hashlib.md5(f"cuT:{i}".encode()).hexdigest()[:12]
    order0 = sorted(range(3), key=lambda i: (dig(i), i))
    cums0 = [got[i]["cum_before"] for i in order0]
    assert cums0 == sorted(cums0)
    # layout is gapless: cum_before values are 0,2,4,...,10
    assert sorted(r["cum_before"] for r in out) == [0, 2, 4, 6, 8, 10]


def test_layout_adjacency_stats_discriminates_orders(spark):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.packing import (
        corpus_shuffle_pack,
        layout_adjacency_stats,
        sequence_pack,
    )

    # 4 hosts × 25 docs, ids grouped by host → id order IS host-grouped
    rows = [(h * 100 + i, f"h{h}", 3) for h in range(4) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, host string, nt long")
    grouped = layout_adjacency_stats(
        sequence_pack(df, "doc_id", F.col("nt"), seq_len=16),
        df.select("doc_id", "host"), "doc_id", "host", "grouped",
    ).collect()[0]
    shuffled = layout_adjacency_stats(
        corpus_shuffle_pack(df, "doc_id", F.col("nt"), seq_len=16, salt="sL"),
        df.select("doc_id", "host"), "doc_id", "host", "shuffled",
    ).collect()[0]
    assert grouped["n_pairs"] == 99 and shuffled["n_pairs"] == 99
    # grouped: only 3 host boundaries → 96/99 same-host
    assert grouped["n_same"] == 96
    # shuffle destroys host runs: same-host adjacency ≈ 1/4, far below
    assert shuffled["n_same"] < 50
    assert shuffled["same_ratio"] < grouped["same_ratio"]


def test_politeness_audit_renamed_rule_columns(spark):
    from crawl4ai_scraper_spark.plans.politeness import politeness_audit

    df = spark.createDataFrame(
        [("h", 0, 0.0), ("h", 1, 1.2), ("u", 2, 0.0), ("u", 3, 1.2)],
        "host string, arrival_rank long, sched_ts double",
    )
    rules = spark.createDataFrame(
        [("h", 2.0)], "rule_host string, delay_sec double"
    )
    out = {
        r["host"]: r
        for r in politeness_audit(
            df, rules, 1.0,
            rules_host_col="rule_host", rules_delay_col="delay_sec",
        ).collect()
    }
    assert out["h"]["crawl_delay"] == 2.0 and out["h"]["violations"] == 1
    assert out["u"]["crawl_delay"] == 1.0 and out["u"]["violations"] == 0


def test_curriculum_shuffle_pack_rejects_bad_band(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.packing import curriculum_shuffle_pack

    df = spark.createDataFrame(
        [(0, 2, -1), (1, 2, 0)], "doc_id long, nt long, band long"
    )
    with pytest.raises(Exception) as ei:
        curriculum_shuffle_pack(
            df, "doc_id", F.col("nt"), F.col("band"), seq_len=4, salt="cuB"
        ).collect()
    assert "quality_band out of [0, 32768)" in str(ei.value)

    big = spark.createDataFrame(
        [(0, 2, 32768)], "doc_id long, nt long, band long"
    )
    with pytest.raises(Exception):
        curriculum_shuffle_pack(
            big, "doc_id", F.col("nt"), F.col("band"), seq_len=4, salt="cuB"
        ).collect()


def test_layout_adjacency_stats_empty_layout(spark):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.packing import (
        layout_adjacency_stats,
        sequence_pack,
    )

    # one nonzero-token doc → zero adjacent pairs → explicit 0-count row
    df = spark.createDataFrame([(1, "h", 3)], "doc_id long, host string, nt long")
    row = layout_adjacency_stats(
        sequence_pack(df, "doc_id", F.col("nt"), seq_len=16),
        df.select("doc_id", "host"), "doc_id", "host", "solo",
    ).collect()[0]
    assert row["n_pairs"] == 0 and row["n_same"] == 0
    assert row["same_ratio"] is None and row["layout"] == "solo"
