"""Session-6 operators: redirect-chain resolution (pointer doubling),
host-graph contraction + weighted rank."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.operators.graph import (
    contract_to_hosts,
    resolve_redirects,
    weighted_pagerank,
)


def test_resolve_redirects_chains_and_cycle(spark):
    # chain 5->4->3->2->1->0 (terminal), short chain 10->0, 2-cycle 20<->21
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0), (10, 0), (20, 21), (21, 20)],
        "src long, dst long",
    )
    rows = {r["node"]: r for r in resolve_redirects(edges, max_rounds=8).collect()}
    # terminal maps to itself at 0 hops
    assert rows[0]["final_id"] == 0 and rows[0]["hops"] == 0 and rows[0]["resolved"]
    # every chain member lands on the terminal with its exact distance
    for node, hops in ((1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (10, 1)):
        assert rows[node]["final_id"] == 0
        assert rows[node]["hops"] == hops
        assert rows[node]["resolved"] is True
    # the loop never resolves and is flagged for quarantine
    assert rows[20]["resolved"] is False
    assert rows[21]["resolved"] is False


def test_resolve_redirects_log_rounds(spark):
    # a 20-hop chain resolves within ceil(log2(20))=5 doubling rounds
    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 21)], "src long, dst long"
    )
    rows = {r["node"]: r for r in resolve_redirects(edges, max_rounds=5).collect()}
    assert rows[20]["final_id"] == 0 and rows[20]["hops"] == 20 and rows[20]["resolved"]
    # but NOT within 2 rounds (pointer doubling reaches 2^2=4... actually
    # after k rounds a pointer has compressed up to 2^k hops; 2 rounds < 20)
    short = {r["node"]: r for r in resolve_redirects(edges, max_rounds=2).collect()}
    assert short[20]["resolved"] is False


def test_contract_to_hosts_weights_and_self_loop_drop(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (4, 5)], "src long, dst long"
    )
    hosts = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c")], "node long, host string"
    )
    he = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in contract_to_hosts(edges, hosts).collect()
    }
    # 1->2 is intra-host (a->a): dropped; 4->5 intra-host (c->c): dropped
    assert ("a", "a") not in he and ("c", "c") not in he
    assert he[("a", "b")] == 2  # 1->3 and 2->3 collapse
    assert he[("b", "a")] == 1


def test_weighted_pagerank_weight_proportional(spark):
    # a sends 3/4 of its damped rank to b, 1/4 to c
    he = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src string, dst string, weight long"
    )
    r = {row["id"]: row["rank"] for row in weighted_pagerank(he, n_iter=1).collect()}
    n = 3
    tele = round(0.15 / n, 12)
    base = round(1.0 / n, 12)
    assert r["a"] == pytest.approx(tele, abs=1e-12)
    assert r["b"] == pytest.approx(tele + round(0.85 * base * 3 / 4, 12), abs=1e-12)
    assert r["c"] == pytest.approx(tele + round(0.85 * base * 1 / 4, 12), abs=1e-12)


def test_weighted_pagerank_rank_conservation(spark):
    # no dangling nodes -> total rank stays 1 across iterations
    he = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 5), ("b", "a", 3)],
        "src string, dst string, weight long",
    )
    total = (
        weighted_pagerank(he, n_iter=3)
        .agg(F.sum("rank").alias("s"))
        .collect()[0]["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


# --- Gram / PCA / JL projection ---------------------------------------------------

def _rand_emb(spark, n=120, d=16, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    # plant strong variance along two directions so PCA has a clear answer
    x[:, 0] *= 6.0
    x[:, 1] *= 3.0
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return x, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    from crawl4ai_scraper_spark.operators.similarity import gram_matrix

    x, emb = _rand_emb(spark)
    g = np.zeros((16, 16))
    for r in gram_matrix(emb, dim=16).collect():
        g[r["i"], r["j"]] = r["g"]
    # float32 storage truncates the inputs; compare against float32-cast numpy
    x32 = x.astype("float32").astype("float64")
    assert np.allclose(g, x32.T @ x32, atol=1e-6)


def test_gram_fast_matches_exact(spark):
    import numpy as np

    from crawl4ai_scraper_spark.operators.similarity import (
        gram_matrix,
        gram_matrix_fast,
    )

    _, emb = _rand_emb(spark)
    exact = {(r["i"], r["j"]): r["g"] for r in gram_matrix(emb, dim=16).collect()}
    fast = {(r["i"], r["j"]): r["g"] for r in gram_matrix_fast(emb).collect()}
    assert set(exact) == set(fast)
    for k in exact:
        assert np.isclose(exact[k], fast[k], atol=1e-8)


def test_pca_recovers_planted_directions(spark):
    import numpy as np

    from crawl4ai_scraper_spark.operators.similarity import (
        gram_matrix,
        pca_components,
        pca_project,
    )

    x, emb = _rand_emb(spark, n=400)
    comps = pca_components(gram_matrix(emb, dim=16), dim=16, k=2)
    # top component aligns with axis 0 (variance 36), second with axis 1 (9)
    assert abs(comps[0][0]) > 0.95
    assert abs(comps[1][1]) > 0.95
    # deterministic sign convention: largest-|entry| positive
    assert comps[0][int(np.argmax(np.abs(comps[0])))] > 0
    # projection matches the driver-side matrix product
    rows = pca_project(emb, comps).select("vec_id", "pca").collect()
    c = np.array(comps)
    x32 = x.astype("float32").astype("float64")
    for r in rows[:20]:
        expect = c @ x32[r["vec_id"]]
        assert np.allclose(np.array(r["pca"]), expect, atol=1e-5)


def test_jl_projection_shape_and_distance_preservation(spark):
    import numpy as np

    from crawl4ai_scraper_spark.operators.similarity import jl_project

    x, emb = _rand_emb(spark, n=60, d=16)
    proj = jl_project(emb, out_dim=8).collect()
    assert len(proj) == 60 * 8
    p = np.zeros((60, 8))
    for r in proj:
        p[r["id"], r["t"]] = r["proj"]
    # sparse JL with s=3: E[||Pv||^2] = (d_out/3)·||v||^2 — check the
    # corpus-level ratio is in a loose band (it's a randomized embedding)
    x32 = x.astype("float32").astype("float64")
    ratio = (p ** 2).sum() / ((x32 ** 2).sum() * (8 / 3.0))
    assert 0.5 < ratio < 2.0


# --- language-ID eval + tokenizer fertility -------------------------------------

def test_lang_confusion_counts(spark):
    from crawl4ai_scraper_spark.operators.textops import lang_confusion

    docs = spark.createDataFrame(
        [
            (0, "en", "the of and to a in is it"),       # clearly en
            (1, "en", "der die und das ist nicht"),      # mislabeled -> de
            (2, "de", "der die und das ist nicht"),      # clearly de
            (3, "fr", "zzz qqq xxx"),                    # no stopwords -> und
        ],
        "doc_id long, lang string, text string",
    )
    m = {(r["lang"], r["lang_pred"]): r["n"] for r in lang_confusion(docs).collect()}
    assert m[("en", "en")] == 1
    assert m[("en", "de")] == 1
    assert m[("de", "de")] == 1
    assert m[("fr", "und")] == 1


def test_tokenizer_fertility_hand_computed(spark):
    from crawl4ai_scraper_spark.operators.bpe import tokenizer_fertility

    # fabricate bpe_segment output directly: fertility = sum pieces / sum words
    seg = spark.createDataFrame(
        [(0, 4, 8), (1, 2, 2), (2, 10, 15)],
        "id long, n_words long, n_pieces long",
    )
    docs = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "de")], "doc_id long, lang string"
    )
    rows = {r["lang"]: r for r in tokenizer_fertility(seg, docs).collect()}
    assert rows["en"]["n_words"] == 6 and rows["en"]["n_pieces"] == 10
    assert rows["en"]["fertility"] == pytest.approx(10 / 6, abs=1e-6)
    assert rows["de"]["fertility"] == 1.5


# --- winnowing + mirror detection -------------------------------------------------

def test_winnowing_guarantee_and_density(spark):
    from crawl4ai_scraper_spark.operators.dedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1 guarantee
    docs = spark.createDataFrame(
        [
            (0, f"xx yy {shared} zz ww uu vv"),
            (1, f"{shared} aa bb cc dd ee ff gg"),
            (2, "totally different words here with nothing in common at all"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "text", "doc_id", k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    # any shared substring of >= w+k-1 tokens must share >= 1 fingerprint
    assert by_doc[0] & by_doc[1]
    assert not (by_doc[0] & by_doc[2])
    # density: far fewer fingerprints than grams (expected ~2/(w+1))
    n_grams_doc1 = 14 - 3 + 1
    assert len(by_doc[1]) < n_grams_doc1


def test_winnowing_short_doc_below_guarantee_empty(spark):
    from crawl4ai_scraper_spark.operators.dedup import winnowing_fingerprints

    docs = spark.createDataFrame(
        [(0, "one two three four five")],  # 5 tokens -> 3 grams < w=4 windows
        "doc_id long, text string",
    )
    assert winnowing_fingerprints(docs, "text", "doc_id", k=3, w=4).count() == 0


def test_mirror_host_pairs_planted_and_skew_guard(spark):
    from crawl4ai_scraper_spark.operators.dedup import mirror_host_pairs

    rows = []
    # host a: 4 unique texts; host b mirrors 3 of them; host c unrelated
    for i in range(4):
        rows.append(("a", f"text number {i} lorem ipsum"))
    for i in range(3):
        rows.append(("b", f"text number {i} lorem ipsum"))
    rows.append(("b", "own text of b"))
    rows.append(("c", "unrelated text on c"))
    # universal boilerplate on 10 hosts -> must be dropped by the skew guard
    for h in range(10):
        rows.append((f"bp{h}", "cookie banner boilerplate"))
    docs = spark.createDataFrame(rows, "host string, text string")
    out = {(r["host_a"], r["host_b"]): r for r in
           mirror_host_pairs(docs, host_col="host", max_hosts_per_hash=8).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r["shared"] == 3
    assert r["containment"] == pytest.approx(3 / 4, abs=1e-9)  # min(4,4)=4 texts each


# --- fuzzy decontamination + mojibake ---------------------------------------------

def test_fuzzy_decontaminate_catches_paraphrase_not_exact(spark):
    from crawl4ai_scraper_spark.operators.dedup import fuzzy_decontaminate

    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays on and the crowd cheers loudly tonight")
    evals = spark.createDataFrame([(0, base)], "eval_id long, text string")
    train = spark.createDataFrame(
        [
            (100, base),                      # verbatim leak
            (101, base[10:]),                 # paraphrased leak (prefix cut)
            (102, "completely unrelated content about spark dataframes and "
                  "parquet files with nothing shared at all here"),
        ],
        "id long, text string",
    )
    hits = {(r["id"], r["eval_id"]): r["jaccard"]
            for r in fuzzy_decontaminate(train, evals, id_col="id").collect()}
    assert hits[(100, 0)] == 1.0
    assert (101, 0) in hits and hits[(101, 0)] >= 0.5
    assert all(i != 102 for i, _ in hits)


def test_mojibake_stats_counts(spark):
    from crawl4ai_scraper_spark.operators.textops import mojibake_stats

    docs = spark.createDataFrame(
        [
            (0, "clean ascii text"),
            (1, "damaged Ã¤ text â€” twice â€œquotedâ€"),
            (2, "repl � char"),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in mojibake_stats(docs).collect()}
    assert rows[0]["n_bad"] == 0 and rows[0]["is_clean"] is True
    # doc 1: one Ã, three â€ (leaders of —, “, ”) -> 1 + 3 = 4
    assert rows[1]["n_bad"] == 4 and rows[1]["is_clean"] is False
    assert rows[2]["n_bad"] == 1
    assert rows[2]["bad_ratio"] == pytest.approx(1 / len("repl � char"), abs=1e-6)


# --- corpus distribution health + skew diagnostics --------------------------------

def test_length_powerlaw_fit_known_alpha(spark):
    import math

    from crawl4ai_scraper_spark.operators.stats import length_powerlaw_fit

    # lengths 50..149 uniform-ish; verify against the closed-form MLE
    lens = [50 + i for i in range(100)]
    docs = spark.createDataFrame([(i, l) for i, l in enumerate(lens)],
                                 "doc_id long, n_chars long")
    r = length_powerlaw_fit(docs, x_min=50).collect()[0]
    expect = 1.0 + len(lens) / sum(round(math.log(l / 50.0), 12) for l in lens)
    assert r["n"] == 100
    assert r["alpha"] == pytest.approx(expect, abs=1e-6)
    # docs below x_min are excluded
    docs2 = docs.union(spark.createDataFrame([(999, 10)], "doc_id long, n_chars long"))
    assert length_powerlaw_fit(docs2, x_min=50).collect()[0]["n"] == 100


def test_zipf_fit_planted_slope(spark):
    from crawl4ai_scraper_spark.operators.stats import zipf_fit

    # plant counts c(r) = 1000/r for ranks 1..20 -> slope ~ -1
    rows = []
    for r in range(1, 21):
        tok = f"tok{r:02d}"
        rows.extend([(len(rows) + i, tok) for i in range(1000 // r)])
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    out = zipf_fit(docs, top_n=20).collect()[0]
    assert out["n_points"] == 20
    assert out["slope"] == pytest.approx(-1.0, abs=0.05)


def test_skew_report_hand_computed(spark):
    from crawl4ai_scraper_spark.operators.stats import skew_report

    # keys: a->6 rows, b->2, c->2 => top_share 0.6
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, "k").collect()[0]
    assert r["n_keys"] == 3 and r["n_rows"] == 10
    assert r["top_key"] == "a" and r["top_share"] == pytest.approx(0.6)
    # gini: counts sorted asc [2,2,6] (b,c by key asc), i*c = 1*2+2*2+3*6=24
    # G = 2*24/(3*10) - 4/3 = 1.6 - 1.3333 = 0.266667
    assert r["gini"] == pytest.approx(0.266667, abs=1e-6)
    # uniform distribution -> gini ~ 0
    uni = spark.createDataFrame([("x",), ("y",), ("z",)], "k string")
    assert skew_report(uni, "k").collect()[0]["gini"] == pytest.approx(0.0, abs=1e-9)


# --- multiprobe IVF + SCD2 + degree stats ------------------------------------------

def test_ivf_multiprobe_superset_of_single_probe(spark):
    from pyspark.sql import functions as F

    from crawl4ai_scraper_spark.operators.similarity import (
        ivf_multiprobe_topk,
        ivf_topk_assigned,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    single = {(r["query_id"], r["neighbor_id"]) for r in
              ivf_topk_assigned(emb, n_queries=5, k=600).collect()}
    multi = {(r["query_id"], r["neighbor_id"]) for r in
             ivf_multiprobe_topk(emb, n_queries=5, k=600, n_probe=2).collect()}
    # with k large enough to not truncate, probe-2 candidates ⊇ probe-1
    assert single <= multi
    assert len(multi) > len(single)
    # p=1 multiprobe degenerates to the single-probe search exactly
    p1 = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in
          ivf_multiprobe_topk(emb, n_queries=5, k=50, n_probe=1).collect()}
    s1 = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in
          ivf_topk_assigned(emb, n_queries=5, k=50).collect()}
    assert p1 == s1


def test_scd2_history_intervals(spark):
    from crawl4ai_scraper_spark.operators.temporal import scd2_history

    revs = spark.createDataFrame(
        [("u1", 100, 1), ("u1", 200, 2), ("u1", 300, 3), ("u2", 50, 4)],
        "url_key string, warc_ts long, doc_id long",
    )
    rows = {r["doc_id"]: r for r in
            scd2_history(revs, "url_key", "warc_ts", "doc_id").collect()}
    assert rows[1]["valid_from"] == 100 and rows[1]["valid_to"] == 200
    assert rows[2]["valid_to"] == 300 and rows[2]["is_current"] is False
    assert rows[3]["valid_to"] is None and rows[3]["is_current"] is True
    assert rows[4]["is_current"] is True  # sole revision of u2
    # point-in-time lookup: at t=250 u1 served revision 2
    import pyspark.sql.functions as F
    hist = scd2_history(revs, "url_key", "warc_ts", "doc_id")
    at250 = hist.filter((F.col("url_key") == "u1") & (F.col("valid_from") <= 250)
                        & ((F.col("valid_to") > 250) | F.col("valid_to").isNull()))
    assert [r["doc_id"] for r in at250.collect()] == [2]


def test_degree_stats_hand_computed(spark):
    from crawl4ai_scraper_spark.operators.graph import degree_stats

    # a->b, a->c, b->a  => 3 edges, 3 nodes, reciprocity: a->b & b->a = 2/3
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "src string, dst string"
    )
    r = degree_stats(edges).collect()[0]
    assert r["n_nodes"] == 3 and r["n_edges"] == 3
    assert r["max_outdeg"] == 2 and r["max_indeg"] == 1
    assert r["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)


def test_index_hygiene_export_gate(spark):
    from crawl4ai_scraper_spark.operators.webmeta import exportable_pages, index_hygiene

    def _pg(canon=None, robots=None):
        head = ""
        if canon:
            head += f'<link rel="canonical" href="{canon}">'
        if robots:
            head += f'<meta name="robots" content="{robots}">'
        return f"<html><head>{head}</head><body><p>c</p></body></html>".encode()

    pages = spark.createDataFrame(
        [
            ("https://a.example/real", _pg()),
            ("https://a.example/dup", _pg(canon="/real")),
            ("https://a.example/secret", _pg(robots="noindex")),
            ("https://a.example/ok", _pg()),
        ],
        "url string, html binary",
    )
    h = {r["url"]: r for r in index_hygiene(pages).collect()}
    assert h["https://a.example/dup"]["is_survivor"] is False
    assert h["https://a.example/secret"]["indexable"] is False
    exp = {r["url"] for r in exportable_pages(pages).collect()}
    assert exp == {"https://a.example/real", "https://a.example/ok"}


def test_script_stats_counts_and_dominant(spark):
    from crawl4ai_scraper_spark.operators.textops import script_stats

    docs = spark.createDataFrame(
        [
            (0, "plain latin text"),
            (1, "пример текста"),          # Cyrillic
            (2, "漢字テキスト"),            # Han + Katakana (kana not counted)
            (3, "نص عربي"),               # Arabic
            (4, "mixed пример"),           # latin 5 vs cyrillic 6 -> cyrillic
            (5, "12345 ... !!!"),          # no scripted chars
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in script_stats(docs).collect()}
    assert rows[0]["script"] == "latin" and rows[0]["n_latin"] == len("plainlatintext")
    assert rows[1]["script"] == "cyrillic" and rows[1]["n_latin"] == 0
    assert rows[2]["script"] == "han" and rows[2]["n_han"] == 2
    assert rows[3]["script"] == "arabic"
    assert rows[4]["script"] == "cyrillic"  # 6 cyr > 5 lat
    assert rows[5]["script"] == "none"


def test_extract_tables_grid_and_malformed(spark):
    from crawl4ai_scraper_spark.operators.webmeta import extract_tables

    html_a = (b"<html><body><table><tr><th>name</th><th>price</th></tr>"
              b"<tr><td>widget</td><td>9.99</td></tr>"
              b"<tr><td>gadget</td><td>19.99</td></tr></table></body></html>")
    # malformed: unclosed td/table; entity in cell
    html_b = b"<table><tr><td>a &amp; b<td>c</table>"
    pages = spark.createDataFrame(
        [("https://s.example/a", html_a), ("https://s.example/b", html_b)],
        "url string, html binary",
    )
    rows = extract_tables(pages).collect()
    a = sorted([r for r in rows if r["url"].endswith("/a")],
               key=lambda r: (r["table_idx"], r["row_idx"]))
    assert [r["cells"] for r in a] == [["name", "price"], ["widget", "9.99"],
                                       ["gadget", "19.99"]]
    b = [r for r in rows if r["url"].endswith("/b")]
    assert len(b) == 1 and b[0]["cells"] == ["a & b", "c"]
