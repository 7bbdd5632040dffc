"""Kernel tests for the session-5 operators: OPIC cash propagation,
in-engine logistic-regression training, and content-defined chunking."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


# --- OPIC --------------------------------------------------------------------

def _opic_python(edges, n_iter):
    """Sequential oracle with the same 12dp rounding contract."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    cash = {v: round(1.0 / n, 12) for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for _ in range(n_iter):
        dangling = sum(cash[v] for v in nodes if v not in outdeg)
        share = round(dangling / n, 12)
        nxt = {v: 0.0 for v in nodes}
        for u, v in edges:
            nxt[v] += round(cash[u] / outdeg[u], 12)
        for v in nodes:
            hist[v] = round(hist[v] + cash[v], 12)
            cash[v] = round(nxt[v] + share, 12)
    return {v: (cash[v], hist[v]) for v in nodes}


def test_opic_step_matches_python_oracle_and_conserves_cash(spark):
    from crawl4ai_scraper_spark.operators.graph import opic_step

    #   1 → 2 → 3 (dangling), 1 → 3, 4 isolated-as-dangling-target of 3? no:
    # build: chain with a dangling sink and a second component
    edges = [(1, 2), (1, 3), (2, 3), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    for n_iter in (1, 3):
        got = {r["id"]: (r["cash"], r["history"]) for r in opic_step(df, n_iter=n_iter).collect()}
        want = _opic_python(edges, n_iter)
        assert set(got) == set(want)
        for v in want:
            assert math.isclose(got[v][0], want[v][0], abs_tol=1e-9), (n_iter, v)
            assert math.isclose(got[v][1], want[v][1], abs_tol=1e-9), (n_iter, v)
        # cash conservation: the virtual-root re-injection keeps Σcash = 1
        assert math.isclose(sum(c for c, _ in got.values()), 1.0, abs_tol=1e-8)


def test_opic_importance_favors_link_targets(spark):
    from crawl4ai_scraper_spark.operators.graph import opic_step

    # star: every spoke points at the hub → hub importance dominates
    edges = [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "src int, dst int")
    rows = {r["id"]: r["importance"] for r in opic_step(df, n_iter=3).collect()}
    assert rows[0] > max(v for k, v in rows.items() if k != 0) * 2


# --- logistic regression ------------------------------------------------------

def _lr_numpy(feat_rows, labels, dim, steps):
    """Unrounded full-batch GD oracle (lr = 1, from 0)."""
    import numpy as np

    docs = sorted(labels)
    X = np.zeros((len(docs), dim))
    idx = {d: i for i, d in enumerate(docs)}
    for d, j, x in feat_rows:
        X[idx[d], j] = x
    y = np.array([labels[d] for d in docs], dtype=float)
    w = np.zeros(dim)
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w = w - X.T @ (p - y) / len(docs)
    return w


def test_lr_train_matches_numpy_within_rounding(spark):
    from crawl4ai_scraper_spark.operators.classifier import lr_train

    # linearly separable toy: dim 3 positive-indicative, dim 7 negative
    feat_rows, labels = [], {}
    for d in range(40):
        y = d % 2
        labels[d] = y
        feat_rows.append((d, 3, 2 if y else 0))
        feat_rows.append((d, 7, 0 if y else 2))
        feat_rows.append((d, 11, 1))  # constant/bias-ish noise dim
    feat_rows = [(d, j, x) for d, j, x in feat_rows if x != 0]
    feats = spark.createDataFrame(feat_rows, "doc_id int, dim int, value int")
    lbl = spark.createDataFrame(list(labels.items()), "doc_id int, y int")
    got = {r["dim"]: r["weight"] for r in lr_train(feats, lbl, dim=16, steps=2).collect()}
    want = _lr_numpy(feat_rows, labels, 16, 2)
    assert len(got) == 16
    for j in range(16):
        # rounding contract perturbs ≤ ~1e-6 per example per step
        assert abs(got[j] - want[j]) < 1e-4, (j, got[j], want[j])
    assert got[3] > 0.1 and got[7] < -0.1  # learned the separating signs


def test_lr_score_separates_labels(spark):
    from crawl4ai_scraper_spark.operators.classifier import lr_score, lr_train

    feat_rows, lbl_rows = [], []
    for d in range(30):
        y = 1 if d % 3 == 0 else 0
        lbl_rows.append((d, y))
        feat_rows.append((d, 1, 3 if y else 1))
        feat_rows.append((d, 2, 1 if y else 4))
    feats = spark.createDataFrame(feat_rows, "doc_id int, dim int, value int")
    lbl = spark.createDataFrame(lbl_rows, "doc_id int, y int")
    w = lr_train(feats, lbl, dim=4, steps=3)
    scores = {r["doc_id"]: r["score"] for r in lr_score(feats, w).collect()}
    pos = [scores[d] for d, y in lbl_rows if y == 1]
    neg = [scores[d] for d, y in lbl_rows if y == 0]
    assert min(pos) > max(neg)


# --- content-defined chunking -------------------------------------------------

def _cdc_python(text, mask_bits=5, salt="cdc1"):
    toks = [t for t in text.strip().lower().split() if t]
    mask = 1 << mask_bits
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        h = int(hashlib.md5(f"{salt}:{t}".encode()).hexdigest()[:12], 16)
        if h % mask == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (i, len(c), hashlib.md5(" ".join(c).encode()).hexdigest())
        for i, c in enumerate(chunks)
    ]


def test_cdc_chunks_match_python_oracle(spark):
    from crawl4ai_scraper_spark.operators.dedup import cdc_chunks

    texts = {
        1: " ".join(f"tok{i % 97}" for i in range(400)),
        2: "single",
        3: "",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    out = cdc_chunks(docs, mask_bits=5, salt="cdc1").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_hash"])
        )
    assert 3 not in by_doc
    for d, text in list(texts.items())[:2]:
        assert sorted(by_doc[d]) == _cdc_python(text)


def test_cdc_chunks_are_shift_invariant(spark):
    """Inserting a prefix changes at most the FIRST chunk's hash — the
    property fixed windows lack and the reason CDC catches shifted dups."""
    from crawl4ai_scraper_spark.operators.dedup import cdc_chunks

    base = " ".join(f"w{(i * 7) % 211}" for i in range(600))
    docs = spark.createDataFrame(
        [(1, base), (2, "inserted preamble tokens here " + base)],
        "doc_id int, text string",
    )
    rows = cdc_chunks(docs, mask_bits=5, salt="cdc1").collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    first1 = min((r["chunk_id"], r["chunk_hash"]) for r in rows if r["doc_id"] == 1)[1]
    # every chunk of the original except possibly its first survives verbatim
    assert h1 - h2 <= {first1}
    assert len(h1 & h2) >= len(h1) - 1


# --- TrustRank -----------------------------------------------------------------

def _trustrank_python(edges, seeds, n_iter, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seeds = [s for s in seeds if s in set(nodes)]
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    s = len(seeds)
    d = {v: (round((1 - damping) / s, 12) if v in seeds else 0.0) for v in nodes}
    t = {v: (round(1.0 / s, 12) if v in seeds else 0.0) for v in nodes}
    for _ in range(n_iter):
        nxt = {v: d[v] for v in nodes}
        for u, v in edges:
            nxt[v] += round(damping * t[u] / outdeg[u], 12)
        t = {v: round(nxt[v], 12) for v in nodes}
    return t


def test_trustrank_matches_python_and_decays_with_distance(spark):
    from crawl4ai_scraper_spark.operators.graph import trustrank

    # chain 0→1→2→3 plus an unreachable spam pocket 8→9
    edges = [(0, 1), (1, 2), (2, 3), (8, 9)]
    df = spark.createDataFrame(edges, "src int, dst int")
    seeds = spark.createDataFrame([(0,)], "id int")
    for n_iter in (1, 3):
        got = {r["id"]: r["trust"] for r in trustrank(df, seeds, n_iter=n_iter).collect()}
        want = _trustrank_python(edges, [0], n_iter)
        assert set(got) == set(want)
        for v in want:
            assert math.isclose(got[v], want[v], abs_tol=1e-9), (n_iter, v)
    t3 = {r["id"]: r["trust"] for r in trustrank(df, seeds, n_iter=3).collect()}
    # every chain node is reached and damped (trust ≤ 0.85^dist), total
    # trust stays ≤ 1, and NOTHING reaches the unlinked spam pocket
    assert all(t3[v] > 0 for v in (0, 1, 2, 3))
    for v in (1, 2, 3):
        assert t3[v] <= 0.85 ** v + 1e-9
    assert sum(t3.values()) <= 1.0 + 1e-9
    assert t3[8] == 0.0 and t3[9] == 0.0


def test_trustrank_empty_seed_set_is_all_zero(spark):
    from crawl4ai_scraper_spark.operators.graph import trustrank

    df = spark.createDataFrame([(1, 2)], "src int, dst int")
    seeds = spark.createDataFrame([], "id int")
    assert all(r["trust"] == 0.0 for r in trustrank(df, seeds).collect())


# --- novelty & readability -------------------------------------------------------

def test_doc_novelty_hand_computed(spark):
    from crawl4ai_scraper_spark.operators.textops import doc_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # grams: 'a b c', 'b c d'
            (2, "a b c e"),          # grams: 'a b c', 'b c e'
            (3, "x y"),              # short doc → single gram 'x y'
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in doc_novelty(docs, n=3).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["n_novel"] == 1  # 'a b c' shared
    assert got[2]["n_grams"] == 2 and got[2]["n_novel"] == 1
    assert got[3]["n_grams"] == 1 and got[3]["n_novel"] == 1
    assert got[1]["novelty"] == 0.5 and got[3]["novelty"] == 1.0


def test_readability_hand_computed(spark):
    from crawl4ai_scraper_spark.operators.textops import readability

    # "The cat sat. It ran away!" → 2 sents, 6 words,
    # syllable runs: e/a/a/i/a/a/ay → count via [aeiouy]+
    docs = spark.createDataFrame(
        [(1, "The cat sat. It ran away!"), (2, ""), (3, "no terminator here")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in readability(docs).collect()}
    assert 2 not in rows  # empty doc excluded
    r1 = rows[1]
    assert r1["n_sents"] == 2 and r1["n_words"] == 6
    syll = 7  # e, a, a, i, a, a+ay ("away" → 'a','ay' = 2 runs)
    assert r1["n_syllables"] == syll
    wps, spw = 6 / 2, syll / 6
    assert abs(r1["flesch"] - round(206.835 - 1.015 * wps - 84.6 * spw, 4)) < 1e-9
    assert abs(r1["fk_grade"] - round(0.39 * wps + 11.8 * spw - 15.59, 4)) < 1e-9
    # a doc with no sentence terminator still yields one sentence run
    assert rows[3]["n_sents"] == 1


# --- page-metadata hygiene (canonical collapse + meta robots) --------------------

def _page(canon=None, robots=None):
    head = ""
    if canon:
        head += f'<link rel="canonical" href="{canon}">'
    if robots:
        head += f'<meta name="robots" content="{robots}">'
    return f"<html><head>{head}</head><body><p>content</p></body></html>".encode()


def test_page_meta_and_canonical_collapse(spark):
    from crawl4ai_scraper_spark.operators.webmeta import (
        canonical_collapse,
        page_meta,
        robots_meta_gate,
    )

    pages = spark.createDataFrame(
        [
            ("https://a.example/real", _page()),                       # target itself
            ("https://a.example/dup?utm=1", _page(canon="/real")),     # variant
            ("https://a.example/dup?utm=2", _page(canon="/real")),     # variant
            ("https://a.example/orphan1", _page(canon="/gone")),       # target not crawled
            ("https://a.example/orphan2", _page(canon="/gone")),
            ("https://a.example/plain", _page()),                      # no declaration
            ("https://a.example/secret", _page(robots="noindex, nofollow")),
            ("https://a.example/nofollow-only", _page(robots="nofollow")),
            ("https://a.example/none-kw", _page(robots="none")),
        ],
        "url string, html binary",
    )
    meta = page_meta(pages)
    rows = {r["url"]: r for r in meta.collect()}
    assert rows["https://a.example/dup?utm=1"]["canonical"] == "https://a.example/real"
    assert rows["https://a.example/plain"]["canonical"] == "https://a.example/plain"
    assert rows["https://a.example/secret"]["noindex"] is True
    assert rows["https://a.example/nofollow-only"]["noindex"] is False
    assert rows["https://a.example/nofollow-only"]["nofollow"] is True
    assert rows["https://a.example/none-kw"]["noindex"] is True  # 'none' shorthand

    col = {r["url"]: r for r in canonical_collapse(meta).collect()}
    # declared group collapses onto the crawled target
    for u in ("https://a.example/real", "https://a.example/dup?utm=1",
              "https://a.example/dup?utm=2"):
        assert col[u]["survivor_url"] == "https://a.example/real"
    assert col["https://a.example/real"]["is_survivor"] is True
    assert col["https://a.example/dup?utm=1"]["is_survivor"] is False
    # uncrawled target → deterministic lexicographic survivor
    assert col["https://a.example/orphan1"]["survivor_url"] == "https://a.example/orphan1"
    assert col["https://a.example/orphan2"]["is_survivor"] is False
    # undeclared pages survive as themselves
    assert col["https://a.example/plain"]["is_survivor"] is True

    gate = {r["url"]: r for r in robots_meta_gate(meta).collect()}
    assert gate["https://a.example/secret"]["indexable"] is False
    assert gate["https://a.example/secret"]["followable"] is False
    assert gate["https://a.example/plain"]["indexable"] is True
