"""Product quantization, chunking, link-graph ranks, page hygiene.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403
from crawl4ai_scraper_spark.contract.q_crawl import _LTOKS, _SW_DE, _SW_EN, _SW_ES, _SW_FR
from crawl4ai_scraper_spark.contract.q_dedup_ann import _VARIANT_SQL, _centroid_dots_sql, _sh3
from crawl4ai_scraper_spark.contract.q_sessions_hygiene import _G3_SQL
from crawl4ai_scraper_spark.contract.q_quality_pack import _BPE_MERGES_SQL

# ---------------------------------------------------------------------------
# Product quantization (operators.similarity.pq_encode / pq_adc_topk)
# ---------------------------------------------------------------------------

_PQ_M, _PQ_K, _PQ_DIM, _PQ_SEED = 8, 16, 64, 11
_PQ_SUB = _PQ_DIM // _PQ_M


def _pq_slices_sql(src: str = "e") -> str:
    """s0..s7: the 8-dim subvector slices (1-based inclusive, matches
    F.slice(vec, j*8+1, 8))."""
    return ", ".join(
        f"{src}[{j * _PQ_SUB + 1}:{(j + 1) * _PQ_SUB}] AS s{j}" for j in range(_PQ_M)
    )


def _pq_dists_sql(j: int, sub_expr: str) -> str:
    """Distance list for subspace j — the SAME expression tree as
    similarity._pq_sub_dists: (s.s - 2.0*(s.c)) + cc with cc the
    Python-computed literal, so doubles are bit-identical across engines."""
    book = S.pq_codebooks(_PQ_M, _PQ_K, _PQ_DIM, _PQ_SEED)[j]
    terms = []
    for cent in book:
        carr = "[" + ", ".join(f"{x:.3f}" for x in cent) + "]"
        cc = 0.0
        for x in cent:
            cc = cc + x * x
        terms.append(
            f"(list_dot_product({sub_expr}, {sub_expr})"
            f" - 2.0 * list_dot_product({sub_expr}, CAST({carr} AS DOUBLE[])))"
            f" + CAST({cc!r} AS DOUBLE)"
        )
    return "[" + ", ".join(terms) + "]"


def _pq_codes_sql() -> str:
    """c0..c7: 1-based argmin codes (first-match ties in both engines)."""
    return ", ".join(
        "CAST(list_indexof(d{j}, list_aggregate(d{j}, 'min')) AS INT) AS c{j}".format(j=j)
        for j in range(_PQ_M)
    )


def _pq_enc_cte() -> str:
    dists = ", ".join(_pq_dists_sql(j, f"s{j}") + f" AS d{j}" for j in range(_PQ_M))
    return f"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    sl AS (SELECT vec_id, {_pq_slices_sql()} FROM v),
    dd AS (SELECT vec_id, {dists} FROM sl),
    enc AS (SELECT vec_id, {_pq_codes_sql()} FROM dd)"""


@_q(
    "ann_pq_encode",
    f"""WITH {_pq_enc_cte()}
    SELECT vec_id, [{", ".join(f"c{j}" for j in range(_PQ_M))}] AS code FROM enc""",
)
def ann_pq_encode(spark, sf):
    """Product-quantization encoding (Jegou et al. 2011): each 64-d vector
    becomes 8 sub-centroid indices — the 64x compression that makes
    exhaustive ANN candidate scans affordable at 100 TB. Pure narrow map
    against literal codebooks (no shuffle, no UDF); the oracle rebuilds the
    md5-derived codebooks and the exact distance expression tree."""
    return S.pq_encode(_t(spark, sf, "embeddings"))


def _pq_adc_sum_sql() -> str:
    parts = []
    for j in range(_PQ_M):
        book = S.pq_codebooks(_PQ_M, _PQ_K, _PQ_DIM, _PQ_SEED)[j]
        cents = "[" + ", ".join(
            "[" + ", ".join(f"{x:.3f}" for x in c) + "]" for c in book
        ) + "]"
        ccs = []
        for c in book:
            cc = 0.0
            for x in c:
                cc = cc + x * x
            ccs.append(f"CAST({cc!r} AS DOUBLE)")
        ccs_sql = "[" + ", ".join(ccs) + "]"
        parts.append(
            f"((list_dot_product(q.s{j}, q.s{j})"
            f" - 2.0 * list_dot_product(q.s{j}, (CAST({cents} AS DOUBLE[][]))[enc.c{j}]))"
            f" + ({ccs_sql})[enc.c{j}])"
        )
    return " + ".join(parts)


@_q(
    "ann_pq_adc_topk",
    f"""WITH {_pq_enc_cte()},
    q AS (SELECT vec_id AS query_id, {_pq_slices_sql()} FROM v WHERE vec_id < 10),
    sc AS (
      SELECT q.query_id, enc.vec_id AS neighbor_id,
             ROUND({_pq_adc_sum_sql()}, 6) AS adc_dist
      FROM enc CROSS JOIN q
      WHERE enc.vec_id <> q.query_id
    ),
    r AS (SELECT query_id, neighbor_id, adc_dist,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY adc_dist, neighbor_id) AS rank
          FROM sc)
    SELECT query_id, neighbor_id, rank, adc_dist FROM r WHERE rank <= 5
    """,
)
def ann_pq_adc_topk(spark, sf):
    """Asymmetric-distance (ADC) top-k over PQ codes: full-precision queries
    against 8-byte database codes, distance = sum of per-subspace lookup
    distances — the standard PQ serving path. The query side broadcasts into
    a scan of the CODE table (64x less I/O than the float scan); every
    lookup is element_at on a 16-entry literal, codegen'd column math."""
    return S.pq_adc_topk(_t(spark, sf, "embeddings"))


@_q(
    "chunk_sentences",
    """WITH s0 AS (
      SELECT doc_id, regexp_extract_all(text, '[^.!?]+[.!?]*') AS ss
      FROM documents
    ), s1 AS (
      SELECT doc_id, trim(UNNEST(ss)) AS s, UNNEST(range(1, len(ss)+1)) AS pos
      FROM s0
    ), s2 AS (SELECT doc_id, s, pos FROM s1 WHERE s <> ''),
    s3 AS (
      SELECT doc_id, s,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS sent_idx,
             COALESCE(SUM(length(s)) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM s2
    ), s4 AS (
      SELECT doc_id, s, sent_idx,
             CAST(cum_before // 200 AS INT) AS chunk_id
      FROM s3
    )
    SELECT doc_id, chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(length(string_agg(s, ' ' ORDER BY sent_idx)) AS INT) AS n_chars,
           string_agg(s, ' ' ORDER BY sent_idx) AS chunk_text
    FROM s4 GROUP BY doc_id, chunk_id""",
)
def chunk_sentences_q(spark, sf):
    """RAG-style sentence chunking: naive [^.!?]+ sentences packed into
    ~200-char chunks on global character offsets (closed-form chunk_id =
    cum_before DIV 200 — no per-doc sequential state, sentences never
    split). One doc-key window + one (doc, chunk) groupBy."""
    return T.chunk_sentences(_t(spark, sf, "documents"), max_chars=200)


@_q(
    "ann_ivf_pq_topk",
    f"""WITH {_pq_enc_cte()},
    cl AS (SELECT vec_id,
                  CAST(list_indexof(dots, list_aggregate(dots, 'max')) AS INT) AS cell
           FROM (SELECT vec_id, {_centroid_dots_sql()} AS dots FROM embeddings)),
    enc2 AS (SELECT enc.*, cl.cell FROM enc JOIN cl USING (vec_id)),
    q AS (SELECT v.vec_id AS query_id, {_pq_slices_sql("v.e")}, cl.cell AS qcell
          FROM v JOIN cl ON cl.vec_id = v.vec_id WHERE v.vec_id < 10),
    sc AS (
      SELECT q.query_id, enc.vec_id AS neighbor_id,
             ROUND({_pq_adc_sum_sql()}, 6) AS adc_dist
      FROM enc2 enc JOIN q ON enc.cell = q.qcell AND enc.vec_id <> q.query_id
    ),
    r AS (SELECT query_id, neighbor_id, adc_dist,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY adc_dist, neighbor_id) AS rank
          FROM sc)
    SELECT query_id, neighbor_id, rank, adc_dist FROM r WHERE rank <= 5
    """,
)
def ann_ivf_pq_topk(spark, sf):
    """IVF-PQ — the production 100-TB ANN serving shape (FAISS IndexIVFPQ):
    coarse cells bound WHICH vectors are scanned (cell equi-join, never a
    cross product), PQ codes bound WHAT is read per vector (m byte lookups
    vs dim floats). Assignment and encoding are narrow maps; the broadcast
    query side carries its own cell; ADC distances are literal-codebook
    lookups; ties by neighbor id."""
    return S.ivf_pq_topk(_t(spark, sf, "embeddings"))


@_q(
    "opic_cash_step",
    """WITH e AS (
      SELECT doc_id AS src, doc_id - (doc_id % 5) AS dst
      FROM documents WHERE doc_id < 200 AND doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, doc_id + 5 FROM documents WHERE doc_id < 195 AND doc_id % 15 = 0
    ), nodes AS (
      SELECT src AS id FROM e UNION SELECT dst FROM e
    ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
    ), c0 AS (
      SELECT id, CAST(ROUND(1.0 / n, 12) AS DECIMAL(28,12)) AS cash FROM nodes, nn
    ), deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
    ), dang AS (
      SELECT COALESCE(SUM(cash), CAST(0 AS DECIMAL(28,12))) AS g
      FROM c0 LEFT JOIN deg ON deg.src = c0.id WHERE deg.src IS NULL
    ), shr AS (
      SELECT CAST(ROUND(CAST(g AS DOUBLE) / n, 12) AS DECIMAL(28,12)) AS share
      FROM dang, nn
    ), contrib AS (
      SELECT e.dst AS id,
             CAST(SUM(CAST(ROUND(CAST(c0.cash AS DOUBLE) / deg.outdeg, 12)
                           AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS in_sum
      FROM e JOIN deg ON deg.src = e.src JOIN c0 ON c0.id = e.src
      GROUP BY e.dst)
    SELECT c0.id,
           CAST(COALESCE(in_sum, CAST(0 AS DECIMAL(28,12))) + shr.share AS DOUBLE) AS cash,
           CAST(c0.cash AS DOUBLE) AS history,
           CAST(COALESCE(in_sum, CAST(0 AS DECIMAL(28,12))) + shr.share + c0.cash
                AS DOUBLE) AS importance
    FROM c0 CROSS JOIN shr LEFT JOIN contrib ON contrib.id = c0.id""",
)
def opic_cash_step_q(spark, sf):
    """OPIC (Abiteboul et al. WWW'03) — the crawl-frontier importance metric
    computed ONLINE instead of by PageRank convergence: one synchronous
    cash-distribution step over the DIRECTED star/bridge graph (kept
    directed precisely so dangling hubs exist and exercise the
    virtual-root re-injection). Per-edge contributions and the uniform
    dangling share are rounded to 12dp before the DECIMAL sums — order-free,
    oracle-exact; importance = history + cash is the frontier's ORDER BY."""
    from crawl4ai_scraper_spark.operators.graph import opic_step

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    star = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("dst"),
    )
    bridge = docs.filter((F.col("doc_id") < 195) & (F.col("doc_id") % 15 == 0)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 5).alias("dst")
    )
    return opic_step(star.unionByName(bridge), n_iter=1)


@_q(
    "lr_quality_train",
    """WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('fh1:' || term), 1, 12) AS BIGINT) AS h
      FROM toks WHERE term <> ''
    ), f AS (
      SELECT doc_id, CAST(h % 64 AS INT) AS dim,
             CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS x
      FROM h GROUP BY doc_id, dim
      HAVING SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0
    ), lbl AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents
    ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lbl
    ), g1 AS (
      -- step 1 from w = 0: sigmoid(0) = 0.5 exactly, no transcendental
      SELECT f.dim,
             CAST(SUM(CAST(ROUND((0.5 - lbl.y) * f.x / nn.n, 12)
                           AS DECIMAL(20,12))) AS DECIMAL(38,12)) AS g
      FROM f JOIN lbl USING (doc_id) CROSS JOIN nn GROUP BY f.dim
    ), dims AS (SELECT CAST(r AS INT) AS dim FROM range(0, 64) t(r)
    ), w1 AS (
      SELECT dims.dim,
             CAST(0 - COALESCE(g1.g, CAST(0 AS DECIMAL(38,12))) AS DECIMAL(18,12)) AS w
      FROM dims LEFT JOIN g1 USING (dim)
    ), m2 AS (
      SELECT f.doc_id,
             CAST(SUM(CAST(f.x AS DECIMAL(10,0)) * w1.w) AS DECIMAL(38,12)) AS m
      FROM f JOIN w1 USING (dim) GROUP BY f.doc_id
    ), r2 AS (
      -- the 6dp rounding of the sigmoid is the determinism contract: a
      -- last-ulp exp() difference between engines cannot reach 5e-7
      SELECT lbl.doc_id,
             ROUND(1.0 / (1.0 + EXP(-COALESCE(CAST(m2.m AS DOUBLE), 0.0))), 6)
               - lbl.y AS r
      FROM lbl LEFT JOIN m2 USING (doc_id)
    ), g2 AS (
      SELECT f.dim,
             CAST(SUM(CAST(ROUND(r2.r * f.x / nn.n, 12)
                           AS DECIMAL(20,12))) AS DECIMAL(38,12)) AS g
      FROM f JOIN r2 USING (doc_id) CROSS JOIN nn GROUP BY f.dim)
    SELECT w1.dim,
           CAST(w1.w - COALESCE(g2.g, CAST(0 AS DECIMAL(38,12))) AS DOUBLE) AS weight
    FROM w1 LEFT JOIN g2 USING (dim)""",
)
def lr_quality_train_q(spark, sf):
    """Train the quality classifier IN-ENGINE: two full-batch logistic-
    regression GD steps over hashing-trick features (feature_hash_vectors,
    exact integers), labels y = (lang = 'en') — the fastText-style filter
    recipe (CCNet / DCLM / FineWeb-Edu) with the engine's determinism
    contract: DECIMAL dot products, sigmoid rounded to 6dp, 12dp per-example
    gradient rounding before DECIMAL sums, learning rate 1 so updates are
    exact subtractions. The oracle reproduces the learned 64-dim weight
    vector bit-for-bit."""
    from crawl4ai_scraper_spark.operators.classifier import lr_train
    from crawl4ai_scraper_spark.operators.search import feature_hash_vectors

    docs = _t(spark, sf, "documents")
    feats = feature_hash_vectors(docs, dim=64, salt="fh1")
    labels = docs.select(
        "doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    return lr_train(feats, labels, dim=64, steps=2)


@_q(
    "cdc_chunk_hashes",
    """WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents
    ), t AS (
      SELECT doc_id, UNNEST(w) AS term, UNNEST(range(0, len(w))) AS pos FROM w
    ), tt AS (
      SELECT doc_id, pos, term,
             CASE WHEN CAST('0x' || substr(md5('cdc1:' || term), 1, 12) AS BIGINT)
                       % 32 = 0
                  THEN 1 ELSE 0 END AS b
      FROM t WHERE term <> ''
    ), st AS (
      SELECT doc_id, pos, term,
             CAST(COALESCE(SUM(b) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
               AS chunk_id
      FROM tt)
    SELECT doc_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           md5(string_agg(term, ' ' ORDER BY pos)) AS chunk_hash
    FROM st GROUP BY doc_id, chunk_id""",
)
def cdc_chunk_hashes_q(spark, sf):
    """Content-defined chunking (rsync/LBFS boundaries on token digests,
    expected 32-token chunks): boundaries depend on local content only, so
    insertions shift NO downstream chunk hashes — the dedup key that catches
    shifted/partially-edited near-duplicates fixed windows miss. Closed-form
    chunk ids (one doc-key window), ordered reassembly via array_sort."""
    from crawl4ai_scraper_spark.operators.dedup import cdc_chunks

    return cdc_chunks(_t(spark, sf, "documents"), mask_bits=5, salt="cdc1")


@_q(
    "trustrank_scores",
    """WITH e AS (
      SELECT doc_id AS src, doc_id - (doc_id % 5) AS dst
      FROM documents WHERE doc_id < 200 AND doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, doc_id + 5 FROM documents WHERE doc_id < 195 AND doc_id % 15 = 0
    ), nodes AS (
      SELECT src AS id FROM e UNION SELECT dst FROM e
    ), sd AS (SELECT id FROM nodes WHERE id % 20 = 0
    ), ss AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM sd
    ), deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
    ), t0 AS (
      SELECT nodes.id,
             CASE WHEN sd.id IS NOT NULL
                  THEN CAST(ROUND(1.0 / s, 12) AS DECIMAL(28,12))
                  ELSE CAST(0 AS DECIMAL(28,12)) END AS trust
      FROM nodes CROSS JOIN ss LEFT JOIN sd ON sd.id = nodes.id
    ), base AS (
      SELECT nodes.id,
             CASE WHEN sd.id IS NOT NULL
                  THEN CAST(ROUND(0.15 / s, 12) AS DECIMAL(28,12))
                  ELSE CAST(0 AS DECIMAL(28,12)) END AS d
      FROM nodes CROSS JOIN ss LEFT JOIN sd ON sd.id = nodes.id
    ), contrib AS (
      SELECT e.dst AS id,
             CAST(SUM(CAST(ROUND(0.85 * CAST(t0.trust AS DOUBLE) / deg.outdeg, 12)
                           AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS in_sum
      FROM e JOIN deg ON deg.src = e.src JOIN t0 ON t0.id = e.src
      GROUP BY e.dst)
    SELECT base.id,
           CAST(base.d + COALESCE(in_sum, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
             AS trust
    FROM base LEFT JOIN contrib ON contrib.id = base.id""",
)
def trustrank_scores_q(spark, sf):
    """TrustRank (Gyöngyi et al. VLDB'04): PageRank personalized to a
    vetted seed set — trust flows out of seeds and decays with link
    distance, so spam-farm neighborhoods score ≈ 0; the graph complement
    of the lexical url_spam_filter for frontier demotion. One iteration
    over the directed star/bridge graph from the seed-restricted teleport
    vector (seeds = id % 20 = 0), same 12dp-before-DECIMAL-sum contract as
    pagerank_step; multi-iteration decay is pytest-pinned."""
    from crawl4ai_scraper_spark.operators.graph import trustrank

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    star = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("dst"),
    )
    bridge = docs.filter((F.col("doc_id") < 195) & (F.col("doc_id") % 15 == 0)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 5).alias("dst")
    )
    seeds = docs.filter(F.col("doc_id") % 20 == 0)
    return trustrank(star.unionByName(bridge), seeds, n_iter=1)


@_q(
    "doc_novelty_scores",
    f"""WITH w AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
      FROM documents),
    g2 AS (SELECT doc_id, UNNEST(list_distinct({_G3_SQL})) AS gram FROM w),
    g AS (SELECT doc_id, gram FROM g2 WHERE gram <> ''),
    tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id),
    df AS (SELECT gram, COUNT(*) AS df, MIN(doc_id) AS owner FROM g GROUP BY gram),
    nov AS (SELECT owner AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
            FROM df WHERE df = 1 GROUP BY owner)
    SELECT tot.doc_id, tot.n_grams,
           CAST(COALESCE(nov.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(CAST(COALESCE(nov.n_novel, 0) AS DOUBLE) / tot.n_grams, 4)
             AS novelty
    FROM tot LEFT JOIN nov USING (doc_id)""",
)
def doc_novelty_scores_q(spark, sf):
    """Per-doc corpus novelty: fraction of the doc's distinct 3-grams with
    corpus df = 1 — the diversity-selection dual of decontamination.
    df=1 grams keep their single owner via MIN(doc) inside the gram
    aggregate, so novelty needs NO join back through the gram table: two
    map-side-combined aggs of one distinct (doc, gram) stream joined at
    one row per doc."""
    from crawl4ai_scraper_spark.operators.textops import doc_novelty

    return doc_novelty(_t(spark, sf, "documents"), n=3)


@_q(
    "readability_scores",
    """WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_extract_all(text, '[^.!?]+[.!?]*'),
                                  s -> trim(s) <> '')) AS BIGINT) AS n_sents,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
               AS n_syllables
      FROM documents)
    SELECT doc_id, n_sents, n_words, n_syllables,
           ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
             AS flesch,
           ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sents)
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4)
             AS fk_grade
    FROM c WHERE n_words > 0 AND n_sents > 0""",
)
def readability_scores_q(spark, sf):
    """Flesch reading-ease + Flesch–Kincaid grade — the classic readability
    features for webtext quality mixes (both tails correlate with spam/
    boilerplate). Syllables = maximal [aeiouy]+ runs, sentences = the
    chunk_sentences splitter, words = whitespace tokens: three regexp/array
    projections at scan speed, two identical double expressions, 4dp."""
    from crawl4ai_scraper_spark.operators.textops import readability

    return readability(_t(spark, sf, "documents"))


@_q(
    "host_corpus_report",
    """SELECT source AS host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
           CAST(SUM(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                    t -> t <> ''))) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4)
             AS dup_rate,
           ROUND(CAST(SUM(len(list_filter(string_split_regex(trim(lower(text)),
                                                             '\\s+'),
                                          t -> t <> ''))) AS DOUBLE) / COUNT(*), 2)
             AS avg_tokens
    FROM documents GROUP BY source""",
)
def host_corpus_report_q(spark, sf):
    """Per-host corpus dashboard: doc count, exact-text dup rate (mill/
    parked-domain detector), token mass, language spread — the aggregates
    host budgets and recrawl priorities consume. ONE groupBy(host), the
    distinct-text count riding the same aggregate; output is |hosts| rows."""
    from crawl4ai_scraper_spark.operators.textops import host_corpus_report

    return host_corpus_report(_t(spark, sf, "documents"))


@_q(
    "redirect_resolution",
    """WITH RECURSIVE redir AS (
      SELECT CAST(doc_id AS BIGINT) AS src, CAST(doc_id // 2 AS BIGINT) AS dst
      FROM documents WHERE doc_id % 3 <> 0
    ), nodes AS (
      SELECT src AS node FROM redir UNION SELECT dst FROM redir
    ), walk AS (
      SELECT node AS src, node AS cur, 0 AS hops FROM nodes
      UNION ALL
      SELECT w.src, r.dst, w.hops + 1 FROM walk w JOIN redir r ON r.src = w.cur
    )
    SELECT src AS node, CAST(cur AS BIGINT) AS final_id,
           CAST(hops AS INT) AS hops, TRUE AS resolved
    FROM walk
    QUALIFY ROW_NUMBER() OVER (PARTITION BY src ORDER BY hops DESC) = 1""",
)
def redirect_resolution_q(spark, sf):
    """Redirect-chain resolution by pointer doubling over a deterministic
    functional graph (doc % 3 != 0 redirects to doc DIV 2; multiples of 3
    and 0 are terminals — chains are O(log max_id) hops). Spark resolves in
    ceil(log2 L) self-joins of the mapping; the oracle walks the chain with
    a recursive CTE. Integer-exact, bit-reproducible."""
    from crawl4ai_scraper_spark.operators.graph import resolve_redirects

    docs = _t(spark, sf, "documents").select(F.col("doc_id").cast("bigint").alias("doc_id"))
    redir = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("src"),
        F.expr("CAST(doc_id DIV 2 AS BIGINT)").alias("dst"),
    )
    return resolve_redirects(redir)


@_q(
    "host_graph_rank",
    """WITH e1 AS (
      SELECT doc_id AS src, doc_id - (doc_id % 5) AS dst
      FROM documents WHERE doc_id < 200 AND doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, doc_id + 5 FROM documents WHERE doc_id < 195 AND doc_id % 15 = 0
    ), eb AS (
      SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1
    ), hmap AS (
      SELECT doc_id, source FROM documents WHERE doc_id < 200
    ), he AS (
      SELECT s.source AS src, d.source AS dst, COUNT(*) AS w
      FROM eb JOIN hmap s ON s.doc_id = eb.src JOIN hmap d ON d.doc_id = eb.dst
      WHERE s.source <> d.source GROUP BY 1, 2
    ), nodes AS (SELECT src AS id FROM he UNION SELECT dst FROM he
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
    ), wout AS (SELECT src, SUM(w) AS tw FROM he GROUP BY src
    ), r0 AS (
      SELECT id, CAST(ROUND(1.0 / n, 12) AS DECIMAL(28,12)) AS rank FROM nodes, nn
    ), contrib AS (
      SELECT he.dst AS id,
             CAST(SUM(CAST(ROUND(0.85 * CAST(r0.rank AS DOUBLE) * he.w / wout.tw, 12)
                           AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS in_sum
      FROM he JOIN wout ON wout.src = he.src JOIN r0 ON r0.id = he.src
      GROUP BY he.dst)
    SELECT nodes.id AS host,
           CAST(CAST(ROUND(0.15 / n, 12) AS DECIMAL(28,12))
                + COALESCE(in_sum, CAST(0 AS DECIMAL(28,12))) AS DOUBLE) AS rank
    FROM nodes CROSS JOIN nn LEFT JOIN contrib ON contrib.id = nodes.id""",
)
def host_graph_rank_q(spark, sf):
    """Host-level authority: contract the pagerank_step link graph to the
    HOST graph (endpoints mapped through documents.source, parallel edges
    weight-collapsed, intra-host edges dropped) and run one WEIGHTED rank
    step — rank flows proportional to edge weight over total outgoing
    weight. Host graphs are 3-5 orders smaller than page graphs; this is
    where crawl-budget and spam-demotion signals live."""
    from crawl4ai_scraper_spark.operators.graph import (
        contract_to_hosts,
        weighted_pagerank,
    )

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    ids = docs.select("doc_id")
    star = ids.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("dst"),
    )
    bridge = ids.filter((F.col("doc_id") < 195) & (F.col("doc_id") % 15 == 0)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 5).alias("dst")
    )
    directed = star.unionByName(bridge)
    edges = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    hosts = contract_to_hosts(
        edges, docs.select("doc_id", "source"), node="doc_id", host="source"
    )
    return weighted_pagerank(hosts, src="src_host", dst="dst_host").select(
        F.col("id").alias("host"), "rank"
    )


@_q(
    "embedding_gram",
    """SELECT CAST(r1.i - 1 AS INT) AS i, CAST(r2.j - 1 AS INT) AS j,
           CAST(SUM(CAST(ROUND(CAST(embedding[r1.i] AS DOUBLE)
                                * CAST(embedding[r2.j] AS DOUBLE), 12)
                         AS DECIMAL(28,12))) AS DOUBLE) AS g
    FROM embeddings, range(1, 65) r1(i), range(1, 65) r2(j)
    GROUP BY 1, 2""",
)
def embedding_gram_q(spark, sf):
    """X^T X over the embedding corpus — the d×d Gram matrix PCA/whitening
    start from. Spark builds the d² products per vector as ONE flattened
    codegen array (no exploded self-join) and collapses them in a single
    map-side-combined groupBy over d²=4096 keys; per-product 12dp rounding
    + DECIMAL sums make it bit-reproducible in the oracle."""
    from crawl4ai_scraper_spark.operators.similarity import gram_matrix

    return gram_matrix(_t(spark, sf, "embeddings"), dim=64)


@_q(
    "jl_projection",
    """SELECT vec_id AS id, CAST(r2.t AS INT) AS t,
           CAST(SUM(CAST(ROUND(CAST(embedding[r1.i + 1] AS DOUBLE)
               * (CASE CAST('0x' || substr(md5('jl1:' || CAST(r1.i AS VARCHAR)
                                            || ':' || CAST(r2.t AS VARCHAR)), 1, 12)
                        AS BIGINT) % 6
                  WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS proj
    FROM embeddings, range(0, 64) r1(i), range(0, 16) r2(t)
    GROUP BY 1, 2""",
)
def jl_projection_q(spark, sf):
    """Sparse Johnson-Lindenstrauss projection 64 → 16 with HASH-DERIVED
    Achlioptas signs ({+1,-1,0} at {1/6,1/6,2/3} from md5(salt:i:t)) — no
    projection-matrix artifact to ship; per-term 12dp rounding + DECIMAL
    sums = engine-exact. One posexplode + one (id,t)-keyed map-side-combined
    groupBy."""
    from crawl4ai_scraper_spark.operators.similarity import jl_project

    return jl_project(_t(spark, sf, "embeddings")).select(
        "id", F.col("t").cast("int").alias("t"), "proj"
    )


@_q(
    "lang_confusion",
    f"""WITH s AS (
      SELECT doc_id, lang,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_EN}))) AS s_en,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_DE}))) AS s_de,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_FR}))) AS s_fr,
        len(list_filter({_LTOKS}, t -> t IN ({_SW_ES}))) AS s_es
      FROM documents),
    p AS (
      SELECT lang,
        CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
             WHEN s_es > 0 THEN 'es'
             ELSE 'und' END AS lang_pred
      FROM s)
    SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY 1, 2""",
)
def lang_confusion_q(spark, sf):
    """Language-ID confusion matrix (labeled lang × stopword prediction) —
    the eval run before trusting lang_id for filtering. ONE map-side-
    combined groupBy to ≤|langs|² rows."""
    from crawl4ai_scraper_spark.operators.textops import lang_confusion

    return lang_confusion(_t(spark, sf, "documents"))


@_q(
    "tokenizer_fertility",
    _BPE_MERGES_SQL
    + r""",
tok AS (
  SELECT doc_id, CAST(r.pos AS INT) AS pos, toks[CAST(r.pos AS INT)] AS word
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents) t,
       UNNEST(range(1, len(toks) + 1)) AS r(pos)),
seg AS (
  SELECT tok.doc_id, tok.pos,
         len(string_split(trim(ws3.s), '  ')) AS np
  FROM tok JOIN ws3 ON ws3.word = tok.word),
perdoc AS (
  SELECT doc_id, COUNT(*) AS n_words, SUM(np) AS n_pieces
  FROM seg GROUP BY doc_id)
SELECT d.lang, CAST(SUM(p.n_words) AS BIGINT) AS n_words,
       CAST(SUM(p.n_pieces) AS BIGINT) AS n_pieces,
       ROUND(CAST(SUM(p.n_pieces) AS DOUBLE) / SUM(p.n_words), 6) AS fertility
FROM perdoc p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.lang""",
)
def tokenizer_fertility_q(spark, sf):
    """Pieces-per-word fertility by language under the 3 learned BPE merges
    — the per-language sequence-length cost a tokenizer team watches. One
    co-partitioned join back for the label + ONE groupBy(lang)."""
    from crawl4ai_scraper_spark.operators import bpe as B
    from crawl4ai_scraper_spark.operators.bpe import tokenizer_fertility

    docs = _t(spark, sf, "documents")
    merges, word_pieces = B.bpe_train(docs, "text", n_merges=3)
    seg = B.bpe_segment(docs, "text", "doc_id", word_pieces)
    return tokenizer_fertility(seg, docs)


@_q(
    "winnowing_fingerprints",
    r"""WITH base AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0
    ), g AS (
      SELECT id, CAST(r.s AS INT) AS s,
             md5(array_to_string(toks[CAST(r.s AS INT) + 1 : CAST(r.s AS INT) + 3],
                                 ' ')) AS h,
             len(toks) - 2 AS ng
      FROM base, UNNEST(range(0, len(toks) - 2)) AS r(s)
      WHERE len(toks) >= 3
    ), anchors AS (
      SELECT id, s FROM g WHERE s <= ng - 4
    ), wsel AS (
      SELECT a.id, w2.s AS pos, w2.h AS fp,
             ROW_NUMBER() OVER (PARTITION BY a.id, a.s
                                ORDER BY w2.h, w2.s DESC) AS rn
      FROM anchors a JOIN g w2 ON w2.id = a.id AND w2.s BETWEEN a.s AND a.s + 3
    )
    SELECT DISTINCT id, CAST(pos AS INT) AS pos, fp FROM wsel WHERE rn = 1""",
)
def winnowing_fingerprints_q(spark, sf):
    """Winnowing fingerprints (MOSS; k=3-gram hashes, window w=4, rightmost
    min per window): guaranteed detection of shared substrings ≥ w+k-1
    tokens at ~2/(w+1) density. Spark selects via a doc-keyed running-window
    MIN (one exchange); the oracle replays the per-window argmin
    quadratically."""
    from crawl4ai_scraper_spark.operators.dedup import winnowing_fingerprints

    return winnowing_fingerprints(_t(spark, sf, "documents"), "text", "doc_id")


@_q(
    "mirror_host_pairs",
    """WITH corpus AS (
      SELECT source AS host, text FROM documents
      UNION ALL
      SELECT 'm-' || source AS host, text FROM documents WHERE doc_id % 7 = 0
    ), hh AS (
      SELECT DISTINCT md5(text) AS h, host FROM corpus
    ), deg AS (SELECT h, COUNT(*) AS nh FROM hh GROUP BY h
    ), ok AS (
      SELECT hh.h, hh.host FROM hh JOIN deg USING (h) WHERE nh BETWEEN 2 AND 8
    ), per_host AS (SELECT host, COUNT(*) AS n_texts FROM hh GROUP BY host
    ), pairs AS (
      SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
      FROM ok a JOIN ok b ON a.h = b.h AND a.host < b.host
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT host_a, host_b, CAST(shared AS BIGINT) AS shared,
           ROUND(CAST(shared AS DOUBLE) / LEAST(pa.n_texts, pb.n_texts), 6)
             AS containment
    FROM pairs JOIN per_host pa ON pa.host = pairs.host_a
               JOIN per_host pb ON pb.host = pairs.host_b""",
)
def mirror_host_pairs_q(spark, sf):
    """Mirror detection over a corpus with PLANTED mirrors (every 7th doc
    re-served under host 'm-'||source): host pairs sharing ≥2 exact-text
    hashes, with containment = shared / min host size. Universal boilerplate
    (hash on >8 hosts) is dropped before pairing — the skew guard that keeps
    the hash join's fan-out bounded at web scale."""
    from crawl4ai_scraper_spark.operators.dedup import mirror_host_pairs

    docs = _t(spark, sf, "documents")
    corpus = docs.select(F.col("source").alias("host"), "text").unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            F.concat(F.lit("m-"), F.col("source")).alias("host"), "text"
        )
    )
    return mirror_host_pairs(corpus, host_col="host")


_SH3_SQL = _sh3("text")
_SIG8_SQL = (
    "[list_min(list_transform(sh, x -> md5('0:' || x))),"
    " list_min(list_transform(sh, x -> md5('1:' || x))),"
    " list_min(list_transform(sh, x -> md5('2:' || x))),"
    " list_min(list_transform(sh, x -> md5('3:' || x))),"
    " list_min(list_transform(sh, x -> md5('4:' || x))),"
    " list_min(list_transform(sh, x -> md5('5:' || x))),"
    " list_min(list_transform(sh, x -> md5('6:' || x))),"
    " list_min(list_transform(sh, x -> md5('7:' || x)))]"
)


@_q(
    "fuzzy_decontaminate",
    f"""WITH evals AS (
      SELECT doc_id AS eval_id, text FROM documents WHERE doc_id % 50 = 0
    ), train AS (
      SELECT doc_id AS id, text FROM documents
      UNION ALL
      SELECT eval_id + 200000, {_VARIANT_SQL} FROM evals
    ), tsh AS (
      SELECT id, {_SH3_SQL} AS sh FROM train
    ), esh AS (
      SELECT eval_id, {_SH3_SQL} AS sh FROM evals
    ), tsig AS (
      SELECT id, sh, {_SIG8_SQL} AS sig FROM tsh
    ), esig AS (
      SELECT eval_id, sh, {_SIG8_SQL} AS sig FROM esh
    ), tband AS (
      SELECT id, b.band, md5(sig[b.band*2+1] || '|' || sig[b.band*2+2]) AS bhash
      FROM tsig, (SELECT UNNEST([0,1,2,3]) AS band) b
    ), eband AS (
      SELECT eval_id, b.band, md5(sig[b.band*2+1] || '|' || sig[b.band*2+2]) AS bhash
      FROM esig, (SELECT UNNEST([0,1,2,3]) AS band) b
    ), cand AS (
      SELECT DISTINCT t.id, e.eval_id
      FROM tband t JOIN eband e ON t.band = e.band AND t.bhash = e.bhash
    )
    SELECT c.id, c.eval_id,
           ROUND(CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
                 / len(list_distinct(list_concat(list_distinct(a.sh), list_distinct(b.sh)))), 4)
             AS jaccard
    FROM cand c JOIN tsh a ON a.id = c.id JOIN esh b ON b.eval_id = c.eval_id
    WHERE CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
          / len(list_distinct(list_concat(list_distinct(a.sh), list_distinct(b.sh)))) >= 0.5""",
)
def fuzzy_decontaminate_q(spark, sf):
    """Near-duplicate decontamination vs a planted eval set (every 50th doc;
    training corpus additionally carries a paraphrased copy — first 7 chars
    dropped — of each eval doc): eval bands/shingles broadcast, train side
    explodes to scalar band rows, exact-Jaccard verify. Catches the
    paraphrased leakage exact n-gram matching misses."""
    from crawl4ai_scraper_spark.operators.dedup import fuzzy_decontaminate

    docs = _t(spark, sf, "documents")
    evals = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    train = docs.select(F.col("doc_id").alias("id"), "text").unionByName(
        evals.select(
            (F.col("eval_id") + 200000).alias("id"), F.expr("substr(text, 8)").alias("text")
        )
    )
    return fuzzy_decontaminate(train, evals, id_col="id")


@_q(
    "mojibake_stats",
    """WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN replace(text, 'a', 'Ã¤') ELSE text END AS text
      FROM documents
    )
    SELECT doc_id AS id, CAST(length(text) AS BIGINT) AS n_chars,
           CAST((length(text) - length(replace(text, '�', '')))
                + (length(text) - length(replace(text, 'Ã', '')))
                + (length(text) - length(replace(text, 'Â', '')))
                + (length(text) - length(replace(text, 'â€', ''))) / 2 AS BIGINT) AS n_bad,
           ROUND(((length(text) - length(replace(text, '�', '')))
                + (length(text) - length(replace(text, 'Ã', '')))
                + (length(text) - length(replace(text, 'Â', '')))
                + (length(text) - length(replace(text, 'â€', ''))) / 2)
                / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS bad_ratio,
           ((length(text) - length(replace(text, '�', '')))
                + (length(text) - length(replace(text, 'Ã', '')))
                + (length(text) - length(replace(text, 'Â', '')))
                + (length(text) - length(replace(text, 'â€', ''))) / 2) = 0 AS is_clean
    FROM corpus""",
)
def mojibake_stats_q(spark, sf):
    """Encoding-damage stats over a corpus with PLANTED mojibake (every 13th
    doc re-encoded UTF-8-as-Latin-1 style): U+FFFD + mojibake-leader counts
    by pure length arithmetic — codegen at scan speed, zero shuffles."""
    from crawl4ai_scraper_spark.operators.textops import mojibake_stats

    docs = _t(spark, sf, "documents")
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.replace(F.col("text"), F.lit("a"), F.lit("Ã¤"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return mojibake_stats(corpus)


@_q(
    "length_powerlaw_fit",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(50 AS INT) AS x_min,
           ROUND(1.0 + COUNT(*)
                 / CAST(SUM(CAST(ROUND(ln(CAST(n_chars AS DOUBLE) / 50.0), 12)
                                 AS DECIMAL(28,12))) AS DOUBLE), 6) AS alpha
    FROM documents WHERE n_chars >= 50""",
)
def length_powerlaw_fit_q(spark, sf):
    """Continuous-MLE power-law exponent over document lengths (Clauset et
    al. 2009): one aggregate, per-row ln ratio rounded to 12dp and summed
    in DECIMAL — two scalars, engine-exact."""
    from crawl4ai_scraper_spark.operators.stats import length_powerlaw_fit

    return length_powerlaw_fit(_t(spark, sf, "documents"), x_min=50)


@_q(
    "zipf_fit",
    r"""WITH counts AS (
      SELECT t.tok, COUNT(*) AS cnt FROM (
        SELECT UNNEST(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                  x -> x <> '')) AS tok
        FROM documents) t GROUP BY t.tok
    ), ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank
      FROM counts QUALIFY rank <= 500
    ), pts AS (
      SELECT CAST(ROUND(ln(CAST(rank AS DOUBLE)), 12) AS DECIMAL(28,12)) AS x,
             CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 12) AS DECIMAL(28,12)) AS y,
             CAST(ROUND(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)), 12)
                  AS DECIMAL(28,12)) AS xy,
             CAST(ROUND(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 12)
                  AS DECIMAL(28,12)) AS xx
      FROM ranked
    ), s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(xy) AS sxy,
             SUM(xx) AS sxx FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / n, 6) AS intercept
    FROM s""",
)
def zipf_fit_q(spark, sf):
    """Zipf slope (OLS of ln count on ln rank, top-500 vocab): token counts
    collapse in one map-side-combined groupBy; ranking and the OLS sums run
    over the vocab-sized count table, never the token stream."""
    from crawl4ai_scraper_spark.operators.stats import zipf_fit

    return zipf_fit(_t(spark, sf, "documents"), top_n=500)


@_q(
    "skew_report",
    """WITH counts AS (
      SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS c FROM events GROUP BY 1
    ), ranked AS (
      SELECT k, c, ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS i FROM counts
    ), s AS (
      SELECT COUNT(*) AS n_keys, SUM(c) AS n_rows, SUM(i * c) AS ic FROM ranked
    ), top AS (
      SELECT k AS top_key, c AS top_c FROM counts ORDER BY c DESC, k DESC LIMIT 1
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
           top_key,
           ROUND(CAST(top_c AS DOUBLE) / n_rows, 6) AS top_share,
           ROUND(2.0 * CAST(ic AS DOUBLE)
                 / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
                 - (CAST(n_keys AS DOUBLE) + 1.0) / CAST(n_keys AS DOUBLE), 6) AS gini
    FROM s, top""",
)
def skew_report_q(spark, sf):
    """Shuffle-key skew diagnostic over events.user_id: hottest key's row
    share (the straggler bound) + Gini of the key-count distribution. The
    Gini cumsum window runs over the |keys|-row count table, not the rows."""
    from crawl4ai_scraper_spark.operators.stats import skew_report

    ev = _t(spark, sf, "events").select(F.col("user_id").cast("string").alias("uid"))
    return skew_report(ev, "uid")


@_q(
    "ann_ivf_multiprobe",
    f"""WITH a AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             CAST(list_indexof(dots, list_aggregate(dots, 'max')) AS INT) AS cell,
             dots
      FROM (SELECT vec_id, embedding, {_centroid_dots_sql()} AS dots FROM embeddings)
    ), q0 AS (
      SELECT vec_id, e, cell, list_concat(dots[1:cell-1], dots[cell+1:]) AS rest
      FROM a WHERE vec_id < 10
    ), q AS (
      SELECT vec_id, e, cell AS p1,
             CAST(CASE WHEN list_indexof(rest, list_aggregate(rest, 'max')) >= cell
                       THEN list_indexof(rest, list_aggregate(rest, 'max')) + 1
                       ELSE list_indexof(rest, list_aggregate(rest, 'max')) END
                  AS INT) AS p2
      FROM q0
    ), probes AS (
      SELECT vec_id, e, p1 AS cell FROM q
      UNION ALL SELECT vec_id, e, p2 FROM q
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY p.vec_id
                                ORDER BY list_dot_product(p.e, b.e)
                                  / (sqrt(list_dot_product(p.e, p.e))
                                     * sqrt(list_dot_product(b.e, b.e))) DESC,
                                  b.vec_id) AS rank
      FROM probes p JOIN a b ON b.cell = p.cell AND b.vec_id <> p.vec_id)
    WHERE rank <= 5""",
)
def ann_ivf_multiprobe_q(spark, sf):
    """Multi-probe IVF (n_probe=2): each query searches its two nearest
    coarse cells — the recall lever for boundary vectors. Data keeps one
    cell per vector; only the (few, broadcast) queries explode; candidate
    generation stays a cell equi-join."""
    from crawl4ai_scraper_spark.operators.similarity import ivf_multiprobe_topk

    return ivf_multiprobe_topk(
        _t(spark, sf, "embeddings"), n_queries=10, k=5, n_probe=2
    )


@_q(
    "url_history_scd2",
    """WITH revs AS (
      SELECT doc_id % 100 AS url_key,
             1700000000 + (doc_id * 37) % 1000 AS warc_ts,
             doc_id
      FROM documents)
    SELECT url_key, doc_id, warc_ts AS valid_from,
           LEAD(warc_ts) OVER (PARTITION BY url_key
                               ORDER BY warc_ts, doc_id) AS valid_to,
           LEAD(warc_ts) OVER (PARTITION BY url_key
                               ORDER BY warc_ts, doc_id) IS NULL AS is_current
    FROM revs""",
)
def url_history_scd2_q(spark, sf):
    """SCD type-2 interval history from the revision stream (same derived
    revs as url_latest_revision): one key-partitioned lead() window — any
    downstream query answers "what did this URL serve at time t" with a
    BETWEEN instead of replaying the log."""
    from crawl4ai_scraper_spark.operators.temporal import scd2_history

    revs = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 100).alias("url_key"),
        (F.lit(1700000000) + (F.col("doc_id") * 37) % 1000).alias("warc_ts"),
        "doc_id",
    )
    return scd2_history(revs, key="url_key", ts_col="warc_ts", tiebreak="doc_id")


@_q(
    "link_degree_stats",
    """WITH e1 AS (
      SELECT doc_id AS src, doc_id - (doc_id % 5) AS dst
      FROM documents WHERE doc_id < 200 AND doc_id % 5 <> 0
    ), dd AS (
      SELECT src AS s, dst AS d FROM e1
      UNION
      SELECT dst, src FROM e1 WHERE src % 2 = 0
    ), ne AS (SELECT COUNT(*) AS n_edges FROM dd
    ), nn AS (SELECT COUNT(*) AS n_nodes FROM (SELECT s AS n FROM dd UNION SELECT d FROM dd)
    ), mo AS (SELECT MAX(c) AS max_outdeg FROM (SELECT COUNT(*) AS c FROM dd GROUP BY s)
    ), mi AS (SELECT MAX(c) AS max_indeg FROM (SELECT COUNT(*) AS c FROM dd GROUP BY d)
    ), rc AS (
      SELECT COUNT(*) AS n_recip FROM dd a
      WHERE EXISTS (SELECT 1 FROM dd b WHERE b.s = a.d AND b.d = a.s)
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
           CAST(max_outdeg AS BIGINT) AS max_outdeg,
           CAST(max_indeg AS BIGINT) AS max_indeg,
           ROUND(CAST(n_recip AS DOUBLE) / n_edges, 6) AS reciprocity
    FROM nn, ne, mo, mi, rc""",
)
def link_degree_stats_q(spark, sf):
    """Link-graph shape summary (node/edge counts, max degrees, reciprocity)
    over the star graph with PLANTED reciprocal edges (even-id star edges
    reversed): two map-side-combined degree aggs + one co-keyed semi-join of
    the edges against their own reversal; scalar one-row output."""
    from crawl4ai_scraper_spark.operators.graph import degree_stats

    ids = _t(spark, sf, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    star = ids.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("dst"),
    )
    directed = star.unionByName(
        star.filter(F.col("src") % 2 == 0).select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    return degree_stats(directed)


@_q(
    "wat_roundtrip_links",
    """SELECT 'https://' || source || '.example/docs/d' || CAST(doc_id AS VARCHAR) AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' (' || lang || ')' AS title,
       CAST(doc_id % 3 + 1 AS BIGINT) AS n_links,
       array_to_string(list_transform(range(1, CAST(doc_id % 3 + 2 AS INT)),
         j -> 'https://' || source || '.example/l/' || CAST(doc_id AS VARCHAR)
              || '/' || CAST(j AS VARCHAR)), '|') AS links_str
    FROM documents WHERE doc_id % 100 < 20""",
)
def wat_roundtrip_links_q(spark, sf):
    """Common-Crawl WAT interchange (sources/wat.py): deterministic
    (url, title, outlinks) rows are serialized into real WAT metadata
    shards by the production packer (per-partition, content-addressed ids,
    CC envelope JSON) and parsed back by the real reader codec — the output
    (url, title, link count, ordered link list) only matches the oracle,
    which derives the same rows from documents directly, if both codec
    directions are faithful. WAT is what link-graph builders consume
    instead of re-parsing WARC HTML."""
    import pandas as pd

    from crawl4ai_scraper_spark.sources.wat import parse_wat_shard, wat_shards

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 100 < 20)
    did = F.col("doc_id").cast("string")
    recs = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/docs/d"), did
        ).alias("url"),
        F.to_timestamp(F.lit("2024-03-05 08:30:00")).alias("warc_ts"),
        F.concat(F.lit("Doc "), did, F.lit(" ("), F.col("lang"), F.lit(")")).alias(
            "title"
        ),
        F.transform(
            F.sequence(F.lit(1), (F.col("doc_id") % 3 + 1).cast("int")),
            lambda j: F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example/l/"), did,
                F.lit("/"), j.cast("string"),
            ),
        ).alias("links"),
    )
    shards = wat_shards(recs.repartition(4), per_record_gzip=True)

    def _unpack(batches):
        for pdf in batches:
            urls, titles, n_links, links_str = [], [], [], []
            for blob in pdf["shard"]:
                for url, _ts, title, links in parse_wat_shard(bytes(blob)):
                    urls.append(url)
                    titles.append(title)
                    n_links.append(len(links))
                    links_str.append("|".join(links))
            yield pd.DataFrame(
                {"url": urls, "title": titles, "n_links": n_links,
                 "links_str": links_str}
            )

    return shards.mapInPandas(
        _unpack, "url string, title string, n_links long, links_str string"
    )


@_q(
    "script_stats",
    r"""WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN replace(text, 'e', 'е')
                  WHEN doc_id % 17 = 0 THEN text || ' 漢字漢字'
                  ELSE text END AS text
      FROM documents
    ), c AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '\p{Latin}')) AS n_latin,
             len(regexp_extract_all(text, '\p{Cyrillic}')) AS n_cyrillic,
             len(regexp_extract_all(text, '\p{Han}')) AS n_han,
             len(regexp_extract_all(text, '\p{Arabic}')) AS n_arabic
      FROM corpus
    )
    SELECT doc_id AS id,
           CAST(n_latin AS BIGINT) AS n_latin,
           CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
           CAST(n_han AS BIGINT) AS n_han,
           CAST(n_arabic AS BIGINT) AS n_arabic,
           CASE WHEN n_latin > 0 AND n_latin >= n_cyrillic AND n_latin >= n_han
                     AND n_latin >= n_arabic THEN 'latin'
                WHEN n_cyrillic > 0 AND n_cyrillic >= n_han
                     AND n_cyrillic >= n_arabic THEN 'cyrillic'
                WHEN n_han > 0 AND n_han >= n_arabic THEN 'han'
                WHEN n_arabic > 0 THEN 'arabic'
                ELSE 'none' END AS script
    FROM c""",
)
def script_stats_q(spark, sf):
    """Unicode script profile over a corpus with PLANTED Cyrillic
    (homoglyph 'е' for every 11th doc) and Han (appended ideographs for
    every 17th): per-script char counts via regexp_count at scan speed —
    Java \\p{IsX} and RE2 \\p{X} script tables agree on these ranges."""
    from crawl4ai_scraper_spark.operators.textops import script_stats

    docs = _t(spark, sf, "documents")
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.replace(F.col("text"), F.lit("e"), F.lit("е"))
        )
        .when(F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" 漢字漢字")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return script_stats(corpus)


@_q(
    "page_meta_hygiene",
    """WITH pg AS (
      SELECT 'https://' || source || '.example/d' || CAST(doc_id AS VARCHAR) AS url,
             CASE WHEN doc_id % 4 = 1
                  THEN 'https://' || source || '.example/d' || CAST(doc_id - 1 AS VARCHAR)
                  ELSE 'https://' || source || '.example/d' || CAST(doc_id AS VARCHAR)
             END AS canonical,
             doc_id % 5 = 0 AS noindex,
             (doc_id % 5 = 0) OR (doc_id % 7 = 0) AS nofollow
      FROM documents WHERE doc_id < 400
    ), surv AS (
      SELECT canonical, url AS survivor_url FROM pg
      QUALIFY ROW_NUMBER() OVER (PARTITION BY canonical
                                 ORDER BY (url <> canonical), url) = 1
    )
    SELECT pg.url, s.survivor_url, pg.url = s.survivor_url AS is_survivor,
           NOT pg.noindex AS indexable, NOT pg.nofollow AS followable
    FROM pg JOIN surv s ON s.canonical = pg.canonical""",
)
def page_meta_hygiene_q(spark, sf):
    """Canonical-collapse + meta-robots gating over REAL HTML built
    deterministically from the documents table (every 4k+1 doc declares
    rel=canonical to its 4k sibling; every 5th is noindex+nofollow, every
    7th nofollow-only): the html parse, relative-canonical resolution, and
    survivor groupBy are all load-bearing — the output only matches the
    oracle (which derives the expected flags directly) if the parser and
    the collapse rule are faithful."""
    from crawl4ai_scraper_spark.operators.webmeta import index_hygiene

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    did = F.col("doc_id").cast("string")
    canon_frag = F.when(
        F.col("doc_id") % 4 == 1,
        F.concat(
            F.lit('<link rel="canonical" href="/d'),
            (F.col("doc_id") - 1).cast("string"),
            F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    robots_frag = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit('<meta name="robots" content="noindex, nofollow">'),
        )
        .when(
            F.col("doc_id") % 7 == 0, F.lit('<meta name="robots" content="nofollow">')
        )
        .otherwise(F.lit(""))
    )
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/d"), did).alias(
            "url"
        ),
        F.encode(
            F.concat(
                F.lit("<html><head>"),
                canon_frag,
                robots_frag,
                F.lit("</head><body><p>content</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    return index_hygiene(pages)


@_q(
    "table_extraction",
    """SELECT 'https://' || source || '.example/t' || CAST(doc_id AS VARCHAR) AS url,
           CAST(0 AS INT) AS table_idx, CAST(r.r - 1 AS INT) AS row_idx,
           [CAST(doc_id AS VARCHAR), CAST(doc_id * r.r AS VARCHAR)] AS cells
    FROM documents, UNNEST(range(1, doc_id % 3 + 2)) AS r(r)
    WHERE doc_id < 300""",
)
def table_extraction_q(spark, sf):
    """Structured <table> scrape over deterministically-rendered HTML
    (1 + doc_id%3 rows of two cells per doc): the stdlib table parser and
    the row/cell assembly are load-bearing — output (url, table_idx,
    row_idx, cells) matches the oracle's direct derivation only if the
    grid parse is faithful."""
    from crawl4ai_scraper_spark.operators.webmeta import extract_tables

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    did = F.col("doc_id").cast("string")
    rows_html = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (F.col("doc_id") % 3 + 1).cast("int")),
            lambda r: F.concat(
                F.lit("<tr><td>"), did, F.lit("</td><td>"),
                (F.col("doc_id") * r).cast("string"), F.lit("</td></tr>"),
            ),
        ),
        "",
    )
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/t"), did).alias(
            "url"
        ),
        F.encode(
            F.concat(
                F.lit("<html><body><table>"), rows_html, F.lit("</table></body></html>")
            ),
            "UTF-8",
        ).alias("html"),
    )
    return extract_tables(pages)


