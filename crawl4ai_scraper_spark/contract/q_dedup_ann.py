"""Deduplication, similarity search (ANN), multimodal plumbing.

Split from the round-3 single-module contract registry (VERDICT r3
next-round #7); registration order preserved by the package
__init__'s import order.
"""

from __future__ import annotations

from crawl4ai_scraper_spark.contract._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Deduplication operators
# ---------------------------------------------------------------------------

@_q(
    "dedup_exact",
    """SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
    FROM (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 2 = 0)
    GROUP BY md5(text)""",
)
def dedup_exact_q(spark, sf):
    """Exact dedup by content hash; duplicates injected (every even doc twice)
    so the survivor/min-id logic is actually exercised."""
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return D.dedup_exact(docs.unionByName(dupes), "text", "doc_id")


def _sh3(expr: str) -> str:
    """DuckDB SQL replaying dedup.shingles(expr, k=3): word tri-shingles,
    with the same short-doc convention — a doc under 3 tokens yields ONE
    whole-text shingle, never an empty list (an empty list would null the
    minhash signature and silently drop the doc from every band join)."""
    toks = f"string_split_regex(trim(lower({expr})), '\\s+')"
    return (
        f"CASE WHEN len({toks}) < 3"
        f" THEN [array_to_string({toks}, ' ')]"
        f" ELSE list_transform(range(1, len({toks}) - 1),"
        f" i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]) END"
    )


_VARIANT_SQL = "substr(text, 8)"  # near-duplicate: drop the first 7 chars

@_q(
    "dedup_minhash_lsh",
    f"""WITH corpus AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 100000, {_VARIANT_SQL} FROM documents WHERE doc_id < 60
    ), sh AS (
      SELECT doc, {_sh3('text')} AS sh
      FROM corpus
    ), sig AS (
      SELECT doc, sh,
        [list_min(list_transform(sh, x -> md5('0:' || x))),
         list_min(list_transform(sh, x -> md5('1:' || x))),
         list_min(list_transform(sh, x -> md5('2:' || x))),
         list_min(list_transform(sh, x -> md5('3:' || x))),
         list_min(list_transform(sh, x -> md5('4:' || x))),
         list_min(list_transform(sh, x -> md5('5:' || x))),
         list_min(list_transform(sh, x -> md5('6:' || x))),
         list_min(list_transform(sh, x -> md5('7:' || x)))] AS sig
      FROM sh
    ), banded AS (
      SELECT doc, sh, b.band, md5(sig[b.band*2+1] || '|' || sig[b.band*2+2]) AS bhash
      FROM sig, (SELECT UNNEST([0,1,2,3]) AS band) b
    ), cand AS (
      SELECT DISTINCT l.doc AS id_a, r.doc AS id_b
      FROM banded l JOIN banded r ON l.band = r.band AND l.bhash = r.bhash AND l.doc < r.doc
    )
    SELECT c.id_a, c.id_b,
           ROUND(CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
                 / len(list_distinct(list_concat(list_distinct(a.sh), list_distinct(b.sh)))), 4) AS jaccard
    FROM cand c JOIN sh a ON a.doc = c.id_a JOIN sh b ON b.doc = c.id_b
    WHERE CAST(len(list_intersect(list_distinct(a.sh), list_distinct(b.sh))) AS DOUBLE)
          / len(list_distinct(list_concat(list_distinct(a.sh), list_distinct(b.sh)))) >= 0.5""",
)
def dedup_minhash_lsh_q(spark, sf):
    """MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join) over the
    corpus + planted near-duplicates (first 7 chars dropped)."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("doc"), "text"
    )
    variants = docs.select((F.col("doc") + 100000).alias("doc"),
                           F.expr("substr(text, 8)").alias("text"))
    corpus = docs.unionByName(variants)
    return D.minhash_lsh_pairs(corpus, "text", "doc", k=3, n_hashes=8, n_bands=4,
                               jaccard_threshold=0.5)


@_q(
    "minhash_recall",
    f"""WITH corpus AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 100000, {_VARIANT_SQL} FROM documents WHERE doc_id < 60
    ), sh AS (
      SELECT doc, list_distinct({_sh3('text')}) AS shset
      FROM corpus
    ), truth AS (
      SELECT a.doc AS id_a, b.doc AS id_b
      FROM sh a JOIN sh b ON a.doc < b.doc
      WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shset, b.shset))) >= 0.5
    ), sig AS (
      SELECT doc, shset,
        [list_min(list_transform(shset, x -> md5('0:' || x))),
         list_min(list_transform(shset, x -> md5('1:' || x))),
         list_min(list_transform(shset, x -> md5('2:' || x))),
         list_min(list_transform(shset, x -> md5('3:' || x))),
         list_min(list_transform(shset, x -> md5('4:' || x))),
         list_min(list_transform(shset, x -> md5('5:' || x))),
         list_min(list_transform(shset, x -> md5('6:' || x))),
         list_min(list_transform(shset, x -> md5('7:' || x)))] AS sig
      FROM sh
    ), banded AS (
      SELECT doc, b.band, md5(sig[b.band*2+1] || '|' || sig[b.band*2+2]) AS bhash
      FROM sig, (SELECT UNNEST([0,1,2,3]) AS band) b
    ), cand AS (
      SELECT DISTINCT l.doc AS id_a, r.doc AS id_b
      FROM banded l JOIN banded r ON l.band = r.band AND l.bhash = r.bhash AND l.doc < r.doc
    ), found AS (
      SELECT c.id_a, c.id_b, 1 AS _in
      FROM cand c JOIN sh a ON a.doc = c.id_a JOIN sh b ON b.doc = c.id_b
      WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shset, b.shset))) >= 0.5
    )
    SELECT COUNT(*) AS n_true_pairs,
           CAST(COALESCE(SUM(COALESCE(f._in, 0)), 0) AS BIGINT) AS n_found_pairs,
           COALESCE(ROUND(CAST(SUM(COALESCE(f._in, 0)) AS DOUBLE)
                 / greatest(COUNT(*), 1), 4), 1.0) AS recall
    FROM truth t LEFT JOIN found f ON t.id_a = f.id_a AND t.id_b = f.id_b""",
)
def minhash_recall_q(spark, sf):
    """Measured recall of the banded-MinHash path vs brute-force exact-Jaccard
    truth on the same planted-near-dup corpus — the text-side twin of
    lsh_recall (precision is 1.0 by construction; recall is the tuning axis
    for (n_hashes, n_bands))."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("doc"), "text"
    )
    variants = docs.select((F.col("doc") + 100000).alias("doc"),
                           F.expr("substr(text, 8)").alias("text"))
    corpus = docs.unionByName(variants)
    return D.minhash_recall(corpus, "text", "doc", jaccard_threshold=0.5,
                            k=3, n_hashes=8, n_bands=4)


@_q(
    "ngram_jaccard_pairs",
    f"""WITH sh AS (
      SELECT doc_id,
        list_distinct({_sh3('text')}) AS sa,
        list_distinct({_sh3(_VARIANT_SQL)}) AS sb
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           ROUND(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa, sb))), 4) AS jaccard
    FROM sh""",
)
def ngram_jaccard_pairs(spark, sf):
    """Exact n-gram Jaccard between each doc and its planted variant."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        D.ngram_jaccard(F.col("text"), F.expr("substr(text, 8)"), 3).alias("jaccard"),
    )


@_q(
    "dedup_simhash",
    """WITH toks AS (
      SELECT doc_id AS doc, UNNEST(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS tok
      FROM documents WHERE doc_id < 100
    ), bits AS (
      SELECT doc, tok, UNNEST(range(0, 32)) AS b FROM toks
    ), votes AS (
      SELECT doc, b,
        SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), CAST(floor(b/4) AS INT) + 1, 1)) - 1)
                      & (1 << (b % 4)) > 0 THEN 1 ELSE -1 END) AS vote
      FROM bits GROUP BY doc, b
    )
    -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which the driver canonicalizes
    -- differently from Spark's BIGINT — pin the output type explicitly.
    SELECT doc, CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc""",
)
def dedup_simhash_q(spark, sf):
    """32-bit SimHash per document (explode token×bit, native aggregation)."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return D.simhash(docs, "text", "doc_id", n_bits=32)


@_q(
    "dedup_simhash_pairs",
    """WITH corpus AS (
      SELECT doc_id AS doc, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 100000, substr(text, 8) FROM documents WHERE doc_id < 60
    ), toks AS (
      SELECT doc, UNNEST(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS tok
      FROM corpus
    ), bits AS (
      SELECT doc, tok, UNNEST(range(0, 32)) AS b FROM toks
    ), votes AS (
      SELECT doc, b,
        SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), CAST(floor(b/4) AS INT) + 1, 1)) - 1)
                      & (1 << (b % 4)) > 0 THEN 1 ELSE -1 END) AS vote
      FROM bits GROUP BY doc, b
    ), sims AS (
      SELECT doc, CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc
    ), pieces AS (
      SELECT doc, p, (simhash >> (CAST(p AS INT) * 8)) & 255 AS piece
      FROM sims, UNNEST(range(0, 4)) AS t(p)
    ), cand AS (
      SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
      FROM pieces a JOIN pieces b ON a.p = b.p AND a.piece = b.piece AND a.doc < b.doc
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM cand JOIN sims sa ON sa.doc = id_a JOIN sims sb ON sb.doc = id_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3""",
)
def dedup_simhash_pairs_q(spark, sf):
    """SimHash near-dup pairing: hamming ≤ 3 via EXACT 4-piece pigeonhole
    banding (operators.dedup.simhash_near_dup_pairs) over the corpus +
    planted near-duplicates."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("doc"), "text"
    )
    variants = docs.select((F.col("doc") + 100000).alias("doc"),
                           F.expr("substr(text, 8)").alias("text"))
    corpus = docs.unionByName(variants)
    return D.simhash_near_dup_pairs(corpus, "text", "doc", n_bits=32,
                                    n_pieces=4, max_hamming=3)


@_q(
    "dedup_embedding_cosine",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings WHERE vec_id < 40),
    c AS (SELECT vec_id, e FROM v
          UNION ALL
          SELECT vec_id + 100000, list_transform(e, x -> x * 1.02 + 0.003) FROM v)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                 4) AS cos
    FROM c a JOIN c b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.98""",
)
def dedup_embedding_cosine_q(spark, sf):
    """Embedding-cosine near-dup pairs over the corpus + planted perturbed
    copies (x → 1.02·x + 0.003 — deterministic double math in both engines);
    exact-verify step of the LSH-bucketed near-dup pipeline."""
    base = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 40).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    variants = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("e", lambda x: x * F.lit(1.02) + F.lit(0.003)).alias("e"),
    )
    corpus = base.unionByName(variants)
    return D.embedding_near_dup_pairs(corpus, "vec_id", "e", threshold=0.98)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COS_SQL = """list_dot_product(a.e, b.e)
  / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"""


@_q(
    "ann_cosine_topk",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
      FROM v a JOIN v b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < 10)
    WHERE rank <= 5""",
)
def ann_cosine_topk(spark, sf):
    """Brute-force exact cosine top-k (the ANN correctness baseline)."""
    return S.cosine_topk(_t(spark, sf, "embeddings"), n_queries=10, k=5)


@_q(
    "ann_ivf_topk",
    f"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY {_COS_SQL} DESC, b.vec_id) AS rank
      FROM v a JOIN v b ON b.vec_id <> a.vec_id AND a.label = b.label
      WHERE a.vec_id < 10)
    WHERE rank <= 5""",
)
def ann_ivf_topk(spark, sf):
    """IVF-cell-restricted ANN (label = coarse quantizer cell)."""
    return S.ivf_topk(_t(spark, sf, "embeddings"), n_queries=10, k=5)


def _centroid_dots_sql(n_cells: int = 8, dim: int = 64, seed: int = 7,
                       vec_expr: str = "CAST(embedding AS DOUBLE[])") -> str:
    """DuckDB list literal of dot(v, centroid_j) — same literal centroids as
    operators.similarity.ivf_assign."""
    cents = S.hyperplanes(n_cells, dim, seed)
    dots = []
    for c in cents:
        arr = "[" + ", ".join(f"{x:.3f}" for x in c) + "]"
        dots.append(f"list_dot_product({vec_expr}, {arr})")
    return "[" + ", ".join(dots) + "]"


@_q(
    "ann_ivf_assign",
    f"""SELECT vec_id,
           CAST(list_indexof(dots, list_aggregate(dots, 'max')) AS INT) AS cell
    FROM (SELECT vec_id, {_centroid_dots_sql()} AS dots FROM embeddings)""",
)
def ann_ivf_assign(spark, sf):
    """IVF coarse-quantizer assignment from deterministic literal centroids —
    argmax dot, ties to the smallest cell (1-based), reproducible in SQL."""
    return S.ivf_assign(_t(spark, sf, "embeddings"))


@_q(
    "ann_ivf_assign_topk",
    f"""WITH a AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             CAST(list_indexof(dots, list_aggregate(dots, 'max')) AS INT) AS cell
      FROM (SELECT vec_id, embedding, {_centroid_dots_sql()} AS dots FROM embeddings))
    SELECT query_id, neighbor_id, rank FROM (
      SELECT qa.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY qa.vec_id
                                ORDER BY list_dot_product(qa.e, b.e)
                                  / (sqrt(list_dot_product(qa.e, qa.e))
                                     * sqrt(list_dot_product(b.e, b.e))) DESC,
                                  b.vec_id) AS rank
      FROM a qa JOIN a b ON b.vec_id <> qa.vec_id AND qa.cell = b.cell
      WHERE qa.vec_id < 10)
    WHERE rank <= 5""",
)
def ann_ivf_assign_topk(spark, sf):
    """Full IVF: computed assignment (narrow map) → cell-restricted top-k."""
    return S.ivf_topk_assigned(_t(spark, sf, "embeddings"), n_queries=10, k=5)


@_q(
    "embedding_cluster_balance",
    f"""WITH a AS (
      SELECT vec_id,
             CAST(list_indexof(dots, list_aggregate(dots, 'max')) AS INT) AS cell
      FROM (SELECT vec_id, {{dots}} AS dots FROM embeddings)
    ), c AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_docs FROM a GROUP BY cell),
    t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total,
                 CAST(COUNT(*) AS DOUBLE) AS k FROM c),
    r AS (SELECT cell, n_docs,
                 CAST(LEAST(4096, FLOOR(total / k / n_docs * 4096)) AS INT)
                   AS keep_steps
          FROM c CROSS JOIN t)
    SELECT a.vec_id, a.cell, r.n_docs, r.keep_steps
    FROM a JOIN r USING (cell)
    WHERE r.keep_steps >= 4096
       OR substr(md5('cb1:' || CAST(a.vec_id AS VARCHAR)), 1, 3)
          < lpad(lower(to_hex(r.keep_steps)), 3, '0')""".replace(
        "{dots}", _centroid_dots_sql()
    ),
)
def embedding_cluster_balance(spark, sf):
    """Cluster-balanced corpus sampling (similarity.cluster_balance over
    ivf_assign): per-cluster keep rates flattening the cluster-size
    distribution toward uniform, applied as the deterministic md5-threshold
    sample. One cell-key groupBy for the k-row rate table, broadcast back;
    the keep decision is a projected compare at scan speed."""
    emb = _t(spark, sf, "embeddings")
    return S.cluster_balance(S.ivf_assign(emb))


@_q(
    "ann_ivf_kmeans_step",
    f"""WITH a AS (
      SELECT CAST(embedding AS DOUBLE[]) AS e,
             CAST(list_indexof(dots, list_aggregate(dots, 'max')) AS INT) AS cell
      FROM (SELECT embedding, {_centroid_dots_sql()} AS dots FROM embeddings)
    ), x AS (
      SELECT cell, CAST(i AS INT) AS dim_idx,
             CAST(e[CAST(i AS INT) + 1] AS DECIMAL(25,12)) AS v
      FROM a, UNNEST(range(0, 64)) AS t(i))
    SELECT cell, dim_idx,
           ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS centroid,
           COUNT(*) AS n_members
    FROM x GROUP BY cell, dim_idx""",
)
def ann_ivf_kmeans_step(spark, sf):
    """One Lloyd iteration of the IVF coarse quantizer: assign → per-(cell,
    dim) mean with exact DECIMAL sums (order-free, engine-reproducible)."""
    return S.ivf_kmeans_step(_t(spark, sf, "embeddings"))


def _planes_sql(n_planes: int = 8, dim: int = 64,
                vec_expr: str = "CAST(embedding AS DOUBLE[])") -> str:
    planes = S.hyperplanes(n_planes, dim)
    rows = []
    for plane in planes:
        arr = "[" + ", ".join(f"{x:.3f}" for x in plane) + "]"
        rows.append(
            f"CASE WHEN list_dot_product({vec_expr}, {arr}) > 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(rows)


@_q(
    "ann_lsh_buckets",
    f"""SELECT vec_id, {_planes_sql()} AS bucket FROM embeddings""",
)
def ann_lsh_buckets(spark, sf):
    """Sign-random-projection LSH buckets from deterministic literal planes."""
    return S.lsh_hyperplane_buckets(_t(spark, sf, "embeddings"))


@_q(
    "dedup_embedding_lsh",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings WHERE vec_id < 40),
    c AS (SELECT vec_id, e FROM v
          UNION ALL
          SELECT vec_id + 100000, list_transform(e, x -> x * 1.02 + 0.003) FROM v),
    bk AS (SELECT vec_id, e, {_planes_sql(vec_expr="e")} AS bucket FROM c)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_COS_SQL}, 4) AS cos
    FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.98""",
)
def dedup_embedding_lsh_q(spark, sf):
    """The SCALE near-dup pipeline: LSH bucket equi-join → exact-cosine
    verify (operators.dedup.embedding_near_dup_bucketed). Same planted
    corpus as dedup_embedding_cosine; the brute-force variant stays as the
    recall baseline."""
    base = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 40).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    variants = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("e", lambda x: x * F.lit(1.02) + F.lit(0.003)).alias("e"),
    )
    corpus = base.unionByName(variants)
    return D.embedding_near_dup_bucketed(corpus, "vec_id", "e", threshold=0.98)


@_q(
    "lsh_recall",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings WHERE vec_id < 40),
    c AS (SELECT vec_id, e FROM v
          UNION ALL
          SELECT vec_id + 100000, list_transform(e, x -> x * 1.02 + 0.003) FROM v),
    truth AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM c a JOIN c b ON a.vec_id < b.vec_id
      WHERE {_COS_SQL} >= 0.98),
    bk AS (SELECT vec_id, e, {_planes_sql(vec_expr="e")} AS bucket FROM c),
    found AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {_COS_SQL} >= 0.98)
    SELECT COUNT(*) AS n_true_pairs,
           CAST(COALESCE(SUM(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_found_pairs,
           COALESCE(ROUND(CAST(SUM(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / GREATEST(COUNT(*), 1), 4), 1.0) AS recall
    FROM truth t LEFT JOIN found f ON f.id_a = t.id_a AND f.id_b = t.id_b""",
)
def lsh_recall_q(spark, sf):
    """Measured recall of the LSH-bucketed near-dup path vs the brute-force
    truth on the planted-twin corpus (operators.dedup.lsh_recall) — the
    tuning loop that decides n_planes / n_probe_seeds before a full-corpus
    run; precision is 1.0 by construction (candidates exact-verify)."""
    base = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 40).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    variants = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("e", lambda x: x * F.lit(1.02) + F.lit(0.003)).alias("e"),
    )
    corpus = base.unionByName(variants)
    return D.lsh_recall(corpus, "vec_id", "e", threshold=0.98)


@_q(
    "semdedup_survivors",
    f"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings WHERE vec_id < 30),
    c AS (SELECT vec_id, e FROM v
          UNION ALL
          SELECT vec_id + 100000, list_transform(e, x -> x * 1.02 + 0.003) FROM v),
    s AS (SELECT vec_id, e, dots,
                 CAST(list_indexof(dots, list_aggregate(dots, 'max')) AS INT) AS cell
          FROM (SELECT vec_id, e, {{dots_sql}} AS dots FROM c)),
    p AS (SELECT vec_id, e, cell,
                 dots[cell] / sqrt(list_dot_product(e, e)) AS cs FROM s),
    losers AS (
      SELECT DISTINCT x.vec_id
      FROM p x JOIN p y ON x.cell = y.cell AND y.vec_id <> x.vec_id
      WHERE (y.cs < x.cs OR (y.cs = x.cs AND y.vec_id < x.vec_id))
        AND list_dot_product(x.e, y.e)
            / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e)))
            >= 0.96)
    SELECT p.vec_id, p.cell, l.vec_id IS NULL AS keep
    FROM p LEFT JOIN losers l ON p.vec_id = l.vec_id""".replace(
        "{dots_sql}", _centroid_dots_sql(vec_expr="e")
    ),
)
def semdedup_survivors(spark, sf):
    """SemDeDup (Abbas et al. 2023): cell-bounded semantic dedup — within
    each coarse cell, a vector loses to any ≥0.96-cosine neighbor that is
    LESS centroid-similar (keep-most-atypical, id tiebreak). Planted-twin
    corpus (the LSH recall fixture); operators.similarity.semdedup."""
    base = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 30).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    variants = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("e", lambda x: x * F.lit(1.02) + F.lit(0.003)).alias("e"),
    )
    corpus = base.unionByName(variants)
    return S.semdedup(corpus, "vec_id", "e", threshold=0.96)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

@_q(
    "multimodal_decode_meta",
    """SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS sha,
           (ascii(substr(md5(text), 1, 1)) % 8 + 1) * 64 AS width,
           (ascii(substr(md5(text), 2, 1)) % 8 + 1) * 64 AS height,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
    FROM documents""",
)
def multimodal_decode_meta(spark, sf):
    """Binary media column → typed metadata through the Arrow decode pass
    (deterministic fake decode; real decode stubbed behind import-try)."""
    return media_metadata(_t(spark, sf, "documents"))


_META_SQL = """SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS sha,
           (ascii(substr(md5(text), 1, 1)) % 8 + 1) * 64 AS width,
           (ascii(substr(md5(text), 2, 1)) % 8 + 1) * 64 AS height,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
    FROM documents"""


@_q(
    "multimodal_resize_meta",
    f"""WITH m AS ({_META_SQL})
    SELECT media_id, n_bytes, sha, width, height, kind,
           -- floor, not CAST: DuckDB's double→int cast ROUNDS, pandas truncates
           CAST(floor(width * least(256.0 / greatest(width, height), 1.0)) AS INT) AS new_width,
           CAST(floor(height * least(256.0 / greatest(width, height), 1.0)) AS INT) AS new_height
    FROM m""",
)
def multimodal_resize_meta(spark, sf):
    """Aspect-preserving downscale plan over the decoded metadata — the
    resize stage of the media pipeline (pixel work stubbed, plumbing real)."""
    from crawl4ai_scraper_spark.operators.multimodal import resized_media

    return resized_media(_t(spark, sf, "documents"), max_dim=256)


@_q(
    "multimodal_frame_sample",
    f"""WITH m AS ({_META_SQL})
    SELECT media_id, CAST(f.frame_idx AS INT) AS frame_idx,
           md5(sha || ':' || CAST(f.frame_idx AS VARCHAR)) AS frame_sha
    FROM m, UNNEST(range(0, least(n_bytes // 100 + 1, 64), 4)) AS f(frame_idx)
    WHERE kind = 'video'""",
)
def multimodal_frame_sample(spark, sf):
    """Every-4th-frame sampling of the video rows → one content-addressed row
    per sampled frame (the frame decode itself is the stubbed part)."""
    from crawl4ai_scraper_spark.operators.multimodal import video_frames

    return video_frames(_t(spark, sf, "documents"), every_n=4)


@_q(
    "multimodal_embed",
    # Output is EXPLODED (media_id, dim_idx, value) rather than array<double>:
    # the driver's canonicalizer pandas-sorts every column and list values are
    # unhashable there, so the contract row must be scalar-only.
    f"""WITH m AS ({_META_SQL})
    SELECT media_id, CAST(i AS INT) AS dim_idx,
           (strpos('0123456789abcdef', substr(sha, CAST(i AS INT) + 1, 1)) - 1) / 15.0 AS value
    FROM m, UNNEST(range(0, 8)) AS t(i)""",
)
def multimodal_embed(spark, sf):
    """Hash-derived 8-dim feature vector per media row (native column math —
    a model swap would move this into an Arrow pass); feeds the ANN ops.
    Exploded to one scalar row per dimension for the driver contract."""
    from crawl4ai_scraper_spark.operators.multimodal import media_embeddings

    emb = media_embeddings(_t(spark, sf, "documents"), dim=8)
    return emb.select(
        "media_id", F.posexplode("embedding").alias("dim_idx", "value")
    )


@_q(
    "multimodal_png_decode",
    # Closed-form ground truth: the generated PNG's pixel value is
    # x-independent — v(y,c) = (3d + 11y + 7c) % 256 — so the stats the
    # stdlib decoder must recover (after inverting all five scanline
    # filters) are computable directly from (d, w, h, ch).
    """WITH p AS (
      SELECT doc_id AS d, 2 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents WHERE doc_id < 120
    ),
    v AS (
      SELECT p.d, p.w, p.h, p.ch, ((3 * p.d + 11 * y.y + 7 * c.c) % 256) AS val
      FROM p, LATERAL (SELECT unnest(range(p.h)) AS y) y,
              LATERAL (SELECT unnest(range(p.ch)) AS c) c
    )
    SELECT CAST(d AS BIGINT) AS media_id, CAST(w AS INT) AS width,
           CAST(h AS INT) AS height, CAST(ch AS INT) AS channels,
           CAST(8 AS INT) AS bit_depth,
           CAST(w * SUM(val) AS BIGINT) AS px_sum,
           CAST(MIN(val) AS INT) AS px_min, CAST(MAX(val) AS INT) AS px_max
    FROM v GROUP BY d, w, h, ch ORDER BY media_id""",
)
def multimodal_png_decode(spark, sf):
    """REAL image decode without pillow (VERDICT r3 next-round #6): per doc
    id, synthesize a deterministic PNG — per-row filter type cycles through
    all five PNG scanline filters — then zlib-inflate and de-filter it with
    the pure-stdlib ``png_decode`` and report the decoded header + pixel
    stats. The oracle recomputes the expected stats in closed form, so any
    filter-inversion or header bug fails the row. (≙ the real-decode leg of
    the reference's media handling, minus the external image libs.)"""
    from crawl4ai_scraper_spark.operators.multimodal import png_roundtrip_stats

    ids = _t(spark, sf, "documents").filter(F.col("doc_id") < 120).select(
        F.col("doc_id").alias("media_id")
    )
    return png_roundtrip_stats(ids).orderBy("media_id")


@_q(
    "multimodal_gif_decode",
    # Closed-form ground truth for the stdlib GIF codec: the generated
    # frame's pixel index is (5d + 3x + 11y) mod nc, so the stats the
    # decoder must recover — after real LZW decompression (dictionary
    # growth, CLEAR resets, KwKwK) — are computable directly from
    # (d, w, h, nc).
    """WITH p AS (
      SELECT doc_id AS d, 2 + doc_id % 9 AS w, 1 + doc_id % 6 AS h,
             CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 16 ELSE 256 END AS nc
      FROM documents WHERE doc_id < 120
    ),
    v AS (
      SELECT p.d, p.w, p.h, ((5 * p.d + 3 * x.x + 11 * y.y) % p.nc) AS val
      FROM p, LATERAL (SELECT unnest(range(p.w)) AS x) x,
              LATERAL (SELECT unnest(range(p.h)) AS y) y
    )
    SELECT CAST(d AS BIGINT) AS media_id, CAST(w AS INT) AS width,
           CAST(h AS INT) AS height, CAST(1 AS INT) AS channels,
           CAST(8 AS INT) AS bit_depth, CAST(1 AS INT) AS n_frames,
           CAST(SUM(val) AS BIGINT) AS px_sum, CAST(MIN(val) AS INT) AS px_min,
           CAST(MAX(val) AS INT) AS px_max
    FROM v GROUP BY d, w, h ORDER BY media_id""",
)
def multimodal_gif_decode(spark, sf):
    """REAL GIF decode without pillow (VERDICT r4 next-round #6, the PNG
    pattern applied to a second format): per doc id, synthesize a
    deterministic GIF87a/89a — real LZW compression — then LZW-decompress it
    with the pure-stdlib ``gif_decode`` and report the decoded screen
    descriptor + frame pixel stats. The oracle recomputes the stats in
    closed form, so an LZW bitstream, code-width, or block-parsing bug
    anywhere fails the row. (≙ the reference's media handling for GIFs,
    minus the external image libs.)"""
    from crawl4ai_scraper_spark.operators.multimodal import gif_roundtrip_stats

    ids = _t(spark, sf, "documents").filter(F.col("doc_id") < 120).select(
        F.col("doc_id").alias("media_id")
    )
    return gif_roundtrip_stats(ids).orderBy("media_id")


