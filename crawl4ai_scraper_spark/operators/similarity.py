"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``      — brute-force exact baseline: broadcast the (small)
                         query set against all vectors; dot products via
                         ``zip_with``/``aggregate`` (native, codegen'd); top-k
                         by a per-query window. At scale the data side streams
                         — no shuffle until the tiny top-k aggregation.
* ``ivf_topk``         — IVF-style scale path: restrict the search to the
                         query's coarse cell (here the pre-assigned ``label``
                         plays the centroid-assignment role), turning the
                         cross product into a cell-local equi-join.
* ``lsh_hyperplane_buckets`` — sign-random-projection buckets from
                         DETERMINISTIC literal hyperplanes (seeded, embedded
                         in the plan), so the DuckDB oracle can reproduce the
                         exact bucket ids; ANN = search within bucket.

Ranking ties are broken by neighbor id so results are hash-stable across
engines despite float math.
"""

from __future__ import annotations

import hashlib
from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-norm the vector (pure column math, no shuffle) — the standard
    pre-step before cosine ANN so dot ≡ cosine downstream."""
    n = norm(a)
    return F.transform(a, lambda x: x / n)


def quantize_int8(a: Column) -> Column:
    """Symmetric int8 quantization: q = floor(x·127/max|x| + 0.5), clamped to
    [-127, 127] — 8× smaller vectors for the candidate-generation stages of a
    100 TB ANN index (exact re-rank stays on the float column). floor(x+0.5)
    rather than round(): identical half-way behavior in every engine
    (Spark's round is HALF_UP, DuckDB's is banker's)."""
    mx = F.array_max(F.transform(a, F.abs))
    return F.transform(
        a,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x * F.lit(127.0) / mx + F.lit(0.5)).cast("int")),
        ),
    )


def embedding_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension exploded view of (unit-normalized value, int8 code) —
    the contract-facing form (scalar rows, no array columns in the output)."""
    base = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("e"),
    ).select(
        id_col,
        F.arrays_zip(
            # + 0.0 collapses IEEE negative zero after rounding
            F.transform(l2_normalize(F.col("e")), lambda v: F.round(v, 4) + F.lit(0.0)),
            quantize_int8(F.col("e")),
        ).alias("z"),
    )
    return base.select(
        id_col, F.posexplode("z").alias("dim_idx", "pair")
    ).select(
        id_col,
        F.col("dim_idx").cast("int").alias("dim_idx"),
        F.col("pair.0").alias("unit_val"),
        F.col("pair.1").alias("q8"),
    )


def cosine_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` ids.
    Returns (query_id, neighbor_id, rank)."""
    queries = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    data = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        data.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot(F.col("qvec").cast("array<double>"), F.col("nvec").cast("array<double>"))
            / (norm(F.col("qvec").cast("array<double>")) * norm(F.col("nvec").cast("array<double>"))),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """ANN restricted to the query's coarse cell — the IVF pruning pattern.
    Returns (query_id, neighbor_id, rank)."""
    queries = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col(cell_col).alias("cell")
    )
    data = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"), F.col(cell_col).alias("cell")
    )
    scored = (
        data.join(F.broadcast(queries), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot(F.col("qvec").cast("array<double>"), F.col("nvec").cast("array<double>"))
            / (norm(F.col("qvec").cast("array<double>")) * norm(F.col("nvec").cast("array<double>"))),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> List[List[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible in any
    engine; values in [-1, 1) with 3 decimals (exactly representable enough
    for stable signs)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            v = (int(h[:8], 16) % 2000 - 1000) / 1000.0
            row.append(round(v, 3))
        planes.append(row)
    return planes


def ivf_assign(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Coarse-quantizer assignment — the missing first stage of IVF. Cell =
    argmax over deterministic centroids of dot(v, c_j), ties to the smallest
    cell id (1-based). Centroids come from the same md5-derived literal
    construction as the LSH planes, so the assignment is exactly reproducible
    in any engine (a k-means refinement would iterate this same assignment
    step against recomputed means — the JOIN SHAPE below is what matters at
    scale: assignment is a narrow map, no shuffle).
    Returns (vec_id, cell int)."""
    cents = hyperplanes(n_cells, dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    dots = F.array(*[dot(vec, F.array(*[F.lit(x) for x in c])) for c in cents])
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), dots.alias("_dots"))
        .select(
            "vec_id",
            F.expr("CAST(array_position(_dots, array_max(_dots)) AS INT)").alias("cell"),
        )
    )


def ivf_topk_assigned(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Full IVF pipeline: computed coarse-cell assignment (the ivf_assign
    expression, applied as a NARROW map — no join, no shuffle) →
    cell-restricted search (ivf_topk). The 100-TB ANN shape end to end."""
    cents = hyperplanes(n_cells, dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    dots = F.array(*[dot(vec, F.array(*[F.lit(x) for x in c])) for c in cents])
    assigned = (
        embeddings.select(id_col, vec_col, dots.alias("_dots"))
        .withColumn("cell", F.expr("CAST(array_position(_dots, array_max(_dots)) AS INT)"))
        .drop("_dots")
    )
    return ivf_topk(assigned, id_col, vec_col, cell_col="cell",
                    n_queries=n_queries, k=k)


def ivf_kmeans_step(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """One Lloyd iteration of coarse-quantizer training: assign every vector
    to its argmax-dot cell (narrow map, same expression as ``ivf_assign``),
    then the per-(cell, dim) mean of the members — the refreshed centroids.

    Scale shape: ONE hash aggregation keyed on (cell, dim_idx). Map-side
    combine collapses each partition to ≤ n_cells×dim rows before the
    shuffle, so the shuffle volume is independent of corpus size. Sums run
    in DECIMAL (exact, order-free) so the refreshed centroids are
    bit-reproducible across engines and partitionings — double sums would
    depend on reduction order. Returns (cell, dim_idx, centroid, n_members).
    """
    cents = hyperplanes(n_cells, dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    dots = F.array(*[dot(vec, F.array(*[F.lit(x) for x in c])) for c in cents])
    assigned = embeddings.select(vec.alias("e"), dots.alias("_dots")).withColumn(
        "cell", F.expr("CAST(array_position(_dots, array_max(_dots)) AS INT)")
    )
    exploded = assigned.select("cell", F.posexplode("e").alias("dim_idx", "value"))
    return (
        exploded.groupBy("cell", "dim_idx")
        .agg(
            F.sum(F.col("value").cast("decimal(25,12)")).alias("s"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cell", "dim_idx",
            F.round(F.col("s").cast("double") / F.col("n_members"), 6).alias("centroid"),
            "n_members",
        )
    )


def ivf_build(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
    n_iter: int = 10,
    tol: float = 1e-9,
):
    """Full coarse-quantizer training: Lloyd iterations (assign → per-cell
    mean) from the deterministic seed centroids until the max per-coordinate
    centroid shift drops below ``tol`` or ``n_iter`` is hit.

    Scale shape per iteration: ONE hash aggregation keyed on (cell, dim) with
    map-side combine — shuffle volume ≤ n_cells×dim rows per partition,
    independent of corpus size — and a driver collect of exactly n_cells×dim
    scalar rows (the centroid table; Spark MLlib's k-means does the same via
    treeAggregate). Sums are DECIMAL-exact so centroids are independent of
    partitioning/reduction order. Empty cells keep their previous centroid.

    Returns (centroids, shifts): the trained n_cells×dim list and the
    per-iteration max-shift history.
    """
    cents = hyperplanes(n_cells, dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    shifts = []
    for _ in range(n_iter):
        dots = F.array(*[dot(vec, F.array(*[F.lit(x) for x in c])) for c in cents])
        assigned = embeddings.select(vec.alias("e"), dots.alias("_dots")).withColumn(
            "cell", F.expr("CAST(array_position(_dots, array_max(_dots)) AS INT)")
        )
        stats = (
            assigned.select("cell", F.posexplode("e").alias("dim_idx", "value"))
            .groupBy("cell", "dim_idx")
            .agg(
                F.sum(F.col("value").cast("decimal(25,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]
        shift = 0.0
        for r in stats:
            mean = float(r["s"]) / r["n"]
            shift = max(shift, abs(mean - new_cents[r["cell"] - 1][r["dim_idx"]]))
            new_cents[r["cell"] - 1][r["dim_idx"]] = mean
        shifts.append(shift)
        cents = new_cents
        if shift < tol:
            break
    return cents, shifts


def ivf_assign_to(
    embeddings: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assignment against an explicit (trained) centroid list — the serving
    counterpart of ivf_build; same narrow-map shape as ivf_assign."""
    vec = F.col(vec_col).cast("array<double>")
    dots = F.array(*[dot(vec, F.array(*[F.lit(x) for x in c])) for c in centroids])
    return embeddings.select(F.col(id_col).alias("vec_id"), dots.alias("_dots")).select(
        "vec_id",
        F.expr("CAST(array_position(_dots, array_max(_dots)) AS INT)").alias("cell"),
    )


def lsh_hyperplane_buckets(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Sign-random-projection bucket per vector: bit p = dot(v, plane_p) > 0.
    Returns (vec_id, bucket string of '0'/'1')."""
    planes = hyperplanes(n_planes, dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in plane])) > 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return embeddings.select(F.col(id_col).alias("vec_id"), F.concat(*bits).alias("bucket"))


def cluster_balance(
    assignments: DataFrame,
    id_col: str = "vec_id",
    cell_col: str = "cell",
    salt: str = "cb1",
) -> DataFrame:
    """Cluster-balanced corpus sampling (the SemDeDup-adjacent rebalancing
    pass): given per-item cluster assignments (from ``ivf_assign`` /
    ``ivf_assign_to`` over document embeddings), compute the per-cluster
    keep rate that flattens the cluster-size distribution toward uniform —
    rate_c = min(1, (total/k) / n_c) quantized to 1/4096 — and apply it as
    a deterministic md5-threshold sample (same scheme as
    ``textops.hash_sample``: repeatable, engine- and partitioning-
    independent). Over-represented clusters are downsampled; clusters at or
    under the uniform share keep everything.

    Scale shape: one map-side-combined groupBy on the cell key builds the
    k-row rate table; it broadcasts back into the assignment stream, and the
    keep decision is a projected md5 compare at scan speed — no second
    shuffle. Clusters more than 4096× the uniform share round to rate 0 and
    drop entirely (document the salt and re-run with a coarser k if that is
    not intended).

    Output: kept rows (id, cell, n_docs, keep_steps) — keep_steps/4096 is
    the applied rate; join back to the corpus by id for the filtered set."""
    counts = assignments.groupBy(cell_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_k"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        cell_col,
        "n_docs",
        F.least(
            F.lit(4096),
            F.floor(F.col("_total") / F.col("_k") / F.col("n_docs") * 4096),
        ).cast("int").alias("keep_steps"),
    )
    from crawl4ai_scraper_spark.operators.textops import sample_digest

    joined = assignments.join(F.broadcast(rates), cell_col)
    digest = sample_digest(F.col(id_col), salt)
    thr = F.lpad(F.lower(F.hex(F.col("keep_steps"))), 3, "0")
    return joined.filter((F.col("keep_steps") >= 4096) | (digest < thr)).select(
        id_col, cell_col, "n_docs", "keep_steps"
    )


def semdedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.96,
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    cluster-bounded cosine — partition the corpus into k-means-style cells,
    find within-cell pairs above ``threshold``, and from each duplicate
    relation keep the vector LEAST similar to its cell centroid (the
    paper's keep-most-atypical rule), ascending id as the tiebreak.

    The keep rule here is the greedy dominance form: a vector is dropped
    iff SOME same-cell neighbor with (cent_sim, id) priority below its own
    is ≥-threshold similar. On a duplicate chain this drops everything
    dominated by a better neighbor (the paper's connected-component variant
    needs iterative propagation — ``clustering.dup_clusters`` is that op;
    this is the one-pass shape used in production sweeps).

    Scale shape: cell assignment is a narrow map over literal centroids
    (swap in trained ones via ``ivf_build`` the same way); candidates come
    from a self equi-join on the cell key — bounded cell populations, never
    all-pairs; the loser set is one DISTINCT and rejoins as a broadcast-able
    anti side. Two shuffles total at corpus volume (cell join, loser
    distinct). Priority comparisons use identical expression trees in both
    engines (dot/norm folds), so the decision is engine-reproducible.

    Returns (vec_id, cell, keep) for EVERY input vector.
    """
    cents = hyperplanes(n_cells, dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    dots = F.array(*[dot(vec, F.array(*[F.lit(x) for x in c])) for c in cents])
    assigned = (
        embeddings.select(F.col(id_col).alias("vec_id"), vec.alias("e"), dots.alias("_dots"))
        .withColumn("cell", F.expr("CAST(array_position(_dots, array_max(_dots)) AS INT)"))
        # centroid-similarity priority: dot(v, c_cell)/|v| — dividing by the
        # (per-cell constant) |c| cannot change within-cell order, so it is
        # omitted and the comparison stays one division per row
        .withColumn("cs", F.element_at("_dots", F.col("cell")) / norm(F.col("e")))
        .drop("_dots")
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("e_a"),
        "cell", F.col("cs").alias("cs_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("e_b"),
        "cell", F.col("cs").alias("cs_b"),
    )
    losers = (
        a.join(b, "cell")
        .filter(F.col("id_b") != F.col("id_a"))
        .filter(
            (F.col("cs_b") < F.col("cs_a"))
            | ((F.col("cs_b") == F.col("cs_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .filter(cosine(F.col("e_a"), F.col("e_b")) >= F.lit(threshold))
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(losers.withColumn("_lost", F.lit(True)), "vec_id", "left")
        .select("vec_id", "cell", F.coalesce(~F.col("_lost"), F.lit(True)).alias("keep"))
    )


def pq_codebooks(m: int = 8, k: int = 16, dim: int = 64, seed: int = 11):
    """Deterministic product-quantization codebooks: ``m`` sub-codebooks of
    ``k`` centroids each over the ``dim/m``-dim subspaces, drawn from the
    same md5 scheme as ``hyperplanes`` so any engine can rebuild them
    bit-for-bit. Production would train these with ``ivf_build``-style Lloyd
    iterations per subspace; the literal codebooks keep the contract oracle
    reproducible."""
    sub = dim // m
    return [hyperplanes(k, sub, seed + j) for j in range(m)]


def _pq_sub_dists(sub_vec: Column, codebook) -> Column:
    """array of ||s - c||^2 over the codebook, written as the SAME expression
    tree the DuckDB oracle uses — (s.s - 2*(s.c)) + c.c with c.c a Python-
    computed literal — so distances are bit-identical across engines and
    argmin never diverges."""
    ss = dot(sub_vec, sub_vec)
    dists = []
    for cent in codebook:
        carr = F.array(*[F.lit(x) for x in cent])
        cc = 0.0
        for x in cent:
            cc = cc + x * x
        dists.append((ss - F.lit(2.0) * dot(sub_vec, carr)) + F.lit(cc))
    return F.array(*dists)


def pq_encode(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Product-quantization encoding (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into ``m``
    subvectors, replace each with the index (1-based) of its nearest
    sub-centroid — dim doubles (512 B at dim=64) become ``m`` small ints
    (8 B at m=8, k=16), the 64× compression that makes exhaustive candidate
    scans affordable at 100 TB.

    Scale shape: a pure narrow map — every distance is column math against
    literal codebooks, no shuffle, no UDF; codegen keeps it JVM-side.
    Ties go to the smallest centroid index in both engines
    (array_position / list_indexof both return the first match).

    Returns (vec_id, code: array<int> length m)."""
    books = pq_codebooks(m, k, dim, seed)
    sub = dim // m
    vec = F.col(vec_col).cast("array<double>")
    codes = [
        F.expr(f"CAST(array_position(_d{j}, array_min(_d{j})) AS INT)")
        for j in range(m)
    ]
    with_d = embeddings.select(
        F.col(id_col).alias("vec_id"),
        *[
            _pq_sub_dists(F.slice(vec, j * sub + 1, sub), book).alias(f"_d{j}")
            for j, book in enumerate(books)
        ],
    )
    return with_d.select("vec_id", F.array(*codes).alias("code"))


def _pq_queries_with_lut(
    embeddings: DataFrame, id_col: str, vec_col: str, n_queries: int, books
) -> DataFrame:
    """Query frame (query_id, dtab) where dtab[j][c] = ||q_j − c_{j,c}||²
    — the classic ADC distance LUT (Jegou et al. 2011 §III.B), computed
    ONCE per query instead of re-deriving both subspace dot products per
    candidate row. The query set is a driver-known, model-sized artifact
    (like k-means centroids), so the LUT is folded DRIVER-SIDE with the
    exact IEEE sequence of ``_pq_sub_dists``/the DuckDB oracle — a left
    fold ``acc + x·y`` from 0.0, then ``(s.s − 2·(s.c)) + c.c`` — which
    keeps every entry bit-identical to the in-plan tree while removing
    the m·k-distance codegen expression from the plan entirely: the
    candidate side is m array lookups, nothing else."""
    spark = embeddings.sparkSession
    sub = len(books[0][0])
    rows = (
        embeddings.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("q"))
        .collect()
    )

    def fold_dot(xs, ys):
        acc = 0.0
        for x, y in zip(xs, ys):
            acc = acc + x * y
        return acc

    out = []
    for r in rows:
        q = r["q"]
        dtab = []
        for j, book in enumerate(books):
            s = q[j * sub : (j + 1) * sub]
            ss = fold_dot(s, s)
            row = []
            for cent in book:
                cc = 0.0
                for x in cent:
                    cc = cc + x * x
                row.append((ss - 2.0 * fold_dot(s, cent)) + cc)
            dtab.append(row)
        out.append((int(r["query_id"]), dtab))
    return spark.createDataFrame(
        out, "query_id long, dtab array<array<double>>"
    ).withColumn("query_id", F.col("query_id").cast(dict(embeddings.dtypes)[id_col]))


def _pq_adc_from_lut(m: int) -> Column:
    """Σ_j dtab[j][code_j] — m array lookups per candidate row, summed in
    subspace order (left-assoc, same float association as the unhoisted
    per-row form)."""
    total = None
    for j in range(m):
        d_j = F.element_at(
            F.element_at(F.col("dtab"), j + 1), F.element_at(F.col("code"), j + 1)
        )
        total = d_j if total is None else total + d_j
    return total


def pq_adc_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    top_k: int = 5,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: queries keep their full
    float vectors, database vectors are their ``m``-byte codes, and the
    approximate distance is Σ_j ||q_j − c_{j,code_j}||² — the standard PQ
    serving path (Jegou et al. 2011 §III.B; reference scope: this engine's
    embedding column, crawl analytics over page embeddings).

    Scale shape: the query side (n_queries rows, each carrying its
    precomputed m×k ADC distance LUT — see ``_pq_queries_with_lut``)
    broadcasts into a scan of the CODE table — 64× less I/O than the float
    scan of ``cosine_topk`` — and each candidate distance is m array
    lookups into the broadcast LUT, pure codegen'd column math with no
    per-candidate dot products. Ranking is a per-query window over
    n_queries×N candidate rows; production fuses this with an IVF cell
    restriction (``ivf_topk_assigned``) so N is the cell size, not the
    corpus.

    Returns (query_id, neighbor_id, rank, adc_dist rounded to 6dp)."""
    books = pq_codebooks(m, k, dim, seed)
    codes = pq_encode(embeddings, id_col, vec_col, m, k, dim, seed)
    queries = _pq_queries_with_lut(embeddings, id_col, vec_col, n_queries, books)
    cand = codes.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    total = _pq_adc_from_lut(m)
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(total, 6).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    top_k: int = 5,
    n_cells: int = 8,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    seed: int = 11,
    cell_seed: int = 7,
) -> DataFrame:
    """IVF-PQ: the production 100-TB ANN serving shape (FAISS's IndexIVFPQ)
    — coarse cells bound WHICH vectors are scanned, PQ codes bound WHAT is
    scanned per vector. Search cost = (corpus/n_cells) × m byte lookups per
    query instead of corpus × dim float ops.

    Plan: cell assignment and PQ codes are both narrow maps (literal
    centroids / codebooks); the query side (n_queries rows, full precision,
    with its own cell) broadcasts into an EQUI-JOIN ON THE CELL KEY against
    the code table — never a cross product; ADC distances are literal
    lookups; per-query top-k window. Ties by neighbor id.

    Returns (query_id, neighbor_id, rank, adc_dist)."""
    books = pq_codebooks(m, k, dim, seed)
    cells = ivf_assign(embeddings, id_col, vec_col, n_cells, dim, cell_seed)
    codes = pq_encode(embeddings, id_col, vec_col, m, k, dim, seed).join(
        cells, "vec_id"
    )
    queries = _pq_queries_with_lut(embeddings, id_col, vec_col, n_queries, books).join(
        cells.select(
            F.col("vec_id").alias("query_id"), F.col("cell").alias("qcell")
        ),
        "query_id",
    )
    cand = codes.join(
        F.broadcast(queries), (F.col("cell") == F.col("qcell"))
    ).filter(F.col("vec_id") != F.col("query_id"))
    total = _pq_adc_from_lut(m)
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(total, 6).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


# --- distributed Gram matrix / PCA / random projection -------------------------

_GRAM_SCALE = "decimal(28,12)"


def gram_matrix(emb: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """X^T X over the corpus — the d×d Gram matrix that PCA / whitening /
    covariance-shrinkage all start from, ENGINE-EXACT: each per-row product
    is rounded to 12dp (a deterministic double op) and summed in DECIMAL, so
    the result is order-free and oracle-reproducible (the pagerank
    convention).

    Shape: the d² products per vector are built as ONE flattened array in
    codegen (no self-join of an exploded table — the classic mistake), then
    posexplode + a single groupBy((i,j)) with map-side combine: every task
    collapses to ≤ d² rows before the exchange, so the shuffle is
    O(partitions · d²) regardless of corpus size. d=64 → 4096 keys.
    Returns (i, j, g) 0-based — model-sized (d² rows)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    outer = F.flatten(
        F.transform(v, lambda x: F.transform(v, lambda y: F.round(x * y, 12)))
    )
    return (
        emb.select(F.posexplode(outer).alias("pos", "p"))
        .groupBy(
            F.floor(F.col("pos") / dim).cast("int").alias("i"),
            (F.col("pos") % dim).cast("int").alias("j"),
        )
        .agg(F.sum(F.col("p").cast(_GRAM_SCALE)).alias("gsum"))
        .select("i", "j", F.col("gsum").cast("double").alias("g"))
    )


def gram_matrix_fast(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The PRODUCTION Gram path: per-Arrow-batch numpy X^T X partials
    (BLAS, one d×d frame per batch) + one d²-key groupBy — float64 partial
    sums, so ~1e-12-relative vs gram_matrix() but 64× less exploded volume.
    Use gram_matrix() when an external engine must reproduce the bits."""
    import pandas as pd  # noqa: F401 (worker-side)

    def _partial(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            g = x.T @ x
            d = g.shape[0]
            ii, jj = np.indices((d, d))
            yield pd.DataFrame(
                {"i": ii.ravel().astype("int32"),
                 "j": jj.ravel().astype("int32"),
                 "gp": g.ravel()}
            )

    parts = emb.select(vec_col).mapInPandas(_partial, "i int, j int, gp double")
    return parts.groupBy("i", "j").agg(F.sum("gp").alias("g"))


def pca_components(gram: DataFrame, dim: int = 64, k: int = 8):
    """Top-k principal directions from the (model-sized) Gram matrix:
    collect d² rows to the driver (the ONLY collect — d=64 → 4096 scalars),
    eigendecompose with numpy, return the k eigenvectors (rows) ordered by
    descending eigenvalue with a deterministic sign convention (largest-
    magnitude entry positive)."""
    import numpy as np

    g = np.zeros((dim, dim))
    for r in gram.collect():
        g[r["i"], r["j"]] = r["g"]
    vals, vecs = np.linalg.eigh((g + g.T) / 2.0)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps


def pca_project(
    emb: DataFrame, components, vec_col: str = "embedding", out_col: str = "pca"
) -> DataFrame:
    """Project onto the k principal directions — the components are plan
    LITERALS (model-sized broadcast), the projection is k dot products in
    codegen over the scan: zero shuffles, scan-speed."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dots = [
        F.aggregate(
            F.zip_with(v, F.array(*[F.lit(c) for c in comp]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        for comp in components
    ]
    return emb.withColumn(out_col, F.array(*dots))


def jl_sign(i: Column, t: Column, salt: str = "jl1") -> Column:
    """Deterministic sparse JL sign r(i,t) ∈ {+1, -1, 0} with probabilities
    {1/6, 1/6, 2/3} (Achlioptas 2003, s=3, scale factor documented out):
    bucket the first 12 hex digits of md5(salt:i:t) mod 6 — pure hashing,
    identical in any engine, no stored projection matrix."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), i.cast("string"), t.cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint") % 6
    return F.when(h == 0, F.lit(1)).when(h == 1, F.lit(-1)).otherwise(F.lit(0))


def jl_project(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    salt: str = "jl1",
) -> DataFrame:
    """Sparse random projection d → out_dim for cheap near-dup screens and
    sketch feeds: proj(v)[t] = Σ_i v[i]·r(i,t) with hash-derived signs (no
    matrix artifact, nothing to ship to executors). The ~2/3 of terms whose
    hash-derived sign is exactly 0 are FILTERED before the aggregate, so the
    shuffle carries only the ~d/3 contributing terms per (id, t). Per-term
    12dp rounding + DECIMAL sum = engine-exact. One posexplode at d× volume
    and one (id, t)-keyed groupBy; output is out_dim rows per vector.
    Returns (id, t, proj).

    An (id, t) output row vanishes only if ALL d signs for that t are zero
    — data-independent (signs hash (i, t, salt) only), p ≈ (2/3)^d per t,
    and verified false for every t under the default (salt, out_dim, d=64).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = emb.select(F.col(id_col).alias("id"), F.posexplode(v).alias("i", "x"))
    ts = F.explode(F.sequence(F.lit(0), F.lit(out_dim - 1))).alias("t")
    sign = jl_sign(F.col("i"), F.col("t"), salt)
    terms = (
        rows.select(
            "id",
            "i",
            "x",
            ts,
        )
        .filter(sign != 0)
        .select(
            "id",
            "t",
            F.round(F.col("x") * sign, 12).cast(_GRAM_SCALE).alias("p"),
        )
    )
    return (
        terms.groupBy("id", "t")
        .agg(F.sum("p").alias("psum"))
        .select("id", "t", F.col("psum").cast("double").alias("proj"))
    )


def ivf_multiprobe_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """MULTI-PROBE IVF: each query searches its ``n_probe`` nearest coarse
    cells instead of 1 — the standard recall lever when vectors near a cell
    boundary have their true neighbors across it. Candidates are a strict
    superset of the single-probe search (probe 1 IS the argmax cell), so
    recall is monotone in n_probe while cost grows only on the QUERY side:
    the data table still carries one cell per vector, the query side
    explodes to n_probe rows per query (a broadcast — queries are few), and
    candidate generation stays a cell equi-join. No re-partitioning of the
    corpus, no extra corpus passes.
    Returns (query_id, neighbor_id, rank)."""
    cents = hyperplanes(n_cells, dim, seed)
    vec = F.col(vec_col).cast("array<double>")
    dot_exprs = [dot(vec, F.array(*[F.lit(x) for x in c])) for c in cents]
    dots = F.array(*dot_exprs)
    base = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), dots.alias("_dots")
    )
    data = base.select(
        F.col("vid").alias("neighbor_id"),
        F.col("v").alias("nvec"),
        F.expr("CAST(array_position(_dots, array_max(_dots)) AS INT)").alias("cell"),
    )
    # top-n_probe cells: sort (−dot, cell) structs ascending = dot desc,
    # ties to the SMALLEST cell id (the list_indexof convention)
    probe_structs = F.array(
        *[
            F.struct((-d).alias("nd"), F.lit(j + 1).cast("int").alias("c"))
            for j, d in enumerate(dot_exprs)
        ]
    )
    queries = (
        embeddings.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.slice(F.array_sort(probe_structs), 1, n_probe).alias("_p"),
        )
        .select(
            "query_id",
            "qvec",
            F.explode(F.transform(F.col("_p"), lambda s: s["c"])).alias("cell"),
        )
    )
    scored = (
        data.join(F.broadcast(queries), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot(F.col("qvec").cast("array<double>"), F.col("nvec").cast("array<double>"))
            / (
                norm(F.col("qvec").cast("array<double>"))
                * norm(F.col("nvec").cast("array<double>"))
            ),
        )
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
