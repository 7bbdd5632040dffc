"""Link-graph analytics over the crawl's edge table (checkpoint.read_edges
gives (parent_url, child_url) — the web graph this engine builds anyway).

PageRank power iteration, engine-reproducible: the per-edge contribution is
rounded to 12dp and cast to DECIMAL BEFORE the incoming-edge sum, so every
iteration's ranks are exact, order-free numbers any engine reproduces —
plain double sums would depend on partial-aggregation order and could never
hash-match an oracle. The 1e-12 per-edge rounding is the documented
determinism contract of this operator (error ≤ edges × 1e-12 per node per
iteration — negligible against the 0.85 damping contraction).

Scale shape per iteration: one equi-join of edges with the current rank
vector on the uniform src key + one groupBy(dst) with map-side combine —
the canonical distributed PageRank; lineage is truncated per round with
localCheckpoint exactly like clustering.dup_clusters. Dangling nodes (no
out-edges) keep the teleport term only, matching the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = "decimal(28,12)"


def out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """→ (id, rank) after ``n_iter`` power iterations from the uniform
    vector, over the node set = every id appearing as src or dst."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = out_degrees(e)
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)

    teleport = F.round(F.lit((1.0 - damping) / n), 12).cast(_SCALE)
    ranks = nodes.select(
        "id", F.round(F.lit(1.0 / n), 12).cast(_SCALE).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                # per-edge rounding BEFORE the sum = order-free exactness
                F.round(
                    F.lit(damping) * F.col("rank").cast("double") / F.col("outdeg"),
                    12,
                ).cast(_SCALE).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast(_SCALE).alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (teleport + F.coalesce(F.col("in_sum"), F.lit(0).cast(_SCALE)))
                .cast(_SCALE).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.col("rank").cast("double").alias("rank"))


# --- anchor-text aggregation ------------------------------------------------

ANCHOR_SCHEMA = "target string, anchor string"


def _extract_anchor_rows(it):
    """mapInPandas transformer: (url, html binary) → (target, anchor) rows.
    The html never leaves the Arrow batch — only the canonical target URL and
    the short anchor label enter any shuffle."""
    import pandas as pd

    from crawl4ai_scraper_spark.kernel.htmlkit import decode_html, extract_anchors

    for pdf in it:
        targets, anchors = [], []
        for url, html in zip(pdf["url"], pdf["html"]):
            for rec in extract_anchors(decode_html(html), url):
                if rec["anchor"]:  # drop-tag/unterminated anchors carry ''
                    targets.append(rec["target"])
                    anchors.append(rec["anchor"])
        yield pd.DataFrame({"target": targets, "anchor": anchors})


def anchor_links(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """pages → one (target, anchor) row per non-empty-label link (narrow
    Arrow pass, no shuffle)."""
    return pages.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    ).mapInPandas(_extract_anchor_rows, ANCHOR_SCHEMA)


def anchor_text_agg(
    links: DataFrame,
    target_col: str = "target",
    anchor_col: str = "anchor",
    max_anchors: int = 8,
) -> DataFrame:
    """Per-target inbound anchor-text summary: (target, n_inlinks, anchors)
    where ``anchors`` is the ``max_anchors`` lexicographically-first DISTINCT
    labels joined by '|' — the classic document-expansion view of the link
    graph (anchor text describes the TARGET page).

    Scale shape: shuffle 1 groups by the (target, anchor) PAIR — uniform even
    when one target has 10^9 inlinks, with map-side combine collapsing each
    partition's repeats; shuffle 2 partitions the distinct pairs by target,
    where one window pass ranks anchors and sums inlink counts, so the final
    collect_list holds at most ``max_anchors`` short strings per group. A
    mega-inlinked target costs its DISTINCT-anchor count, never its inlink
    count, in any single partition."""
    from pyspark.sql import Window

    pairs = (
        links.select(
            F.col(target_col).alias("target"), F.col(anchor_col).alias("anchor")
        )
        .groupBy("target", "anchor")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    w_rank = Window.partitionBy("target").orderBy("anchor")
    w_all = Window.partitionBy("target")
    ranked = pairs.select(
        "target",
        "anchor",
        F.row_number().over(w_rank).alias("_rn"),
        F.sum("pair_cnt").over(w_all).alias("n_inlinks"),
    )
    return (
        ranked.filter(F.col("_rn") <= max_anchors)
        .groupBy("target")
        .agg(
            F.first("n_inlinks").alias("n_inlinks"),
            F.concat_ws("|", F.array_sort(F.collect_list("anchor"))).alias("anchors"),
        )
        .select("target", "n_inlinks", "anchors")
    )


def page_anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_anchors: int = 8,
) -> DataFrame:
    """pages table → per-target anchor summary (extract + aggregate)."""
    return anchor_text_agg(anchor_links(pages, url_col, html_col), max_anchors=max_anchors)


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 2,
) -> DataFrame:
    """HITS hubs & authorities over the crawl edge table — the companion
    signal to pagerank (a page linked by many good hubs is an authority; a
    page linking many authorities is a hub). Deterministic like pagerank:
    every score is rounded to 12dp and cast to DECIMAL before any sum, and
    each half-step is L1-normalized (sum-to-1) with the division done in
    identically-shaped double math, so any engine reproduces the exact
    values. Per iteration: two edge⋈score equi-joins + two map-side-combined
    groupBys + two scalar total aggregates — no windows, no global sorts;
    lineage truncated per half-step with localCheckpoint."""
    if n_iter < 1:
        raise ValueError("hits: n_iter must be >= 1")
    # checkpoint the edge distinct FIRST so nodes derives from it — one
    # distinct shuffle, not two
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct(
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("hits: empty edge frame (no nodes)")
    zero = F.lit(0).cast(_SCALE)

    def _half(score: DataFrame, join_on: str, group_on: str) -> DataFrame:
        """score(id, s) over join_on side → L1-normalized sums on group_on."""
        raw = (
            e.join(score.withColumnRenamed("id", join_on), join_on)
            .groupBy(F.col(group_on).alias("id"))
            .agg(F.sum("s").cast(_SCALE).alias("raw"))
        )
        total = raw.agg(F.sum("raw").cast(_SCALE)).collect()[0][0]
        t = float(total) if total else 1.0
        return nodes.join(raw, "id", "left").select(
            "id",
            F.round(
                F.coalesce(F.col("raw"), zero).cast("double") / F.lit(t), 12
            ).cast(_SCALE).alias("s"),
        ).localCheckpoint(eager=True)

    hub = nodes.select("id", F.round(F.lit(1.0 / n), 12).cast(_SCALE).alias("s"))
    auth = None
    for _ in range(n_iter):
        auth = _half(hub, "src", "dst")    # authorities gather from hubs
        hub = _half(auth, "dst", "src")    # hubs gather from authorities
    return (
        nodes.join(hub.withColumnRenamed("s", "hub"), "id")
        .join(auth.withColumnRenamed("s", "auth"), "id")
        .select("id", F.col("hub").cast("double").alias("hub"),
                F.col("auth").cast("double").alias("auth"))
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle participation over an undirected graph:
    (id, n_triangles) — each triangle credits all three corners once.

    The scale problem is wedge explosion: enumerating neighbor PAIRS at a
    hot vertex is O(deg²) — a 10⁶-degree hub yields 10¹² wedges. The
    classical fix (node-iterator++ / Schank-Wagner): orient every edge from
    the endpoint with the LOWER (degree, id) to the higher, which turns the
    graph into a DAG where every out-neighborhood is O(√m) on ANY degree
    distribution — hubs receive edges instead of fanning out, so the
    self-join on the wedge apex is bounded. Each triangle is then counted
    exactly once (at its lowest-ranked corner) by probing the oriented edge
    set for the wedge's closing edge — an equi-join, no distinct needed.

    Plan: degree groupBy → broadcast onto the canonical edge list → orient
    → self-join on apex → closing-edge equi-join → explode the 3 corners →
    bounded groupBy. Dedup of the input (both directions, repeats) is one
    canonical (least, greatest) distinct."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # total-order rank: degree first, id tiebreak (ids must fit 10^12)
    rk = F.col("deg").cast("long") * F.lit(1_000_000_000_000) + F.col("id")
    ranked = deg.select("id", rk.alias("rk"))
    e = (
        und.join(ranked.withColumnsRenamed({"id": "u", "rk": "rku"}), "u")
        .join(ranked.withColumnsRenamed({"id": "v", "rk": "rkv"}), "v")
        .select(
            F.when(F.col("rku") < F.col("rkv"), F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(F.col("rku") < F.col("rkv"), F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(F.col("rku") < F.col("rkv"), F.col("rkv")).otherwise(F.col("rku")).alias("rkb"),
        )
    )
    w1 = e.select(F.col("a").alias("apex"), F.col("b").alias("x"), F.col("rkb").alias("rkx"))
    w2 = e.select(F.col("a").alias("apex"), F.col("b").alias("y"), F.col("rkb").alias("rky"))
    wedges = w1.join(w2, "apex").filter(F.col("rkx") < F.col("rky")).select("apex", "x", "y")
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"])
    return (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond") —
    the web-graph dedup/cluster primitive (mirror detection, near-dup
    cluster closure, host-alias resolution).

    Why this and not min-label propagation: propagation needs O(diameter)
    rounds (a 10^10-URL web graph has chains thousands long); the star
    operations contract every component to a star in O(log n) rounds with
    the SAME per-round cost — two map-side-combined groupBys + one equi-join
    on the node key, no collect_list, no driver-side graph. Lineage is
    truncated per round with localCheckpoint (the dup_clusters convention);
    convergence = the small-star output is a fixpoint (subtract-count 0, a
    scalar action per round).

    * large-star: every node u points its LARGER neighbors at
      m = min(N(u) ∪ {u}) — long chains halve.
    * small-star: every node u points its smaller neighbors and itself at
      the minimum — stars flatten.

    Returns (node, component) with component = the component's minimum node
    id; ``nodes`` (optional) adds isolated vertices, labeled by themselves.
    Integer-only math — bit-reproducible in any engine."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("v"),
            F.greatest(F.col(src), F.col(dst)).alias("u"),
        )
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # large-star over the bidirectional view: center c, neighbor n
        bidir = e.select(F.col("u").alias("c"), F.col("v").alias("n")).unionAll(
            e.select(F.col("v").alias("c"), F.col("u").alias("n"))
        )
        mins = bidir.groupBy("c").agg(F.min("n").alias("mn"))
        mins = mins.select("c", F.least("mn", F.col("c")).alias("m"))
        ls = (
            bidir.join(mins, "c")
            .filter(F.col("n") > F.col("c"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over the high->low directed view
        smins = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(smins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("v2"), F.greatest("u", "v").alias("u"))
            .select("u", F.col("v2").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if ss.subtract(e).isEmpty() and e.subtract(ss).isEmpty():
            e = ss
            break
        e = ss
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    endpoints = e.select(F.col("v").alias("node")).distinct()
    roots = endpoints.join(labels.select("node"), "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    out = labels.unionByName(roots)
    if nodes is not None:
        isolated = nodes.select(F.col(nodes.columns[0]).alias("node")).join(
            out.select("node"), "node", "left_anti"
        )
        out = out.unionByName(
            isolated.select("node", F.col("node").alias("component"))
        )
    return out


# --- OPIC: On-line Page Importance Computation -------------------------------

def opic_step(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 1,
) -> DataFrame:
    """OPIC cash propagation (Abiteboul, Preda & Cobena, WWW 2003 — the
    frontier-prioritization importance metric crawlers use INSTEAD of full
    PageRank: importance accrues online as pages are visited, no global
    convergence loop). Batch-synchronous variant over the directed link
    graph: every node starts with cash 1/n and history 0; one step banks
    the cash into history and redistributes it equally over out-edges;
    dangling cash (nodes with no out-links) goes to the virtual root and is
    re-injected uniformly in the same step, so total cash is conserved
    (up to the documented 1e-12 per-term rounding).

    Engine-reproducible by the same contract as :func:`pagerank`: per-edge
    contributions and the uniform dangling share are rounded to 12dp BEFORE
    the DECIMAL sums, so the result is order-free and a SQL oracle matches
    it bit-for-bit. The crawl-priority read-out is (history + cash) — the
    OPIC importance estimate the frontier can ORDER BY.

    Scale shape per step: one equi-join of edges with the cash vector on
    src + one groupBy(dst) with map-side combine + one model-sized scalar
    aggregate for the dangling mass; lineage truncated per round.
    Returns (id, cash, history, importance) as doubles.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = out_degrees(e)
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)

    state = nodes.select(
        "id",
        F.round(F.lit(1.0 / n), 12).cast(_SCALE).alias("cash"),
        F.lit(0).cast(_SCALE).alias("history"),
    )
    zero = F.lit(0).cast(_SCALE)
    for _ in range(n_iter):
        # dangling mass: exact DECIMAL sum over nodes with no out-edges
        dangling = (
            state.join(deg.select(F.col("src").alias("id")), "id", "left_anti")
            .agg(F.coalesce(F.sum("cash"), zero).cast(_SCALE).alias("g"))
            .collect()[0]["g"]
        )
        share = F.round(F.lit(float(dangling) / n), 12).cast(_SCALE)
        contrib = (
            e_deg.join(state.select(F.col("id").alias("src"), "cash"), "src")
            .select(
                F.col("dst").alias("id"),
                F.round(F.col("cash").cast("double") / F.col("outdeg"), 12)
                .cast(_SCALE)
                .alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast(_SCALE).alias("in_sum"))
        )
        state = (
            state.join(contrib, "id", "left")
            .select(
                "id",
                (F.coalesce(F.col("in_sum"), zero) + share).cast(_SCALE).alias("cash"),
                (F.col("history") + F.col("cash")).cast(_SCALE).alias("history"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "id",
        F.col("cash").cast("double").alias("cash"),
        F.col("history").cast("double").alias("history"),
        (F.col("cash") + F.col("history")).cast("double").alias("importance"),
    )


# --- TrustRank: seed-personalized rank for link-spam demotion -----------------

def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank
    personalized to a hand-vetted trust seed set — trust flows OUT of the
    seeds along links and decays with distance, so pages reachable only
    through spam-farm neighborhoods score ≈ 0. This is the graph-based
    complement to the lexical ``url_spam_filter``: the frontier can demote
    (or budget-cap) hosts whose pages draw no trust.

    Differences from :func:`pagerank`, faithful to the paper: the teleport
    vector is 1/|seeds| ON SEEDS ONLY (zero elsewhere — non-seed dangling
    mass simply decays), and the initial vector IS the teleport vector.
    Same engine-reproducibility contract: per-edge contributions rounded to
    12dp before the DECIMAL sums; one edges⋈rank join + one map-side-
    combined groupBy per iteration; lineage truncated per round.
    Returns (id, trust) for every node in the edge set."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_ids = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct().join(
        nodes, "id"
    ).localCheckpoint(eager=True)
    s = seed_ids.count()
    if s == 0:
        return nodes.select("id", F.lit(0.0).alias("trust"))
    deg = out_degrees(e)
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)

    zero = F.lit(0).cast(_SCALE)
    seed_mark = seed_ids.withColumn("is_seed", F.lit(1))
    base = nodes.join(seed_mark, "id", "left").select(
        "id",
        F.when(
            F.col("is_seed").isNotNull(),
            F.round(F.lit((1.0 - damping) / s), 12).cast(_SCALE),
        )
        .otherwise(zero)
        .alias("d"),
    ).localCheckpoint(eager=True)
    trust = nodes.join(seed_mark, "id", "left").select(
        "id",
        F.when(
            F.col("is_seed").isNotNull(), F.round(F.lit(1.0 / s), 12).cast(_SCALE)
        )
        .otherwise(zero)
        .alias("trust"),
    )
    for _ in range(n_iter):
        contrib = (
            e_deg.join(
                trust.select(F.col("id").alias("src"), "trust"), "src"
            )
            .select(
                F.col("dst").alias("id"),
                F.round(
                    F.lit(damping) * F.col("trust").cast("double") / F.col("outdeg"),
                    12,
                ).cast(_SCALE).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast(_SCALE).alias("in_sum"))
        )
        trust = (
            base.join(contrib, "id", "left")
            .select(
                "id",
                (F.col("d") + F.coalesce(F.col("in_sum"), zero))
                .cast(_SCALE)
                .alias("trust"),
            )
            .localCheckpoint(eager=True)
        )
    return trust.select("id", F.col("trust").cast("double").alias("trust"))


# --- redirect-chain resolution (pointer doubling) -----------------------------

def resolve_redirects(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """Final-target resolution of redirect chains (301/302 hops, HTML
    refreshes, canonical indirections) by POINTER DOUBLING: each round every
    node's pointer jumps to its pointer's pointer, so an L-hop chain resolves
    in ceil(log2 L) rounds — each round is ONE co-partitioned equi-join of
    the |nodes|-row 2-column mapping with itself plus a scalar all-done
    check. Chasing hop-by-hop would be O(max_hops) edge joins; at 10^10 URLs
    with 30-hop worst-case chains doubling needs 5 joins, chasing needs 30.
    The reference fetches redirects inline per-URL (requests follows them
    silently); batch crawls must resolve the stored redirect table instead.

    Redirect LOOPS (they exist in real crawls) never reach a terminal: after
    ``max_rounds`` they remain resolved=false, keeping their last-jump
    target, so callers can quarantine them. Acyclic inputs always converge.

    Returns (node, final_id, hops, resolved) for EVERY node of the graph —
    terminals (targets with no outgoing redirect) map to themselves at 0.
    Integer-only math: bit-reproducible in any engine."""
    r = redirects.select(F.col(src).alias("node"), F.col(dst).alias("nxt")).distinct()
    terminals = (
        r.select(F.col("nxt").alias("node"))
        .distinct()
        .join(r.select("node"), "node", "left_anti")
    )
    m = (
        r.select(
            "node", "nxt", F.lit(1).cast("int").alias("hops"), F.lit(False).alias("done")
        )
        .unionByName(
            terminals.select(
                "node",
                F.col("node").alias("nxt"),
                F.lit(0).cast("int").alias("hops"),
                F.lit(True).alias("done"),
            )
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        if m.filter(~F.col("done")).isEmpty():
            break
        hop = m.select(
            F.col("node").alias("nxt"),
            F.col("nxt").alias("nxt2"),
            F.col("hops").alias("hops2"),
            F.col("done").alias("done2"),
        )
        m = (
            m.join(hop, "nxt", "left")
            .select(
                "node",
                F.when(F.col("done"), F.col("nxt"))
                .otherwise(F.coalesce(F.col("nxt2"), F.col("nxt")))
                .alias("nxt"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.coalesce(F.col("hops2"), F.lit(0)))
                .alias("hops"),
                F.when(F.col("done"), F.lit(True))
                .otherwise(F.coalesce(F.col("done2"), F.lit(False)))
                .alias("done"),
            )
            .localCheckpoint(eager=True)
        )
    return m.select(
        "node", F.col("nxt").alias("final_id"), "hops", F.col("done").alias("resolved")
    )


# --- host-graph contraction + weighted rank -----------------------------------

def contract_to_hosts(
    edges: DataFrame,
    node_host: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    host: str = "host",
) -> DataFrame:
    """Contract the page-level link graph to the HOST graph: map both
    endpoints through the (node, host) table, drop intra-host edges, and
    weight-collapse parallel edges. The host graph is 3-5 orders smaller
    than the page graph — host-level authority (spam demotion, crawl budget
    allocation) is computed there, not on 10^10 pages.

    Shape: two co-partitioned equi-joins on the page id (the mapping table
    is |pages|-sized — NOT broadcastable at web scale; both joins key on the
    uniform page id) followed by one groupBy((src_host, dst_host)) with
    map-side combine — parallel edges collapse inside each task before the
    exchange. Returns (src_host, dst_host, weight)."""
    nh_s = node_host.select(F.col(node).alias(src), F.col(host).alias("src_host"))
    nh_d = node_host.select(F.col(node).alias(dst), F.col(host).alias("dst_host"))
    return (
        edges.select(src, dst)
        .join(nh_s, src)
        .join(nh_d, dst)
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def weighted_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    n_iter: int = 1,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a WEIGHTED graph (host graph, anchor-count graph): a
    node's rank flows to each successor proportional to edge weight over the
    node's total outgoing weight. Same determinism contract as pagerank():
    the per-edge contribution is rounded to 12dp and cast to DECIMAL BEFORE
    the incoming sum — order-free, engine-exact. Same scale shape too: per
    iteration one edges⋈ranks equi-join on src + one groupBy(dst) with
    map-side combine; lineage truncated per round."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    wout = e.groupBy("src").agg(F.sum("w").alias("tw"))
    e_w = e.join(wout, "src").localCheckpoint(eager=True)

    teleport = F.round(F.lit((1.0 - damping) / n), 12).cast(_SCALE)
    ranks = nodes.select(
        "id", F.round(F.lit(1.0 / n), 12).cast(_SCALE).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            e_w.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                # ((damping * rank) * w) / tw, rounded BEFORE the sum —
                # operand order fixed to match the SQL oracle exactly
                F.round(
                    F.lit(damping)
                    * F.col("rank").cast("double")
                    * F.col("w")
                    / F.col("tw"),
                    12,
                ).cast(_SCALE).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").cast(_SCALE).alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (teleport + F.coalesce(F.col("in_sum"), F.lit(0).cast(_SCALE)))
                .cast(_SCALE).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.col("rank").cast("double").alias("rank"))


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row link-graph shape summary: node/edge counts, max in/out
    degree, and RECIPROCITY (fraction of directed edges whose reverse also
    exists) — the signals that distinguish an organic web graph (low
    reciprocity, heavy-tailed degrees) from link farms (reciprocity → 1,
    uniform degrees).

    Two map-side-combined degree aggregations + ONE co-keyed semi-join of
    the edge table against its own reversal (equi on (src, dst) — never a
    cross product); everything downstream of the aggregates is scalar.
    Returns (n_nodes, n_edges, max_outdeg, max_indeg, reciprocity)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    ne = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    nn = (
        e.select(F.col("s").alias("n"))
        .unionByName(e.select(F.col("d").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    mo = (
        e.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
        .agg(F.max("od").cast("bigint").alias("max_outdeg"))
    )
    mi = (
        e.groupBy("d").agg(F.count(F.lit(1)).alias("idg"))
        .agg(F.max("idg").cast("bigint").alias("max_indeg"))
    )
    rc = e.join(
        e.select(F.col("d").alias("s"), F.col("s").alias("d")), ["s", "d"], "left_semi"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_recip"))
    # one-row stats frames composed lazily — each crossJoin is a broadcast
    # of a scalar row (the repo's standard stats-frame pattern)
    return (
        nn.crossJoin(ne).crossJoin(mo).crossJoin(mi).crossJoin(rc).select(
            "n_nodes",
            "n_edges",
            "max_outdeg",
            "max_indeg",
            F.round(
                F.col("n_recip").cast("double") / F.col("n_edges"), 6
            ).alias("reciprocity"),
        )
    )
