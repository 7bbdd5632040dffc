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
