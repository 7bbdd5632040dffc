"""Duplicate-cluster resolution: connected components over a near-dup pair
graph (the step after minhash_lsh_pairs / simhash_near_dup_pairs /
embedding_near_dup_bucketed — collapse pairwise matches into groups and pick
one survivor per group).

Scale design: iterative min-label propagation. Each round is ONE shuffle
(edges ⨝ labels on a uniform id key, then a min-combine groupBy with map-side
partial aggregation); rounds needed = graph diameter. Near-dup graphs are
near-cliques (every variant matches the original), so diameter is tiny —
2-4 rounds even at 10^10 docs. Convergence is detected with a cheap count of
changed labels (a scalar action, no data collect), and lineage is truncated
with localCheckpoint each round so the DAG stays O(1) across iterations —
same discipline as plans/driver.py's crawl rounds. For adversarial
long-chain graphs, `max_iter` bounds the work; swapping the propagation body
for the large-star/small-star alternation (Kiveris et al. 2014, O(log n)
rounds) keeps the same per-round plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve (id_a, id_b) duplicate pairs into components.

    Returns (id, cluster_id) for every id that appears in any pair, where
    cluster_id = MIN id of the component (which is also the survivor under
    keep-smallest-id semantics; rows absent from `pairs` are implicitly their
    own singleton cluster and are not emitted).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)

    # label(id) starts as min(id, min neighbor) — one round of propagation
    # folded into the init so star graphs converge with zero iterations.
    labels = edges.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("lbl")
    ).select(F.col("src").alias("id"), "lbl")
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate label for each node: min over neighbors' current labels
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
            .select(F.col("src").alias("id"), "nlbl")
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
                    (F.col("nlbl") < F.col("lbl")).alias("_chg"))
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_chg")).count()
        labels = updated.select("id", "lbl")
        if n_changed == 0:
            break

    return labels.select("id", F.col("lbl").alias("cluster_id"))


def dedup_survivors(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
) -> DataFrame:
    """Keep-one-per-cluster: left-join the corpus to the cluster map (ids not
    in any pair keep themselves) and keep rows whose id IS the cluster min.
    One equi-join on the uniform id key; the cluster map is tiny relative to
    the corpus (only matched ids) so Spark/AQE broadcasts it when it fits.
    """
    cl = clusters.withColumnRenamed("id", id_col)
    joined = df.join(cl, id_col, "left")
    return joined.filter(
        F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col(id_col))
    ).drop("cluster_id")
