"""In-engine quality-classifier training: full-batch logistic regression
over hashing-trick features, every reduction engine-reproducible.

This is the trainable half of the quality-filter stack (the reference's
pipeline exposes only fixed heuristics — SURVEY §2's quality scoring — but
the modern webtext recipe trains a lightweight classifier on labeled docs
and scores the corpus with it: fastText-style filters in CCNet / DCLM /
FineWeb-Edu). The inference side already exists (`textops.nb_classifier`,
`textops.classifier_pr_table`); this module adds distributed TRAINING with
the engine's determinism contract so a DuckDB oracle reproduces the learned
weights bit-for-bit:

* features are the exact-integer hashing-trick rows of
  ``search.feature_hash_vectors`` (no model artifact, no Python);
* the margin ``m = Σ_j w_j · x_j`` is an EXACT DECIMAL dot product
  (weights are 12dp DECIMAL, features are ints — no float accumulation);
* the sigmoid is the one unavoidable transcendental; its output is rounded
  to 6dp immediately (``p = round(σ(m), 6)``), so a last-ulp ``exp``
  difference between engines/libms would have to land within 1e-16 of a
  5e-7 rounding boundary to be visible — the same determinism-by-rounding
  contract as pagerank's 12dp per-edge rounding, documented here;
* per-example gradient terms are rounded to 12dp and summed in DECIMAL —
  order-free, partial-aggregation-safe;
* the learning rate is 1.0 so weight updates are exact DECIMAL
  subtractions (no driver-side rounding-mode coupling at all).

Scale shape per step (features = the big table, F rows):
  1. broadcast-join the 64-row weight table into the feature scan,
     groupBy(doc) with map-side combine → margins (one F-volume shuffle);
  2. margins ⋈ labels on doc (both doc-keyed) → residuals;
  3. residuals ⋈ features on doc + groupBy(dim) — 64 keys, map-side
     combine collapses to 64 rows per task before the exchange.
No collect touches data rows; the weight vector is the only driver-side
artifact and it is model-sized (``dim`` rows). Lineage is truncated per
step with localCheckpoint like graph.pagerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_W = "decimal(18,12)"   # weights: |w| stays O(1) for normalized gradients
_G = "decimal(20,12)"   # per-example gradient terms
_ACC = "decimal(38,12)"  # exact accumulators


def lr_train(
    features: DataFrame,
    labels: DataFrame,
    dim: int = 64,
    steps: int = 2,
) -> DataFrame:
    """Full-batch gradient descent for logistic regression from w = 0.

    ``features``: sparse rows (doc_id, dim, value) with exact integer
    values (the ``feature_hash_vectors`` shape). ``labels``: (doc_id, y)
    with y ∈ {0, 1}. Returns the dense weight vector after ``steps``
    updates as (dim, weight) for every dim in [0, dim).

    Step t: p_d = round(σ(Σ_j w_j x_dj), 6);  g_j = Σ_d round((p_d − y_d)
    · x_dj / n, 12);  w ← w − g  (learning rate 1, exact DECIMAL).
    The first step needs no sigmoid at all (w = 0 ⇒ p = 0.5 exactly).
    """
    spark = features.sparkSession
    n = labels.count()  # scalar; the only count action

    dims = spark.range(dim).select(F.col("id").cast("int").alias("dim"))
    w = dims.select("dim", F.lit(0).cast(_W).alias("w"))

    feat = features.select(
        "doc_id", F.col("dim").cast("int").alias("dim"),
        F.col("value").cast("decimal(10,0)").alias("x"),
    ).localCheckpoint(eager=True)
    lbl = labels.select("doc_id", F.col("y").cast("int").alias("y"))

    for _ in range(steps):
        margins = (
            feat.join(F.broadcast(w), "dim")
            .groupBy("doc_id")
            .agg(F.sum((F.col("x") * F.col("w")).cast(_ACC)).cast(_ACC).alias("m"))
        )
        resid = (
            lbl.join(margins, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.round(
                        F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.coalesce(F.col("m").cast("double"), F.lit(0.0)))),
                        6,
                    )
                    - F.col("y")
                ).alias("r"),
            )
        )
        grad = (
            feat.join(resid, "doc_id")
            .select(
                "dim",
                F.round(F.col("r") * F.col("x").cast("double") / F.lit(float(n)), 12)
                .cast(_G)
                .alias("g"),
            )
            .groupBy("dim")
            .agg(F.sum("g").cast(_ACC).alias("g"))
        )
        w = (
            w.join(grad, "dim", "left")
            .select(
                "dim",
                (F.col("w") - F.coalesce(F.col("g"), F.lit(0).cast(_ACC)))
                .cast(_W)
                .alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return w.select("dim", F.col("w").cast("double").alias("weight"))


def lr_score(features: DataFrame, weights: DataFrame) -> DataFrame:
    """Score documents with a trained weight vector: (doc_id, score) where
    score = round(σ(Σ w_j x_dj), 6) — the corpus-filtering pass. Broadcast
    join of the model-sized weight table into the feature scan, ONE
    doc-keyed groupBy; same determinism contract as training."""
    w = weights.select("dim", F.col("weight").cast(_W).alias("w"))
    return (
        features.select("doc_id", "dim", F.col("value").cast("decimal(10,0)").alias("x"))
        .join(F.broadcast(w), "dim")
        .groupBy("doc_id")
        .agg(F.sum((F.col("x") * F.col("w")).cast(_ACC)).cast(_ACC).alias("m"))
        .select(
            "doc_id",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m").cast("double"))), 6
            ).alias("score"),
        )
    )
