"""Distributed Lloyd's k-means over embedding columns — the codebook
trainer for the IVF index (`similarity.ivf_topk` notes that a trained
codebook "drops in"; this trains it).

Scale shape (the one that survives 100 TB of vectors):
- the codebook is DRIVER-RESIDENT: k × dim scalars (k ≤ a few hundred)
  collected once per iteration — the same discipline as Spark MLlib's
  KMeans, whose per-iteration `collect()` of cluster centers is the
  canonical pattern for iterative refinement;
- assignment scores all k centroids WITHIN one row: the centroids are
  an array *literal* in the projection, so assignment is a map-side
  `transform` + argmax — zero extra rows, zero shuffle, and the
  embedding column never enters an exchange (pinned by
  tests/test_plan_shapes.py::test_kmeans_assignment_no_vector_shuffle);
- the update step shuffles only (k × dim) partial sums (posexplode →
  per-(cluster, dim) means). Per iteration the ONLY shuffle is that
  k × dim aggregate — never the vectors themselves;
- no lineage growth: every iteration's plan starts fresh from the
  corpus scan plus new literals, so no checkpointing is needed.

Deterministic by construction: init = the k lowest-id vectors that
have a cosine direction (zero-quantized rows are never seeds), cosine
ties break toward the lower centroid id — re-running on the same data
yields the same codebook up to float-summation order in the means
(which is why the declared `kmeans_codebook` query asserts structural
invariants rather than centroid bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import (
    CentroidRows, has_quant_direction, nearest_centroid,
    nearest_centroid_kernel,
)


def assign_clusters(
    vecs: DataFrame,
    centroids: CentroidRows | DataFrame,
    vec_col: str = "v",
    impl: str = "arrow",
) -> DataFrame:
    """Nearest-centroid assignment: a pure map-side projection — every
    centroid is scored inside the row, so no exchange ever carries the
    vector column (the k-fold candidate blow-up of a join-based
    assignment is gone entirely). ``impl="arrow"`` (default) scores one
    BLAS matmul per Arrow batch; ``impl="builtin"`` is the interpreted
    JVM fold — bit-identical by the quantized-integer contract
    (similarity module note). Accepts the codebook as driver rows or as
    a k-row (cent_id, centroid) DataFrame (collected — k × dim
    scalars)."""
    if isinstance(centroids, DataFrame):
        centroids = [
            (int(r["cent_id"]), list(r["centroid"])) for r in centroids.collect()
        ]
    if impl == "arrow":
        cent = nearest_centroid_kernel(centroids)(F.col(vec_col))
    else:
        cent = nearest_centroid(F.col(vec_col), centroids)
    return vecs.select(
        "vid",
        F.col(vec_col).alias(vec_col),
        cent.alias("cent_id"),
    )


def _rebuild(assigned: DataFrame) -> DataFrame:
    """(cent_id, v) rows → (cent_id, centroid) with centroid = the
    dimension-wise mean rebuilt into an array ordered by position."""
    return (
        assigned.select("cent_id", F.posexplode("v").alias("pos", "val"))
        .groupBy("cent_id", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("cent_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def kmeans_fit_rows(
    emb: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> CentroidRows:
    """Train a k-centroid codebook; returns the driver-side rows
    (cent_id, centroid). Empty clusters keep their previous centroid.

    Each iteration moves k × dim doubles to the driver and k × dim
    literals back into the next plan — the corpus itself never moves.
    """
    vecs = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # init from the k lowest-id vectors WITH a cosine direction — a
    # zero-quantized init row would seed a zero-norm centroid, which
    # every cosine assignment downstream divides by (the same rule
    # _resolve_centroids applies to the default first-N codebook)
    init = (
        vecs.filter(has_quant_direction(F.col("v")))
        .orderBy("vid").limit(k).collect()
    )
    centroids: CentroidRows = [(i, list(r["v"])) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = assign_clusters(vecs, centroids)
        updated = {r["cent_id"]: list(r["centroid"]) for r in _rebuild(assigned).collect()}
        centroids = [(cid, updated.get(cid, old)) for cid, old in centroids]
    return centroids


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame flavor of `kmeans_fit_rows`: (cent_id int, centroid
    array<double>), k rows."""
    rows = kmeans_fit_rows(emb, k, iters, id_col, vec_col)
    spark = SparkSession.getActiveSession() or emb.sparkSession
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in rows], "cent_id INT, centroid ARRAY<DOUBLE>"
    )
