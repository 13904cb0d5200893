"""Distributed Lloyd's k-means over embedding columns — the codebook
trainer for the IVF index (`similarity.ivf_topk` notes that a trained
codebook "drops in"; this trains it).

Everything is DataFrame ops: assignment is a broadcast cross join +
per-vector argmax (k is small — centroids always broadcast), the
update step is posexplode → (cluster, dim) partial means → array
rebuild. Per iteration: ONE shuffle of (k × dim) partial sums, never
of the vectors themselves. `localCheckpoint` truncates lineage so the
plan doesn't grow with iterations (same discipline as
operators/graph.py connected components).

Deterministic by construction: init = the k lowest-id vectors, cosine
ties break toward the lower centroid id — re-running on the same data
yields the same codebook, which is what makes the rows-only driver
check and the unit tests meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import cosine


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


def assign_clusters(
    vecs: DataFrame, centroids: DataFrame, vec_col: str = "v"
) -> DataFrame:
    """Nearest-centroid assignment by cosine, ties to the lower
    cent_id. One broadcast pass; the per-vector argmax is a max_by
    aggregate on the vector id — no window, no sort."""
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        "vid",
        vec_col,
        "cent_id",
        cosine(F.col(vec_col), F.col("centroid")).alias("cs"),
    )
    return (
        scored.groupBy("vid")
        .agg(
            F.max_by(
                "cent_id", F.struct(F.col("cs"), -F.col("cent_id"))
            ).alias("cent_id"),
            F.first(vec_col).alias(vec_col),
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train a k-centroid codebook; returns (cent_id int, centroid
    array<double>). Empty clusters keep their previous centroid."""
    vecs = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    w = Window.orderBy("vid")
    centroids = (
        vecs.orderBy("vid")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cent_id"),
            F.col("v").alias("centroid"),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        assigned = assign_clusters(vecs, centroids)
        updated = _rebuild(assigned)
        centroids = (
            centroids.alias("old")
            .join(updated.alias("new"), "cent_id", "left")
            .select(
                "cent_id",
                F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias(
                    "centroid"
                ),
            )
            .localCheckpoint()
        )
    return centroids
