"""Iterative graph operators: connected components for dedup
clustering.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS — every
document mapped to one canonical survivor per connected component of
the similarity graph. This is the step after MinHash/SimHash/SRP in a
real corpus pipeline (and the one genuinely iterative algorithm in the
engine: label propagation to fixpoint).

Scale shape: each iteration is one join + one aggregate (both on the
node key — AQE reuses the hash partitioning); labels shrink
monotonically so convergence is O(diameter) iterations, and near-dup
graphs are overwhelmingly tiny star/clique components (diameter ≤ 2-3).
``localCheckpoint`` truncates the growing lineage each round —
without it, iteration N replays all N-1 predecessor plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = the
    minimum node id reachable from the node (deterministic canonical
    label). Min-label propagation to fixpoint, bounded by
    ``max_iter``."""
    # Symmetrize by exploding each edge into both directions in ONE
    # pass (a self-union would execute the upstream edge plan — often
    # an expensive LSH pair pipeline — twice), then materialize: `sym`
    # is re-read every iteration, and without the checkpoint each
    # label-propagation round would re-run candidate generation from
    # scratch. The checkpoint is ids-only (two longs per edge).
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        new = (
            labels.union(nbr_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # min-label propagation spreads one hop per iteration, so a
        # component of diameter > max_iter is still split here — and
        # SILENTLY returning the partial labels would give one near-dup
        # cluster several canonical ids (duplicates survive dedup with
        # no signal). Fail loudly; the caller raises max_iter (diameter
        # bound) or pre-contracts the graph.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations — a component's diameter exceeds max_iter; "
            "raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


def dedup_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, canonical_id, is_canonical) for every document:
    near-dup cluster members map to the minimum id in their component;
    singletons map to themselves. Join is on ids only — document
    bodies never enter the iteration."""
    cc = connected_components(pairs)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )
