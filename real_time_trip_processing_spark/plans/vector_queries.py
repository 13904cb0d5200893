"""Extension queries over ``embeddings``: similarity search + MinHash-LSH
near-dup (SURVEY §2.12, X2/X3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.minhash import minhash_lsh_pairs
from ..functions.similarity import cosine_topk
from ..sources import table
from .registry import declare

_COS = (
    "list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


@declare(
    "sim_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings),
         s AS (SELECT query_id, cand_id, {_COS} AS score
               FROM q CROSS JOIN c WHERE cand_id <> query_id),
         r AS (SELECT query_id, cand_id, score,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, cand_id) AS rank
               FROM s)
    SELECT query_id, cand_id, ROUND(score, 8) AS score, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def sim_topk(spark, sf_dir):
    """X3: exact brute-force top-k cosine for 5 probe vectors — the
    correctness baseline for ANN. Probes broadcast; corpus scored
    map-side; ranking window keeps k per probe."""
    emb = table(spark, sf_dir, "embeddings")
    top = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    return top.withColumn("rank", F.col("rank").cast("long"))


@declare("dedup_near_minhash", oracle=None)  # rows-only: LSH bucketing is not SQL-oracle-able
def dedup_near_minhash(spark, sf_dir):
    """X2 scale flavor: MinHash signatures over 3-gram shingles, banded
    LSH bucketing, exact-Jaccard verification of candidates only. The
    100 TB path: pair space is per-bucket, never O(n²); verified output
    is a subset of dedup_near_shingle's exact answer."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        n=3,
        num_perm=32,
        bands=8,
        threshold=0.2,
    )
