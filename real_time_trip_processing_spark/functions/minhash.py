"""MinHash + banded LSH near-duplicate detection — the scale path for
X2 (SURVEY §2.12).

All deterministic, all built-in expressions:
- permutation *i* is the seeded hash ``xxhash64(i, shingle)`` (seeding by
  prepending the constant — xxhash64 hashes the column tuple);
- signature = array of per-permutation minima (map-side, no shuffle);
- LSH: signature split into ``bands`` bands, each band hashed; docs
  sharing any (band, band_hash) bucket become candidate pairs — the only
  shuffle is the bucket join, and bucket sizes bound the pair space;
- candidates are verified with exact shingle-set Jaccard, so the output
  has no false positives (only LSH's false-negative risk remains, the
  standard trade).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import shingles


def minhash_signature(sh: Column, num_perm: int) -> Column:
    """array<long> MinHash signature of a shingle array."""
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(F.lit(i), s)))
            for i in range(num_perm)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs (a, b, jaccard) via MinHash-LSH candidates +
    exact-Jaccard verification."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    base = docs.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), num_perm))

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("bh"),
        )
        for b in range(bands)
    ]
    bucketed = base.select("doc", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )

    left = bucketed.select(F.col("doc").alias("a"), "band", "bh")
    right = bucketed.select(F.col("doc").alias("b"), "band", "bh")
    candidates = (
        left.join(right, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

    sh_a = base.select(F.col("doc").alias("a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("doc").alias("b"), F.col("sh").alias("sh_b"))
    verified = (
        candidates.join(sh_a, "a")
        .join(sh_b, "b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(
        "a", "b", F.col("inter").cast("long").alias("inter"),
        F.round("jaccard", 8).alias("jaccard")
    )
