"""SimHash near-duplicate detection (SURVEY §2.12 extension).

31-bit SimHash over whitespace tokens, built entirely from codegen'd
aggregates (same shape as functions/minhash.py):

- explode (doc, token-hash) rows; the token hash is the first 32 bits
  of sha256 masked to 31 (cross-engine reproducible — DuckDB computes
  the identical value, unlike xxhash64 — and ANSI-safe);
- bit *i* of the fingerprint is the sign of ``Σ_tokens (2*bit_i(h)-1)``
  — 31 sum-aggregates in one HashAggregate, reassembled with
  shiftleft/bitwise-or;
- near-dup pairs: band the fingerprint into 4 bytes; docs sharing any
  (band, byte) bucket are candidates (a pair within Hamming distance 3
  must agree on ≥1 of 4 bands — pigeonhole); verified with
  ``bit_count(a XOR b) <= max_hamming``.

Every step is deterministic integer arithmetic, so the whole operator
(fingerprints AND pairs) is DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens

BITS = 31
BANDS = 4


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, simhash) — one codegen'd aggregate pass."""
    tok_rows = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    ).select(
        "doc",
        F.conv(F.substring(F.sha2(F.col("t"), 256), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(0x7FFFFFFF))
        .alias("h31"),
    )
    bit_sums = [
        F.sum(
            F.shiftright("h31", i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s_{i}")
        for i in range(BITS)
    ]
    agg = tok_rows.groupBy("doc").agg(*bit_sums)
    fp = F.lit(0)
    for i in range(BITS):
        fp = fp.bitwiseOR(
            F.shiftleft(F.when(F.col(f"s_{i}") > 0, 1).otherwise(0), i)
        )
    return agg.select("doc", fp.cast("long").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs (a, b, hamming) with Hamming(simhash) ≤ k via
    byte-band bucketing — no O(n²) pair space."""
    fps = simhash_fingerprints(docs, id_col, text_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * 8).bitwiseAND(F.lit(0xFF)).alias("bv"),
        )
        for b in range(BANDS)
    ]
    bucketed = fps.select(
        "doc", "simhash", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", "simhash", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))

    left = bucketed.select(
        F.col("doc").alias("a"), F.col("simhash").alias("fp_a"), "band", "bv"
    )
    right = bucketed.select(
        F.col("doc").alias("b"), F.col("simhash").alias("fp_b"), "band", "bv"
    )
    return (
        left.join(right, ["band", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .withColumn("hamming", F.col("hamming").cast("long"))
    )
