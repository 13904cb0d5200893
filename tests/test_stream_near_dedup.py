"""stream_dedup_near_sink — streaming near-dup screening, the
continuous-ingest twin of `minhash_incremental_pairs`, completing the
near-dup family's batch → incremental → streaming progression.

Pinned here (the stream_dedup_spans_sink contract, re-proven for the
near-dup index whose rows are signatures + shingle sets, not bare
hashes):
- cross-batch exclusion: docs near-duplicating content RETAINED by
  prior batches are dropped; within-batch the lower id wins;
- only kept docs join the index (canonical-corpus semantics);
- a replayed batch reproduces its first attempt (own-partition-
  excluding read + dynamic overwrite) and leaves audit + index
  row-equal;
- `seed_minhash_index` bootstraps the index from an existing corpus,
  equal to the batch twin run against that corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_trip_processing_spark.functions.minhash import (
    minhash_incremental_pairs,
)
from real_time_trip_processing_spark.streaming.dedup import (
    seed_minhash_index,
    stream_dedup_near_sink,
)

# 2 rows/band → a jaccard-0.8 pair misses all 16 bands with p ≈ 1e-7,
# and everything is deterministic hashing: once green, always green
KW = dict(n=3, num_perm=32, bands=16, threshold=0.5)

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon"
)
NEAR_BASE = BASE.rsplit(" ", 1)[0] + " omega"  # one word changed
OTHER = (
    "red orange yellow green blue indigo violet amber teal navy "
    "crimson scarlet maroon coral salmon peach bronze copper gold silver"
)
NOVEL = (
    "one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)


def _audit(spark, audit_dir):
    return {
        r["doc"]: (r["n_corpus_matches"], r["n_prior_batch_matches"], r["kept"])
        for r in spark.read.parquet(audit_dir).collect()
    }


def _index_rows(spark, idx_dir):
    """Canonical index content: hs is collect_set-unordered, so sort it
    (every consumer is order-independent — the documented contract)."""
    df = spark.read.parquet(idx_dir).withColumn(
        "hs", F.array_sort("hs")
    )
    return sorted(tuple(r) for r in df.collect())


def test_stream_near_dedup_cross_batch_and_replay(spark, tmp_path):
    b0 = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    # 10 near-dups retained doc 0 → dropped; 11 novel → kept
    b1 = spark.createDataFrame(
        [(10, NEAR_BASE), (11, NOVEL)], "doc_id long, text string"
    )
    # 20 and 21 are exact dups of each other (within-batch: 20 wins),
    # and both are novel vs the index; 22 near-dups retained doc 1
    b2 = spark.createDataFrame(
        [
            (20, "fresh content " + " ".join(f"tok{i}" for i in range(18))),
            (21, "fresh content " + " ".join(f"tok{i}" for i in range(18))),
            (22, OTHER.rsplit(" ", 1)[0] + " platinum"),
        ],
        "doc_id long, text string",
    )
    idx_dir = str(tmp_path / "near_idx")
    audit_dir = str(tmp_path / "near_audit")
    sink = stream_dedup_near_sink(idx_dir, audit_dir, **KW)

    sink(b0, 0)
    sink(b1, 1)
    sink(b2, 2)

    audit = _audit(spark, audit_dir)
    assert audit[0] == (0, 0, True) and audit[1] == (0, 0, True)
    assert audit[10][0] >= 1 and audit[10][2] is False  # near-dup of 0
    assert audit[11] == (0, 0, True)
    assert audit[20] == (0, 0, True)
    assert audit[21][1] >= 1 and audit[21][2] is False  # lower id 20 wins
    assert audit[22][0] >= 1 and audit[22][2] is False  # near-dup of 1

    # index holds exactly the kept docs' signatures
    idx = spark.read.parquet(idx_dir)
    assert sorted(r["doc"] for r in idx.select("doc").collect()) == [0, 1, 11, 20]

    # REPLAY batch 1 (at-least-once delivery): audit + index row-equal
    want_audit = _audit(spark, audit_dir)
    want_index = _index_rows(spark, idx_dir)
    sink(b1, 1)
    assert _audit(spark, audit_dir) == want_audit
    assert _index_rows(spark, idx_dir) == want_index

    # empty batch: deterministic skip, nothing written
    sink(b0.limit(0), 3)
    assert _audit(spark, audit_dir) == want_audit
    assert _index_rows(spark, idx_dir) == want_index


def test_stream_near_dedup_seeded_corpus(spark, tmp_path):
    """seed_minhash_index: a pre-ingested corpus screens batch 0, and
    the sink's verdicts equal the batch twin minhash_incremental_pairs
    against that corpus."""
    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, NEAR_BASE), (11, NOVEL)], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "seeded_near_idx")
    audit_dir = str(tmp_path / "near_audit2")
    seed_minhash_index(corpus, idx_dir, n=3, num_perm=32)
    stream_dedup_near_sink(idx_dir, audit_dir, **KW)(batch, 0)

    twin = minhash_incremental_pairs(batch, corpus, **KW)
    flagged = {r["b"] for r in twin.select("b").distinct().collect()}
    audit = _audit(spark, audit_dir)
    for doc_id, (n_corpus, _, kept) in audit.items():
        assert kept == (doc_id not in flagged)
        assert (n_corpus > 0) == (doc_id in flagged)
    assert flagged == {10}
    spark.catalog.clearCache()
