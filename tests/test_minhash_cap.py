"""minhash_lsh_pairs(max_bucket=...) — the hot-bucket dial (SCALE.md:
candidate pairs grow quadratically in bucket width; measured 426M
candidates at 2M zipfian docs).

Contract pinned here:
- a cap no bucket exceeds is a NO-OP (bit-identical pairs);
- with a hot bucket of heavily-duplicated docs, the capped run keeps
  every duplicated doc CONNECTED (star edges within full-signature
  groups) at linear edge count, and narrow-bucket pairs are unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_trip_processing_spark.functions.minhash import (
    minhash_lsh_pairs,
)
from real_time_trip_processing_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted((r["a"], r["b"], r["inter"], r["jaccard"])
                  for r in df.collect())


def test_cap_above_all_widths_is_noop(spark):
    docs = table(spark, SF_DIR, "documents")
    base = minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8, threshold=0.2)
    capped = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.2,
        max_bucket=10_000_000,
    )
    assert _pairs(base) == _pairs(capped)
    spark.catalog.clearCache()


def test_cap_keeps_duplicate_clusters_connected(spark):
    """100 identical docs (one mega-bucket in every band, width 100 >
    cap 10) + a handful of distinct docs with one planted near-dup
    pair: capped output must (a) connect all 100 identical docs into
    one component, (b) with LINEAR edge count for that cluster, (c)
    keep the narrow-bucket near-dup pair."""
    dup_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_a = "red orange yellow green blue indigo violet amber teal pink"
    near_b = "red orange yellow green blue indigo violet amber teal navy"
    rows = [(i, dup_text) for i in range(100)]
    rows += [(100, near_a), (101, near_b)]
    rows += [(102 + i, f"unique{i} filler{i} words{i} apart{i} other{i} "
              f"stuff{i} things{i} tokens{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.5, max_bucket=10
    )
    got = _pairs(capped)

    # (c) the planted near-dup pair survives (its buckets are narrow)
    assert any(a == 100 and b == 101 for a, b, _, _ in got)

    # (a) all 100 identical docs in one connected component
    parent = list(range(102))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _, j in got:
        if a < 102 and b < 102:
            parent[find(int(a))] = find(int(b))
    comp = {find(i) for i in range(100)}
    assert len(comp) == 1, f"identical docs split into {len(comp)} components"

    # (b) linear, not quadratic: the identical-doc cluster contributes
    # ~99 star edges per band-dedup, nowhere near the 4,950 full pairs
    dup_edges = [p for p in got if p[0] < 100 and p[1] < 100]
    assert len(dup_edges) < 500, len(dup_edges)
    # and every verified surviving edge there is an exact duplicate
    assert all(j == 1.0 for _, _, _, j in dup_edges)

    # uncapped baseline DOES produce the quadratic pair mass — the cap
    # is measuring a real reduction, not an artifact
    full = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.5
    )
    n_full_dup = sum(
        1 for a, b, _, _ in _pairs(full) if a < 100 and b < 100
    )
    assert n_full_dup == 4950
    spark.catalog.clearCache()


def test_capped_pairs_subset_property(spark):
    """Structural invariant of the cap, over randomized corpora: the
    capped output can only DROP pairs relative to uncapped — star edges
    live inside buckets whose full pair set the uncapped join
    generates — and every narrow-bucket pair survives byte-identically.
    Randomized (seeded) corpora cover bucket-width shapes the planted
    fixtures don't."""
    import random

    from real_time_trip_processing_spark.functions.minhash import (
        minhash_lsh_pairs,
    )

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(120):
        k = rng.randint(6, 14)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    # a heavy duplicate cluster to force over-cap buckets
    rows += [(200 + i, rows[0][1]) for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for cap in (2, 5, 20):
        capped = {
            (r["a"], r["b"], r["inter"], r["jaccard"])
            for r in minhash_lsh_pairs(
                docs, n=2, num_perm=16, bands=4, threshold=0.3,
                max_bucket=cap,
            ).collect()
        }
        uncapped = {
            (r["a"], r["b"], r["inter"], r["jaccard"])
            for r in minhash_lsh_pairs(
                docs, n=2, num_perm=16, bands=4, threshold=0.3,
            ).collect()
        }
        assert capped <= uncapped, f"cap={cap} produced novel pairs"
        assert capped, f"cap={cap} dropped everything"
        # the duplicate cluster (doc 0 + clones) must stay connected:
        # union-find over capped pairs puts all 26 members in one set
        clones = {0} | {200 + i for i in range(25)}
        parent = {d: d for d in clones}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, _, _ in capped:
            if a in clones and b in clones:
                parent[find(a)] = find(b)
        assert len({find(d) for d in clones}) == 1, f"cap={cap} split the cluster"
