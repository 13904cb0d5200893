"""minhash_incremental_pairs — the per-ingest-cycle near-dup screen
(batch vs already-ingested corpus), completing the near-dup family's
batch → incremental progression (exact: dedup_incremental; spans:
dedup_spans_incremental).

Contracts pinned here:
- equivalence: the uncapped incremental output IS the full-corpus
  `minhash_lsh_pairs` restricted to cross-split pairs, for any split —
  the incremental shape changes the JOIN, never the semantics;
- a persisted `minhash_signatures` frame (the 100 TB corpus index,
  parquet round-tripped) yields bit-identical results to inline
  recomputation — signatures are a pure per-doc function of the text;
- the cap only DROPS pairs (capped ⊆ uncapped), narrow buckets are
  unchanged, and a batch doc sharing a FULL signature with docs in an
  over-wide corpus bucket still pairs with that group's hub.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_spark.functions.minhash import (
    minhash_incremental_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)
from real_time_trip_processing_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted(
        (r["a"], r["b"], r["inter"], r["jaccard"]) for r in df.collect()
    )


def _cross_split(full_pairs, batch_ids):
    """Reorient full-corpus pairs (a < b) to the incremental convention
    (a = corpus doc, b = batch doc), keeping only cross-split pairs."""
    out = []
    for a, b, inter, j in full_pairs:
        a_in, b_in = a in batch_ids, b in batch_ids
        if a_in == b_in:
            continue
        c, n = (b, a) if a_in else (a, b)
        out.append((c, n, inter, j))
    return sorted(out)


@pytest.mark.parametrize("mod", [3, 7])
def test_incremental_equals_cross_split_of_full(spark, mod):
    docs = table(spark, SF_DIR, "documents")
    batch = docs.filter(F.col("doc_id") % mod == 0)
    corpus = docs.filter(F.col("doc_id") % mod != 0)
    inc = minhash_incremental_pairs(
        batch, corpus, n=3, num_perm=32, bands=8, threshold=0.2, det=True
    )
    full = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.2, det=True
    )
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert _pairs(inc) == _cross_split(_pairs(full), batch_ids)
    spark.catalog.clearCache()


def test_signature_impl_dials_bit_identical(spark):
    """Every signature impl must agree PER DOC (r11 ADVICE: the old
    comparison omitted the doc id, so impls that swapped signatures
    between documents could pass as a multiset): the r12 "fused"
    map-side kernel (zero exchanges — the auto default for det=True),
    the all-JVM "exchange" window build, and the exchange build over
    the r11 "arrow" shingle kernel. Also pins the signature aggregate's
    duplicate-invariance (min / collect_set) that makes the historical
    (doc, sh) dedup exchange unnecessary. Edge docs (empty text, single
    token, within-doc duplicate grams, java-whitespace, unicode) ride
    along so the kernel's tokenizer/hash twins stay char-exact."""
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (900001, ""),
            (900002, "one"),
            (900003, "a b c a b c a b c"),
            (900004, "  x\t y\nz  w  "),
            (900005, "héllo wörld 你好 tok"),
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    fused = minhash_signatures(docs, n=3, num_perm=32, det=True)
    ex = minhash_signatures(docs, n=3, num_perm=32, det=True, impl="exchange")
    ex_arrow = minhash_signatures(
        docs, n=3, num_perm=32, det=True, impl="exchange",
        shingle_impl="arrow",
    )

    def rows(df):
        return sorted(
            (r["doc"],)
            + tuple(r[f"sig_{i}"] for i in range(32))
            + (frozenset(r["hs"]),)
            for r in df.collect()
        )

    expected = rows(ex)
    assert rows(fused) == expected
    assert rows(ex_arrow) == expected


def test_fused_requires_det(spark):
    """The fused kernel replays the md5 det hash in Python; the
    xxhash64 production flavor has no row-local twin — asking for it
    must fail loudly, not silently diverge signatures."""
    docs = table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="fused"):
        minhash_signatures(docs, det=False, impl="fused")


def test_corpus_sigs_index_path_bit_identical(spark, tmp_path):
    """The persisted-signature-index path (the corpus_hash_index dial):
    minhash_signatures written to parquet and read back must screen the
    batch bit-identically to inline recomputation from corpus text."""
    docs = table(spark, SF_DIR, "documents")
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)

    idx_dir = str(tmp_path / "sig_index")
    minhash_signatures(corpus, n=3, num_perm=32, det=True).write.parquet(idx_dir)
    stored = spark.read.parquet(idx_dir)

    via_index = minhash_incremental_pairs(
        batch, corpus_sigs=stored, n=3, num_perm=32, bands=8,
        threshold=0.2, det=True,
    )
    inline = minhash_incremental_pairs(
        batch, corpus, n=3, num_perm=32, bands=8, threshold=0.2, det=True
    )
    assert _pairs(via_index) == _pairs(inline)
    spark.catalog.clearCache()


def test_minhash_permutations_are_independent(spark):
    """Round-8 regression, structural: the signature aggregate must be
    ``min((a·(h+1)+b) mod 2^31−1)`` — WITHOUT the modulus a·h+b is
    monotone in h (a > 0), every permutation shares one argmin (the
    globally smallest shingle hash), and all 32 slots collapse to
    functions of that single value: two docs then match on ALL
    permutations or NONE (one-permutation MinHash), never in between,
    and banded LSH loses its 1−(1−j^r)^b candidate recall. Exact
    verification of candidates kept every oracle green through 7
    rounds — the oracle replays the same formula — so the pin must be
    structural: a ~0.89-jaccard pair and a ~0.29-jaccard pair must
    land strictly BETWEEN the all-or-none poles (exact slot counts are
    deterministic md5 arithmetic: 30/32 and 14/32 under the round-9
    [1, M−1] class domain — see MERSENNE_31; expected match rate is
    the jaccard, 0.89·32 ≈ 28 and 0.29·32 ≈ 9, each a within-2σ
    draw)."""
    from real_time_trip_processing_spark.functions.minhash import (
        minhash_signatures,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.rsplit(" ", 1)[0] + " omega"
    half = (
        " ".join(base.split()[:10])
        + " uno dos tres cuatro cinco seis siete ocho nueve diez"
    )

    def slots(txt):
        a = spark.createDataFrame([(0, base)], "doc_id long, text string")
        b = spark.createDataFrame([(1, txt)], "doc_id long, text string")
        ra = minhash_signatures(a, 3, 32, det=True).collect()[0]
        rb = minhash_signatures(b, 3, 32, det=True).collect()[0]
        return sum(ra[f"sig_{i}"] == rb[f"sig_{i}"] for i in range(32))

    m_near, m_half = slots(near), slots(half)
    assert 0 < m_near < 32 and 0 < m_half < 32, (m_near, m_half)
    # high-jaccard pairs match most slots, mid-jaccard pairs far fewer
    # — the graded behavior the degenerate form cannot produce (it
    # emits only 32/32 or 0/32). Deterministic values this fixture:
    # 30 and 14.
    assert m_near >= 24 and m_half <= 18, (m_near, m_half)
    assert m_near - m_half >= 8, (m_near, m_half)

    # and the banded pipeline actually FINDS the near pair
    docs = spark.createDataFrame(
        [(0, base), (1, near)], "doc_id long, text string"
    )
    got = _pairs(
        minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8, threshold=0.5)
    )
    assert len(got) == 1 and got[0][:2] == (0, 1)
    spark.catalog.clearCache()


def test_minhash_lsh_recall_floor(spark):
    """RECALL contract for banded LSH — the gate the oracle cannot be
    (both engines replay one formula, so a shared quality defect stays
    green; this is how the degenerate no-modulus form survived seven
    rounds). 300 planted near-dup pairs, one word mutated out of 40
    (≤3 of ~38 shingles change → shingle-jaccard ≈ 0.85): with 8
    bands × 4 rows the S-curve predicts ≈ 99.8% candidate recall; the
    one-permutation degenerate form would recall ≈ j (~15% of pairs
    missed), far below the floor. Deterministic corpus (seeded) +
    deterministic hashing → a fixed measured value (1.000); the floor
    sits under it with slack (the IVF/PQ recall-floor rule)."""
    import random

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    for i in range(300):
        words = [rng.choice(vocab) for _ in range(40)]
        rows.append((2 * i, " ".join(words)))
        mutated = list(words)
        mutated[rng.randrange(40)] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(
            docs, n=3, num_perm=32, bands=8, threshold=0.5
        ).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(300)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.98, f"banded-LSH recall {recall:.3f} < 0.98 floor"
    spark.catalog.clearCache()


def test_requires_corpus_or_sigs(spark):
    docs = table(spark, SF_DIR, "documents").limit(5)
    with pytest.raises(ValueError, match="corpus or corpus_sigs"):
        minhash_incremental_pairs(docs)


def test_cap_above_all_widths_is_noop(spark):
    docs = table(spark, SF_DIR, "documents")
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    base = minhash_incremental_pairs(
        batch, corpus, n=3, num_perm=32, bands=8, threshold=0.2
    )
    capped = minhash_incremental_pairs(
        batch, corpus, n=3, num_perm=32, bands=8, threshold=0.2,
        max_bucket=10_000_000,
    )
    assert _pairs(base) == _pairs(capped)
    spark.catalog.clearCache()


def test_srp_incremental_equals_cross_split_of_full(spark):
    """The embedding twin's equivalence contract: uncapped
    `srp_incremental_pairs` == the full-corpus `srp_near_dup`
    restricted to cross-split pairs (reoriented a=corpus, b=batch) —
    same rule as the minhash incremental, pinned on the real
    embeddings table."""
    from real_time_trip_processing_spark.functions.similarity import (
        srp_incremental_pairs,
        srp_near_dup,
    )

    emb = table(spark, SF_DIR, "embeddings")
    batch = emb.filter(F.col("vec_id") % 7 == 0)
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    kw = dict(num_bits=96, bands=16, threshold=0.4, dim=64)
    inc = sorted(
        (r["a"], r["b"], r["score"])
        for r in srp_incremental_pairs(batch, corpus, **kw).collect()
    )
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
    full = []
    for r in srp_near_dup(emb, **kw).collect():
        a_in, b_in = r["a"] in batch_ids, r["b"] in batch_ids
        if a_in == b_in:
            continue
        c, n = (r["b"], r["a"]) if a_in else (r["a"], r["b"])
        full.append((c, n, r["score"]))
    assert inc == sorted(full)
    assert len(inc) > 0  # the contract bites on real data
    spark.catalog.clearCache()


def test_srp_incremental_bucket_cap_drops_only(spark):
    """bucket_cap semantics (corpus-side, LOUDLY deterministic drop —
    srp_near_dup's rule): capped ⊆ uncapped; a cap above every corpus
    bucket width is a no-op."""
    from real_time_trip_processing_spark.functions.similarity import (
        srp_incremental_pairs,
    )

    emb = table(spark, SF_DIR, "embeddings")
    batch = emb.filter(F.col("vec_id") % 7 == 0)
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    kw = dict(num_bits=96, bands=16, threshold=0.4, dim=64)

    def pairs(**extra):
        return sorted(
            (r["a"], r["b"], r["score"])
            for r in srp_incremental_pairs(batch, corpus, **kw, **extra).collect()
        )

    base = pairs()
    assert pairs(bucket_cap=10_000_000) == base
    capped = pairs(bucket_cap=1)
    assert set(capped) <= set(base)
    spark.catalog.clearCache()


def test_capped_subset_and_hub_detection(spark):
    """A hot corpus bucket (60 identical docs, width 60 > cap 10) plus
    a planted narrow near-dup pair: capped output must (a) be a subset
    of uncapped, (b) keep the narrow pair byte-identically, (c) still
    flag the batch twin of the duplicated corpus content — via the
    full-signature hub, with ONE pair instead of 60."""
    dup_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_a = "red orange yellow green blue indigo violet amber teal pink"
    near_b = "red orange yellow green blue indigo violet amber teal navy"
    corpus_rows = [(i, dup_text) for i in range(60)]
    corpus_rows += [(100, near_a)]
    corpus_rows += [
        (
            200 + i,
            f"unique{i} filler{i} words{i} apart{i} other{i} "
            f"stuff{i} things{i} tokens{i}",
        )
        for i in range(20)
    ]
    batch_rows = [(1000, dup_text), (1001, near_b), (1002, "totally novel text here")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    kw = dict(n=3, num_perm=32, bands=8, threshold=0.5)
    capped = _pairs(
        minhash_incremental_pairs(batch, corpus, max_bucket=10, **kw)
    )
    full = _pairs(minhash_incremental_pairs(batch, corpus, **kw))

    # (a) subset
    assert set(capped) <= set(full)
    # (b) the narrow-bucket near-dup pair survives byte-identically
    assert [p for p in capped if p[1] == 1001] == [
        p for p in full if p[1] == 1001
    ]
    # (c) the exact-duplicate batch doc is still flagged — against the
    # hub (min corpus doc of its full-signature group) only
    dup_hits_capped = [p for p in capped if p[1] == 1000]
    dup_hits_full = [p for p in full if p[1] == 1000]
    assert len(dup_hits_full) == 60
    assert len(dup_hits_capped) == 1 and dup_hits_capped[0][0] == 0
    assert dup_hits_capped[0][3] == 1.0
    # the novel doc is flagged by neither
    assert not any(p[1] == 1002 for p in full)
    spark.catalog.clearCache()


def test_release_owned_caches_per_cycle(spark):
    """Round-9 ADVICE: the per-ingest-cycle entry points persist their
    inline signature frames (two consumers each) but previously gave
    the caller no handle — repeated cycles in a long-lived session
    accumulated cached frames only a blanket clearCache could drop.
    Now: inline-persisted frames are attached to the result and
    `release_owned_caches(pairs)` unpersists exactly them; caller-
    supplied frames are never attached (their lifecycle stays
    caller-owned)."""
    from real_time_trip_processing_spark.functions.minhash import (
        release_owned_caches,
    )

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    spark.catalog.clearCache()
    base = n_cached()
    docs = table(spark, SF_DIR, "documents").limit(40)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    corpus = docs.filter(F.col("doc_id") % 2 != 0)

    # inline flavor: corpus + batch sigs are both owned
    pairs = minhash_incremental_pairs(
        batch, corpus, n=3, num_perm=32, bands=8, threshold=0.2, det=True
    )
    pairs.collect()
    assert n_cached() > base  # the cycle really did cache frames
    assert release_owned_caches(pairs) == 2
    assert n_cached() == base
    assert release_owned_caches(pairs) == 0  # idempotent

    # caller-supplied corpus_sigs: only the inline batch sigs are owned
    idx = minhash_signatures(corpus, 3, 32, det=True).persist()
    pairs2 = minhash_incremental_pairs(
        batch, corpus_sigs=idx, n=3, num_perm=32, bands=8,
        threshold=0.2, det=True,
    )
    pairs2.collect()
    assert release_owned_caches(pairs2) == 1
    idx.unpersist()  # caller-owned, untouched by release
    assert n_cached() == base

    # the self-join flavor owns its one inline sig frame too
    pairs3 = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.2, det=True
    )
    pairs3.collect()
    assert release_owned_caches(pairs3) == 1
    assert n_cached() == base


def test_srp_corpus_index_path_bit_identical(spark, tmp_path):
    """Round-9 ADVICE: `srp_incremental_pairs(corpus_index=...)` — a
    parquet-persisted `srp_corpus_index` must screen a batch
    bit-identically to inline recomputation from corpus vectors, so a
    100 TB corpus is never re-read or re-signed per ingest cycle (the
    srp analog of the minhash twin's corpus_sigs contract). Pinned for
    both impls (the arrow kernel and the JVM fold must agree with
    their own stored signatures), and missing-both raises."""
    from real_time_trip_processing_spark.functions.similarity import (
        srp_corpus_index,
        srp_incremental_pairs,
    )

    emb = table(spark, SF_DIR, "embeddings")
    batch = emb.filter(F.col("vec_id") % 7 == 0)
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    kw = dict(num_bits=96, bands=16, threshold=0.4, dim=64)

    for impl in ("arrow", "builtin"):
        idx_dir = str(tmp_path / f"srp_index_{impl}")
        srp_corpus_index(corpus, num_bits=96, dim=64, impl=impl).write.parquet(
            idx_dir
        )
        stored = spark.read.parquet(idx_dir)
        via_index = sorted(
            (r["a"], r["b"], r["score"])
            for r in srp_incremental_pairs(
                batch, corpus_index=stored, impl=impl, **kw
            ).collect()
        )
        inline = sorted(
            (r["a"], r["b"], r["score"])
            for r in srp_incremental_pairs(
                batch, corpus, impl=impl, **kw
            ).collect()
        )
        assert via_index == inline and len(inline) > 0, impl

        # batch_index flavor (round 9): the batch side served from the
        # same stored-index shape must be bit-identical too — the
        # streaming sink pays its signature pass once on this contract
        bidx_dir = str(tmp_path / f"srp_bindex_{impl}")
        srp_corpus_index(batch, num_bits=96, dim=64, impl=impl).write.parquet(
            bidx_dir
        )
        via_both = sorted(
            (r["a"], r["b"], r["score"])
            for r in srp_incremental_pairs(
                None, corpus_index=stored,
                batch_index=spark.read.parquet(bidx_dir), impl=impl, **kw
            ).collect()
        )
        assert via_both == inline, impl

    with pytest.raises(ValueError, match="corpus or corpus_index"):
        srp_incremental_pairs(batch, **kw)
    # and the batch side gets the symmetric explicit guard (round-9
    # ADVICE: this used to be AttributeError('NoneType') from
    # batch.filter)
    with pytest.raises(ValueError, match="batch or batch_index"):
        srp_incremental_pairs(None, corpus_index=stored, **kw)
    spark.catalog.clearCache()


def test_pack_ledger_release_owned_caches(spark):
    """The pack ledger rides the same owned-cache contract (round 9):
    the bucketed path's narrow token ledger is attached to the packed
    result and released by `caching.release_owned_caches`; the
    single-window path persists nothing."""
    from real_time_trip_processing_spark.functions.caching import (
        release_owned_caches,
    )
    from real_time_trip_processing_spark.functions.curation import (
        pack_sequences,
    )

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    spark.catalog.clearCache()
    base = n_cached()
    docs = table(spark, SF_DIR, "documents").limit(200).withColumn(
        "part", F.lit("s")
    )
    packed = pack_sequences(
        docs, budget=512, part_col="part", id_col="doc_id",
        text_col="text", n_buckets=8,
    )
    packed.collect()
    assert n_cached() > base
    assert release_owned_caches(packed) == 1
    assert n_cached() == base

    single = pack_sequences(
        docs, budget=512, part_col="part", id_col="doc_id",
        text_col="text", n_buckets=1,
    )
    single.collect()
    assert release_owned_caches(single) == 0
    assert n_cached() == base


def test_release_owned_caches_distinguishes_derived_frame(spark):
    """Round-10 (round-9 low ADVICE): releasing via a DERIVED frame
    (.filter/.select lose the handle attribute) used to return the
    same 0 as "nothing was attached", so the leak the contract exists
    to fix recurred silently on the most natural misuse. Now builder
    results are ALWAYS stamped (even when nothing is owned — the
    single-window pack path), a derived-frame release returns None
    with a warning, and `has_owned_caches` exposes the live handle."""
    import warnings

    from real_time_trip_processing_spark.functions.caching import (
        has_owned_caches,
        release_owned_caches,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon zeta eta theta")
         for i in range(12)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.2, det=True
    )
    pairs.collect()
    assert has_owned_caches(pairs)

    # the misuse: a derived frame has no handle — None + warning, and
    # the builder's cache is untouched (still releasable via `pairs`)
    derived = pairs.filter(F.col("jaccard") >= 0.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert release_owned_caches(derived) is None
    assert any("owned-cache handle" in str(x.message) for x in w)
    assert has_owned_caches(pairs)  # nothing was released by the miss

    assert release_owned_caches(pairs) == 1
    assert not has_owned_caches(pairs)
    assert release_owned_caches(pairs) == 0  # idempotent, no warning

    # builder path that owns nothing still carries the stamp: 0, not
    # None — "builder result, nothing to release" stays a clean call
    from real_time_trip_processing_spark.functions.curation import (
        pack_sequences,
    )

    single = pack_sequences(
        docs.withColumn("part", F.lit("s")), budget=64,
        part_col="part", id_col="doc_id", text_col="text", n_buckets=1,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert release_owned_caches(single) == 0
    assert not w
    spark.catalog.clearCache()
