"""Measured RECALL floors for the remaining near-dup algorithms —
completing the discipline the MinHash degeneracy forced (round 8):
oracle parity cannot catch a quality defect both engines share (each
oracle replays the engine's own formula), so every similarity
construction gets a planted-pair recall contract beside its
correctness oracle. MinHash's floor lives in
tests/test_minhash_incremental.py (0.98 banded); IVF/PQ recall floors
live in plans/vector_queries.py as declared-query assertions.

Everything here is deterministic (seeded corpora, deterministic
hashing), so the measured values are fixed points and the floors sit
under them with slack — a construction regression (a collapsed
permutation, a biased plane, a broken band split) lands far below.
"""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F


def _planted_docs(spark, n_pairs=300, n_words=40, seed=20260816):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    for i in range(n_pairs):
        words = [rng.choice(vocab) for _ in range(n_words)]
        rows.append((2 * i, " ".join(words)))
        mutated = list(words)
        mutated[rng.randrange(n_words)] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(mutated)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_recall_floor(spark):
    """300 planted one-word-of-40 mutations at max_hamming=3: measured
    recall 0.887 (a 31-bit whole-doc fingerprint is the COARSE tier —
    a single word flips the bits whose token-sums sit near zero, and
    occasionally that is > 3 bits; this is the documented granularity
    trade, not a defect). Floor 0.85; a broken bit construction (e.g.
    correlated bit hashes) collapses recall far below. Also pins zero
    false positives on this corpus — every emitted pair is planted."""
    from real_time_trip_processing_spark.functions.simhash import (
        simhash_pairs,
    )

    docs = _planted_docs(spark)
    got = {
        (r["a"], r["b"]) for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(300)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.85, f"simhash recall {recall:.3f} < 0.85 floor"
    assert got <= planted  # random 40-word docs share no 3-hamming pairs
    spark.catalog.clearCache()


def test_fuzzy_pairs_recall_characterization(spark):
    """The blocked-Levenshtein linkage op gets the same treatment: 300
    planted single-substitution pairs over 40-char strings. Blocking is
    (4-char prefix, length//8): a substitution misses the block iff it
    lands in the first 4 chars — predicted recall 1 − 4/40 = 0.90,
    measured 0.873 (substitution keeps length, so only the prefix term
    bites; the gap to prediction is seeded-position sampling). Floor
    0.84 — a broken normalization or block key collapses recall to
    ~0; and every emitted pair is a planted one (no false positives at
    max_dist=2 on random strings)."""
    from real_time_trip_processing_spark.functions.text import fuzzy_pairs

    rng = random.Random(20260816)
    letters = "abcdefghijklmnopqrstuvwxyz"
    rows = []
    for i in range(300):
        s = "".join(rng.choice(letters) for _ in range(40))
        rows.append((2 * i, s))
        j = rng.randrange(40)
        rows.append((2 * i + 1, s[:j] + rng.choice(letters) + s[j + 1:]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"]) for r in fuzzy_pairs(docs, max_dist=2).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(300)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.84, f"fuzzy recall {recall:.3f} < 0.84 floor"
    assert got <= planted
    spark.catalog.clearCache()


def test_srp_near_dup_recall_floor(spark):
    """300 planted embedding pairs at cosine 0.92–0.97 (unit vectors +
    seeded gaussian noise), declared config (96 bits × 16 bands,
    threshold 0.9): per-bit collision prob 1−θ/π ≈ 0.93, miss-all-16-
    bands ≈ 1e-8 — measured recall 1.000, floor 0.99. A biased plane
    matrix or a band-split defect (the MinHash failure mode) misses
    pairs in bulk."""
    from real_time_trip_processing_spark.functions.similarity import (
        srp_near_dup,
    )

    rng = np.random.Generator(np.random.PCG64(20260816))
    base = rng.normal(size=(300, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pert = base + rng.normal(size=(300, 64)) * 0.04
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    rows = []
    for i in range(300):
        rows.append((2 * i, [float(x) for x in base[i]]))
        rows.append((2 * i + 1, [float(x) for x in pert[i]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in srp_near_dup(
            emb, num_bits=96, bands=16, threshold=0.9, dim=64
        ).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(300)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.99, f"srp recall {recall:.3f} < 0.99 floor"
    spark.catalog.clearCache()


def _span_model(texts_by_id: dict[int, str], sw: int, seen: set[str]):
    """Brute-force Python model of one span-dedup cycle: first
    occurrence within the batch by (doc_id, span index), excluded
    against ``seen``; returns ({doc: (n_spans, n_removed)}, kept_spans)
    and leaves ``seen`` grown by the batch's spans (kept spans are
    exactly the ones ``seen`` lacked, so growing by either set is
    equivalent — the sink's index invariant)."""
    removed: dict[int, int] = {}
    counts: dict[int, int] = {}
    batch_first: set[str] = set()
    kept: set[str] = set()
    for doc_id in sorted(texts_by_id):
        words = texts_by_id[doc_id].split()
        spans = [
            " ".join(words[i: i + sw]) for i in range(0, len(words), sw)
        ]
        counts[doc_id] = len(spans)
        n_rm = 0
        for s in spans:
            if s in seen or s in batch_first:
                n_rm += 1
            else:
                kept.add(s)
            batch_first.add(s)
        removed[doc_id] = n_rm
    seen.update(batch_first)
    return {d: (counts[d], removed[d]) for d in counts}, kept


def _planted_span_corpus(rng, vocab, n_docs, start_id, sw=8, n_spans=3):
    """Docs of exactly ``n_spans`` spans of ``sw`` fresh random words
    each — span boundaries are word offsets 0, sw, 2sw, so a span
    copied between docs at the same slot index is span-aligned."""
    docs = {}
    for i in range(n_docs):
        words = [rng.choice(vocab) for _ in range(sw * n_spans)]
        docs[start_id + i] = " ".join(words)
    return docs


def test_dedup_spans_incremental_recall_vs_bruteforce_model(spark):
    """Round-9 floor (verdict #4): span-grain planted-duplicate recall
    for `dedup_spans_incremental`, adjudicated against a brute-force
    Python model — the same oracle-can't-see-it reasoning as the
    MinHash episode applies to any screen whose DuckDB twin replays
    the engine's own formula. Construction is EXACT (sha-256 of exact
    spans), so the measured recall is 1.0 and the floor is per-doc
    EQUALITY with the model: 100 corpus docs, 150 batch docs with
    spans planted (a) verbatim from corpus docs, (b) duplicated
    between batch docs (lower (doc, idx) wins), (c) novel — every
    planted duplicate span must be removed and no novel span may be."""
    import hashlib as _hl

    from real_time_trip_processing_spark.operators.dedup import (
        dedup_spans_incremental,
    )

    rng = random.Random(20260816)
    vocab = [f"s{i}" for i in range(8000)]
    sw = 8
    corpus = _planted_span_corpus(rng, vocab, 100, 0, sw)
    batch = _planted_span_corpus(rng, vocab, 150, 1000, sw)

    def splice(dst_id, slot, src_text, src_slot):
        words = batch[dst_id].split()
        src = src_text.split()[src_slot * sw:(src_slot + 1) * sw]
        words[slot * sw:(slot + 1) * sw] = src
        batch[dst_id] = " ".join(words)

    n_corpus_planted = n_batch_planted = 0
    for i in range(50):  # corpus-span plantings
        splice(1000 + i, i % 3, corpus[i % 100], (i + 1) % 3)
        n_corpus_planted += 1
    for i in range(40):  # batch-internal duplicates (donor id < dest id)
        splice(1100 + i, (i + 1) % 3, batch[1000 + i], (i + 1) % 3)
        n_batch_planted += 1

    # model: corpus seen-set, then one batch cycle
    seen: set[str] = set()
    _span_model(corpus, sw, seen)
    want, _ = _span_model(batch, sw, set(seen))

    cdf = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        sorted(batch.items()), "doc_id long, text string"
    )
    got_rows = dedup_spans_incremental(bdf, cdf, span_words=sw).collect()
    got = {
        r["doc_id"]: (r["n_spans"], r["n_spans_removed"]) for r in got_rows
    }
    assert got == want

    # explicit recall statement: every planted duplicate span removed
    total_removed = sum(v[1] for v in got.values())
    assert total_removed >= n_corpus_planted + n_batch_planted
    # and the engine's rebuilt text matches the model's reconstruction
    # for a planted doc (spot-check the sha)
    doc = 1000
    words = batch[doc].split()
    spans = [" ".join(words[i: i + sw]) for i in range(0, len(words), sw)]
    kept_text = " ".join(
        s for s in spans if s not in {  # corpus spans of its donor
            " ".join(corpus[0].split()[j * sw:(j + 1) * sw]) for j in range(3)
        }
    )
    sha = _hl.sha256(kept_text.encode()).hexdigest()
    got_sha = next(r["rebuilt_sha"] for r in got_rows if r["doc_id"] == doc)
    assert got_sha == sha
    spark.catalog.clearCache()


def test_stream_span_sink_planted_recall(spark, tmp_path):
    """Round-9 floor: planted-duplicate recall END-TO-END through
    `stream_dedup_spans_sink` — the 1M scale harness measures wall and
    zero-loss but not whether planted spans actually die through the
    sink path (seed → index read → own-batch exclusion → index
    append). Seeded corpus + 3 micro-batches with duplicates planted
    within-batch, across batches and against the seed; every batch's
    audit must equal the brute-force model cycle-for-cycle (exact
    construction → recall 1.0 == equality)."""
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_span_index,
        stream_dedup_spans_sink,
    )

    rng = random.Random(20260817)
    vocab = [f"t{i}" for i in range(8000)]
    sw = 8
    corpus = _planted_span_corpus(rng, vocab, 60, 0, sw)
    batches = [
        _planted_span_corpus(rng, vocab, 40, 1000 + 100 * b, sw)
        for b in range(3)
    ]

    def splice(bdocs, dst_id, slot, src_text, src_slot):
        words = bdocs[dst_id].split()
        src = src_text.split()[src_slot * sw:(src_slot + 1) * sw]
        words[slot * sw:(slot + 1) * sw] = src
        bdocs[dst_id] = " ".join(words)

    # plant: batch0 vs seed; batch1 vs batch0; batch2 vs batch1 + seed
    for i in range(15):
        splice(batches[0], 1000 + i, i % 3, corpus[i], (i + 2) % 3)
        splice(batches[1], 1100 + i, i % 3, batches[0][1000 + 20 + i], i % 3)
        splice(batches[2], 1200 + i, i % 3, batches[1][1100 + 20 + i], i % 3)
        splice(batches[2], 1220 + i, (i + 1) % 3, corpus[30 + i], i % 3)

    idx_dir = str(tmp_path / "span_recall_idx")
    audit_dir = str(tmp_path / "span_recall_audit")
    cdf = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string"
    )
    seed_span_index(cdf, idx_dir, span_words=sw)
    sink = stream_dedup_spans_sink(idx_dir, audit_dir, span_words=sw)

    seen: set[str] = set()
    _span_model(corpus, sw, seen)
    for b, bdocs in enumerate(batches):
        bdf = spark.createDataFrame(
            sorted(bdocs.items()), "doc_id long, text string"
        )
        sink(bdf, b)
        want, _ = _span_model(bdocs, sw, seen)
        got = {
            r["doc_id"]: (r["n_spans"], r["n_spans_removed"])
            for r in spark.read.parquet(audit_dir)
            .filter(F.col("__batch_id") == b)
            .collect()
        }
        assert got == want, f"batch {b}"
        # the planted duplicates really were flagged this cycle
        assert sum(v[1] for v in got.values()) >= (15 if b < 2 else 30)
    spark.catalog.clearCache()


def test_stream_near_sink_planted_recall(spark, tmp_path):
    """Round-9 floor: planted near-dup recall END-TO-END through
    `stream_dedup_near_sink` (the screen is probabilistic — banded
    MinHash-LSH — so unlike the span sink this one needs a measured
    floor, the quantity the MinHash episode proved unmeasurable by
    oracle parity). 60 seeded corpus docs; batch 0 plants 40
    one-word-of-40 mutations of corpus docs (+20 novel), batch 1
    plants 20 mutations of batch-0 RETAINED docs (+20 novel). At 16
    bands x 2 rows and shingle-jaccard ~0.85, S-curve miss-all-bands
    ~1e-9 — measured recall 1.0; floor 0.95 across both hops; novel
    docs must all be kept (no false positives on random vocab)."""
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    rng = random.Random(20260818)
    vocab = [f"n{i}" for i in range(5000)]

    def doc(n_words=40):
        return " ".join(rng.choice(vocab) for _ in range(n_words))

    def mutate(text):
        words = text.split()
        words[rng.randrange(len(words))] = rng.choice(vocab)
        return " ".join(words)

    corpus = {i: doc() for i in range(60)}
    b0 = {1000 + i: mutate(corpus[i]) for i in range(40)}
    b0.update({1060 + i: doc() for i in range(20)})
    novel_b0 = sorted(range(1060, 1080))
    b1 = {2000 + i: mutate(b0[novel_b0[i]]) for i in range(20)}
    b1.update({2040 + i: doc() for i in range(20)})

    kw = dict(n=3, num_perm=32, bands=16, threshold=0.5)
    idx_dir = str(tmp_path / "near_recall_idx")
    audit_dir = str(tmp_path / "near_recall_audit")
    cdf = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string"
    )
    seed_minhash_index(cdf, idx_dir, n=3, num_perm=32)
    sink = stream_dedup_near_sink(idx_dir, audit_dir, **kw)
    for b, docs in enumerate([b0, b1]):
        sink(
            spark.createDataFrame(
                sorted(docs.items()), "doc_id long, text string"
            ),
            b,
        )

    audit = {
        r["doc"]: r["kept"] for r in spark.read.parquet(audit_dir).collect()
    }
    planted = list(range(1000, 1040)) + list(range(2000, 2020))
    dropped = sum(1 for d in planted if audit[d] is False)
    recall = dropped / len(planted)
    assert recall >= 0.95, f"stream near-dup recall {recall:.3f} < 0.95"
    novel = novel_b0 + list(range(2040, 2060))
    assert all(audit[d] for d in novel), "false positive on novel doc"
    spark.catalog.clearCache()
