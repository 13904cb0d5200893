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


# ---- embedding twin: stream_embed_near_sink (round 9) ----------------

def _vecs(rows):
    """doc-style embedding frame from (vid, base, jitter_seed) specs."""
    import numpy as np

    out = []
    for vid, vec in rows:
        out.append((vid, [float(x) for x in vec]))
    return out


def _unit(rng, dim=16):
    import numpy as np

    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def _near(rng, v, eps=0.03):
    import numpy as np

    w = v + rng.standard_normal(len(v)) * eps
    return w / np.linalg.norm(w)


EKW = dict(num_bits=96, bands=16, threshold=0.9, dim=16)


def _eaudit(spark, audit_dir):
    return {
        r["vid"]: (r["n_corpus_matches"], r["n_prior_batch_matches"], r["kept"])
        for r in spark.read.parquet(audit_dir).collect()
    }


def test_stream_embed_near_cross_batch_and_replay(spark, tmp_path):
    """The text sink's contract re-proven for the embedding family:
    cross-batch exclusion via the persisted SRP index, lower-id wins
    within a batch, only kept vectors join the index, and a replayed
    batch leaves audit + index row-equal (ledger-free exactly-once)."""
    import numpy as np

    from real_time_trip_processing_spark.streaming.dedup import (
        stream_embed_near_sink,
    )

    rng = np.random.Generator(np.random.PCG64(20260819))
    base0, base1 = _unit(rng), _unit(rng)
    novel1, novel2 = _unit(rng), _unit(rng)
    b0 = spark.createDataFrame(
        _vecs([(0, base0), (1, base1)]),
        "vec_id long, embedding array<double>",
    )
    # 10 near-dups retained 0 → dropped; 11 novel → kept
    b1 = spark.createDataFrame(
        _vecs([(10, _near(rng, base0)), (11, novel1)]),
        "vec_id long, embedding array<double>",
    )
    # 20/21 near-dup each other (20 wins), both novel vs index;
    # 22 near-dups retained 1
    tw = _unit(rng)
    b2 = spark.createDataFrame(
        _vecs([(20, tw), (21, _near(rng, tw)), (22, _near(rng, base1))]),
        "vec_id long, embedding array<double>",
    )
    idx_dir = str(tmp_path / "embed_idx")
    audit_dir = str(tmp_path / "embed_audit")
    sink = stream_embed_near_sink(idx_dir, audit_dir, **EKW)
    sink(b0, 0)
    sink(b1, 1)
    sink(b2, 2)

    audit = _eaudit(spark, audit_dir)
    assert audit[0] == (0, 0, True) and audit[1] == (0, 0, True)
    assert audit[10][0] >= 1 and audit[10][2] is False
    assert audit[11] == (0, 0, True)
    assert audit[20] == (0, 0, True)
    assert audit[21][1] >= 1 and audit[21][2] is False
    assert audit[22][0] >= 1 and audit[22][2] is False

    idx = spark.read.parquet(idx_dir)
    assert sorted(r["vid"] for r in idx.select("vid").collect()) == [0, 1, 11, 20]

    # replay batch 1: audit + index row-equal
    want_audit = _eaudit(spark, audit_dir)
    want_index = sorted(
        (r["vid"], r["sig"], int(r["__batch_id"])) for r in idx.collect()
    )
    sink(b1, 1)
    assert _eaudit(spark, audit_dir) == want_audit
    assert sorted(
        (r["vid"], r["sig"], int(r["__batch_id"]))
        for r in spark.read.parquet(idx_dir).collect()
    ) == want_index

    # empty batch: deterministic skip
    sink(b0.limit(0), 3)
    assert _eaudit(spark, audit_dir) == want_audit
    spark.catalog.clearCache()


def test_stream_embed_near_seeded_equals_batch_twin(spark, tmp_path):
    """seed_srp_index: a pre-ingested corpus screens batch 0, and the
    sink's verdicts equal srp_incremental_pairs against that corpus
    (stored signatures == recomputed — the corpus_index contract);
    zero-direction vectors are audited as kept with zero matches."""
    import numpy as np

    from real_time_trip_processing_spark.functions.similarity import (
        srp_incremental_pairs,
    )
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_srp_index,
        stream_embed_near_sink,
    )

    rng = np.random.Generator(np.random.PCG64(20260820))
    cvecs = [_unit(rng) for _ in range(8)]
    corpus = spark.createDataFrame(
        _vecs(list(enumerate(cvecs))), "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        _vecs(
            [(100, _near(rng, cvecs[2])), (101, _unit(rng))]
        ) + [(102, [0.0] * 16)],  # zero-direction row
        "vec_id long, embedding array<double>",
    )
    idx_dir = str(tmp_path / "seeded_embed_idx")
    audit_dir = str(tmp_path / "embed_audit2")
    seed_srp_index(corpus, idx_dir, num_bits=96, dim=16)
    stream_embed_near_sink(idx_dir, audit_dir, **EKW)(batch, 0)

    twin = srp_incremental_pairs(batch, corpus, **EKW)
    flagged = {r["b"] for r in twin.select("b").distinct().collect()}
    audit = _eaudit(spark, audit_dir)
    for vid, (n_corpus, _, kept) in audit.items():
        assert kept == (vid not in flagged)
        assert (n_corpus > 0) == (vid in flagged)
    assert flagged == {100}
    assert audit[102] == (0, 0, True)  # zero vector: audited, kept
    # ...but excluded from the index (cannot be scored)
    idx_vids = {r["vid"] for r in spark.read.parquet(idx_dir).collect()}
    assert 102 not in idx_vids and 101 in idx_vids
    spark.catalog.clearCache()


def test_stream_embed_near_planted_recall(spark, tmp_path):
    """Round-9 floor discipline applied to the NEW sink from day one:
    60 corpus vectors seeded; batch 0 plants 40 jittered twins of
    corpus vectors (+20 novel), batch 1 plants 20 twins of batch-0
    RETAINED vectors (+20 novel). At 96 bits x 16 bands and cosine
    ~0.95+ the per-band S-curve miss probability is ~1e-8 — measured
    recall 1.0, floor 0.95 across both hops; novel vectors all kept."""
    import numpy as np

    from real_time_trip_processing_spark.streaming.dedup import (
        seed_srp_index,
        stream_embed_near_sink,
    )

    rng = np.random.Generator(np.random.PCG64(20260821))
    cvecs = {i: _unit(rng) for i in range(60)}
    corpus = spark.createDataFrame(
        _vecs(sorted(cvecs.items())), "vec_id long, embedding array<double>"
    )
    b0 = {1000 + i: _near(rng, cvecs[i]) for i in range(40)}
    novel0 = {1060 + i: _unit(rng) for i in range(20)}
    b0.update(novel0)
    b1 = {2000 + i: _near(rng, novel0[1060 + i]) for i in range(20)}
    b1.update({2040 + i: _unit(rng) for i in range(20)})

    idx_dir = str(tmp_path / "embed_recall_idx")
    audit_dir = str(tmp_path / "embed_recall_audit")
    seed_srp_index(corpus, idx_dir, num_bits=96, dim=16)
    sink = stream_embed_near_sink(idx_dir, audit_dir, **EKW)
    for b, docs in enumerate([b0, b1]):
        sink(
            spark.createDataFrame(
                _vecs(sorted(docs.items())),
                "vec_id long, embedding array<double>",
            ),
            b,
        )

    audit = {r["vid"]: r["kept"]
             for r in spark.read.parquet(audit_dir).collect()}
    planted = list(range(1000, 1040)) + list(range(2000, 2020))
    dropped = sum(1 for d in planted if audit[d] is False)
    recall = dropped / len(planted)
    assert recall >= 0.95, f"stream embed near-dup recall {recall:.3f} < 0.95"
    novel = list(range(1060, 1080)) + list(range(2040, 2060))
    assert all(audit[d] for d in novel), "false positive on novel vector"
    spark.catalog.clearCache()


# ---- GDPR erasure from the dedup signature indexes (round 9) ---------

def test_delete_docs_from_minhash_index_forgets(spark, tmp_path):
    """Erasing a doc from the MinHash signature index == the index
    rebuilt over the purged corpus (signatures are per-doc rows), and
    content near-duping the erased doc is subsequently admitted as
    novel — erasure really forgets. The audit dir purges with the same
    call. Idempotent re-run returns 0."""
    from pyspark.sql import functions as F  # noqa: F811

    from real_time_trip_processing_spark.streaming.dedup import (
        delete_docs_from_dedup_index,
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "gdpr_near_idx")
    audit_dir = str(tmp_path / "gdpr_near_audit")
    seed_minhash_index(corpus, idx_dir, n=3, num_perm=32)
    sink = stream_dedup_near_sink(idx_dir, audit_dir, **KW)
    b0 = spark.createDataFrame(
        [(10, NOVEL)], "doc_id long, text string"
    )
    sink(b0, 0)  # 10 kept → index now {0, 1, 10}

    # near-dup of doc 0 is screened out while 0 is indexed
    probe = spark.createDataFrame(
        [(20, NEAR_BASE)], "doc_id long, text string"
    )
    sink(probe, 1)
    assert _audit(spark, audit_dir)[20][2] is False

    # erase doc 0 (and its screened-out probe's audit rows)
    n = delete_docs_from_dedup_index(spark, idx_dir, [0, 20])
    assert n >= 1
    assert delete_docs_from_dedup_index(spark, idx_dir, [0]) == 0
    delete_docs_from_dedup_index(spark, audit_dir, [0, 20])
    audit_ids = set(_audit(spark, audit_dir))
    assert 20 not in audit_ids and 0 not in audit_ids

    # the erased-row index IS the rebuild over the purged corpus
    got = _index_rows(spark, idx_dir)
    rebuilt_dir = str(tmp_path / "rebuilt_idx")
    seed_minhash_index(
        corpus.filter(F.col("doc_id") != 0), rebuilt_dir, n=3, num_perm=32
    )
    sink2 = stream_dedup_near_sink(rebuilt_dir, str(tmp_path / "ra"), **KW)
    sink2(b0, 0)
    # compare content columns (batch-id provenance differs by design:
    # erasure preserves surviving rows' partitions)
    strip = lambda rows: sorted(r[:-1] for r in rows)  # noqa: E731
    assert strip(got) == strip(_index_rows(spark, rebuilt_dir))

    # a fresh near-dup of the erased doc is now ADMITTED
    probe2 = spark.createDataFrame(
        [(30, NEAR_BASE)], "doc_id long, text string"
    )
    sink(probe2, 2)
    a30 = _audit(spark, audit_dir)[30]
    assert a30 == (0, 0, True), a30
    spark.catalog.clearCache()


def test_delete_docs_from_srp_index_forgets(spark, tmp_path):
    """The SRP flavor of the same contract (id_col='vid'): erase a
    corpus vector, its jittered twin is subsequently admitted."""
    import numpy as np

    from real_time_trip_processing_spark.streaming.dedup import (
        delete_docs_from_dedup_index,
        seed_srp_index,
        stream_embed_near_sink,
    )

    rng = np.random.Generator(np.random.PCG64(20260822))
    v0, v1 = _unit(rng), _unit(rng)
    corpus = spark.createDataFrame(
        _vecs([(0, v0), (1, v1)]), "vec_id long, embedding array<double>"
    )
    idx_dir = str(tmp_path / "gdpr_embed_idx")
    audit_dir = str(tmp_path / "gdpr_embed_audit")
    seed_srp_index(corpus, idx_dir, num_bits=96, dim=16)
    sink = stream_embed_near_sink(idx_dir, audit_dir, **EKW)

    probe = spark.createDataFrame(
        _vecs([(10, _near(rng, v0))]), "vec_id long, embedding array<double>"
    )
    sink(probe, 0)
    assert _eaudit(spark, audit_dir)[10][2] is False

    assert delete_docs_from_dedup_index(
        spark, idx_dir, [0], id_col="vid"
    ) >= 1
    idx_vids = {r["vid"] for r in spark.read.parquet(idx_dir).collect()}
    assert idx_vids == {1}

    # the documented two-call contract (docstring: "a full erasure
    # calls this once per directory"): the AUDIT dir purges with the
    # same call — erased ids absent from both dirs afterwards
    assert delete_docs_from_dedup_index(
        spark, audit_dir, [10], id_col="vid"
    ) >= 1
    # explicit schema: vid 10 was the only audited row, so the purged
    # dir may hold no data files at all (inference would die on it)
    remaining_audit = spark.read.schema(
        "vid long, n_corpus_matches long, n_prior_batch_matches long, "
        "kept boolean, __batch_id int"
    ).parquet(audit_dir)
    assert 10 not in {r["vid"] for r in remaining_audit.collect()}
    assert 10 not in {
        r["vid"] for r in spark.read.parquet(idx_dir).collect()
    }

    probe2 = spark.createDataFrame(
        _vecs([(20, _near(rng, v0))]), "vec_id long, embedding array<double>"
    )
    sink(probe2, 1)
    assert _eaudit(spark, audit_dir)[20] == (0, 0, True)
    spark.catalog.clearCache()


def test_erasure_vs_replay_ordering(spark, tmp_path):
    """Round-9 review: the sinks' exactly-once mechanism REPLAYS a
    batch by rewriting its partition from source — so an index erasure
    races replays. Pinned in both directions: a replay from a PURGED
    source cannot resurrect the erased row (the documented
    purge-source-first contract), and a replay from an UNPURGED source
    DOES resurrect it (the hazard the docstring warns about)."""
    from pyspark.sql import functions as F  # noqa: F811

    from real_time_trip_processing_spark.streaming.dedup import (
        delete_docs_from_dedup_index,
        stream_dedup_near_sink,
    )

    b0 = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "replay_race_idx")
    audit_dir = str(tmp_path / "replay_race_audit")
    sink = stream_dedup_near_sink(idx_dir, audit_dir, **KW)
    sink(b0, 0)  # both kept → index {0, 1}

    # GDPR: erase doc 0 from the index
    assert delete_docs_from_dedup_index(spark, idx_dir, [0]) == 1

    def idx_ids():
        return sorted(
            r["doc"] for r in spark.read.parquet(idx_dir).collect()
        )

    assert idx_ids() == [1]

    # replay batch 0 from the PURGED source (doc 0 erased upstream
    # first — the documented ordering): the row stays gone
    sink(b0.filter(F.col("doc_id") != 0), 0)
    assert idx_ids() == [1]

    # replay from an UNPURGED source: the erased row is RESURRECTED —
    # exactly the hazard the docstring orders the purge around
    sink(b0, 0)
    assert idx_ids() == [0, 1]
    spark.catalog.clearCache()


# ---- signature-format marker (round 10: the round-9 medium ADVICE) ---

def test_sig_format_marker_refuses_stale_or_mismatched_index(spark, tmp_path):
    """The documented silent-failure mode — a stale-formula signature
    index makes the vs-corpus screen collapse to zero candidates,
    admitting every near-dup as novel — now has a runtime guard: seeds
    and sinks stamp a _SIG_FORMAT marker (formula version + every
    value-shifting parameter) and assert it at index read, failing the
    batch instead of silently screening nothing."""
    import os

    import pytest

    from real_time_trip_processing_spark.fsio import (
        fs_delete,
        fs_read_text,
        fs_write_text,
    )
    from real_time_trip_processing_spark.streaming.dedup import (
        SIG_MARKER_NAME,
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "fmt_idx")
    seed_minhash_index(corpus, idx_dir, n=3, num_perm=32)
    # tamper through the same FS API the writers use (Hadoop's local
    # FS keeps .crc sidecars — a plain open() rewrite would checksum-fail)
    marker = os.path.join(idx_dir, SIG_MARKER_NAME)
    token = fs_read_text(spark, marker).strip()
    assert token.startswith("minhash/v") and "num_perm=32" in token

    b = spark.createDataFrame([(10, NOVEL)], "doc_id long, text string")

    # a sink whose parameters would compute DIFFERENT signatures than
    # the index holds fails its first batch loudly
    mismatched = stream_dedup_near_sink(
        idx_dir, str(tmp_path / "a1"), n=3, num_perm=16, bands=8,
        threshold=0.5,
    )
    with pytest.raises(ValueError, match="signature-format mismatch"):
        mismatched(b, 0)

    # a pre-marker (or foreign) index — data present, marker absent —
    # is unverifiable: refused, with the rebuild path named
    fs_delete(spark, marker)
    sink = stream_dedup_near_sink(
        idx_dir, str(tmp_path / "a2"), **KW
    )
    with pytest.raises(ValueError, match="no _SIG_FORMAT"):
        sink(b, 0)

    # a stale-version marker (the exact round-9 class-domain scenario)
    fs_write_text(
        spark, marker, "minhash/v1;n=3;num_perm=32;det=false;id=bigint\n"
    )
    with pytest.raises(ValueError, match="signature-format mismatch"):
        sink(b, 0)

    # re-seeding over a format-mismatched index refuses too (dynamic
    # overwrite would leave stale streamed partitions mixed in)
    with pytest.raises(ValueError, match="signature-format mismatch"):
        seed_minhash_index(corpus, idx_dir, n=5, num_perm=32)

    # restoring the true format heals everything: sink proceeds, and a
    # matching re-seed is fine
    fs_write_text(spark, marker, token + "\n")
    sink(b, 0)
    assert _audit(spark, str(tmp_path / "a2"))[10][2] is True
    seed_minhash_index(corpus, idx_dir, n=3, num_perm=32)
    spark.catalog.clearCache()


def test_sig_format_marker_stamped_by_first_sink_batch(spark, tmp_path):
    """An unseeded sink stamps the marker at its first batch (before
    the first index write — a crash between them leaves a marked,
    readable dir for the replay), and every later batch re-asserts it.
    The SRP/embedding sink carries the same contract."""
    import os

    import numpy as np
    import pytest

    from real_time_trip_processing_spark.streaming.dedup import (
        SIG_MARKER_NAME,
        stream_dedup_near_sink,
        stream_embed_near_sink,
    )

    idx_dir = str(tmp_path / "stamp_idx")
    sink = stream_dedup_near_sink(idx_dir, str(tmp_path / "sa"), **KW)
    sink(
        spark.createDataFrame([(0, BASE)], "doc_id long, text string"), 0
    )
    with open(os.path.join(idx_dir, SIG_MARKER_NAME)) as f:
        assert f.read().startswith("minhash/v")

    rng = np.random.Generator(np.random.PCG64(20260816))
    eidx_dir = str(tmp_path / "stamp_eidx")
    esink = stream_embed_near_sink(eidx_dir, str(tmp_path / "ea"), **EKW)
    esink(
        spark.createDataFrame(
            _vecs([(0, _unit(rng))]), "vec_id long, embedding array<double>"
        ),
        0,
    )
    with open(os.path.join(eidx_dir, SIG_MARKER_NAME)) as f:
        etoken = f.read().strip()
    assert etoken.startswith("srp/v") and "num_bits=96" in etoken

    # a differently-parameterized embed sink against the same index
    # refuses (stale SRP bits screen nothing)
    bad = stream_embed_near_sink(
        eidx_dir, str(tmp_path / "eb"), num_bits=64, bands=16,
        threshold=0.9, dim=16,
    )
    with pytest.raises(ValueError, match="signature-format mismatch"):
        bad(
            spark.createDataFrame(
                _vecs([(1, _unit(rng))]),
                "vec_id long, embedding array<double>",
            ),
            1,
        )
    spark.catalog.clearCache()


def test_sink_id_type_checked_at_first_batch(spark, tmp_path):
    """Round-9 ADVICE: an id_type/stream-schema mismatch used to
    surface only at the SECOND batch (the explicit-schema index read),
    far from the misconfiguration. Both sinks now validate the batch's
    id column against id_type at the first apply and raise at the
    site."""
    import numpy as np
    import pytest

    from real_time_trip_processing_spark.streaming.dedup import (
        stream_dedup_near_sink,
        stream_embed_near_sink,
    )

    b = spark.createDataFrame([(0, BASE)], "doc_id long, text string")
    sink = stream_dedup_near_sink(
        str(tmp_path / "t_idx"), str(tmp_path / "t_aud"),
        id_type="int", **KW,
    )
    with pytest.raises(ValueError, match="id_type"):
        sink(b, 0)

    rng = np.random.Generator(np.random.PCG64(20260817))
    eb = spark.createDataFrame(
        _vecs([(0, _unit(rng))]), "vec_id long, embedding array<double>"
    )
    esink = stream_embed_near_sink(
        str(tmp_path / "e_idx"), str(tmp_path / "e_aud"),
        id_type="string", **EKW,
    )
    with pytest.raises(ValueError, match="id_type"):
        esink(eb, 0)

    # 'long' vs 'bigint' are the same type under canonicalization —
    # no false refusal on DDL synonyms
    ok = stream_dedup_near_sink(
        str(tmp_path / "ok_idx"), str(tmp_path / "ok_aud"),
        id_type="bigint", **KW,
    )
    ok(b, 0)
    assert _audit(spark, str(tmp_path / "ok_aud"))[0][2] is True
    spark.catalog.clearCache()


def test_rebuild_span_index_after_purge(spark, tmp_path):
    """The executable span-index erasure recovery (round-9 verdict #5):
    purge docs from the lake, rebuild the span index in one call —
    spans unique to purged docs are gone (including ones that arrived
    via STREAMED partitions, which a bare re-seed would leave behind),
    spans shared with surviving docs remain, and the sink resumes
    against the rebuilt index."""
    import hashlib

    from real_time_trip_processing_spark.operators.maintenance import (
        delete_keys_from_lake,
    )
    from real_time_trip_processing_spark.streaming.dedup import (
        rebuild_span_index_after_purge,
        seed_span_index,
        stream_dedup_spans_sink,
    )

    shared = " ".join(f"s{i}" for i in range(16))
    u0 = " ".join(f"u{i}" for i in range(16))
    u1 = " ".join(f"w{i}" for i in range(16))
    u5 = " ".join(f"v{i}" for i in range(16))
    lake = str(tmp_path / "lake")
    spark.createDataFrame(
        [(0, shared + " " + u0, 1), (1, shared + " " + u1, 2), (5, u5, 3)],
        "doc_id long, text string, day int",
    ).write.partitionBy("day").parquet(lake)

    idx_dir = str(tmp_path / "span_idx")
    seed_span_index(
        spark.createDataFrame(
            [(0, shared + " " + u0), (1, shared + " " + u1)],
            "doc_id long, text string",
        ),
        idx_dir,
        span_words=16,
    )
    sink = stream_dedup_spans_sink(
        idx_dir, str(tmp_path / "span_aud"), span_words=16
    )
    # doc 5 arrives via the STREAM → its span lives in partition 0,
    # which a plain re-seed (dynamic overwrite of -1 only) would keep
    sink(spark.createDataFrame([(5, u5)], "doc_id long, text string"), 0)

    h = lambda t: hashlib.sha256(t.encode()).hexdigest()  # noqa: E731
    before = {r["span_hash"] for r in spark.read.parquet(idx_dir).collect()}
    assert {h(shared), h(u0), h(u1), h(u5)} <= before

    delete_keys_from_lake(spark, lake, "doc_id", [0, 5], ["day"])
    rebuild_span_index_after_purge(spark, lake, idx_dir, span_words=16)

    after = {r["span_hash"] for r in spark.read.parquet(idx_dir).collect()}
    assert h(u0) not in after and h(u5) not in after
    assert h(shared) in after and h(u1) in after

    # the stream resumes: a duplicate of a SURVIVING span is still
    # excluded; a span of the purged doc is readmitted (really forgot)
    sink(
        spark.createDataFrame(
            [(7, u1 + " " + u5)], "doc_id long, text string"
        ),
        1,
    )
    aud = {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "span_aud")).collect()
    }
    assert aud[7]["n_spans_removed"] == 1  # u1 excluded, u5 readmitted
    spark.catalog.clearCache()


def test_sig_format_marker_on_remote_scheme(spark, tmp_path, mock_fs):
    """The marker contract over a genuinely-remote Hadoop FS (the
    mock:// scheme): seed writes the marker through the FS API, the
    sink asserts it per batch, a parameter-mismatched sink refuses —
    the same behavior the local paths pin, proven scheme-agnostic."""
    import pytest

    from real_time_trip_processing_spark.fsio import fs_read_text
    from real_time_trip_processing_spark.streaming.dedup import (
        SIG_MARKER_NAME,
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    idx_dir = mock_fs(tmp_path / "remote_fmt_idx")
    audit_dir = mock_fs(tmp_path / "remote_fmt_audit")
    seed_minhash_index(corpus, idx_dir, n=3, num_perm=32)
    token = fs_read_text(spark, idx_dir + "/" + SIG_MARKER_NAME)
    assert token is not None and token.strip().startswith("minhash/v")

    b = spark.createDataFrame([(10, NOVEL)], "doc_id long, text string")
    sink = stream_dedup_near_sink(idx_dir, audit_dir, **KW)
    sink(b, 0)
    assert _audit(spark, audit_dir)[10][2] is True

    mismatched = stream_dedup_near_sink(
        idx_dir, mock_fs(tmp_path / "remote_a2"), n=5, num_perm=32,
        bands=16, threshold=0.5,
    )
    with pytest.raises(ValueError, match="signature-format mismatch"):
        mismatched(b, 1)
    spark.catalog.clearCache()


def test_compact_dedup_index_folds_committed_batches(spark, tmp_path):
    """Round-10 lifecycle: `compact_dedup_index` folds committed batch
    partitions into the seed partition. Pinned: the folded index is
    row-equal (modulo __batch_id provenance) to an untouched twin, a
    FUTURE batch's verdicts are identical against either, the format
    marker survives, re-run is a no-op, and a simulated
    crash-before-delete (rows duplicated across -1 and an original
    partition) converges on re-run instead of doubling."""
    import os

    from real_time_trip_processing_spark.fsio import fs_read_text
    from real_time_trip_processing_spark.streaming.dedup import (
        SIG_MARKER_NAME,
        compact_dedup_index,
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    batches = [
        spark.createDataFrame([(10, NOVEL)], "doc_id long, text string"),
        spark.createDataFrame(
            [(20, "fresh content " + " ".join(f"tok{i}" for i in range(18)))],
            "doc_id long, text string",
        ),
        spark.createDataFrame(
            [(30, " ".join(f"w{i}" for i in range(20)))],
            "doc_id long, text string",
        ),
    ]
    probe = spark.createDataFrame(
        # 40 near-dups retained doc 0; 41 novel
        [(40, NEAR_BASE), (41, " ".join(f"z{i}" for i in range(20)))],
        "doc_id long, text string",
    )

    def build(tag):
        idx = str(tmp_path / f"cidx_{tag}")
        aud = str(tmp_path / f"caud_{tag}")
        seed_minhash_index(corpus, idx, n=3, num_perm=32)
        sink = stream_dedup_near_sink(idx, aud, **KW)
        for i, b in enumerate(batches):
            sink(b, i)
        return idx, aud, sink

    idx_a, aud_a, sink_a = build("a")      # will be compacted
    idx_b, aud_b, sink_b = build("b")      # untouched twin

    def content(idx):
        # row set ignoring provenance (__batch_id)
        df = spark.read.parquet(idx).drop("__batch_id").withColumn(
            "hs", F.array_sort("hs")
        )
        return sorted(tuple(r) for r in df.collect())

    def partitions(idx):
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(idx)
            if d.startswith("__batch_id=")
        )

    marker_before = fs_read_text(
        spark, idx_a + "/" + SIG_MARKER_NAME
    )
    assert partitions(idx_a) == [-1, 0, 1, 2]
    saved_p1 = spark.read.parquet(idx_a).filter(
        F.col("__batch_id") == 1
    ).collect()

    # fold batches 0..1 (committed); batch 2 stays
    assert compact_dedup_index(spark, idx_a, through_batch=1) == 2
    assert partitions(idx_a) == [-1, 2]
    assert content(idx_a) == content(idx_b)
    assert fs_read_text(spark, idx_a + "/" + SIG_MARKER_NAME) == marker_before
    # no staging leftover, and re-run is a no-op
    assert not os.path.exists(os.path.join(idx_a, "_compact_staging"))
    assert compact_dedup_index(spark, idx_a, through_batch=1) == 0

    # a FUTURE batch sees the identical row set: verdicts equal the twin
    sink_a(probe, 3)
    sink_b(probe, 3)
    assert _audit(spark, aud_a)[40] == _audit(spark, aud_b)[40]
    assert _audit(spark, aud_a)[41] == _audit(spark, aud_b)[41]
    assert _audit(spark, aud_a)[40][2] is False  # near-dup still caught
    assert _audit(spark, aud_a)[41][2] is True
    assert content(idx_a) == content(idx_b)

    # simulated crash-before-delete: partition 1's rows exist BOTH in
    # the folded -1 and (restored) in their original partition — the
    # re-run converges to the same row set, no doubling
    spark.createDataFrame(saved_p1, spark.read.parquet(idx_a).schema) \
        .write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .partitionBy("__batch_id").parquet(idx_a)
    want = content(idx_b)
    assert compact_dedup_index(spark, idx_a, through_batch=1) == 1
    assert content(idx_a) == want
    assert partitions(idx_a) == [-1, 2, 3]
    spark.catalog.clearCache()


def test_compact_dedup_index_replay_hazard(spark, tmp_path):
    """The ordering contract's hazard twin (same shape as
    erasure-vs-replay): compacting a batch the checkpoint has NOT
    committed, then replaying it, makes the replayed docs screen
    against their own folded signatures — every one reads as a
    duplicate of itself and the replay is no longer bit-identical.
    Pinned so the only-compact-committed-batches contract stays
    honest."""
    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        stream_dedup_near_sink,
    )

    idx = str(tmp_path / "rh_idx")
    aud = str(tmp_path / "rh_aud")
    sink = stream_dedup_near_sink(idx, aud, **KW)
    b0 = spark.createDataFrame([(0, BASE)], "doc_id long, text string")
    sink(b0, 0)
    assert _audit(spark, aud)[0] == (0, 0, True)

    # fold batch 0 BELOW the committed watermark, then replay it
    assert compact_dedup_index(spark, idx, through_batch=0) == 1
    sink(b0, 0)
    # the replayed doc now matches its own folded signature: marked a
    # corpus duplicate — the exact divergence the contract forbids
    assert _audit(spark, aud)[0][0] >= 1 and _audit(spark, aud)[0][2] is False
    spark.catalog.clearCache()


# ---- exact-dedup sink: the fourth family member (round 10) -----------

def test_stream_exact_dedup_cross_batch_replay_and_twin(spark, tmp_path):
    """`stream_dedup_exact_sink` carries the family contract: seeded
    corpus screens batch 0 (verdicts equal the batch twin
    dedup_incremental's survivors), lowest id per hash wins within a
    batch, only kept docs join the index, a replayed batch leaves
    audit + index row-equal, and the null-as-empty content rule holds
    (NULL text == '' text — one survivor between them)."""
    from real_time_trip_processing_spark.operators.dedup import (
        dedup_incremental,
    )
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_exact_index,
        stream_dedup_exact_sink,
    )

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "exact_idx")
    audit_dir = str(tmp_path / "exact_audit")
    seed_exact_index(corpus, idx_dir)
    sink = stream_dedup_exact_sink(idx_dir, audit_dir)

    # 10 = exact re-upload of corpus doc 0 (case/space-normalized);
    # 11 novel; 12/13 exact dups of each other (12 wins);
    # 14 NULL text and 15 empty text (null-as-empty: 14 wins)
    b0 = spark.createDataFrame(
        [(10, "  " + BASE.upper() + " "), (11, NOVEL),
         (12, "same thing twice"), (13, "same thing twice"),
         (14, None), (15, "")],
        "doc_id long, text string",
    )
    sink(b0, 0)
    audit = _audit(spark, audit_dir)
    assert audit[10][0] >= 1 and audit[10][2] is False   # corpus dup
    assert audit[11] == (0, 0, True)
    assert audit[12] == (0, 0, True)
    assert audit[13] == (0, 1, False)                    # 12 wins
    assert audit[14] == (0, 0, True)
    assert audit[15] == (0, 1, False)                    # null == empty

    # verdicts equal the batch twin: dedup_incremental's survivors
    twin_kept = {
        r["doc_id"]
        for r in dedup_incremental(b0, corpus).select("doc_id").collect()
    }
    assert twin_kept == {d for d, a in audit.items() if a[2]}

    # only kept docs joined the index (plus the 2 seeded)
    idx_docs = sorted(
        r["doc"] for r in spark.read.parquet(idx_dir).collect()
    )
    assert idx_docs == [0, 1, 11, 12, 14]

    # cross-batch: a re-upload of retained doc 11 is dropped
    b1 = spark.createDataFrame([(20, NOVEL)], "doc_id long, text string")
    sink(b1, 1)
    assert _audit(spark, audit_dir)[20][2] is False

    # replay batch 1: audit + index row-equal
    want_audit = _audit(spark, audit_dir)
    want_index = sorted(
        tuple(r) for r in spark.read.parquet(idx_dir).collect()
    )
    sink(b1, 1)
    assert _audit(spark, audit_dir) == want_audit
    assert sorted(
        tuple(r) for r in spark.read.parquet(idx_dir).collect()
    ) == want_index

    # empty batch: deterministic skip
    sink(b0.limit(0), 2)
    assert _audit(spark, audit_dir) == want_audit
    spark.catalog.clearCache()


def test_stream_exact_dedup_lifecycle_ops_apply(spark, tmp_path):
    """The doc-keyed index is what buys the lifecycle: GDPR erasure
    (re-upload of erased content subsequently ADMITTED), committed-
    batch compaction (future verdicts unchanged), and the format
    marker (a mis-typed sink refuses at the first batch)."""
    import pytest

    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        delete_docs_from_dedup_index,
        seed_exact_index,
        stream_dedup_exact_sink,
    )

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "exact_life_idx")
    audit_dir = str(tmp_path / "exact_life_audit")
    seed_exact_index(corpus, idx_dir)
    sink = stream_dedup_exact_sink(idx_dir, audit_dir)

    # re-upload of doc 0 is screened while 0 is indexed
    sink(spark.createDataFrame([(10, BASE)], "doc_id long, text string"), 0)
    assert _audit(spark, audit_dir)[10][2] is False

    # erase doc 0 → a fresh exact re-upload is ADMITTED
    assert delete_docs_from_dedup_index(spark, idx_dir, [0]) >= 1
    sink(spark.createDataFrame([(20, BASE)], "doc_id long, text string"), 1)
    assert _audit(spark, audit_dir)[20] == (0, 0, True)

    # compact committed batches; a later duplicate is still caught
    n = compact_dedup_index(spark, idx_dir, through_batch=1)
    assert n >= 1
    sink(spark.createDataFrame([(30, BASE)], "doc_id long, text string"), 2)
    assert _audit(spark, audit_dir)[30][2] is False

    # id-type misconfiguration raises at the first batch
    bad = stream_dedup_exact_sink(
        str(tmp_path / "x_idx"), str(tmp_path / "x_aud"), id_type="int"
    )
    with pytest.raises(ValueError, match="id_type"):
        bad(spark.createDataFrame([(1, "t")], "doc_id long, text string"), 0)
    spark.catalog.clearCache()


def test_compact_dedup_index_property(spark, tmp_path):
    """Property (hypothesis): for RANDOM docs (tiny content domain →
    lots of collisions), any batch split and any committed watermark,
    compaction leaves the index content-identical to an untouched twin
    and a subsequent probe batch's verdicts identical — the
    read-equivalence contract under randomized structure, not just the
    hand-built cases."""
    import itertools

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        stream_dedup_exact_sink,
    )

    counter = itertools.count()

    @settings(
        max_examples=6, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        contents=st.lists(
            st.integers(min_value=0, max_value=4), min_size=1, max_size=14
        ),
        n_batches=st.integers(min_value=1, max_value=3),
        through=st.integers(min_value=0, max_value=2),
        probe_contents=st.lists(
            st.integers(min_value=0, max_value=4), min_size=1, max_size=4
        ),
    )
    def prop(contents, n_batches, through, probe_contents):
        tag = next(counter)
        docs = [
            (i, f"content {c} " + "w " * 6) for i, c in enumerate(contents)
        ]
        batches = [
            [d for j, d in enumerate(docs) if j % n_batches == b]
            for b in range(n_batches)
        ]
        through_b = min(through, n_batches - 1)

        def drive(side):
            idx = str(tmp_path / f"p{tag}_{side}_idx")
            aud = str(tmp_path / f"p{tag}_{side}_aud")
            sink = stream_dedup_exact_sink(idx, aud)
            for bid, rows in enumerate(batches):
                if rows:
                    sink(
                        spark.createDataFrame(
                            rows, "doc_id long, text string"
                        ),
                        bid,
                    )
            return idx, aud, sink

        idx_a, aud_a, sink_a = drive("a")
        idx_b, aud_b, sink_b = drive("b")
        compact_dedup_index(spark, idx_a, through_batch=through_b)

        def content(idx):
            try:
                return sorted(
                    (r["doc"], r["text_hash"])
                    for r in spark.read.parquet(idx).collect()
                )
            except Exception:  # all batches empty — no index dir
                return []

        assert content(idx_a) == content(idx_b)

        probe = spark.createDataFrame(
            [(1000 + i, f"content {c} " + "w " * 6)
             for i, c in enumerate(probe_contents)],
            "doc_id long, text string",
        )
        sink_a(probe, n_batches)
        sink_b(probe, n_batches)
        pa = {k: v for k, v in _audit(spark, aud_a).items() if k >= 1000}
        pb = {k: v for k, v in _audit(spark, aud_b).items() if k >= 1000}
        assert pa == pb
        assert content(idx_a) == content(idx_b)

    prop()
    spark.catalog.clearCache()


def test_dedup_index_stats(spark, tmp_path):
    """FS-only health report: format token, partition extent (the
    committed-watermark ceiling for compaction), file/byte counts —
    and the shapes the lifecycle transitions produce (absent dir,
    seeded, streamed, compacted)."""
    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        dedup_index_stats,
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    idx = str(tmp_path / "stats_idx")
    s0 = dedup_index_stats(spark, idx)
    assert s0 == {"exists": False, "format": None, "n_partitions": 0,
                  "min_batch_id": None, "max_batch_id": None,
                  "n_files": 0, "bytes": 0}

    corpus = spark.createDataFrame(
        [(0, BASE), (1, OTHER)], "doc_id long, text string"
    )
    seed_minhash_index(corpus, idx, n=3, num_perm=32)
    s1 = dedup_index_stats(spark, idx)
    assert s1["exists"] and s1["format"].startswith("minhash/v")
    assert (s1["min_batch_id"], s1["max_batch_id"]) == (-1, -1)
    assert s1["n_files"] > 0 and s1["bytes"] > 0

    sink = stream_dedup_near_sink(idx, str(tmp_path / "stats_aud"), **KW)
    for b in range(3):
        sink(
            spark.createDataFrame(
                [(10 + b, f"batch {b} " + " ".join(f"q{b}{i}" for i in range(18)))],
                "doc_id long, text string",
            ),
            b,
        )
    s2 = dedup_index_stats(spark, idx)
    assert s2["n_partitions"] == 4  # -1 plus batches 0..2
    assert (s2["min_batch_id"], s2["max_batch_id"]) == (-1, 2)
    assert s2["n_files"] > s1["n_files"]

    # committer debris must NOT inflate the report (round-10 review:
    # a crashed in-flight write leaves _temporary/.../__batch_id=K
    # whose batch never committed — the report sees the index the way
    # readers do, hidden-prefix names skipped unless they contain '=')
    import os as _os

    debris = _os.path.join(idx, "_temporary", "0", "__batch_id=99")
    _os.makedirs(debris)
    with open(_os.path.join(debris, "part-stale.parquet"), "wb") as f:
        f.write(b"debris")
    s2b = dedup_index_stats(spark, idx)
    assert s2b["max_batch_id"] == 2 and s2b["n_partitions"] == 4
    assert s2b["n_files"] == s2["n_files"]

    compact_dedup_index(spark, idx, through_batch=s2["max_batch_id"])
    s3 = dedup_index_stats(spark, idx)
    assert s3["n_partitions"] == 1
    assert (s3["min_batch_id"], s3["max_batch_id"]) == (-1, -1)
    assert s3["n_files"] < s2["n_files"]
    assert s3["format"] == s2["format"]  # marker untouched
    spark.catalog.clearCache()


def test_dedup_index_stats_dot_prefixed_eq_name_hidden(spark, tmp_path):
    """Round-10 ADVICE: Spark's shouldFilterOutPathName hides '.'-
    prefixed paths UNCONDITIONALLY — the '=' carve-out applies only to
    '_'. A '.x=y' entry is therefore reader-invisible and must not
    count toward files/bytes (and its '=' must not parse as a
    partition)."""
    import os as _os

    from real_time_trip_processing_spark.streaming.dedup import (
        dedup_index_stats,
        seed_minhash_index,
    )

    idx = str(tmp_path / "dot_idx")
    seed_minhash_index(
        spark.createDataFrame([(0, BASE)], "doc_id long, text string"),
        idx, n=3, num_perm=32,
    )
    s_before = dedup_index_stats(spark, idx)

    dot = _os.path.join(idx, ".x=y")
    _os.makedirs(dot)
    with open(_os.path.join(dot, "part-junk.parquet"), "wb") as f:
        f.write(b"reader-invisible")
    s_after = dedup_index_stats(spark, idx)
    assert s_after == s_before  # counts, extent, bytes all unchanged
    spark.catalog.clearCache()


def test_compact_dedup_index_refuses_concurrent_writer(spark, tmp_path):
    """Round-10 ADVICE fail-fast on the stop-the-stream-first contract:
    a __batch_id partition landing between the entry snapshot and the
    commit (here: planted right after the staging write completes)
    aborts the compaction BEFORE the reader-visible index is touched —
    RuntimeError, staging deleted, every original partition intact."""
    import os as _os

    import pytest
    from pyspark.sql.readwriter import DataFrameWriter

    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    idx = str(tmp_path / "cw_idx")
    seed_minhash_index(
        spark.createDataFrame(
            [(0, BASE), (1, OTHER)], "doc_id long, text string"
        ),
        idx, n=3, num_perm=32,
    )
    sink = stream_dedup_near_sink(idx, str(tmp_path / "cw_aud"), **KW)
    sink(spark.createDataFrame([(10, NOVEL)], "doc_id long, text string"), 0)
    sink(
        spark.createDataFrame(
            [(20, " ".join(f"cw{i}" for i in range(20)))],
            "doc_id long, text string",
        ),
        1,
    )

    def partitions():
        return sorted(
            int(d.split("=")[1])
            for d in _os.listdir(idx)
            if d.startswith("__batch_id=")
        )

    rows_before = _index_rows(spark, idx)
    real_parquet = DataFrameWriter.parquet

    def parquet_then_concurrent_batch(self, path, *a, **kw):
        out = real_parquet(self, path, *a, **kw)
        if str(path).endswith("_compact_staging"):
            # the "live stream": a new batch partition appears while
            # the fold window is mid-flight
            _os.makedirs(_os.path.join(idx, "__batch_id=2"), exist_ok=True)
        return out

    DataFrameWriter.parquet = parquet_then_concurrent_batch
    try:
        with pytest.raises(RuntimeError, match="stream is still writing"):
            compact_dedup_index(spark, idx, through_batch=1)
    finally:
        DataFrameWriter.parquet = real_parquet

    # aborted pre-commit: originals intact, no staging, rows untouched
    assert partitions() == [-1, 0, 1, 2]
    assert not _os.path.exists(_os.path.join(idx, "_compact_staging"))
    _os.rmdir(_os.path.join(idx, "__batch_id=2"))
    assert _index_rows(spark, idx) == rows_before
    # with the "stream" stopped, the re-run proceeds normally
    assert compact_dedup_index(spark, idx, through_batch=1) == 2
    assert partitions() == [-1]
    spark.catalog.clearCache()


def test_compact_dedup_index_cleans_stale_staging(spark, tmp_path):
    """Round-10 ADVICE: a crash after the originals are deleted but
    before the staging delete leaves _compact_staging behind, and the
    re-run's nothing-to-fold early exit would never reclaim it — the
    entry sweep now does, on both the fold path and the early exit."""
    import os as _os

    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        dedup_index_stats,
        seed_minhash_index,
    )

    idx = str(tmp_path / "ss_idx")
    seed_minhash_index(
        spark.createDataFrame([(0, BASE)], "doc_id long, text string"),
        idx, n=3, num_perm=32,
    )
    # the crash residue: fold window already deleted, staging left
    stale = _os.path.join(idx, "_compact_staging")
    _os.makedirs(stale)
    with open(_os.path.join(stale, "part-crash.parquet"), "wb") as f:
        f.write(b"stale fold window")

    # seed-only index -> nothing to fold -> early exit, but the stale
    # staging is reclaimed instead of leaking forever
    assert compact_dedup_index(spark, idx, through_batch=10) == 0
    assert not _os.path.exists(stale)
    assert dedup_index_stats(spark, idx)["n_partitions"] == 1
    spark.catalog.clearCache()


def test_compact_dedup_index_refuses_unmarked_index(spark, tmp_path):
    """Round-10 ADVICE: compacting an index that holds parquet data but
    no _SIG_FORMAT marker (pre-marker or foreign-written — the state
    check_sig_format refuses at read time) refuses up front instead of
    folding unverifiable rows and letting the failure surface later at
    the sink's read."""
    import os as _os

    import pytest

    from real_time_trip_processing_spark.streaming.dedup import (
        SIG_MARKER_NAME,
        compact_dedup_index,
        seed_minhash_index,
    )

    idx = str(tmp_path / "um_idx")
    seed_minhash_index(
        spark.createDataFrame([(0, BASE)], "doc_id long, text string"),
        idx, n=3, num_perm=32,
    )
    _os.remove(_os.path.join(idx, SIG_MARKER_NAME))  # the foreign index
    with pytest.raises(ValueError, match="no _SIG_FORMAT marker"):
        compact_dedup_index(spark, idx, through_batch=10)

    # data-less dirs stay a quiet no-op (nothing unverifiable exists)
    empty = str(tmp_path / "um_empty")
    _os.makedirs(empty)
    assert compact_dedup_index(spark, empty, through_batch=10) == 0
    spark.catalog.clearCache()


def test_rebuild_span_index_detects_concurrent_writer(spark, tmp_path):
    """Round-10 ADVICE fail-fast for the rebuild window: a streamed
    partition appearing DURING rebuild_span_index_after_purge (the
    window starts by deleting everything, so any __batch_id >= 0 at
    the end is by definition a concurrent sink write) raises loudly
    instead of leaving the divergence for the next read to find."""
    import pytest

    import real_time_trip_processing_spark.streaming.dedup as sdd

    lake = str(tmp_path / "cwr_lake")
    spark.createDataFrame(
        [(0, " ".join(f"s{i}" for i in range(16)), 1)],
        "doc_id long, text string, day int",
    ).write.partitionBy("day").parquet(lake)

    idx = str(tmp_path / "cwr_idx")
    sdd.seed_span_index(
        spark.createDataFrame(
            [(0, " ".join(f"s{i}" for i in range(16)))],
            "doc_id long, text string",
        ),
        idx, span_words=16,
    )

    real_seed = sdd.seed_span_index

    def seed_then_concurrent_batch(*a, **kw):
        out = real_seed(*a, **kw)
        # the "live stream": a sink batch lands inside the window
        import os as _os

        _os.makedirs(_os.path.join(idx, "__batch_id=0"), exist_ok=True)
        return out

    sdd.seed_span_index = seed_then_concurrent_batch
    try:
        with pytest.raises(RuntimeError, match="DURING the rebuild"):
            sdd.rebuild_span_index_after_purge(spark, lake, idx, span_words=16)
    finally:
        sdd.seed_span_index = real_seed

    # stream "stopped" (partition removed): idempotent re-run succeeds
    import os as _os

    _os.rmdir(_os.path.join(idx, "__batch_id=0"))
    sdd.rebuild_span_index_after_purge(spark, lake, idx, span_words=16)
    assert spark.read.parquet(idx).count() >= 1
    spark.catalog.clearCache()


def test_compact_committed_watermark_end_to_end(spark, tmp_path):
    """The executable form of the compaction ordering contract: the
    watermark comes from the stream's OWN checkpoint commit log
    (`stream_committed_watermark` = max of commits/, which Spark never
    replays below), not from FS observation. End-to-end over a real
    file-source stream: 3 committed batches -> watermark 2; deleting
    commits/2 (the crashed-pre-commit shape — offsets present, commit
    missing, so batch 2 WILL replay) drops the watermark to 1;
    `compact_dedup_index_committed` folds exactly batches 0..1; and a
    real restart of the query then replays batch 2 against the folded
    index with identical verdicts — the replay-safety the commit-log
    watermark exists to guarantee."""
    import json as _json
    import os as _os

    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index_committed,
        dedup_index_stats,
    )
    from real_time_trip_processing_spark.streaming.sinks import (
        stream_committed_watermark,
    )

    src = tmp_path / "wm_src"
    src.mkdir()
    docs = {0: BASE, 1: OTHER, 2: NOVEL}  # mutually non-near-dup
    for i, text in docs.items():
        path = src / f"f{i}.json"
        path.write_text(_json.dumps({"doc_id": i, "text": text}) + "\n")
        _os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    idx = str(tmp_path / "wm_idx")
    aud = str(tmp_path / "wm_aud")
    ckpt = str(tmp_path / "wm_ckpt")
    sink = stream_dedup_near_sink(idx, aud, **KW)

    # fresh checkpoint: nothing committed, nothing safe to fold
    assert stream_committed_watermark(spark, ckpt) is None
    assert compact_dedup_index_committed(spark, idx, ckpt) == 0

    def run_query():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_query()
    s = dedup_index_stats(spark, idx)
    assert s["n_partitions"] == 3 and s["max_batch_id"] == 2
    assert stream_committed_watermark(spark, ckpt) == 2
    def canon_rows():
        # index content ignoring provenance: drop __batch_id, sort the
        # unordered hs array, make array values hashable
        df = spark.read.parquet(idx).drop("__batch_id").withColumn(
            "hs", F.array_sort("hs")
        )
        return sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.collect()
        )

    verdicts_before = _audit(spark, aud)
    rows_before = canon_rows()

    # crashed-pre-commit shape: batch 2 wrote its partition but its
    # commit never landed — it WILL replay, so it must not be foldable.
    # (A real crash never writes commits/2 at all; simulating it by
    # deletion must also drop the local ChecksumFs '.2.crc' sidecar,
    # or the replay's commit rewrite hits a stale-CRC rename clash.)
    _os.remove(_os.path.join(ckpt, "commits", "2"))
    crc = _os.path.join(ckpt, "commits", ".2.crc")
    if _os.path.exists(crc):
        _os.remove(crc)
    assert stream_committed_watermark(spark, ckpt) == 1

    assert compact_dedup_index_committed(spark, idx, ckpt) == 2  # 0 and 1
    s = dedup_index_stats(spark, idx)
    assert (s["min_batch_id"], s["max_batch_id"]) == (-1, 2)

    # the real restart: Spark replays batch 2 (offset without commit)
    # against the folded index — same verdicts, same rows, and the
    # commit log catches back up
    run_query()
    assert _audit(spark, aud) == verdicts_before
    assert canon_rows() == rows_before
    assert stream_committed_watermark(spark, ckpt) == 2
    spark.catalog.clearCache()


def test_stream_committed_watermark_ignores_temp_files(spark, tmp_path):
    """commits/ entries are bare integers; HDFSMetadataLog's in-flight
    temp files are dot-prefixed and must not parse as batch ids."""
    import os as _os

    from real_time_trip_processing_spark.streaming.sinks import (
        stream_committed_watermark,
    )

    ckpt = tmp_path / "tf_ckpt"
    (ckpt / "commits").mkdir(parents=True)
    for name in ("0", "1", ".2.tmp.123", "_SPURIOUS"):
        (ckpt / "commits" / name).write_text("v1\n{}")
    assert stream_committed_watermark(spark, str(ckpt)) == 1
    assert stream_committed_watermark(spark, str(tmp_path / "nope")) is None
    _os.makedirs(tmp_path / "empty_ckpt" / "commits")
    assert (
        stream_committed_watermark(spark, str(tmp_path / "empty_ckpt"))
        is None
    )


def test_compact_dedup_index_detects_fold_window_rewrite(spark, tmp_path):
    """Round-11 review: the id-set guard alone missed a replay that
    REWRITES an existing fold-window partition (dynamic overwrite = new
    part files, same partition id). The per-file (name, size)
    fingerprint catches it: rewrite between the staging write and the
    commit -> abort, no staging left, no partition deleted."""
    import glob as _glob
    import os as _os

    import pytest
    from pyspark.sql.readwriter import DataFrameWriter

    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        seed_minhash_index,
        stream_dedup_near_sink,
    )

    idx = str(tmp_path / "rw_idx")
    seed_minhash_index(
        spark.createDataFrame([(0, BASE)], "doc_id long, text string"),
        idx, n=3, num_perm=32,
    )
    sink = stream_dedup_near_sink(idx, str(tmp_path / "rw_aud"), **KW)
    sink(spark.createDataFrame([(10, NOVEL)], "doc_id long, text string"), 0)
    sink(spark.createDataFrame([(20, OTHER)], "doc_id long, text string"), 1)

    part1 = _os.path.join(idx, "__batch_id=1")
    real_parquet = DataFrameWriter.parquet

    def parquet_then_rewrite(self, path, *a, **kw):
        out = real_parquet(self, path, *a, **kw)
        if str(path).endswith("_compact_staging"):
            # the "replay": partition 1 is dynamic-overwritten — same
            # partition id, new part-file name
            for f in _glob.glob(_os.path.join(part1, "part-*")):
                _os.rename(
                    f, _os.path.join(part1, "part-replayed.parquet")
                )
        return out

    DataFrameWriter.parquet = parquet_then_rewrite
    try:
        with pytest.raises(RuntimeError, match="REWRITTEN"):
            compact_dedup_index(spark, idx, through_batch=1)
    finally:
        DataFrameWriter.parquet = real_parquet

    # aborted pre-commit: both batch partitions intact, no staging
    assert _os.path.isdir(part1)
    assert _os.path.isdir(_os.path.join(idx, "__batch_id=0"))
    assert not _os.path.exists(_os.path.join(idx, "_compact_staging"))
    # with the stream quiet the re-run folds normally
    assert compact_dedup_index(spark, idx, through_batch=1) == 2
    spark.catalog.clearCache()


def test_batch_partition_parser_ignores_non_integer(spark, tmp_path):
    """The shared __batch_id parser ignores a non-integer suffix (e.g.
    Hive's null-partition dir) instead of crashing — stats extent and
    compaction are unaffected by such debris."""
    import os as _os

    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        dedup_index_stats,
        seed_minhash_index,
    )

    idx = str(tmp_path / "hv_idx")
    seed_minhash_index(
        spark.createDataFrame([(0, BASE)], "doc_id long, text string"),
        idx, n=3, num_perm=32,
    )
    _os.makedirs(_os.path.join(idx, "__batch_id=__HIVE_DEFAULT_PARTITION__"))
    s = dedup_index_stats(spark, idx)
    assert (s["min_batch_id"], s["max_batch_id"]) == (-1, -1)
    assert s["n_partitions"] == 1
    assert compact_dedup_index(spark, idx, through_batch=10) == 0
    spark.catalog.clearCache()
