"""Targeted erasure from the persisted ANN index
(`functions/ivf_index.py` `ivf_index_delete` / `ivfpq_index_delete`) —
the index-side twin of the lake's right-to-be-forgotten purge.

Contracts pinned here:
- delete == rebuild: serve results after a delete are bit-identical to
  an index REBUILT over the purged corpus with the SAME codebook;
- freshness flips: `*_is_fresh`/`*_ensure` over the purged corpus read
  fresh (delete never triggers the O(corpus) rebuild it replaces), and
  over the full corpus read stale;
- partition-scoped: only affected cells are rewritten; a fully-erased
  cell's partition dir disappears;
- the crash matrix (intent marker → staged rows → per-cell swap →
  manifest → cleanup) re-converges from every window, including the
  S3A copy+delete rename's delete-phase crash (count heal, made
  unambiguous by the per-cell .dropped marker);
- preconditions fail loudly: live stream staging, pre-row_fp layouts,
  a pending crashed delete retried with a different id set.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_spark.functions import ivf_index as ivf_mod
from real_time_trip_processing_spark.functions.ivf_index import (
    _load_books,
    _load_centroids,
    _read_manifest,
    ann_join_persisted,
    ivf_index_append,
    ivf_index_build,
    ivf_index_delete,
    ivf_index_is_fresh,
    ivf_persisted_topk,
    ivfpq_index_build,
    ivfpq_index_delete,
    ivfpq_persisted_topk,
)
from real_time_trip_processing_spark.functions.pq import pq_train
from real_time_trip_processing_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(params=["file", "mock"])
def mk_uri(request, spark):
    """file:// (local dispatch: flock + os staging) and mock://
    (genuinely-remote dispatch: CAS lease + FS-API staging) — the
    delete lifecycle must be scheme-correct on both."""
    if request.param == "mock" and not getattr(spark, "_mock_fs_ready", False):
        pytest.skip("mock:// filesystem unavailable")
    scheme = request.param
    return lambda p: f"{scheme}://" + str(p)


def _corpus(spark):
    return table(spark, SF_DIR, "embeddings")


def _minus(corpus, ids):
    return corpus.filter(~F.col("vec_id").isin(list(ids)))


DEL_IDS = [3, 17, 40, 41]


def test_ivf_delete_matches_rebuild_same_codebook(spark, tmp_path):
    """Serve results after delete == rebuild over the purged corpus
    with the stored codebook (both topk and the ANN join), the manifest
    reads fresh against the purged corpus and stale against the full
    one, and a subsequent append still passes the parity guard."""
    emb = _corpus(spark)
    idx, idx2 = str(tmp_path / "idx"), str(tmp_path / "idx2")
    ivf_index_build(emb, idx, n_centroids=16)
    stored = _load_centroids(spark, idx)

    res = ivf_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    purged = _minus(emb, DEL_IDS)
    ivf_index_build(purged, idx2, n_centroids=16, codebook=stored)

    queries = emb.filter(F.col("vec_id") < 6)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_persisted_topk(spark, idx2, queries, k=3, nprobe=4)
    assert _rows(got) == _rows(want)
    gj = ann_join_persisted(spark, idx, queries, k=3, nprobe=4)
    wj = ann_join_persisted(spark, idx2, queries, k=3, nprobe=4)
    assert _rows(gj) == _rows(wj)
    # deleted ids serve no results as candidates
    assert not any(r[1] in DEL_IDS for r in _rows(got))

    assert ivf_index_is_fresh(spark, purged, idx, 16)
    assert not ivf_index_is_fresh(spark, emb, idx, 16)
    # no lifecycle debris
    assert not os.path.exists(os.path.join(idx, "cells.delete_intent"))
    assert not os.path.exists(os.path.join(idx, "cells.deleting"))

    # append after delete: parity guard passes, delta becomes servable,
    # and the manifest tracks purged+delta
    delta = emb.filter(F.col("vec_id").isin(DEL_IDS))  # re-add as a delta
    ivf_index_append(delta, idx)
    assert ivf_index_is_fresh(spark, purged.unionByName(delta), idx, 16)


def test_ivf_delete_noop_when_ids_absent(spark, tmp_path):
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    before = ivf_index_build(emb, idx, n_centroids=16)
    res = ivf_index_delete(spark, idx, [10**12, 10**12 + 1])
    assert res["n_deleted"] == 0
    after = _read_manifest(spark, idx, "ivf")
    assert (int(after["n_rows"]), int(after["fingerprint"])) == (
        before["n_rows"], before["fingerprint"],
    )
    assert not os.path.exists(os.path.join(idx, "cells.delete_intent"))


def test_ivf_delete_empties_a_cell(spark, tmp_path):
    """Erasing every row of one cell removes its partition dir; serving
    and freshness stay correct."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    cells = spark.read.parquet(os.path.join(idx, "cells"))
    one_cent = cells.groupBy("cent_id").count().orderBy("count").first()
    cent, ids = int(one_cent["cent_id"]), [
        int(r["vec_id"])
        for r in cells.filter(F.col("cent_id") == one_cent["cent_id"])
        .select("vec_id").collect()
    ]
    res = ivf_index_delete(spark, idx, ids)
    assert res["n_deleted"] == len(ids)
    assert not os.path.exists(os.path.join(idx, "cells", f"cent_id={cent}"))
    purged = _minus(emb, ids)
    assert ivf_index_is_fresh(spark, purged, idx, 16)
    got = ivf_persisted_topk(
        spark, idx, emb.filter(F.col("vec_id") < 4), k=3, nprobe=16
    )
    assert not any(r[1] in set(ids) for r in _rows(got))


def test_delete_refuses_live_stream_staging(spark, tmp_path):
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    os.makedirs(os.path.join(idx, "cells_stream"))
    with pytest.raises(RuntimeError, match="compact"):
        ivf_index_delete(spark, idx, DEL_IDS)


def test_delete_refuses_pre_row_fp_layout(spark, tmp_path):
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    cells_dir = os.path.join(idx, "cells")
    legacy = spark.read.parquet(cells_dir).drop("row_fp")
    tmp_out = str(tmp_path / "legacy_cells")
    legacy.write.partitionBy("cent_id").parquet(tmp_out)
    shutil.rmtree(cells_dir)
    shutil.move(tmp_out, cells_dir)
    with pytest.raises(RuntimeError, match="row_fp"):
        ivf_index_delete(spark, idx, DEL_IDS)


def _delete_with_crash(spark, idx, ids, attr, should_raise, monkeypatch):
    """Run a delete with `attr` (an ivf_index module function) rigged to
    raise the first time `should_raise(args) is True`; returns the
    raised flag."""
    real = getattr(ivf_mod, attr)
    state = {"fired": False}

    def boom(*a, **kw):
        if not state["fired"] and should_raise(a):
            state["fired"] = True
            raise RuntimeError("injected crash")
        return real(*a, **kw)

    monkeypatch.setattr(ivf_mod, attr, boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ivf_index_delete(spark, idx, ids)
    monkeypatch.setattr(ivf_mod, attr, real)
    return state["fired"]


def _assert_converged(spark, idx, emb, ids):
    """Post-retry invariants shared by every crash case: manifest ==
    purged corpus (fresh), serve == rebuild-minus, no debris."""
    purged = _minus(emb, ids)
    assert ivf_index_is_fresh(spark, purged, idx, 16)
    got = ivf_persisted_topk(
        spark, idx, emb.filter(F.col("vec_id") < 4), k=3, nprobe=16
    )
    assert not any(r[1] in set(ids) for r in _rows(got))
    assert not os.path.exists(os.path.join(idx, "cells.delete_intent"))
    assert not os.path.exists(os.path.join(idx, "cells.deleting"))


def test_crash_before_staged_marker_then_retry(spark, tmp_path, monkeypatch):
    """Crash after the intent marker but before the staging commit: the
    retry recomputes the staging from the untouched cells."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    assert _delete_with_crash(
        spark, idx, DEL_IDS, "_st_touch",
        lambda a: str(a[0]).endswith(".staged"), monkeypatch,
    )
    assert os.path.exists(os.path.join(idx, "cells.delete_intent"))
    res = ivf_index_delete(spark, idx, DEL_IDS)  # retry, same ids
    assert res["n_deleted"] == len(DEL_IDS)
    _assert_converged(spark, idx, emb, DEL_IDS)


def test_crash_mid_swap_then_retry(spark, tmp_path, monkeypatch):
    """Crash on the first per-cell rename (old dir already dropped, its
    .dropped marker written): the retry completes the remaining swaps
    from the committed staging."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    assert _delete_with_crash(
        spark, idx, DEL_IDS, "_st_rename", lambda a: True, monkeypatch
    )
    res = ivf_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    _assert_converged(spark, idx, emb, DEL_IDS)


def test_crash_before_cleanup_then_retry(spark, tmp_path, monkeypatch):
    """Crash after the manifest commit but before the marker/staging
    cleanup: the retry is a pure replay (all swaps already done)."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    assert _delete_with_crash(
        spark, idx, DEL_IDS, "_st_unlink",
        lambda a: str(a[0]).endswith(".delete_intent"), monkeypatch,
    )
    # the MANIFEST is already committed to the target, but freshness
    # deliberately reads stale while the intent marker is pending
    # (mid-surgery — the ensure() rebuild is the alternate repair)
    m = _read_manifest(spark, idx, "ivf")
    from real_time_trip_processing_spark.functions.ivf_index import (
        _corpus_stats,
    )

    n, fp = _corpus_stats(_minus(emb, DEL_IDS), "vec_id", "embedding")
    assert (int(m["n_rows"]), int(m["fingerprint"])) == (n, fp)
    assert not ivf_index_is_fresh(spark, _minus(emb, DEL_IDS), idx, 16)
    res = ivf_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    _assert_converged(spark, idx, emb, DEL_IDS)


def test_retry_with_different_ids_raises(spark, tmp_path, monkeypatch):
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    assert _delete_with_crash(
        spark, idx, DEL_IDS, "_st_rename", lambda a: True, monkeypatch
    )
    with pytest.raises(RuntimeError, match="DIFFERENT id set"):
        ivf_index_delete(spark, idx, [999])
    # and the ORIGINAL ids still converge
    ivf_index_delete(spark, idx, DEL_IDS)
    _assert_converged(spark, idx, emb, DEL_IDS)


def test_s3a_delete_phase_rename_heal(spark, tmp_path, monkeypatch):
    """Handcrafted S3A-shaped crash: the per-cell rename's COPY phase
    completed (destination holds every kept file) and its DELETE phase
    began (source remnant is missing files) before the crash. The count
    heal must keep the destination and drop the remnant — a blind
    redo-the-rename would lose the already-deleted source keys."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    assert _delete_with_crash(
        spark, idx, DEL_IDS, "_st_rename", lambda a: True, monkeypatch
    )
    staging = os.path.join(idx, "cells.deleting")
    intent = json.loads(
        open(os.path.join(idx, "cells.delete_intent")).read()
    )
    emptied = {int(c) for c in intent["emptied"]}
    c = next(int(x) for x in intent["affected"] if int(x) not in emptied)
    src = os.path.join(staging, f"cent_id={c}")
    dst = os.path.join(idx, "cells", f"cent_id={c}")
    # the injected crash fired on this cell's rename AFTER its old dir
    # was dropped and the .dropped marker written
    assert os.path.exists(os.path.join(staging, f".dropped_{c}"))
    assert not os.path.exists(dst)
    # simulate: copy completed, deletes began
    shutil.copytree(src, dst)
    victims = sorted(os.listdir(src))
    assert len(victims) >= 1
    os.unlink(os.path.join(src, victims[0]))
    res = ivf_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    _assert_converged(spark, idx, emb, DEL_IDS)


def test_pq_delete_matches_rebuild_same_books(spark, tmp_path):
    """IVF-PQ flavor: delete == rebuild over the purged corpus with the
    SAME coarse codebook and the SAME books; freshness flips."""
    emb = _corpus(spark)
    idx, idx2 = str(tmp_path / "idx"), str(tmp_path / "idx2")
    books = pq_train(emb, m=8, k=16, dim=64)
    ivfpq_index_build(emb, idx, books, n_centroids=16, dim=64)
    stored_cb = _load_centroids(spark, idx, "pq")
    stored_books, _ = _load_books(spark, idx, 64)

    res = ivfpq_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    purged = _minus(emb, DEL_IDS)
    ivfpq_index_build(
        purged, idx2, stored_books, n_centroids=16, dim=64,
        codebook=stored_cb,
    )
    queries = emb.filter(F.col("vec_id") < 6)
    got = ivfpq_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivfpq_persisted_topk(spark, idx2, queries, k=3, nprobe=4)
    assert _rows(got) == _rows(want)
    assert not any(r[1] in DEL_IDS for r in _rows(got))
    m = _read_manifest(spark, idx, "pq")
    from real_time_trip_processing_spark.functions.ivf_index import (
        _corpus_stats,
    )

    n, fp = _corpus_stats(purged, "vec_id", "embedding")
    assert (int(m["n_rows"]), int(m["fingerprint"])) == (n, fp)


def test_delete_lifecycle_on_uri(spark, tmp_path, mk_uri):
    """The full delete lifecycle addressed by URI — staging, intent
    marker, swaps and manifest all through the dual-path staging ops
    (file:// → local fast path; mock:// → FS API + CAS lease)."""
    emb = _corpus(spark)
    idx = mk_uri(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    res = ivf_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    purged = _minus(emb, DEL_IDS)
    assert ivf_index_is_fresh(spark, purged, idx, 16)
    got = ivf_persisted_topk(
        spark, idx, emb.filter(F.col("vec_id") < 4), k=3, nprobe=16
    )
    assert not any(r[1] in set(DEL_IDS) for r in _rows(got))
    # debris check through the local mirror of the URI
    local = str(tmp_path / "idx")
    assert not os.path.exists(os.path.join(local, "cells.delete_intent"))
    assert not os.path.exists(os.path.join(local, "cells.deleting"))


def test_pq_delete_allowed_alongside_ivf_stream_staging(spark, tmp_path):
    """Stream staging and the ledger belong to the IVF layout only —
    a PQ delete must proceed alongside them (the write lock already
    serializes against in-flight batches), while the IVF delete keeps
    refusing."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    books = pq_train(emb, m=8, k=16, dim=64)
    ivfpq_index_build(emb, idx, books, n_centroids=16, dim=64)
    os.makedirs(os.path.join(idx, "cells_stream"))
    with pytest.raises(RuntimeError, match="compact"):
        ivf_index_delete(spark, idx, DEL_IDS)
    res = ivfpq_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    got = ivfpq_persisted_topk(
        spark, idx, emb.filter(F.col("vec_id") < 4), k=3, nprobe=16
    )
    assert not any(r[1] in DEL_IDS for r in _rows(got))


def test_rebuild_clears_crashed_delete_debris(spark, tmp_path, monkeypatch):
    """A rebuild is the universal repair: after a crashed delete, a
    rebuild must clear the intent marker and staged rows — otherwise a
    retry of the delete would swap the PRE-rebuild staging into the
    fresh cells and commit the pre-rebuild manifest over it (silent
    resurrection of pre-rebuild content + a wrong fingerprint)."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    assert _delete_with_crash(
        spark, idx, DEL_IDS, "_st_rename", lambda a: True, monkeypatch
    )
    assert os.path.exists(os.path.join(idx, "cells.delete_intent"))
    assert os.path.exists(os.path.join(idx, "cells.deleting"))
    ivf_index_build(emb, idx, n_centroids=16)  # the repair
    assert not os.path.exists(os.path.join(idx, "cells.delete_intent"))
    assert not os.path.exists(os.path.join(idx, "cells.deleting"))
    assert ivf_index_is_fresh(spark, emb, idx, 16)
    # the delete now runs FRESH against the rebuilt index and converges
    res = ivf_index_delete(spark, idx, DEL_IDS)
    assert res["n_deleted"] == len(DEL_IDS)
    _assert_converged(spark, idx, emb, DEL_IDS)


def _crash_pre_swap(spark, idx, ids, monkeypatch):
    """Crash the delete AFTER its staging commits but BEFORE any swap
    touches the live cells (first swap-loop rmtree of a cells
    partition): parity still holds — the state the mutator guards
    exist for."""
    fired = _delete_with_crash(
        spark, idx, ids, "_st_rmtree",
        lambda a: "cent_id=" in str(a[0]), monkeypatch,
    )
    assert fired
    assert os.path.exists(os.path.join(idx, "cells.delete_intent"))
    assert os.path.exists(os.path.join(idx, "cells.deleting", ".staged"))


def test_mutators_refuse_under_pending_delete(spark, tmp_path, monkeypatch):
    """A pre-swap crashed delete leaves cells == manifest, so the
    parity guard alone would let append/compact write rows the delete
    retry's committed staging then swaps away. Both must refuse; the
    retry converges; then the append proceeds. Freshness reads stale
    mid-surgery (the ensure() rebuild path is the self-heal)."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_compact_stream,
    )

    emb = _corpus(spark)
    base = emb.filter(F.col("vec_id") < 450)
    delta = emb.filter(F.col("vec_id") >= 450)
    idx = str(tmp_path / "idx")
    ivf_index_build(base, idx, n_centroids=16)
    _crash_pre_swap(spark, idx, DEL_IDS, monkeypatch)
    assert not ivf_index_is_fresh(spark, base, idx, 16)  # mid-surgery
    with pytest.raises(RuntimeError, match="pending crashed delete"):
        ivf_index_append(delta, idx)
    with pytest.raises(RuntimeError, match="pending crashed delete"):
        ivf_index_compact_stream(spark, idx)
    res = ivf_index_delete(spark, idx, DEL_IDS)  # retry converges
    assert res["n_deleted"] == len(DEL_IDS)
    _assert_converged(spark, idx, base, DEL_IDS)
    ivf_index_append(delta, idx)  # unblocked
    assert ivf_index_is_fresh(
        spark, _minus(base, DEL_IDS).unionByName(delta), idx, 16
    )


def test_delete_retry_allowed_alongside_ledger(spark, tmp_path, monkeypatch):
    """A stream that attaches AFTER a delete crashed must not deadlock
    the lifecycle: the retry's scope was fixed at intent time (no
    staging existed then — later batches are new data, not missed
    erasure targets), so the retry proceeds despite the ledger, and
    the compaction that was refusing under the pending delete then
    folds normally."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_compact_stream,
        read_index_cells,
        streaming_index_append,
    )

    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    base = emb.filter(F.col("vec_id") < 450)
    late = emb.filter(F.col("vec_id") >= 450)
    ivf_index_build(base, idx, n_centroids=16)
    _crash_pre_swap(spark, idx, DEL_IDS, monkeypatch)
    streaming_index_append(idx)(late, 0)  # stream lands mid-surgery
    with pytest.raises(RuntimeError, match="pending crashed delete"):
        ivf_index_compact_stream(spark, idx)
    res = ivf_index_delete(spark, idx, DEL_IDS)  # retry, despite ledger
    assert res["n_deleted"] == len(DEL_IDS)
    assert ivf_index_compact_stream(spark, idx) is not None  # unblocked
    served = {
        int(r["vec_id"])
        for r in read_index_cells(spark, idx).select("vec_id").collect()
    }
    assert not served & set(DEL_IDS)
    assert served >= {int(r["vec_id"]) for r in late.select("vec_id").collect()}


def test_uncastable_ids_raise_not_skip(spark, tmp_path):
    """An id that cannot cast to the index's stored id type must raise
    — a right-to-be-forgotten op silently skipping an id it was asked
    to erase is the one unacceptable failure mode. Castable DataFrame
    ids keep working."""
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    bad = spark.createDataFrame(
        [("not-a-number",), ("3",)], "vec_id string"
    )
    with pytest.raises(ValueError, match="do not cast"):
        ivf_index_delete(spark, idx, bad)
    ok = spark.createDataFrame([("3",), ("17",)], "vec_id string")
    res = ivf_index_delete(spark, idx, ok)
    assert res["n_deleted"] == 2
    assert ivf_index_is_fresh(spark, _minus(emb, [3, 17]), idx, 16)
