"""Object-store-capable persisted-index lifecycle (round 7): every
staging op (rename, marker, ledger, high-water) and the single-writer
lock must work against Hadoop-FS URI index dirs, not only plain local
paths. ``file://`` URIs are the scheme-correctness proxy — they resolve
through the SAME Hadoop FileSystem API code path a remote store would
(the convention the lake ops already use), while staying testable
offline.

Covers: build → serve → append → stream → compact → replay-across-
compaction → reset; the CAS lease (contention, crash-marker diagnosis,
force-unlock); and the forced-CAS full lifecycle
(SPARK_GRAFT_FORCE_CAS_LOCK) that drives the object-store lease
end-to-end through the real mutators.

Round 8: the lifecycle tests are parametrized over ``file://`` AND
``mock://`` — a RawLocal-backed FS registered under a NON-file scheme
(tools/mock_fs, wired in conftest) — so ``local_form()`` returns None
and the CAS lease + FS-API staging run on the TRUE remote dispatch
path, not only via forced-CAS file: URIs (VERDICT r7 #1). Plus the
crashed-copy+delete-rename heal matrix (VERDICT r7 #2): mid-copy,
post-copy-pre-delete and mid-delete states all re-converge.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_spark.fsio import (
    fs_cas_write_lock,
    fs_create_exclusive,
    fs_exists,
    fs_force_unlock,
    fs_read_text,
    local_form,
)
from real_time_trip_processing_spark.functions.ivf_index import (
    ivf_index_append,
    ivf_index_build,
    ivf_index_compact_stream,
    ivf_index_ensure,
    ivf_index_is_fresh,
    ivf_index_reset_stream,
    ivf_persisted_topk,
    ivfpq_index_build,
    ivfpq_persisted_topk,
    read_index_cells,
    streaming_index_append,
)
from real_time_trip_processing_spark.functions.similarity import ivf_topk
from real_time_trip_processing_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def _uri(p) -> str:
    return "file://" + str(p)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(params=["file", "mock"])
def mk_uri(request, spark):
    """URI factory parametrized over the local-scheme proxy (file://,
    resolved by local_form, flock-locked) and the genuinely-remote
    dispatch (mock://, local_form -> None, CAS-leased, FS-API staging
    end-to-end)."""
    if request.param == "mock" and not getattr(spark, "_mock_fs_ready", False):
        pytest.skip("mock:// filesystem unavailable")
    scheme = request.param
    return lambda p: f"{scheme}://" + str(p)


def test_local_form_resolves_spellings():
    assert local_form("/data/idx") == "/data/idx"
    assert local_form("file:///data/idx") == "/data/idx"
    assert local_form("file:/data/idx") == "/data/idx"
    assert local_form("s3a://bucket/idx") is None
    assert local_form("hdfs://nn/idx") is None
    # the alias scheme must dispatch REMOTE — that's its whole point
    assert local_form("mock:///data/idx") is None


def test_build_and_serve_on_uri(spark, tmp_path, mk_uri):
    """Full build + bit-identical serve with the index dir addressed
    ONLY by URI; staging artifacts land under the decoded local dir
    (proof the FS API resolved the scheme instead of mangling it)."""
    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = mk_uri(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    assert (tmp_path / "idx" / "cells").is_dir()
    assert not os.path.exists("file:")   # no mangled local ./file: dir
    assert not os.path.exists("mock:")   # ... nor ./mock:
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4)
    assert _rows(got) == _rows(want)
    assert ivf_index_is_fresh(spark, emb, idx, 16)
    # ensure() must content-address through the URI too (no rebuild)
    mtime = os.path.getmtime(tmp_path / "idx" / "manifest_ivf")
    ivf_index_ensure(emb, idx, n_centroids=16)
    assert os.path.getmtime(tmp_path / "idx" / "manifest_ivf") == mtime


def test_append_equals_rebuild_on_uri(spark, tmp_path, mk_uri):
    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    queries = emb.filter(F.col("vec_id") < 5)
    idx = mk_uri(tmp_path / "grown")
    ivf_index_build(base, idx, n_centroids=16)
    ivf_index_append(delta, idx)
    assert ivf_index_is_fresh(spark, emb, idx, 16)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    ref = str(tmp_path / "rebuilt")
    from real_time_trip_processing_spark.functions.ivf_index import (
        _load_centroids,
    )

    ivf_index_build(emb, ref, n_centroids=16,
                    codebook=_load_centroids(spark, idx))
    want = ivf_persisted_topk(spark, ref, queries, k=3, nprobe=4)
    assert _rows(got) == _rows(want)


def test_stream_compact_replay_reset_on_uri(spark, tmp_path, mk_uri):
    """The round-6 crash/replay machinery — ledger, high-water,
    folding rename, .appended marker — exercised end-to-end through
    the FS API: stream two batches, compact, replay an old batch
    (must short-circuit on the high-water), then reset for a fresh
    stream (batch 0 applies again)."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    d0 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    d1 = emb.filter(F.col("vec_id") >= 400)
    idx = mk_uri(tmp_path / "stream")
    local = tmp_path / "stream"
    ivf_index_build(base, idx, n_centroids=16)

    sink = streaming_index_append(idx)
    sink(d0, 0)
    sink(d1, 1)
    assert (local / "cells_stream").is_dir()
    assert (local / "applied_batches").is_dir()
    n_all = emb.count()
    assert read_index_cells(spark, idx).count() == n_all

    manifest = ivf_index_compact_stream(spark, idx)
    assert manifest is not None and int(manifest["n_rows"]) == n_all
    assert not (local / "cells_stream").exists()
    assert not (local / "applied_batches").exists()
    assert _read_high_water(idx, spark) == 1
    assert (local / "compacted_through").is_file()  # not a mangled path

    # replay across the compaction: batch 1 re-fires after the ledger
    # is gone — the high-water must short-circuit it (no staging dir
    # reappears, row count unchanged)
    sink(d1, 1)
    assert not (local / "cells_stream").exists()
    assert read_index_cells(spark, idx).count() == n_all

    # the index stays query-correct after the fold
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4)
    assert _rows(got) == _rows(want)

    # fresh-stream reset through the URI: high-water cleared, batch 0
    # applies again
    ivf_index_reset_stream(idx, spark)
    assert _read_high_water(idx, spark) == -1
    sink(d0, 0)
    assert (local / "cells_stream").is_dir()


def test_pq_build_and_serve_on_uri(spark, tmp_path, mk_uri):
    from real_time_trip_processing_spark.functions.pq import pq_train

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    books = pq_train(emb, m=8, k=16, iters=1)
    idx = mk_uri(tmp_path / "pq")
    ivfpq_index_build(emb, idx, books, n_centroids=8)
    got = ivfpq_persisted_topk(spark, idx, queries, k=3, nprobe=3)
    assert got.count() > 0
    assert (tmp_path / "pq" / "cells_pq").is_dir()


def test_cas_lease_excludes_and_diagnoses(spark, tmp_path, mk_uri):
    """The object-store lease: create-exclusive acquisition, busy
    contenders time out with the holder's identity, a crashed holder's
    marker is cleared by fs_force_unlock (and ONLY explicitly)."""
    d = mk_uri(tmp_path / "lease")
    acquired = threading.Event()
    release = threading.Event()

    def holder():
        with fs_cas_write_lock(spark, d, timeout_sec=30):
            acquired.set()
            release.wait(30)

    t = threading.Thread(target=holder)
    t.start()
    assert acquired.wait(30)
    with pytest.raises(TimeoutError, match="fs_force_unlock"):
        with fs_cas_write_lock(spark, d, timeout_sec=0.6):
            pass
    release.set()
    t.join(30)
    # holder released: marker gone, next acquire immediate
    assert not fs_exists(spark, d.rstrip("/") + "/.write_lock.cas")
    with fs_cas_write_lock(spark, d, timeout_sec=5):
        pass

    # crash residue: a marker nobody holds blocks acquisition (no
    # staleness auto-break) until the operator clears it
    assert fs_create_exclusive(spark, d + "/.write_lock.cas", "dead pid=0")
    with pytest.raises(TimeoutError):
        with fs_cas_write_lock(spark, d, timeout_sec=0.6):
            pass
    assert "dead" in fs_read_text(spark, d + "/.write_lock.cas")
    assert fs_force_unlock(spark, d)
    with fs_cas_write_lock(spark, d, timeout_sec=5):
        pass


def test_forced_cas_full_lifecycle(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_FORCE_CAS_LOCK drives the REAL mutators through the
    CAS lease (instead of the flock fast path a local dir would get):
    build + stream + compact + serve all under create-exclusive
    leasing, and the lease marker never survives a mutator."""
    monkeypatch.setenv("SPARK_GRAFT_FORCE_CAS_LOCK", "1")
    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    idx = _uri(tmp_path / "cas_idx")
    local = tmp_path / "cas_idx"
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(delta, 0)
    manifest = ivf_index_compact_stream(spark, idx)
    assert int(manifest["n_rows"]) == emb.count()
    assert not (local / ".write_lock.cas").exists()
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4)
    assert _rows(got) == _rows(want)


def test_lake_lock_takes_cas_lease(spark, tmp_path, monkeypatch):
    """With a session, a remote lake root takes the real CAS lease —
    proven by forcing the remote branch (local_form -> None) against a
    file:// root so the lease runs on the offline-testable
    LocalFileSystem: a concurrent lease times out while held, the
    marker is gone afterwards, and NO warning fires."""
    import warnings

    from real_time_trip_processing_spark import fsio
    from real_time_trip_processing_spark.operators import maintenance

    monkeypatch.setattr(fsio, "local_form", lambda p: None)
    root = _uri(tmp_path / "lake")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with maintenance._lake_write_lock(root, spark):
            assert fs_exists(spark, root + "/.write_lock.cas")
            with pytest.raises(TimeoutError):
                with fs_cas_write_lock(spark, root, timeout_sec=0.6):
                    pass
    assert not w
    assert not fs_exists(spark, root + "/.write_lock.cas")


def test_fsio_primitives_edge_cases(spark, tmp_path, mk_uri):
    """fsio building blocks: read-absent returns None, overwrite
    replaces, create-exclusive refuses an existing path, rename onto
    an existing destination raises (Hadoop reports it as a False
    return — silent-False here would be quiet corruption), delete of
    an absent path reports False."""
    from real_time_trip_processing_spark.fsio import (
        fs_delete,
        fs_rename,
        fs_write_text,
    )

    d = mk_uri(tmp_path / "prims")
    f = d + "/x.txt"
    assert fs_read_text(spark, f) is None
    fs_write_text(spark, f, "one")
    assert fs_read_text(spark, f) == "one"
    fs_write_text(spark, f, "two")  # overwrite=True default
    assert fs_read_text(spark, f) == "two"
    assert not fs_create_exclusive(spark, f, "three")  # exists -> False
    assert fs_read_text(spark, f) == "two"  # and unchanged
    fs_write_text(spark, d + "/y.txt", "y")
    with pytest.raises(OSError, match="rename failed"):
        fs_rename(spark, d + "/y.txt", f)  # dst exists
    fs_rename(spark, d + "/y.txt", d + "/z.txt")
    assert fs_read_text(spark, d + "/z.txt") == "y"
    assert fs_delete(spark, d + "/z.txt", recursive=False)
    assert not fs_delete(spark, d + "/z.txt", recursive=False)  # absent


def test_lake_lock_natural_remote_dispatch(spark, tmp_path, mock_fs):
    """The lake mutators' CAS branch on the TRUE dispatch path: a
    mock:// root makes local_form() return None with NO monkeypatching
    (the round-7 variant had to force the branch), so qualified-path
    handling and scheme dispatch are genuinely exercised."""
    from real_time_trip_processing_spark.operators import maintenance

    root = mock_fs(tmp_path / "lake")
    with maintenance._lake_write_lock(root, spark):
        assert fs_exists(spark, root + "/.write_lock.cas")
        with pytest.raises(TimeoutError):
            with fs_cas_write_lock(spark, root, timeout_sec=0.6):
                pass
    assert not fs_exists(spark, root + "/.write_lock.cas")


def test_index_lock_cas_on_mock_uri(spark, tmp_path, mock_fs):
    """_index_lock's scheme dispatch, un-forced: a mock:// index dir
    takes the CAS lease (marker visible while held), not the flock."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _index_lock,
    )

    idx = mock_fs(tmp_path / "dispatch")
    with _index_lock(idx, spark):
        assert fs_exists(spark, idx + "/.write_lock.cas")
    assert not fs_exists(spark, idx + "/.write_lock.cas")


def _crashed_rename_state(local_stream: str, mode: str) -> None:
    """Materialize the on-disk residue of a crash inside a per-object
    copy+delete rename of ``cells_stream`` -> ``cells_stream.folding``
    (what S3A's rename is). Copies preserve relative layout; per-object
    PUTs are atomic so every file present is whole."""
    import shutil as sh

    folding = local_stream + ".folding"
    files = sorted(
        os.path.join(dp, fn)
        for dp, _, fns in os.walk(local_stream)
        for fn in fns
    )
    assert len(files) >= 2, "need >= 2 staged files for a partial state"
    if mode == "mid_copy":          # some objects copied; src intact
        to_copy = files[: len(files) // 2]
        src_keep = files
    elif mode == "post_copy":       # all copied; no deletes yet
        to_copy = files
        src_keep = files
    elif mode == "mid_delete":      # all copied; some src keys deleted
        to_copy = files
        src_keep = files[len(files) // 2:]
    elif mode == "delete_done":     # all copied; every src key deleted,
        to_copy = files             # only the empty src dir remains
        src_keep = []               # (dir markers outlive their keys
        # on real object stores; RawLocal keeps empty dirs the same way)
    else:
        raise AssertionError(mode)
    for f in to_copy:
        dst = os.path.join(folding, os.path.relpath(f, local_stream))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        sh.copy2(f, dst)
    for f in files:
        if f not in src_keep:
            os.unlink(f)


@pytest.mark.parametrize(
    "mode", ["mid_copy", "post_copy", "mid_delete", "delete_done"]
)
def test_compact_heals_crashed_copy_delete_rename(
    spark, tmp_path, mk_uri, mode
):
    """VERDICT r7 #2: the fold re-converges from a crash INSIDE the
    step-1 rename on a copy+delete store. States: mid-copy (dst
    partial, src full — source authoritative), post-copy-pre-delete
    (both full — identical content), mid-delete (src partial, dst full
    — destination authoritative), delete-done (only the empty src dir
    marker remains — destination authoritative). After the heal,
    compaction completes with the exact manifest a crash-free run
    produces and the index serves bit-identically."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    idx = mk_uri(tmp_path / "heal")
    local = str(tmp_path / "heal")
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(delta, 0)

    _crashed_rename_state(os.path.join(local, "cells_stream"), mode)
    assert os.path.isdir(os.path.join(local, "cells_stream"))
    assert os.path.isdir(os.path.join(local, "cells_stream.folding"))

    manifest = ivf_index_compact_stream(spark, idx)
    assert manifest is not None and int(manifest["n_rows"]) == emb.count()
    assert not os.path.exists(os.path.join(local, "cells_stream"))
    assert not os.path.exists(os.path.join(local, "cells_stream.folding"))
    assert _read_high_water(idx, spark) == 0
    assert ivf_index_is_fresh(spark, emb, idx, 16)

    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4)
    assert _rows(got) == _rows(want)


def test_fs_count_files_recursive(spark, tmp_path):
    from real_time_trip_processing_spark.fsio import (
        fs_count_files,
        fs_write_text,
    )

    d = _uri(tmp_path / "cnt")
    assert fs_count_files(spark, d) == 0  # absent
    fs_write_text(spark, d + "/a.txt", "a")
    fs_write_text(spark, d + "/sub/b.txt", "b")
    fs_write_text(spark, d + "/sub/deep/c.txt", "c")
    assert fs_count_files(spark, d) == 3


def test_index_lock_mixed_spellings_exclude(spark, tmp_path):
    """A file:///x mutator and a /x mutator must take the SAME lock
    (the decoded local path) — two spellings of one directory can
    never run concurrently under different mechanisms."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _index_lock,
    )
    from real_time_trip_processing_spark.locking import dir_write_lock

    p = str(tmp_path / "mixed")
    with _index_lock("file://" + p, spark):
        with pytest.raises(TimeoutError):
            with dir_write_lock(p, timeout_sec=0.4):
                pass
    # released: plain-path lock acquires immediately
    with dir_write_lock(p, timeout_sec=5):
        pass
