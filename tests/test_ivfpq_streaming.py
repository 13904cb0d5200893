"""Streaming lifecycle of the persisted IVF-PQ layout
(`streaming_pq_index_append` / `ivfpq_index_compact_stream` /
`ivfpq_index_reset_stream` / `read_index_cells_pq`) — the
compressed-cells twin of the IVF stream suite, riding the SAME
parameterized sink/fold/heal machinery (one code path, two layouts).

Pinned here:
- streamed codes are servable before any fold, and serve results are
  BIT-identical to a full rebuild over the union corpus with the same
  codebook and books (codes encoded against STORED books — old and new
  codes share their decoder);
- exactly-once: a replayed batch is a no-op (ledger hit), a batch
  replayed ACROSS the fold short-circuits on the PQ layout's own
  high-water;
- the fold is invisible to results, visible to file counts, and the
  two layouts' stream lifecycles are disjoint (an IVF stream on the
  same dir neither blocks nor is folded by the PQ fold);
- reset clears staging/ledger/high-water so a fresh stream attaches;
- a PQ delete refuses under live PQ staging (incomplete erasure) but
  proceeds alongside an IVF stream (scoped per layout).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_spark.functions.ivf_index import (
    _read_high_water,
    ivfpq_index_build,
    ivfpq_index_compact_stream,
    ivfpq_index_reset_stream,
    ivfpq_persisted_topk,
    ivfpq_index_delete,
    read_index_cells_pq,
    streaming_index_append,
    streaming_pq_index_append,
)
from real_time_trip_processing_spark.functions.pq import pq_train
from real_time_trip_processing_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _pq_files(idx):
    return sum(
        1 for _ in glob.iglob(
            os.path.join(idx, "cells_pq*", "**", "*.parquet"),
            recursive=True,
        )
    )


@pytest.fixture()
def built(spark, tmp_path):
    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    b0 = emb.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") % 2 == 0))
    b1 = emb.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") % 2 == 1))
    idx = str(tmp_path / "idx")
    books = pq_train(base, m=8, k=16, dim=64)
    ivfpq_index_build(base, idx, books, n_centroids=16, dim=64)
    return emb, base, b0, b1, idx, books


def _serve(spark, idx, queries):
    return _rows(ivfpq_persisted_topk(spark, idx, queries, k=3, nprobe=4))


def test_streamed_codes_serve_and_match_rebuild(spark, tmp_path, built):
    """Stream two batches; serving must see them pre-fold and equal a
    rebuild over the union with the SAME codebook and books."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _load_centroids,
    )

    emb, base, b0, b1, idx, books = built
    stored_cb = _load_centroids(spark, idx, "pq")
    sink = streaming_pq_index_append(idx)
    sink(b0, 0)
    sink(b1, 1)
    assert read_index_cells_pq(spark, idx).count() == emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    got = _serve(spark, idx, queries)
    idx2 = str(tmp_path / "idx2")
    ivfpq_index_build(
        emb, idx2, books, n_centroids=16, dim=64, codebook=stored_cb
    )
    assert got == _serve(spark, idx2, queries)


def test_replay_is_noop_and_fold_invisible(spark, built):
    """Ledger-hit replay adds nothing; the fold drops files, changes no
    results, advances the PQ manifest, and a batch replayed across the
    fold short-circuits on the PQ high-water."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_manifest,
    )

    emb, base, b0, b1, idx, books = built
    sink = streaming_pq_index_append(idx)
    sink(b0, 0)
    sink(b1, 1)
    n_total = read_index_cells_pq(spark, idx).count()
    sink(b1, 1)  # ledger-hit replay
    assert read_index_cells_pq(spark, idx).count() == n_total
    queries = emb.filter(F.col("vec_id") < 5)
    pre = _serve(spark, idx, queries)
    files_before = _pq_files(idx)
    m = ivfpq_index_compact_stream(spark, idx)
    assert m is not None and int(m["n_rows"]) == n_total
    assert _pq_files(idx) < files_before
    assert not os.path.exists(os.path.join(idx, "cells_pq_stream"))
    assert not os.path.exists(os.path.join(idx, "applied_batches_pq"))
    assert _serve(spark, idx, queries) == pre
    stored = _read_manifest(spark, idx, "pq")
    assert int(stored["n_rows"]) == n_total
    # replay across the fold: PQ high-water short-circuits
    assert _read_high_water(idx, name="compacted_through_pq") == 1
    sink(b1, 1)
    assert read_index_cells_pq(spark, idx).count() == n_total
    assert ivfpq_index_compact_stream(spark, idx) is None  # nothing staged


def test_layout_stream_lifecycles_are_disjoint(spark, built):
    """An IVF stream staged on the SAME dir is neither folded nor
    blocked by the PQ fold, and vice versa — the layouts' ledgers and
    high-waters never vouch for each other."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_build,
        ivf_index_compact_stream,
        read_index_cells,
    )

    emb, base, b0, b1, idx, books = built
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(b0, 0)       # IVF stream, batch 0
    streaming_pq_index_append(idx)(b1, 5)    # PQ stream, batch 5
    m_pq = ivfpq_index_compact_stream(spark, idx)
    assert m_pq is not None
    # the IVF staging is untouched by the PQ fold
    assert os.path.exists(os.path.join(idx, "cells_stream"))
    assert os.path.exists(os.path.join(idx, "applied_batches"))
    assert _read_high_water(idx, name="compacted_through_pq") == 5
    assert _read_high_water(idx) == -1  # IVF high-water untouched
    m_ivf = ivf_index_compact_stream(spark, idx)
    assert m_ivf is not None
    assert read_index_cells(spark, idx).count() == base.count() + b0.count()
    assert read_index_cells_pq(spark, idx).count() == (
        base.count() + b1.count()
    )


def test_reset_clears_pq_stream_lifecycle(spark, built):
    emb, base, b0, b1, idx, books = built
    sink = streaming_pq_index_append(idx)
    sink(b0, 0)
    ivfpq_index_compact_stream(spark, idx)
    assert _read_high_water(idx, name="compacted_through_pq") == 0
    ivfpq_index_reset_stream(idx, spark)
    assert _read_high_water(idx, name="compacted_through_pq") == -1
    # a FRESH stream's batch 0 now applies instead of short-circuiting
    sink(b1, 0)
    assert read_index_cells_pq(spark, idx).count() == (
        base.count() + b0.count() + b1.count()
    )


def test_pq_rebuild_resets_pq_stream_lifecycle(spark, built):
    """A PQ rebuild folds streamed vectors via its full corpus scan and
    must clear the PQ staging/ledger/high-water (double-serve and
    poisoned-fresh-stream prevention, as in the IVF build)."""
    emb, base, b0, b1, idx, books = built
    sink = streaming_pq_index_append(idx)
    sink(b0, 0)
    ivfpq_index_compact_stream(spark, idx)
    sink(b1, 1)  # staged but not folded
    union = base.unionByName(b0).unionByName(b1)
    ivfpq_index_build(union, idx, books, n_centroids=16, dim=64)
    for debris in (
        "cells_pq_stream", "applied_batches_pq", "compacted_through_pq"
    ):
        assert not os.path.exists(os.path.join(idx, debris)), debris
    assert read_index_cells_pq(spark, idx).count() == union.count()


def test_pq_delete_refuses_under_pq_staging_only(spark, built):
    """A PQ delete under live PQ staging is the incomplete-erasure
    hazard (staged codes are not scanned) — refuse; after the fold it
    proceeds. The IVF staging does not block it (scoped per layout,
    pinned the other way in test_index_delete)."""
    emb, base, b0, b1, idx, books = built
    sink = streaming_pq_index_append(idx)
    sink(b0, 0)
    with pytest.raises(RuntimeError, match="incomplete erasure"):
        ivfpq_index_delete(spark, idx, [6, 12])  # ids living in b0
    ivfpq_index_compact_stream(spark, idx)
    res = ivfpq_index_delete(spark, idx, [6, 12])
    assert res["n_deleted"] == 2
    served = {
        int(r["cand_id"])
        for r in read_index_cells_pq(spark, idx)
        .select("cand_id").collect()
    }
    assert not served & {6, 12}


def test_pq_empty_batch_skipped(spark, built):
    emb, base, b0, b1, idx, books = built
    streaming_pq_index_append(idx)(emb.filter(F.col("vec_id") < 0), 0)
    assert not os.path.exists(os.path.join(idx, "cells_pq_stream"))
    assert not os.path.exists(os.path.join(idx, "applied_batches_pq"))
    assert ivfpq_index_compact_stream(spark, idx) is None


def test_pq_fold_heals_crashed_rename(spark, built, monkeypatch):
    """The compact fold's crashed-rename heal through the PQ layout's
    cfg paths: crash the staging->folding rename mid-'copy' (both dirs
    present, source holding >= files), rerun, and require exact
    convergence — pins that the parameterized heal operates on
    cells_pq_stream[.folding], not the IVF names."""
    import real_time_trip_processing_spark.functions.ivf_index as M

    emb, base, b0, b1, idx, books = built
    sink = streaming_pq_index_append(idx)
    sink(b0, 0)
    stream_dir = os.path.join(idx, "cells_pq_stream")
    folding = stream_dir + ".folding"
    # simulate a crashed copy+delete rename: copy PART of the staging
    # into the folding dir, keep the source complete (copy phase
    # mid-flight — source authoritative)
    import shutil as _sh

    os.makedirs(folding)
    batches = sorted(os.listdir(stream_dir))
    _sh.copytree(
        os.path.join(stream_dir, batches[0]),
        os.path.join(folding, batches[0]),
    )
    m = ivfpq_index_compact_stream(spark, idx)
    assert m is not None
    assert read_index_cells_pq(spark, idx).count() == (
        base.count() + b0.count()
    )
    assert not os.path.exists(stream_dir)
    assert not os.path.exists(folding)
    queries = emb.filter(F.col("vec_id") < 5)
    got = _serve(spark, idx, queries)
    # arbiter: rebuild over the union with same codebook+books
    from real_time_trip_processing_spark.functions.ivf_index import (
        _load_centroids,
    )

    idx2 = idx + "2"
    ivfpq_index_build(
        base.unionByName(b0), idx2, books, n_centroids=16, dim=64,
        codebook=_load_centroids(spark, idx, "pq"),
    )
    assert got == _serve(spark, idx2, queries)


def test_pq_stream_lifecycle_on_mock_uri(spark, tmp_path):
    """The PQ stream lifecycle addressed by a genuinely-remote scheme:
    sink -> serve-with-staging -> fold -> serve, all staging ops through
    the FS API + CAS lease on the PQ layout's cfg paths."""
    if not getattr(spark, "_mock_fs_ready", False):
        pytest.skip("mock:// filesystem unavailable")
    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    b0 = emb.filter(F.col("vec_id") >= 400)
    idx = "mock://" + str(tmp_path / "idx")
    books = pq_train(base, m=8, k=16, dim=64)
    ivfpq_index_build(base, idx, books, n_centroids=16, dim=64)
    streaming_pq_index_append(idx)(b0, 0)
    assert read_index_cells_pq(spark, idx).count() == emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    pre = _serve(spark, idx, queries)
    m = ivfpq_index_compact_stream(spark, idx)
    assert m is not None and int(m["n_rows"]) == emb.count()
    assert _serve(spark, idx, queries) == pre
    local = str(tmp_path / "idx")
    assert not os.path.exists(os.path.join(local, "cells_pq_stream"))
    assert not os.path.exists(os.path.join(local, "applied_batches_pq"))
    assert _read_high_water(idx, spark, "compacted_through_pq") == 0
