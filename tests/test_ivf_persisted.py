"""Persisted IVF index (functions/ivf_index.py): build/serve parity
with the in-query path, parquet partition pruning of unprobed cells,
and content-addressed staleness."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_trip_processing_spark.functions.ivf_index import (
    ivf_index_build,
    ivf_index_ensure,
    ivf_index_is_fresh,
    ivf_persisted_topk,
)
from real_time_trip_processing_spark.functions.similarity import ivf_topk
from real_time_trip_processing_spark.sources import table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_persisted_serve_bit_identical_to_in_query(spark, tmp_path):
    """Same corpus, same params: the persisted serve path must equal
    ivf_topk row-for-row (scores included) — it is the identical math
    over stored integers instead of re-derived ones."""
    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4)
    assert _rows(got) == _rows(want)


def test_persisted_serve_prunes_unprobed_cells(spark, tmp_path):
    """The serve scan must read ONLY probed cent_id partitions: the
    parquet source's partition count equals the probed-cell count, not
    n_centroids — the nprobe/n_centroids scan-bytes claim, in the plan."""
    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2)
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    n_cells = len([
        d for d in os.listdir(os.path.join(idx, "cells"))
        if d.startswith("cent_id=")
    ])
    assert n_cells > 4  # corpus actually spreads over cells
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=2)
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    scans = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert any("cent_id" in ln for ln in scans), plan
    # 2 queries x nprobe=2 -> at most 4 distinct probed cells
    import re

    m = re.search(r"partition count: (\d+)", plan)
    if m:  # Spark prints it in the scan detail
        assert int(m.group(1)) <= 4, plan


def test_manifest_staleness_forces_rebuild(spark, tmp_path):
    """ensure() skips the build when the manifest matches the corpus and
    rebuilds when the corpus drifts (content-addressed, not mtime)."""
    emb = table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "idx")
    ivf_index_ensure(emb, idx, n_centroids=16)
    assert ivf_index_is_fresh(spark, emb, idx, 16)
    shrunk = emb.filter(F.col("vec_id") % 2 == 0)
    assert not ivf_index_is_fresh(spark, shrunk, idx, 16)
    # param drift also invalidates
    assert not ivf_index_is_fresh(spark, emb, idx, 32)
    ivf_index_ensure(shrunk, idx, n_centroids=16)
    assert ivf_index_is_fresh(spark, shrunk, idx, 16)
    got = ivf_persisted_topk(
        spark, idx, shrunk.filter(F.col("vec_id") < 5), k=3, nprobe=4
    )
    want = ivf_topk(
        shrunk, shrunk.filter(F.col("vec_id") < 5), k=3,
        n_centroids=16, nprobe=4,
    )
    assert _rows(got) == _rows(want)


def test_ivfpq_persisted_matches_in_query(spark, tmp_path):
    """With the SAME trained books, the persisted IVF-PQ serve path must
    equal ivfpq_topk row-for-row: stored codes + stored books = the
    in-query kernel's codes + LUTs (float-fixpoint training is held
    fixed by passing one books object to both)."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivfpq_index_build,
        ivfpq_persisted_topk,
    )
    from real_time_trip_processing_spark.functions.pq import (
        ivfpq_topk,
        pq_train,
    )

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    books = pq_train(emb, m=8, k=16, iters=1)
    idx = str(tmp_path / "pq_idx")
    ivfpq_index_build(emb, idx, books, n_centroids=8)
    got = ivfpq_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivfpq_topk(emb, queries, books, k=3, n_centroids=8, nprobe=4)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 15


def test_ivf_index_append_equals_full_rebuild(spark, tmp_path):
    """Grow-by-append: build on the first half of the corpus, append the
    second half; serving must equal both (a) a from-scratch build over
    the union with the same centroids and (b) the in-query ivf_topk —
    and the advanced manifest must mark the grown index fresh (no
    rebuild on the next ensure)."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_append,
        ivf_index_is_fresh,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)     # holds centroid ids 0..15
    delta = emb.filter(F.col("vec_id") >= 60)
    queries = emb.filter(F.col("vec_id") < 5)
    cb = [(int(r[0]), list(r[1])) for r in base.filter(F.col("vec_id") < 16)
          .select("vec_id", F.col("embedding").cast("array<double>")).collect()]

    idx = str(tmp_path / "grow")
    ivf_index_build(base, idx, n_centroids=16, codebook=cb)
    assert not ivf_index_is_fresh(spark, emb, idx, 16)
    ivf_index_append(delta, idx)
    assert ivf_index_is_fresh(spark, emb, idx, 16)

    full_idx = str(tmp_path / "full")
    ivf_index_build(emb, full_idx, n_centroids=16, codebook=cb)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_persisted_topk(spark, full_idx, queries, k=3, nprobe=4)
    inq = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4, codebook=cb)
    assert _rows(got) == _rows(want) == _rows(inq)


def test_ann_join_persisted_matches_in_query(spark, tmp_path):
    """Full-table ANN join served from the persisted cells must equal
    ann_join_ivf with the same (stored) codebook — stored (qv, qn2)
    integers are the same ints the in-query kernel derives."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ann_join_persisted,
    )
    from real_time_trip_processing_spark.functions.similarity import (
        ann_join_ivf,
    )

    emb = table(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") % 2 == 1)
    cb = [(int(r[0]), list(r[1]))
          for r in corpus.filter(F.col("vec_id") < 32)
          .select("vec_id", F.col("embedding").cast("array<double>")).collect()]
    idx = str(tmp_path / "ajidx")
    ivf_index_build(corpus, idx, n_centroids=16, codebook=cb)
    got = ann_join_persisted(spark, idx, queries, k=3, nprobe=4)
    want = ann_join_ivf(corpus, queries, k=3, nprobe=4, codebook=cb)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_ann_join_ivfpq_persisted_bit_identical_to_topk(spark, tmp_path):
    """The full-table ADC join must be BIT-identical to the bounded
    ivfpq_persisted_topk on the same (queries, k, nprobe): the cogroup
    kernel replays _adc_score's float64 math (same _query_lut np.dot
    LUTs, ascending-j left-assoc accumulation, dot/(qn*sqrt(nrm))), so
    the two serve paths may never diverge — not within tolerance,
    exactly."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ann_join_ivfpq_persisted, ivfpq_index_build, ivfpq_persisted_topk,
    )
    from real_time_trip_processing_spark.functions.pq import pq_train

    emb = table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, m=32, k=16, iters=2)
    idx = str(tmp_path / "ajpq")
    ivfpq_index_build(emb, idx, books, n_centroids=8)
    queries = emb.filter(F.col("vec_id") < 20)
    got = ann_join_ivfpq_persisted(spark, idx, queries, k=3, nprobe=4)
    want = ivfpq_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 60  # 20 queries x k=3, every query full


def test_ivfpq_index_append_equals_full_rebuild(spark, tmp_path):
    """IVF-PQ grow-by-append: the delta is encoded with the STORED
    books, so build(half) + append(half) serves identically to a
    from-scratch build over the union with the same books."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_persisted_topk,
    )
    from real_time_trip_processing_spark.functions.pq import pq_train

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    delta = emb.filter(F.col("vec_id") >= 60)
    queries = emb.filter(F.col("vec_id") < 5)
    books = pq_train(base, m=8, k=16, iters=1)

    idx = str(tmp_path / "pq_grow")
    ivfpq_index_build(base, idx, books, n_centroids=8)
    ivfpq_index_append(delta, idx)
    full_idx = str(tmp_path / "pq_full")
    cb = [(int(r[0]), list(r[1])) for r in base.filter(F.col("vec_id") < 8)
          .select("vec_id", F.col("embedding").cast("array<double>")).collect()]
    ivfpq_index_build(emb, full_idx, books, n_centroids=8, codebook=cb)
    got = ivfpq_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivfpq_persisted_topk(spark, full_idx, queries, k=3, nprobe=4)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 15


def test_layout_manifests_are_independent(spark, tmp_path):
    """The review scenario, pinned: with BOTH layouts in one dir, an
    IVF rebuild after corpus drift must NOT vouch for the stale PQ
    cells — each layout tracks its own manifest. Also: an IVF-PQ-only
    dir never satisfies the plain-IVF ensure."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivfpq_index_build,
        ivfpq_index_ensure,
    )
    from real_time_trip_processing_spark.functions.pq import pq_train

    emb = table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, m=8, k=16, iters=1)

    # IVF-PQ-only dir: plain-IVF freshness must be False
    pq_only = str(tmp_path / "pq_only")
    ivfpq_index_build(emb, pq_only, books, n_centroids=8)
    assert not ivf_index_is_fresh(spark, emb, pq_only, 8)

    # both layouts; corpus drifts; rebuild ONLY the IVF layout
    both = str(tmp_path / "both")
    drifted = emb.filter(F.col("vec_id") % 3 != 0)
    ivf_index_build(drifted, both, n_centroids=8)
    ivfpq_index_build(drifted, both, books, n_centroids=8)
    ivf_index_build(emb, both, n_centroids=8)  # fresh IVF over full corpus
    assert ivf_index_is_fresh(spark, emb, both, 8)
    # ...but the PQ layout must still read stale and re-train on ensure
    calls = []

    def factory():
        calls.append(1)
        return books

    ivfpq_index_ensure(emb, both, books_factory=factory, n_centroids=8)
    assert calls, "stale PQ layout was served off the fresh IVF manifest"


def test_streaming_index_append_exactly_once_and_served(spark, tmp_path):
    """Stream new vectors into a persisted index: a real availableNow
    file stream appends micro-batches through the foreachBatch sink;
    serving then equals the in-query ivf_topk over the UNION corpus
    (with the stored codebook), and a manually replayed batch_id is a
    no-op — no duplicate rows, same top-k."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    delta = emb.filter(F.col("vec_id") >= 60)
    queries = emb.filter(F.col("vec_id") < 5)
    cb = [(int(r[0]), list(r[1])) for r in base.filter(F.col("vec_id") < 16)
          .select("vec_id", F.col("embedding").cast("array<double>")).collect()]

    idx = str(tmp_path / "sidx")
    ivf_index_build(base, idx, n_centroids=16, codebook=cb)
    n_base = read_index_cells(spark, idx).count()

    feed = str(tmp_path / "feed")
    delta.repartition(2).write.parquet(feed)
    stream = spark.readStream.schema(
        spark.read.parquet(feed).schema
    ).option("maxFilesPerTrigger", 1).parquet(feed)
    q = (
        stream.writeStream.foreachBatch(streaming_index_append(idx))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    n_delta = delta.count()
    assert read_index_cells(spark, idx).count() == n_base + n_delta

    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4, codebook=cb)
    assert _rows(got) == _rows(want)

    # manual replay of an applied batch: ledger short-circuits, counts
    # and results unchanged
    streaming_index_append(idx)(delta.limit(7), 0)
    assert read_index_cells(spark, idx).count() == n_base + n_delta
    again = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    assert _rows(again) == _rows(want)


def test_rebuild_after_stream_clears_staging(spark, tmp_path):
    """Review scenario, pinned: after streaming appends, a full
    content-addressed REBUILD over the grown corpus re-derives every
    vector into the new base cells — the stream staging and its ledger
    must be cleared, or (a) every streamed vector is served twice
    (new base + stale staging) and (b) a fresh stream's batches 0..N
    silently skip as 'already applied'."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    delta = emb.filter(F.col("vec_id") >= 60)
    cb = [(int(r[0]), list(r[1])) for r in base.filter(F.col("vec_id") < 16)
          .select("vec_id", F.col("embedding").cast("array<double>")).collect()]
    idx = str(tmp_path / "idx")
    ivf_index_build(base, idx, n_centroids=16, codebook=cb)
    streaming_index_append(idx)(delta, 0)
    n_total = emb.count()
    assert read_index_cells(spark, idx).count() == n_total

    # rebuild over the grown corpus (stream stopped): no double-serving
    ivf_index_build(emb, idx, n_centroids=16, codebook=cb)
    assert read_index_cells(spark, idx).count() == n_total
    assert not os.path.isdir(os.path.join(idx, "cells_stream"))
    assert not os.path.isdir(os.path.join(idx, "applied_batches"))

    # a FRESH stream reusing batch_id 0 must apply, not skip
    extra = delta.limit(5).withColumn("vec_id", F.col("vec_id") + 100000)
    streaming_index_append(idx)(extra, 0)
    assert read_index_cells(spark, idx).count() == n_total + 5

    # serving after the rebuild equals the in-query path on the union
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(
        emb.unionByName(extra), queries, k=3, n_centroids=16, nprobe=4,
        codebook=cb,
    )
    assert _rows(got) == _rows(want)


def test_per_layout_centroids_do_not_collide(spark, tmp_path):
    """Review scenario, pinned: IVF and IVF-PQ co-located in ONE dir but
    built with DIFFERENT coarse codebooks — each layout must serve from
    its own centroids (per-layout centroid dirs). With a shared
    centroids/ path the second build silently replaced the first
    layout's probe geometry while its manifest still read fresh."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivfpq_index_build,
        ivfpq_persisted_topk,
    )
    from real_time_trip_processing_spark.functions.pq import ivfpq_topk, pq_train

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb_ivf = [(int(r[0]), list(r[1])) for r in emb.filter(F.col("vec_id") < 16)
              .select("vec_id", F.col("embedding").cast("array<double>")).collect()]
    cb_pq = [(int(r[0]) - 20, list(r[1]))
             for r in emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 28))
             .select("vec_id", F.col("embedding").cast("array<double>")).collect()]
    books = pq_train(emb, m=8, k=16, iters=1)

    both = str(tmp_path / "both")
    ivf_index_build(emb, both, n_centroids=16, codebook=cb_ivf)
    ivfpq_index_build(emb, both, books, n_centroids=8, codebook=cb_pq)

    got_ivf = ivf_persisted_topk(spark, both, queries, k=3, nprobe=4)
    want_ivf = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4,
                        codebook=cb_ivf)
    assert _rows(got_ivf) == _rows(want_ivf)

    from real_time_trip_processing_spark.functions.pq import ivfpq_topk

    got_pq = ivfpq_persisted_topk(spark, both, queries, k=3, nprobe=4)
    want_pq = ivfpq_topk(emb, queries, books, k=3, n_centroids=8, nprobe=4,
                         codebook=cb_pq)
    assert _rows(got_pq) == _rows(want_pq)


def test_append_detects_half_applied_delta(spark, tmp_path):
    """Crash-window guard: simulate a failure AFTER the cells append but
    BEFORE the manifest advance (extra cells rows the manifest doesn't
    account for); the next append must refuse loudly instead of
    appending the delta again into permanent, undetectable duplicates."""
    import pytest

    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    delta = emb.filter(F.col("vec_id") >= 60)
    idx = str(tmp_path / "idx")
    ivf_index_build(base, idx, n_centroids=16)

    # crash simulation: the delta's cells land, the manifest does not
    from real_time_trip_processing_spark.functions.ivf_index import (
        _load_centroids,
        _quant_cells_frame,
    )

    rows = _load_centroids(spark, idx)
    _quant_cells_frame(delta, rows, "vec_id", "embedding").write.partitionBy(
        "cent_id"
    ).mode("append").parquet(os.path.join(idx, "cells"))

    with pytest.raises(RuntimeError, match="manifest"):
        ivf_index_append(delta, idx)

    # repair = rebuild; appends work again afterwards
    ivf_index_build(base, idx, n_centroids=16)
    ivf_index_append(delta, idx)
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_is_fresh,
    )

    assert ivf_index_is_fresh(spark, emb, idx, 16)


def test_retrained_codebook_invalidates(spark, tmp_path):
    """Review scenario, pinned: same corpus + same n_centroids + a
    DIFFERENT explicit codebook must read stale (manifest codebook_fp),
    and ensure() must rebuild so probe selection and stored cells agree
    with the caller's new geometry."""
    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    def cb(lo):
        return [(int(r[0]) - lo, list(r[1]))
                for r in emb.filter((F.col("vec_id") >= lo)
                                    & (F.col("vec_id") < lo + 16))
                .select("vec_id", F.col("embedding").cast("array<double>"))
                .collect()]

    cb_a, cb_b = cb(0), cb(30)
    idx = str(tmp_path / "idx")
    ivf_index_ensure(emb, idx, n_centroids=16, codebook=cb_a)
    assert ivf_index_is_fresh(spark, emb, idx, 16, codebook=cb_a)
    assert not ivf_index_is_fresh(spark, emb, idx, 16, codebook=cb_b)
    # codebook-agnostic check still passes (old behavior preserved)
    assert ivf_index_is_fresh(spark, emb, idx, 16)

    ivf_index_ensure(emb, idx, n_centroids=16, codebook=cb_b)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4, codebook=cb_b)
    assert _rows(got) == _rows(want)


def test_concurrent_append_and_stream_serialize(spark, tmp_path):
    """Two writers racing on one index — a batch append and a streaming
    micro-batch — must serialize on the index write lock: the final
    manifest accounts for BOTH deltas and serving equals a from-scratch
    build over the union (no lost update, no duplicate rows)."""
    from concurrent.futures import ThreadPoolExecutor

    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_append,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 40)
    d1 = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 70))
    d2 = emb.filter(F.col("vec_id") >= 70)
    cb = [(int(r[0]), list(r[1])) for r in base.filter(F.col("vec_id") < 16)
          .select("vec_id", F.col("embedding").cast("array<double>")).collect()]
    idx = str(tmp_path / "race")
    ivf_index_build(base, idx, n_centroids=16, codebook=cb)

    with ThreadPoolExecutor(2) as pool:
        f1 = pool.submit(ivf_index_append, d1, idx)
        f2 = pool.submit(streaming_index_append(idx), d2, 0)
        f1.result(timeout=300)
        f2.result(timeout=300)

    n_total = emb.count()
    assert read_index_cells(spark, idx).count() == n_total
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
    want = ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=4, codebook=cb)
    assert _rows(got) == _rows(want)
    assert not os.path.exists(os.path.join(idx, ".write_lock"))


def test_read_index_cells_propagates_stream_read_errors(spark, tmp_path):
    """A corrupt stream staging must FAIL the read, not silently serve
    base-only results (the old blanket except Exception dropped every
    streamed vector on any read error)."""
    import pytest

    from real_time_trip_processing_spark.functions.ivf_index import (
        read_index_cells,
    )

    emb = table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=8)
    sdir = os.path.join(idx, "cells_stream")
    os.makedirs(sdir)
    with open(os.path.join(sdir, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    with pytest.raises(Exception):
        read_index_cells(spark, idx).count()


def test_compact_stream_folds_staging_into_base(spark, tmp_path):
    """ivf_index_compact_stream: after streamed batches, compaction
    moves ONLY the staged rows into the base cells (O(streamed)),
    advances the manifest by the ledger extent (the grown corpus then
    reads FRESH — no rebuild), clears the staging + ledger, and serving
    is unchanged. Batches that never committed a ledger row are dropped
    for the stream's replay, not folded."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_append,
        ivf_index_compact_stream,
        ivf_index_is_fresh,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 40)
    d1 = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 70))
    d2 = emb.filter(F.col("vec_id") >= 70)
    queries = emb.filter(F.col("vec_id") < 5)
    cb = [(int(r[0]), list(r[1])) for r in base.filter(F.col("vec_id") < 16)
          .select("vec_id", F.col("embedding").cast("array<double>")).collect()]

    idx = str(tmp_path / "cidx")
    ivf_index_build(base, idx, n_centroids=16, codebook=cb)
    streaming_index_append(idx)(d1, 0)
    streaming_index_append(idx)(d2, 1)
    n_total = emb.count()
    before = sorted(
        tuple(r)
        for r in ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
        .collect()
    )

    m = ivf_index_compact_stream(spark, idx)
    assert m is not None and m["n_rows"] == n_total
    assert not os.path.isdir(os.path.join(idx, "cells_stream"))
    assert not os.path.isdir(os.path.join(idx, "applied_batches"))
    assert read_index_cells(spark, idx).count() == n_total
    # the grown corpus is FRESH post-compact — the manifest advance
    assert ivf_index_is_fresh(spark, emb, idx, 16)
    after = sorted(
        tuple(r)
        for r in ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)
        .collect()
    )
    assert after == before
    # nothing staged -> no-op
    assert ivf_index_compact_stream(spark, idx) is None
    # batch appends still work against the folded base
    extra = emb.limit(3).withColumn("vec_id", F.col("vec_id") + 500000)
    ivf_index_append(extra, idx)
    assert read_index_cells(spark, idx).count() == n_total + 3


def test_compact_stream_drops_uncommitted_batch(spark, tmp_path):
    """A staged partition whose batch never committed its ledger row
    (crash before the commit point) must NOT fold into the base — it
    belongs to the stream's replay."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _load_centroids,
        _quant_cells_frame,
        ivf_index_compact_stream,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    d1 = emb.filter((F.col("vec_id") >= 60) & (F.col("vec_id") < 80))
    orphan = emb.filter(F.col("vec_id") >= 80)
    idx = str(tmp_path / "oidx")
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(d1, 0)
    # crash simulation: batch 1's cells land, its ledger row does not
    rows = _load_centroids(spark, idx)
    (
        _quant_cells_frame(orphan, rows, "vec_id", "embedding")
        .withColumn("__stream_batch", F.lit(1))
        .write.mode("append")
        .partitionBy("__stream_batch", "cent_id")
        .parquet(os.path.join(idx, "cells_stream"))
    )

    m = ivf_index_compact_stream(spark, idx)
    n_committed = base.count() + d1.count()
    assert m["n_rows"] == n_committed
    assert read_index_cells(spark, idx).count() == n_committed


def test_compact_stream_rerun_after_manifest_crash(spark, tmp_path):
    """Crash between the manifest advance and the cleanup (the .appended
    marker is present, cells already hold the fold): a rerun must NOT
    re-append — it re-runs steps 3-4 idempotently and converges."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_compact_stream,
        ivf_index_is_fresh,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    d1 = emb.filter(F.col("vec_id") >= 60)
    idx = str(tmp_path / "ridx")
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(d1, 0)

    # manually construct the 'crashed between append and cleanup'
    # state: staged rows already appended to cells, marker written,
    # manifest advanced, staging + ledger NOT yet removed
    folding = os.path.join(idx, "cells_stream.folding")
    os.rename(os.path.join(idx, "cells_stream"), folding)
    staged = spark.read.parquet(folding).drop("__stream_batch")
    staged.repartition(16, "cent_id").write.partitionBy("cent_id").mode(
        "append"
    ).parquet(os.path.join(idx, "cells"))
    with open(os.path.join(folding, ".appended"), "w") as f:
        f.write("appended")
    # manifest was advanced by the crashed run too
    from real_time_trip_processing_spark.functions.ivf_index import (
        _FP_MOD,
        _corpus_stats,
        _read_manifest,
        _write_manifest,
    )

    prev = _read_manifest(spark, idx, "ivf")
    dn, dfp = _corpus_stats(d1, "vec_id", "embedding")
    _write_manifest(spark, idx, {
        "n_rows": int(prev["n_rows"]) + dn,
        "fingerprint": (int(prev["fingerprint"]) + dfp) % _FP_MOD,
        "n_centroids": 16, "dim": int(prev["dim"]),
        "codebook_fp": int(prev.asDict().get("codebook_fp") or 0),
    }, "ivf")

    n_total = emb.count()
    m = ivf_index_compact_stream(spark, idx)  # the rerun
    assert m["n_rows"] == n_total
    assert read_index_cells(spark, idx).count() == n_total  # no dupes
    assert not os.path.isdir(folding)
    assert ivf_index_is_fresh(spark, emb, idx, 16)


def test_compact_high_water_blocks_replayed_batch(spark, tmp_path):
    """A micro-batch REPLAYED after compaction (graceful stop does not
    guarantee the last batch won't re-fire — sink and checkpoint
    commits are not atomic) must be skipped: the fold consumed its
    ledger row, so idempotency is carried by the compacted_through
    high-water instead of the ledger."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
        ivf_index_compact_stream,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    d1 = emb.filter((F.col("vec_id") >= 60) & (F.col("vec_id") < 80))
    d2 = emb.filter(F.col("vec_id") >= 80)
    idx = str(tmp_path / "hw")
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(d1, 0)
    streaming_index_append(idx)(d2, 1)
    n_total = emb.count()

    ivf_index_compact_stream(spark, idx)
    assert _read_high_water(idx) == 1
    # the stream restarts and replays its last pre-compaction batch —
    # without the high-water these rows would land in staging AGAIN and
    # read_index_cells would double-serve them
    streaming_index_append(idx)(d2, 1)
    assert read_index_cells(spark, idx).count() == n_total
    # a genuinely NEW batch of the same stream still applies
    extra = emb.limit(4).withColumn("vec_id", F.col("vec_id") + 700000)
    streaming_index_append(idx)(extra, 2)
    assert read_index_cells(spark, idx).count() == n_total + 4


def test_compact_crash_between_cleanup_rmtrees_heals(spark, tmp_path):
    """Round-6 cleanup order is ledger FIRST, then folding dir. A crash
    between the two leaves folding-without-ledger, which a rerun
    converges through the .appended-marker path — no RuntimeError, no
    duplicate rows, high-water intact."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
        ivf_index_compact_stream,
        ivf_index_is_fresh,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    d1 = emb.filter(F.col("vec_id") >= 60)
    idx = str(tmp_path / "cw")
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(d1, 0)

    # run a real compaction, then reconstruct the crash state: the
    # folding dir reappears (rmtree never ran) while the ledger is gone
    ivf_index_compact_stream(spark, idx)
    folding = os.path.join(idx, "cells_stream.folding")
    os.makedirs(folding)
    with open(os.path.join(folding, ".appended"), "w") as f:
        f.write("appended")
    # stage a parquet shard shaped like the folded batch so the rerun's
    # reads parse (content irrelevant: the marker skips the append)
    spark.range(0).selectExpr(
        "CAST(id AS LONG) vec_id", "array(CAST(1 AS LONG)) qv",
        "CAST(1 AS LONG) qn2", "CAST(1 AS LONG) row_fp",
        "CAST(0 AS INT) cent_id", "CAST(0 AS LONG) __stream_batch",
    ).write.mode("append").partitionBy("__stream_batch", "cent_id").parquet(
        folding
    )

    n_total = emb.count()
    m = ivf_index_compact_stream(spark, idx)  # the rerun
    assert m is not None and m["n_rows"] == n_total
    assert read_index_cells(spark, idx).count() == n_total
    assert not os.path.isdir(folding)
    assert _read_high_water(idx) == 0
    assert ivf_index_is_fresh(spark, emb, idx, 16)


def test_orphaned_ledger_is_promoted_not_poisonous(spark, tmp_path):
    """The pre-round-6 crash window left a populated ledger with no
    staging; a compact rerun then returned None WITHOUT clearing it,
    and a later stream silently skipped real batches whose ids collided
    with the stale entries. Now the nothing-staged path promotes the
    orphan into the high-water and deletes it, and an explicit
    ivf_index_reset_stream lets a genuinely fresh stream apply batch 0."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
        ivf_index_compact_stream,
        ivf_index_reset_stream,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    fresh = emb.filter(F.col("vec_id") >= 60)
    idx = str(tmp_path / "ol")
    ivf_index_build(base, idx, n_centroids=16)
    # orphaned ledger: rows for batches 0..2, no cells_stream at all
    spark.createDataFrame(
        [(0, 5, 1), (1, 7, 2), (2, 3, 3)],
        "batch_id long, n_rows long, fingerprint_delta long",
    ).write.partitionBy("batch_id").parquet(
        os.path.join(idx, "applied_batches")
    )

    assert ivf_index_compact_stream(spark, idx) is None
    assert not os.path.isdir(os.path.join(idx, "applied_batches"))
    assert _read_high_water(idx) == 2

    # a replayed old batch is still skipped (high-water carries it)...
    streaming_index_append(idx)(fresh, 2)
    assert read_index_cells(spark, idx).count() == base.count()
    # ...and after the explicit reset a FRESH stream's batch 0 applies
    # instead of being silently dropped
    ivf_index_reset_stream(idx)
    assert _read_high_water(idx) == -1
    streaming_index_append(idx)(fresh, 0)
    assert read_index_cells(spark, idx).count() == emb.count()


def test_rebuild_clears_high_water_for_fresh_stream(spark, tmp_path):
    """A rebuild resets the whole streaming lifecycle: staging, ledger
    AND the compaction high-water — so a fresh checkpoint's batch 0
    applies against the rebuilt base instead of reading as an
    already-folded replay."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
        ivf_index_compact_stream,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    d1 = emb.filter(F.col("vec_id") >= 60)
    idx = str(tmp_path / "rb")
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(d1, 0)
    ivf_index_compact_stream(spark, idx)
    assert _read_high_water(idx) == 0

    ivf_index_build(emb, idx, n_centroids=16)
    assert _read_high_water(idx) == -1
    extra = emb.limit(4).withColumn("vec_id", F.col("vec_id") + 900000)
    streaming_index_append(idx)(extra, 0)  # fresh checkpoint, batch 0
    assert read_index_cells(spark, idx).count() == emb.count() + 4


def test_mutators_on_remote_uri_fail_loudly_without_connector(spark, tmp_path):
    """Round 7 replaced the blanket URI rejection with the dual-mode
    lifecycle: URI index dirs route staging + locking through the
    Hadoop FS API (file:-scheme lifecycle is pinned by
    tests/test_ivf_uri.py). A REMOTE scheme whose connector isn't on
    the classpath must still fail loudly at FS resolution — never
    silently mangle a local ./s3a: path the way raw os calls would."""
    import pytest

    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_compact_stream,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings").limit(5)
    # py4j surfaces Hadoop's UnsupportedFileSystemException /
    # "No FileSystem for scheme" as a Java error — any Exception is
    # fine as long as nothing was created locally
    with pytest.raises(Exception, match="(?i)s3a|filesystem|scheme"):
        ivf_index_build(emb, "s3a://bucket/idx", n_centroids=4)
    with pytest.raises(Exception, match="(?i)s3a|filesystem|scheme"):
        streaming_index_append("s3a://bucket/idx")(emb, 0)
    import os as _os

    assert not _os.path.exists("s3a:")  # no mangled local dir appeared


def test_reset_stream_crash_residue_is_not_poisonous(spark, tmp_path):
    """reset_stream deletes the LEDGER first. Its crash residue
    (staging without ledger) must (a) keep serving the streamed rows
    until the rerun finishes, and (b) be discarded — NOT promoted into
    the high-water — by a later compact, so a fresh stream's batch 0
    still applies. The reverse residue (ledger without staging, batches
    never folded) was the round-6 review's silent-skip hazard."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
        ivf_index_compact_stream,
        read_index_cells,
        streaming_index_append,
    )

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") < 60)
    d1 = emb.filter(F.col("vec_id") >= 60)
    idx = str(tmp_path / "rs")
    ivf_index_build(base, idx, n_centroids=16)
    streaming_index_append(idx)(d1, 0)

    # crash simulation: reset removed the ledger, not yet the staging
    import shutil

    shutil.rmtree(os.path.join(idx, "applied_batches"))
    # (a) the staged vectors still serve — no ledger needed to read
    assert read_index_cells(spark, idx).count() == emb.count()
    # (b) compact discards the uncommitted staging without promoting:
    # it folds the EMPTY committed set (no ledger), leaves the manifest
    # describing the base, and writes no high-water
    m = ivf_index_compact_stream(spark, idx)
    assert m is None or int(m["n_rows"]) == base.count()
    assert _read_high_water(idx) == -1
    assert not os.path.isdir(os.path.join(idx, "cells_stream"))
    # fresh stream batch 0 applies
    streaming_index_append(idx)(d1, 0)
    assert read_index_cells(spark, idx).count() == emb.count()


def test_serve_state_cache_invalidates_on_rewrite(spark, tmp_path):
    """The driver-side serve-state memo (round 8: codebooks/books are
    collected once per CONTENT, keyed on the layout dir's file
    signature) must never serve stale geometry: a rebuild of the SAME
    index dir with a DIFFERENT codebook must flow into the very next
    serve call — pinned by comparing against an identically-rebuilt
    index at a fresh path (no cache entry possible)."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _load_centroids,
    )
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb_a = [
        (int(r[0]), list(r[1]))
        for r in emb.filter(F.col("vec_id") < 16)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    ]
    cb_b = [
        (int(r[0]), list(r[1]))
        for r in emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 116))
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    ]
    cb_b = [(i, v) for i, (_, v) in enumerate(cb_b)]
    idx, fresh = str(tmp_path / "idx"), str(tmp_path / "fresh")
    ivf_index_build(emb, idx, n_centroids=16, codebook=cb_a)
    _ = ivf_persisted_topk(spark, idx, queries, k=3, nprobe=4)  # warm cache
    assert sorted(_load_centroids(spark, idx)) == sorted(
        (int(c), [float(x) for x in v]) for c, v in cb_a
    )
    # rebuild IN PLACE with different geometry, then serve immediately
    ivf_index_build(emb, idx, n_centroids=16, codebook=cb_b)
    ivf_index_build(emb, fresh, n_centroids=16, codebook=cb_b)
    got = _rows(ivf_persisted_topk(spark, idx, queries, k=3, nprobe=2))
    want = _rows(ivf_persisted_topk(spark, fresh, queries, k=3, nprobe=2))
    assert got == want
    assert sorted(_load_centroids(spark, idx)) == sorted(
        (int(c), [float(x) for x in v]) for c, v in cb_b
    )


def test_empty_micro_batch_is_skipped_and_foldable(spark, tmp_path):
    """An empty micro-batch must stage nothing and record nothing (a
    data-less __stream_batch partition would kill fold-time schema
    inference), and a PRE-FIX staging shape — a cells_stream holding
    zero parquet files next to a committed zero-extent ledger — must
    compact to a no-op that still promotes the ledger into the
    high-water instead of dying on UNABLE_TO_INFER_SCHEMA."""
    from real_time_trip_processing_spark.functions.ivf_index import (
        _read_high_water,
        ivf_index_compact_stream,
        streaming_index_append,
    )
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    idx = str(tmp_path / "idx")
    ivf_index_build(emb, idx, n_centroids=16)
    empty = emb.filter(F.col("vec_id") < 0)
    streaming_index_append(idx)(empty, 0)
    assert not os.path.exists(os.path.join(idx, "cells_stream"))
    assert not os.path.exists(os.path.join(idx, "applied_batches"))
    assert ivf_index_compact_stream(spark, idx) is None

    # pre-fix on-disk shape: empty staging dir + committed ledger row
    os.makedirs(os.path.join(idx, "cells_stream", "__stream_batch=3"))
    spark.createDataFrame(
        [(3, 0, 0)], "batch_id long, n_rows long, fingerprint_delta long"
    ).write.partitionBy("batch_id").parquet(
        os.path.join(idx, "applied_batches")
    )
    assert ivf_index_compact_stream(spark, idx) is None
    assert _read_high_water(idx) == 3  # promoted, not poisonous
    assert not os.path.exists(os.path.join(idx, "cells_stream"))
    assert not os.path.exists(os.path.join(idx, "cells_stream.folding"))
    # the index still serves
    got = ivf_persisted_topk(
        spark, idx, emb.filter(F.col("vec_id") < 3), k=3, nprobe=4
    )
    assert got.count() > 0
