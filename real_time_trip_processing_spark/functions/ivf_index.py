"""Persisted IVF index: build once, serve many (SURVEY §2.12 X3).

`ivf_topk` proves the IVF math but pays the expensive part — centroid
assignment + quantization of every corpus vector — INSIDE every query
(SCALE.md: at 1M rows its wall is ≈ brute force because assignment
dominates). Real ANN serving amortizes that: a BUILD step assigns and
quantizes the corpus once and persists it as a parquet layout
partitioned by ``cent_id``; each QUERY then reads ONLY the probed
cells (parquet partition pruning — the scan never touches the other
``n_centroids - nprobe`` fractions of the corpus) and scores stored
integer vectors with one BLAS matmul per Arrow batch.

Layout under ``index_dir``::

    cells/cent_id=<c>/*.parquet    (id, qv array<long>, qn2 long)
    cells_pq/cent_id=<c>/*.parquet (id, codes array<int>) — IVF-PQ flavor
    centroids_ivf/*.parquet        (cent_id int, centroid array<double>)
    centroids_pq/*.parquet         per-LAYOUT codebooks — co-located
                                   layouts may be built with different
                                   coarse codebooks; a shared dir would
                                   let the second build silently replace
                                   the first layout's probe geometry
    books/*.parquet                (subspace, code, centroid) — PQ books
    manifest_ivf/*.parquet         per-layout freshness manifests
    manifest_pq/*.parquet          (n_rows, fingerprint, n_centroids,
                                   dim, codebook_fp)
    cells_stream/, applied_batches/, compacted_through
                                   IVF stream staging + ledger +
                                   high-water (lifecycle below)
    cells_pq_stream/, applied_batches_pq/, compacted_through_pq
                                   the PQ layout's OWN stream lifecycle
                                   (disjoint by name — the layouts
                                   never vouch for each other)
    cells*.delete_intent, cells*.deleting/
                                   crash-safe delete lifecycle
                                   (intent marker + staged kept rows;
                                   see `_index_delete`)

Lifecycle: `*_build` (full), `ivf_index_append` (O(delta) growth —
assign the delta against stored centroids, append to cells, advance
the manifest), `*_ensure` (content-addressed skip/rebuild),
`*_index_delete` (targeted erasure — partition-scoped rewrite, the
index-side twin of the lake's GDPR purge; serve results afterwards
are bit-identical to a rebuild over the purged corpus with the same
codebook, and the manifest reads FRESH against the purged corpus).
Streaming ingest (`streaming_index_append` / `streaming_pq_index_append`
→ `*_compact_stream` → `*_reset_stream`) runs on ONE parameterized
machinery for both layouts (`_STREAM_CFG`) — each layout's staging,
ledger and high-water are name-disjoint, so the two stream lifecycles
never vouch for each other (the per-layout manifest rule).

Single-index concurrency: every mutating entry point (builds, appends,
the streaming sink's per-batch apply) serializes on the single-writer
lock for ``index_dir`` (`_index_lock`) and re-reads the manifest INSIDE
the critical section — two appends, or an append racing a streaming
micro-batch, apply one after the other against the manifest the other
just advanced, never against a stale parent. The lock is DUAL-MODE
(round 7 — until then every mutator hard-rejected URI dirs):

- local directories — plain paths AND local ``file:`` URIs, decoded so
  every spelling of one directory takes the SAME lock — use the kernel
  ``flock`` (`locking.dir_write_lock`: crash-released, no staleness
  guessing);
- remote Hadoop-FS directories (``s3a://…``, ``hdfs://…``) use the
  create-exclusive CAS lease (`fsio.fs_cas_write_lock`) — atomic on
  HDFS/local, conditional-put on S3 with Hadoop ≥ 3.4.1; a crashed
  holder's marker is cleared explicitly (`fsio.fs_force_unlock`),
  never auto-broken.

The staging lifecycle ops (rebuild's staging clear, compaction's
rename/marker/cleanup, the ledger/high-water files) are likewise
dual-path: plain local paths keep the os/shutil fast path (with the
fsync-durable high-water write); ANY URI — ``file:`` included, which
is how the tests exercise scheme-correctness — routes through the
Hadoop FileSystem API (`fsio`), the same abstraction the read path
already uses. Per-scheme atomicity caveats (S3A rename = copy+delete)
are documented in ``fsio``; every rename here happens inside the
critical section, so the crash matrix re-converges from either side.
Readers resolve through Spark/Hadoop FS and work on any scheme; they
never take the lock.

``qv`` is the shared SRP_QUANT integer quantization and ``qn2`` the
exact integer squared norm, so serve-time scores are bit-identical to
`ivf_topk` / the DuckDB oracle (the module-level exactness argument in
`similarity.py`): `sim_ivf_persisted` declares the SAME oracle SQL as
`sim_ivf_topk` and hash-matches it.

Why this index carries NO formula-version marker while the dedup
signature indexes do (round 10 — stated rather than assumed): the
dedup indexes fail SILENTLY on a formula shift (band keys stop
colliding; zero candidates is indistinguishable from zero duplicates),
but this layout is self-consistent and scale-tolerant by construction:
(a) cosine is per-side scale-invariant, so a pure SRP_QUANT change
leaves stored-vs-query scores equal up to rounding; (b) probe geometry
always comes from the index's OWN persisted codebook (queries are
assigned against `centroids_<layout>/`, never against freshly-trained
centroids), and PQ codes are only ever decoded against the index's own
``books/`` — there is no cross-version key meeting; (c) the manifest's
content fingerprint re-verifies the index against the live corpus, so
a rebuild-on-drift covers re-embedding. A rounding-formula change
would shift scores at the last decimal, which the DuckDB oracle's
value hash catches the same day — loud, not silent.

At 100 TB: the build is one scan + one partitioned write (each vector
moves once, shuffled only by the partitioned-write's cent_id split);
queries are `O(N · nprobe / n_centroids)` scan-bytes with pruning done
by the parquet source, not a filter operator. The manifest makes
rebuilds content-addressed: serve paths verify (row count, id+vector
content hash) against the live corpus and rebuild only on drift —
including a re-embedded corpus whose ids did not change.

Reference parity: the reference has no vector surface; this extends
the mandated training-data-pipeline layer (ANN serving path).
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import shutil
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..fsio import (
    fs_cas_write_lock,
    fs_delete,
    fs_exists,
    fs_read_text,
    fs_rename,
    fs_write_text,
    is_uri,
    local_form,
)
from ..locking import dir_write_lock
from .similarity import (
    CentroidRows,
    _quant_codebook,
    _quant_np,
    _resolve_centroids,
    nearest_centroid_kernel,
    qdot,
    quant_vec,
)

__all__ = [
    "ivf_index_build", "ivf_index_is_fresh", "ivf_index_ensure",
    "ivf_index_append", "ivf_persisted_topk", "default_index_root",
    "ivfpq_index_build", "ivfpq_index_ensure", "ivfpq_persisted_topk",
    "ivfpq_index_append", "ivf_index_compact_stream",
    "ivf_index_reset_stream",
    "ivfpq_index_compact_stream", "ivfpq_index_reset_stream",
    "streaming_pq_index_append", "read_index_cells_pq",
    "ivf_index_delete", "ivfpq_index_delete",
    "ann_join_persisted", "streaming_index_append", "read_index_cells",
]


def _high_water_path(index_dir: str, name: str = "compacted_through") -> str:
    return os.path.join(index_dir, name)


#: per-layout streaming lifecycle paths — the IVF machinery
#: (streaming_index_append / compact / reset / read_index_cells) is
#: parameterized over this so the IVF-PQ layout rides the SAME
#: battle-tested sink/fold/heal code instead of a diverging copy.
#: Names are layout-disjoint on purpose: a dir can host both layouts'
#: streams without their ledgers/high-waters vouching for each other
#: (the same isolation rule as the per-layout manifests/codebooks).
_STREAM_CFG = {
    "ivf": {
        "cells": "cells",
        "staging": "cells_stream",
        "ledger": "applied_batches",
        "high_water": "compacted_through",
    },
    "pq": {
        "cells": "cells_pq",
        "staging": "cells_pq_stream",
        "ledger": "applied_batches_pq",
        "high_water": "compacted_through_pq",
    },
}


def _require_spark(spark: SparkSession | None, path: str) -> SparkSession:
    """Staging ops on a URI path run through the Hadoop FS API, which
    needs a session; plain local paths never reach this."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to resolve the Hadoop FS for {path!r}"
        )
    return spark


# --- dual-path staging primitives ------------------------------------
# Plain local paths keep the os/shutil fast path (incl. the fsync-
# durable high-water write); ANY URI — file:// included — routes
# through fsio's Hadoop FS ops so the lifecycle is scheme-correct.


def _st_exists(path: str, spark: SparkSession | None = None) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    return fs_exists(_require_spark(spark, path), path)


def _st_rmtree(path: str, spark: SparkSession | None = None) -> None:
    if not is_uri(path):
        if os.path.isdir(path):
            shutil.rmtree(path)
        return
    fs_delete(_require_spark(spark, path), path, recursive=True)


def _st_unlink(path: str, spark: SparkSession | None = None) -> None:
    if not is_uri(path):
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)
        return
    fs_delete(_require_spark(spark, path), path, recursive=False)


def _st_rename(src: str, dst: str, spark: SparkSession | None = None) -> None:
    if not is_uri(src):
        os.rename(src, dst)
        return
    fs_rename(_require_spark(spark, src), src, dst)


def _st_count_files(
    path: str, spark: SparkSession | None = None, suffix: str | None = None
) -> int:
    if not is_uri(path):
        return sum(
            1 for _, _, fns in os.walk(path) for fn in fns
            if suffix is None or fn.endswith(suffix)
        )
    from ..fsio import fs_count_files

    return fs_count_files(_require_spark(spark, path), path, suffix)


def _st_touch(path: str, text: str, spark: SparkSession | None = None) -> None:
    if not is_uri(path):
        with open(path, "w") as f:
            f.write(text)
        return
    fs_write_text(_require_spark(spark, path), path, text)


def _st_read_text(path: str, spark: SparkSession | None = None) -> str | None:
    """Small-file text read; None when absent (dual-path twin of
    ``_st_touch`` — the delete intent marker round-trips through it)."""
    if not is_uri(path):
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None
    return fs_read_text(_require_spark(spark, path), path)


def _read_high_water(
    index_dir: str,
    spark: SparkSession | None = None,
    name: str = "compacted_through",
) -> int:
    """Highest ledger batch_id folded into the base by a compaction, or
    -1. Compaction deletes the ledger (its idempotency record), so this
    marker is what stops a micro-batch REPLAYED across the compaction —
    structured streaming's sink commit and checkpoint commit are not
    atomic, so the last pre-compaction batch can legitimately re-fire
    even after a graceful stop — from re-applying rows the fold already
    moved into the base."""
    if is_uri(index_dir):
        txt = fs_read_text(
            _require_spark(spark, index_dir),
            _high_water_path(index_dir, name),
        )
        try:
            return int((txt or "").strip())
        except ValueError:
            return -1
    try:
        with open(_high_water_path(index_dir, name)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return -1


def _write_high_water(
    index_dir: str,
    batch_id: int,
    spark: SparkSession | None = None,
    name: str = "compacted_through",
) -> None:
    if is_uri(index_dir):
        # tmp + rename commit through the FS API. Hadoop rename fails
        # onto an existing destination, so the old marker is deleted
        # first. The delete→rename window is crash-safe by ORDERING,
        # not atomicity: every call site writes the high-water while
        # the LEDGER rows it summarizes still exist (compact removes
        # the ledger only after this returns; the heal path likewise),
        # so a crash inside the window leaves a ledger whose rerun
        # recomputes and rewrites the same high-water — the marker is
        # derivable until the moment it becomes the only record.
        # Concurrent readers are excluded by the single-writer lock.
        # Durability is the store's close/rename contract (HDFS
        # hflush-on-close, S3 PUT).
        sp = _require_spark(spark, index_dir)
        hw = _high_water_path(index_dir, name)
        fs_write_text(sp, hw + ".tmp", str(int(batch_id)))
        fs_delete(sp, hw, recursive=False)
        fs_rename(sp, hw + ".tmp", hw)
        return
    # rename-committed AND fsynced: without the fsync before the
    # replace, a power loss can make the rename durable before the
    # data blocks (ext4/xfs), leaving an EMPTY marker that reads as
    # "no high-water" and silently re-opens the replay window this
    # marker exists to close; the directory fsync makes the rename
    # itself durable
    tmp = _high_water_path(index_dir, name) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(int(batch_id)))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _high_water_path(index_dir, name))
    dfd = os.open(index_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def default_index_root() -> str:
    """Repo-local index store (swap for an object-store URI in prod)."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".index",
    )


def _corpus_stats(
    corpus: DataFrame, id_col: str, vec_col: str = "embedding"
) -> tuple[int, int]:
    """Content fingerprint: (row count, Σ xxhash64(id ':' vector)) — one
    partial-aggregated scan, no shuffle, additive over rows (so appends
    can advance it by the delta alone). Hashing the VECTOR content, not
    just ids, means a re-embedded corpus with unchanged ids correctly
    reads as stale; hashing the id as a string works for any key type
    (a long-cast would null string ids and degrade to count-only)."""
    r = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            # DECIMAL(38,0) accumulation: a long sum of xxhash64 values
            # overflows under ANSI mode
            F.sum(
                F.xxhash64(
                    F.concat_ws(
                        ":",
                        F.col(id_col).cast("string"),
                        F.col(vec_col).cast("array<double>").cast("string"),
                    )
                ).cast("decimal(38,0)")
            ),
            F.lit(0),
        ).alias("s"),
    ).collect()[0]
    return int(r["n"]), int(r["s"]) % _FP_MOD


#: fingerprint modulus — keeps the stored value a LONG while preserving
#: additivity ((a+b) mod M == ((a mod M)+(b mod M)) mod M), which the
#: append paths rely on.
_FP_MOD = 2**61 - 1


def _codebook_fp(rows: CentroidRows) -> int:
    """Deterministic content hash of a resolved codebook (cent_id order
    + exact float64 bit patterns). Stored in the manifest so a freshness
    check against an explicitly-passed codebook can tell 'same corpus,
    retrained centroids' from 'fresh' — without it, an index built with
    old centroids keeps serving while probe selection silently diverges
    from the caller's new codebook."""
    h = hashlib.blake2b(digest_size=8)
    for cid, vec in sorted(rows, key=lambda r: r[0]):
        h.update(struct.pack("<q", int(cid)))
        h.update(struct.pack(f"<{len(vec)}d", *[float(x) for x in vec]))
    return int.from_bytes(h.digest(), "little") % _FP_MOD


@contextlib.contextmanager
def _index_lock(
    index_dir: str,
    spark: SparkSession | None = None,
    timeout_sec: float = 120.0,
):
    """Single-writer lock for one index directory — dual-mode (module
    docstring): kernel flock for local dirs (plain paths and decoded
    ``file:`` URIs share one lock path, so every spelling of a local
    dir excludes every other), create-exclusive CAS lease (fsio) for
    remote Hadoop-FS dirs. All mutating paths re-read the manifest
    INSIDE the locked section, which is what makes interleaved appends
    apply against each other's advanced manifest instead of a shared
    stale parent.

    ``SPARK_GRAFT_FORCE_CAS_LOCK=1`` forces the CAS lease on local
    dirs — test plumbing ONLY (it exercises the object-store lease
    through local ``file:`` URIs); a forced-CAS writer and a flock
    writer do NOT exclude each other, so never set it in production.
    """
    force_cas = os.environ.get("SPARK_GRAFT_FORCE_CAS_LOCK") == "1"
    if force_cas and "PYTEST_CURRENT_TEST" not in os.environ:
        # the override weakens a safety property with no other runtime
        # signal (a forced-CAS writer and a flock writer don't exclude
        # each other) — a leaked setting outside the test suite must
        # not stay silent (ADVICE r7)
        import warnings

        warnings.warn(
            "SPARK_GRAFT_FORCE_CAS_LOCK=1 is active outside pytest: "
            "local-dir writers using flock will NOT exclude this one. "
            "This override is test plumbing only — unset it.",
            RuntimeWarning,
            stacklevel=3,
        )
    local = None if force_cas else local_form(index_dir)
    if local is not None:
        with dir_write_lock(local, timeout_sec=timeout_sec):
            yield
    else:
        with fs_cas_write_lock(
            _require_spark(spark, index_dir), index_dir,
            timeout_sec=timeout_sec,
        ):
            yield


#: back-compat alias (pre-round-7 name; local-only semantics)
_index_write_lock = dir_write_lock


def _centroids_path(index_dir: str, layout: str) -> str:
    # per-LAYOUT codebook dirs: an IVF and an IVF-PQ index co-located in
    # one dir may legitimately use different coarse codebooks; a shared
    # centroids/ would let whichever build ran second silently replace
    # the other layout's probe geometry while its manifest still read
    # fresh.
    return os.path.join(index_dir, f"centroids_{layout}")


#: driver-side serve-state memo — codebooks and PQ books are tiny
#: (k × dim floats) but their parquet collect costs ~0.3 s per serve
#: call, which dominated the persisted-serve prologue (measured r8:
#: ann_join_ivfpq_persisted spent 0.66 s/call re-collecting state that
#: never changes between mutations). Keyed on the source directory's
#: FILE SIGNATURE (name, length, mtime of every file, via the Hadoop
#: FS so URIs resolve too): every parquet rewrite generates fresh
#: task-UUID part names, so any build/retrain invalidates naturally —
#: content-addressed at the FS level, no manifest coupling, no TTL.
#: Appends/deletes rewrite cells, not codebooks — the cached state
#: stays valid by construction. Bounded FIFO so test suites touching
#: hundreds of tmp indexes can't grow it without limit.
_SERVE_STATE_CACHE: dict = {}
_SERVE_STATE_CACHE_CAP = 64


def _files_signature(spark: SparkSession, path: str) -> tuple:
    """(name, length, mtime) of every file directly under ``path``
    (these layout dirs are flat), or a distinguished absent marker.
    Iterating FileStatus elements costs a py4j round-trip per file, so
    the builders write these driver-small artifacts as ONE file each
    (`coalesce(1)` — 512 codebook rows sprayed over 32 part files cost
    ~0.2 s to list, most of what this memo was built to save)."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return ("<absent>",)
    return tuple(sorted(
        (str(st.getPath().getName()), int(st.getLen()),
         int(st.getModificationTime()))
        for st in fs.listStatus(p)
    ))


def _serve_state_cached(spark: SparkSession, kind: str, path: str, load):
    """Memoized ``load()`` keyed on (kind, path, file signature)."""
    sig = _files_signature(spark, path)
    key = (kind, path)
    hit = _SERVE_STATE_CACHE.get(key)
    if hit is not None and hit[0] == sig:
        return hit[1]
    payload = load()
    if len(_SERVE_STATE_CACHE) >= _SERVE_STATE_CACHE_CAP:
        _SERVE_STATE_CACHE.pop(next(iter(_SERVE_STATE_CACHE)))
    _SERVE_STATE_CACHE[key] = (sig, payload)
    return payload


def _load_centroids(
    spark: SparkSession, index_dir: str, layout: str = "ivf"
) -> CentroidRows:
    path = _centroids_path(index_dir, layout)
    if not _dir_exists(spark, path):
        # pre-round-5 indexes stored a single shared centroids/ dir;
        # read it so an existing on-disk index keeps serving (it is
        # correct as long as only one layout was ever built there —
        # new builds always write the per-layout dir)
        path = os.path.join(index_dir, "centroids")

    def load() -> CentroidRows:
        return [
            (int(r["cent_id"]), list(r["centroid"]))
            for r in spark.read.parquet(path).collect()
        ]

    # callers mutate nothing (rows are treated as immutable everywhere:
    # built into literals / numpy copies), so sharing the cached list
    # is safe; return a shallow copy anyway to keep that a non-contract
    return list(_serve_state_cached(spark, "centroids", path, load))


def _dir_exists(spark: SparkSession, path: str) -> bool:
    """Existence through the Hadoop FS API so object-store URIs resolve
    the same way the reader will — an os.path check would silently
    report False for s3://... and drop data."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _load_books(spark: SparkSession, index_dir: str, dim: int | None = None):
    """(books, dim) from the persisted PQ codebooks (+ the PQ manifest
    when the caller doesn't already hold ``dim``). Memoized on the
    books dir's file signature (`_SERVE_STATE_CACHE`)."""
    path = os.path.join(index_dir, "books")

    def load():
        brows = spark.read.parquet(path).collect()
        m = 1 + max(r["subspace"] for r in brows)
        kk = 1 + max(r["code"] for r in brows)
        books = [[None] * kk for _ in range(m)]
        for r in brows:
            books[r["subspace"]][r["code"]] = list(r["centroid"])
        return books

    books = _serve_state_cached(spark, "books", path, load)
    if dim is None:
        dim = int(_read_manifest(spark, index_dir, "pq")["dim"])
    return books, dim


def _load_books_np(spark: SparkSession, index_dir: str):
    """(books, books_mats, norm_mat) with the float64 matrices and the
    per-(subspace, code) squared-norm table converted ONCE per books
    content — the ADC join kernels close over these; re-converting per
    call was a measured waste (round 8, same lesson as the per-LUT
    boxing)."""
    path = os.path.join(index_dir, "books")

    def load():
        books, _ = _load_books(spark, index_dir, dim=0)
        mats = [np.array(cb, dtype=np.float64) for cb in books]
        norms = [
            np.array([float(np.dot(c, c)) for c in mat]) for mat in mats
        ]
        return books, mats, norms

    return _serve_state_cached(spark, "books_np", path, load)


def _manifest_path(index_dir: str, layout: str) -> str:
    # one manifest PER LAYOUT: a dir holding both an IVF and an IVF-PQ
    # index must track their freshness independently (an IVF rebuild
    # must not vouch for stale PQ cells, and vice versa)
    return os.path.join(index_dir, f"manifest_{layout}")


def _read_manifest(spark: SparkSession, index_dir: str, layout: str):
    return spark.read.parquet(_manifest_path(index_dir, layout)).collect()[0]


def _write_manifest(
    spark: SparkSession, index_dir: str, manifest: dict, layout: str
) -> None:
    spark.createDataFrame(
        # explicit by-name tuple: positional values() would silently
        # mis-map columns if a caller's dict order ever drifted
        [(
            int(manifest["n_rows"]),
            int(manifest["fingerprint"]),
            int(manifest["n_centroids"]),
            int(manifest["dim"]),
            int(manifest.get("codebook_fp", 0)),
        )],
        "n_rows long, fingerprint long, n_centroids int, dim int,"
        " codebook_fp long",
    ).write.mode("overwrite").parquet(_manifest_path(index_dir, layout))


def _row_fp_col(id_col: str, vec_col: str):
    """Per-row content-hash term — EXACTLY the summand of
    `_corpus_stats`'s fingerprint. Stored in every cell row so deletes
    can subtract the erased rows' contribution from the manifest
    fingerprint (additivity works both ways) without the raw vectors,
    which the cells do not keep."""
    return F.xxhash64(
        F.concat_ws(
            ":",
            F.col(id_col).cast("string"),
            F.col(vec_col).cast("array<double>").cast("string"),
        )
    )


def _quant_cells_frame(
    corpus: DataFrame, rows: CentroidRows, id_col: str, vec_col: str
) -> DataFrame:
    """(id, qv, qn2, row_fp, cent_id) — the IVF cell rows; shared by
    build and append so the two paths cannot drift."""
    assign = nearest_centroid_kernel(rows)
    return (
        corpus.select(
            F.col(id_col),
            quant_vec(F.col(vec_col)).alias("qv"),
            assign(F.col(vec_col).cast("array<double>")).alias("cent_id"),
            _row_fp_col(id_col, vec_col).alias("row_fp"),
        )
        .withColumn("qn2", qdot(F.col("qv"), F.col("qv")))
        .select(id_col, "qv", "qn2", "row_fp", "cent_id")
    )


def _pq_cells_frame(
    corpus: DataFrame, rows: CentroidRows, books, dim: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(cand_id, codes, row_fp, cent_id) — the IVF-PQ cell rows; shared
    by build and append."""
    from .pq import assign_encode_kernel

    kernel = assign_encode_kernel(rows, books, dim)
    return corpus.select(
        F.col(id_col).alias("cand_id"),
        kernel(F.col(vec_col).cast("array<double>")).alias("ae"),
        _row_fp_col(id_col, vec_col).alias("row_fp"),
    ).select(
        "cand_id",
        F.col("ae.cent_id").alias("cent_id"),
        F.col("ae.codes").alias("codes"),
        "row_fp",
    )


def ivf_index_build(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | CentroidRows | None = None,
) -> dict:
    """Build the persisted index: one corpus scan assigns each vector to
    its nearest centroid (Arrow kernel, one matmul per batch) and
    quantizes it; one partitioned write lays the cells out by
    ``cent_id`` so serve-time probes become parquet partition pruning.

    Rebuild-after-stream: a build is a FULL re-derivation over the live
    corpus, which includes any vectors that previously arrived through
    `streaming_index_append` — so the stream staging (``cells_stream``)
    and its ledger (``applied_batches``) are cleared inside the same
    locked section. Leaving them would double-serve every streamed
    vector (the new base cells AND the stale staging partitions) and
    make a fresh stream's batches 0..N silently skip as already
    applied. Rebuild with a LIVE stream attached is still undefined
    (stop the stream first): the stream's own checkpoint may replay a
    pre-rebuild batch whose rows the new base already contains.

    Returns the manifest dict (row count, content fingerprint, shape).
    """
    spark = corpus.sparkSession
    rows = _resolve_centroids(corpus, codebook, n_centroids, id_col, vec_col)
    dim = len(rows[0][1]) if rows else 0
    cells = _quant_cells_frame(corpus, rows, id_col, vec_col)
    with _index_lock(index_dir, spark):
        # One clustering shuffle at build time so each cell is ONE
        # compact file, not one-per-upstream-task (256 cells × 32 tasks
        # = 8k tiny files otherwise — measured to cost the serve path
        # more than the pruning saves at 1M rows). At 100 TB swap the
        # fixed width for repartitionByRange on (cent_id, id) if single
        # cells outgrow a task.
        cells.repartition(
            max(1, int(n_centroids)), "cent_id"
        ).write.partitionBy("cent_id").mode("overwrite").parquet(
            os.path.join(index_dir, "cells")
        )
        # the streamed extent is folded into the new base by the full
        # corpus scan above — drop the staging, the ledger AND the
        # compaction high-water before the manifest commit point (a
        # crash in between leaves a stale manifest, which reads as
        # stale and rebuilds). Clearing the high-water is what lets a
        # FRESH stream (new checkpoint, batch ids from 0) attach to the
        # rebuilt index; the old checkpoint is meaningless against a
        # re-derived base (module docstring: restart streaming with a
        # fresh checkpoint after rebuild). Order: staging BEFORE ledger
        # — the opposite of reset_stream — because here the new base
        # already CONTAINS the streamed vectors (full corpus scan), so
        # a crash between the two leaves an orphaned ledger whose
        # batches are genuinely in the base (safe to promote, and the
        # stale manifest forces a repair rebuild regardless), whereas
        # staging-after-ledger would leave stale staging double-served
        # next to the new base until the repair.
        for staging in ("cells_stream", "applied_batches"):
            _st_rmtree(os.path.join(index_dir, staging), spark)
        _st_unlink(_high_water_path(index_dir), spark)
        # a rebuild is also the universal repair for a crashed DELETE —
        # clear its intent marker and staged rows, or a later retry of
        # that delete would swap STALE staged partitions into the
        # freshly rebuilt cells (the same poisoned-retry class the
        # stream-staging clear above prevents)
        _clear_delete_debris(index_dir, "cells", spark)
        # driver-small artifact: one file, not one-per-parallelism —
        # serve paths list + collect this dir on every memo validation
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in rows],
            "cent_id int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            _centroids_path(index_dir, "ivf")
        )
        n, fp = _corpus_stats(corpus, id_col, vec_col)
        manifest = {
            "n_rows": n, "fingerprint": fp, "n_centroids": int(n_centroids),
            "dim": dim, "codebook_fp": _codebook_fp(rows),
        }
        _write_manifest(spark, index_dir, manifest, "ivf")
    return manifest


def ivf_index_is_fresh(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    layout: str = "ivf",
    codebook: DataFrame | CentroidRows | None = None,
) -> bool:
    """True iff THIS LAYOUT's manifest exists and matches the live
    corpus's (row count, id+vector content hash, n_centroids) —
    content-addressed staleness, so regenerated testdata, a grown
    corpus, OR a re-embedded corpus with unchanged ids all force a
    rebuild. Per-layout manifests mean an IVF rebuild never vouches
    for the PQ cells (or vice versa).

    When the caller holds an explicit ``codebook``, its content hash is
    compared against the manifest's ``codebook_fp`` too: same corpus +
    same n_centroids + RETRAINED centroids must read stale (the stored
    cells were assigned under the old geometry). ``codebook=None``
    skips the check — trained-from-corpus centroids are a deterministic
    function of (corpus, n_centroids), both already fingerprinted."""
    cells_name = "cells" if layout == "ivf" else "cells_pq"
    if _st_exists(
        os.path.join(index_dir, f"{cells_name}.delete_intent"), spark
    ):
        # a pending crashed delete means the layout is mid-surgery —
        # not fresh by definition; the ensure() rebuild this triggers
        # clears the debris (the universal repair, self-healing here)
        return False
    try:
        m = _read_manifest(spark, index_dir, layout)
        stored = (int(m["n_rows"]), int(m["fingerprint"]), int(m["n_centroids"]))
    except Exception:  # missing dir OR a pre-fingerprint manifest layout
        return False
    if codebook is not None:
        stored_cb = int(m.asDict().get("codebook_fp") or 0)
        want_cb = _codebook_fp(
            _resolve_centroids(corpus, codebook, n_centroids, id_col, vec_col)
        )
        if stored_cb != want_cb:  # covers pre-codebook_fp manifests too
            return False
    n, fp = _corpus_stats(corpus, id_col, vec_col)
    return stored == (n, fp, int(n_centroids))


def ivf_index_ensure(
    corpus: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | CentroidRows | None = None,
) -> str:
    """Build the index iff absent or stale; returns ``index_dir``."""
    spark = corpus.sparkSession
    if not ivf_index_is_fresh(
        spark, corpus, index_dir, n_centroids, id_col, vec_col,
        codebook=codebook,
    ):
        ivf_index_build(
            corpus, index_dir, n_centroids, id_col, vec_col, codebook
        )
    return index_dir


def ivf_persisted_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve approximate top-k cosine from a persisted IVF index.

    Probe selection replays `ivf_topk`'s driver-side math exactly (same
    quantized-integer cosine, same (score desc, cent_id asc) tie-break)
    over the persisted codebook; the union of every query's probed
    cells becomes ONE ``cent_id IN (...)`` predicate on the partition
    column — the parquet source prunes unprobed cells before any bytes
    are read (plan-pinned). Scoring reads the STORED integer vectors
    (no re-quantization, no assignment — the build already paid both)
    with one BLAS matmul per Arrow batch and local top-k per query,
    bit-identical to `ivf_topk` by integer exactness.
    """
    from ..operators.sorts import topk_per_group
    from .similarity import has_quant_direction

    # zero-direction exclusion, both sides — the serve-path mirror of
    # ivf_topk's round-7 rule, keeping the two bit-identical: queries
    # filtered before the driver collect; stored candidates by their
    # stored integer norm (qn2 == 0 iff the vector quantized to zero)
    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    rows = _load_centroids(spark, index_dir)
    qrows = _quant_codebook(rows)  # cent_id-ascending
    ct = np.array([q for _, q, _ in qrows], dtype=np.float64).T  # dim × k
    cn = np.array([n for _, _, n in qrows])
    cent_ids = [c for c, _, _ in qrows]
    cent_pos = {c: i for i, c in enumerate(cent_ids)}

    q_rows = sorted(
        (r[0], list(r[1]))
        for r in queries.select(
            id_col, F.col(vec_col).cast("array<double>")
        ).collect()
    )
    qt = _quant_np([v for _, v in q_rows]).T  # dim × nq
    qn = np.sqrt((qt * qt).sum(axis=0))
    qids = [i for i, _ in q_rows]
    s_q = (qt.T @ ct) / (qn[:, None] * cn[None, :])  # nq × n_cent
    n_q, n_cent = s_q.shape
    probe_bool = np.zeros((n_q, n_cent), dtype=bool)
    for j in range(n_q):
        order = np.lexsort((np.arange(n_cent), -s_q[j]))
        probe_bool[j, order[: min(nprobe, n_cent)]] = True
    probed_cents = sorted(
        cent_ids[i] for i in np.flatnonzero(probe_bool.any(axis=0))
    )

    # read_index_cells unions any stream-appended cells; the cent_id
    # predicate prunes partitions on BOTH layouts
    cells = read_index_cells(spark, index_dir).filter(
        F.col("cent_id").isin(probed_cents) & (F.col("qn2") > 0)
    )
    id_type = dict(cells.dtypes)[id_col]
    schema = f"query_id {id_type}, cand_id {id_type}, score double"

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["qv"]]
            )
            cn_r = np.sqrt(pdf["qn2"].to_numpy().astype(np.float64))
            cent_idx = np.array(
                [cent_pos[int(x)] for x in pdf["cent_id"]], dtype=np.int64
            )
            cids_b = pdf[id_col].to_numpy()
            out_q, out_c, out_s = [], [], []
            for j, qid in enumerate(qids):
                m = probe_bool[j][cent_idx] & (cids_b != qid)
                if not m.any():
                    continue
                idx = np.flatnonzero(m)
                sc = (c[idx] @ qt[:, j]) / (cn_r[idx] * qn[j])
                take = np.lexsort((cids_b[idx], -sc))[:k]
                out_q.extend([qid] * len(take))
                out_c.extend(cids_b[idx][take])
                out_s.extend(sc[take])
            if out_q:
                yield pd.DataFrame(
                    {"query_id": out_q, "cand_id": out_c, "score": out_s}
                )

    scored = cells.select(id_col, "qv", "qn2", "cent_id").mapInPandas(
        scan, schema
    )
    top = topk_per_group(
        scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k
    )
    return top.select(
        "query_id", "cand_id", F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Persisted IVF-PQ: coarse cells partition the layout, PQ codes compress
# what's stored — the standard billion-vector serving layout (FAISS
# IVF-PQ) with the build paid once.
# ---------------------------------------------------------------------------


def ivfpq_index_build(
    corpus: DataFrame,
    index_dir: str,
    books,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    codebook: DataFrame | CentroidRows | None = None,
) -> dict:
    """Build the persisted IVF-PQ index: ONE corpus scan runs the fused
    assignment + PQ-encoding kernel (`pq.assign_encode_kernel` — the
    vector crosses the Arrow boundary once), then one clustering
    shuffle writes `(id, codes)` cells partitioned by ``cent_id``.
    Stored bytes per vector: m codes (~m bytes) instead of dim floats —
    the scan-volume win at serve time. The PQ codebooks are persisted
    WITH the index so serving always scores codes with the books that
    encoded them (training is a float fixpoint; a retrained book must
    not meet old codes)."""
    spark = corpus.sparkSession
    rows = _resolve_centroids(corpus, codebook, n_centroids, id_col, vec_col)
    cells = _pq_cells_frame(corpus, rows, books, dim, id_col, vec_col)
    with _index_lock(index_dir, spark):
        # rebuild-after-stream + crashed-delete repair, exactly as in
        # ivf_index_build: the full corpus scan already contains any
        # streamed vectors, so the PQ staging/ledger/high-water and any
        # delete debris are cleared before the manifest commit point
        for staging in ("cells_pq_stream", "applied_batches_pq"):
            _st_rmtree(os.path.join(index_dir, staging), spark)
        _st_unlink(
            _high_water_path(index_dir, "compacted_through_pq"), spark
        )
        _clear_delete_debris(index_dir, "cells_pq", spark)
        cells.repartition(
            max(1, int(n_centroids)), "cent_id"
        ).write.partitionBy("cent_id").mode("overwrite").parquet(
            os.path.join(index_dir, "cells_pq")
        )
        # driver-small artifacts: one file each (see ivf_index_build)
        spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in rows],
            "cent_id int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            _centroids_path(index_dir, "pq")
        )
        spark.createDataFrame(
            [
                (j, c, [float(x) for x in books[j][c]])
                for j in range(len(books))
                for c in range(len(books[j]))
            ],
            "subspace int, code int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "books")
        )
        n, fp = _corpus_stats(corpus, id_col, vec_col)
        manifest = {
            "n_rows": n, "fingerprint": fp, "n_centroids": int(n_centroids),
            "dim": dim, "codebook_fp": _codebook_fp(rows),
        }
        _write_manifest(spark, index_dir, manifest, "pq")
    return manifest


def ivfpq_index_ensure(
    corpus: DataFrame,
    index_dir: str,
    books_factory,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    codebook: DataFrame | CentroidRows | None = None,
    m: int | None = None,
    k: int | None = None,
) -> str:
    """Build iff absent/stale. ``books_factory`` is called ONLY when a
    build actually runs (PQ training is the expensive step — a fresh
    index must not pay it). Pass ``m``/``k`` to also invalidate when
    the stored books' shape differs from what the caller's factory
    would train (the factory itself can't be consulted without paying
    the training)."""
    spark = corpus.sparkSession
    # ONE manifest read covers existence, layout (the PQ manifest is
    # written only by the PQ build) and the stored dim; corpus parity
    # and books shape follow
    fresh = False
    try:
        if _st_exists(
            os.path.join(index_dir, "cells_pq.delete_intent"), spark
        ):
            raise ValueError("pending crashed delete — mid-surgery, "
                             "rebuild repairs (see ivf_index_is_fresh)")
        mrow = _read_manifest(spark, index_dir, "pq")
        if int(mrow["dim"]) == int(dim) and int(
            mrow["n_centroids"]
        ) == int(n_centroids):
            n, fp = _corpus_stats(corpus, id_col, vec_col)
            fresh = (int(mrow["n_rows"]), int(mrow["fingerprint"])) == (n, fp)
        if fresh and codebook is not None:
            # retrained coarse centroids over an unchanged corpus must
            # invalidate — the stored codes were assigned under the old
            # geometry (same rule as ivf_index_is_fresh)
            fresh = int(mrow.asDict().get("codebook_fp") or 0) == _codebook_fp(
                _resolve_centroids(
                    corpus, codebook, n_centroids, id_col, vec_col
                )
            )
        if fresh and (m is not None or k is not None):
            books, _ = _load_books(spark, index_dir, dim)
            if m is not None and len(books) != m:
                fresh = False
            if k is not None and books and len(books[0]) != k:
                fresh = False
    except Exception:
        fresh = False
    if not fresh:
        ivfpq_index_build(
            corpus, index_dir, books_factory(), n_centroids,
            id_col, vec_col, dim, codebook,
        )
    return index_dir


def ivfpq_persisted_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve IVF-PQ top-k from the persisted layout: probe selection and
    per-query ADC LUTs are computed driver-side from the STORED
    codebooks (`pq.probe_luts` — same math as the in-query path), the
    probed-cell union prunes the `cells_pq` scan at the parquet source,
    and scoring is m codegen'd `element_at` lookups per row over the
    stored codes — no embedding is ever read at serve time."""
    from .pq import _adc_score, _rank_topk, probe_luts
    from .similarity import has_quant_direction

    # zero-direction queries excluded — see pq.pq_adc_topk (round 7)
    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    rows = _load_centroids(spark, index_dir, "pq")
    books, dim = _load_books(spark, index_dir)

    q_rows = queries.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    lut_rows = probe_luts(rows, books, q_rows, nprobe, dim, id_col)
    probed = sorted({r[1] for r in lut_rows})
    # read_index_cells_pq: streamed codes are servable before the fold;
    # the cent_id predicate prunes partitions on BOTH layouts
    cells = read_index_cells_pq(spark, index_dir).filter(
        F.col("cent_id").isin(probed)  # partition pruning
    )
    id_type = dict(cells.dtypes)["cand_id"]  # not hard-coded: string ids work
    q_lut = spark.createDataFrame(
        lut_rows,
        f"query_id {id_type}, cent_id INT, q_norm DOUBLE,"
        " dot_lut ARRAY<ARRAY<DOUBLE>>",
    )
    scored = (
        cells.join(F.broadcast(q_lut), "cent_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", _adc_score(books).alias("score"))
    )
    return _rank_topk(scored, k)


def ivf_index_append(
    corpus_delta: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental maintenance: assign + quantize ONLY the new vectors
    against the index's STORED centroids and append them to their
    cells; the existing corpus is never rescanned or rewritten. The
    manifest advances by the delta's (count, content hash; the
    fingerprint is additive over rows) — so a subsequent
    `ivf_index_ensure` over the grown corpus sees a fresh index.

    At 100 TB this is the difference between an O(delta) nightly append
    and an O(corpus) rebuild; rebuild only when the codebook itself
    must move (centroid drift), which the content-addressed manifest
    does NOT hide — codebook choice is the caller's policy.

    Serve-path equivalence with a from-scratch build over the union
    corpus (same centroids) is test-pinned: append order cannot change
    results because scoring is per-row and the final top-k orders by
    the strict (score desc, cand_id asc) key.
    """
    spark = corpus_delta.sparkSession
    with _index_lock(index_dir, spark):
        # manifest is read INSIDE the lock: a concurrent append/stream
        # batch that just advanced it is fully visible, never a stale
        # parent (the CAS discipline from the module docstring)
        prev = _read_manifest(spark, index_dir, "ivf")
        int(prev["fingerprint"])  # reject pre-fingerprint layouts up front
        _require_no_pending_delete(spark, index_dir, "cells")
        _check_cells_parity(spark, index_dir, "cells", int(prev["n_rows"]))
        rows = _load_centroids(spark, index_dir)
        # same widening as streaming_index_append: a one-file delta
        # arrives as ~1 scan partition, which would run the
        # compute-dense assignment kernel and the fingerprint fold on
        # one core; the cache keeps the source read to one pass across
        # the cells write and the stats aggregate (the fingerprint is
        # order-independent, unchanged by the round-robin shuffle)
        delta = corpus_delta.repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        try:
            cells = _quant_cells_frame(delta, rows, id_col, vec_col)
            cells.repartition(max(1, len(rows)), "cent_id").write.partitionBy(
                "cent_id"
            ).mode("append").parquet(os.path.join(index_dir, "cells"))
            dn, dfp = _corpus_stats(delta, id_col, vec_col)
        finally:
            delta.unpersist()
        manifest = {
            "n_rows": int(prev["n_rows"]) + dn,
            "fingerprint": (int(prev["fingerprint"]) + dfp) % _FP_MOD,
            "n_centroids": int(prev["n_centroids"]),
            "dim": int(prev["dim"]),
            "codebook_fp": int(prev.asDict().get("codebook_fp") or 0),
        }
        _write_manifest(spark, index_dir, manifest, "ivf")
    return manifest


def _require_no_pending_delete(
    spark: SparkSession, index_dir: str, cells_name: str
) -> None:
    """Append/compact guard: a crashed delete that stopped BEFORE its
    first swap leaves cells == manifest, so the parity guard alone
    would let an append (or a compaction fold) write rows into the
    very partitions the delete retry's committed staging then swaps
    away — silently dropping the new rows and committing a manifest
    computed before they existed. Mutators other than the delete
    retry itself therefore refuse while an intent marker is pending."""
    intent = os.path.join(index_dir, f"{cells_name}.delete_intent")
    if _st_exists(intent, spark):
        raise RuntimeError(
            f"index {index_dir!r} has a pending crashed delete on "
            f"{cells_name} ({intent}): retry ivf[pq]_index_delete with "
            "the ORIGINAL id set to converge it (its staged rows would "
            "swap away anything written now), or rebuild the index."
        )


def _check_cells_parity(
    spark: SparkSession, index_dir: str, cells_name: str, manifest_rows: int
) -> None:
    """Half-applied-delta guard for the append paths: a crash AFTER the
    mode('append') cells write but BEFORE the manifest advance leaves
    cells rows the manifest doesn't account for; a blind retry would
    append the delta AGAIN and the duplicates would be permanently
    invisible (freshness compares manifest↔corpus, never manifest↔
    cells). Appends therefore verify cells row count == manifest row
    count up front and fail LOUDLY on drift with the repair (rebuild).
    Cost: a zero-column parquet count over the cells — footer-bound,
    O(files), not O(bytes)."""
    actual = spark.read.parquet(os.path.join(index_dir, cells_name)).count()
    if int(actual) != int(manifest_rows):
        raise RuntimeError(
            f"{cells_name} holds {actual} rows but the manifest records "
            f"{manifest_rows} — a previous append crashed between the "
            "cells write and the manifest advance. Rebuild the index "
            "(ivf[pq]_index_build) over the full corpus to repair; "
            "appending now would duplicate the half-applied delta."
        )


def ann_join_persisted(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN JOIN served from the persisted index — the full-table query
    shape (`similarity.ann_join_ivf`) with the corpus side's assignment
    and quantization already paid by the build.

    Query rows take their nprobe buckets IN-ROW against the stored
    codebook (JVM probe explosion, no collect of the query side); the
    bucket meeting is the same cogroup as `ann_join_ivf`, except the
    left side streams STORED `(qv, qn2)` integers out of the cells
    layout instead of re-quantizing raw vectors. Bit-identical to
    `ann_join_ivf` with the stored codebook (same assignment kernel at
    build time, same integer scores, same strict top-k order) —
    test-pinned.
    """
    from ..operators.sorts import topk_per_group
    from .similarity import has_quant_direction, probe_rows_kernel

    # zero-direction exclusion (round 7): a zero query crashed the
    # probe-selection expression under ANSI (divide by zero norm —
    # same defect as ann_join_ivf); stored zero candidates drop by
    # their stored integer norm. Keeps this path bit-identical to
    # ann_join_ivf with the stored codebook.
    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    rows = _load_centroids(spark, index_dir)

    # round 12 (guide §4.2): probe selection in the Arrow kernel — see
    # probe_rows_kernel (bit-identical probe sets; the JVM explosion it
    # replaces is interpreted per row)
    probes = probe_rows_kernel(queries, rows, nprobe, id_col, vec_col)

    cells = read_index_cells(spark, index_dir).filter(
        F.col("qn2") > 0
    ).select(
        F.col(id_col).alias("cand_id"), "qv", "qn2", "cent_id"
    )
    id_type = dict(cells.dtypes)["cand_id"]
    schema = f"query_id {id_type}, cand_id {id_type}, score double"

    def score_bucket(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "cand_id": [], "score": []})
        C = np.stack([np.asarray(v, dtype=np.float64) for v in left["qv"]])
        cn = np.sqrt(left["qn2"].to_numpy().astype(np.float64))
        Q = _quant_np(right["q_vec"])
        qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
        sc = (Q @ C.T) / (qn[:, None] * cn[None, :])
        cids = left["cand_id"].to_numpy()
        qids = right["query_id"].to_numpy()
        out_q, out_c, out_s = [], [], []
        for j in range(len(qids)):
            m = cids != qids[j]
            if not m.any():
                continue
            idx = np.flatnonzero(m)
            take = idx[np.lexsort((cids[idx], -sc[j, idx]))[:k]]
            out_q.extend([qids[j]] * len(take))
            out_c.extend(cids[take])
            out_s.extend(sc[j, take])
        return pd.DataFrame(
            {"query_id": out_q, "cand_id": out_c, "score": out_s}
        )

    scored = (
        cells.groupby("cent_id")
        .cogroup(probes.groupby("cent_id"))
        .applyInPandas(score_bucket, schema)
    )
    top = topk_per_group(
        scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k
    )
    return top.select(
        "query_id", "cand_id", F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def ann_join_ivfpq_persisted(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN JOIN served from the persisted IVF-PQ layout — the
    full-table query shape over COMPRESSED cells: every query row finds
    its top-k ADC neighbors without the query side ever being
    collected, and without any embedding being read at serve time (the
    scan is m code-bytes per candidate, the 100 TB win of the PQ
    layout).

    `ivfpq_persisted_topk` deliberately treats queries as bounded
    (driver-side probe_luts + broadcast); that shape dies when
    |Q| ≈ |corpus|. Here BOTH sides stay distributed, mirroring
    `ann_join_persisted`: query rows take their nprobe probe buckets
    IN-ROW against the stored coarse codebook (JVM probe explosion —
    same quantized-cosine ranking as `pq.probe_luts`, exact by integer
    arithmetic in float64), and the bucket meeting is a cogroup whose
    kernel replays `pq._adc_score`'s float64 math exactly: per-query
    dot LUTs built with the same per-subspace gemv as `pq._query_lut`
    (identical operands, list-boxing skipped), subspace terms
    accumulated in ascending-j left-associated order,
    score = dot / (q_norm · sqrt(Σ nrm)) — so results are
    BIT-IDENTICAL to `ivfpq_persisted_topk` on the same (queries, k,
    nprobe), which is test-pinned. Local bucket top-k is exact because
    a candidate lives in exactly one bucket.

    Scale shape: the codes cells shuffle once by cent_id (m bytes +
    id per row — compare ann_join_persisted's dim integers), probe
    rows nprobe·|Q|; per-bucket work is Q_b·m gathers over C_b codes
    (one LUT row indexed per subspace), with the per-query LUT build
    itself only dim·k flops. Zero-direction queries are excluded like
    every cosine entry point; zero-direction CANDIDATES are
    unrecoverable from codes alone (documented PQ caveat — the decoded
    centroids of a zero vector are cluster means, which are nonzero on
    any real corpus) and score like the in-query path.
    """
    from ..operators.sorts import topk_per_group
    from .pq import _slices
    from .similarity import (
        _quant_codebook,
        _quant_np,
        has_quant_direction,
    )

    queries = queries.filter(has_quant_direction(F.col(vec_col)))
    rows = _load_centroids(spark, index_dir, "pq")
    # codebooks as float64 matrices + per-(subspace, code) squared-norm
    # table (the norm_lut literal of pq._adc_score) — converted ONCE
    # per books CONTENT (file-signature memo) and closed over;
    # re-collecting + re-converting per call was the measured bulk of
    # this op's 0.66 s driver prologue (round 8)
    books, books_mats, norm_mat = _load_books_np(spark, index_dir)
    m = len(books)
    # the stored per-subspace widths ARE _slices(dim, m) — each book
    # centroid was trained on its _slices window, so rebuilding the
    # boundaries from the widths reconstructs the encode-time slices
    # exactly without a manifest read
    dim = sum(len(b[0]) for b in books)
    slices = _slices(dim, m)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )

    # Round-11 (guide §4.2): each query's dot LUT is built ONCE, in a
    # row-local kernel BEFORE the probe explosion, instead of once per
    # probed bucket inside the cogroup — the per-(query, subspace) gemv
    # is the bucket kernel's dominant Python-loop cost and every query
    # used to pay it nprobe times. Identical operands → identical bits
    # (`pq._query_lut`'s gemv, the pinned reference); probe rows now
    # carry the m×k LUT (m·k doubles vs dim — LUT bytes shipped
    # nprobe-wide once is the same trade `srp_near_dup` documents for
    # its quantized vectors). Measured at sf0.1: 1.11 → 0.77 s median,
    # identical rows.
    #
    # Round 12 (guide §4.2 again): the COARSE probe selection is fused
    # into the same kernel — the JVM quant_vec/qnorm columns and the
    # interpreted centroid_scores + array_sort + slice chain are gone;
    # the kernel scores the quantized query against the coarse codebook
    # (exact-integer arithmetic, the probe_rows_kernel math) and emits
    # ONE row per query carrying its probe-cid ARRAY — the nprobe
    # fan-out stays a JVM explode, because emitting nprobe Python rows
    # each carrying the m×k LUT measured +25% (Arrow-serializing the
    # LUT nprobe times; the codegen'd explode duplicates it for free
    # inside the exchange). Same probe sets, same LUT bits, one Python
    # crossing for both jobs.
    kbook = len(books_mats[0])
    qrows = _quant_codebook(rows)
    coarse_cids = np.array([c for c, _, _ in qrows], dtype=np.int64)
    coarse_ct = np.array([qv for _, qv, _ in qrows], dtype=np.float64).T
    coarse_cn = np.array([n for _, _, n in qrows])

    def lut_probe_rows(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qq = _quant_np(pdf["q_vec"])
            s = (qq @ coarse_ct) / (
                np.sqrt(np.einsum("ij,ij->i", qq, qq))[:, None]
                * coarse_cn[None, :]
            )
            order = np.lexsort(
                (np.broadcast_to(coarse_cids, s.shape), -s), axis=-1
            )[:, :nprobe]
            luts, qns = [], []
            for v in pdf["q_vec"]:
                qv = np.asarray(v, dtype=np.float64)
                lut = np.empty((m, kbook))
                for j, (lo, hi) in enumerate(slices):
                    lut[j, :] = books_mats[j] @ qv[lo:hi]
                luts.append(lut.ravel())
                qns.append(float(np.sqrt(np.dot(qv, qv))))
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "lut": luts,
                    "qn": np.asarray(qns),
                    "pcids": list(coarse_cids[order].astype("int32")),
                }
            )

    qlut = q.mapInPandas(
        lut_probe_rows,
        "query_id long, lut array<double>, qn double, pcids array<int>",
    )
    probes = qlut.select(
        "query_id", "lut", "qn", F.explode("pcids").alias("cent_id")
    )

    cells = read_index_cells_pq(spark, index_dir).select(
        "cand_id", "codes", "cent_id"
    )
    id_type = dict(cells.dtypes)["cand_id"]
    schema = f"query_id {id_type}, cand_id {id_type}, score double"

    def score_bucket(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "cand_id": [], "score": []})
        codes = np.stack(
            [np.asarray(c, dtype=np.int64) for c in left["codes"]]
        )  # C × m
        cids = left["cand_id"].to_numpy()
        # reconstructed squared norms: ascending-j left-assoc adds, the
        # exact accumulation _adc_score's nrm_expr performs
        nrm = None
        for j in range(m):
            nj = norm_mat[j][codes[:, j]]
            nrm = nj if nrm is None else nrm + nj
        denom_c = np.sqrt(nrm)
        # LUTs arrive PRECOMPUTED on the probe rows (round 11 — built
        # once per query upstream with the SAME per-(query, subspace)
        # gemv pq._query_lut performs; identical operands → identical
        # bits): reshape into the Q × m × k tensor. The gather then
        # runs once per SUBSPACE (Q × C fancy index), not once per
        # (query, subspace) — ascending-j left-assoc accumulation per
        # element, so the bits match _adc_score's scalar form.
        lut3 = np.stack(
            [
                np.asarray(l, dtype=np.float64).reshape(m, kbook)
                for l in right["lut"]
            ]
        )
        q_norms = right["qn"].to_numpy()
        dot = None
        for j in range(m):
            dj = lut3[:, j, :][:, codes[:, j]]  # Q × C
            dot = dj if dot is None else dot + dj
        sc_all = dot / (q_norms[:, None] * denom_c[None, :])
        qids = right["query_id"].to_numpy()
        out_q, out_c, out_s = [], [], []
        for qi in range(len(qids)):
            qid, sc = qids[qi], sc_all[qi]
            mask = cids != qid
            if not mask.any():
                continue
            idx = np.flatnonzero(mask)
            take = idx[np.lexsort((cids[idx], -sc[idx]))[:k]]
            out_q.extend([qid] * len(take))
            out_c.extend(cids[take])
            out_s.extend(sc[take])
        return pd.DataFrame(
            {"query_id": out_q, "cand_id": out_c, "score": out_s}
        )

    scored = (
        cells.groupby("cent_id")
        .cogroup(probes.groupby("cent_id"))
        .applyInPandas(score_bucket, schema)
    )
    top = topk_per_group(
        scored, ["query_id"], [F.desc("score"), F.col("cand_id")], k
    )
    return top.select(
        "query_id", "cand_id", F.round("score", 8).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def ivfpq_index_append(
    corpus_delta: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Grow-by-append for the IVF-PQ layout: the delta is assigned and
    PQ-encoded against the STORED centroids and STORED books (never a
    retrained book — old codes and new codes must share their decoder),
    appended to `cells_pq`, and the manifest advances. O(delta), like
    `ivf_index_append`."""
    spark = corpus_delta.sparkSession
    with _index_lock(index_dir, spark):
        # manifest inside the lock + half-applied guard — see
        # ivf_index_append
        prev = _read_manifest(spark, index_dir, "pq")
        int(prev["fingerprint"])
        _require_no_pending_delete(spark, index_dir, "cells_pq")
        _check_cells_parity(spark, index_dir, "cells_pq", int(prev["n_rows"]))
        dim = int(prev["dim"])
        rows = _load_centroids(spark, index_dir, "pq")
        books, dim = _load_books(spark, index_dir, dim)
        # widen + single-read, as in ivf_index_append
        delta = corpus_delta.repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        try:
            cells = _pq_cells_frame(
                delta, rows, books, dim, id_col, vec_col
            )
            cells.repartition(max(1, len(rows)), "cent_id").write.partitionBy(
                "cent_id"
            ).mode("append").parquet(os.path.join(index_dir, "cells_pq"))
            dn, dfp = _corpus_stats(delta, id_col, vec_col)
        finally:
            delta.unpersist()
        manifest = {
            "n_rows": int(prev["n_rows"]) + dn,
            "fingerprint": (int(prev["fingerprint"]) + dfp) % _FP_MOD,
            "n_centroids": int(prev["n_centroids"]),
            "dim": dim,
            "codebook_fp": int(prev.asDict().get("codebook_fp") or 0),
        }
        _write_manifest(spark, index_dir, manifest, "pq")
    return manifest


def streaming_index_append(index_dir: str, id_col: str = "vec_id",
                           vec_col: str = "embedding"):
    """foreachBatch sink that streams NEW vectors into a persisted IVF
    index — the serving layer fed by the streaming spine.

    Each micro-batch assigns its vectors against the STORED centroids
    (O(batch), the `ivf_index_append` math) and stages them under
    ``cells_stream/__stream_batch=<id>/cent_id=<c>/``. Exactly-once
    across restarts without any non-idempotent step:

    1. the per-batch ledger (``applied_batches``, partitioned by
       batch_id) is checked — an already-committed batch returns
       immediately;
    2. the batch's cells land in ITS OWN ``__stream_batch`` partition
       via dynamic partition overwrite — a replay after a crash
       replaces that partition instead of duplicating rows;
    3. the ledger row (batch_id, rows, fingerprint delta) is written
       LAST, also dynamic-overwrite — the commit point.

    A crash between any two steps replays the batch and every step
    redoes idempotently. The base ``manifest_ivf`` is NOT mutated — it
    keeps describing the batch-built base corpus; the ledger carries
    the streamed extent (Σ rows / fingerprint deltas), and serve paths
    see streamed vectors through `read_index_cells`.

    Across a compaction the ledger is gone (the fold consumed it), so
    idempotency for batches the fold already moved into the base is
    carried by the ``compacted_through`` high-water marker instead:
    ``batch_id <= high-water`` short-circuits exactly like a ledger
    hit. This closes the replay window a graceful stop leaves open
    (sink commit and checkpoint commit are not atomic — the last
    pre-compaction batch can re-fire on restart of the SAME stream).
    Corollary: after a compaction, resume the SAME checkpoint; a FRESH
    stream (batch ids restarting at 0) must first reset the lifecycle
    via `ivf_index_reset_stream` or a rebuild, else its first batches
    would read as already-folded replays.

    Usage::

        q = (vec_stream.writeStream.foreachBatch(
                 streaming_index_append(idx))
             .option("checkpointLocation", ckpt).start())
    """
    return _streaming_append(index_dir, "ivf", id_col, vec_col)


def streaming_pq_index_append(index_dir: str, id_col: str = "vec_id",
                              vec_col: str = "embedding"):
    """foreachBatch sink for the persisted IVF-PQ layout — the
    compressed-cells twin of `streaming_index_append`, riding the SAME
    sink/ledger/high-water machinery (one code path, two layouts).
    Each micro-batch is assigned AND PQ-encoded against the STORED
    coarse centroids and STORED books (never retrained — old codes and
    new codes must share their decoder, the `ivfpq_index_append` rule)
    and staged under ``cells_pq_stream``; its own ledger
    (``applied_batches_pq``) and high-water (``compacted_through_pq``)
    keep the two layouts' stream lifecycles from vouching for each
    other, like their manifests. Serve paths see streamed codes
    through `read_index_cells_pq`; fold with
    `ivfpq_index_compact_stream`; reset with
    `ivfpq_index_reset_stream`. Exactly-once semantics, crash matrix
    and the empty-batch rule: `streaming_index_append`."""
    return _streaming_append(index_dir, "pq", id_col, vec_col)


def _streaming_append(index_dir: str, layout: str, id_col: str,
                      vec_col: str):
    cfg = _STREAM_CFG[layout]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ledger_dir = os.path.join(index_dir, cfg["ledger"])
        # the per-batch lock serializes this micro-batch against a
        # concurrent ivf_index_append (or a second stream) on the same
        # index; the ledger check runs INSIDE it so a batch committed by
        # a racing replica short-circuits here
        with _index_lock(index_dir, spark):
            if _dir_exists(spark, ledger_dir):
                applied = {
                    int(r["batch_id"])
                    for r in spark.read.parquet(ledger_dir).collect()
                }
            else:
                applied = set()
            if int(batch_id) in applied:
                return  # replayed batch — already fully committed
            if int(batch_id) <= _read_high_water(
                index_dir, spark, cfg["high_water"]
            ):
                # replayed across a compaction: the fold consumed this
                # batch's ledger row after moving its rows into the base
                return
            if batch_df.isEmpty():
                # an empty micro-batch stages nothing and records
                # nothing — writing it would create a data-less
                # __stream_batch partition (zero parquet files) that
                # schema inference chokes on at fold time, plus a
                # zero-extent ledger row. Replay-safe to skip entirely:
                # emptiness is a deterministic function of the source
                # offsets, so a replay of this batch is empty too.
                return
            if layout == "ivf":
                rows = _load_centroids(spark, index_dir)

                def make_cells(b: DataFrame) -> DataFrame:
                    return _quant_cells_frame(b, rows, id_col, vec_col)
            else:
                dim = int(_read_manifest(spark, index_dir, "pq")["dim"])
                rows = _load_centroids(spark, index_dir, "pq")
                books, dim = _load_books(spark, index_dir, dim)

                def make_cells(b: DataFrame) -> DataFrame:
                    return _pq_cells_frame(
                        b, rows, books, dim, id_col, vec_col
                    )
            # a file-source micro-batch often arrives as ONE input
            # partition (a single ~maxPartitionBytes file per trigger),
            # which would run the compute-dense assignment kernel and
            # the fingerprint aggregate on a single core — measured
            # 15 s/batch vs 5 s at 125k x 64 on local[32]. Widen to
            # default parallelism (work-based width, same lesson as
            # the SRP bucket exchange) and cache across the two passes
            # so the source is read once; the fingerprint is an
            # order-independent additive fold, so the round-robin
            # shuffle cannot change it.
            batch = batch_df.repartition(
                spark.sparkContext.defaultParallelism
            ).persist()
            try:
                cells = make_cells(batch)
                (
                    cells.withColumn("__stream_batch", F.lit(int(batch_id)))
                    .repartition(max(1, len(rows)), "cent_id")
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__stream_batch", "cent_id")
                    .parquet(os.path.join(index_dir, cfg["staging"]))
                )
                dn, dfp = _corpus_stats(batch, id_col, vec_col)
            finally:
                batch.unpersist()
            (
                spark.createDataFrame(
                    [(int(batch_id), dn, dfp)],
                    "batch_id long, n_rows long, fingerprint_delta long",
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(ledger_dir)
            )

    return apply_batch


def ivf_index_compact_stream(
    spark: SparkSession, index_dir: str
) -> dict | None:
    """Fold stream-staged cells into the base layout — O(streamed), not
    O(corpus).

    A long-running ingest stream leaves one ``__stream_batch``
    partition per micro-batch under ``cells_stream`` (thousands of
    small files after a day of batches), and every serve pays their
    file-open/footer costs. A full rebuild folds them but rescans the
    whole corpus; this op moves ONLY the staged rows (one clustering
    shuffle of the streamed delta into the base cells) and advances the
    manifest by the ledger's recorded extent — the staged data itself is
    never re-fingerprinted, the ledger already carries each batch's
    (rows, fingerprint delta) from commit time.

    Crash-safe sequencing under the index write lock, in double-serve-
    impossible order (every rerun either completes the fold or fails
    loudly — never silently duplicates):

    1. rename ``cells_stream`` → ``cells_stream.folding`` — from this
       instant serve paths see base cells only (staged rows are briefly
       invisible: a compaction-window read serves the pre-compaction
       base, never duplicates);
    2. parity-check cells == manifest, then append the staged rows into
       ``cells/`` and drop an ``.appended`` marker in the folding dir;
    3. advance the manifest by the ledger totals — idempotent: a rerun
       compares the manifest against the post-append cells count and
       only advances if it still describes the pre-fold base;
    4. record the highest folded batch_id in the ``compacted_through``
       high-water marker (rename-committed), so a micro-batch replayed
       by the stream AFTER the ledger disappears still short-circuits
       in `streaming_index_append` (graceful stop does not guarantee
       the last batch won't re-fire — sink and checkpoint commits are
       not atomic);
    5. remove the LEDGER, then the folding dir. Ledger first: it is the
       dangerous artifact — a crash that left the ledger behind with no
       staging would otherwise make a later fresh stream silently skip
       its first batches as "already applied". A leftover folding dir
       without a ledger just re-converges through the marker path on
       the next run.

    Rerun-after-crash matrix: a crash INSIDE step 1's rename on a
    copy+delete store (S3A) leaves both dirs — healed at entry by file
    count: src >= dst means the copy phase was still running (source
    authoritative — drop dst, re-rename), dst > src means deletes began
    (destination authoritative — drop the source remnant); correct for
    every copy-then-delete interleaving because a source key is deleted
    only after its copy. Before the marker, the parity guard
    either passes (nothing appended — redo) or fails loudly (partial
    append — rebuild repairs); after the marker, the append is skipped
    and steps 3-5 re-run idempotently. A crash in the step-5 window is
    additionally healed by the nothing-staged path below, which folds
    any ORPHANED ledger (ledger rows with no staging — only that crash
    window produces one) into the high-water and deletes it instead of
    leaving it to poison a future stream. Run with the ingest stream
    STOPPED; resume the SAME checkpoint afterwards (a fresh checkpoint
    needs `ivf_index_reset_stream` first — see
    `streaming_index_append`).

    Returns the advanced manifest, or None if there was nothing staged.
    """
    return _compact_stream(spark, index_dir, "ivf")


def ivfpq_index_compact_stream(
    spark: SparkSession, index_dir: str
) -> dict | None:
    """Fold the IVF-PQ layout's stream staging (``cells_pq_stream``)
    into ``cells_pq`` — the compressed-cells twin of
    `ivf_index_compact_stream`, riding the SAME fold/heal machinery
    over the PQ layout's own staging/ledger/high-water names and the
    ``manifest_pq``. Semantics, crash matrix and the
    stop-the-stream/resume-same-checkpoint contract are identical."""
    return _compact_stream(spark, index_dir, "pq")


def _compact_stream(
    spark: SparkSession, index_dir: str, layout: str
) -> dict | None:
    cfg = _STREAM_CFG[layout]
    with _index_lock(index_dir, spark):
        # the fold appends into base cells — the same write a pending
        # crashed delete's retry would swap away (see
        # _require_no_pending_delete); converge the delete first
        _require_no_pending_delete(spark, index_dir, cfg["cells"])
        stream_dir = os.path.join(index_dir, cfg["staging"])
        folding = stream_dir + ".folding"
        ledger_dir = os.path.join(index_dir, cfg["ledger"])
        if _st_exists(stream_dir, spark) and _st_exists(folding, spark):
            # CRASHED NON-ATOMIC RENAME heal (S3A renames are per-object
            # copy THEN delete — a crash inside step 1 leaves both dirs).
            # Whichever side holds >= files is authoritative: the delete
            # phase removes a source key only AFTER copying it, so
            # src >= dst means the copy phase was still running (src
            # complete, dst partial — or both complete at the boundary,
            # identical content either way) and dst > src means deletes
            # began (dst complete). Object PUTs are atomic, so every
            # present file is whole — file COUNT is the right granularity.
            # (A live stream recreating cells_stream mid-fold violates
            # the stop-the-stream contract; if it happens anyway, the
            # ledger/cells parity check below fails loudly rather than
            # silently dropping the batch.)
            src_n = _st_count_files(stream_dir, spark)
            dst_n = _st_count_files(folding, spark)
            if src_n >= dst_n:
                _st_rmtree(folding, spark)
                _st_rename(stream_dir, folding, spark)
            else:
                _st_rmtree(stream_dir, spark)
        elif _st_exists(stream_dir, spark):
            _st_rename(stream_dir, folding, spark)
        if (
            _st_exists(folding, spark)
            and not _st_exists(os.path.join(folding, ".appended"), spark)
            and _st_count_files(folding, spark, suffix=".parquet") == 0
        ):
            # UN-appended staging with no DATA files — every batch
            # since the last fold was empty (the sink now skips those,
            # but pre-fix streams left this shape) or a crash landed
            # before any data file: nothing to fold. Drop it and fall
            # through to the orphaned-ledger path, which promotes any
            # committed batch ids into the high-water. Reading it
            # instead would die on schema inference. A folding WITH
            # the .appended marker is exempt regardless of content —
            # the marker-present path never reads it, only replays
            # steps 3-5.
            _st_rmtree(folding, spark)
        if not _st_exists(folding, spark):
            if _st_exists(ledger_dir, spark):
                # orphaned ledger (ledger rows, no staging). Provenance
                # audit: step 5 removes the ledger FIRST, so compaction
                # itself can no longer produce one; reset_stream also
                # deletes ledger-first. The remaining producers are a
                # pre-round-6 compaction crash (batches WERE folded —
                # promotion correct) and a crashed rebuild's cleanup
                # (batches ARE in the new base via the full corpus
                # scan, and the stale manifest forces a repair rebuild
                # that clears this marker anyway). In both, the
                # batches' rows live in the base — promote to the
                # high-water, then clear.
                lrows = spark.read.parquet(ledger_dir).collect()
                if lrows:
                    _write_high_water(
                        index_dir,
                        max(
                            max(int(r["batch_id"]) for r in lrows),
                            _read_high_water(
                                index_dir, spark, cfg["high_water"]
                            ),
                        ),
                        spark,
                        cfg["high_water"],
                    )
                _st_rmtree(ledger_dir, spark)
            return None  # nothing staged
        marker = os.path.join(folding, ".appended")
        prev = _read_manifest(spark, index_dir, layout)
        if _st_exists(ledger_dir, spark):
            lrows = spark.read.parquet(ledger_dir).collect()
            committed = [int(r["batch_id"]) for r in lrows]
            dn = sum(int(r["n_rows"]) for r in lrows)
            dfp = sum(int(r["fingerprint_delta"]) for r in lrows) % _FP_MOD
        else:
            committed, dn, dfp = [], 0, 0
        if not _st_exists(marker, spark):
            _check_cells_parity(
                spark, index_dir, cfg["cells"], int(prev["n_rows"])
            )
            # fold ONLY ledger-committed batches: a partition from a
            # batch that crashed before its ledger row belongs to the
            # stream's replay (dynamic overwrite on restart), not to
            # the base — it is dropped with the staging dir
            staged = (
                spark.read.parquet(folding)
                .filter(F.col("__stream_batch").isin(committed))
                .drop("__stream_batch")
            )
            n_cent = max(1, int(prev["n_centroids"]))
            staged.repartition(n_cent, "cent_id").write.partitionBy(
                "cent_id"
            ).mode("append").parquet(os.path.join(index_dir, cfg["cells"]))
            _st_touch(marker, "appended", spark)
        cells_count = int(
            spark.read.parquet(
                os.path.join(index_dir, cfg["cells"])
            ).count()
        )
        if int(prev["n_rows"]) == cells_count - dn:
            manifest = {
                "n_rows": int(prev["n_rows"]) + dn,
                "fingerprint": (int(prev["fingerprint"]) + dfp) % _FP_MOD,
                "n_centroids": int(prev["n_centroids"]),
                "dim": int(prev["dim"]),
                "codebook_fp": int(prev.asDict().get("codebook_fp") or 0),
            }
            _write_manifest(spark, index_dir, manifest, layout)
        elif int(prev["n_rows"]) == cells_count:
            manifest = dict(prev.asDict())  # rerun after a 3-4 crash
        else:
            raise RuntimeError(
                f"{cfg['cells']} holds {cells_count} rows; manifest records "
                f"{int(prev['n_rows'])} with a staged extent of {dn} — "
                "an earlier fold or append half-applied. Rebuild the "
                "index (ivf[pq]_index_build) over the full corpus to "
                "repair."
            )
        if committed:
            _write_high_water(
                index_dir,
                max(
                    max(committed),
                    _read_high_water(index_dir, spark, cfg["high_water"]),
                ),
                spark,
                cfg["high_water"],
            )
        # ledger BEFORE folding dir — see docstring step 5
        _st_rmtree(ledger_dir, spark)
        _st_rmtree(folding, spark)
    return manifest


def ivf_index_reset_stream(
    index_dir: str, spark: SparkSession | None = None
) -> None:
    """Reset the streaming lifecycle of an index so a FRESH stream (new
    checkpoint, batch ids restarting at 0) can attach: clears the
    staging cells, the batch ledger and the compaction high-water.

    Without this, a fresh stream against a previously-compacted index
    would have its first ``high-water + 1`` batches silently skipped as
    already-folded replays (`streaming_index_append` cannot distinguish
    a replayed old batch 5 from a fresh stream's new batch 5 — only the
    operator knows which stream is attached). A rebuild performs the
    same reset implicitly. Run with no stream attached.

    Streamed-but-uncompacted vectors are DROPPED by the reset (the
    staging is the only place they live) — run
    `ivf_index_compact_stream` first if they must be kept.

    Crash ordering: the LEDGER goes first. A crash after the ledger's
    removal leaves staging-without-ledger, which serves correctly
    (those vectors are still real index content until the rerun
    finishes) and which a later compact simply discards; the reverse
    order would leave a ledger whose batches were never folded — a
    state the compact-heal would wrongly promote into the high-water,
    silently dropping a fresh stream's first batches."""
    _reset_stream(index_dir, "ivf", spark)


def ivfpq_index_reset_stream(
    index_dir: str, spark: SparkSession | None = None
) -> None:
    """Reset the IVF-PQ layout's streaming lifecycle (staging, ledger,
    high-water) so a fresh stream can attach — the compressed-cells
    twin of `ivf_index_reset_stream`, same semantics and the same
    ledger-first crash ordering."""
    _reset_stream(index_dir, "pq", spark)


def _reset_stream(
    index_dir: str, layout: str, spark: SparkSession | None
) -> None:
    cfg = _STREAM_CFG[layout]
    with _index_lock(index_dir, spark):
        # LEDGER first — see ivf_index_reset_stream's crash ordering
        for staging in (cfg["ledger"], cfg["staging"]):
            _st_rmtree(os.path.join(index_dir, staging), spark)
        _st_unlink(_high_water_path(index_dir, cfg["high_water"]), spark)


def _clear_delete_debris(
    index_dir: str, cells_name: str, spark: SparkSession | None
) -> None:
    """Remove a crashed delete's intent marker and staged rows — called
    by the BUILDS inside their locked section, because a rebuild is the
    documented universal repair and must reset the delete lifecycle the
    way it resets the stream lifecycle: a retry of the crashed delete
    against a rebuilt index would otherwise swap stale staged
    partitions (kept rows of the PRE-rebuild cells) into the new
    layout and then commit the pre-rebuild target manifest over it."""
    _st_unlink(os.path.join(index_dir, f"{cells_name}.delete_intent"), spark)
    _st_rmtree(os.path.join(index_dir, f"{cells_name}.deleting"), spark)


def _delete_ids_frame(
    spark: SparkSession, ids, id_col: str, id_type: str
) -> DataFrame:
    """Normalize the caller's id set — a DataFrame (column ``id_col`` or
    its only column) or a plain iterable — into a distinct single-column
    frame cast to the CELLS' stored id type, so the semi/anti joins
    below never fall into a cast-both-sides plan that defeats pruning.

    An id whose cast FAILS raises instead of vanishing: silently not
    erasing an id the caller asked to erase is the one failure mode a
    right-to-be-forgotten op must never have (an id absent from the
    index is a fine no-op; an id that never got LOOKED UP is not)."""
    if isinstance(ids, DataFrame):
        col = id_col if id_col in ids.columns else ids.columns[0]
        picked = ids.select(
            F.col(col).alias("__raw_id"),
            F.col(col).try_cast(id_type).alias("__del_id"),
        )
        lost = picked.where(
            F.col("__raw_id").isNotNull() & F.col("__del_id").isNull()
        ).limit(3).collect()
        if lost:
            raise ValueError(
                f"delete ids do not cast to the index's stored id type "
                f"{id_type!r} (e.g. {[r['__raw_id'] for r in lost]!r}) — "
                "erasing would silently skip them; pass ids of the "
                "stored type."
            )
        picked = picked.select("__del_id")
    else:
        picked = spark.createDataFrame(
            [(i,) for i in ids], f"__del_id {id_type}"
        )
    return picked.where(F.col("__del_id").isNotNull()).distinct()


def _index_delete(
    spark: SparkSession,
    index_dir: str,
    ids,
    layout: str,
    cells_name: str,
    cell_id_col: str,
    id_col: str,
) -> dict:
    """Shared core of `ivf_index_delete` / `ivfpq_index_delete` —
    targeted erasure from one persisted layout, the index-side twin of
    the lake's right-to-be-forgotten purge (operators/maintenance.py
    `delete_rows`): a GDPR purge that rewrites the lake but leaves the
    user's vectors serving from the ANN index has not erased anything.

    Shape: ONE full scan of the cells finds the hit rows (their count,
    their summed ``row_fp`` — the per-row fingerprint term stored at
    build time exactly so deletes can subtract it — and their cell
    set); then ONLY the affected ``cent_id`` partitions are rewritten.
    O(corpus) read, O(affected cells) write — the same partition-scoped
    rewrite contract as the lake's `delete_rows`. The manifest moves to
    (n_rows − deleted, fingerprint − Σ row_fp mod M), so a subsequent
    `*_ensure` over the purged corpus reads FRESH — delete never forces
    the O(corpus) rebuild it exists to avoid. At 100 TB, if single
    cells outgrow a comfortable rewrite, split cells first (the build's
    repartitionByRange note) — tombstones were rejected deliberately:
    they tax every serve read forever to make the rare delete cheaper,
    and the eventual tombstone-folding compaction IS this rewrite.

    Crash-safe stage-and-swap under the single-writer lock (a direct
    dynamic-partition overwrite would trip Spark's self-read guard and
    give per-partition commit no retry anchor):

    1. write a ``<cells>.delete_intent`` marker recording the ABSOLUTE
       target manifest, the affected/emptied cell lists, the deleted
       count, and a content hash of the id set — the retry anchor. A
       retry MUST present the same ids (hash-checked): the deltas were
       computed against the pre-delete cells and would be wrong for any
       other set.
    2. write the kept rows of affected cells to a ``<cells>.deleting``
       staging dir; commit it with a ``.staged`` marker. Guarded on
       that marker: a retry that finds it SKIPS recompute — after any
       swap in step 3, live cells no longer hold the kept rows of
       swapped partitions, so recomputing here would stage empty
       partitions and lose the survivors.
    3. per affected cell, in either order across cells: drop the old
       partition dir (recorded with a per-cell ``.dropped`` marker in
       the staging dir), then rename the staged one in. Idempotent per
       cell because the staged dir IS the progress record — a swapped
       cell's staging is gone, so a retry skips it; the old dir is
       only dropped while its staged replacement exists. A crashed
       copy+delete rename (S3A) that leaves BOTH dirs is healed by the
       compact fold's file-count rule, made unambiguous by the marker:
       with ``.dropped`` present the destination can only be new
       content, so src >= dst means the copy phase was still running
       (redo the rename) and dst > src means deletes began (dst
       complete — drop the source remnant). Emptied cells (every row
       deleted) just drop. Readers (no lock) can observe a cell
       briefly absent mid-swap — the same bounded invisibility window
       the stream compaction documents, never duplicates and never
       resurrection.
    4. commit the target manifest; 5. clear marker, then staging.
       Every crash point re-converges by rerunning with the same ids:
       before ``.staged`` the recompute is against untouched cells;
       after it, steps 3-5 are pure replays.

    Preconditions (checked, loud): a FIRST attempt refuses while
    stream staging/ledger exist — the hit-scan reads base cells only,
    so ids whose vectors arrived through the stream would silently
    survive in the staging and keep serving (incomplete erasure);
    compact first. A RETRY is exempt (scope fixed at intent time —
    see the code comment; blocking it would deadlock against the
    mutator guard below). Cells must carry ``row_fp`` (pre-round-7
    layouts: rebuild). Cells/manifest parity is verified before any
    mutation. Conversely, while an intent is PENDING the other
    mutators (appends, the compaction fold) refuse
    (`_require_no_pending_delete`) — a pre-swap crash leaves parity
    intact, and anything they wrote into affected partitions would be
    swapped away by the retry's already-committed staging; freshness
    reads stale mid-surgery, so `*_ensure`'s rebuild (which clears
    delete debris) is the self-healing repair path.

    Erasure caveat (documented, not hidden): this removes every STORED
    copy of the vectors (quantized ints / PQ codes). The coarse
    codebook — and PQ books — persist. A kmeans-trained codebook holds
    cluster means (aggregates); but the default first-N-ids codebook
    copies seed vectors VERBATIM, so strict erasure of a seed vector
    requires a rebuild with a retrained or explicitly-seeded codebook.
    """
    import json

    with _index_lock(index_dir, spark):
        intent_path = os.path.join(index_dir, f"{cells_name}.delete_intent")
        intent_txt = _st_read_text(intent_path, spark)
        if intent_txt is None:
            # FIRST attempts refuse while THIS LAYOUT's stream
            # staging exists: the hit-scan reads base cells only, so
            # copies of the ids living in the staging would silently
            # survive and serve — incomplete erasure, the one failure
            # a GDPR op must never have. Each layout checks only its
            # OWN staging/ledger (they are disjoint by name, like the
            # manifests), so e.g. a PQ delete proceeds alongside an
            # IVF stream. A RETRY (intent on disk) is exempt: its
            # scope was fixed at intent time, when no staging existed
            # — batches that arrived after the crash are new data, not
            # missed erasure targets — and blocking it would deadlock
            # (compact refuses under a pending delete, the retry would
            # refuse under the ledger).
            lcfg = _STREAM_CFG[layout]
            for staged in (lcfg["staging"], lcfg["ledger"]):
                if _st_exists(os.path.join(index_dir, staged), spark):
                    raise RuntimeError(
                        f"index {index_dir!r} has live stream staging "
                        f"({staged}): run the layout's compact_stream "
                        "first — ids whose vectors arrived through the "
                        "stream live in the staging, which this delete "
                        "does not scan; deleting now could silently "
                        "leave them serving (incomplete erasure)."
                    )
        prev = _read_manifest(spark, index_dir, layout)
        int(prev["fingerprint"])  # reject pre-fingerprint layouts up front
        cells_dir = os.path.join(index_dir, cells_name)
        cells = spark.read.parquet(cells_dir)
        if "row_fp" not in cells.columns:
            raise RuntimeError(
                f"{cells_name} predates per-row fingerprints (no row_fp "
                "column) — rebuild the index to enable targeted deletes."
            )
        id_type = dict(cells.dtypes)[cell_id_col]
        del_ids = _delete_ids_frame(spark, ids, id_col, id_type).persist()
        staging = os.path.join(index_dir, f"{cells_name}.deleting")
        staged_marker = os.path.join(staging, ".staged")
        try:
            idr = del_ids.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.sum(
                        F.xxhash64(F.col("__del_id").cast("string")).cast(
                            "decimal(38,0)"
                        )
                    ),
                    F.lit(0),
                ).alias("s"),
            ).collect()[0]
            ids_n, ids_fp = int(idr["n"]), int(idr["s"]) % _FP_MOD
            if intent_txt is None:
                _check_cells_parity(
                    spark, index_dir, cells_name, int(prev["n_rows"])
                )
                hit = cells.join(
                    del_ids,
                    F.col(cell_id_col) == F.col("__del_id"),
                    "left_semi",
                )
                agg = hit.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.coalesce(
                        F.sum(F.col("row_fp").cast("decimal(38,0)")),
                        F.lit(0),
                    ).alias("s"),
                    F.collect_set("cent_id").alias("cents"),
                ).collect()[0]
                dn = int(agg["n"])
                if dn == 0:
                    manifest = dict(prev.asDict())
                    manifest["n_deleted"] = 0
                    return manifest
                dfp = int(agg["s"]) % _FP_MOD
                affected = sorted(int(c) for c in agg["cents"])
                kept_cents = {
                    int(r["cent_id"])
                    for r in cells.filter(F.col("cent_id").isin(affected))
                    .join(
                        del_ids,
                        F.col(cell_id_col) == F.col("__del_id"),
                        "left_anti",
                    )
                    .select("cent_id")
                    .distinct()
                    .collect()
                }
                emptied = sorted(set(affected) - kept_cents)
                intent = {
                    "target": {
                        "n_rows": int(prev["n_rows"]) - dn,
                        "fingerprint": (int(prev["fingerprint"]) - dfp)
                        % _FP_MOD,
                        "n_centroids": int(prev["n_centroids"]),
                        "dim": int(prev["dim"]),
                        "codebook_fp": int(
                            prev.asDict().get("codebook_fp") or 0
                        ),
                    },
                    "affected": affected,
                    "emptied": emptied,
                    "n_deleted": dn,
                    "ids_n": ids_n,
                    "ids_fp": ids_fp,
                }
                _st_touch(intent_path, json.dumps(intent), spark)
            else:
                intent = json.loads(intent_txt)
                if (intent["ids_n"], intent["ids_fp"]) != (ids_n, ids_fp):
                    raise RuntimeError(
                        f"a crashed delete on {cells_name} is pending with "
                        "a DIFFERENT id set — retry it with the original "
                        "ids to converge (its deltas were computed against "
                        "the pre-delete cells), or rebuild the index."
                    )
            target = intent["target"]
            affected = [int(c) for c in intent["affected"]]
            emptied = {int(c) for c in intent["emptied"]}
            to_stage = [c for c in affected if c not in emptied]
            if not _st_exists(staged_marker, spark):
                # recompute ONLY while no swap has happened (guarded by
                # the .staged marker — see step 2 of the docstring)
                _st_rmtree(staging, spark)
                if to_stage:
                    (
                        cells.filter(F.col("cent_id").isin(to_stage))
                        .join(
                            del_ids,
                            F.col(cell_id_col) == F.col("__del_id"),
                            "left_anti",
                        )
                        .repartition(max(1, len(to_stage)), "cent_id")
                        .write.partitionBy("cent_id")
                        .mode("overwrite")
                        .parquet(staging)
                    )
                else:
                    _st_mkdirs_local_or_fs(staging, spark)
                _st_touch(staged_marker, "staged", spark)
            for c in affected:
                old = os.path.join(cells_dir, f"cent_id={c}")
                if c in emptied:
                    _st_rmtree(old, spark)
                    continue
                src = os.path.join(staging, f"cent_id={c}")
                if not _st_exists(src, spark):
                    continue  # already swapped by a prior attempt
                dropped = os.path.join(staging, f".dropped_{c}")
                if not _st_exists(dropped, spark):
                    # first visit: the live partition still holds the
                    # PRE-delete content — disposable, src (complete,
                    # under .staged) holds every kept row
                    _st_rmtree(old, spark)
                    _st_touch(dropped, "dropped", spark)
                if _st_exists(old, spark):
                    # only a CRASHED copy+delete rename (S3A) reaches
                    # here: old is partial-or-complete NEW content (the
                    # .dropped marker proves the pre-delete dir is
                    # gone). Same count heal as the compact fold: a
                    # source key is deleted only after its copy, so
                    # src >= old means the copy phase was still running
                    # (src authoritative) and old > src means deletes
                    # began (old complete — authoritative).
                    if _st_count_files(src, spark) >= _st_count_files(
                        old, spark
                    ):
                        _st_rmtree(old, spark)
                        _st_rename(src, old, spark)
                    else:
                        _st_rmtree(src, spark)
                else:
                    _st_rename(src, old, spark)
            _write_manifest(spark, index_dir, target, layout)
            _st_unlink(intent_path, spark)
            _st_rmtree(staging, spark)
            manifest = dict(target)
            manifest["n_deleted"] = int(intent["n_deleted"])
            manifest["n_cells_rewritten"] = len(affected) - len(emptied)
            manifest["n_cells_emptied"] = len(emptied)
            return manifest
        finally:
            del_ids.unpersist()


def _st_mkdirs_local_or_fs(path: str, spark: SparkSession | None) -> None:
    if not is_uri(path):
        os.makedirs(path, exist_ok=True)
        return
    from ..fsio import fs_mkdirs

    fs_mkdirs(_require_spark(spark, path), path)


def ivf_index_delete(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_col: str = "vec_id",
) -> dict:
    """Erase ``ids`` from the persisted IVF layout (right-to-be-
    forgotten / retention). ``ids``: a DataFrame (column ``id_col`` or
    its only column) or a plain iterable. Returns the advanced manifest
    plus ``n_deleted``. Semantics, crash matrix, scale shape and the
    codebook-erasure caveat: `_index_delete`. Serve results afterwards
    are bit-identical to an index REBUILT over the purged corpus with
    the same codebook (test-pinned) — and `ivf_index_ensure` over the
    purged corpus reads fresh, so the delete never triggers the rebuild
    it replaces."""
    return _index_delete(
        spark, index_dir, ids, "ivf", "cells", id_col, id_col
    )


def ivfpq_index_delete(
    spark: SparkSession,
    index_dir: str,
    ids,
    id_col: str = "vec_id",
) -> dict:
    """Erase ``ids`` from the persisted IVF-PQ layout (``cells_pq``
    stores the id as ``cand_id`` regardless of the build's source
    column; ``id_col`` only names the caller's DataFrame column).
    Contract and crash matrix: `_index_delete`. The PQ books persist —
    they are subspace kmeans aggregates, but see the codebook caveat
    for default-seeded COARSE centroids."""
    return _index_delete(
        spark, index_dir, ids, "pq", "cells_pq", "cand_id", id_col
    )


def read_index_cells(spark: SparkSession, index_dir: str) -> DataFrame:
    """The IVF index's full cell set: batch-built cells plus any
    stream-appended cells (the ``cells_stream`` staging layout), with a
    uniform schema. Serve paths that must see streamed vectors read
    through this instead of ``cells/`` directly.

    The staging union is gated on an EXPLICIT existence check (Hadoop
    FS API, so object-store URIs resolve too) — a blanket
    try/except here would also swallow genuine read failures (corrupt
    parquet, permissions, transient FS errors) and silently serve
    base-only results; a real error must propagate."""
    return _read_layout_cells(spark, index_dir, "ivf")


def read_index_cells_pq(spark: SparkSession, index_dir: str) -> DataFrame:
    """The IVF-PQ layout's full code-cell set (``cells_pq`` plus any
    ``cells_pq_stream`` staging) — the compressed twin of
    `read_index_cells`; the PQ serve paths read through this so
    streamed codes are servable before the fold."""
    return _read_layout_cells(spark, index_dir, "pq")


def _read_layout_cells(
    spark: SparkSession, index_dir: str, layout: str
) -> DataFrame:
    cfg = _STREAM_CFG[layout]
    cells = spark.read.parquet(os.path.join(index_dir, cfg["cells"]))
    stream_dir = os.path.join(index_dir, cfg["staging"])
    if not _dir_exists(spark, stream_dir):
        return cells
    streamed = (
        spark.read.parquet(stream_dir)
        .drop("__stream_batch")
        .select(*cells.columns)
    )
    return cells.unionByName(streamed)
