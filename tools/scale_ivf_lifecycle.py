"""Full persisted-IVF lifecycle measured at 1M x 64: build -> stream ->
COMPACT -> serve, with parity adjudicated against the in-query ivf_topk
over the union corpus.

SCALE.md already carries the round-4 build (15.95 s) and streaming
ingest (500k over 4 micro-batches, 27.4 s) envelopes; the lifecycle
step it never measured is `ivf_index_compact_stream` — the op whose
whole point is that a long-running ingest leaves one `__stream_batch`
partition per micro-batch and every serve pays their file-open costs
forever. This harness closes that gap:

1. build the base index over the first half of a 1M x 64 corpus
   (256 cells — the SCALE.md layout);
2. stream the second half through `streaming_index_append` as a real
   availableNow file stream (4 micro-batches);
3. serve 16 queries against base+staging (the pre-compaction shape),
   timed;
4. `ivf_index_compact_stream`, timed, with parquet file counts under
   the index before/after;
5. serve the same 16 queries against the folded layout, timed, and
   hash-compare both serve results against `ivf_topk` over the full
   1M union with the stored codebook — the fold must be invisible to
   results, only to file counts.

Reuses tools/scale_vectors.py's deterministic generator (seeded PCG64,
32 parquet files) so the corpus is reproducible across rounds.

Usage: python tools/scale_ivf_lifecycle.py [--rows 1000000] [--skip-gen]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_vectors import DIM, OUT, generate  # noqa: E402

N_CENTROIDS = 256
N_QUERIES = 16
NPROBE = 8
K = 10


def _parquet_files(root: str) -> int:
    root = root.removeprefix("file://")  # glob is local-only
    return sum(1 for _ in glob.iglob(os.path.join(root, "**", "*.parquet"),
                                     recursive=True))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--file-uri", action="store_true",
        help="address the index dir as a file:// URI so every staging "
        "op (rename/marker/ledger/high-water) routes through the "
        "Hadoop FS API — measures the object-store code path's "
        "overhead against the plain-path os fast path",
    )
    args = ap.parse_args()

    if not args.skip_gen and not os.path.isdir(OUT):
        t0 = time.monotonic()
        generate(args.rows, OUT)
        print(f"generated {args.rows:,} x {DIM} in "
              f"{time.monotonic() - t0:.1f}s -> {OUT}", flush=True)

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_build,
        ivf_index_compact_stream,
        ivf_persisted_topk,
        read_index_cells,
    )
    from real_time_trip_processing_spark.functions.similarity import ivf_topk
    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("ivf-lifecycle")
    emb = spark.read.parquet(OUT).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).filter(F.col("vec_id") < args.rows)
    half = args.rows // 2
    base = emb.filter(F.col("vec_id") < half)
    delta = emb.filter(F.col("vec_id") >= half)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    # fixed codebook (first N_CENTROIDS vectors) shared by the persisted
    # build AND the in-query parity reference — centroid QUALITY is not
    # under test here, lifecycle equivalence is
    cb = [(int(r[0]), list(r[1])) for r in
          emb.filter(F.col("vec_id") < N_CENTROIDS).collect()]

    work = os.path.join(os.path.dirname(OUT), "ivf_lifecycle")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    idx = os.path.join(work, "idx")
    if args.file_uri:
        idx = "file://" + idx

    res: dict = {"rows": args.rows, "n_centroids": N_CENTROIDS,
                 "nprobe": NPROBE, "k": K, "index_dir_form": idx[:7]}

    t0 = time.monotonic()
    ivf_index_build(base, idx, n_centroids=N_CENTROIDS, codebook=cb)
    res["build_base_sec"] = round(time.monotonic() - t0, 2)
    print(f"build {half:,}: {res['build_base_sec']}s", flush=True)

    feed = os.path.join(work, "feed")
    delta.repartition(4).write.parquet(feed)
    stream = spark.readStream.schema(
        spark.read.parquet(feed).schema
    ).option("maxFilesPerTrigger", 1).parquet(feed)
    from real_time_trip_processing_spark.functions.ivf_index import (
        streaming_index_append,
    )
    t0 = time.monotonic()
    q = (
        stream.writeStream.foreachBatch(streaming_index_append(idx))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1200)
    res["stream_delta_sec"] = round(time.monotonic() - t0, 2)
    res["streamed_rows"] = args.rows - half
    print(f"stream {args.rows - half:,}: {res['stream_delta_sec']}s",
          flush=True)

    n_union = read_index_cells(spark, idx).count()
    assert n_union == args.rows, (n_union, args.rows)
    res["files_before_compact"] = _parquet_files(idx)

    def serve() -> tuple[float, list]:
        t = time.monotonic()
        rows = sorted(map(tuple, ivf_persisted_topk(
            spark, idx, queries, k=K, nprobe=NPROBE
        ).collect()))
        return round(time.monotonic() - t, 2), rows

    res["serve_pre_compact_sec"], pre_rows = serve()
    print(f"serve pre-compact: {res['serve_pre_compact_sec']}s", flush=True)

    t0 = time.monotonic()
    fold = ivf_index_compact_stream(spark, idx)
    res["compact_sec"] = round(time.monotonic() - t0, 2)
    res["compact_manifest_rows"] = int(fold["n_rows"]) if fold else None
    res["files_after_compact"] = _parquet_files(idx)
    print(f"compact: {res['compact_sec']}s "
          f"({res['files_before_compact']} -> "
          f"{res['files_after_compact']} files)", flush=True)

    res["serve_post_compact_sec"], post_rows = serve()
    print(f"serve post-compact: {res['serve_post_compact_sec']}s",
          flush=True)

    want = sorted(map(tuple, ivf_topk(
        emb, queries, k=K, n_centroids=N_CENTROIDS, nprobe=NPROBE,
        codebook=cb,
    ).collect()))
    res["pre_compact_parity"] = pre_rows == want
    res["post_compact_parity"] = post_rows == want

    # --- targeted erasure on the folded 1M layout (round 8) ---------
    # two shapes: a "single user" (10 ids -> <= 10 cells rewritten,
    # the common GDPR case) and a scattered 1,000-id purge (random ids
    # land in ~all 256 cells — the honest worst case, approaching a
    # full cells rewrite). Both verified: manifest == purged corpus
    # (is_fresh), deleted ids never served.
    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_delete,
        ivf_index_is_fresh,
    )

    gone: set[int] = set()
    for label, ids in (
        ("delete_10", list(range(N_QUERIES, N_QUERIES + 10))),
        ("delete_1000", list(range(half - 1000, half))),
    ):
        t0 = time.monotonic()
        d = ivf_index_delete(spark, idx, ids)
        res[f"{label}_sec"] = round(time.monotonic() - t0, 2)
        res[f"{label}_cells_rewritten"] = d["n_cells_rewritten"]
        res[f"{label}_cells_emptied"] = d["n_cells_emptied"]
        gone.update(ids)
        assert d["n_deleted"] == len(ids), (label, d)
        print(f"{label}: {res[f'{label}_sec']}s "
              f"({d['n_cells_rewritten']} cells rewritten)", flush=True)
    purged = emb.filter(~F.col("vec_id").isin(list(gone)))
    res["delete_freshness"] = ivf_index_is_fresh(
        spark, purged, idx, N_CENTROIDS, codebook=cb
    )
    t0 = time.monotonic()
    after_rows = sorted(map(tuple, ivf_persisted_topk(
        spark, idx, queries, k=K, nprobe=NPROBE
    ).collect()))
    res["serve_post_delete_sec"] = round(time.monotonic() - t0, 2)
    res["deleted_never_served"] = not any(
        r[1] in gone for r in after_rows
    )
    print(f"post-delete: fresh={res['delete_freshness']} "
          f"serve {res['serve_post_delete_sec']}s", flush=True)

    res["ok"] = bool(res["pre_compact_parity"] and res["post_compact_parity"]
                     and n_union == args.rows
                     and res["delete_freshness"]
                     and res["deleted_never_served"])

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(res))
    if not res["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
