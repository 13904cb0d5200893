"""IVF-PQ streaming lifecycle at 1M x 64 — the compressed-cells twin
of tools/scale_ivf_lifecycle.py, measuring the SAME parameterized
sink/fold machinery under the heavier per-batch kernel (assign +
PQ-encode against stored books instead of assign + quantize):
build -> stream -> serve pre-fold -> compact -> serve post-fold, with
bit-identity adjudicated against a REBUILD over the union corpus using
the same coarse codebook and the same books (the layout's decoder
contract). Reuses tools/scale_vectors.py's deterministic corpus.

Usage: python tools/scale_pq_lifecycle.py [--rows 1000000] [--skip-gen]
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
M_SUB = 32
K_CODES = 16


def _parquet_files(root: str) -> int:
    return sum(1 for _ in glob.iglob(
        os.path.join(root, "cells_pq*", "**", "*.parquet"), recursive=True))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    if not args.skip_gen and not os.path.isdir(OUT):
        t0 = time.monotonic()
        generate(args.rows, OUT)
        print(f"generated {args.rows:,} x {DIM} in "
              f"{time.monotonic() - t0:.1f}s", flush=True)

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.ivf_index import (
        ivfpq_index_build,
        ivfpq_index_compact_stream,
        ivfpq_persisted_topk,
        read_index_cells_pq,
        streaming_pq_index_append,
    )
    from real_time_trip_processing_spark.functions.pq import pq_train
    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("pq-lifecycle")
    emb = spark.read.parquet(OUT).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).filter(F.col("vec_id") < args.rows)
    half = args.rows // 2
    base = emb.filter(F.col("vec_id") < half)
    delta = emb.filter(F.col("vec_id") >= half)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    cb = [(int(r[0]), list(r[1])) for r in
          emb.filter(F.col("vec_id") < N_CENTROIDS).collect()]

    work = os.path.join(os.path.dirname(OUT), "pq_lifecycle")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    idx = os.path.join(work, "idx")
    idx2 = os.path.join(work, "idx2")

    res: dict = {"rows": args.rows, "n_centroids": N_CENTROIDS,
                 "nprobe": NPROBE, "k": K, "m": M_SUB, "k_codes": K_CODES}

    t0 = time.monotonic()
    books = pq_train(base, m=M_SUB, k=K_CODES, iters=2, dim=DIM)
    res["train_books_sec"] = round(time.monotonic() - t0, 2)
    print(f"train books ({half:,}): {res['train_books_sec']}s", flush=True)

    t0 = time.monotonic()
    ivfpq_index_build(base, idx, books, n_centroids=N_CENTROIDS,
                      dim=DIM, codebook=cb)
    res["build_base_sec"] = round(time.monotonic() - t0, 2)
    print(f"build {half:,}: {res['build_base_sec']}s", flush=True)

    # drive 4 micro-batches directly (individually timed — the flat
    # per-batch-wall claim needs them; same approach as
    # scale_stream_spans.py)
    feed = os.path.join(work, "feed")
    delta.repartition(4).write.parquet(feed)
    files = sorted(glob.glob(os.path.join(feed, "*.parquet")))
    sink = streaming_pq_index_append(idx)
    walls = []
    for bid, path in enumerate(files):
        b = spark.read.parquet(path)
        t0 = time.monotonic()
        sink(b, bid)
        walls.append(round(time.monotonic() - t0, 2))
        print(f"batch {bid}: {walls[-1]}s", flush=True)
    res["batch_walls_sec"] = walls
    res["stream_delta_sec"] = round(sum(walls), 2)

    n_union = read_index_cells_pq(spark, idx).count()
    assert n_union == args.rows, (n_union, args.rows)
    res["files_before_compact"] = _parquet_files(idx)

    def serve() -> tuple[float, list]:
        t = time.monotonic()
        rows = sorted(map(tuple, ivfpq_persisted_topk(
            spark, idx, queries, k=K, nprobe=NPROBE
        ).collect()))
        return round(time.monotonic() - t, 2), rows

    res["serve_pre_compact_sec"], pre_rows = serve()
    print(f"serve pre-compact: {res['serve_pre_compact_sec']}s", flush=True)

    t0 = time.monotonic()
    fold = ivfpq_index_compact_stream(spark, idx)
    res["compact_sec"] = round(time.monotonic() - t0, 2)
    res["files_after_compact"] = _parquet_files(idx)
    print(f"compact: {res['compact_sec']}s "
          f"({res['files_before_compact']} -> "
          f"{res['files_after_compact']} files)", flush=True)

    res["serve_post_compact_sec"], post_rows = serve()
    print(f"serve post-compact: {res['serve_post_compact_sec']}s",
          flush=True)

    # bit-identity arbiter: rebuild over the UNION with the same books
    # and coarse codebook — streamed codes must be indistinguishable
    t0 = time.monotonic()
    ivfpq_index_build(emb, idx2, books, n_centroids=N_CENTROIDS,
                      dim=DIM, codebook=cb)
    res["rebuild_union_sec"] = round(time.monotonic() - t0, 2)
    want = sorted(map(tuple, ivfpq_persisted_topk(
        spark, idx2, queries, k=K, nprobe=NPROBE
    ).collect()))
    res["pre_compact_parity"] = pre_rows == want
    res["post_compact_parity"] = post_rows == want
    res["ok"] = bool(
        res["pre_compact_parity"] and res["post_compact_parity"]
        and int(fold["n_rows"]) == args.rows
    )
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(res))
    if not res["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
