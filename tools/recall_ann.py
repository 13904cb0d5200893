"""Measured nprobe ↔ recall curve for the distributed ANN join.

SCALE.md's claim that "the dial at fixed budget is nprobe (recall ↔
candidate mass)" was argued, not measured. This harness computes exact
brute-force top-k ground truth for a query sample over the 1M × 64
corpus (`tools/scale_vectors.py --skip-gen` layout), then runs
`ann_join_ivf` at increasing nprobe and reports recall@k and wall —
the numbers behind the dial.

Usage: python tools/recall_ann.py [--queries 200] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".scale", "embeddings_1m")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-centroids", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.similarity import (
        ann_join_ivf,
        cosine_topk,
    )
    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("recall-ann")
    full = spark.read.parquet(CORPUS)
    n_rows = full.count()
    stride = max(1, n_rows // args.queries)
    queries = full.filter(F.col("vec_id") % stride == 7).cache()
    nq = queries.count()

    t0 = time.monotonic()
    exact = {
        (r["query_id"], r["cand_id"])
        for r in cosine_topk(full, queries, k=args.k).collect()
    }
    exact_sec = round(time.monotonic() - t0, 2)
    print(f"ground truth: {nq} queries, {len(exact)} exact pairs "
          f"({exact_sec}s brute force)", flush=True)

    results = {}
    for nprobe in (1, 2, 4, 8, 16, 32):
        t0 = time.monotonic()
        got = {
            (r["query_id"], r["cand_id"])
            for r in ann_join_ivf(
                full, queries, k=args.k,
                n_centroids=args.n_centroids, nprobe=nprobe,
            ).collect()
        }
        sec = round(time.monotonic() - t0, 2)
        recall = round(len(got & exact) / max(1, len(exact)), 4)
        results[str(nprobe)] = {"recall": recall, "sec": sec}
        print(f"  nprobe={nprobe:>3d}  recall@{args.k}={recall:.4f}  "
              f"{sec:7.2f}s", flush=True)
    print(json.dumps({
        "n_rows": n_rows, "n_queries": nq, "k": args.k,
        "n_centroids": args.n_centroids, "exact_sec": exact_sec,
        "curve": results,
    }))


if __name__ == "__main__":
    main()
