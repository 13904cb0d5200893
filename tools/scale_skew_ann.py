"""Hot-centroid ANN join under REAL skew: wall with and without
bucket salting.

The salting test pins bit-identity and bounded sub-bucket WIDTH; this
harness measures TIME on a deliberately skewed corpus — 30% of vectors
cluster around one codebook direction, so the unsalted cogroup hands
one Python worker ~30% of all scoring work while 31 cores idle.

Usage: python tools/scale_skew_ann.py [--rows 500000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
SEED = 20260814
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "embeddings_skew")


def generate(n_rows: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    rng = np.random.Generator(np.random.PCG64(SEED))
    per = n_rows // 16
    hot = np.zeros(DIM)
    hot[0] = 1.0
    start = 0
    for f in range(16):
        rows = per if f < 15 else n_rows - per * 15
        v = rng.standard_normal((rows, DIM))
        ids = np.arange(start, start + rows, dtype=np.int64)
        mask = ids % 10 < 3  # 30% hot: tight cluster around e0
        v[mask] = hot[None, :] + rng.standard_normal((mask.sum(), DIM)) * 0.05
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(v.astype(np.float32).ravel()), DIM
        ).cast(pa.list_(pa.float32()))
        pq.write_table(
            pa.table({"vec_id": pa.array(ids), "embedding": arr}),
            os.path.join(OUT, f"part-{f:05d}.parquet"),
        )
        start += rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()
    if not args.skip_gen:
        generate(args.rows)

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.similarity import (
        ann_join_ivf,
        nearest_centroid_kernel,
    )
    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("skew-ann")
    full = spark.read.parquet(OUT)
    corpus = full.filter(F.col("vec_id") % 50 != 0)
    queries = full.filter(F.col("vec_id") % 50 == 0)
    # codebook: the 126 corpus rows with id < 129 (ids ≡ 0 mod 50 sit
    # on the query side), guaranteed to include hot-cluster members
    # (ids ≡ 0..2 mod 10 are hot)
    cb = [
        (int(r[0]), list(r[1]))
        for r in corpus.filter(F.col("vec_id") < 129)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    ]
    sizes = {
        r["cent_id"]: r["n"]
        for r in corpus.select(
            nearest_centroid_kernel(cb)(
                F.col("embedding").cast("array<double>")
            ).alias("cent_id")
        ).groupBy("cent_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_corpus = sum(sizes.values())
    hot_share = max(sizes.values()) / n_corpus
    print(f"corpus={n_corpus:,d}  hottest centroid holds {hot_share:.1%}",
          flush=True)

    results = {}
    for label, mb in (("unsalted", None), ("salted", 20_000)):
        runs = []
        n = 0
        for _ in range(2):
            t0 = time.monotonic()
            n = ann_join_ivf(corpus, queries, k=5, nprobe=4,
                             codebook=cb, max_bucket=mb).count()
            runs.append(round(time.monotonic() - t0, 2))
        results[label] = {"sec": min(runs), "runs": runs, "rows": n}
        print(f"  {label:9s} {min(runs):7.2f}s  runs={runs}  rows={n:,d}",
              flush=True)
    print(json.dumps({"rows": args.rows, "hot_share": round(hot_share, 4),
                      "results": results}))


if __name__ == "__main__":
    main()
