"""Scale-proof of the vector path on a real corpus size.

sf0.1 carries only 2,000 embeddings — every vector query there measures
fixed overhead, not work. This harness generates a deterministic
1,000,000 x 64 float32 corpus (seeded PCG64; ~1% planted near-duplicate
rows so the dedup path has real positives) as a 32-file parquet
directory, then times the four headline vector ops at 62.5k / 250k /
1M rows and prints the scaling curve as JSON. Results + the chosen
bits/band go in SCALE.md.

Bits/band is THE dial: the declared sf-scale query runs 6 bits/band
(64 buckets/band — right for 2k vectors); at 1M rows this harness runs
20 bits/band (2^20 buckets/band) so expected bucket width stays ~1 and
verify work stays linear. Everything else is unchanged code paths.

Usage: python tools/scale_vectors.py [--rows 1000000] [--skip-gen]
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
N_FILES = 32
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "embeddings_1m")


def generate(n_rows: int, out_dir: str) -> None:
    """Deterministic corpus: unit-ish gaussian vectors; every 97th row
    (from row 97 on) is its predecessor + 1% jitter — a planted
    near-dup pair at cosine ~0.9999 so srp_near_dup has real recall
    targets at every subset size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    rng = np.random.Generator(np.random.PCG64(SEED))
    per = n_rows // N_FILES
    start = 0
    carry_last = None  # last vector of the previous file (for planted dups)
    for f in range(N_FILES):
        rows = per if f < N_FILES - 1 else n_rows - per * (N_FILES - 1)
        v = rng.standard_normal((rows, DIM)).astype(np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        ids = np.arange(start, start + rows, dtype=np.int64)
        # plant near-dups: row i (i % 97 == 0, i > 0) := row i-1 + jitter
        for local in range(rows):
            gid = start + local
            if gid > 0 and gid % 97 == 0:
                prev = v[local - 1] if local > 0 else carry_last
                jit = rng.standard_normal(DIM) * 0.01
                nd = prev + jit
                v[local] = nd / np.linalg.norm(nd)
        carry_last = v[-1].copy()
        emb32 = v.astype(np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(emb32.ravel()), DIM
        ).cast(pa.list_(pa.float32()))
        tbl = pa.table({
            "vec_id": pa.array(ids),
            "embedding": arr,
            "label": pa.array((ids % 20).astype(np.int32)),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:05d}.parquet"))
        start += rows


def bench(spark, corpus_dir: str, sizes: list[int]) -> dict:
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.similarity import (
        ann_join_ivf, cosine_topk, ivf_topk, srp_near_dup,
    )
    from real_time_trip_processing_spark.functions import pq as PQ

    full = spark.read.parquet(corpus_dir)
    queries = full.filter(F.col("vec_id") < 16).cache()
    queries.count()
    results: dict[str, dict] = {}

    def timed(name, size, build):
        """1 cold + 2 steady runs; report the steady median (same
        adjudicability discipline as bench.py — single-shot numbers
        at this scale are dominated by JIT/page-cache warmup)."""
        runs = []
        n = 0
        for _ in range(3):
            df = build()
            t0 = time.monotonic()
            n = df.count()
            runs.append(round(time.monotonic() - t0, 2))
        dt = sorted(runs[1:])[0 if len(runs) < 3 else len(runs[1:]) // 2]
        results.setdefault(name, {})[str(size)] = {
            "sec": dt, "cold_sec": runs[0], "runs": runs, "rows": n,
        }
        print(f"  {name:24s} n={size:>9,d}  {dt:7.2f}s  (cold {runs[0]:.2f})"
              f"  rows={n}", flush=True)

    for size in sizes:
        print(f"-- corpus size {size:,}", flush=True)
        corpus = full.filter(F.col("vec_id") < size)
        timed("sim_topk_bruteforce", size,
              lambda: cosine_topk(corpus, queries, k=10))
        # 20 bits/band: 2^20 buckets per band -> expected bucket width
        # ~max(1, N/2^20); verify work stays ~linear in N.
        timed("dedup_near_embedding", size,
              lambda: srp_near_dup(corpus, num_bits=80, bands=4,
                                   threshold=0.9, dim=DIM))
        timed("sim_ivf_topk", size,
              lambda: ivf_topk(corpus, queries, k=10,
                               n_centroids=256, nprobe=8))
        # Persisted IVF: build once (assignment + quantization + the
        # partitioned write — the cost sim_ivf_topk pays per query),
        # then serve from probed cells only. The amortization claim:
        # serve-time << build-time, and serve scan-bytes ~ nprobe/256.
        from real_time_trip_processing_spark.functions.ivf_index import (
            ivf_index_build, ivf_persisted_topk,
        )
        idx_dir = os.path.join(os.path.dirname(OUT), f"ivf_idx_{size}")
        t0 = time.monotonic()
        ivf_index_build(corpus, idx_dir, n_centroids=256)
        build_s = round(time.monotonic() - t0, 2)
        results.setdefault("ivf_index_build", {})[str(size)] = {"sec": build_s}
        print(f"  {'ivf_index_build':24s} n={size:>9,d}  {build_s:7.2f}s",
              flush=True)
        timed("sim_ivf_persisted_serve", size,
              lambda: ivf_persisted_topk(spark, idx_dir, queries,
                                         k=10, nprobe=8))
        # ANN JOIN: query side = every 50th corpus row (size/50 queries
        # — far beyond broadcast discipline), corpus = the rest.
        # n_centroids ≈ √N per the IVF sizing rule.
        nc = max(64, int(size ** 0.5) // 2)
        aj_corpus = corpus.filter(F.col("vec_id") % 50 != 0)
        aj_queries = corpus.filter(F.col("vec_id") % 50 == 0)
        cb = (
            aj_corpus.orderBy("vec_id").limit(nc)
            .select(F.col("vec_id").alias("cent_id"),
                    F.col("embedding").alias("centroid"))
        )
        timed("ann_join_ivf", size,
              lambda: ann_join_ivf(aj_corpus, aj_queries, k=5, nprobe=4,
                                   codebook=cb))
        books = PQ.pq_train(corpus.limit(4096), m=8, k=16, iters=2, dim=DIM)
        timed("sim_pq_topk", size,
              lambda: PQ.pq_adc_topk(PQ.pq_encode(corpus, books), queries,
                                     books, k=10, dim=DIM))
        timed("sim_ivfpq_topk", size,
              lambda: PQ.ivfpq_topk(corpus, queries, books, k=10,
                                    n_centroids=256, nprobe=8, dim=DIM))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    if not args.skip_gen:
        t0 = time.monotonic()
        generate(args.rows, OUT)
        print(f"generated {args.rows:,} x {DIM} in "
              f"{time.monotonic() - t0:.1f}s -> {OUT}", flush=True)

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark()
    sizes = [s for s in (62_500, 250_000, 1_000_000) if s <= args.rows]
    res = bench(spark, OUT, sizes)
    print(json.dumps({"dim": DIM, "seed": SEED, "sizes": sizes,
                      "results": res}))


if __name__ == "__main__":
    main()
