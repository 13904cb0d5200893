"""Serve-wall decomposition for `ann_join_ivfpq_persisted` (round-8
verdict #6) and — round 10 (round-9 verdict #6) — its non-PQ twin
`ann_join_persisted` (the serve path behind the declared `ann_join_ivf`
shape, the most expensive previously-undecomposed vector query): after
the LUT-boxing fix and the file-signature serve-state memo, what
remains of the serve wall — and how does it split between FIXED driver
prologue (coarse codebook [+ PQ books] collect + float64 convert,
memoized per content signature) and the LINEAR distributed part (probe
explosion, cent_id shuffle, per-bucket ADC / quantized-cosine
kernels)? The IVF flavor's prologue is centroids-only (no books
collect), so its fixed share should be SMALLER than the PQ path's —
measured, not assumed.

Per corpus size this harness measures:
- prologue_cold_sec: the two state loads (`_load_centroids` +
  `_load_books_np`) with the memo CLEARED — the cost the first serve
  of a session pays once;
- prologue_warm_sec: the same loads again — the memo-hit cost every
  later serve pays (file-signature listing only, ~ms);
- memo_survives: the warm loads return the IDENTICAL payload objects
  (no reload, no reconvert) — the claim `reproduce_claims.py
  serve_split` asserts;
- serve_cold_sec: first full serve after a memo clear;
- serve_warm_secs: three further serves (median is the steady serve
  wall; serve_cold − median ≈ the prologue, corroborating the direct
  measurement).

The fixed-vs-linear decomposition: prologue is O(n_centroids·dim +
m·k·(dim/m)) driver work, INDEPENDENT of corpus size, so its share of
the serve wall must FALL as the corpus grows — the 100 TB-relevant
number is the warm serve wall, which scales with codes scanned
(m bytes/candidate) and query count. Results go in SCALE.md.

Usage: python tools/scale_serve_decomp.py [--rows 1000000] [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

from scale_vectors import DIM, OUT, generate  # noqa: E402

N_CENTROIDS = 256
NPROBE = 8
K = 10
M_SUB = 8
K_CODES = 16
QUERY_STRIDE = 200  # |Q| = size / 200 — the distributed-join shape


def decompose(spark, corpus_dir: str, size: int, work: str) -> dict:
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions import ivf_index as IX
    from real_time_trip_processing_spark.functions import pq as PQ

    full = spark.read.parquet(corpus_dir)
    corpus = full.filter(F.col("vec_id") < size)
    queries = corpus.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    n_q = queries.count()

    idx = os.path.join(work, f"serve_idx_{size}")
    books = PQ.pq_train(corpus.limit(4096), m=M_SUB, k=K_CODES, iters=2,
                        dim=DIM)
    t0 = time.monotonic()
    IX.ivfpq_index_build(corpus, idx, books, n_centroids=N_CENTROIDS,
                         dim=DIM)
    build_sec = round(time.monotonic() - t0, 2)

    # --- direct prologue measurement (the serve paths' two state loads)
    IX._SERVE_STATE_CACHE.clear()
    t0 = time.monotonic()
    IX._load_centroids(spark, idx, "pq")
    b1 = IX._load_books_np(spark, idx)
    prologue_cold = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    IX._load_centroids(spark, idx, "pq")
    b2 = IX._load_books_np(spark, idx)
    prologue_warm = round(time.monotonic() - t0, 4)
    memo_survives = b1 is b2  # identical payload object — no reload

    def serve() -> float:
        t0 = time.monotonic()
        IX.ann_join_ivfpq_persisted(
            spark, idx, queries, k=K, nprobe=NPROBE
        ).write.mode("overwrite").format("noop").save()
        return round(time.monotonic() - t0, 3)

    IX._SERVE_STATE_CACHE.clear()
    serve_cold = serve()
    warms = sorted(serve() for _ in range(3))
    row = {
        "size": size,
        "n_queries": int(n_q),
        "build_sec": build_sec,
        "prologue_cold_sec": prologue_cold,
        "prologue_warm_sec": prologue_warm,
        "memo_survives": bool(memo_survives),
        "serve_cold_sec": serve_cold,
        "serve_warm_median_sec": warms[1],
        "serve_warm_spread": [warms[0], warms[-1]],
        "prologue_share_warm_pct": round(
            100 * prologue_warm / warms[1], 2
        ),
    }
    print(json.dumps(row), flush=True)
    shutil.rmtree(idx, ignore_errors=True)
    return row


def decompose_ivf(spark, corpus_dir: str, size: int, work: str) -> dict:
    """The non-PQ flavor: `ivf_index_build` (float/int quantized cells)
    + `ann_join_persisted`. Prologue = the ONE state load
    (`_load_centroids`, layout='ivf') — no books collect, so the fixed
    share should undercut the PQ path's. Memo survival is checked on
    ROW identity: `_load_centroids` returns a defensive shallow copy
    of the memoized list, so the list objects differ by design but a
    memo hit shares the row tuples; a reload would rebuild them."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions import ivf_index as IX

    full = spark.read.parquet(corpus_dir)
    corpus = full.filter(F.col("vec_id") < size)
    queries = corpus.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    n_q = queries.count()

    idx = os.path.join(work, f"serve_ivf_idx_{size}")
    t0 = time.monotonic()
    IX.ivf_index_build(corpus, idx, n_centroids=N_CENTROIDS)
    build_sec = round(time.monotonic() - t0, 2)

    IX._SERVE_STATE_CACHE.clear()
    t0 = time.monotonic()
    c1 = IX._load_centroids(spark, idx, "ivf")
    prologue_cold = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    c2 = IX._load_centroids(spark, idx, "ivf")
    prologue_warm = round(time.monotonic() - t0, 4)
    memo_survives = bool(c1 and c2 and c1[0] is c2[0])

    def serve() -> float:
        t0 = time.monotonic()
        IX.ann_join_persisted(
            spark, idx, queries, k=K, nprobe=NPROBE
        ).write.mode("overwrite").format("noop").save()
        return round(time.monotonic() - t0, 3)

    IX._SERVE_STATE_CACHE.clear()
    serve_cold = serve()
    warms = sorted(serve() for _ in range(3))
    row = {
        "flavor": "ivf_float",
        "size": size,
        "n_queries": int(n_q),
        "build_sec": build_sec,
        "prologue_cold_sec": prologue_cold,
        "prologue_warm_sec": prologue_warm,
        "memo_survives": memo_survives,
        "serve_cold_sec": serve_cold,
        "serve_warm_median_sec": warms[1],
        "serve_warm_spread": [warms[0], warms[-1]],
        "prologue_share_warm_pct": round(100 * prologue_warm / warms[1], 2),
    }
    print(json.dumps(row), flush=True)
    shutil.rmtree(idx, ignore_errors=True)
    return row


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

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("serve-decomp")
    work = os.path.join(os.path.dirname(OUT), "serve_decomp")
    os.makedirs(work, exist_ok=True)
    sizes = [s for s in (100_000, 1_000_000) if s <= args.rows]
    rows = [decompose(spark, OUT, s, work) for s in sizes]
    ivf_rows = [decompose_ivf(spark, OUT, s, work) for s in sizes]
    print(json.dumps({"dim": DIM, "nprobe": NPROBE, "k": K, "m": M_SUB,
                      "rows": rows, "ivf_rows": ivf_rows}))


if __name__ == "__main__":
    main()
