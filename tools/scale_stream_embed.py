"""Streaming EMBEDDING near-dup throughput at corpus scale — the
envelope for ``streaming/dedup.stream_embed_near_sink`` (round 9),
giving the embedding family's new streaming shape the same measured
footing as the text near-dup and span sinks: seed the SRP signature
index from an already-ingested corpus half (`seed_srp_index`), then
drive the other half through the sink in 4 micro-batches.

Per batch the work is one row-local signature pass over the batch
(one Arrow matmul) plus banded equi-joins against the growing index —
never an index self-join — so batch wall should track batch size, not
corpus size. SRP config matches the 1M srp_near_dup row in SCALE.md:
80 bits × 4 bands (2^20 buckets/band keeps expected bucket width ~1
at 1M).

Invariants asserted (bit-level equivalence with the batch twin is
pinned by tests/test_stream_near_dedup.py at small scale):
- audit rows == streamed vectors (every vector accounted once);
- index rows == seeded corpus + kept streamed vectors (only KEPT
  vectors join — the canonical-corpus claim);
- planted-duplicate recall END-TO-END through the sink: the corpus
  plants pairs (g-1, g) at g % 97 == 0 (1% jitter, cosine ~0.9999);
  round-robin batches mean either member may be canonical, so the
  pair-level contract is that the two members are never BOTH kept;
- replaying the last batch changes nothing (ledger-free exactly-once).

Reuses tools/scale_vectors.py's deterministic corpus. Usage:
    python tools/scale_stream_embed.py [--rows 1000000] [--skip-gen]
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

N_BATCHES = 4
KW = dict(num_bits=80, bands=4, threshold=0.98, dim=DIM)


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

    from real_time_trip_processing_spark.session import get_spark
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_srp_index,
        stream_embed_near_sink,
    )

    spark = get_spark("stream-embed-scale")
    vecs = spark.read.parquet(OUT).filter(
        F.col("vec_id") < args.rows
    ).select("vec_id", "embedding")
    half = args.rows // 2
    corpus = vecs.filter(F.col("vec_id") < half)
    stream_vecs = vecs.filter(F.col("vec_id") >= half)

    work = os.path.join(os.path.dirname(OUT), "stream_embed")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    idx_dir = os.path.join(work, "srp_index")
    audit_dir = os.path.join(work, "audit")
    feed = os.path.join(work, "feed")
    res: dict = {"rows": args.rows, "n_batches": N_BATCHES, **KW}

    t0 = time.monotonic()
    seed_srp_index(corpus, idx_dir, num_bits=KW["num_bits"], dim=DIM)
    res["seed_sec"] = round(time.monotonic() - t0, 2)
    res["seed_rows"] = spark.read.parquet(idx_dir).count()
    print(f"seed {half:,} vecs: {res['seed_sec']}s "
          f"({res['seed_rows']:,} index rows)", flush=True)

    stream_vecs.repartition(N_BATCHES).write.parquet(feed)
    sink = stream_embed_near_sink(idx_dir, audit_dir, **KW)

    files = sorted(glob.glob(os.path.join(feed, "*.parquet")))
    assert len(files) == N_BATCHES, files
    batch_walls = []
    for bid, path in enumerate(files):
        b = spark.read.parquet(path)
        t0 = time.monotonic()
        sink(b, bid)
        batch_walls.append(round(time.monotonic() - t0, 2))
        print(f"batch {bid}: {batch_walls[-1]}s", flush=True)
    res["batch_walls_sec"] = batch_walls
    res["stream_sec"] = round(sum(batch_walls), 2)
    res["vecs_per_sec"] = round((args.rows - half) / sum(batch_walls), 1)

    def audit_fingerprint():
        r = spark.read.parquet(audit_dir).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
            F.sum("n_corpus_matches").alias("c_matches"),
            F.sum("n_prior_batch_matches").alias("b_matches"),
        ).collect()[0]
        return tuple(int(x) for x in r)

    fp = audit_fingerprint()
    res["audit_rows"], res["kept_vecs"] = fp[0], fp[1]
    res["corpus_matches"], res["batch_matches"] = fp[2], fp[3]
    idx_rows = spark.read.parquet(idx_dir).count()
    res["index_rows"] = idx_rows
    assert fp[0] == args.rows - half, (fp[0], args.rows - half)
    # the generated corpus has no zero-direction rows, so kept == index
    assert idx_rows == res["seed_rows"] + fp[1], (idx_rows, fp)

    audit_df = spark.read.parquet(audit_dir).select("vid", "kept")
    planted = audit_df.filter(
        (F.col("vid") % 97 == 0) & (F.col("vid") > half)
    )
    prev = audit_df.select(
        (F.col("vid") + 1).alias("vid"), F.col("kept").alias("kept_prev")
    )
    pairs = planted.join(prev, "vid")
    n_planted = pairs.count()
    n_flagged = pairs.filter(~(F.col("kept") & F.col("kept_prev"))).count()
    res["planted_pairs"] = int(n_planted)
    res["planted_flagged"] = int(n_flagged)
    res["planted_recall"] = round(n_flagged / max(1, n_planted), 4)
    assert res["planted_recall"] >= 0.95, res["planted_recall"]

    # exactly-once: replay the final batch, nothing changes
    t0 = time.monotonic()
    sink(spark.read.parquet(files[-1]), N_BATCHES - 1)
    res["replay_sec"] = round(time.monotonic() - t0, 2)
    assert audit_fingerprint() == fp, (audit_fingerprint(), fp)
    assert spark.read.parquet(idx_dir).count() == idx_rows
    res["replay_invariant"] = True

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
