"""Measured small-files cost of a long-running dedup-index stream, and
what `compact_dedup_index` buys back (round 10).

The ``__batch_id``-partitioned dedup indexes grow ONE partition per
micro-batch, so the per-batch index read pays file listing + open
overhead proportional to STREAM AGE, not index size. This harness
drives `stream_dedup_exact_sink` (the cheapest family member — pure
hash work, so the measurement isolates the LAYOUT cost, not kernels)
for N_BATCHES micro-batches, then times probe batches against the
aged index, compacts, and times probe batches against the folded
index. The row-set is identical either way (the sink's own
read-equivalence contract, test-pinned) — only the layout differs.

Probe timing discipline: each probe is a full sink apply (read index →
screen → write audit+index) at a FRESH batch id; median of N_PROBES
with the first discarded as warm-up. Because the probe itself appends
a partition, the aged side is re-measured at the same partition counts
as reported.

Usage: python tools/scale_index_compaction.py [--batches 256]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROBES = 6  # 1 warm-up + 5 timed


def count_files(root: str) -> int:
    n = 0
    for _dir, _sub, files in os.walk(root):
        n += len(files)
    return n


def run(spark, n_batches: int, work: str) -> dict:
    from real_time_trip_processing_spark.streaming.dedup import (
        compact_dedup_index,
        stream_dedup_exact_sink,
    )

    idx = os.path.join(work, "aged_idx")
    aud = os.path.join(work, "aged_aud")
    sink = stream_dedup_exact_sink(idx, aud)

    def batch(b0: int, n_docs: int = 8):
        return spark.createDataFrame(
            [(b0 * 1000 + i, f"doc {b0} {i} " + "w " * 16)
             for i in range(n_docs)],
            "doc_id long, text string",
        )

    t0 = time.monotonic()
    for b in range(n_batches):
        sink(batch(b), b)
    ingest_sec = round(time.monotonic() - t0, 1)

    def probe_median(start_bid: int) -> float:
        walls = []
        for i in range(N_PROBES):
            bdf = batch(start_bid + i)
            t1 = time.monotonic()
            sink(bdf, start_bid + i)
            walls.append(time.monotonic() - t1)
        return round(statistics.median(walls[1:]), 3)

    files_aged = count_files(idx)
    aged_probe = probe_median(n_batches)

    t1 = time.monotonic()
    folded = compact_dedup_index(
        spark, idx, through_batch=n_batches + N_PROBES - 1
    )
    compact_sec = round(time.monotonic() - t1, 2)
    files_folded = count_files(idx)
    folded_probe = probe_median(n_batches + N_PROBES)

    return {
        "n_batches": n_batches,
        "ingest_sec": ingest_sec,
        "files_aged": files_aged,
        "probe_median_aged_sec": aged_probe,
        "partitions_folded": folded,
        "compact_sec": compact_sec,
        "files_folded": files_folded,
        "probe_median_folded_sec": folded_probe,
        "probe_speedup": round(aged_probe / max(folded_probe, 1e-9), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=256)
    args = ap.parse_args()

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("index-compaction-scale")
    work = tempfile.mkdtemp(prefix="scale_index_compaction_")
    try:
        print(json.dumps(run(spark, args.batches, work)))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
