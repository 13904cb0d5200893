"""Streaming span-dedup throughput at corpus scale — the envelope for
``streaming/dedup.stream_dedup_spans_sink`` (round 8), completing the
span-dedup family's footing: the batch op has a curve to 8M docs
(SCALE.md), the incremental op inherits it, and this measures the
continuous-ingest twin end-to-end through a REAL availableNow file
stream.

Shape: seed the span-hash index from an already-ingested corpus half
(`seed_span_index`), then stream the other half through the sink in 4
micro-batches. Each batch's spans dedup against the batch itself
(lowest-(doc, position) wins) and against every span PRIOR batches
recorded — the per-batch work is one 32-byte-hash shuffle of the
batch's spans plus a partition-pruned anti-join against the growing
index, so batch wall should track batch size, not corpus size (the
claim this harness checks: batch-over-batch wall stays flat while the
index grows).

Invariants asserted (cheap, structural — bit-level equivalence with
the batch twin is pinned by tests/test_streaming.py at small scale):
- audit rows == streamed docs (every doc accounted once);
- the index holds EXACTLY the distinct span hashes of corpus+stream
  (one row per hash — the sink's index-stays-minimal claim);
- replaying the last batch changes neither audit nor index (the
  ledger-free exactly-once claim, at scale).

Reuses tools/scale_text.py's deterministic corpus. Usage:
    python tools/scale_stream_spans.py [--docs 1000000] [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_text import OUT, generate  # noqa: E402

SPAN_WORDS = 16
N_BATCHES = 4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    if not args.skip_gen and not os.path.isdir(OUT):
        t0 = time.monotonic()
        generate(args.docs, OUT)
        print(f"generated {args.docs:,} docs in {time.monotonic()-t0:.1f}s",
              flush=True)

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.operators.dedup import _span_rows
    from real_time_trip_processing_spark.session import get_spark
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_span_index,
        stream_dedup_spans_sink,
    )

    spark = get_spark("stream-spans-scale")
    docs = spark.read.parquet(OUT).filter(
        F.col("doc_id") < args.docs
    ).select("doc_id", "text")
    half = args.docs // 2
    corpus = docs.filter(F.col("doc_id") < half)
    stream_docs = docs.filter(F.col("doc_id") >= half)

    work = os.path.join(os.path.dirname(OUT), "stream_spans")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    idx_dir = os.path.join(work, "span_index")
    audit_dir = os.path.join(work, "audit")
    feed = os.path.join(work, "feed")

    res: dict = {"docs": args.docs, "span_words": SPAN_WORDS,
                 "n_batches": N_BATCHES}

    t0 = time.monotonic()
    seed_span_index(corpus, idx_dir, SPAN_WORDS)
    res["seed_sec"] = round(time.monotonic() - t0, 2)
    res["seed_hashes"] = spark.read.parquet(idx_dir).count()
    print(f"seed {half:,} docs: {res['seed_sec']}s "
          f"({res['seed_hashes']:,} hashes)", flush=True)

    stream_docs.repartition(N_BATCHES).write.parquet(feed)
    sink = stream_dedup_spans_sink(idx_dir, audit_dir, SPAN_WORDS)

    # drive the batches DIRECTLY (sink(df, batch_id)) so each batch is
    # individually timed — the flat-wall claim needs per-batch walls,
    # which a writeStream trigger hides; the sink sees exactly the
    # frames the file source would hand it (one file per trigger)
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(feed, "*.parquet")))
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
    res["docs_per_sec"] = round((args.docs - half) / sum(batch_walls), 1)

    audit = spark.read.parquet(audit_dir)
    res["audit_rows"] = audit.count()
    res["spans_streamed"] = int(
        audit.agg(F.sum("n_spans")).collect()[0][0]
    )
    res["spans_removed"] = int(
        audit.agg(F.sum("n_spans_removed")).collect()[0][0]
    )
    idx_rows = spark.read.parquet(idx_dir).count()
    want_hashes = (
        _span_rows(docs, SPAN_WORDS, "doc_id", "text")
        .filter(F.col("span") != "")
        .select(F.sha2(F.col("span"), 256))
        .distinct()
        .count()
    )
    res["index_rows"] = idx_rows
    res["index_is_exact_hash_set"] = idx_rows == want_hashes

    # planted-duplicate recall END-TO-END through the sink (round 9):
    # the generator plants exact-dup pairs (g-1, g) at g % 19 == 7 —
    # span dedup is exact, so for every planted pair whose members
    # both streamed, the LATER-processed member must lose ALL its
    # spans to the earlier one (or to the index). Pair-level contract
    # (round-robin batches, either member may be canonical): the
    # pair's combined removals cover at least one member's full span
    # count. Pytest pins the same rule against a brute-force model at
    # small scale (tests/test_neardup_recall_floors.py).
    a = audit.select("doc_id", "n_spans", "n_spans_removed")
    planted = a.filter(
        (F.col("doc_id") % 19 == 7) & (F.col("doc_id") > half)
    )
    prev = a.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("n_spans").alias("n_spans_prev"),
        F.col("n_spans_removed").alias("removed_prev"),
    )
    pairs = planted.join(prev, "doc_id")
    n_planted = pairs.count()
    n_flagged = pairs.filter(
        F.col("n_spans_removed") + F.col("removed_prev")
        >= F.least("n_spans", "n_spans_prev")
    ).count()
    res["planted_pairs"] = int(n_planted)
    res["planted_flagged"] = int(n_flagged)
    res["planted_recall"] = round(n_flagged / max(1, n_planted), 4)
    assert res["planted_recall"] >= 0.999, res["planted_recall"]

    # replay the LAST batch: ledger-free exactly-once at scale
    pre_audit, pre_idx = res["audit_rows"], idx_rows
    t0 = time.monotonic()
    sink(spark.read.parquet(files[-1]), N_BATCHES - 1)
    res["replay_sec"] = round(time.monotonic() - t0, 2)
    res["replay_invariant"] = (
        spark.read.parquet(audit_dir).count() == pre_audit
        and spark.read.parquet(idx_dir).count() == pre_idx
    )

    res["ok"] = bool(
        res["audit_rows"] == args.docs - half
        and res["index_is_exact_hash_set"]
        and res["replay_invariant"]
    )
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(res))
    if not res["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
