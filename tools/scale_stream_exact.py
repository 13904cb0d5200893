"""Streaming exact-dedup throughput at corpus scale — the envelope for
``streaming/dedup.stream_dedup_exact_sink`` (round 10), giving the
fourth family member the same 1M footing the span/near/embed sinks
have: seed the doc-keyed hash index from an already-ingested corpus
half (`seed_exact_index`), stream the other half through the sink in 4
micro-batches, and assert the structural invariants end-to-end.

Per-batch work is ONE map-side hash pass (32-byte keys — the document
body never shuffles), one count aggregate for the within-batch rule,
and one hash-keyed join against the growing index — so batch wall
should track batch size, not corpus size (the flat-wall claim, same as
the other sinks).

Invariants asserted:
- audit rows == streamed docs (every doc accounted once);
- planted-duplicate recall is EXACTLY 1.0: the generator plants exact
  dups (doc g's text == doc g-1's at g % 19 == 7) — hash equality has
  no probabilistic tail, so every planted pair must lose a member
  (vs-corpus: the streamed member drops; both-streamed: at most one
  survives);
- only kept docs joined the index (index rows == seeded + kept);
- replaying the last batch changes neither audit nor index (the
  ledger-free exactly-once claim, at scale).

Reuses tools/scale_text.py's deterministic corpus. Usage:
    python tools/scale_stream_exact.py [--docs 1000000] [--skip-gen]
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

from scale_text import OUT, generate  # noqa: E402

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

    from real_time_trip_processing_spark.session import get_spark
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_exact_index,
        stream_dedup_exact_sink,
    )

    spark = get_spark("stream-exact-scale")
    docs = spark.read.parquet(OUT).filter(
        F.col("doc_id") < args.docs
    ).select("doc_id", "text")
    half = args.docs // 2
    corpus = docs.filter(F.col("doc_id") < half)
    stream_docs = docs.filter(F.col("doc_id") >= half)

    work = os.path.join(os.path.dirname(OUT), "stream_exact")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    idx_dir = os.path.join(work, "exact_index")
    audit_dir = os.path.join(work, "audit")
    feed = os.path.join(work, "feed")

    res: dict = {"docs": args.docs, "n_batches": N_BATCHES}

    t0 = time.monotonic()
    seed_exact_index(corpus, idx_dir)
    res["seed_sec"] = round(time.monotonic() - t0, 2)
    res["seed_rows"] = spark.read.parquet(idx_dir).count()
    print(f"seed {half:,} docs: {res['seed_sec']}s", flush=True)

    stream_docs.repartition(N_BATCHES).write.parquet(feed)
    sink = stream_dedup_exact_sink(idx_dir, audit_dir)

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
    res["docs_per_sec"] = round((args.docs - half) / sum(batch_walls), 1)

    audit = spark.read.parquet(audit_dir)
    res["audit_rows"] = audit.count()
    res["kept"] = audit.filter("kept").count()

    # planted-duplicate recall: exact hashing — 1.0, no tail. The audit
    # holds ONLY streamed docs, so no >= half clause is needed (review:
    # a strict > silently excluded the boundary pair when half itself
    # is a planted dup — its partner half-1 is corpus-side, which the
    # vs_corpus branch below handles)
    a = audit.select(F.col("doc").alias("doc_id"), "kept")
    planted = a.filter(
        F.col("doc_id") % 19 == 7
    ).select(F.col("doc_id"), F.col("kept").alias("kept_g"))
    # the pair partner g-1: streamed (join audit) or corpus (< half)
    partner_stream = a.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("kept").alias("kept_prev"),
    )
    pairs = planted.join(partner_stream, "doc_id", "left")
    both_streamed = pairs.filter(F.col("kept_prev").isNotNull())
    vs_corpus = pairs.filter(F.col("kept_prev").isNull())
    n_planted = pairs.count()
    # both streamed: at most one member survives; partner in corpus:
    # the streamed member must be dropped
    n_ok = (
        both_streamed.filter(
            ~(F.col("kept_g") & F.col("kept_prev"))
        ).count()
        + vs_corpus.filter(~F.col("kept_g")).count()
    )
    res["planted_pairs"] = int(n_planted)
    res["planted_flagged"] = int(n_ok)
    res["planted_recall"] = round(n_ok / max(1, n_planted), 4)
    assert res["planted_recall"] == 1.0, res["planted_recall"]

    idx_rows = spark.read.parquet(idx_dir).count()
    res["index_rows"] = idx_rows
    res["index_is_seed_plus_kept"] = (
        idx_rows == res["seed_rows"] + res["kept"]
    )

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
        and res["index_is_seed_plus_kept"]
        and res["replay_invariant"]
        and res["planted_recall"] == 1.0
    )
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(res))
    if not res["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
