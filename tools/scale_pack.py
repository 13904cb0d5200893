"""Scale-proof for ``pack_sequences``' two-phase distributed prefix sum.

The round-3 verdict's one scale flaw: the old single-window formulation
(`Window.partitionBy(lang)`) runs ONE task per language — a dominant
language at corpus scale is a single executor sorting terabytes. This
harness generates a deterministic N-document / ONE-language corpus
(vectorized numpy, ~40 words/doc) and times:

- ``n_buckets=1``  — the legacy single-task-per-stream window (the cliff)
- ``n_buckets=32`` — the two-phase bucketed prefix sum (the fix)

and cross-checks the two outputs are bit-identical (full anti-join count
at the smallest size, aggregate token checksum at every size). Results
go in SCALE.md.

Usage: python tools/scale_pack.py [--docs 2000000] [--skip-gen]
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

SEED = 20260814
N_FILES = 32
WORDS_PER_DOC = 40
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "documents_pack")


def generate(n_docs: int, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    rng = np.random.Generator(np.random.PCG64(SEED))
    vocab = np.array([f"tok{i}" for i in range(5000)])
    per = n_docs // N_FILES
    start = 0
    for f in range(N_FILES):
        rows = per if f < N_FILES - 1 else n_docs - per * (N_FILES - 1)
        # vectorized text build: one word matrix per file, joined row-wise
        lens = np.maximum(4, rng.poisson(WORDS_PER_DOC, size=rows))
        flat = vocab[rng.integers(0, len(vocab), size=int(lens.sum()))]
        offs = np.concatenate([[0], np.cumsum(lens)])
        texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(rows)]
        ids = np.arange(start, start + rows, dtype=np.int64)
        tbl = pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(texts),
            "lang": pa.array(np.repeat("en", rows)),
            "source": pa.array(np.repeat("web", rows)),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:05d}.parquet"))
        start += rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    if not args.skip_gen:
        t0 = time.monotonic()
        generate(args.docs, OUT)
        print(f"generated {args.docs:,} docs in {time.monotonic()-t0:.1f}s "
              f"-> {OUT}", flush=True)

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.curation import pack_sequences
    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark()
    full = spark.read.parquet(OUT)
    sizes = [s for s in (250_000, 1_000_000, 2_000_000) if s <= args.docs]
    results: dict = {}
    for size in sizes:
        docs = full.filter(F.col("doc_id") < size)
        row: dict = {}
        sums: dict = {}
        for label, nb in (("single_window", 1), ("bucketed_32", 32)):
            runs = []
            for _ in range(2):
                # plan build INSIDE the timer: the bucketed path runs an
                # eager ladder job + ledger cache fill at build time
                t0 = time.monotonic()
                out = pack_sequences(docs, budget=512, n_buckets=nb)
                agg = out.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("tok_offset").alias("off_sum"),
                    F.max("tok_offset").alias("off_max"),
                    F.count_distinct("seq_id").alias("n_seq"),
                ).collect()[0]
                runs.append(round(time.monotonic() - t0, 2))
            sums[label] = (agg["n"], agg["off_sum"], agg["off_max"],
                           agg["n_seq"])
            row[label] = {"sec": min(runs), "runs": runs}
        row["checksum_match"] = sums["single_window"] == sums["bucketed_32"]
        if size == sizes[0]:
            a = pack_sequences(docs, budget=512, n_buckets=1)
            b = pack_sequences(docs, budget=512, n_buckets=32)
            cols = ["doc_id", "n_tokens", "tok_offset", "seq_id"]
            row["exact_diff_rows"] = (
                a.select(cols).exceptAll(b.select(cols)).count()
                + b.select(cols).exceptAll(a.select(cols)).count()
            )
        results[str(size)] = row
        print(f"  n={size:>9,d}  single={row['single_window']['sec']:7.2f}s"
              f"  bucketed={row['bucketed_32']['sec']:7.2f}s"
              f"  checksum_match={row['checksum_match']}"
              f"  exact_diff={row.get('exact_diff_rows', '-')}", flush=True)
    print(json.dumps({"seed": SEED, "sizes": sizes, "results": results}))


if __name__ == "__main__":
    main()
