"""Scale-proof of the text/dedup pipeline on a real corpus size.

sf0.1 carries ~10k documents — the text queries there are dominated by
fixed overhead. This harness generates a deterministic corpus (zipfian
vocabulary, ~5% planted exact dups, ~5% planted near-dups via
word-level mutation) as a 32-file parquet directory, then times the
headline text/dedup/LM ops at 25k → 2M docs and prints the scaling
curve as JSON (1 cold + 2 steady runs per op, steady median reported).
Results go in SCALE.md — the round-5 goal is the ≥2M-doc rows that put
the text suite's gram-shuffle designs on the same measured footing as
the vector suite's 1M-row curves.

Usage: python tools/scale_text.py [--docs 2000000] [--skip-gen]
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
MEAN_WORDS = 80
VOCAB = 30_000
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "documents_big")


def generate(n_docs: int, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    rng = np.random.Generator(np.random.PCG64(SEED))
    # zipfian-ish vocabulary: realistic token frequency skew so shingle
    # document frequencies and dedup bucket sizes behave like real text
    vocab = np.array([f"w{i}" for i in range(VOCAB)])
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    langs = np.array(["en", "de", "fr", "es"])
    sources = np.array(["web", "book", "wiki", "forum", "code"])

    per = n_docs // N_FILES
    start = 0
    prev_words = None
    for f in range(N_FILES):
        rows = per if f < N_FILES - 1 else n_docs - per * (N_FILES - 1)
        # vectorized bulk sampling (one zipfian draw per FILE, not per
        # doc) — the per-doc rng.choice of the original harness made
        # >800k-doc generation the bottleneck, not the measurement
        lens = np.maximum(
            8, rng.exponential(MEAN_WORDS, size=rows).astype(np.int64)
        )
        flat = vocab[rng.choice(VOCAB, size=int(lens.sum()), p=probs)]
        offs = np.concatenate(([0], np.cumsum(lens)))
        ids, texts = [], []
        for local in range(rows):
            gid = start + local
            words = flat[offs[local]:offs[local + 1]]
            if gid % 19 == 7 and prev_words is not None:
                words = prev_words                # planted EXACT dup
            elif gid % 19 == 8 and prev_words is not None:
                words = prev_words.copy()         # planted NEAR dup:
                for _ in range(max(1, len(words) // 25)):  # ~4% mutated
                    words[int(rng.integers(len(words)))] = vocab[
                        int(rng.integers(VOCAB))
                    ]
            prev_words = words
            ids.append(gid)
            texts.append(" ".join(words))
        tbl = pa.table({
            "doc_id": pa.array(np.array(ids, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs[np.array(ids) % 4]),
            "source": pa.array(sources[np.array(ids) % 5]),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:05d}.parquet"))
        start += rows


def bench(
    spark, corpus_dir: str, sizes: list[int], ops: list[str] | None = None
) -> dict:
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions import curation as C
    from real_time_trip_processing_spark.functions.minhash import minhash_lsh_pairs
    from real_time_trip_processing_spark.functions.text import doc_lm_score
    from real_time_trip_processing_spark.operators.dedup import (
        dedup_exact_text,
        dedup_spans,
    )

    full = spark.read.parquet(corpus_dir)
    results: dict[str, dict] = {}

    def timed(name, size, build, action="count"):
        if ops is not None and name not in ops:
            return  # --ops filter: e.g. the 8M capped row without the
            # projected-90-min uncapped quadratic row beside it
        runs, n = [], 0
        for _ in range(3):
            df = build()
            t0 = time.monotonic()
            if action == "noop":
                # bench.py's sink: materializes EVERY output column.
                # count() silently prunes ops whose last stage is a
                # row-preserving join/projection (dedup_spans: a left
                # join keeps row count, so count computed NONE of the
                # span work), and a filter-on-output workaround is
                # worse (the predicate pushes down, inlining the whole
                # expression into an un-codegen'd Filter and
                # double-evaluating it).
                df.write.mode("overwrite").format("noop").save()
                n = -1
            else:
                n = df.count()
            runs.append(round(time.monotonic() - t0, 2))
            # per-run isolation (same rule as bench.py): ops that
            # persist internally (the LSH signature+shingle-set frame
            # is ~GBs at 2M docs) must not stack cached copies across
            # runs/sizes and pressure later measurements. (Ruled out as
            # the cause of the 2M minhash wall — that is the hot-bucket
            # quadratic, measured and bounded via max_bucket.)
            spark.catalog.clearCache()
        dt = sorted(runs[1:])[len(runs[1:]) // 2]
        results.setdefault(name, {})[str(size)] = {
            "sec": dt, "cold_sec": runs[0], "runs": runs, "rows": n,
        }
        print(f"  {name:26s} n={size:>8,d}  {dt:7.2f}s  (cold {runs[0]:.2f})"
              f"  rows={n}", flush=True)

    for size in sizes:
        print(f"-- corpus size {size:,}", flush=True)
        docs = full.filter(F.col("doc_id") < size)
        timed("dedup_exact_text", size, lambda: dedup_exact_text(docs))
        timed("dedup_near_minhash_lsh", size,
              lambda: minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8,
                                        threshold=0.5))
        # the hot-bucket dial: star edges for full-signature groups in
        # over-wide buckets, cross-signature pairs dropped there (the
        # measured quadratic term) — compare against the row above
        timed("dedup_near_minhash_capped", size,
              lambda: minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8,
                                        threshold=0.5, max_bucket=500))
        timed("repeated_substrings_hashed", size,
              lambda: C.repeated_ngrams(docs, n=8, min_docs=2,
                                        hash_grams=True))
        timed("doc_novelty_hashed", size,
              lambda: C.novelty_scores(docs, 8, hash_grams=True))
        timed("decontaminate_ngrams", size,
              lambda: C.ngram_decontaminate(
                  docs, bench_pred=F.col("doc_id") % 97 == 0, n=4))
        timed("doc_lm_score", size, lambda: doc_lm_score(docs))
        timed("dedup_spans", size,
              lambda: dedup_spans(docs, span_words=16), action="noop")
        timed("dataset_split_audit", size, lambda: docs.groupBy(
            (F.conv(F.substring(F.md5(F.concat(F.lit("split:v1:"),
             F.col("doc_id").cast("string"))), 1, 8), 16, 10)
             .cast("long") % 100 < 96).alias("is_train"), "source")
            .agg(F.count(F.lit(1)).alias("n")))
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma-separated corpus sizes to measure")
    ap.add_argument("--ops", type=str, default=None,
                    help="comma-separated op names to measure (default all)")
    args = ap.parse_args()

    if not args.skip_gen:
        t0 = time.monotonic()
        generate(args.docs, OUT)
        print(f"generated {args.docs:,} docs in {time.monotonic()-t0:.1f}s "
              f"-> {OUT}", flush=True)

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark()
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [
            s for s in (25_000, 100_000, 200_000, 800_000, 2_000_000)
            if s <= args.docs
        ]
    res = bench(
        spark, OUT, sizes,
        args.ops.split(",") if args.ops else None,
    )
    print(json.dumps({"seed": SEED, "sizes": sizes, "results": res}))


if __name__ == "__main__":
    main()
