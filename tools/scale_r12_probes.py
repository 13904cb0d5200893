"""Scale evidence for the r11/r12 plan-shape claims (round-12 verdict
item 3): sf0.1 is overhead-bound (every 8-vs-32-core ratio ~1), so the
ops whose wins are NETWORK-SHAPE arguments are measured here at corpus
sizes where a shuffle costs something — the `scale_containment.py`
pattern.

Ops (pick with --ops):
- dedup_spans      — C4-style span dedup over the zipfian corpus (the
                     r11 metadata-only-decision shuffle claim)
- doc_novelty      — novelty_scores n=8 (the r11 one-exchange
                     attribution claim; hash_grams=True, the documented
                     at-scale dial for 8-gram strings)
- srp_incremental  — the r11 fused cross-side SRP kernel vs its
                     builtin candidate-join cross-check (impl dial) at
                     1M corpus x 10k batch
- minhash_sig      — the r12 fused map-side signature kernel vs the
                     exchange build (impl dial) at 1M docs

Each op: 1 cold + N steady noop-sink runs, every steady run from an
empty CacheManager (the bench's r11 isolation rule). Run twice with
SPARK_GRAFT_CPUS=8 / unset for the core-scaling ratio the verdict asks
for. Prints one JSON line per op.

Usage: python tools/scale_r12_probes.py [--docs 1000000]
       [--vecs 1000000] [--batch 10000] [--runs 2] [--skip-gen]
       [--ops dedup_spans,doc_novelty,srp_incremental,minhash_sig]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_text import OUT as DOCS_OUT, generate as gen_docs  # noqa: E402
import scale_vectors as SV  # noqa: E402

VECS_OUT = os.path.join(os.path.dirname(DOCS_OUT), "vectors_big")


def timeit(spark, name, build, runs, meta):
    walls = []
    for i in range(runs + 1):
        df = build()
        if i > 0:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        walls.append(round(time.perf_counter() - t0, 3))
    steady = sorted(walls[1:])
    print(json.dumps({
        "op": name,
        "cold": walls[0],
        "steady_median": statistics.median(steady),
        "steady": steady,
        "cpus": spark.sparkContext.defaultParallelism,
        **meta,
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vecs", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--ops",
        default="dedup_spans,doc_novelty,srp_incremental,minhash_sig",
    )
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("scale-r12")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"loadavg": os.getloadavg(),
                      "cpus": spark.sparkContext.defaultParallelism}),
          flush=True)

    need_docs = ops & {"dedup_spans", "doc_novelty", "minhash_sig"}
    need_vecs = ops & {"srp_incremental"}
    if need_docs and not (args.skip_gen and os.path.exists(DOCS_OUT)):
        gen_docs(args.docs, DOCS_OUT)
    if need_vecs and not (args.skip_gen and os.path.exists(VECS_OUT)):
        SV.generate(args.vecs, VECS_OUT)

    if need_docs:
        docs = spark.read.parquet(DOCS_OUT)
        n_docs = docs.count()
    if need_vecs:
        vecs = spark.read.parquet(VECS_OUT)
        n_vecs = vecs.count()

    if "dedup_spans" in ops:
        from real_time_trip_processing_spark.operators.dedup import dedup_spans

        timeit(spark, "dedup_spans",
               lambda: dedup_spans(docs, span_words=16),
               args.runs, {"docs": n_docs})

    if "doc_novelty" in ops:
        from real_time_trip_processing_spark.functions.curation import (
            novelty_scores,
        )

        timeit(spark, "doc_novelty",
               lambda: novelty_scores(docs, n=8, hash_grams=True),
               args.runs, {"docs": n_docs})

    if "minhash_sig" in ops:
        from real_time_trip_processing_spark.functions.minhash import (
            minhash_signatures,
        )

        timeit(spark, "minhash_sig_exchange",
               lambda: minhash_signatures(docs, det=True, impl="exchange"),
               args.runs, {"docs": n_docs})
        timeit(spark, "minhash_sig_fused",
               lambda: minhash_signatures(docs, det=True, impl="fused"),
               args.runs, {"docs": n_docs})

    if "srp_incremental" in ops:
        from pyspark.sql import functions as F

        from real_time_trip_processing_spark.functions.similarity import (
            srp_incremental_pairs,
        )

        batch = vecs.filter(F.col("vec_id") < args.batch)
        corpus = vecs.filter(F.col("vec_id") >= args.batch)
        for impl in ("builtin", "arrow"):
            timeit(
                spark, f"srp_incremental_{impl}",
                lambda impl=impl: srp_incremental_pairs(
                    batch, corpus, num_bits=80, bands=4, threshold=0.9,
                    dim=SV.DIM, impl=impl,
                ),
                args.runs, {"corpus": n_vecs - args.batch,
                            "batch": args.batch},
            )


if __name__ == "__main__":
    main()
