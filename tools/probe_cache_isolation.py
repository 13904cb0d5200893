"""Measure the warm-cache interplay in bench.run_one (r11 'Not yet
optimized' item): a query that persists internally (the minhash
signature frame, the pack ledger, an IVF serve frame) populates the
CacheManager on its first run, and Spark's plan-matching lets runs 2-5
of the SAME query reuse those blocks — so the recorded steady median
measures the warm-cache path, not five independent computations from
parquet.

This probe times every headline query both ways on one JVM:
  warm  — the bench's current discipline (clearCache only AFTER the
          query's runs; steady runs may reuse the query's own cache)
  cold  — clearCache + gc BEFORE every steady run (each run computes
          from the parquet inputs alone)
and prints a table of medians with the ratio, so the affected set and
the magnitude are measured rather than guessed.

Usage: python tools/probe_cache_isolation.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from real_time_trip_processing_spark.plans import REGISTRY
from real_time_trip_processing_spark.session import get_spark


def one_run(spark, name: str, sf_dir: str, isolate: bool) -> float:
    """Times one run WITHOUT bench.run_one (which, since the r11 fix
    this probe motivated, always isolates): clear before the builder
    (so the query's own design persists stay registered), or not at
    all for the warm arm."""
    if isolate:
        spark.catalog.clearCache()
    df = REGISTRY[name].builder(spark, sf_dir)
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def medians(spark, name: str, sf_dir: str, isolate: bool) -> float:
    runs = [
        one_run(spark, name, sf_dir, isolate) for _ in range(bench.N_RUNS)
    ]
    return round(statistics.median(runs), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("probe-cache-isolation")
    spark.sparkContext.setLogLevel("ERROR")
    bench.run_one(spark, "kpi_daily", sf_dir)  # the bench's own warm-up

    out = {}
    for name in names:
        bench.run_one(spark, name, sf_dir)  # cold run, uncounted
        warm = medians(spark, name, sf_dir, isolate=False)
        spark.catalog.clearCache()
        cold = medians(spark, name, sf_dir, isolate=True)
        spark.catalog.clearCache()
        ratio = round(cold / warm, 2) if warm else None
        out[name] = {"warm_median": warm, "cold_median": cold, "ratio": ratio}
        flag = "  <-- cache-assisted" if ratio and ratio >= 1.3 else ""
        print(f"{name:36s} warm={warm:7.3f} cold={cold:7.3f} x{ratio}{flag}",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
