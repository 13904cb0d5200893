"""Isolated noop-sink timing of named declared queries — the round-12
A/B probe. Reuses bench.run_one's exact discipline (clearCache + gc
before every steady run, noop sink, median of N) so probe numbers are
directly comparable to the bench's per-query medians.

Usage: python tools/probe_queries.py [--sf DIR] [--runs N] query ...
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from real_time_trip_processing_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("rtp-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.main: flagship query + a pandas UDF touch
    bench.run_one(spark, "kpi_daily", args.sf)
    from pyspark.sql import functions as F

    warm = F.pandas_udf(lambda s: s, "long")
    spark.range(8).select(warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    print(f"loadavg={os.getloadavg()}")
    for name in args.queries:
        cold = bench.run_one(spark, name, args.sf)
        runs = sorted(
            bench.run_one(spark, name, args.sf, gc_first=True)
            for _ in range(args.runs)
        )
        med = statistics.median(runs)
        print(
            f"{name}: median={med:.4f} cold={cold:.4f} "
            f"spread=[{runs[0]:.4f}, {runs[-1]:.4f}]"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
