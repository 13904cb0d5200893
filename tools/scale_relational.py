"""Scale-proof of the relational path beyond the driver's sf0.1.

sf0.1's lineitem is ~600k rows — the heavy relational queries there
measure low-hundreds of milliseconds, mostly fixed overhead. This
harness UPSCALES the sf0.1 tables deterministically: the fact tables
(orders, lineitem) are replicated K times with order keys shifted by
K_i * OFFSET (referential integrity preserved — every replicated line
still joins its replicated order), while the dimensions (customer,
supplier, part, nation, region) stay fixed, exactly how a real
warehouse grows. No randomness: the K-fold corpus is a pure function
of the driver's own testdata.

Timed at K = 1 / 4 / 16 (≈0.6M / 2.4M / 9.6M lineitem rows) with the
same discipline as bench.py (1 cold + 3 steady runs, pre-run GC,
median reported). Results go in SCALE.md.

Usage: python tools/scale_relational.py [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)
KS = (1, 4, 16)
#: key shift per replica — far above any real orderkey in the testdata
OFFSET = 10_000_000_000

DIMS = ("region", "nation", "customer", "supplier", "part")
QUERIES = (
    "pricing_summary",
    "top_unshipped_orders",
    "large_volume_customers",
    "nation_part_profit",
    "local_supplier_volume",
    "region_revenue",
    "bloom_semi_join",
)


def build(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.sources.tables import table

    out = os.path.join(ROOT, f"relational_x{k}")
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for name in DIMS:
        table(spark, SF_DIR, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    for name, keys in (("orders", ["o_orderkey"]),
                       ("lineitem", ["l_orderkey"])):
        src = table(spark, SF_DIR, name)
        reps = []
        for i in range(k):
            r = src
            for c in keys:
                r = r.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            reps.append(r)
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from real_time_trip_processing_spark.plans import REGISTRY
    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("scale-relational")
    results: dict[str, dict] = {}
    for k in KS:
        out = os.path.join(ROOT, f"relational_x{k}")
        if not args.skip_gen or not os.path.exists(out):
            t0 = time.monotonic()
            build(spark, k)
            print(f"built x{k} in {time.monotonic()-t0:.1f}s", flush=True)
        for name in QUERIES:
            runs = []
            for _ in range(4):
                df = REGISTRY[name].builder(spark, out)
                spark.sparkContext._jvm.System.gc()
                t0 = time.monotonic()
                df.write.mode("overwrite").format("noop").save()
                runs.append(round(time.monotonic() - t0, 3))
            med = round(statistics.median(runs[1:]), 3)
            results.setdefault(name, {})[str(k)] = {
                "sec": med, "cold_sec": runs[0], "runs": runs,
            }
            print(f"  x{k:<3d} {name:24s} {med:7.3f}s (cold {runs[0]:.2f})",
                  flush=True)
    print(json.dumps({"base_sf_dir": SF_DIR, "ks": list(KS),
                      "results": results}))


if __name__ == "__main__":
    main()
