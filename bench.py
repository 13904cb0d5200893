"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully distributed via the no-op sink (no driver
collect). Each headline query runs twice and the steady-state second
run is reported ("queries"/"value"); the first-run total is published
as "cold_total" — the delta is one-time JVM codegen/JIT latency, a
fixed cost that measures the harness, not the plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_trip_processing_spark.plans import REGISTRY
from real_time_trip_processing_spark.session import get_spark

#: headline queries: the flagship KPI path, the matcher join, the heavy
#: relational aggs, and one of each extension family.
HEADLINE = [
    "kpi_daily",
    "match_start_end",
    "pricing_summary",
    "region_revenue",
    "topk_per_group",
    "dedup_keyed",
    "sessionize",
    "dedup_exact_text",
    "dedup_near_minhash",
    "dedup_near_embedding",
    "sim_topk",
    "text_stats",
    "window_showcase",
    "asof_join",
    "range_join_1h",
    "corpus_prep",
    "repeated_substrings",
    "shard_manifest",
    "top_unshipped_orders",
    "customer_order_dist",
    "embedding_centroids",
    "nation_part_profit",
    "local_supplier_volume",
    "large_volume_customers",
]


def run_one(spark, name: str, sf_dir: str) -> float:
    df = REGISTRY[name].builder(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("rtp-bench")

    # warm-up: run the flagship once so JVM/codegen/parquet-footer costs
    # don't land on the first measured query, and touch a Pandas UDF so
    # Python-worker/Arrow startup doesn't land on the vector entries
    run_one(spark, "kpi_daily", sf_dir)
    import pandas as pd
    from pyspark.sql import functions as F

    warm = F.pandas_udf(lambda s: s, "long")
    spark.range(8).select(warm("id")).write.mode("overwrite").format("noop").save()

    # Each query runs twice: the second (steady-state) run is the
    # headline number — first-run times are dominated by one-time JVM
    # codegen/JIT latency (a fixed ~seconds cost that is noise at any
    # real data scale), not by the plan. The cold (first-run) total is
    # still published alongside, so nothing is hidden.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        cold[name] = round(run_one(spark, name, sf_dir), 4)
        timings[name] = round(run_one(spark, name, sf_dir), 4)

    # apples-to-apples vs the reference: its own 4,999-trip dataset end
    # to end (load CSVs → clean/match → daily KPIs). The reference takes
    # ≈1,000 s to replay + three AWS stages (BASELINE.md); this is the
    # same result as one Spark job.
    ref_data = "/root/reference/data"
    if os.path.isdir(ref_data):
        from real_time_trip_processing_spark import pipeline
        from real_time_trip_processing_spark.sources.csv_dir import (
            load_reference_trip_csvs,
        )

        t0 = time.perf_counter()
        starts, ends = load_reference_trip_csvs(spark, ref_data)
        pipeline.daily_kpis(pipeline.match(starts, ends)).write.mode(
            "overwrite"
        ).format("noop").save()
        timings["reference_pipeline_e2e"] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total": round(sum(cold.values()) + timings.get(
                    "reference_pipeline_e2e", 0.0), 4),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
