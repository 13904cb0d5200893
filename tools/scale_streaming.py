"""Scale-proof of the streaming matcher + windowed KPI under volume.

The reference's own 9,998-event replay (bench.py streaming section) is
overhead-dominated — nothing shows state-store behavior when the join
state actually grows. This harness generates a deterministic synthetic
trip stream at 10× / 100× the reference's event count (N/2 trips →
start+end events, event-time ordered, split into 16 JSON files so
start/end usually land in different micro-batches; maxFilesPerTrigger=4
forces 4 real micro-batches per replay), replays it through
`stream_match_start_end` → parquet sink → `streaming_kpi_daily`, and
reports events/s plus PEAK STATE ROWS (from the stream's progress
telemetry) for both the default (HDFS-backed) and RocksDB state-store
providers. Results go in SCALE.md.

Usage: python tools/scale_streaming.py [--events 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def generate(spark, n_events: int, out_dir: str) -> None:
    """Deterministic synthetic stream, all JVM-side: pickups spread
    uniformly over a 10-day window (→ ~10 daily KPI rows at every size),
    dropoffs 5–25 min later; fares cycle over 80 values."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark import schemas

    n_trips = n_events // 2
    spacing = 10 * 86400.0 / n_trips  # seconds between pickups
    base = F.to_timestamp(F.lit("2024-03-01 00:00:00"))
    t = spark.range(n_trips)
    starts = t.select(
        F.concat(F.lit("trip_"), F.col("id")).alias("trip_id"),
        (base + F.make_interval(secs=F.col("id").cast("double") * spacing))
        .alias("pickup_datetime"),
        F.lit("trip_start").alias("data_type"),
        (F.col("id") % 200).cast("int").alias("pickup_location_id"),
        ((F.col("id") + 7) % 200).cast("int").alias("dropoff_location_id"),
        (F.col("id") % 3 + 1).cast("int").alias("vendor_id"),
        (
            base
            + F.make_interval(
                secs=F.col("id").cast("double") * spacing + 900.0
            )
        ).alias("estimated_dropoff_datetime"),
        (F.lit(5.0) + (F.col("id") % 80) * 0.5).alias("estimated_fare_amount"),
        F.concat(F.lit("rs_"), F.col("id")).alias("record_id"),
    )
    ends = t.select(
        F.concat(F.lit("trip_"), F.col("id")).alias("trip_id"),
        (
            base
            + F.make_interval(
                secs=F.col("id").cast("double") * spacing
                + (300 + (F.col("id") % 1200)).cast("double")
            )
        ).alias("dropoff_datetime"),
        F.lit("trip_end").alias("data_type"),
        (F.col("id") % 2 + 1).cast("double").alias("rate_code"),
        (F.col("id") % 4 + 1).cast("double").alias("payment_type"),
        (F.lit(5.0) + (F.col("id") % 80) * 0.5).alias("fare_amount"),
        ((F.col("id") % 300) / 10.0 + 0.5).alias("trip_distance"),
        ((F.col("id") % 20) / 4.0).alias("tip_amount"),
        (F.col("id") % 2 + 1).cast("double").alias("trip_type"),
        (F.col("id") % 4 + 1).cast("double").alias("passenger_count"),
        F.concat(F.lit("re_"), F.col("id")).alias("record_id"),
    )
    from real_time_trip_processing_spark.operators.sets import union_all

    events = union_all(starts, ends).withColumn(
        "event_time", F.coalesce("pickup_datetime", "dropoff_datetime")
    )
    cols = [f.name for f in schemas.TRIP_EVENT]
    (
        events.repartitionByRange(16, "event_time")
        .select(*cols)
        .write.mode("overwrite")
        .json(out_dir)
    )
    # The file source orders micro-batches by MODIFICATION TIME, and the
    # parallel write scrambles mtimes — a later-range file landing in an
    # earlier batch advances the watermark past whole earlier files,
    # which then drop as late (measured: half the matches gone). Stamp
    # ascending mtimes in part-number (= event-time range) order so the
    # replay is the event-time-ordered ingest the producer contract
    # promises.
    parts = sorted(
        f for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".json")
    )
    t0 = time.time() - len(parts) - 60
    for i, f in enumerate(parts):
        os.utime(os.path.join(out_dir, f), (t0 + i, t0 + i))


def replay(spark, replay_dir: str, work: str, tag: str) -> dict:
    """One full replay: matcher → parquet, then windowed KPI. Returns
    wall + peak state rows per stage."""
    from real_time_trip_processing_spark.streaming import (
        split_start_end,
        stream_match_start_end,
        stream_trip_events,
    )
    from real_time_trip_processing_spark.streaming.kpis import (
        streaming_kpi_daily,
    )

    completed_dir = os.path.join(work, f"completed_{tag}")
    t0 = time.perf_counter()
    ev = stream_trip_events(spark, replay_dir, max_files_per_trigger=4)
    s, e = split_start_end(ev)
    completed = stream_match_start_end(s, e, watermark="24 hours")
    q = (
        completed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", completed_dir)
        .option("checkpointLocation", os.path.join(work, f"ck_m_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    match_sec = time.perf_counter() - t0
    match_state = max(
        (
            so.get("numRowsTotal", 0)
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        ),
        default=0,
    )
    n_completed = spark.read.parquet(completed_dir).count()

    t1 = time.perf_counter()
    cs = spark.readStream.schema(
        spark.read.parquet(completed_dir).schema
    ).parquet(completed_dir)
    kq = (
        streaming_kpi_daily(cs)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(f"scale_stream_kpi_{tag}")
        .option("checkpointLocation", os.path.join(work, f"ck_k_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    kq.awaitTermination(3600)
    kpi_sec = time.perf_counter() - t1
    n_kpi = spark.sql(f"SELECT COUNT(*) FROM scale_stream_kpi_{tag}").first()[0]
    return {
        "match_sec": round(match_sec, 2),
        "kpi_sec": round(kpi_sec, 2),
        "peak_state_rows": int(match_state),
        "n_completed": int(n_completed),
        "n_kpi_rows": int(n_kpi),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    args = ap.parse_args()

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("scale-streaming")
    work = tempfile.mkdtemp(prefix="scale_stream_")
    results: dict = {}
    try:
        sizes = [s for s in (100_000, 1_000_000) if s <= args.events]
        for n in sizes:
            rdir = os.path.join(work, f"replay_{n}")
            generate(spark, n, rdir)
            for provider, label in ((None, "hdfs"), (ROCKSDB, "rocksdb")):
                key = f"{label}_{n}"
                if provider:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass",
                        provider,
                    )
                else:
                    spark.conf.unset(
                        "spark.sql.streaming.stateStore.providerClass"
                    )
                try:
                    r = replay(spark, rdir, work, key)
                    r["events_per_sec"] = round(
                        n / (r["match_sec"] + r["kpi_sec"]), 1
                    )
                    results[key] = r
                    print(f"  {label:8s} n={n:>9,d}  match={r['match_sec']:7.2f}s"
                          f"  kpi={r['kpi_sec']:6.2f}s"
                          f"  state={r['peak_state_rows']:,d}"
                          f"  {r['events_per_sec']:,.0f} ev/s"
                          f"  completed={r['n_completed']:,d}"
                          f"  kpi_rows={r['n_kpi_rows']}", flush=True)
                except Exception as ex:  # provider unavailable etc.
                    results[key] = {"error": str(ex)[:300]}
                    print(f"  {label:8s} n={n:,d}  FAILED: {str(ex)[:200]}",
                          flush=True)
        print(json.dumps({"results": results}))
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
