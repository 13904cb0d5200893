"""Streaming daily KPIs (SURVEY §2.5 A6 streaming flavor, §2.10).

The reference computes KPIs with a scheduled batch scan
(scripts/glue_scripts.py); the streaming-native form is a tumbling
1-day event-time window over completed trips. Both are exposed:
``trigger(availableNow=True)`` turns the same query into the reference's
"run on schedule" batch-over-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_sessions(
    events: DataFrame,
    ts_col: str = "event_time",
    key: str = "trip_id",
    gap: str = "30 minutes",
    watermark: str = "1 day",
    value_col: str | None = None,
) -> DataFrame:
    """Event-time session windows per key — the streaming twin of the
    batch sessionize query (plans/relational_queries.py): a session
    closes after ``gap`` of inactivity and emits once the watermark
    passes its end. ``session_window`` keeps state per *open* session
    only, so state is bounded by active keys, not history."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(key))
        .agg(*aggs)
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *(["n_events", "total_value"] if value_col is not None
              else ["n_events"]),
        )
    )


def streaming_kpi_15min(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    watermark: str = "1 hour",
) -> DataFrame:
    """The streaming twin of the batch ``kpi_15min`` query and the
    finest level of the rollup cascade (plans/analytic_queries.py
    ``rollup_cascade``): 15-minute tumbling buckets per event type.

    Materialize it with ``keyed_upsert_foreach_batch`` (update mode) and
    every coarser resolution — hourly, daily — is a cheap batch
    re-aggregate of the materialized rollup, never of raw events. This
    is the continuous-aggregate pattern: the stream maintains only the
    finest level's state (bounded by watermark horizon × #types), and
    100 TB of raw history is scanned zero times after ingest."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "15 minutes").alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            type_col,
            "n",
            "total_value",
        )
    )


def streaming_kpi_daily(
    completed: DataFrame,
    ts_col: str = "pickup_datetime",
    value_col: str = "fare_amount",
    id_col: str = "trip_id",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling daily window over the completed-trip stream. In append
    mode a day's row emits once the watermark passes day end — the
    streaming analog of the Glue job's daily rows
    (reference scripts/glue_scripts.py:139-175)."""
    return (
        completed.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 day").alias("day"))
        .agg(
            F.sum(value_col).alias("total_fare"),
            F.count(id_col).alias("trip_count"),
            F.avg(value_col).alias("average_fare"),
            F.max(value_col).alias("maximum_fare"),
            F.min(value_col).alias("minimum_fare"),
        )
        .select(
            F.col("day.start").alias("pickup_date"),
            "total_fare",
            "trip_count",
            "average_fare",
            "maximum_fare",
            "minimum_fare",
        )
    )
