"""Streaming daily KPIs (SURVEY §2.5 A6 streaming flavor, §2.10).

The reference computes KPIs with a scheduled batch scan
(scripts/glue_scripts.py); the streaming-native form is a tumbling
1-day event-time window over completed trips. Both are exposed:
``trigger(availableNow=True)`` turns the same query into the reference's
"run on schedule" batch-over-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
