"""Report sink (SURVEY §2.1 S7): the reference's nested JSON daily-KPI
report (scripts/glue_scripts.py:184-253) — a dated path per run plus a
fixed ``latest/`` overwrite.

The document shape is reproduced exactly:
{"metadata": {"generated_at", "generated_timestamp", "record_count",
 "date_range": {"start_date", "end_date"}}, "daily_kpis": [...]}
"""

from __future__ import annotations

import calendar
import time

from pyspark.sql import DataFrame, functions as F


def build_report(kpis: DataFrame, completed: DataFrame, ts_col: str = "pickup_datetime") -> DataFrame:
    """Assemble the one-row nested report document: global metadata
    (A7, reference scripts/glue_scripts.py:200-205) + the per-day KPI
    array. The KPI frame is tiny (one row per day) — collect_list on a
    single-row aggregate is driver-safe at any corpus scale."""
    meta = completed.agg(
        # row count, not count(trip_id): parameter-free for callers
        # whose id column is named differently, and immune to a
        # partially-null id column silently understating the count
        F.count(F.lit(1)).alias("record_count"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd").alias("start_date"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd").alias("end_date"),
    )
    kpi_rows = kpis.select(
        F.struct(
            F.date_format("pickup_date", "yyyy-MM-dd").alias("pickup_date"),
            "total_fare",
            "trip_count",
            "average_fare",
            "maximum_fare",
            "minimum_fare",
        ).alias("row")
    ).agg(F.sort_array(F.collect_list("row")).alias("daily_kpis"))
    return meta.crossJoin(kpi_rows).select(
        F.struct(
            F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias(
                "generated_at"
            ),
            F.unix_timestamp().alias("generated_timestamp"),
            F.col("record_count"),
            F.struct("start_date", "end_date").alias("date_range"),
        ).alias("metadata"),
        "daily_kpis",
    )


def write_report(report: DataFrame, base_path: str, now: time.struct_time | None = None) -> str:
    """S7: write the report under ``daily_kpis/YYYY/MM/DD/<epoch>-daily_trip_kpis``
    (reference scripts/glue_scripts.py:16-24) and overwrite
    ``daily_kpis/latest/`` (scripts/glue_scripts.py:237-250)."""
    t = now or time.gmtime()
    # t is a UTC struct_time → timegm, not mktime (mktime would shift the
    # epoch prefix by the host's UTC offset / DST)
    dated = (
        f"{base_path}/daily_kpis/{t.tm_year:04d}/{t.tm_mon:02d}/{t.tm_mday:02d}/"
        f"{calendar.timegm(t)}-daily_trip_kpis"
    )
    latest = f"{base_path}/daily_kpis/latest"
    # persist so the one-row document is computed ONCE and both writes
    # emit identical bytes (generated_at/current_timestamp would
    # otherwise re-evaluate per write; the reference uploads the same
    # serialized document to both paths, glue_scripts.py:237-250)
    one = report.coalesce(1).persist()
    try:
        one.write.mode("overwrite").json(dated)
        one.write.mode("overwrite").json(latest)
    finally:
        one.unpersist()
    return dated
