"""Composed end-to-end jobs — the reference's three paths re-expressed
as Spark jobs (SURVEY §3).

batch flavor:   ingest_clean (Lambda 1) → match (Lambda 2) → daily_report
                (Glue job + S3 report)
streaming flavor: streaming/*.py wires the same operators behind
                readStream/writeStream (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import aggregates as A
from .operators import cleaning as P
from .operators.dedup import dedup_keyed
from .operators.joins import match_start_end
from .sources.csv_dir import load_reference_trip_csvs
from .streaming.notify import notify_completion
from .streaming.report import build_report, write_report


def ingest_clean(events: DataFrame) -> DataFrame:
    """Lambda 1 equivalent (reference scripts/lambda1.py:19-101):
    required-field validation, event-time pick, NaN/Inf cleaning,
    first-occurrence dedup per (trip_id, data_type, event_time)."""
    out = P.project_required(events)
    out = P.filter_required_fields(out, ["trip_id", "data_type", "event_time"])
    numeric_cols = [
        f.name
        for f in out.schema
        if f.dataType.typeName() == "double"
    ]
    out = P.clean_numeric(out, numeric_cols)
    return dedup_keyed(out, ["trip_id", "data_type"], ["event_time"])


def match(starts: DataFrame, ends: DataFrame) -> DataFrame:
    """Lambda 2 equivalent: first-match-wins join + merge
    (reference scripts/lambda2.py:27-109)."""
    return match_start_end(
        starts,
        ends,
        key="trip_id",
        start_order=("pickup_datetime",),
        end_order=("dropoff_datetime",),
    )


def daily_kpis(completed: DataFrame) -> DataFrame:
    """Glue-job KPI core (reference scripts/glue_scripts.py:109-175):
    required-column coercion then the five KPIs in one groupBy.
    pickup_date is a DateType here (report semantics), unlike the
    oracle-facing declared queries which emit date_trunc timestamps."""
    df = completed.filter(F.col("status") == "completed")
    df = P.coerce_timestamp(df, ["pickup_datetime"])
    df = P.coerce_numeric(df, ["fare_amount"])
    out = A.kpi_daily(df, "pickup_datetime", "fare_amount", "trip_id")
    return out.withColumn("pickup_date", F.to_date("pickup_date"))


def daily_report(spark: SparkSession, completed: DataFrame, out_dir: str) -> str:
    """Full Glue-path equivalent: KPIs + nested JSON report to the
    dated path and latest/ (reference scripts/glue_scripts.py:91-259)."""
    kpis = daily_kpis(completed)
    report = build_report(kpis, completed, "pickup_datetime")
    return write_report(report, out_dir)


def run_reference_batch(spark: SparkSession, data_dir: str, out_dir: str) -> DataFrame:
    """The whole reference pipeline on its own CSVs: load → clean →
    match → KPIs → report, then the post-job completion notification
    (reference step_functions.json:13-23 publishes {"messagekey1":
    "success"} to SNS after the Glue run). Returns the daily KPI frame."""
    starts, ends = load_reference_trip_csvs(spark, data_dir)
    # the CLEAN stage the docstring promises (reference lambda1
    # validates required fields first, scripts/lambda1.py:45-47):
    # without it, a row whose event time parsed to NULL sorts FIRST in
    # dedup_keyed's ascending order, wins first-match over a valid row
    # for the same trip, and the trip silently vanishes from the KPIs
    # when coerce_timestamp later drops the null
    starts = P.filter_required_fields(starts, ["trip_id", "pickup_datetime"])
    ends = P.filter_required_fields(ends, ["trip_id", "dropoff_datetime"])
    # persist: the report writes this frame twice (dated + latest/) and
    # the returned KPI frame reads it again — without the cache the
    # whole scan+dedup+join DAG re-executes per consumer (and the
    # uuid audit columns would differ between report and return)
    completed = match(starts, ends).persist()
    kpis = daily_kpis(completed)
    try:
        report = build_report(kpis, completed, "pickup_datetime")
        report_path = write_report(report, out_dir)
    except Exception as e:  # the reference's state machine still alerts
        notify_completion(f"{out_dir}/etl_topic", "TripsKPIs", "failure", error=str(e))
        raise
    notify_completion(
        f"{out_dir}/etl_topic", "TripsKPIs", "success", extra={"report_path": report_path}
    )
    return kpis
