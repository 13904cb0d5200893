"""Projection / filter / cleaning operators (SURVEY §2.2, P1-P11).

All are single declarative expressions — Catalyst pushes the filters to
the parquet scan and prunes unused columns, which is the whole-plan
replacement for the reference's record-at-a-time validation loops
(reference scripts/lambda1.py:35-101, scripts/glue_scripts.py:109-126).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def project_required(df: DataFrame, type_col: str = "data_type") -> DataFrame:
    """P1: extract key/type and pick the event-time field per event type
    (reference scripts/lambda1.py:35-43 — trip_start carries
    pickup_datetime, trip_end carries dropoff_datetime)."""
    event_time = F.when(
        F.col(type_col) == "trip_start", F.col("pickup_datetime")
    ).otherwise(F.col("dropoff_datetime"))
    return df.withColumn("event_time", event_time)


def filter_required_fields(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P2: drop records missing any required field
    (reference scripts/lambda1.py:45-47)."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond)


def clean_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P3: NaN/Infinity numerics → null (the reference rejects them at
    serialization, scripts/lambda1.py:72-82; we null them so downstream
    aggregates skip them identically)."""
    out = df
    for c in cols:
        col = F.col(c)
        out = out.withColumn(
            c,
            F.when(F.isnan(col) | col.isin(float("inf"), float("-inf")), F.lit(None)).otherwise(col),
        )
    return out


def coerce_timestamp(df: DataFrame, cols: Sequence[str], drop: bool = True) -> DataFrame:
    """P4: parse string → timestamp with null-on-failure, optionally drop
    failures (reference scripts/glue_scripts.py:113-119, errors='coerce'
    + dropna). try_to_timestamp, not to_timestamp: under ANSI mode the
    plain parse *throws* on malformed input."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.try_to_timestamp(F.col(c)))
    if drop:
        out = filter_required_fields(out, cols)
    return out


def coerce_numeric(df: DataFrame, cols: Sequence[str], drop: bool = True) -> DataFrame:
    """P5: cast → double with null-on-failure, optionally drop failures
    (reference scripts/glue_scripts.py:121-126). try_cast ≡ pandas
    errors='coerce' under ANSI mode."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.col(c).try_cast("double"))
    out = clean_numeric(out, list(cols))
    if drop:
        out = filter_required_fields(out, cols)
    return out


def filter_prefix(df: DataFrame, col: str, prefix: str) -> DataFrame:
    """P6: keep rows whose ``col`` starts with ``prefix`` — the reference's
    sort-key prefix filter (scripts/lambda2.py:203-206, begins_with)."""
    return df.filter(F.col(col).startswith(prefix))


def filter_event_kind(df: DataFrame, col: str, kinds: Sequence[str]) -> DataFrame:
    """P7: keep only valid event kinds (reference scripts/lambda2.py:209-212)."""
    return df.filter(F.col(col).isin(list(kinds)))


def derive_date(df: DataFrame, ts_col: str, out_col: str = "pickup_date") -> DataFrame:
    """P8: calendar-day bucket column (reference scripts/glue_scripts.py:136)."""
    return df.withColumn(out_col, F.to_date(F.col(ts_col)))


def derive_raw_sort_key(type_col: Column, ts_col: Column) -> Column:
    """P9: composite sort key ``RAW#{data_type}#{timestamp}``
    (reference scripts/lambda1.py:53-61)."""
    return F.format_string(
        "RAW#%s#%s", type_col, F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss")
    )


def audit_cols(df: DataFrame, stage: str) -> DataFrame:
    """P11: processing timestamp + correlation uuid
    (reference scripts/lambda1.py:91, scripts/lambda2.py:88-89).
    Non-deterministic by design — excluded from oracle-checked queries."""
    return df.withColumn(f"processing_ts_{stage}", F.current_timestamp()).withColumn(
        "correlation_id", F.expr("uuid()")
    )
