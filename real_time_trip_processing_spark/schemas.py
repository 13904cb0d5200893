"""Explicit StructTypes — the engine's public data contract.

The reference is schema-on-read (lambda1 copies every JSON key with
per-value type sniffing, reference scripts/lambda1.py:63-88); we declare
the de-facto producer schemas (reference scripts/to_kinesis.py:48-87,
confirmed against data/Trip_Start/trip_start.csv and
data/Trip_End/trip_end.csv) as the engine's contract, with a
`payload` MapType escape hatch available for dynamic pass-through.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- trip event stream ------------------------------------------------------

#: trip_start wire schema (reference scripts/to_kinesis.py:48-61)
TRIP_START = T.StructType(
    [
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("pickup_datetime", T.TimestampType(), True),
        T.StructField("data_type", T.StringType(), False),
        T.StructField("pickup_location_id", T.IntegerType(), True),
        T.StructField("dropoff_location_id", T.IntegerType(), True),
        T.StructField("vendor_id", T.IntegerType(), True),
        T.StructField("estimated_dropoff_datetime", T.TimestampType(), True),
        T.StructField("estimated_fare_amount", T.DoubleType(), True),
        T.StructField("record_id", T.StringType(), True),
    ]
)

#: trip_end wire schema (reference scripts/to_kinesis.py:72-87)
TRIP_END = T.StructType(
    [
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("dropoff_datetime", T.TimestampType(), True),
        T.StructField("data_type", T.StringType(), False),
        T.StructField("rate_code", T.DoubleType(), True),
        T.StructField("payment_type", T.DoubleType(), True),
        T.StructField("fare_amount", T.DoubleType(), True),
        T.StructField("trip_distance", T.DoubleType(), True),
        T.StructField("tip_amount", T.DoubleType(), True),
        T.StructField("trip_type", T.DoubleType(), True),
        T.StructField("passenger_count", T.DoubleType(), True),
        T.StructField("record_id", T.StringType(), True),
    ]
)

#: union-of-both event envelope used on the single interleaved stream
#: (reference scripts/to_kinesis.py:117-120 unions starts+ends into one
#: event_time-ordered stream; missing columns are null).
TRIP_EVENT = T.StructType(
    sorted(
        {f.name: f for f in list(TRIP_START) + list(TRIP_END)}.values(),
        key=lambda f: f.name,
    )
)

#: daily KPI output row (reference data/24-daily_trip_kpis.csv:1)
DAILY_KPIS = T.StructType(
    [
        T.StructField("pickup_date", T.DateType(), True),
        T.StructField("total_fare", T.DoubleType(), True),
        T.StructField("trip_count", T.LongType(), True),
        T.StructField("average_fare", T.DoubleType(), True),
        T.StructField("maximum_fare", T.DoubleType(), True),
        T.StructField("minimum_fare", T.DoubleType(), True),
    ]
)

# --- driver testdata (TPC-H-ish star schema + events/documents/embeddings) --

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
