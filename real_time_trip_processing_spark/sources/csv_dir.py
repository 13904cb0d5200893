"""CSV directory scan (S1) — reference scripts/to_kinesis.py:11-33.

The reference lists a directory and pandas-reads each ``*.csv`` into one
frame; Spark's csv source is natively multi-file (and multi-node), so
the listing loop collapses into one ``spark.read.csv(dir)`` with an
explicit schema (no inferSchema scan at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

#: file-order schemas for the reference's CSVs (explicit schemas map
#: positionally; header row is skipped). Timestamps arrive as strings
#: and are parsed with null-on-failure (P4) below, mirroring the
#: reference's lazy parse (scripts/glue_scripts.py:113-119).
TRIP_START_CSV = T.StructType(
    [
        T.StructField("trip_id", T.StringType()),
        T.StructField("pickup_location_id", T.IntegerType()),
        T.StructField("dropoff_location_id", T.IntegerType()),
        T.StructField("vendor_id", T.IntegerType()),
        T.StructField("pickup_datetime", T.StringType()),
        T.StructField("estimated_dropoff_datetime", T.StringType()),
        T.StructField("estimated_fare_amount", T.DoubleType()),
    ]
)

TRIP_END_CSV = T.StructType(
    [
        T.StructField("dropoff_datetime", T.StringType()),
        T.StructField("rate_code", T.DoubleType()),
        T.StructField("passenger_count", T.DoubleType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("payment_type", T.DoubleType()),
        T.StructField("trip_type", T.DoubleType()),
        T.StructField("trip_id", T.StringType()),
    ]
)


def scan_csv_dir(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S1: read every ``*.csv`` under ``path`` with the given schema."""
    return spark.read.schema(schema).option("header", True).csv(path)


def load_reference_trip_csvs(
    spark: SparkSession, data_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Load Trip_Start/Trip_End CSV dirs, tag ``data_type`` and a
    ``record_id`` uuid (D2 — reference scripts/to_kinesis.py:51-61,
    75-87), and parse event-time columns null-on-failure."""
    start = (
        scan_csv_dir(spark, f"{data_dir}/Trip_Start", TRIP_START_CSV)
        .withColumn("data_type", F.lit("trip_start"))
        .withColumn("record_id", F.expr("uuid()"))
        # try_to_timestamp, not to_timestamp: Spark 4 runs ANSI mode by
        # default, where strict to_timestamp THROWS on a malformed cell
        # and kills the batch — the documented contract here (and the
        # reference's lambda1 behavior) is null-on-failure (the same
        # reason operators/cleaning.coerce_timestamp uses it)
        .withColumn("pickup_datetime", F.try_to_timestamp("pickup_datetime"))
        .withColumn(
            "estimated_dropoff_datetime",
            F.try_to_timestamp("estimated_dropoff_datetime"),
        )
    )
    end = (
        scan_csv_dir(spark, f"{data_dir}/Trip_End", TRIP_END_CSV)
        .withColumn("data_type", F.lit("trip_end"))
        .withColumn("record_id", F.expr("uuid()"))
        .withColumn("dropoff_datetime", F.try_to_timestamp("dropoff_datetime"))
    )
    return start, end
