"""CSV directory scan (S1) — reference scripts/to_kinesis.py:11-33.

The reference lists a directory and pandas-reads each ``*.csv`` into one
frame; Spark's csv source is natively multi-file (and multi-node), so the
listing loop collapses into one ``spark.read.csv(dir)`` with an explicit
schema (no inferSchema scan at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .. import schemas

#: raw CSV read schemas: timestamps arrive as strings and are parsed
#: explicitly (coerce-on-error) by the cleaning layer, mirroring the
#: reference's lazy parse (scripts/glue_scripts.py:113-119).
_STR = T.StringType()


def _as_string_schema(schema: T.StructType) -> T.StructType:
    return T.StructType([T.StructField(f.name, _STR if isinstance(f.dataType, T.TimestampType) else f.dataType, True) for f in schema])


def scan_csv_dir(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S1: read every ``*.csv`` under ``path`` with the given schema."""
    return spark.read.schema(schema).option("header", True).csv(path)


def load_reference_trip_csvs(
    spark: SparkSession, data_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Load the reference's Trip_Start/Trip_End CSVs and tag ``data_type``
    (reference scripts/to_kinesis.py:14-16, 27-29: tagging happens at load).
    Timestamps parsed with null-on-failure semantics (P4)."""
    start_raw = scan_csv_dir(
        spark, f"{data_dir}/Trip_Start", _as_string_schema(schemas.TRIP_START)
    )
    end_raw = scan_csv_dir(
        spark, f"{data_dir}/Trip_End", _as_string_schema(schemas.TRIP_END)
    )
    start = (
        start_raw.withColumn("data_type", F.lit("trip_start"))
        .withColumn("pickup_datetime", F.to_timestamp("pickup_datetime"))
        .withColumn(
            "estimated_dropoff_datetime", F.to_timestamp("estimated_dropoff_datetime")
        )
    )
    end = end_raw.withColumn("data_type", F.lit("trip_end")).withColumn(
        "dropoff_datetime", F.to_timestamp("dropoff_datetime")
    )
    return start, end
