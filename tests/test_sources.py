"""Multi-format lake source: ORC/JSON/CSV scans agree with the parquet
tables bit-for-bit, and the columnar scans keep pushdown + pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_spark.sources.formats import (
    convert_lake,
    scan_lake,
)
from real_time_trip_processing_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _hash(df):
    """Order-independent content hash over stringified rows."""
    cols = sorted(df.columns)
    return (
        df.select(
            F.sha2(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]), 256).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10)).alias("s"))
        .first()[0]
    )


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    src = table(spark, SF, "events")
    dst = str(tmp_path / "events_orc")
    convert_lake(src, dst, fmt="orc")
    back = scan_lake(spark, dst, "orc")
    assert back.count() == src.count()
    assert _hash(back) == _hash(src)


def test_orc_partitioned_conversion_prunes(spark, tmp_path):
    src = table(spark, SF, "events").withColumn(
        "etype", F.col("event_type")
    )
    dst = str(tmp_path / "events_orc_part")
    convert_lake(src, dst, fmt="orc", partition_by=["etype"])
    back = scan_lake(spark, dst, "orc").filter(F.col("etype") == "view")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan's selected partitions carry the filter
    assert "etype" in plan
    assert back.count() == src.filter(F.col("event_type") == "view").count()


def test_orc_scan_pushes_filters(spark, tmp_path):
    src = table(spark, SF, "events")
    dst = str(tmp_path / "events_orc_pd")
    convert_lake(src, dst, fmt="orc")
    q = scan_lake(spark, dst, "orc").filter(F.col("value") > 100).select(
        "event_id", "value"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "value" in plan.split("PushedFilters")[1][:80]
    # column pruning: the read schema carries only the projected columns
    assert "ReadSchema" in plan


def test_csv_and_json_schema_first_roundtrip(spark, tmp_path):
    src = table(spark, SF, "nation")
    for fmt in ("json", "csv"):
        dst = str(tmp_path / f"nation_{fmt}")
        src.write.mode("overwrite").format(fmt).option("header", "true").save(dst)
        back = scan_lake(spark, dst, fmt, schema=src.schema)
        assert back.count() == src.count()
        assert _hash(back) == _hash(src)


def test_text_scan_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema-first"):
        scan_lake(spark, str(tmp_path), "json")


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        scan_lake(spark, str(tmp_path), "avro")
