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


def test_csv_loader_nulls_malformed_timestamps(spark, tmp_path):
    """Round-6 review: Spark 4 defaults to ANSI mode, where strict
    to_timestamp THROWS on a malformed cell — the documented contract
    (and the reference lambda1 behavior) is null-on-failure."""
    import os

    from real_time_trip_processing_spark.sources.csv_dir import (
        load_reference_trip_csvs,
    )

    d = tmp_path / "csvroot"
    (d / "Trip_Start").mkdir(parents=True)
    (d / "Trip_End").mkdir(parents=True)
    # columns in TRIP_START_CSV / TRIP_END_CSV file order (schemas map
    # positionally; the header row is skipped)
    (d / "Trip_Start" / "a.csv").write_text(
        "trip_id,pickup_location_id,dropoff_location_id,vendor_id,"
        "pickup_datetime,estimated_dropoff_datetime,estimated_fare_amount\n"
        "T1,1,2,1,2024-05-25 10:00:00,2024-05-25 11:00:00,10.0\n"
        "T2,1,2,1,not-a-timestamp,also-bad,11.0\n"
    )
    (d / "Trip_End" / "b.csv").write_text(
        "dropoff_datetime,rate_code,passenger_count,trip_distance,"
        "fare_amount,tip_amount,payment_type,trip_type,trip_id\n"
        "2024-05-25 10:20:00,1,1,2.0,12.5,1.0,1,1,T1\n"
    )
    starts, ends = load_reference_trip_csvs(spark, str(d))
    rows = {r["trip_id"]: r for r in starts.collect()}  # must NOT raise
    assert rows["T2"]["pickup_datetime"] is None
    assert rows["T1"]["pickup_datetime"] is not None


def test_split_corrupt_sides_are_countable(spark, tmp_path):
    """Round-6 review: bad.count() — the standard dead-letter metric —
    used to raise QUERY_ONLY_CORRUPT_RECORD_COLUMN because Catalyst
    pruned the aggregate's scan down to the internal corrupt column;
    the split now caches the scan so aggregates work on both sides."""
    from pyspark.sql import types as T

    from real_time_trip_processing_spark.sources.jsonl import (
        scan_jsonl, split_corrupt,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{broken json\n')
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("text", T.StringType())]
    )
    clean, bad = split_corrupt(scan_jsonl(spark, str(p), schema))
    assert clean.count() == 1   # previously raised here or below
    assert bad.count() == 1
    spark.catalog.clearCache()


def test_scan_lake_corrupt_capture_opt_in(spark, tmp_path):
    """scan_lake(corrupt_capture=True) surfaces garbage lines in the
    _corrupt_record quarantine column instead of silently yielding
    all-null rows; the default keeps the declared schema unchanged."""
    from pyspark.sql import types as T

    from real_time_trip_processing_spark.sources.formats import scan_lake
    from real_time_trip_processing_spark.sources.jsonl import split_corrupt

    p = tmp_path / "crawl"
    p.mkdir()
    (p / "part-0.json").write_text('{"doc_id": 1, "text": "ok"}\ngarbage\n')
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("text", T.StringType())]
    )
    plain = scan_lake(spark, str(p), "json", schema)
    assert "_corrupt_record" not in plain.columns  # default unchanged
    captured = scan_lake(spark, str(p), "json", schema, corrupt_capture=True)
    clean, bad = split_corrupt(captured)
    assert clean.count() == 1 and bad.count() == 1
    spark.catalog.clearCache()
