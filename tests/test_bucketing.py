"""Bucketed co-located join — the SCALE.md / 100 TB claim that two
tables bucketed the same way join with ZERO exchanges, asserted.

At lake scale the completed-trips fact and any per-trip enrichment
table should be written bucketed by the join key: every subsequent
join between them is map-side (bucket-to-bucket), no shuffle ever
again. This is the write-once-join-many layout the engine prescribes
for 100 TB."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("wh"))


def test_bucketed_join_no_shuffle(spark, tmp_path_factory):
    from real_time_trip_processing_spark.sources import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    spark.sql("DROP TABLE IF EXISTS ev_a_bkt")
    spark.sql("DROP TABLE IF EXISTS ev_b_bkt")
    (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "value")
        .write.bucketBy(8, "user_id")
        .sortBy("user_id")
        .mode("overwrite")
        .saveAsTable("ev_a_bkt")
    )
    (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"), "user_id", F.col("value").alias("p_value"))
        .write.bucketBy(8, "user_id")
        .sortBy("user_id")
        .mode("overwrite")
        .saveAsTable("ev_b_bkt")
    )
    a = spark.table("ev_a_bkt")
    b = spark.table("ev_b_bkt")
    # disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 0, plan
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        n = joined.count()
        plain = (
            a.join(b.hint("shuffle_hash"), "user_id").count()
        )
        assert n == plain and n > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS ev_a_bkt")
        spark.sql("DROP TABLE IF EXISTS ev_b_bkt")
