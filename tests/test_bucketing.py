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


def test_write_training_shards_layout(spark, tmp_path):
    from real_time_trip_processing_spark.operators.maintenance import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i}", "en", "s") for i in range(300)],
        "doc_id long, text string, lang string, source string",
    )
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == 300
    # every shard directory exists and positions are dense 0..n-1
    import collections

    rows = back.select("shard_id", "pos_in_shard", "doc_id").collect()
    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r["shard_id"]].append(r["pos_in_shard"])
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # determinism: a second write is byte-identical row-wise
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, n_shards=4)
    a = {(r["doc_id"], r["shard_id"], r["pos_in_shard"]) for r in rows}
    b = {(r["doc_id"], r["shard_id"], r["pos_in_shard"])
         for r in spark.read.parquet(out2).select("shard_id", "pos_in_shard", "doc_id").collect()}
    assert a == b


def test_scan_jsonl_corrupt_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from real_time_trip_processing_spark.sources.jsonl import (
        scan_jsonl,
        split_corrupt,
    )

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        'THIS IS NOT JSON\n'
        '{"doc_id": 2, "text": "second doc"}\n'
        '{"doc_id": 3, "text": 12345}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = scan_jsonl(spark, str(p), schema)
    clean, bad = split_corrupt(df)
    got = {(r["doc_id"], r["text"]) for r in clean.collect()}
    # "text": 12345 coerces to string under PERMISSIVE — parsed, not corrupt
    assert got == {(1, "hello world"), (2, "second doc"), (3, "12345")}
    bad_rows = bad.collect()
    assert [r["_corrupt_record"] for r in bad_rows] == ["THIS IS NOT JSON"]
    assert bad_rows[0]["doc_id"] is None


def test_delete_keys_rewrites_only_affected_partitions(spark, tmp_path):
    import os

    from real_time_trip_processing_spark.operators.maintenance import (
        delete_keys_from_lake,
    )

    out = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(u, d, f"r{u}{d}") for u in (1, 2, 3) for d in ("01", "02", "03")],
        "user_id long, day string, payload string",
    )
    df.write.partitionBy("day").parquet(out)

    def files_of(day):
        p = f"{out}/day={day}"
        return {f: os.path.getmtime(f"{p}/{f}") for f in os.listdir(p)
                if f.endswith(".parquet")}

    # user 2 only appears in every day; delete user 2 from days 01+02 by
    # first removing its day=03 rows to make day 03 unaffected
    delete_keys_from_lake(spark, out, "user_id", [2], ["day"])
    back = spark.read.parquet(out)
    assert back.filter("user_id = 2").count() == 0
    assert back.count() == 6  # users 1 and 3 intact everywhere
    before_03 = files_of("03")

    # deleting a now-absent key touches nothing
    n = delete_keys_from_lake(spark, out, "user_id", [2], ["day"])
    assert n == 0
    assert files_of("03") == before_03


def test_delete_keys_drops_fully_deleted_partition(spark, tmp_path):
    """A partition whose rows ALL match the doomed keys has no survivors
    to write, so dynamic overwrite alone would leave its old files (the
    very data being erased) on disk — the op must drop the directory."""
    import os

    from real_time_trip_processing_spark.operators.maintenance import (
        delete_keys_from_lake,
    )

    out = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(9, "01", "only-user-9"), (9, "02", "also-9"), (1, "02", "keep")],
        "user_id long, day string, payload string",
    )
    df.write.partitionBy("day").parquet(out)

    n = delete_keys_from_lake(spark, out, "user_id", [9], ["day"])
    assert n == 2
    assert not os.path.exists(f"{out}/day=01"), "erased partition left on disk"
    back = spark.read.parquet(out)
    assert back.filter("user_id = 9").count() == 0
    # default partition inference reads day=02 back as int 2
    assert {(r["user_id"], str(r["day"])) for r in back.collect()} == {(1, "2")}


def test_delete_keys_preserves_null_key_rows(spark, tmp_path):
    """isin() is NULL for NULL keys and ~NULL filters the row out — the
    rewrite must keep null-key rows explicitly, not destroy them."""
    from real_time_trip_processing_spark.operators.maintenance import (
        delete_keys_from_lake,
    )

    out = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(2, "01", "doomed"), (None, "01", "anon"), (1, "01", "keep")],
        "user_id long, day string, payload string",
    )
    df.write.partitionBy("day").parquet(out)

    delete_keys_from_lake(spark, out, "user_id", [2], ["day"])
    back = spark.read.parquet(out).collect()
    got = {(r["user_id"], r["payload"]) for r in back}
    assert got == {(None, "anon"), (1, "keep")}


def test_expire_partitions_drops_only_old(spark, tmp_path):
    from real_time_trip_processing_spark.operators.maintenance import (
        expire_partitions,
    )

    out = str(tmp_path / "lake2")
    df = spark.createDataFrame(
        [(i, d) for i in range(4) for d in ("d1", "d2", "d3")],
        "k long, day string",
    )
    df.write.partitionBy("day").parquet(out)
    n = expire_partitions(spark, out, "day", keep_values=["d2", "d3"])
    assert n == 1
    back = spark.read.parquet(out)
    assert {r["day"] for r in back.select("day").distinct().collect()} == {"d2", "d3"}
    assert back.count() == 8


def test_delete_keys_dataframe_flavor_matches_literal(spark, tmp_path):
    """The DataFrame-keys path (the 100 TB shape: a large purge list
    must not inline into the plan as IN literals) must behave exactly
    like the literal path: same survivors, same return count, same
    fully-deleted-partition drop, NULL-key rows preserved by anti-join
    semantics."""
    import os

    from real_time_trip_processing_spark.operators.maintenance import (
        delete_keys_from_lake,
    )

    rows = [(u, d, f"r{u}{d}") for u in (1, 2, 9) for d in ("01", "02")]
    rows.append((None, "01", "null-key"))
    rows.append((9, "03", "only-9"))  # day=03 fully doomed

    def build(out):
        spark.createDataFrame(
            rows, "user_id long, day string, payload string"
        ).write.partitionBy("day").parquet(out)

    lit_out = str(tmp_path / "lit")
    df_out = str(tmp_path / "df")
    build(lit_out)
    build(df_out)
    n_lit = delete_keys_from_lake(spark, lit_out, "user_id", [2, 9], ["day"])
    keys_df = spark.createDataFrame([(2,), (9,), (9,)], "user_id long")
    n_df = delete_keys_from_lake(spark, df_out, "user_id", keys_df, ["day"])
    assert n_lit == n_df == 3
    canon = lambda p: sorted(  # noqa: E731
        (-1 if r["user_id"] is None else r["user_id"],
         str(r["day"]), r["payload"])
        for r in spark.read.parquet(p).collect()
    )
    assert canon(lit_out) == canon(df_out)
    assert not os.path.exists(f"{df_out}/day=03")
    assert ("null-key") in {t[2] for t in canon(df_out)}
    # no-op on an absent key frame
    assert delete_keys_from_lake(
        spark, df_out, "user_id",
        spark.createDataFrame([(404,)], "user_id long"), ["day"],
    ) == 0


def test_delete_keys_on_mock_lake_with_staging_debris(spark, tmp_path, mock_fs):
    """Round-9 (verdict #8): the lake purge on a genuinely non-file
    scheme — `_lake_write_lock` takes the CAS lease branch (no
    local_form short-circuit), discovery/rewrite/drop all go through
    the Hadoop FS on mock:// (HDFS rename semantics) — plus the
    crashed-overwrite story's testable half on a rename-atomic FS:
    planted ``_temporary`` staging debris (what a crashed committer
    leaves) is invisible to readers and to a subsequent purge, the
    purge is idempotent (re-running with already-gone keys returns 0
    and touches no file), and untouched partitions stay byte-identical
    (name, length, mtime via the Hadoop FS)."""
    import os

    from real_time_trip_processing_spark.operators.maintenance import (
        delete_keys_from_lake,
    )

    lake = mock_fs(tmp_path / "mock_lake")
    df = spark.createDataFrame(
        [(u, d, f"r{u}{d}") for u in (1, 2, 3) for d in ("01", "02", "03")],
        "user_id long, day string, payload string",
    )
    df.write.partitionBy("day").parquet(lake)

    jvm = spark.sparkContext._jvm

    def fs_of(p):
        hp = jvm.org.apache.hadoop.fs.Path(p)
        return hp.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), hp

    def stats(day):
        fs, hp = fs_of(f"{lake}/day={day}")
        return sorted(
            (str(st.getPath().getName()), int(st.getLen()),
             int(st.getModificationTime()))
            for st in fs.listStatus(hp)
            if str(st.getPath().getName()).endswith(".parquet")
        )

    # plant committer crash debris: a _temporary staging dir with a
    # stray part file, at the root AND inside a partition dir
    local_root = str(tmp_path / "mock_lake")
    for debris in ("_temporary/0/task/part-junk.parquet",
                   "day=03/_temporary/0/part-junk.parquet"):
        p = os.path.join(local_root, debris)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(b"NOT A PARQUET FILE")

    # day=03 will be unaffected by the purge below once user 2's rows
    # exist only in days 01/02 — first erase its day=03 rows
    delete_keys_from_lake(spark, lake, "user_id", [2], ["day"])
    back = spark.read.parquet(lake)
    assert back.filter("user_id = 2").count() == 0
    assert back.count() == 6  # users 1 and 3 intact; debris ignored

    before_03 = stats("03")
    n = delete_keys_from_lake(spark, lake, "user_id", [2], ["day"])
    assert n == 0  # idempotent re-run: nothing found, nothing touched
    assert stats("03") == before_03
    # readers still ignore the planted debris after the second pass
    assert spark.read.parquet(lake).count() == 6
