"""Streaming-path tests: the reference CSVs replayed through the file
source in event-time order, matched by the watermarked stream-stream
join, aggregated by the windowed daily KPI — asserting parity with the
batch path (SURVEY §7 phase 4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_trip_processing_spark import pipeline, schemas
from real_time_trip_processing_spark.operators.sets import union_all
from real_time_trip_processing_spark.sources.csv_dir import load_reference_trip_csvs
from real_time_trip_processing_spark.streaming import (
    split_start_end,
    stream_match_start_end,
    stream_trip_events,
)
from real_time_trip_processing_spark.streaming.kpis import streaming_kpi_daily

DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    """Reference events as a 4-file event-time-ordered JSON replay
    (producer O2 semantics, reference scripts/to_kinesis.py:117-120) —
    start/end of a trip usually land in different files, exercising
    out-of-order arrival across micro-batches."""
    out = tmp_path_factory.mktemp("replay")
    starts, ends = load_reference_trip_csvs(spark, DATA)
    events = union_all(starts, ends).withColumn(
        "event_time", F.coalesce("pickup_datetime", "dropoff_datetime")
    )
    cols = [f.name for f in schemas.TRIP_EVENT]
    (
        events.repartitionByRange(4, "event_time")
        .select(*cols)
        .write.mode("overwrite")
        .json(str(out))
    )
    return str(out)


def _run_stream(spark, df, name: str, mode: str = "append"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_foreach_batch_upsert_idempotent(spark, tmp_path, replay_dir):
    """S5/S6 exactly-once: foreachBatch + dynamic-partition overwrite.
    A replayed micro-batch (same batch_id after a simulated sink retry)
    must overwrite its own partition, not append duplicates."""
    from real_time_trip_processing_spark.streaming.sinks import (
        upsert_foreach_batch,
    )

    out_dir = str(tmp_path / "upsert_out")
    events = stream_trip_events(spark, replay_dir, max_files_per_trigger=2)
    sink = upsert_foreach_batch(out_dir)
    q = (
        events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    table = spark.read.parquet(out_dir)
    n = table.count()
    assert n == 9998  # every replayed event landed exactly once
    batches = [r["__batch_id"] for r in table.select("__batch_id").distinct().collect()]
    assert len(batches) > 1  # maxFilesPerTrigger split the replay

    # simulate an at-least-once redelivery: rerun batch 0's write with
    # the same batch_id — contents must be unchanged (overwrite, not add)
    replay = table.filter(F.col("__batch_id") == batches[0]).drop("__batch_id")
    sink(replay, batches[0])
    assert spark.read.parquet(out_dir).count() == n


def test_stream_match_full_replay(spark, replay_dir):
    events = stream_trip_events(spark, replay_dir, max_files_per_trigger=1)
    starts, ends = split_start_end(events)
    completed = stream_match_start_end(starts, ends, watermark="24 hours")
    out = _run_stream(spark, completed, "completed_stream")
    assert out.count() == 4999  # every pair matches despite split files
    r = out.filter(F.col("trip_id").isNotNull()).limit(1).collect()[0].asDict()
    assert r["data_type"] == "completed_trip" and r["status"] == "completed"
    assert "end_record_id" in r  # collision rename survives streaming


def test_stream_dedup_within_watermark(spark, tmp_path, replay_dir):
    # duplicate delivery (at-least-once): replay the same files twice
    import shutil, os
    dup_dir = tmp_path / "dup"
    os.makedirs(dup_dir)
    n = 0
    for f in os.listdir(replay_dir):
        if f.endswith(".json"):
            shutil.copy(f"{replay_dir}/{f}", dup_dir / f"a_{f}")
            shutil.copy(f"{replay_dir}/{f}", dup_dir / f"b_{f}")
            n += 1
    assert n > 0
    events = stream_trip_events(spark, str(dup_dir))
    starts, ends = split_start_end(events)
    completed = stream_match_start_end(starts, ends, watermark="24 hours")
    out = _run_stream(spark, completed, "dedup_stream")
    # dropDuplicatesWithinWatermark collapses the duplicates → still one
    # completed record per trip (reference D1, scripts/lambda1.py:119-150)
    assert out.count() == 4999


def test_finite_replay_outputs_identical(spark, replay_dir, tmp_path):
    """`finite_replay` (r12: skip the trailing no-data micro-batch of an
    availableNow replay) must be a pure end-of-replay overhead cut —
    matcher rows AND the update-mode daily KPI identical with and
    without it. Also pins the r12 matcher dedup-key change ((trip_id)
    per side instead of (trip_id, data_type) — each side is one event
    type by the split contract): the reference row counts and KPI
    values are re-asserted by test_streaming_kpi_matches_batch either
    way; here the two replay flavors must agree row-for-row."""
    from real_time_trip_processing_spark.streaming import finite_replay

    def one(tag, ctx):
        completed_dir = str(tmp_path / f"completed_{tag}")
        with ctx:
            events = stream_trip_events(spark, replay_dir)
            starts, ends = split_start_end(events)
            completed = stream_match_start_end(
                starts, ends, watermark="24 hours"
            )
            q = (
                completed.writeStream.outputMode("append")
                .format("parquet")
                .option("path", completed_dir)
                .option(
                    "checkpointLocation", str(tmp_path / f"ckpt_{tag}")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            cs = spark.readStream.schema(
                spark.read.parquet(completed_dir).schema
            ).parquet(completed_dir)
            kpi = _run_stream(
                spark, streaming_kpi_daily(cs), f"fr_kpi_{tag}", mode="update"
            ).collect()
        rows = sorted(
            map(tuple, spark.read.parquet(completed_dir).collect())
        )
        return rows, sorted(map(tuple, kpi))

    import contextlib

    base_rows, base_kpi = one("base", contextlib.nullcontext())
    fr_rows, fr_kpi = one("fr", finite_replay(spark))
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == "true"
    )  # restored on exit
    assert fr_rows == base_rows
    # KPI rows: dates/counts/extrema exact; SUM/AVG of doubles compared
    # with tolerance — two independent replays accumulate fare doubles
    # in different state-iteration orders, so the last ULPs differ
    # between ANY two replays (same rule as
    # test_streaming_kpi_matches_batch's rel_tol vs the batch pipeline;
    # finite_replay is not the variable, run order is)
    assert len(fr_kpi) == len(base_kpi) == 1
    for a, b in zip(fr_kpi, base_kpi):
        assert a[0] == b[0]  # pickup_date
        assert a[2] == b[2]  # trip_count
        assert a[4] == b[4] and a[5] == b[5]  # max/min fare
        assert math.isclose(a[1], b[1], rel_tol=1e-9)  # total_fare
        assert math.isclose(a[3], b[3], rel_tol=1e-9)  # average_fare
    assert len(base_rows) == 4999


def test_streaming_kpi_matches_batch(spark, replay_dir, tmp_path):
    # two-stage, mirroring the reference's architecture around its raw
    # table (SURVEY §7 risks): stage 1 appends completed trips to a
    # parquet table (S5 sink), stage 2 runs the windowed KPI over it.
    completed_dir, ckpt = str(tmp_path / "completed"), str(tmp_path / "ckpt")
    events = stream_trip_events(spark, replay_dir)
    starts, ends = split_start_end(events)
    completed = stream_match_start_end(starts, ends, watermark="24 hours")
    q = (
        completed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", completed_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    completed_stream = (
        spark.readStream.schema(spark.read.parquet(completed_dir).schema)
        .parquet(completed_dir)
    )
    kpis = streaming_kpi_daily(completed_stream)
    # update mode: windows emit every trigger without waiting for the
    # watermark to pass day end (append's emit-on-watermark semantics
    # would hold back the live day — documented trade, SURVEY §2.10)
    out = _run_stream(spark, kpis, "kpi_stream", mode="update")
    rows = out.collect()
    assert len(rows) == 1
    got = rows[0].asDict()
    s, e = load_reference_trip_csvs(spark, DATA)
    want = pipeline.daily_kpis(pipeline.match(s, e)).collect()[0].asDict()
    assert got["trip_count"] == want["trip_count"] == 4999
    assert math.isclose(got["total_fare"], want["total_fare"], rel_tol=1e-9)
    assert math.isclose(got["average_fare"], want["average_fare"], rel_tol=1e-9)
    assert got["maximum_fare"] == want["maximum_fare"]
    assert got["minimum_fare"] == want["minimum_fare"]


def test_stateful_matcher(spark, replay_dir):
    """The applyInPandasWithState matcher reproduces the join matcher's
    result: one completed record per trip, first-match-wins, explicit
    status machine (reference scripts/lambda2.py:112-142)."""
    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        stateful_match,
    )

    events = stream_trip_events(spark, replay_dir, max_files_per_trigger=2)
    completed = stateful_match(events, watermark="24 hours")
    out = _run_stream(spark, completed, "stateful_completed")
    assert out.count() == 4999
    r = out.limit(1).collect()[0].asDict()
    assert r["data_type"] == "completed_trip" and r["status"] == "completed"
    # fare totals agree with the batch pipeline
    total = out.agg(F.sum("fare_amount")).collect()[0][0]
    s, e = load_reference_trip_csvs(spark, DATA)
    want = pipeline.daily_kpis(pipeline.match(s, e)).collect()[0]["total_fare"]
    assert abs(total - want) < 1e-6


def test_daily_partitioned_lake_prunes(spark, tmp_path):
    """The partitioned lake layout delivers partition pruning: a
    one-day filter reads only that day's directory (PartitionFilters in
    the scan, not a post-scan filter)."""
    from real_time_trip_processing_spark.streaming.sinks import (
        write_daily_partitioned,
    )

    starts, ends = load_reference_trip_csvs(spark, DATA)
    completed = pipeline.match(starts, ends)
    out = str(tmp_path / "lake")
    write_daily_partitioned(completed, out)

    back = spark.read.parquet(out).filter(
        (F.col("year") == "2024") & (F.col("month") == "05") & (F.col("day") == "25")
    )
    assert back.count() == 4999
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "isnotnull(year" in plan
    # a non-existent day prunes to zero files, no data read
    assert spark.read.parquet(out).filter(F.col("day") == "26").count() == 0


def test_streaming_session_window(spark, tmp_path):
    """session_window: a 30-minute inactivity gap closes the session;
    sessions emit in append mode once the watermark passes."""
    import json
    import os

    from real_time_trip_processing_spark.streaming.kpis import streaming_sessions

    d = tmp_path / "sess"
    d.mkdir()

    def ev(trip, ts):
        return json.dumps(
            {"trip_id": trip, "data_type": "trip_start",
             "record_id": f"{trip}-{ts}", "pickup_datetime": ts}
        )

    f0 = d / "b0.json"
    f0.write_text(
        "\n".join(
            [
                ev("U", "2024-05-25T10:00:00"),
                ev("U", "2024-05-25T10:10:00"),   # same session (gap < 30m)
                ev("U", "2024-05-25T11:30:00"),   # new session
                ev("V", "2024-05-25T10:05:00"),
            ]
        )
    )
    # watermark advancer so all sessions close and emit
    f1 = d / "b1.json"
    f1.write_text(ev("W", "2024-05-27T12:00:00"))
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    events = stream_trip_events(spark, str(d), max_files_per_trigger=1).withColumn(
        "event_time", F.coalesce("pickup_datetime", "dropoff_datetime")
    )
    sessions = streaming_sessions(events, gap="30 minutes", watermark="1 hour")
    out = _run_stream(spark, sessions, "sessions_out")
    got = {
        (r["trip_id"], str(r["session_start"])): r["n_events"]
        for r in out.collect()
    }
    assert got[("U", "2024-05-25 10:00:00")] == 2
    assert got[("U", "2024-05-25 11:30:00")] == 1
    assert got[("V", "2024-05-25 10:05:00")] == 1


def test_corrupt_records_skipped(spark):
    """P-series 'skip unparseable' semantics (reference
    scripts/lambda1.py:96-101): corrupt base64 / invalid JSON payloads
    are dropped, valid ones in the same batch survive."""
    import base64

    from real_time_trip_processing_spark.streaming.sources import parse_kafka_like

    good = base64.b64encode(
        b'{"trip_id": "T1", "data_type": "trip_start", '
        b'"pickup_datetime": "2024-05-25T10:00:00"}'
    ).decode()
    bad_json = base64.b64encode(b"{not json at all").decode()
    not_b64 = "!!!not-base64!!!"
    raw = spark.createDataFrame(
        [(good,), (bad_json,), (not_b64,)], "value string"
    ).select(F.col("value").cast("binary").alias("value"))
    out = parse_kafka_like(raw).collect()
    assert [r["trip_id"] for r in out] == ["T1"]


def test_late_event_dropped_after_watermark(spark, tmp_path):
    """§2.10 deviation made observable: once the watermark passes a
    trip's eviction horizon AND a subsequent batch has evicted its
    state, a late-arriving partner finds nothing to match — the trip
    never completes, while an in-time pair still matches. (The
    reference would wait forever; we bound state. Note the watermark is
    a *lower bound*: eviction happens at the end of the batch that runs
    with the advanced watermark, hence the advancer batch in between —
    a late row arriving in that same batch may still match.)"""
    import json
    import os

    d = tmp_path / "late"
    d.mkdir()

    def ev(trip, dt, **kw):
        return json.dumps(
            {"trip_id": trip, "data_type": dt, "record_id": f"{trip}-{dt}", **kw}
        )

    f0 = d / "batch0.json"
    f0.write_text(
        "\n".join(
            [
                ev("A", "trip_start", pickup_datetime="2024-05-25T10:00:00"),
                ev("B", "trip_start", pickup_datetime="2024-05-25T10:00:00"),
                ev("B", "trip_end", dropoff_datetime="2024-05-25T10:30:00",
                   fare_amount=12.5),
                # watermark advancers on both sides: 20:00 - 1h delay
                # puts the global watermark far past A's horizon
                ev("Y", "trip_start", pickup_datetime="2024-05-25T20:00:00"),
                ev("Z", "trip_end", dropoff_datetime="2024-05-25T20:00:00",
                   fare_amount=1.0),
            ]
        )
    )
    # batch 1 runs with the advanced watermark → A's start state is
    # evicted at its end; the late partner in batch 2 matches nothing
    f1 = d / "batch1.json"
    f1.write_text(
        ev("Y2", "trip_start", pickup_datetime="2024-05-25T21:00:00")
    )
    f2 = d / "batch2.json"
    f2.write_text(
        ev("A", "trip_end", dropoff_datetime="2024-05-25T10:20:00", fare_amount=99.0)
    )
    # distinct mtimes pin micro-batch order (file source drains oldest-first)
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))
    os.utime(f2, (1_000_000_200, 1_000_000_200))

    events = stream_trip_events(spark, str(d), max_files_per_trigger=1)
    starts, ends = split_start_end(events)
    matched = stream_match_start_end(starts, ends, watermark="1 hour")
    out = _run_stream(spark, matched, "late_drop")
    assert {r["trip_id"] for r in out.select("trip_id").collect()} == {"B"}


def test_keyed_sink_roundtrip(spark):
    """S8: keyed JSON message projection round-trips through the
    TRIP_EVENT envelope parser (base64 leg = the Kinesis shape,
    reference scripts/lambda1.py:26-32)."""
    from real_time_trip_processing_spark.streaming.sinks import to_keyed_messages
    from real_time_trip_processing_spark.streaming.sources import parse_kafka_like
    from real_time_trip_processing_spark import schemas

    starts, _ = load_reference_trip_csvs(spark, DATA)
    sample = union_all(starts.limit(50)).select(
        *[f.name for f in schemas.TRIP_EVENT if f.name in starts.columns]
    )
    msgs = to_keyed_messages(sample, "trip_id")
    assert msgs.columns == ["key", "value"]
    # kinesis-shaped wire: base64(json) — decode leg
    wire = msgs.select(F.base64(F.col("value").cast("binary")).alias("value"))
    parsed = parse_kafka_like(wire)
    assert parsed.count() == 50
    a = {r["trip_id"]: r["estimated_fare_amount"] for r in sample.collect()}
    b = {r["trip_id"]: r["estimated_fare_amount"] for r in parsed.collect()}
    assert a == b


def test_stream_static_broadcast_enrichment(spark, replay_dir):
    """Stream-static join: each micro-batch joins against a static
    dimension with a per-batch broadcast — no streaming state, no
    watermark required (inner stream-static joins are stateless), the
    scale pattern for enriching a 100 TB/day stream with reference
    data. Every replayed event must pick up exactly one dim row."""
    static = spark.createDataFrame(
        [("trip_start", "pickup"), ("trip_end", "dropoff")],
        "data_type string, leg string",
    )
    events = stream_trip_events(spark, replay_dir)
    enriched = events.join(F.broadcast(static), "data_type")
    got = _run_stream(spark, enriched, "stream_static_enriched")
    legs = {r["leg"]: r["n"] for r in got.groupBy("leg").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert legs == {"pickup": 4999, "dropoff": 4999}


def test_tws_matcher(spark, replay_dir):
    """The transformWithStateInPandas matcher (Spark 4 arbitrary-state
    API v2, RocksDB-backed) reproduces the applyInPandasWithState
    matcher's result exactly: one completed record per trip,
    first-match-wins. Skipped where protobuf (a runtime dependency of
    Spark's TWS python worker, not bundled in this container) is
    absent."""
    pytest.importorskip("google.protobuf.descriptor")
    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        tws_match,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = stream_trip_events(spark, replay_dir, max_files_per_trigger=2)
        completed = tws_match(events, watermark="24 hours")
        out = _run_stream(spark, completed, "tws_completed")
        assert out.count() == 4999
        total = out.agg(F.sum("fare_amount")).collect()[0][0]
        s, e = load_reference_trip_csvs(spark, DATA)
        want = pipeline.daily_kpis(pipeline.match(s, e)).collect()[0]["total_fare"]
        assert abs(total - want) < 1e-6
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


# --- TWS processor logic without the protobuf-gated runtime ---------------
#
# transformWithStateInPandas needs google.protobuf in the Python env
# (absent in this container — test_tws_matcher importorskips). The
# processor's state-machine logic is still fully testable: drive
# _TripMatchProcessor through fake handle/state/timer objects and
# assert it emits exactly what the (integration-tested)
# applyInPandasWithState function emits for the same event sequences.

class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        if ts in self.timers:
            self.timers.remove(ts)


class _FakeExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


class _FakeTimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


class _FakeGroupState:
    """Just enough of pyspark.sql.streaming.state.GroupState for
    _match_group: exists/get/update/remove + timeout plumbing."""

    def __init__(self, wm_ms):
        self._v = None
        self._wm = wm_ms
        self.hasTimedOut = False
        self.timeout_set_to = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_set_to = ts

    def getCurrentWatermarkMs(self):
        return self._wm


def _mk_batch(rows):
    import pandas as pd

    return pd.DataFrame(
        rows,
        columns=[
            "trip_id", "data_type", "event_time",
            "pickup_datetime", "dropoff_datetime", "fare_amount", "record_id",
        ],
    )


_T0 = "2024-05-25 10:00:00"
_T1 = "2024-05-25 10:30:00"


def _sequences():
    import pandas as pd

    t0, t1 = pd.Timestamp(_T0), pd.Timestamp(_T1)
    start = ("t1", "trip_start", t0, t0, None, None, "rs")
    start_dup = ("t1", "trip_start", t1, t1, None, None, "rs2")
    end = ("t1", "trip_end", t1, None, t1, 17.5, "re")
    end_dup = ("t1", "trip_end", t1, None, t1, 99.0, "rz")
    return {
        "same_batch": [[start, end]],
        "across_batches": [[start], [end]],
        "out_of_order": [[end], [start]],
        "first_match_wins": [[start, start_dup, end_dup, end]],
        "start_only": [[start]],
    }


def _drive_tws(batches, wm_ms=0):
    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        _TripMatchProcessor,
    )

    proc = _TripMatchProcessor()
    handle = _FakeHandle()
    proc.init(handle)
    out = []
    for batch in batches:
        out += list(
            proc.handleInputRows(
                ("t1",), iter([_mk_batch(batch)]), _FakeTimerValues(wm_ms)
            )
        )
    return out, handle


def _drive_gs(batches, wm_ms=0):
    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        _match_group,
    )

    state = _FakeGroupState(wm_ms)
    out = []
    for batch in batches:
        out += list(_match_group(("t1",), iter([_mk_batch(batch)]), state))
    return out, state


def test_tws_processor_state_machine():
    """The v2 (transformWithState) processor implements the same
    first-match-wins machine as the integration-tested
    applyInPandasWithState flavor: one completed record per matched
    pair, dedup by first event, out-of-order tolerant, state kept and
    a timer registered while a partner is missing."""
    import pandas as pd

    for name, batches in _sequences().items():
        tws_out, handle = _drive_tws(batches)
        if name == "start_only":
            assert tws_out == []
            assert handle.states["pair"].exists()
            # EVENT-anchored deadline (cold-start fix, round 6): the
            # event's own epoch-ms + 1h, never watermark(0) + 1h
            want = int(pd.Timestamp(_T0).value // 10**6) + 3_600_000
            assert handle.timers == [want]
            continue
        assert len(tws_out) == 1, name
        row = tws_out[0].iloc[0]
        assert row["trip_id"] == "t1"
        assert row["record_id"] == "rs" and row["end_record_id"] == "re"
        assert row["fare_amount"] == 17.5
        assert row["pickup_datetime"] == pd.Timestamp(_T0)
        assert row["dropoff_datetime"] == pd.Timestamp(_T1)
        assert row["data_type"] == "completed_trip" and row["status"] == "completed"
        assert not handle.states["pair"].exists(), "state must clear on emit"


def test_tws_processor_equivalent_to_group_state():
    """Shared-assertion equivalence: both state APIs produce identical
    emitted frames (and equivalent state/timer side effects) for every
    sequence, including the no-emit case."""
    for name, batches in _sequences().items():
        tws_out, handle = _drive_tws(batches)
        gs_out, state = _drive_gs(batches)
        assert len(tws_out) == len(gs_out), name
        for a, b in zip(tws_out, gs_out):
            assert a.to_dict("records") == b.to_dict("records"), name
        assert handle.states["pair"].exists() == state.exists, name
        if state.exists:
            assert tuple(handle.states["pair"].get()) == tuple(state.get), name
            assert handle.timers[-1] == state.timeout_set_to, name


def test_tws_processor_timer_expiry_clears_state():
    """Eviction parity: the v2 timer callback clears the pending pair
    exactly like the GroupState timeout branch."""
    batches = _sequences()["start_only"]
    _, handle = _drive_tws(batches)
    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        _TripMatchProcessor,
    )

    proc = _TripMatchProcessor()
    proc.init(handle)  # reuse populated fake state
    assert handle.states["pair"].exists()
    deadline = int(handle.states["deadline"].get()[0])
    # a STALE timer (not the live deadline) must be ignored — the v2
    # API accumulates timers, so an old one firing after the deadline
    # moved cannot evict the pair
    out = list(
        proc.handleExpiredTimer(
            ("t1",), _FakeTimerValues(10), _FakeExpiredTimerInfo(deadline - 1)
        )
    )
    assert out == [] and handle.states["pair"].exists()
    # the CURRENT deadline evicts, exactly like the GroupState branch
    out = list(
        proc.handleExpiredTimer(
            ("t1",), _FakeTimerValues(10), _FakeExpiredTimerInfo(deadline)
        )
    )
    assert out == [] and not handle.states["pair"].exists()
    assert not handle.states["deadline"].exists()


def test_completion_notifier_publishes_sns_doc(spark, tmp_path, replay_dir):
    """SNS-publish analogue (reference step_functions.json:13-23): a
    StreamingQueryListener publishes {"messagekey1": "success"} with the
    run's input-row total when the query terminates cleanly."""
    import json
    import time as _t

    from real_time_trip_processing_spark.streaming.notify import attach_notifier

    topic = str(tmp_path / "etl_topic")
    listener = attach_notifier(spark, topic)
    try:
        events = stream_trip_events(spark, replay_dir)
        q = (
            events.writeStream.outputMode("append")
            .format("noop")
            .queryName("notify_me")
            .option("checkpointLocation", str(tmp_path / "ckpt_notify"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        docs = []
        for _ in range(100):  # listener events are delivered async
            import os

            docs = [
                json.load(open(os.path.join(topic, f)))
                for f in (os.listdir(topic) if os.path.isdir(topic) else [])
                if f.endswith(".json")
            ]
            if any(d.get("run_id") == str(q.runId) for d in docs):
                break
            _t.sleep(0.2)
        mine = [d for d in docs if d.get("run_id") == str(q.runId)]
        assert mine, f"no notification published in {topic}"
        doc = mine[0]
        assert doc["status"] == "success"
        assert doc["message"] == {"messagekey1": "success"}
        assert doc["job_name"] == "notify_me"
        assert doc["input_rows"] > 0
    finally:
        spark.streams.removeListener(listener)


def test_streaming_rollup_upsert_matches_batch_cascade(spark, tmp_path):
    """Continuous-aggregate materialization: the events table replayed
    as a multi-batch stream, 15-min buckets maintained in UPDATE mode
    and upserted key-addressed into a parquet rollup lake. The lake's
    final state must equal the batch kpi_15min aggregate, and a daily
    re-aggregate OF THE LAKE must equal the batch rollup cascade — raw
    events are scanned only by the stream."""
    from real_time_trip_processing_spark.sources import table
    from real_time_trip_processing_spark.streaming.kpis import streaming_kpi_15min
    from real_time_trip_processing_spark.streaming.sinks import (
        keyed_upsert_foreach_batch,
    )

    events = table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "value"
    )
    src = str(tmp_path / "events_stream")
    events.repartition(6).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    rollup_dir = str(tmp_path / "rollup15")
    # replay order is arbitrary across the 6 files → watermark must
    # cover the full event-time span or genuinely-late buckets are
    # (correctly) dropped; parity needs the keep-everything setting
    q = (
        streaming_kpi_15min(stream, watermark="365 days")
        .writeStream.outputMode("update")
        .foreachBatch(
            keyed_upsert_foreach_batch(rollup_dir, ["bucket_start", "event_type"])
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    lake = spark.read.parquet(rollup_dir)
    batch15 = events.groupBy(
        F.window("ts", "15 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in lake.collect()
    }
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["total_value"])
        for r in batch15.collect()
    }
    assert set(got) == set(want)
    for k, (n, tv) in want.items():
        assert got[k][0] == n
        assert math.isclose(got[k][1], tv, rel_tol=1e-9)

    # cascade: daily KPIs from the MATERIALIZED rollup == batch-from-raw
    daily_from_lake = {
        (r["day"], r["event_type"]): (r["n"], r["total_value"])
        for r in lake.groupBy(
            F.date_trunc("day", "bucket_start").alias("day"), "event_type"
        )
        .agg(F.sum("n").alias("n"), F.sum("total_value").alias("total_value"))
        .collect()
    }
    daily_from_raw = {
        (r["day"], r["event_type"]): (r["n"], r["total_value"])
        for r in events.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert set(daily_from_lake) == set(daily_from_raw)
    for k, (n, tv) in daily_from_raw.items():
        assert daily_from_lake[k][0] == n
        assert math.isclose(daily_from_lake[k][1], tv, rel_tol=1e-9)


def test_stream_dedup_incremental_vs_corpus(spark, tmp_path):
    """Streaming twin of dedup_incremental: within-stream duplicate
    state carries ACROSS micro-batches, and the stream-static anti-join
    drops anything already in the corpus index."""
    from real_time_trip_processing_spark.streaming.dedup import (
        stream_dedup_incremental,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    # batch 1 and batch 2 arrive as separate files (separate micro-batches
    # under availableNow file listing is not guaranteed — but duplicate
    # state must hold regardless of batch boundaries)
    (src / "b1.jsonl").write_text(
        '{"doc_id": 10, "text": "known doc"}\n'
        '{"doc_id": 11, "text": "fresh one"}\n'
    )
    (src / "b2.jsonl").write_text(
        '{"doc_id": 12, "text": "Fresh One "}\n'
        '{"doc_id": 13, "text": "brand new"}\n'
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    )
    corpus = spark.createDataFrame([(1, "Known Doc")], "doc_id long, text string")
    out = stream_dedup_incremental(stream, corpus)
    got = _run_stream(spark, out, "dedup_incr_stream")
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    # 10 dies to the corpus; exactly one of {11, 12} survives (they are
    # content-equal after normalization — which one wins depends on
    # micro-batch arrival order, so assert the set property, not the id)
    assert 13 in ids and 10 not in ids
    survivors_11_12 = [i for i in ids if i in (11, 12)]
    assert len(survivors_11_12) == 1
    assert len(ids) == 2


def _span_rows_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_dedup_spans_cross_batch_and_replay(spark, tmp_path):
    """Streaming span dedup (foreachBatch sink): spans seen by an
    earlier batch are removed in later ones; batch output equals the
    batch twin `dedup_spans_incremental` run against the accumulated
    index; a REPLAYED batch reproduces its first attempt bit-for-bit
    (own-partition-excluding index read + dynamic overwrite) and leaves
    the index semantically unchanged."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.operators.dedup import dedup_spans
    from real_time_trip_processing_spark.streaming.dedup import (
        stream_dedup_spans_sink,
    )

    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d x y z w"),          # first span dups doc 0
        (10, "x y z w q r s t"),          # first span dups doc 1's tail
        (11, None),
        (20, "q r s t a b c d new1 new2 new3 new4"),  # dups both batches
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    b0 = df.filter(F.col("doc_id") < 10)
    b1 = df.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    b2 = df.filter(F.col("doc_id") >= 20)
    idx_dir = str(tmp_path / "span_idx")
    audit_dir = str(tmp_path / "audit")
    sink = stream_dedup_spans_sink(idx_dir, audit_dir, span_words=4)

    sink(b0, 0)
    sink(b1, 1)
    sink(b2, 2)

    # the stream's accumulated audit == the GLOBAL batch pass (ids
    # arrive in id order, so first-occurrence precedence coincides)
    got = _span_rows_sorted(
        spark.read.parquet(audit_dir).drop("__batch_id")
    )
    want = _span_rows_sorted(dedup_spans(df, span_words=4))
    assert got == want

    # index holds every span hash ever seen, exactly once
    idx = spark.read.parquet(idx_dir)
    n_hashes = idx.count()
    assert n_hashes == idx.select("span_hash").distinct().count()

    # REPLAY batch 1 (at-least-once delivery): same audit rows, same
    # index contents — bit-identical rerun, no double exclusion
    sink(b1, 1)
    assert _span_rows_sorted(
        spark.read.parquet(audit_dir).drop("__batch_id")
    ) == want
    assert spark.read.parquet(idx_dir).count() == n_hashes


def test_stream_dedup_spans_seeded_corpus(spark, tmp_path):
    """seed_span_index: a pre-ingested corpus excludes stream spans
    from batch 0 onwards, equal to the batch twin against that corpus."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.operators.dedup import (
        dedup_spans_incremental,
    )
    from real_time_trip_processing_spark.streaming.dedup import (
        seed_span_index,
        stream_dedup_spans_sink,
    )

    corpus = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "a b c d p q r s"), (11, "")], "doc_id long, text string"
    )
    idx_dir = str(tmp_path / "seeded_idx")
    audit_dir = str(tmp_path / "audit")
    seed_span_index(corpus, idx_dir, span_words=4)
    stream_dedup_spans_sink(idx_dir, audit_dir, span_words=4)(batch, 0)
    got = _span_rows_sorted(
        spark.read.parquet(audit_dir).drop("__batch_id")
    )
    want = _span_rows_sorted(
        dedup_spans_incremental(batch, corpus, span_words=4)
    )
    assert got == want


def test_stream_dedup_corpus_index_caller_owned(spark, tmp_path):
    """Production corpus path: the caller builds the persisted hash
    index (corpus_hash_index), the stream anti-joins it, and the caller
    releases the cache — no hidden persist left behind (round-6 ADVICE:
    the old internal persist leaked one cached relation per stream
    build)."""
    from real_time_trip_processing_spark.streaming.dedup import (
        corpus_hash_index,
        stream_dedup_incremental,
    )

    src = tmp_path / "incoming2"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        '{"doc_id": 20, "text": "known doc"}\n'
        '{"doc_id": 21, "text": "novel text"}\n'
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    corpus = spark.createDataFrame([(1, "Known Doc")], "doc_id long, text string")
    idx = corpus_hash_index(corpus)
    try:
        assert idx.storageLevel.useMemory and idx.storageLevel.useDisk
        out = stream_dedup_incremental(stream, corpus_index=idx)
        got = _run_stream(spark, out, "dedup_incr_stream_idx")
        ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
        assert ids == [21]
    finally:
        idx.unpersist()
    assert not idx.storageLevel.useMemory  # released, nothing leaks
    import pytest as _pytest

    with _pytest.raises(ValueError, match="corpus"):
        stream_dedup_incremental(stream)


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across RESTARTS: a file-source stream writing
    through foreachBatch-upsert is stopped after consuming the first
    file, restarted on the same checkpoint after a second file lands —
    the sink ends complete and duplicate-free, and the restarted query
    does not reprocess file 1."""
    from pyspark.sql import types as T

    from real_time_trip_processing_spark.streaming.sinks import (
        keyed_upsert_foreach_batch,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    (src / "f1.jsonl").write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')

    def start():
        return (
            spark.readStream.schema(schema).json(str(src))
            .writeStream.foreachBatch(keyed_upsert_foreach_batch(out, ["k"]))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(300)
    # second file lands while the query is DOWN (k=2 updated, k=3 new)
    (src / "f2.jsonl").write_text('{"k": 2, "v": "B2"}\n{"k": 3, "v": "c"}\n')
    q2 = start()
    q2.awaitTermination(300)
    got = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}
    # the restart consumed only the new file: progress shows 2 input rows
    assert q2.lastProgress is None or q2.lastProgress["numInputRows"] <= 2


def test_streaming_quantile_sketch_state_matches_batch(spark, tmp_path):
    """The quantile-sketch state (integer (day, bin) counts) maintained
    by a streaming UPDATE-mode aggregate + keyed upsert sink must equal
    the one-shot batch histogram — the streaming twin of
    quantile_sketch_rollup's merge algebra (merge = addition, so
    micro-batch boundaries cannot drift a count)."""
    import datetime as dt

    from pyspark.sql import Row, functions as F

    from real_time_trip_processing_spark.streaming.sinks import (
        keyed_upsert_foreach_batch,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    rows = [
        Row(
            event_id=i,
            ts=dt.datetime(2024, 1, 1 + (i % 3), 6 + (i % 12)),
            value=float((i * 7) % 97) / 2.0,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    # two files => at least two micro-batches with maxFilesPerTrigger=1
    df.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").json(src)
    df.filter(F.col("event_id") % 2 == 1).write.mode("append").json(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    counts = (
        stream.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") * 2).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(keyed_upsert_foreach_batch(state, ["day", "bin"]))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.day, r.bin): r.cnt
        for r in spark.read.parquet(state).select("day", "bin", "cnt").collect()
    }
    want = {
        (r.day, r.bin): r.cnt
        for r in df.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.floor(F.col("value") * 2).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want and len(got) > 10


def test_socket_source_live_ingest(spark, tmp_path):
    """S2 over a real network transport: a TCP producer pushes
    base64-JSON envelopes (the reference's wire shape) while Spark's
    socket source consumes them live through the SAME
    parse_kafka_like decode/validate path as the file and Kafka
    flavors — including a corrupt line that must be skipped."""
    import base64
    import json
    import socket
    import threading
    import time as _time

    from real_time_trip_processing_spark.streaming.sources import (
        stream_trip_events_socket,
    )

    events = [
        {
            "trip_id": f"t{i}",
            "data_type": "trip_start",
            "pickup_datetime": f"2024-05-25 10:{i:02d}:00",
        }
        for i in range(10)
    ]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def feed():
        conn, _ = srv.accept()
        with conn:
            for e in events:
                payload = base64.b64encode(json.dumps(e).encode()).decode()
                conn.sendall((payload + "\n").encode())
            conn.sendall(b"not-base64-garbage\n")  # corrupt-skip path
            # keep the connection open past the poll deadline so a slow
            # micro-batch can't race an EOF (daemon thread — dies with
            # the test process)
            _time.sleep(90)

    t = threading.Thread(target=feed, daemon=True)
    t.start()

    parsed = stream_trip_events_socket(spark, "127.0.0.1", port)
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("socket_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = _time.time() + 60
        n = 0
        while _time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) FROM socket_ingest").first()[0]
            if n >= len(events):
                break
            _time.sleep(1)
        assert n == len(events)  # all valid envelopes, corrupt line skipped
        ids = {
            r.trip_id
            for r in spark.sql("SELECT trip_id FROM socket_ingest").collect()
        }
        assert ids == {f"t{i}" for i in range(10)}
    finally:
        q.stop()
        srv.close()


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream INTERVAL join (§2.10 depth): views joined to
    purchases of the same user within the hour BEFORE the purchase,
    with watermarks bounding both sides' state — the streaming flavor
    of the batch range_join_1h. availableNow replay must equal the
    batch join on the same data."""
    import datetime as dt

    from pyspark.sql import Row

    T = dt.datetime
    base = T(2024, 4, 1, 12)
    views = [
        Row(event_id=i, user_id=i % 3, ts=base + dt.timedelta(minutes=m))
        for i, m in enumerate([0, 10, 50, 70, 130])
    ]
    buys = [
        Row(event_id=100 + i, user_id=u, ts=base + dt.timedelta(minutes=m))
        for i, (u, m) in enumerate([(0, 60), (1, 55), (2, 200)])
    ]
    vdir, bdir = str(tmp_path / "views"), str(tmp_path / "buys")
    spark.createDataFrame(views).write.mode("overwrite").json(vdir)
    spark.createDataFrame(buys).write.mode("overwrite").json(bdir)
    schema = "event_id long, user_id long, ts timestamp"

    vs = (
        spark.readStream.schema(schema).json(vdir)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
    )
    bs = (
        spark.readStream.schema(schema).json(bdir)
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("b_id"),
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("b_ts"),
        )
    )
    joined = vs.join(
        bs,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("v_ts") >= F.col("b_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") < F.col("b_ts")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssij")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.v_id, r.b_id)
        for r in spark.sql("SELECT v_id, b_id FROM ssij").collect()
    }
    vb = spark.createDataFrame(views)
    bb = spark.createDataFrame(buys)
    want = {
        (r[0], r[1])
        for r in vb.alias("v")
        .join(
            bb.alias("b"),
            (F.col("v.user_id") == F.col("b.user_id"))
            & (F.col("v.ts") >= F.col("b.ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v.ts") < F.col("b.ts")),
        )
        .select("v.event_id", "b.event_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_mtime_guard_restores_event_time_admission(spark, tmp_path):
    """The file-source mtime hazard (stream_trip_events' docstring,
    measured in tools/scale_streaming.py): micro-batch admission
    follows file MODIFICATION TIME, so a scrambled-mtime directory can
    surface an early-event-time file after the watermark has passed it
    and a watermarked append-mode aggregation drops those events with
    no error. `stamp_ascending_mtimes` re-pins admission to name order
    (= the writer's event-time range order); after stamping, the same
    stream is complete."""
    import json as _json
    import os
    import time as _time

    from real_time_trip_processing_spark.streaming import (
        stamp_ascending_mtimes,
    )

    src = tmp_path / "feed"
    src.mkdir()
    day1 = [f"2024-01-01T0{h}:00:00" for h in range(4)]
    day2 = ["2024-01-03T00:00:00", "2024-01-03T01:00:00"]

    def write(name, stamps):
        p = src / name
        with open(p, "w") as f:
            for s in stamps:
                f.write(_json.dumps({"ts": s, "v": 1}) + "\n")
        return p

    a = write("a.json", day1[:2])
    b = write("b.json", day1[2:])
    c = write("c.json", day2)
    # scrambled mtimes: the day-2 file looks OLDEST, so it is admitted
    # FIRST and the watermark (1 hour behind day 2) passes day 1 before
    # the day-1 files ever surface
    now = _time.time()
    for i, p in enumerate((c, b, a)):
        os.utime(p, (now - 300 + i, now - 300 + i))

    def run(tag):
        stream = (
            spark.readStream.schema("ts timestamp, v int")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.sum("v").alias("n"))
            .select(F.col("w.start").alias("day"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(f"mtime_guard_{tag}")
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_{tag}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            r["day"].strftime("%Y-%m-%d"): r["n"]
            for r in spark.sql(
                f"SELECT * FROM mtime_guard_{tag}"
            ).collect()
        }

    scrambled = run("scrambled")
    # the hazard, reproduced: day-1 events are lost silently
    assert scrambled.get("2024-01-01", 0) < 4, scrambled

    stamped = stamp_ascending_mtimes(str(src), suffix=".json")
    assert [os.path.basename(p) for p in stamped] == [
        "a.json", "b.json", "c.json",
    ]
    complete = run("stamped")
    assert complete.get("2024-01-01") == 4, complete


def test_stateful_first_batch_keys_survive(spark, tmp_path):
    """Cold-start regression (round-6 review): during the FIRST
    micro-batch the watermark is still 0, so a watermark-anchored
    eviction deadline is epoch-1970+grace — every key unmatched at the
    end of batch 1 would be evicted the moment the watermark first
    advanced, and its partner arriving in a later batch (well inside
    the watermark) would silently never match. The deadline is now
    anchored to the event's own time."""
    import json
    import os

    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        stateful_match,
    )

    d = tmp_path / "coldstart"
    d.mkdir()

    def ev(trip, dt, **kw):
        return json.dumps(
            {"trip_id": trip, "data_type": dt, "record_id": f"{trip}-{dt}", **kw}
        )

    # batch 1: start for A (watermark 0 while processing)
    f0 = d / "b0.json"
    f0.write_text(ev("A", "trip_start", pickup_datetime="2024-05-25T10:00:00"))
    # batch 2: unrelated advancer — watermark is now 09:00 (>> epoch),
    # A has no data this batch: the old code evicted it here
    f1 = d / "b1.json"
    f1.write_text(ev("U", "trip_start", pickup_datetime="2024-05-25T10:30:00"))
    # batch 3: A's end, within the watermark — must match
    f2 = d / "b2.json"
    f2.write_text(
        ev("A", "trip_end", dropoff_datetime="2024-05-25T10:20:00",
           fare_amount=7.5)
    )
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))
    os.utime(f2, (1_000_000_200, 1_000_000_200))

    events = stream_trip_events(spark, str(d), max_files_per_trigger=1)
    out = _run_stream(
        spark, stateful_match(events, watermark="1 hour"), "coldstart_out"
    )
    got = {r["trip_id"] for r in out.select("trip_id").collect()}
    assert "A" in got, "first-batch key was evicted by the epoch deadline"


def test_stateful_redelivery_does_not_duplicate(spark, tmp_path):
    """At-least-once redelivery of a matched pair AFTER its state was
    cleared must not emit a second completed record — the stateful
    flavors now carry the same dropDuplicatesWithinWatermark guard as
    the join flavor (round-6 review finding)."""
    import json
    import os

    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        stateful_match,
    )

    d = tmp_path / "redeliver"
    d.mkdir()

    def ev(trip, dt, **kw):
        return json.dumps(
            {"trip_id": trip, "data_type": dt, "record_id": f"{trip}-{dt}", **kw}
        )

    pair = [
        ev("T", "trip_start", pickup_datetime="2024-05-25T10:00:00"),
        ev("T", "trip_end", dropoff_datetime="2024-05-25T10:20:00",
           fare_amount=9.0),
    ]
    f0 = d / "b0.json"
    f0.write_text("\n".join(pair))      # match emitted, state cleared
    f1 = d / "b1.json"
    f1.write_text("\n".join(pair))      # transport redelivers the pair
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))

    events = stream_trip_events(spark, str(d), max_files_per_trigger=1)
    out = _run_stream(
        spark, stateful_match(events, watermark="1 hour"), "redeliver_out"
    )
    assert out.filter(F.col("trip_id") == "T").count() == 1


def test_stateful_rejects_dropoff_before_pickup(spark, tmp_path):
    """A pair whose dropoff precedes its pickup (corrupt producer /
    clock skew) is rejected by the join flavor's range condition; the
    state machine now discards the non-conforming END instead of
    emitting a completed trip that ends before it starts (round-6
    review: the two flavors previously diverged here). The replacement
    end in this fixture arrives past the watermark, so no completed
    record for S exists at all — the assertion is that the 09:00
    dropoff NEVER surfaced."""
    import json
    import os

    from real_time_trip_processing_spark.streaming.stateful_matcher import (
        stateful_match,
    )

    d = tmp_path / "skew"
    d.mkdir()

    def ev(trip, dt, rid, **kw):
        return json.dumps(
            {"trip_id": trip, "data_type": dt, "record_id": rid, **kw}
        )

    f0 = d / "b0.json"
    f0.write_text(
        "\n".join(
            [
                ev("S", "trip_start", "S-start",
                   pickup_datetime="2024-05-25T10:00:00"),
                # dropoff BEFORE pickup — must not complete the trip
                ev("S", "trip_end", "S-bad",
                   dropoff_datetime="2024-05-25T09:00:00", fare_amount=1.0),
            ]
        )
    )
    f1 = d / "b1.json"
    # conforming end, different record_id (the dedup guard keys on
    # (trip_id, data_type) — within the watermark the second end row is
    # collapsed, so deliver it after the watermark moved past b0's

    # advancer first so the dedup state for (S, trip_end) expires
    f1.write_text(
        ev("ADV", "trip_start", "ADV-start",
           pickup_datetime="2024-05-25T20:00:00")
    )
    f2 = d / "b2.json"
    f2.write_text(
        ev("S", "trip_end", "S-good",
           dropoff_datetime="2024-05-25T10:30:00", fare_amount=5.0)
    )
    os.utime(f0, (1_000_000_000, 1_000_000_000))
    os.utime(f1, (1_000_000_100, 1_000_000_100))
    os.utime(f2, (1_000_000_200, 1_000_000_200))

    events = stream_trip_events(spark, str(d), max_files_per_trigger=1)
    out = _run_stream(
        spark, stateful_match(events, watermark="1 hour"), "skew_out"
    )
    rows = out.filter(F.col("trip_id") == "S").collect()
    assert [str(r["dropoff_datetime"]) for r in rows] == []  # never 09:00


def test_keyed_stream_per_key_order_to_state_store(spark, tmp_path):
    """S8 keyed-stream SEMANTICS, end to end: the property the
    reference buys from Kinesis's trip_id partition key
    (scripts/to_kinesis.py:66) — a consumer sees each key's records in
    producer order — holds through this engine's live transport into
    the state store. Two keys interleaved on one TCP connection; an
    applyInPandasWithState recorder accumulates each key's record_ids
    in ARRIVAL order; both keys must read back in exact producer
    order while sharing every micro-batch.

    Why the engine guarantees it (not luck): the socket batch is one
    upstream partition read in arrival order; the narrow decode
    preserves it; the pre-state sort orders by the GROUPING KEY only
    and Spark's sorters (radix LSD / TimSort) are stable, so same-key
    rows keep map-output order; micro-batches apply sequentially. The
    same argument transfers to Kafka per-partition order with the
    key-hashed producer partitioner — the production wiring
    (write_kafka) keys messages exactly so."""
    import base64
    import json
    import socket
    import threading
    import time as _time

    import pandas as _pd
    from pyspark.sql import types as T

    from real_time_trip_processing_spark.streaming.sources import (
        stream_trip_events_socket,
    )

    per_key = 10
    events = []
    for i in range(per_key):  # A0 B0 A1 B1 ... interleaved
        for key in ("A", "B"):
            events.append(
                {
                    "trip_id": key,
                    "data_type": "trip_start",
                    "pickup_datetime": f"2024-05-25 10:{i:02d}:00",
                    "record_id": f"{key}-{i}",
                }
            )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def feed():
        conn, _ = srv.accept()
        with conn:
            for e in events:
                payload = base64.b64encode(json.dumps(e).encode()).decode()
                conn.sendall((payload + "\n").encode())
                _time.sleep(0.25)  # spread across several micro-batches
            _time.sleep(90)

    threading.Thread(target=feed, daemon=True).start()

    parsed = stream_trip_events_socket(spark, "127.0.0.1", port)

    out_schema = T.StructType(
        [
            T.StructField("trip_id", T.StringType()),
            T.StructField("arrival_order", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("order", T.StringType())])

    def record_order(key, pdfs, state):
        seen = state.get[0] if state.exists else ""
        ids = [r for pdf in pdfs for r in pdf["record_id"].tolist()]
        order = ",".join(([seen] if seen else []) + ids)
        state.update((order,))
        yield _pd.DataFrame(
            {
                "trip_id": [key[0]],
                "arrival_order": [order],
                "n": [len(order.split(","))],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    recorded = (
        parsed.select("trip_id", "record_id")
        .groupBy("trip_id")
        .applyInPandasWithState(
            record_order,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        recorded.writeStream.outputMode("update")
        .format("memory")
        .queryName("keyed_order")
        .option("checkpointLocation", str(tmp_path / "ckpt_order"))
        .start()
    )
    try:
        deadline = _time.time() + 90
        done = {}
        batches_seen = 0
        while _time.time() < deadline:
            rows = spark.sql(
                "SELECT trip_id, arrival_order, n FROM keyed_order"
            ).collect()
            batches_seen = len(rows)
            done = {}
            for r in rows:  # latest (longest) record per key
                if r["n"] >= done.get(r["trip_id"], (0, ""))[0]:
                    done[r["trip_id"]] = (r["n"], r["arrival_order"])
            if all(done.get(k, (0, ""))[0] >= per_key for k in ("A", "B")):
                break
            _time.sleep(1)
    finally:
        q.stop()
        srv.close()

    for key in ("A", "B"):
        n, order = done[key]
        assert n == per_key, (key, done)
        assert order == ",".join(f"{key}-{i}" for i in range(per_key)), order
    # the interleave actually exercised MULTIPLE micro-batches: more
    # update rows than keys means at least one key was updated across
    # two batches, so ordering held ACROSS batches, not within one
    assert batches_seen >= 3, batches_seen


def test_empty_leading_batch_does_not_create_schemaless_table(spark, tmp_path):
    """A leading EMPTY micro-batch must not create a schema-less table
    dir (readers would die on schema inference until data lands); once
    the table exists, empty batches write nothing and — critically —
    the emptiness probe is skipped, so steady-state numInputRows stays
    exact (the restart test pins that metric)."""
    import os

    from real_time_trip_processing_spark.streaming.sinks import (
        keyed_upsert_foreach_batch,
        upsert_foreach_batch,
    )

    out1, out2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    empty = spark.range(0).selectExpr("id AS k", "CAST(id AS STRING) v")
    data = spark.range(3).selectExpr("id AS k", "CAST(id AS STRING) v")
    upsert_foreach_batch(out1)(empty, 0)
    keyed_upsert_foreach_batch(out2, ["k"])(empty, 0)
    assert not os.path.exists(out1) and not os.path.exists(out2)
    upsert_foreach_batch(out1)(data, 1)
    keyed_upsert_foreach_batch(out2, ["k"])(data, 1)
    # empty batch against an EXISTING table: harmless no-op write
    upsert_foreach_batch(out1)(empty, 2)
    keyed_upsert_foreach_batch(out2, ["k"])(empty, 2)
    assert spark.read.parquet(out1).count() == 3
    assert spark.read.parquet(out2).count() == 3
