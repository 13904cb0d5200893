"""Custom stateful matcher via ``applyInPandasWithState`` — the
reference's Lambda 2 status machine made explicit (SURVEY §2.10
"state machine" row).

The stream-stream join (streaming/matcher.py) is the idiomatic — and
default — implementation; this operator exists for the cases the join
can't express: the reference's *observable* per-event status lifecycle
(raw → processed_by_matcher → completed,
reference scripts/lambda2.py:112-142, 250-251) and arbitrary per-key
logic beyond equi-matching.

Shape: events keyed by trip_id; state = the first-arrived start/end
payloads (first-match-wins, scripts/lambda2.py:27-63); when both sides
are present the merged completed record is emitted exactly once and the
state is cleared. Unmatched events wait — bounded by an event-time
timeout instead of the reference's "wait forever" (same deviation, same
reason as the join watermark). State is per-key and O(1); the grouping
shuffle is the same hash exchange the join would need.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-key state: first start / first end, each as (event_time_micros,
#: fare, record_id); -1 sentinel == absent
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("start_record_id", T.StringType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("end_fare", T.DoubleType()),
        T.StructField("end_record_id", T.StringType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("trip_id", T.StringType()),
        T.StructField("pickup_datetime", T.TimestampType()),
        T.StructField("dropoff_datetime", T.TimestampType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("end_record_id", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _match_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (trip_id,) = key
    if state.hasTimedOut:
        # bounded-lateness eviction (deviation from "wait forever")
        state.remove()
        return
    start_us, start_rid, end_us, end_fare, end_rid = (
        state.get if state.exists else (-1, None, -1, None, None)
    )
    for pdf in pdfs:
        pdf = pdf.sort_values(["event_time", "record_id"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            if row.data_type == "trip_start" and start_us < 0:
                start_us, start_rid = _us(row.pickup_datetime), row.record_id
            elif row.data_type == "trip_end" and end_us < 0:
                end_us, end_fare, end_rid = (
                    _us(row.dropoff_datetime),
                    float(row.fare_amount),
                    row.record_id,
                )
    if start_us >= 0 and end_us >= 0:
        # both partners present → emit the merged record once, clear
        # state (the two source events are now 'processed_by_matcher';
        # clearing state IS that transition)
        state.remove()
        yield pd.DataFrame(
            {
                "trip_id": [trip_id],
                "pickup_datetime": [pd.Timestamp(start_us * 1000)],
                "dropoff_datetime": [pd.Timestamp(end_us * 1000)],
                "fare_amount": [end_fare],
                "record_id": [start_rid],
                "end_record_id": [end_rid],
                "data_type": ["completed_trip"],
                "status": ["completed"],
            }
        )
    else:
        state.update((start_us, start_rid, end_us, end_fare, end_rid))
        # evict one hour past the current watermark
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)


def stateful_match(events: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Match start/end pairs with an explicit per-trip state machine.

    ``events`` is the interleaved TRIP_EVENT stream; rows need
    trip_id, data_type, pickup/dropoff_datetime, fare_amount, record_id.
    """
    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "event_time", F.coalesce("pickup_datetime", "dropoff_datetime")
    ).withWatermark("event_time", watermark)
    return (
        keyed.select(
            "trip_id", "data_type", "event_time",
            "pickup_datetime", "dropoff_datetime", "fare_amount", "record_id",
        )
        .groupBy("trip_id")
        .applyInPandasWithState(
            _match_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- Spark 4 transformWithState variant ------------------------------------
#
# Same state machine on the successor API (SPARK-46815 "Arbitrary State
# API v2"): object-oriented processor, named state slots, explicit
# per-key timers, and state-schema evolution support. Requires the
# RocksDB state store provider (the test sets it) and the `protobuf`
# package at runtime (Spark's TWS python worker imports it; the test
# skips where it's absent); semantics are identical to
# `stateful_match` above and to the stream-stream join.

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402


class _TripMatchProcessor(StatefulProcessor):
    """Per-trip first-match-wins pairing with event-time eviction."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._pair = handle.getValueState("pair", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (trip_id,) = key
        start_us, start_rid, end_us, end_fare, end_rid = (
            tuple(self._pair.get())
            if self._pair.exists()
            else (-1, None, -1, None, None)
        )
        for pdf in rows:
            pdf = pdf.sort_values(["event_time", "record_id"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                if row.data_type == "trip_start" and start_us < 0:
                    start_us, start_rid = _us(row.pickup_datetime), row.record_id
                elif row.data_type == "trip_end" and end_us < 0:
                    end_us, end_fare, end_rid = (
                        _us(row.dropoff_datetime),
                        float(row.fare_amount),
                        row.record_id,
                    )
        if start_us >= 0 and end_us >= 0:
            self._pair.clear()
            yield pd.DataFrame(
                {
                    "trip_id": [trip_id],
                    "pickup_datetime": [pd.Timestamp(start_us * 1000)],
                    "dropoff_datetime": [pd.Timestamp(end_us * 1000)],
                    "fare_amount": [end_fare],
                    "record_id": [start_rid],
                    "end_record_id": [end_rid],
                    "data_type": ["completed_trip"],
                    "status": ["completed"],
                }
            )
        else:
            self._pair.update((start_us, start_rid, end_us, end_fare, end_rid))
            self._handle.registerTimer(
                timerValues.getCurrentWatermarkInMs() + 3_600_000
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        self._pair.clear()
        return iter([])

    def close(self) -> None:
        pass


def tws_match(events: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """`stateful_match` on transformWithStateInPandas (Spark 4 API v2).

    Identical contract: interleaved TRIP_EVENT stream in, one completed
    record per matched trip out, unmatched state evicted one hour past
    the watermark by a per-key timer instead of a GroupState timeout.
    """
    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "event_time", F.coalesce("pickup_datetime", "dropoff_datetime")
    ).withWatermark("event_time", watermark)
    return (
        keyed.select(
            "trip_id", "data_type", "event_time",
            "pickup_datetime", "dropoff_datetime", "fare_amount", "record_id",
        )
        .groupBy("trip_id")
        .transformWithStateInPandas(
            _TripMatchProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
