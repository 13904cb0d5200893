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
are present the merged completed record is emitted once and the state
is cleared. Unmatched events wait — bounded by an event-time timeout
instead of the reference's "wait forever" (same deviation, same reason
as the join watermark).

Relationship to the join flavor (exact, not hand-waved):
- both dedup replayed/duplicate inputs with
  ``dropDuplicatesWithinWatermark`` on (trip_id, data_type) — without
  it, an at-least-once redelivery of a matched pair AFTER the state was
  cleared would re-pair and emit a duplicate completed record;
- both reject a pair whose dropoff precedes its pickup (corrupt
  producer / clock skew): the join's range condition never matches it,
  and the state machine discards the non-conforming END and keeps
  waiting. A later conforming end can still match — but only if it
  arrives AFTER the (trip_id, trip_end) dedup watermark has expired:
  the redelivery guard upstream keys on (trip_id, data_type), so a
  replacement end inside that horizon is collapsed with the discarded
  one and never reaches the state machine (exactly what
  tests/test_streaming.py::test_stateful_rejects_dropoff_before_pickup
  exercises — its conforming end waits out the watermark). That is the
  at-least-once trade: within the horizon, same-key same-type events
  are presumed redeliveries, not corrections;
- eviction differs by MECHANISM, not intent: the join bounds state via
  its ``join_window`` range condition; the state machine via an
  event-time deadline of (event's own time, as seen by the watermark)
  + 1 h — i.e. an unmatched event waits the full watermark lateness
  allowance plus an hour. The deadline is anchored to the EVENT time,
  never the raw watermark: a watermark-anchored deadline set during
  the FIRST micro-batch (watermark still 0) would be an epoch-1970
  timestamp, and every key unmatched at the end of batch 1 would be
  evicted the moment the watermark first advanced — silently losing
  its match (regression-pinned in
  tests/test_streaming.py::test_stateful_first_batch_keys_survive).

State is per-key and O(1); the grouping shuffle is the same hash
exchange the join would need.
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

#: grace past the event's own time (as seen by the watermark) before an
#: unmatched key is evicted
_GRACE_MS = 3_600_000


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _deadline_ms(start_us: int, end_us: int, wm_ms: int) -> int:
    """Event-anchored eviction deadline: latest stored event time
    (never below watermark+1 — EventTimeTimeout requires a future
    timestamp) plus the grace. Anchoring to the event, not the
    watermark, is what makes the FIRST micro-batch (watermark 0) set a
    real deadline instead of epoch+1h."""
    latest_ms = max(start_us, end_us) // 1000
    return max(latest_ms, wm_ms + 1) + _GRACE_MS


def _consume_events(pdfs, start_us, start_rid, end_us, end_fare, end_rid):
    """First-match-wins slot filling, deterministic order; shared by
    both API flavors so they cannot drift."""
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
    return start_us, start_rid, end_us, end_fare, end_rid


def _emit_or_carry(trip_id, start_us, start_rid, end_us, end_fare, end_rid):
    """(emit_frame | None, carried_state | None): a conforming pair
    emits and clears; a dropoff-before-pickup pair discards the END
    (the join's range condition would never have matched it) and keeps
    waiting; an incomplete pair carries."""
    if start_us >= 0 and end_us >= 0 and end_us < start_us:
        end_us, end_fare, end_rid = -1, None, None  # discard bad end
    if start_us >= 0 and end_us >= 0:
        return (
            pd.DataFrame(
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
            ),
            None,
        )
    return None, (start_us, start_rid, end_us, end_fare, end_rid)


def _match_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (trip_id,) = key
    if state.hasTimedOut:
        # bounded-lateness eviction (deviation from "wait forever")
        state.remove()
        return
    fields = state.get if state.exists else (-1, None, -1, None, None)
    fields = _consume_events(pdfs, *fields)
    emit, carry = _emit_or_carry(trip_id, *fields)
    if emit is not None:
        state.remove()
        yield emit
    else:
        state.update(carry)
        state.setTimeoutTimestamp(
            _deadline_ms(carry[0], carry[2], state.getCurrentWatermarkMs())
        )


def _dedup_replays(keyed: DataFrame) -> DataFrame:
    """The same at-least-once guard the join flavor applies
    (matcher.py): replayed/duplicate events collapse to one row per
    (trip_id, data_type) within the watermark — without this, a
    redelivered pair arriving after its match cleared the state would
    re-pair and emit a duplicate completed record."""
    return keyed.dropDuplicatesWithinWatermark(["trip_id", "data_type"])


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
        _dedup_replays(keyed)
        .select(
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
# skips where it's absent). Semantics mirror `stateful_match` via the
# shared _consume_events/_emit_or_carry/_deadline_ms helpers; timer
# hygiene is explicit here because the v2 API ACCUMULATES timers (one
# registerTimer per unmatched batch) instead of sliding a single
# timeout — the processor therefore tracks its live deadline in a state
# slot, deletes the old timer before registering a new one, and ignores
# any stale timer that fires for a key whose deadline has moved.

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402

_DEADLINE_SCHEMA = T.StructType([T.StructField("ms", T.LongType())])


class _TripMatchProcessor(StatefulProcessor):
    """Per-trip first-match-wins pairing with event-time eviction."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._pair = handle.getValueState("pair", STATE_SCHEMA)
        self._deadline = handle.getValueState("deadline", _DEADLINE_SCHEMA)

    def _clear_timer(self) -> None:
        if self._deadline.exists():
            self._handle.deleteTimer(int(self._deadline.get()[0]))
            self._deadline.clear()

    def handleInputRows(self, key, rows, timerValues):
        (trip_id,) = key
        fields = (
            tuple(self._pair.get())
            if self._pair.exists()
            else (-1, None, -1, None, None)
        )
        fields = _consume_events(rows, *fields)
        emit, carry = _emit_or_carry(trip_id, *fields)
        if emit is not None:
            self._pair.clear()
            self._clear_timer()  # a leftover timer would evict a
            # re-created state for this key later
            yield emit
        else:
            self._pair.update(carry)
            deadline = _deadline_ms(
                carry[0], carry[2], timerValues.getCurrentWatermarkInMs()
            )
            self._clear_timer()  # one live timer per key, not one per batch
            self._handle.registerTimer(deadline)
            self._deadline.update((deadline,))

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # only the CURRENT deadline evicts; a stale timer (deadline
        # has since moved) is ignored
        if self._deadline.exists() and int(self._deadline.get()[0]) == int(
            expiredTimerInfo.getExpiryTimeInMs()
        ):
            self._pair.clear()
            self._deadline.clear()
        return iter([])

    def close(self) -> None:
        pass


def tws_match(events: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """`stateful_match` on transformWithStateInPandas (Spark 4 API v2).

    Identical contract: interleaved TRIP_EVENT stream in, one completed
    record per matched trip out, unmatched state evicted by a per-key
    event-time timer at the shared `_deadline_ms` deadline.
    """
    from pyspark.sql import functions as F

    keyed = events.withColumn(
        "event_time", F.coalesce("pickup_datetime", "dropoff_datetime")
    ).withWatermark("event_time", watermark)
    return (
        _dedup_replays(keyed)
        .select(
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
