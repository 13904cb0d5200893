"""The streaming matcher: reference Lambda 2 as a watermarked
stream-stream join (SURVEY §2.4 J1/J2, §2.10).

Reference semantics → Spark mapping:
- DynamoDB raw-item index + counterpart point query
  (scripts/lambda2.py:27-63) → the stream-stream join state store;
- "unmatched events wait forever" (scripts/lambda2.py:254-255) → a
  *configurable* watermark (default 24h; trips are intra-day). This is
  the one documented deviation: unbounded state is a cluster-killer at
  100 TB, so lateness is bounded and the bound is policy;
- first-match-wins + at-least-once duplicates →
  ``dropDuplicatesWithinWatermark`` on (trip_id, data_type) before the
  join, so replayed/duplicate events (reference scripts/lambda1.py:119-150)
  collapse to one state row per side;
- merged record with end_<col> collision rename
  (scripts/lambda2.py:93-104) → the same deterministic projection used
  by the batch matcher (operators/joins.merge_events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_match_start_end(
    starts: DataFrame,
    ends: DataFrame,
    key: str = "trip_id",
    start_ts: str = "pickup_datetime",
    end_ts: str = "dropoff_datetime",
    watermark: str = "24 hours",
    join_window: str | None = None,
) -> DataFrame:
    """Watermarked stream-stream inner join of start/end events.

    ``join_window`` optionally bounds dropoff within [pickup, pickup+w]
    so the state store can evict matched/expired rows by event time —
    at scale, always set it; default derives it from the watermark.

    Dedup keys (round 12, guide §2.4 — remove shuffles outright): each
    side of this matcher is a SINGLE event type by contract
    (`split_start_end` routes by data_type before the matcher sees the
    streams), so the reference's (trip_id, data_type) dedup key is
    per-side equivalent to plain (trip_id) — and the narrower key lets
    the stateful dedup share the stream-stream join's exact (trip_id)
    clustering: one exchange per side per micro-batch instead of two
    (StatefulOpClusteredDistribution requires an exact key match, so a
    (trip_id, data_type)-keyed dedup forced a second hash exchange
    before the join). Replay outputs are pinned identical by the
    streaming suite; a caller that feeds a MIXED stream to one side is
    outside the matcher's contract either way (its per-type timestamp
    columns would be null on the foreign rows).
    """
    w = join_window or watermark
    s = starts.withWatermark(start_ts, watermark).dropDuplicatesWithinWatermark(
        [key]
    )
    e = ends.withWatermark(end_ts, watermark).dropDuplicatesWithinWatermark(
        [key]
    )
    cond = (
        (F.col(f"__s.{key}") == F.col(f"__e.{key}"))
        & (F.col(f"__e.{end_ts}") >= F.col(f"__s.{start_ts}"))
        & (
            F.col(f"__e.{end_ts}")
            <= F.col(f"__s.{start_ts}") + F.expr(f"INTERVAL {w}")
        )
    )
    # merge_events aliases sides __s/__e and applies the collision rename
    return merge_events_streaming(s, e, key, cond)


def merge_events_streaming(s: DataFrame, e: DataFrame, key: str, cond) -> DataFrame:
    """Streaming variant of J2: THE batch merge_events projection (one
    shared implementation — the collision-rename policy cannot drift
    between the two paths) with the range-join condition required for
    state eviction passed through."""
    from ..operators.joins import merge_events

    return merge_events(s, e, key, cond=cond)
