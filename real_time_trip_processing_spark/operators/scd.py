"""Slowly-changing-dimension (SCD2) builders — the WRITE side of
`operators/joins.point_in_time_join`: collapse an event stream into
[valid_from, valid_to) state intervals, and maintain that table
INCREMENTALLY as new events arrive.

The incremental contract is the same as the KPI/HLL/quantile rollups:
merge(existing_scd2, new_events) must equal the full rebuild over all
events, hash-for-hash — pinned by the declared query's oracle, which IS
the full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    events: DataFrame,
    key: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """(key, state, valid_from, valid_to) intervals per state run —
    lag to detect change points, lead to close each interval (open
    interval = NULL valid_to). One exchange on the key; the second
    window runs on the transition-filtered (much smaller) frame."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes = events.select(
        key,
        state,
        ts,
        tiebreak,
        F.lag(state).over(w).alias("__prev"),
        # a key's FIRST row has no predecessor; a null-safe comparison
        # against __prev=NULL can't distinguish it from "previous state
        # was NULL", so first-ness is its own flag
        (F.row_number().over(w) == 1).alias("__first"),
    )
    # null-SAFE change detection: a NULL state is a real state (an
    # unknown/cleared status run) — `__prev != state` is NULL when
    # either side is NULL, which silently dropped every NULL-state run
    # AND emitted adjacent same-state duplicates around it
    transitions = changes.filter(
        F.col("__first") | ~F.col("__prev").eqNullSafe(F.col(state))
    ).select(
        key,
        F.col(state).alias("state"),
        F.col(ts).alias("valid_from"),
        F.col(tiebreak).alias("__tb"),
    )
    w2 = Window.partitionBy(key).orderBy("valid_from", "__tb")
    return transitions.select(
        key,
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def scd2_merge(
    existing: DataFrame,
    new_events: DataFrame,
    key: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Incremental SCD2 maintenance: apply an APPEND-ONLY batch of new
    events to an existing SCD2 table. Closed intervals are immutable
    history and pass through UNTOUCHED; each key's open interval is
    re-derived from one seed row (its state at its valid_from) plus the
    key's new events — so the work is proportional to
    |open intervals| + |batch|, never to history.

    PRECONDITION: every new event's timestamp is STRICTLY GREATER than
    all existing timestamps for its key (a watermark/cutoff split, which
    is what `scd2_merge_incremental`'s cutoff caller and the hypothesis
    equivalence test guarantee). ``ts`` equal to an existing event's ts
    inside the open run is NOT supported: the seed row summarises the
    run by its FIRST event only, so a tying new event cannot tie-break
    against the run's collapsed later events and merge may emit a
    different (coarser) interval set than the full rebuild.

    Under that precondition, equality with the full rebuild holds
    because the seed row summarises the open run exactly: the run's
    first timestamp and state are the seed, same-state new events
    extend the run (collapsed by the lag filter), and a state change
    closes it at the new event's time — precisely what the full
    recompute's window does. The seed's tiebreak sorts below any real
    event so append-only ties against the SEED's timestamp resolve
    identically.
    """
    closed = existing.filter(F.col("valid_to").isNotNull()).select(
        key, "state", "valid_from", "valid_to"
    )
    seed = existing.filter(F.col("valid_to").isNull()).select(
        F.col(key),
        F.col("state").alias(state),
        F.col("valid_from").alias(ts),
        F.lit(-1).cast("long").alias(tiebreak),
    )
    stream = seed.unionByName(
        new_events.select(key, state, ts, tiebreak)
    )
    return closed.unionByName(
        scd2_history(stream, key, state, ts, tiebreak)
    )
