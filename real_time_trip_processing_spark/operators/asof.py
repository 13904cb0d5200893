"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY §2.4 "not present in the reference"; mandated by the extension
surface).

Implemented as union + last-ignoring-nulls window rather than
per-group ``pd.merge_asof``: the union is shuffle-free, the single
window pass shuffles each key group once, and nothing crosses the
Python boundary. This is the shape that scales — a pandas-per-group
as-of would Arrow-transfer the whole fact table.

Semantics: for every left row, attach the payload of the latest right
row with the same key and ``right.ts <= left.ts`` (backward as-of,
inclusive — identical to DuckDB's ``ASOF JOIN ... ON a.ts >= b.ts``,
which oracles it). Rows with no prior right row keep null payloads
(left join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join.

    ``right`` must contain ``key``, ``ts`` and the ``payload_cols`` (its
    event-time may be duplicated into a payload column to surface the
    matched timestamp); payload column names must not collide with
    ``left``'s. Ties on ``ts`` match (inclusive); among right rows with
    identical (key, ts) the union order is broken deterministically by
    the payload tuple.
    """
    lt = left.withColumn("__tag", F.lit(1))
    # pack the payload into ONE struct so last(..., ignorenulls) carries
    # the latest right row atomically — per-column lasts could stitch
    # fields from different right rows when payload columns hold nulls
    rt = (
        # a NULL-ts right row can never win an as-of match (ASOF's
        # `left.ts >= right.ts` is NULL for it) — but nulls sort FIRST
        # ascending, so without the filter it would ride the running
        # last() as a "before everything" payload and surface matches
        # the ASOF semantics (and the DuckDB oracle) reject
        right.filter(F.col(ts).isNotNull())
        .select(key, ts, *payload_cols)
        .withColumn("__p", F.struct(*payload_cols))
        .drop(*payload_cols)
        .withColumn("__tag", F.lit(0))
    )
    u = lt.drop(*[c for c in payload_cols if c in left.columns]).unionByName(
        rt, allowMissingColumns=True
    )
    # right rows (tag 0) sort before left rows at equal ts → inclusive
    # match; the payload struct breaks exact right-side ties
    # deterministically (struct ordering is field-wise lexicographic)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "__tag", "__p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__p", F.last("__p", ignorenulls=True).over(w))
    u = u.select(
        "*", *[F.col(f"__p.{c}").alias(c) for c in payload_cols]
    ).drop("__p")
    return u.filter(F.col("__tag") == 1).drop("__tag")


def gap_fill_daily(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Time-series densification with forward fill: per key, one row for
    EVERY calendar day between the key's first and last activity, each
    day carrying the key's last-observed end-of-day value — the
    resample/locf primitive behind dashboards and feature snapshots
    over sparse event streams.

    Per (key, day) the observed value is the LAST event's (by ts, with
    ``tiebreak`` breaking exact-timestamp ties deterministically);
    gap days inherit the previous observed value via a
    last-ignoring-nulls window. ``observed`` flags whether the day had
    any events (join marker — a day whose last event carries a NULL
    value is still observed, while its value forward-fills past it).

    Scale shape: the raw stream is touched ONCE, by the (key, day)
    last-event window; everything after operates on the day-collapsed
    frame (≤ one row per key-day — orders of magnitude smaller than
    the events). That collapsed frame then takes a per-key min/max
    rollup, row-local calendar expansion (``sequence`` + explode), the
    (key, day) spine join, and the per-key fill window — two exchange
    granularities ((key, day) and (key)), all on collapsed data. Spine
    width is bounded by each key's own active span, not the corpus
    span — a key active 3 days costs 3 rows at any corpus size.
    """
    day = F.date_trunc("day", F.col(ts))
    w_last = Window.partitionBy(key, "day").orderBy(
        F.desc(ts), F.desc(tiebreak)
    )
    observed = (
        events.select(key, day.alias("day"), F.col(ts), F.col(tiebreak), F.col(value))
        .withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(
            key, "day", F.col(value).alias("day_value"), F.lit(1).alias("__obs")
        )
    )
    spine = (
        observed.groupBy(key)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key,
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w_fill = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(observed, [key, "day"], "left")
        .withColumn(
            "value_filled",
            F.round(F.last("day_value", ignorenulls=True).over(w_fill), 6),
        )
        .select(
            key,
            "day",
            "value_filled",
            # join marker, not day_value IS NOT NULL: a day whose last
            # event carries a NULL value is still an OBSERVED day (and
            # the fill window skips its NULL) — matches the oracle's
            # LEFT-JOIN-match semantics
            F.coalesce(F.col("__obs"), F.lit(0)).alias("observed"),
        )
    )
