"""Analytic extension queries: window-function suite, set operations,
interval (range) join, cube, typed JSON extraction.

None of these exist in the reference (SURVEY §2.6 "no window
functions", §2.8 "no intersect/except", §2.4 "no theta/range joins") —
they are part of the complete-engine surface a reference user would
expect, declared with DuckDB oracles like everything else.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from .registry import declare


@declare(
    "window_showcase",
    oracle="""
    SELECT event_id, user_id, ts, value,
           ROW_NUMBER() OVER w AS seq,
           LAG(value) OVER w AS prev_value,
           ROUND(value - COALESCE(LAG(value) OVER w, 0.0), 8) AS delta,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 8)
             AS moving_avg3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_showcase(spark, sf_dir):
    """Per-user event-sequence analytics: row_number, lag delta and a
    3-row moving average in ONE window spec — a single hash exchange on
    user_id followed by one sort serves all four expressions (check
    with .explain: one Window node, one Exchange)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, Window.currentRow)
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.row_number().over(w).alias("seq"),
        F.lag("value").over(w).alias("prev_value"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 8
        ).alias("delta"),
        F.round(F.avg("value").over(wf), 8).alias("moving_avg3"),
    )


@declare(
    "intersect_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def intersect_users(spark, sf_dir):
    """Set intersection (SURVEY §2.8 extension): users who both clicked
    and purchased. Spark plans INTERSECT as a distinct-ing left-semi
    join — one shuffle per side on the full row as key."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@declare(
    "except_users",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS pickup_date
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, date_trunc('day', ts) AS pickup_date
    FROM events WHERE event_type = 'purchase'
    """,
)
def except_users(spark, sf_dir):
    """Set difference at (user, day) grain: user-days with a click but
    no purchase (per-user alone is empty at test SFs — every user has
    every event type). ``subtract`` is SQL EXCEPT (distinct) — a
    left-anti join after deduplication, unlike exceptAll's multiset
    arithmetic."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("pickup_date"),
        "event_type",
    )
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    buys = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    return clicks.subtract(buys)


@declare(
    "except_all_user_days",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'purchase'
    """,
)
def except_all_user_days(spark, sf_dir):
    """Multiset EXCEPT ALL (vs except_users' distinct EXCEPT): each
    purchase row cancels ONE click row per (user, day) — multiplicity
    arithmetic Spark plans as a count-tagged aggregate join, not a
    distinct. The pair proves both set-op semantics (§2.8)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    )
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    buys = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    return clicks.exceptAll(buys)


@declare(
    "intersect_all_user_days",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = 'purchase'
    """,
)
def intersect_all_user_days(spark, sf_dir):
    """Multiset INTERSECT ALL: (user, day) rows kept min(click_count,
    purchase_count) times — the multiplicity-preserving twin of
    intersect_users."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    )
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    buys = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    return clicks.intersectAll(buys)


@declare(
    "range_join_1h",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           COUNT(v.event_id) AS views_1h,
           ROUND(COALESCE(SUM(v.value), 0.0), 8) AS view_value_1h
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def range_join_1h(spark, sf_dir):
    """Interval (range) join: views by the same user in the hour before
    each purchase. The equi-key (user_id) keeps this a hash join with
    the range as a residual predicate — NOT a broadcast-nested-loop;
    at 100 TB the alternative (pure theta join) would be quadratic."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
    )
    joined = p.join(
        v,
        (v.v_user == p.user_id)
        & (v.v_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (v.v_ts < p.p_ts),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "p_ts").agg(
        F.count("v_id").alias("views_1h"),
        F.round(F.coalesce(F.sum("v_value"), F.lit(0.0)), 8).alias("view_value_1h"),
    ).withColumnRenamed("p_ts", "ts")


@declare(
    "kpi_cube",
    oracle="""
    WITH e AS (SELECT event_type, date_trunc('day', ts) AS pickup_date, value
               FROM events)
    SELECT event_type, pickup_date,
           SUM(value) AS total_fare, COUNT(*) AS cnt
    FROM e GROUP BY CUBE (event_type, pickup_date)
    """,
)
def kpi_cube(spark, sf_dir):
    """CUBE over (event_type, day): all four grouping combinations in
    one pass (Expand + single shuffle) — the hierarchical-aggregate
    companion to kpi_rollup."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", F.col("ts")).alias("pickup_date"), "value"
    )
    return ev.cube("event_type", "pickup_date").agg(
        F.sum("value").alias("total_fare"), F.count(F.lit(1)).alias("cnt")
    )


@declare(
    "approx_distinct_users",
    oracle="""
    SELECT date_trunc('day', ts) AS pickup_date,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS events, TRUE AS hll_ok
    FROM events GROUP BY 1
    """,
)
def approx_distinct_users(spark, sf_dir):
    """Sketch tier of distinct counting: HyperLogLog++ per day — one
    pass, mergeable partials, no two-phase distinct expansion. At
    extreme cardinality this replaces the exact two-phase distinct.

    HLL estimates are engine-specific, but the accuracy contract is
    checkable: the estimate must land within 5×rsd of the exact count
    (measured worst case on this corpus: 1.4% at rsd=0.02; HLL register
    maxima are order-independent, so the boolean is deterministic under
    any partitioning). The query emits the exact count (hash-matched
    value-for-value) plus the band boolean; the oracle computes the
    exact count and TRUE — an out-of-band sketch can never go green."""
    ev = table(spark, sf_dir, "events").withColumn(
        "pickup_date", F.date_trunc("day", F.col("ts"))
    )
    agg = ev.groupBy("pickup_date").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("events"),
    )
    band = F.abs(F.col("approx_users") - F.col("exact_users")) <= F.greatest(
        F.lit(0.10) * F.col("exact_users"), F.lit(3.0)
    )
    return agg.select("pickup_date", "exact_users", "events", band.alias("hll_ok"))


@declare(
    "skew_salted_kpi",
    oracle="""
    SELECT event_type, SUM(value) AS total, COUNT(value) AS cnt,
           MIN(value) AS vmin, MAX(value) AS vmax, AVG(value) AS vavg
    FROM events GROUP BY event_type
    """,
)
def skew_salted_kpi(spark, sf_dir):
    """Skew-resilient aggregation (operators/skew.py): identical result
    to the plain groupBy — the oracle IS the plain GROUP BY — but a hot
    key is reduced by `buckets` tasks instead of one. The shape that
    keeps a 100 TB aggregation from serializing on its hottest group."""
    from ..operators.skew import salted_agg

    return salted_agg(
        table(spark, sf_dir, "events"),
        ["event_type"],
        [
            ("value", "sum", "total"),
            ("value", "count", "cnt"),
            ("value", "min", "vmin"),
            ("value", "max", "vmax"),
            ("value", "avg", "vavg"),
        ],
        buckets=16,
    )


@declare(
    "props_typed_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           COUNT(*) AS cnt, AVG(value) AS avg_value
    FROM events WHERE props IS NOT NULL
    GROUP BY 1
    """,
)
def props_typed_extract(spark, sf_dir):
    """X5 as a standalone op: schema-typed from_json over the props
    column (not per-field get_json_object — one parse, all fields),
    then aggregate by the extracted key."""
    ev = table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return parsed.groupBy(F.col("p.k").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt"), F.avg("value").alias("avg_value")
    )


@declare(
    "skew_salted_join",
    oracle="""
    SELECT c.c_nationkey, ROUND(SUM(e.value), 6) AS total_value,
           COUNT(*) AS n_events
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_nationkey
    """,
)
def skew_salted_join(spark, sf_dir):
    """Skew-resilient join demo: events x customer through
    ``salted_join`` — same answer as the plain join (the oracle IS the
    plain join), but a hot user_id's rows spread over 16 reducers, each
    with its own replicated copy of the matching customer row. For when
    the build side exceeds the broadcast threshold and AQE's skew split
    can't save a single pathological key."""
    from ..operators.skew import salted_join

    e = table(spark, sf_dir, "events").select("user_id", "value")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(e, c, "user_id", "c_custkey", buckets=16)
    return joined.groupBy("c_nationkey").agg(
        F.round(F.sum("value"), 6).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@declare(
    "rolling_7d_user_value",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_diff('day', TIMESTAMP '1970-01-01', date_trunc('day', ts))
                  AS BIGINT) AS day_num,
             ROUND(SUM(value), 6) AS day_value
      FROM events GROUP BY 1, 2)
    SELECT user_id, day_num, day_value,
           ROUND(SUM(day_value) OVER (PARTITION BY user_id ORDER BY day_num
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rolling_7d,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY day_num
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS active_days_7d
    FROM daily
    """,
)
def rolling_7d_user_value(spark, sf_dir):
    """Time-series RANGE frame: per-user 7-calendar-day rolling spend,
    correct across gaps (a user absent for 3 days still gets a
    7-day-bounded window, which ROWS BETWEEN cannot express). Day
    granularity is an epoch day number so the frame bound is an
    integer range — identical semantics in Spark and the oracle. The
    daily pre-aggregate shuffles once on (user, day); the window reuses
    the user_id hash partitioning with only a per-partition sort."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "user_id",
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("day_num"),
        )
        .agg(F.round(F.sum("value"), 6).alias("day_value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day_num",
        "day_value",
        F.round(F.sum("day_value").over(w), 6).alias("rolling_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("active_days_7d"),
    )


@declare(
    "event_state_history",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_id
      FROM events),
    transitions AS (
      SELECT user_id, event_type AS state, ts AS valid_from, event_id
      FROM changes
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to
    FROM transitions
    """,
)
def event_state_history(spark, sf_dir):
    """SCD2-style state history: collapse each user's event stream into
    [valid_from, valid_to) intervals per state run (lag to detect
    change points, lead to close each interval; open interval = NULL).
    Both windows share the user_id partitioning — one exchange, two
    sorts over progressively smaller data (the transition filter drops
    same-state repeats before the second window)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = table(spark, sf_dir, "events")
    changes = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    transitions = changes.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "event_id",
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return transitions.select(
        "user_id", "state", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


@declare(
    "kpi_15min",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n, ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def kpi_15min(spark, sf_dir):
    """Hypertable-style sub-hour rollup: 15-minute tumbling buckets via
    the same `window()` expression the streaming path uses — in batch
    it folds to pure bucket arithmetic on the scan (no state), one
    partial+final aggregate, so the continuous-aggregate pattern is a
    single plan shared between batch backfill and live stream."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@declare(
    "kpi_hopping_1h",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
             AS window_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS total_value
    FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
    GROUP BY 1, 2
    """,
)
def kpi_hopping_1h(spark, sf_dir):
    """Hopping (sliding) rollup: 1-hour windows advancing every 15
    minutes via ``window(ts, '1 hour', '15 minutes')`` — each event
    lands in exactly 4 overlapping windows. Spark expands the
    assignment row-locally inside the scan stage (a 4-way generate,
    no self-join), then one partial+final aggregate; the same
    expression drives the streaming flavor with a watermark. The
    oracle replays the epoch-aligned window algebra: the 4 member
    windows of an event are its 15-min bucket minus k·15min, k∈0..3."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


@declare(
    "rollup_cascade",
    oracle="""
    WITH m15 AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS b15, event_type,
             COUNT(*) AS n, SUM(value) AS sv
      FROM events GROUP BY 1, 2),
    hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', b15) AS b1h, event_type,
             SUM(n) AS n, SUM(sv) AS sv
      FROM m15 GROUP BY 1, 2)
    SELECT date_trunc('day', b1h) AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n, ROUND(SUM(sv), 6) AS total_value
    FROM hourly GROUP BY 1, 2
    """,
)
def rollup_cascade(spark, sf_dir):
    """Multi-resolution rollup cascade: daily KPIs derived from hourly,
    hourly from 15-minute — each level re-aggregates the one below it,
    never the raw events. The continuous-aggregate refresh pattern at
    100 TB: only the finest rollup ever scans raw data (and in
    production it is the one materialized/streamed); every coarser
    resolution aggregates ~10-100× fewer rows, so the cascade costs
    ~nothing beyond level one. Counts stay exact across levels;
    re-grouped double sums agree because addition is re-bucketed, not
    re-ordered arbitrarily (same partial-aggregation tree both
    engines)."""
    e = table(spark, sf_dir, "events")
    m15 = e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
    )
    hourly = m15.groupBy(
        F.window(F.col("w.start"), "1 hour").alias("w2"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    return hourly.groupBy(
        F.date_trunc("day", F.col("w2.start")).alias("day"), "event_type"
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("sv"), 6).alias("total_value"),
    )


@declare(
    "revenue_share_by_nation",
    oracle="""
    WITH nrev AS (
      SELECT n.n_name AS nation,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name)
    SELECT nation, CAST(rev AS DOUBLE) AS revenue,
           100.0 * CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE)
             AS pct_of_total
    FROM nrev
    """,
)
def revenue_share_by_nation(spark, sf_dir):
    """Ratio-to-report: each nation's share of global revenue. The
    empty-frame window (SUM OVER ()) runs on the 25-row aggregate, not
    the fact table — the only cost that scales is the one groupBy
    shuffle; the single-partition window is constant-sized by
    construction.

    Money sums run in DECIMAL (prices/discounts are exact 2-decimal
    values): a double sum over millions of rows carries summation-order
    noise in the low ulps, which can cross a ROUND boundary and flip
    the 6th decimal between engines/partitionings; the decimal sum is
    exact and order-independent, so the final double conversion and the
    share division are bit-identical everywhere."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_term = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    nrev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev_term).alias("rev"))
    )
    w = Window.partitionBy()
    tot = F.sum("rev").over(w)  # decimal sum: exact, order-independent
    return nrev.select(
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        (F.lit(100.0) * F.col("rev").cast("double") / tot.cast("double")).alias(
            "pct_of_total"
        ),
    )


@declare(
    "outlier_events",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN stats s ON s.event_type = e.event_type
    WHERE ABS(e.value - s.mu) > 3 * s.sigma
    """,
)
def outlier_events(spark, sf_dir):
    """Data-quality screen: events beyond 3 sigma of their type's
    distribution. Per-type moments aggregate to a handful of rows that
    broadcast back onto the scan — two passes over the fact but zero
    fact-table shuffles; the z-score filter is map-side. (A windowed
    formulation would shuffle the full table by a 5-value key — the
    skew worst case.)"""
    e = table(spark, sf_dir, "events")
    stats = e.groupBy(F.col("event_type").alias("s_type")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        e.join(F.broadcast(stats), e.event_type == F.col("s_type"))
        .filter(F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sigma"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias(
                "zscore"
            ),
        )
    )


@declare(
    "user_day_bookends",
    oracle="""
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
           FIRST_VALUE(value) OVER w AS first_value_of_day,
           LAST_VALUE(value) OVER (PARTITION BY user_id, date_trunc('day', ts)
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND UNBOUNDED FOLLOWING)
             AS last_value_of_day,
           NTH_VALUE(value, 2) OVER (PARTITION BY user_id, date_trunc('day', ts)
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING)
             AS second_value_of_day
    FROM events
    WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts, event_id)
    """,
)
def user_day_bookends(spark, sf_dir):
    """Bookend analytics: first/last/second event value of each user's
    day — the remaining analytic functions (first_value, last_value,
    nth_value) on an explicitly unbounded frame (last/nth need the full
    frame; the default RANGE..CURRENT ROW frame would silently return
    the running last). One window exchange on (user, day), then a
    DISTINCT that reuses the same keys, so AQE plans it without a
    second wide shuffle."""
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("user_id", day.alias("day")).orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            day.alias("day"),
            F.first_value("value").over(w).alias("first_value_of_day"),
            F.last_value("value").over(full).alias("last_value_of_day"),
            F.nth_value("value", 2).over(full).alias("second_value_of_day"),
        )
        .distinct()
    )


@declare(
    "cohort_retention",
    oracle="""
    WITH d AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
    c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id),
    m AS (SELECT DISTINCT d.user_id, c.cohort_day,
                 CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset
          FROM d JOIN c ON d.user_id = c.user_id)
    SELECT cohort_day, day_offset,
           COUNT(*) AS n_users
    FROM m GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-active day, then
    distinct active users per (cohort, day-offset) — the standard
    retention triangle. Shape: the per-user MIN collapses to one row
    per user and joins back on user_id (same partitioning as the
    activity dedup — one user-keyed shuffle chain, then a tiny matrix
    aggregate)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@declare(
    "event_transitions",
    oracle="""
    WITH s AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev_type
               FROM events)
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
           ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 8)
             AS p_transition
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transitions(spark, sf_dir):
    """Per-user event-type transition matrix with conditional
    probabilities — first-order Markov statistics over behavioral
    sequences (the event-stream cousin of bigram_next_word). One
    user-keyed window for lag, then a tiny (types × types) aggregate;
    the probability normalization is window arithmetic over that tiny
    matrix."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        table(spark, sf_dir, "events")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    cnt = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 8).alias("p_transition"),
    )


@declare(
    "hot_keys",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    t AS (SELECT SUM(n) AS total FROM c),
    r AS (SELECT user_id, n, row_number() OVER (ORDER BY n DESC, user_id) AS rnk
          FROM c)
    SELECT r.user_id, r.n, CAST(r.rnk AS BIGINT) AS rnk,
           ROUND(r.n / t.total, 8) AS share
    FROM r, t WHERE r.rnk <= 10
    """,
)
def hot_keys(spark, sf_dir):
    """Skew diagnostics: the ten hottest join/agg keys (events.user_id)
    with their traffic share — the view that tells you whether a key
    needs salting or AQE skew handling BEFORE the job falls over. One
    partial-aggregated shuffle to ~|users| rows; the top-10 and the
    total ride that tiny aggregate."""
    from pyspark.sql import Window as W

    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    all_w = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = c.withColumn(
        "rnk",
        F.row_number().over(W.partitionBy().orderBy(F.desc("n"), "user_id")),
    ).withColumn("share", F.round(F.col("n") / F.sum("n").over(all_w), 8))
    return r.filter(F.col("rnk") <= 10).select(
        "user_id", "n", F.col("rnk").cast("long").alias("rnk"), "share"
    )


@declare(
    "point_in_time_state",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_id
      FROM events),
    transitions AS (
      SELECT user_id, event_type AS state, ts AS valid_from, event_id
      FROM changes
      WHERE prev_type IS NULL OR prev_type <> event_type),
    dim AS (
      SELECT user_id, state, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, event_id) AS valid_to
      FROM transitions),
    facts AS (SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, f.ts, f.value,
           d.state AS state_at_event, d.valid_from
    FROM facts f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def point_in_time_state(spark, sf_dir):
    """Point-in-time enrichment (feature-store correctness): every
    purchase event joined to the SCD2 state version valid AT ITS OWN
    timestamp — never a later one (no future leakage into training
    features). The dimension is the event_state_history interval table;
    the join is equi on user_id with interval containment as the
    residual predicate, so it plans as a keyed join, not a cross
    product."""
    from ..operators.joins import point_in_time_join

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = table(spark, sf_dir, "events")
    changes = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    transitions = changes.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "event_id",
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    dim = transitions.select(
        "user_id", "state", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = point_in_time_join(facts, dim, "user_id")
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("state").alias("state_at_event"), "valid_from",
    )


@declare(
    "kpi_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', date_trunc('day', ts))
                  AS BIGINT) AS day_num,
             ROUND(SUM(value), 6) AS day_value
      FROM events GROUP BY 1)
    SELECT day_num, day_value,
           ROUND(AVG(day_value) OVER w, 6) AS baseline_mean,
           ROUND(stddev_samp(day_value) OVER w, 6) AS baseline_std,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_prior,
           COUNT(*) OVER w >= 3
             AND COALESCE(stddev_samp(day_value) OVER w, 0) > 0
             AND abs(day_value - AVG(day_value) OVER w)
                 > 3 * stddev_samp(day_value) OVER w AS is_anomaly
    FROM daily
    WINDOW w AS (ORDER BY day_num RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    """,
)
def kpi_anomaly_days(spark, sf_dir):
    """KPI anomaly screen: each day's total against the mean ± 3σ of the
    PRECEDING seven calendar days (current day excluded — the baseline
    can't contain the point it judges). The daily pre-aggregate
    collapses the event stream first; the trailing window then runs
    over ~|days| rows, so the single-partition ordering is over a tiny
    frame, not the raw data."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("day_num")
    ).agg(F.round(F.sum("value"), 6).alias("day_value"))
    w = (
        Window.orderBy("day_num").rangeBetween(-7, -1)
    )
    mean = F.avg("day_value").over(w)
    std = F.stddev_samp("day_value").over(w)
    n_prior = F.count(F.lit(1)).over(w)
    return daily.select(
        "day_num",
        "day_value",
        F.round(mean, 6).alias("baseline_mean"),
        F.round(std, 6).alias("baseline_std"),
        n_prior.cast("long").alias("n_prior"),
        (
            (n_prior >= 3)
            & (F.coalesce(std, F.lit(0.0)) > 0)
            & (F.abs(F.col("day_value") - mean) > 3 * std)
        ).alias("is_anomaly"),
    )


@declare(
    "topk_with_ties",
    oracle="""
    SELECT event_type, event_id, value, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT event_type, event_id, value,
                 rank() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id) AS rnk
          FROM events WHERE value IS NOT NULL) t
    WHERE rnk <= 3
    """,
)
def topk_with_ties(spark, sf_dir):
    """Top-k WITH ties (rank, not row_number): equal values share a rank
    and the next rank skips — the WITH TIES semantics of a SQL FETCH
    FIRST. Same single-exchange window shape as topk_per_group; the
    event_id tiebreak keeps the ordering total so the result is
    hash-stable."""
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


@declare(
    "inter_event_gaps",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events)
    SELECT event_type, COUNT(gap_us) AS n_gaps,
           ROUND(AVG(gap_us / 1000000.0), 6) AS mean_gap_s,
           ROUND(quantile_cont(gap_us / 1000000.0, 0.5), 8) AS median_gap_s,
           ROUND(quantile_cont(gap_us / 1000000.0, 0.95), 8) AS p95_gap_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def inter_event_gaps(spark, sf_dir):
    """Inter-arrival time distribution: per event type, the mean /
    median / p95 gap (seconds) between a user's consecutive events —
    the cadence profile behind session-gap and watermark tuning. The
    lag window shares the user partitioning with every other per-user
    window; gaps are exact integer micros before the one float division."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
        .withColumn("gap_s", F.col("gap_us") / 1000000.0)
    )
    return g.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("mean_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 8).alias("median_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 8).alias("p95_gap_s"),
    )


@declare(
    "signup_to_purchase_latency",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
          GROUP BY e.user_id),
    lat AS (SELECT (epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts)) / 1000000.0
                     AS latency_s
            FROM s JOIN p ON s.user_id = p.user_id)
    SELECT (SELECT COUNT(*) FROM s) AS n_signups,
           COUNT(*) AS n_converted,
           ROUND(COUNT(*) / greatest((SELECT COUNT(*) FROM s), 1), 8)
             AS conversion_rate,
           ROUND(quantile_cont(latency_s, 0.5), 8) AS median_latency_s,
           ROUND(quantile_cont(latency_s, 0.9), 8) AS p90_latency_s
    FROM lat
    """,
)
def signup_to_purchase_latency(spark, sf_dir):
    """Conversion latency: per signed-up user, the time from first
    signup to the first purchase AT OR AFTER it (order enforced — a
    purchase before signup does not count), summarized as conversion
    rate and median/p90 latency. Both per-user firsts collapse on the
    same user_id partitioning; the latency frame is ~|converted users|
    rows before the final scalar summary."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    lat = s.join(p, "user_id").select(
        (
            (F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts"))
            / 1000000.0
        ).alias("latency_s")
    )
    # the signup total is a 1-row aggregate joined in — NO driver-side
    # action at plan-build time (both scalars meet in a 1×1 cross join)
    sig_total = s.agg(F.count(F.lit(1)).alias("n_signups"))
    summary = lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 8).alias("median_latency_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 8).alias("p90_latency_s"),
    )
    return summary.crossJoin(sig_total).select(
        "n_signups",
        "n_converted",
        F.round(
            F.col("n_converted") / F.greatest(F.col("n_signups"), F.lit(1)), 8
        ).alias("conversion_rate"),
        "median_latency_s",
        "p90_latency_s",
    )


@declare(
    "activity_heatmap",
    oracle="""
    SELECT CAST((date_diff('day', TIMESTAMP '1970-01-01', date_trunc('day', ts)) + 4) % 7
                AS BIGINT) AS dow,
           CAST(date_part('hour', ts) AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def activity_heatmap(spark, sf_dir):
    """Day-of-week × hour activity heatmap. The weekday index is pure
    epoch-day arithmetic ((day + 4) % 7, 0 = Sunday) instead of each
    engine's dayofweek builtin — those disagree on week origin, the
    arithmetic cannot. One partial-aggregated shuffle to ≤ 168 cells."""
    e = table(spark, sf_dir, "events")
    day_num = F.datediff(
        F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
    ).cast("long")
    return (
        e.select(
            ((day_num + 4) % 7).alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@declare(
    "rank_metrics",
    oracle="""
    SELECT event_id, event_type,
           ROUND(percent_rank() OVER w, 8) AS pct_rank,
           ROUND(cume_dist() OVER w, 8) AS cume,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    """,
)
def rank_metrics(spark, sf_dir):
    """Relative-rank analytics: percent_rank, cume_dist and decile over
    each event type's value ordering — the remaining ANSI analytic
    functions (rank/dense_rank/row_number/ntile(4) live in
    window_showcase and ntile_quartiles). All share ONE window over one
    exchange; the event_id tiebreak keeps the total order hash-stable."""
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 8).alias("cume"),
            F.ntile(10).over(w).cast("long").alias("decile"),
        )
    )


@declare(
    "gap_fill_daily",
    oracle="""
    WITH lastv AS (
      SELECT user_id, day, value AS day_value FROM (
        SELECT user_id, date_trunc('day', ts) AS day, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1),
    spine AS (
      SELECT user_id,
             unnest(range(d0, d1 + INTERVAL 1 DAY, INTERVAL 1 DAY)) AS day
      FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
            FROM lastv GROUP BY user_id) b)
    SELECT s.user_id, s.day,
           ROUND(last_value(l.day_value IGNORE NULLS)
                 OVER (PARTITION BY s.user_id ORDER BY s.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS value_filled,
           CASE WHEN l.user_id IS NULL THEN 0 ELSE 1 END AS observed
    FROM spine s LEFT JOIN lastv l
      ON l.user_id = s.user_id AND l.day = s.day
    """,
)
def gap_fill_daily(spark, sf_dir):
    """Time-series densification + forward fill (resample/locf): every
    calendar day in each user's active span carries the user's
    last-observed end-of-day value; gap days are filled from the
    previous observation. The raw stream is touched once (the
    (user, day) last-event window); every later stage — span rollup,
    row-local calendar expansion, spine join, fill window — runs on
    the day-collapsed frame; spine width is bounded by each key's own
    span (operators/asof.gap_fill_daily)."""
    from ..operators.asof import gap_fill_daily as _gf

    return _gf(table(spark, sf_dir, "events"))


@declare(
    "scd2_merge_incremental",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             event_id
      FROM events),
    transitions AS (
      -- null-SAFE change detection mirroring operators/scd.scd2_history:
      -- a NULL state is a real state run, first-ness is its own flag
      SELECT user_id, event_type AS state, ts AS valid_from, event_id
      FROM changes
      WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type)
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to
    FROM transitions
    """,
)
def scd2_merge_incremental(spark, sf_dir):
    """Incremental SCD2 maintenance (the write side of point-in-time
    joins): the corpus is split at an ingest boundary (Jan 16), the
    first half built into an SCD2 table, the second half applied as an
    append-only batch via operators/scd.scd2_merge — closed history
    passes through untouched, each key re-derives only its open
    interval from one seed row plus its new events. The oracle is the
    FULL REBUILD over all events: hash equality proves incremental
    maintenance is exact, the same contract as the KPI/HLL/quantile
    rollup family."""
    from ..operators.scd import scd2_history, scd2_merge

    ev = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    existing = scd2_history(ev.filter(F.col("ts") < cutoff))
    return scd2_merge(existing, ev.filter(F.col("ts") >= cutoff))


@declare(
    "user_day_paths",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day,
           COUNT(*) AS n_events,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM events GROUP BY 1, 2
    """,
)
def user_day_paths(spark, sf_dir):
    """Journey strings — each user-day's ORDERED event-type sequence as
    one path ('view>click>purchase'), the input shape for path/funnel
    mining. Spark has no ordered string_agg, so the order is made
    explicit: collect structs, array_sort on (ts, event_id) — a
    deterministic total order regardless of partitioning — then a
    row-local transform + concat. One (user, day) exchange; per-group
    state is the day's own events."""
    e = table(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.struct("ts", "event_id", "event_type").alias("evt"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(F.collect_list("evt")).alias("seq"),
        )
    )
    return seq.select(
        "user_id",
        "day",
        "n_events",
        F.concat_ws(
            ">", F.transform("seq", lambda x: x["event_type"])
        ).alias("path"),
    )
