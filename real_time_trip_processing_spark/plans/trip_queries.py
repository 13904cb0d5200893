"""Trip-pipeline queries declared over the driver's ``events`` table.

Analog mapping (FIXTURES.md §6): ``user_id`` ↔ trip_id (join key),
``event_type`` ↔ data_type, ``ts`` ↔ event time, ``value`` ↔
fare_amount. 'click' plays trip_start, 'purchase' plays trip_end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import aggregates as A
from ..operators import cleaning as P
from ..operators import joins as J
from ..operators.dedup import dedup_keyed
from ..operators.sets import union_all
from ..operators.sorts import limit_topk, sort_event_time_union
from ..sources import table
from .registry import declare

START, END = "click", "purchase"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


# --- A-series: daily KPI aggregations --------------------------------------

@declare(
    "kpi_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS pickup_date,
           SUM(value)  AS total_fare,
           COUNT(event_id) AS trip_count,
           AVG(value)  AS average_fare,
           MAX(value)  AS maximum_fare,
           MIN(value)  AS minimum_fare
    FROM events GROUP BY 1
    """,
)
def kpi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 flagship: the five daily fare KPIs in one groupBy
    (reference scripts/glue_scripts.py:139-175 collapsed)."""
    return A.kpi_daily(_events(spark, sf_dir), "ts", "value", "event_id")


@declare(
    "kpi_total_fare",
    oracle="SELECT date_trunc('day', ts) AS pickup_date, SUM(value) AS total_fare FROM events GROUP BY 1",
)
def kpi_total_fare(spark, sf_dir):
    """A1 (reference scripts/glue_scripts.py:139-141)."""
    return A.kpi_total_fare(_events(spark, sf_dir), "ts", "value")


@declare(
    "kpi_trip_count",
    oracle="SELECT date_trunc('day', ts) AS pickup_date, COUNT(event_id) AS trip_count FROM events GROUP BY 1",
)
def kpi_trip_count(spark, sf_dir):
    """A2 (reference scripts/glue_scripts.py:144-146)."""
    return A.kpi_trip_count(_events(spark, sf_dir), "ts", "event_id")


@declare(
    "kpi_avg_fare",
    oracle="SELECT date_trunc('day', ts) AS pickup_date, AVG(value) AS average_fare FROM events GROUP BY 1",
)
def kpi_avg_fare(spark, sf_dir):
    """A3 (reference scripts/glue_scripts.py:149-151)."""
    return A.kpi_avg_fare(_events(spark, sf_dir), "ts", "value")


@declare(
    "kpi_max_fare",
    oracle="SELECT date_trunc('day', ts) AS pickup_date, MAX(value) AS maximum_fare FROM events GROUP BY 1",
)
def kpi_max_fare(spark, sf_dir):
    """A4 (reference scripts/glue_scripts.py:154-156)."""
    return A.kpi_max_fare(_events(spark, sf_dir), "ts", "value")


@declare(
    "kpi_min_fare",
    oracle="SELECT date_trunc('day', ts) AS pickup_date, MIN(value) AS minimum_fare FROM events GROUP BY 1",
)
def kpi_min_fare(spark, sf_dir):
    """A5 (reference scripts/glue_scripts.py:159-161)."""
    return A.kpi_min_fare(_events(spark, sf_dir), "ts", "value")


@declare(
    "assemble_kpis",
    oracle="""
    WITH t AS (SELECT date_trunc('day', ts) AS pickup_date, SUM(value) AS total_fare FROM events GROUP BY 1),
         c AS (SELECT date_trunc('day', ts) AS pickup_date, COUNT(event_id) AS trip_count FROM events GROUP BY 1),
         a AS (SELECT date_trunc('day', ts) AS pickup_date, AVG(value) AS average_fare FROM events GROUP BY 1),
         mx AS (SELECT date_trunc('day', ts) AS pickup_date, MAX(value) AS maximum_fare FROM events GROUP BY 1),
         mn AS (SELECT date_trunc('day', ts) AS pickup_date, MIN(value) AS minimum_fare FROM events GROUP BY 1)
    SELECT t.pickup_date, total_fare, trip_count, average_fare, maximum_fare, minimum_fare
    FROM t LEFT JOIN c USING (pickup_date) LEFT JOIN a USING (pickup_date)
           LEFT JOIN mx USING (pickup_date) LEFT JOIN mn USING (pickup_date)
    """,
)
def assemble_kpis(spark, sf_dir):
    """J4: left-join five single-KPI frames on the date key (reference
    scripts/glue_scripts.py:167-175) — declared to prove join parity;
    kpi_daily is the idiomatic plan."""
    ev = _events(spark, sf_dir)
    frames = [
        A.kpi_total_fare(ev, "ts", "value"),
        A.kpi_trip_count(ev, "ts", "event_id"),
        A.kpi_avg_fare(ev, "ts", "value"),
        A.kpi_max_fare(ev, "ts", "value"),
        A.kpi_min_fare(ev, "ts", "value"),
    ]
    return J.assemble_kpis(frames)


@declare(
    "global_minmax",
    oracle="SELECT MIN(ts) AS start_ts, MAX(ts) AS end_ts, COUNT(event_id) AS record_count FROM events",
)
def global_minmax(spark, sf_dir):
    """A7: report metadata aggregate (reference scripts/glue_scripts.py:200-205)."""
    return A.global_minmax(_events(spark, sf_dir), "ts", "event_id")


@declare(
    "value_counts",
    oracle="SELECT date_trunc('day', ts) AS pickup_date, COUNT(*) AS n FROM events GROUP BY 1",
)
def value_counts(spark, sf_dir):
    """A8: pandas value_counts equivalent (reference notebook cell 15)."""
    df = _events(spark, sf_dir).withColumn(
        "pickup_date", F.date_trunc("day", F.col("ts"))
    )
    return A.value_counts(df, "pickup_date").withColumnRenamed("count", "n")


# --- J-series: the matcher ---------------------------------------------------

@declare(
    "match_start_end",
    oracle=f"""
    WITH s AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events WHERE event_type = '{START}'),
         e AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events WHERE event_type = '{END}')
    SELECT s.event_id, s.ts, s.user_id, s.event_type, s.value, s.props,
           e.event_id AS end_event_id, e.ts AS end_ts, e.event_type AS end_event_type,
           e.value AS end_value, e.props AS end_props,
           'completed' AS status
    FROM s JOIN e ON s.user_id = e.user_id
    WHERE s.rn = 1 AND e.rn = 1
    """,
)
def match_start_end(spark, sf_dir):
    """J1+J2: the reference's core matcher as a batch equi-join —
    first-match-wins dedup per side, inner join on the key, end-side
    collision columns renamed end_<col>
    (reference scripts/lambda2.py:27-63, 66-109, 230-255)."""
    ev = _events(spark, sf_dir)
    starts = ev.filter(F.col("event_type") == START)
    ends = ev.filter(F.col("event_type") == END)
    return J.match_start_end(
        starts, ends, key="user_id",
        start_order=("ts", "event_id"), end_order=("ts", "event_id"),
    )


# --- D-series: dedup ---------------------------------------------------------

@declare(
    "dedup_keyed",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_keyed_q(spark, sf_dir):
    """D1: first occurrence per composite key, deterministic order
    (reference scripts/lambda1.py:119-150)."""
    return dedup_keyed(_events(spark, sf_dir), ["user_id", "event_type"], ["ts", "event_id"])


# --- U/O-series: union + event-time interleave ------------------------------

@declare(
    "union_all",
    oracle=f"""
    SELECT event_id, user_id, ts AS click_ts, value,
           CAST(NULL AS TIMESTAMP) AS purchase_ts, CAST(NULL AS VARCHAR) AS props
    FROM events WHERE event_type = '{START}'
    UNION ALL
    SELECT event_id, user_id, NULL, NULL, ts, props
    FROM events WHERE event_type = '{END}'
    """,
)
def union_all_q(spark, sf_dir):
    """U1: by-name union of differently-shaped frames with null fill
    (reference scripts/to_kinesis.py:119 — pandas concat)."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == START).select(
        "event_id", "user_id", F.col("ts").alias("click_ts"), "value"
    )
    purchases = ev.filter(F.col("event_type") == END).select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts"), "props"
    )
    return union_all(clicks, purchases)


@declare(
    "sort_event_time_union",
    oracle=f"""
    WITH s AS (SELECT event_id, user_id, 'trip_start' AS data_type,
                      ts AS pickup_datetime, CAST(NULL AS TIMESTAMP) AS dropoff_datetime
               FROM events WHERE event_type = '{START}'),
         e AS (SELECT event_id, user_id, 'trip_end',
                      NULL, ts
               FROM events WHERE event_type = '{END}')
    SELECT *, COALESCE(pickup_datetime, dropoff_datetime) AS event_time
    FROM (SELECT * FROM s UNION ALL SELECT * FROM e) u
    """,
)
def sort_event_time_union_q(spark, sf_dir):
    """O2+U1: unified event_time over the interleaved start/end stream,
    globally ordered (reference scripts/to_kinesis.py:117-120)."""
    ev = _events(spark, sf_dir)
    starts = ev.filter(F.col("event_type") == START).select(
        "event_id", "user_id", F.lit("trip_start").alias("data_type"),
        F.col("ts").alias("pickup_datetime"),
    )
    ends = ev.filter(F.col("event_type") == END).select(
        "event_id", "user_id", F.lit("trip_end").alias("data_type"),
        F.col("ts").alias("dropoff_datetime"),
    )
    return sort_event_time_union(
        union_all(starts, ends), ["pickup_datetime", "dropoff_datetime"]
    )


# --- P-series: cleaning pipeline --------------------------------------------

@declare(
    "cleaning_pipeline",
    oracle="""
    SELECT event_id, ts, user_id, event_type, CAST(value AS DOUBLE) AS value,
           props, date_trunc('day', ts) AS pickup_date
    FROM events
    WHERE event_type IN ('click','purchase','view','signup','error')
      AND event_id IS NOT NULL AND ts IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(value) AND NOT isinf(value)
    """,
)
def cleaning_pipeline(spark, sf_dir):
    """P2+P3+P5+P7+P8 composed: kind filter → required fields → numeric
    coercion with NaN/Inf rejection → date derivation
    (reference scripts/lambda1.py:45-82, scripts/glue_scripts.py:113-136)."""
    ev = _events(spark, sf_dir)
    out = P.filter_event_kind(ev, "event_type", ["click", "purchase", "view", "signup", "error"])
    out = P.filter_required_fields(out, ["event_id", "ts"])
    out = P.coerce_numeric(out, ["value"])
    return out.withColumn("pickup_date", F.date_trunc("day", F.col("ts")))


@declare(
    "derive_keys",
    oracle="""
    SELECT user_id, event_id,
           'RAW#' || event_type || '#' || strftime(ts, '%Y-%m-%d %H:%M:%S') AS sk,
           'raw' AS status
    FROM events
    WHERE ('RAW#' || event_type) LIKE 'RAW#purchase%'
    """,
)
def derive_keys(spark, sf_dir):
    """P6+P9: composite sort-key derivation + prefix filter
    (reference scripts/lambda1.py:53-61, scripts/lambda2.py:203-206)."""
    ev = _events(spark, sf_dir)
    keyed = ev.select(
        "user_id",
        "event_id",
        P.derive_raw_sort_key(F.col("event_type"), F.col("ts")).alias("sk"),
        F.lit("raw").alias("status"),
    )
    return P.filter_prefix(keyed, "sk", "RAW#purchase")


# --- F-series showcase -------------------------------------------------------

@declare(
    "scalar_showcase",
    oracle="""
    SELECT event_id,
           CAST(user_id AS VARCHAR) || '#' || event_type AS event_key,
           event_type LIKE 'p%' AS is_p,
           strftime(ts, '%Y-%m') AS ym,
           date_trunc('day', ts) AS d,
           CASE WHEN event_type = 'click' THEN value ELSE -value END AS signed_value,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           COALESCE(value, 0.0) AS value_filled
    FROM events
    """,
)
def scalar_showcase(spark, sf_dir):
    """F4/F5/F9/F10/F14/F15 + X5 in one projection — the reference's
    scalar surface (SURVEY §2.9) as pure codegen'd built-ins."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.concat_ws("#", F.col("user_id"), F.col("event_type")).alias("event_key"),
        F.col("event_type").startswith("p").alias("is_p"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.when(F.col("event_type") == "click", F.col("value"))
        .otherwise(-F.col("value"))
        .alias("signed_value"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
    )


@declare(
    "limit_topk",
    oracle="SELECT event_id, user_id, value FROM events ORDER BY value DESC, event_id LIMIT 5",
)
def limit_topk_q(spark, sf_dir):
    """O4 generalized: deterministic global top-k
    (planner: TakeOrderedAndProject, no full sort)."""
    return limit_topk(
        _events(spark, sf_dir).select("event_id", "user_id", "value"),
        [F.desc("value"), F.col("event_id")],
        5,
    )


@declare(
    "sort_by_time",
    oracle="SELECT event_id, user_id, ts FROM events ORDER BY ts, event_id LIMIT 100",
)
def sort_by_time_q(spark, sf_dir):
    """O1/O3: ascending event-time sort (reference
    scripts/to_kinesis.py:21,34); bounded so ordering is observable
    through the deterministic limit (TakeOrderedAndProject)."""
    from ..operators.sorts import limit_topk

    return limit_topk(
        _events(spark, sf_dir).select("event_id", "user_id", "ts"),
        [F.col("ts"), F.col("event_id")],
        100,
    )


@declare(
    "asof_join",
    oracle=f"""
    WITH a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = '{START}'),
         b AS (SELECT user_id, ts, ts AS view_ts, value AS view_value
               FROM events WHERE event_type = 'view')
    SELECT a.event_id, a.user_id, a.ts, b.view_ts, b.view_value
    FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def asof_join_q(spark, sf_dir):
    """As-of join (extension): each click event annotated with the
    latest at-or-before 'view' event of the same user — union +
    last-ignoring-nulls window, one shuffle, no Python
    (operators/asof.py)."""
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == START).select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("view_ts"), F.col("value").alias("view_value")
    )
    return asof_join(clicks, views, key="user_id", ts="ts",
                     payload_cols=["view_ts", "view_value"])


@declare(
    "fare_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 8) AS p25,
           ROUND(quantile_cont(value, 0.50), 8) AS p50,
           ROUND(quantile_cont(value, 0.90), 8) AS p90
    FROM events GROUP BY event_type
    """,
)
def fare_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per event_type (both engines use
    the standard linear-interpolation definition). At extreme
    cardinality swap for percentile_approx (t-digest, mergeable
    partial aggregation) — declared exact so the oracle can check it."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 8).alias("p25"),
            F.round(F.expr("percentile(value, 0.50)"), 8).alias("p50"),
            F.round(F.expr("percentile(value, 0.90)"), 8).alias("p90"),
        )
    )


@declare(
    "kpi_incremental_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS pickup_date,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM events GROUP BY 1
    """,
)
def kpi_incremental_rollup(spark, sf_dir):
    """Materialized-view maintenance: the daily KPI rollup maintained
    INCREMENTALLY — the corpus is split into two ingest batches
    (event_id parity), each aggregated to mergeable per-day state
    (operators/aggregates.py:kpi_state), merged with the aggregate
    merge algebra (n: sum, total: exact-decimal sum, min/max: min/max)
    and published. The oracle is the FULL RECOMPUTE over all events —
    hash-equality proves the incremental path is exact, not
    approximately right: the sum accumulator is DECIMAL, so merge
    order and batch boundaries cannot flip a low bit (a double
    accumulator would make incremental ≠ recompute at the last ulp).

    At 100 TB this is the only affordable shape for a standing rollup:
    each ingest batch shuffles only its own delta to state grain
    (days), and the merge touches state-grain rows — history is never
    re-read. The same state frame is what `foreachBatch` upsert sinks
    maintain under streaming ingest (streaming/sinks.py)."""
    ev = _events(spark, sf_dir).select("event_id", "ts", "value")
    batch0 = A.kpi_state(ev.filter(F.col("event_id") % 2 == 0))
    batch1 = A.kpi_state(ev.filter(F.col("event_id") % 2 == 1))
    return A.kpi_from_state(A.merge_kpi_states(batch0, batch1))


@declare(
    "distinct_rollup_incremental",
    oracle="""
    SELECT date_trunc('day', ts) AS pickup_date,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merged_ok
    FROM events GROUP BY 1
    """,
)
def distinct_rollup_incremental(spark, sf_dir):
    """Sketch-state maintenance — the distinct-count analogue of
    kpi_incremental_rollup: per-ingest-batch DataSketches HLL state
    (hll_sketch_agg over user_id per day), merged with hll_union_agg.
    At 100 TB the persisted per-day sketch bytes ARE the rollup: each
    batch shuffles only its own delta to state grain and history is
    never re-read — the shape approx_count_distinct cannot give you,
    because it emits an estimate, not mergeable state.

    Contract (the approx_distinct_users discipline): the MERGED
    estimate lands within max(10 %, ±3) of the exact count, which the
    oracle carries value-hashed alongside. Estimate equality with the
    single-pass sketch was measured and does NOT hold once sketches go
    dense (HLL_4 build vs HLL_8 union representations estimate
    slightly differently — 28/30 days differ at sf0.1), so the
    declared boolean is the accuracy band, not representation
    equality; the band is deterministic under any partitioning because
    sketch registers are order-independent."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("pickup_date"),
        "user_id",
    )
    exact = ev.groupBy("pickup_date").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    parts = [
        ev.filter(F.col("event_id") % 2 == i)
        .groupBy("pickup_date")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        for i in range(2)
    ]
    merged = (
        parts[0].unionByName(parts[1])
        .groupBy("pickup_date")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_users")
        )
    )
    band = F.abs(F.col("merged_users") - F.col("exact_users")) <= F.greatest(
        F.lit(0.10) * F.col("exact_users"), F.lit(3.0)
    )
    return exact.join(merged, "pickup_date").select(
        "pickup_date", "exact_users", band.alias("merged_ok")
    )


@declare(
    "quantile_sketch_rollup",
    oracle="""
    WITH b AS (SELECT date_trunc('day', ts) AS pickup_date,
                      CAST(floor(value * 2) AS BIGINT) AS bin,
                      COUNT(*) AS cnt
               FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    c AS (SELECT pickup_date, bin, cnt,
                 SUM(cnt) OVER (PARTITION BY pickup_date ORDER BY bin) AS cum,
                 SUM(cnt) OVER (PARTITION BY pickup_date) AS n
          FROM b)
    SELECT pickup_date, CAST(MAX(n) AS BIGINT) AS n_events,
           ROUND((MIN(CASE WHEN cum >= ceil(0.5 * n) THEN bin END) + 0.5)
                 * 0.5, 6) AS p50_est,
           ROUND((MIN(CASE WHEN cum >= ceil(0.95 * n) THEN bin END) + 0.5)
                 * 0.5, 6) AS p95_est
    FROM c GROUP BY pickup_date
    """,
)
def quantile_sketch_rollup(spark, sf_dir):
    """Order-statistics state maintenance — the QUANTILE analogue of
    kpi_incremental_rollup / distinct_rollup_incremental: per-ingest-
    batch fixed-width histogram state (bin = floor(value/w), w = 0.5),
    merged by plain count addition, quantiles read off the merged
    cumulative histogram (first bin reaching rank ceil(q·n), midpoint
    estimate, error ≤ w/2 by construction).

    Unlike t-digest/percentile_approx the state is INTEGER bin counts:
    merge order cannot drift a bit, the incremental path is hash-equal
    to the full recompute (the oracle replays the same binning), and
    the persisted per-day state is |occupied bins| longs. At 100 TB
    each ingest batch shuffles only its delta to (day, bin) grain and
    history is never re-read; for unbounded domains swap the linear
    bin for a log bin (same merge algebra). Histogram-sketch quantile
    maintenance over exact integer state is the standard mergeable-
    summary design (cf. Spark's own observable metrics / Hive's
    NumericHistogram lineage) expressed in pure DataFrame algebra."""
    from pyspark.sql import Window as W

    # NULL values are dropped EXPLICITLY on both sides: a NULL bin
    # would otherwise sort differently in the two engines' cumulative
    # windows (Spark NULLS FIRST vs DuckDB NULLS LAST)
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("pickup_date"),
        F.floor(F.col("value") * 2).cast("long").alias("bin"),
    )
    parts = [
        ev.filter(F.col("event_id") % 2 == i)
        .groupBy("pickup_date", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        for i in range(2)
    ]
    merged = (
        parts[0].unionByName(parts[1])
        .groupBy("pickup_date", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    wd = W.partitionBy("pickup_date")
    c = merged.withColumns(
        {
            "cum": F.sum("cnt").over(wd.orderBy("bin")),
            "n": F.sum("cnt").over(wd),
        }
    )

    def est(q):
        rank = F.ceil(F.lit(q) * F.col("n"))
        bin_q = F.min(F.when(F.col("cum") >= rank, F.col("bin")))
        return F.round((bin_q + 0.5) * 0.5, 6)

    return c.groupBy("pickup_date").agg(
        F.max("n").alias("n_events"),
        est(0.5).alias("p50_est"),
        est(0.95).alias("p95_est"),
    )
