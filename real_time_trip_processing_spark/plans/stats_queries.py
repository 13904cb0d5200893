"""Statistical / analytic completion tranche: grouping sets, moment
statistics, arg-min/max, histogram, unpivot, gaps-and-islands streaks,
full-outer funnel, ntile quartiles, and per-label embedding centroids.

None of these exist in the reference (SURVEY §2.5 "no distinct
aggregation, grouping sets / cube / rollup"; §2.6 "no window
functions") — they round out the complete-engine surface. Every query
is DuckDB-oracled; all aggregation happens JVM-side (built-in
functions, no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from .registry import declare


@declare(
    "kpi_grouping_sets",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day,
           GROUPING(event_type, date_trunc('day', ts)) AS gid,
           ROUND(SUM(value), 8) AS total_value,
           COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
    """,
)
def kpi_grouping_sets(spark, sf_dir):
    """GROUPING SETS — per-type totals, per-day totals, and the grand
    total in ONE pass (Spark expands to a single Expand + HashAggregate,
    not three scans). grouping_id() disambiguates the null rows the
    same way on both engines."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return (
        ev.groupingSets([["event_type"], ["day"], []], "event_type", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("value"), 8).alias("total_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", "day", "gid", "total_value", "n")
    )


@declare(
    "stats_moments",
    oracle="""
    WITH m AS (
      SELECT event_type, AVG(value) AS mu FROM events GROUP BY event_type)
    SELECT e.event_type,
           COUNT(*) AS n,
           ROUND(AVG(e.value), 6) AS mean_value,
           ROUND(STDDEV_SAMP(e.value), 6) AS stddev_value,
           ROUND(VAR_SAMP(e.value), 6) AS var_value,
           ROUND(AVG(POWER(e.value - m.mu, 3))
                 / POWER(AVG(POWER(e.value - m.mu, 2)), 1.5), 6) AS skew_pop,
           ROUND(AVG(POWER(e.value - m.mu, 4))
                 / POWER(AVG(POWER(e.value - m.mu, 2)), 2) - 3, 6) AS kurt_pop,
           ROUND(CORR(e.value, CAST(e.user_id AS DOUBLE)), 6) AS corr_value_user,
           ROUND(COVAR_SAMP(e.value, CAST(e.user_id AS DOUBLE)), 6)
             AS covar_value_user
    FROM events e JOIN m ON m.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def stats_moments(spark, sf_dir):
    """Higher-moment aggregate suite per event_type: sample stddev/var,
    population skewness/excess-kurtosis (Spark's definitions — the
    oracle spells them out as explicit central moments), Pearson corr
    and sample covariance. One HashAggregate pair, all codegen'd."""
    ev = table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.skewness("value"), 6).alias("skew_pop"),
        F.round(F.kurtosis("value"), 6).alias("kurt_pop"),
        F.round(F.corr(F.col("value"), uid), 6).alias("corr_value_user"),
        F.round(F.covar_samp(F.col("value"), uid), 6).alias("covar_value_user"),
    )


@declare(
    "argminmax_events",
    oracle="""
    WITH mx AS (
      SELECT event_type, event_id AS max_event_id, value AS max_value
      FROM (SELECT event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1),
    mn AS (
      SELECT event_type, event_id AS min_event_id, value AS min_value
      FROM (SELECT event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value ASC, event_id ASC) AS rn
            FROM events) WHERE rn = 1)
    SELECT mx.event_type, max_event_id, ROUND(max_value, 8) AS max_value,
           min_event_id, ROUND(min_value, 8) AS min_value
    FROM mx JOIN mn ON mn.event_type = mx.event_type
    """,
)
def argminmax_events(spark, sf_dir):
    """arg-max / arg-min as single-pass aggregates: max_by/min_by over a
    (value, event_id) struct — lexicographic ordering makes ties
    deterministic, so the oracle's ROW_NUMBER formulation agrees
    exactly. One aggregate, no window, no second scan."""
    ev = table(spark, sf_dir, "events")
    ord_ = F.struct(F.col("value"), F.col("event_id"))
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", ord_).alias("max_event_id"),
        F.round(F.max("value"), 8).alias("max_value"),
        F.min_by("event_id", ord_).alias("min_event_id"),
        F.round(F.min("value"), 8).alias("min_value"),
    )


@declare(
    "value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 10) * 10 AS DOUBLE) AS bucket,
           COUNT(*) AS n, ROUND(SUM(value), 8) AS bucket_sum
    FROM events GROUP BY 1
    """,
)
def value_histogram(spark, sf_dir):
    """Fixed-width histogram of event values — the map-side-combinable
    formulation (groupBy on a derived bucket key) that scales to any
    row count, vs. collecting values to the driver."""
    ev = table(spark, sf_dir, "events")
    bucket = (F.floor(F.col("value") / 10) * 10).cast("double")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 8).alias("bucket_sum"),
    )


@declare(
    "kpi_unpivot",
    oracle="""
    WITH k AS (
      SELECT date_trunc('day', ts) AS pickup_date,
             ROUND(SUM(value), 8) AS total_fare,
             CAST(COUNT(*) AS DOUBLE) AS trip_count,
             ROUND(AVG(value), 8) AS average_fare,
             ROUND(MAX(value), 8) AS max_fare,
             ROUND(MIN(value), 8) AS min_fare
      FROM events GROUP BY 1)
    SELECT pickup_date, kpi, val FROM k
    UNPIVOT (val FOR kpi IN (total_fare, trip_count, average_fare,
                             max_fare, min_fare))
    """,
)
def kpi_unpivot(spark, sf_dir):
    """Wide→long reshape of the daily KPI row (SURVEY A6) via the native
    unpivot operator — a zero-shuffle Expand node, the inverse of
    event_type_pivot. Counts are cast to double so the value column is
    single-typed on both engines."""
    ev = table(spark, sf_dir, "events")
    wide = ev.groupBy(F.date_trunc("day", "ts").alias("pickup_date")).agg(
        F.round(F.sum("value"), 8).alias("total_fare"),
        F.count(F.lit(1)).cast("double").alias("trip_count"),
        F.round(F.avg("value"), 8).alias("average_fare"),
        F.round(F.max("value"), 8).alias("max_fare"),
        F.round(F.min("value"), 8).alias("min_fare"),
    )
    return wide.unpivot(
        ["pickup_date"],
        ["total_fare", "trip_count", "average_fare", "max_fare", "min_fare"],
        "kpi",
        "val",
    )


@declare(
    "user_daily_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    tagged AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                   * INTERVAL 1 DAY AS anchor
      FROM days)
    SELECT user_id, MIN(day) AS streak_start, COUNT(*) AS streak_days
    FROM tagged GROUP BY user_id, anchor
    """,
)
def user_daily_streaks(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive active days per
    user. day − row_number·1day is constant within a run, so one window
    sort + one aggregate finds every streak — no self-join, no
    iteration; both shuffles are on user_id and AQE-coalescible."""
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    tagged = days.withColumn(
        "anchor",
        F.col("day") - F.make_interval(days=F.row_number().over(w)),
    )
    return tagged.groupBy("user_id", "anchor").agg(
        F.min("day").alias("streak_start"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("anchor")


@declare(
    "outer_join_daily_funnel",
    oracle="""
    WITH c AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS clicks
      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
    p AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS purchases,
             ROUND(SUM(value), 8) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(c.day, p.day) AS day,
           COALESCE(clicks, 0) AS clicks,
           COALESCE(purchases, 0) AS purchases,
           COALESCE(purchase_value, 0.0) AS purchase_value
    FROM c FULL OUTER JOIN p ON p.user_id = c.user_id AND p.day = c.day
    """,
)
def outer_join_daily_funnel(spark, sf_dir):
    """Full-outer join with key coalescing — the canonical funnel table
    (user-days with clicks, purchases, or both). Aggregating BEFORE the
    join keeps both shuffle inputs at user-day grain instead of raw
    events: at 100 TB that is the difference between joining billions
    and joining millions of rows."""
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", day)
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.round(F.sum("value"), 8).alias("purchase_value"),
        )
    )
    j = c.join(p, ["user_id", "day"], "full_outer")
    return j.select(
        "user_id",
        "day",
        F.coalesce("clicks", F.lit(0)).alias("clicks"),
        F.coalesce("purchases", F.lit(0)).alias("purchases"),
        F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
    )


@declare(
    "ntile_quartiles",
    oracle="""
    WITH q AS (
      SELECT event_type, value,
             NTILE(4) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS quartile
      FROM events)
    SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
           COUNT(*) AS n, ROUND(AVG(value), 8) AS avg_value,
           ROUND(MIN(value), 8) AS lo, ROUND(MAX(value), 8) AS hi
    FROM q GROUP BY event_type, quartile
    """,
)
def ntile_quartiles(spark, sf_dir):
    """Equi-depth quartile summary per event_type via ntile — the
    event_id tiebreak makes bucket assignment deterministic under any
    partitioning, so the oracle agrees bit-for-bit."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    q = ev.select(
        "event_type",
        "value",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
    return q.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 8).alias("avg_value"),
        F.round(F.min("value"), 8).alias("lo"),
        F.round(F.max("value"), 8).alias("hi"),
    )


@declare(
    "regression_by_type",
    oracle="""
    SELECT event_type,
           ROUND(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
           ROUND(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6)
             AS intercept,
           ROUND(regr_r2(value, CAST(hour(ts) AS DOUBLE)), 6) AS r2,
           regr_count(value, CAST(hour(ts) AS DOUBLE)) AS n,
           ROUND(median(value), 6) AS median_value,
           ROUND(quantile_cont(value, 0.25), 6) AS q1,
           ROUND(quantile_cont(value, 0.75), 6) AS q3
    FROM events GROUP BY event_type
    """,
)
def regression_by_type(spark, sf_dir):
    """Linear-regression aggregates (value ~ hour-of-day) plus EXACT
    median/quartiles per event_type. The regr_* family is algebraic
    (sums and cross-products) → partial+final HashAggregate like any
    sum. Exact percentiles are NOT algebraic — they sort within the
    group; at extreme group sizes switch to approx_percentile (declared
    separately in fare_percentiles) — keeping both is the point."""
    ev = table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope(v, x), 6).alias("slope"),
        F.round(F.regr_intercept(v, x), 6).alias("intercept"),
        F.round(F.regr_r2(v, x), 6).alias("r2"),
        F.regr_count(v, x).alias("n"),
        F.round(F.median(v), 6).alias("median_value"),
        F.round(F.percentile(v, F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile(v, F.lit(0.75)), 6).alias("q3"),
    )


@declare(
    "embedding_centroids",
    oracle="""
    SELECT label, CAST(pos - 1 AS BIGINT) AS pos,
           ROUND(AVG(v), 6) AS centroid
    FROM (SELECT label,
                 unnest(CAST(embedding AS DOUBLE[])) AS v,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def embedding_centroids(spark, sf_dir):
    """Per-label mean embedding (the k-means 'M step' / IVF centroid
    refresh) in long form: posexplode → groupBy(label, pos). The
    explode is pipelined (no shuffle until the aggregate) and the
    aggregate is partial+final on (label, pos) — dimension count
    multiplies rows, not shuffles, so this holds at 100 TB of vectors."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "v")
        )
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"))
    )


@declare(
    "stratified_sample",
    oracle="""
    WITH b AS (
      SELECT event_type, value,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 1000 AS bucket
      FROM events),
    rates AS (SELECT * FROM (VALUES ('purchase', 500), ('view', 100))
              AS t(event_type, keep_below)),
    s AS (SELECT b.event_type, b.value
          FROM b JOIN rates r ON r.event_type = b.event_type
          WHERE b.bucket < r.keep_below)
    SELECT event_type, COUNT(*) AS sampled, ROUND(SUM(value), 6) AS sampled_value
    FROM s GROUP BY event_type
    """,
)
def stratified_sample(spark, sf_dir):
    """Deterministic per-stratum sampling (the training-data analog of
    ``sampleBy`` without RNG state): each stratum gets its own keep
    rate, membership decided by an md5 bucket of the row key — stable
    under reprocessing and across engines, which `rand()`-based
    sampling is not. The rate table is a broadcast literal; the filter
    is map-side, so at 100 TB the sample never shuffles at all until
    the final tiny aggregate."""
    e = table(spark, sf_dir, "events")
    rates = spark.createDataFrame(
        [("purchase", 500), ("view", 100)], "rate_type string, keep_below int"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000
    )
    return (
        e.withColumn("bucket", bucket)
        .join(F.broadcast(rates), F.col("event_type") == F.col("rate_type"))
        .filter(F.col("bucket") < F.col("keep_below"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("sampled"),
            F.round(F.sum("value"), 6).alias("sampled_value"),
        )
    )


@declare(
    "approx_fare_percentiles",
    oracle="""
    SELECT event_type, COUNT(value) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM events GROUP BY event_type
    """,
)
def approx_fare_percentiles(spark, sf_dir):
    """Quantile sketch per event type: percentile_approx (Greenwald-
    Khanna in Spark) with accuracy 10000 — the mergeable-sketch path
    that replaces exact sort-based percentiles at 100 TB (exact
    quantiles need a full sort or two passes; sketches merge map-side
    like any algebraic aggregate).

    Sketch values are engine-specific, but the GK *guarantee* is not:
    the returned element's rank must sit within ±n/accuracy of the
    target rank. The query verifies that guarantee exactly — it joins
    the (broadcast-tiny) sketch output back to the data, counts rows
    ≤/< each estimate, and emits one deterministic boolean per
    percentile. The oracle computes the same group keys/counts exactly
    and TRUE for each guarantee — so a sketch outside its error band
    hash-mismatches."""
    acc = 10000
    e = table(spark, sf_dir, "events").select("event_type", "value")
    apx = e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], acc).alias("ps"),
        F.count("value").alias("n"),
    ).select(
        "event_type", "n",
        F.element_at("ps", 1).alias("q50"),
        F.element_at("ps", 2).alias("q90"),
        F.element_at("ps", 3).alias("q99"),
    )
    j = e.join(F.broadcast(apx), "event_type")
    aggs = [F.first("n").alias("n")]
    for p, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
        aggs.append(F.sum((F.col("value") <= F.col(col)).cast("long")).alias(f"le_{col}"))
        aggs.append(F.sum((F.col("value") < F.col(col)).cast("long")).alias(f"lt_{col}"))
    chk = j.groupBy("event_type").agg(*aggs)
    out_cols = [F.col("event_type"), F.col("n").cast("long").alias("n")]
    for p, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
        target = F.ceil(F.lit(p) * F.col("n"))
        slack = F.col("n") / acc + 1
        ok = (F.col(f"le_{col}") >= target - slack) & (
            F.col(f"lt_{col}") <= target + slack
        )
        out_cols.append(ok.alias(f"p{int(p * 100)}_ok"))
    return chk.select(*out_cols)


@declare(
    "winsorized_stats",
    oracle="""
    WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
    p AS (SELECT event_type,
                 quantile_cont(value, 0.05) AS lo,
                 quantile_cont(value, 0.95) AS hi
          FROM e GROUP BY event_type)
    SELECT e.event_type,
           ROUND(p.lo, 8) AS lo, ROUND(p.hi, 8) AS hi,
           ROUND(AVG(LEAST(GREATEST(e.value, p.lo), p.hi)), 6) AS robust_mean,
           ROUND(AVG(e.value), 6) AS raw_mean,
           CAST(SUM(CASE WHEN e.value < p.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN e.value > p.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           COUNT(*) AS n
    FROM e JOIN p USING (event_type)
    GROUP BY e.event_type, p.lo, p.hi
    """,
)
def winsorized_stats(spark, sf_dir):
    """Winsorized (outlier-robust) aggregation: per event_type, values
    clipped to the exact [p05, p95] band before averaging, with the
    clip counts as the audit columns — the robust-metrics pass a
    monitoring pipeline runs over noisy data.

    Two passes over the group: the percentile aggregate collapses to
    ~|event_type| rows and joins back by BROADCAST, so the clip is
    map-side and the only event-grain shuffle is the final partial-
    aggregated groupBy. (At extreme cardinality swap the exact
    percentile for percentile_approx; declared exact so the oracle can
    adjudicate values, not just shapes.)"""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = ev.join(F.broadcast(pct), "event_type").withColumn(
        "cv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clipped.groupBy("event_type", "lo", "hi").agg(
        F.round(F.avg("cv"), 6).alias("robust_mean"),
        F.round(F.avg("value"), 6).alias("raw_mean"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias("n_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias("n_high"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type",
        F.round("lo", 8).alias("lo"), F.round("hi", 8).alias("hi"),
        "robust_mean", "raw_mean", "n_low", "n_high", "n",
    )


@declare(
    "profile_events",
    oracle="""
    WITH s AS (SELECT COUNT(*) AS n_rows,
                      COUNT(event_id) AS nn_event_id, COUNT(DISTINCT event_id) AS nd_event_id,
                      COUNT(user_id) AS nn_user_id, COUNT(DISTINCT user_id) AS nd_user_id,
                      COUNT(event_type) AS nn_event_type, COUNT(DISTINCT event_type) AS nd_event_type,
                      COUNT(value) AS nn_value, COUNT(DISTINCT value) AS nd_value
               FROM events)
    SELECT col, n_rows, n_nonnull, n_rows - n_nonnull AS n_null, n_distinct
    FROM (
      SELECT 'event_id' AS col, n_rows, nn_event_id AS n_nonnull, nd_event_id AS n_distinct FROM s
      UNION ALL SELECT 'user_id', n_rows, nn_user_id, nd_user_id FROM s
      UNION ALL SELECT 'event_type', n_rows, nn_event_type, nd_event_type FROM s
      UNION ALL SELECT 'value', n_rows, nn_value, nd_value FROM s)
    """,
)
def profile_events(spark, sf_dir):
    """Ingest-validation column profile: per column, non-null / null /
    exact-distinct counts in ONE aggregate pass (Catalyst plans the
    multi-distinct via a single Expand — one scan, not one job per
    column), unpivoted to long form. The audit every pipeline runs
    before trusting a new drop of data."""
    ev = table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
    s = ev.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"nn_{c}").alias("n_nonnull"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    return s.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col", "r.n_rows", "r.n_nonnull", "r.n_null", "r.n_distinct"
    )


@declare(
    "value_mad",
    oracle="""
    WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
               FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT e.event_type,
           ROUND(m.med, 8) AS median_value,
           ROUND(quantile_cont(abs(e.value - m.med), 0.5), 8) AS mad
    FROM events e JOIN m USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, m.med
    """,
)
def value_mad(spark, sf_dir):
    """Median absolute deviation — the robust spread estimate (50%
    breakdown point vs stddev's 0%). Two exact-percentile passes: the
    per-group median collapses to ~|event_type| rows and broadcasts
    back, so the deviation pass is map-side and the only event-grain
    shuffle is the final aggregate (same discipline as
    winsorized_stats)."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    j = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    return j.groupBy("event_type", "med").agg(
        F.round(F.expr("percentile(dev, 0.5)"), 8).alias("mad"),
    ).select(
        "event_type",
        F.round("med", 8).alias("median_value"),
        "mad",
    )


_CDF_PROBES = (10.0, 100.0, 500.0)


@declare(
    "value_cdf_probes",
    oracle=f"""
    SELECT event_type, COUNT(value) AS n,
           {", ".join(
               f"ROUND(SUM(CASE WHEN value <= {p} THEN 1 ELSE 0 END) / COUNT(value), 8)"
               f" AS cdf_le_{int(p)}" for p in _CDF_PROBES)}
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def value_cdf_probes(spark, sf_dir):
    """Empirical CDF at fixed probe points — the calibration view for
    choosing thresholds/buckets before a pipeline hard-codes them
    (inverse of the percentile queries: fixed VALUE, measured mass).
    Pure integer count ratios, one partial-aggregated shuffle."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    aggs = [F.count("value").alias("n")]
    for p in _CDF_PROBES:
        aggs.append(
            F.round(
                F.sum(F.when(F.col("value") <= p, 1).otherwise(0))
                / F.count("value"),
                8,
            ).alias(f"cdf_le_{int(p)}")
        )
    return ev.groupBy("event_type").agg(*aggs)


@declare(
    "chi_square_type_dow",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST((date_diff('day', TIMESTAMP '1970-01-01',
                             date_trunc('day', ts)) + 4) % 7 AS BIGINT) AS dow,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    m AS (SELECT c.*,
                 SUM(n) OVER (PARTITION BY event_type) AS row_tot,
                 SUM(n) OVER (PARTITION BY dow) AS col_tot,
                 SUM(n) OVER () AS grand
          FROM cells c)
    SELECT event_type, dow, n,
           ROUND(row_tot * col_tot / CAST(grand AS DOUBLE), 6) AS expected,
           ROUND(POW(n - row_tot * col_tot / CAST(grand AS DOUBLE), 2)
                 / (row_tot * col_tot / CAST(grand AS DOUBLE)), 6)
             AS chi2_term
    FROM m
    """,
)
def chi_square_type_dow(spark, sf_dir):
    """Independence screen: chi-square contributions for the
    event_type × day-of-week contingency table — the data-audit test
    for 'does behavior depend on weekday' (Σ chi2_term against the
    χ²((r−1)(c−1)) critical value). The fact stream collapses to ≤
    |types|×7 cells in one partial-aggregated shuffle; the three
    marginal windows run on that collapsed frame. Weekday is epoch-day
    arithmetic — engines disagree on dayofweek origins, arithmetic
    cannot."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    day_num = F.datediff(
        F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
    ).cast("long")
    cells = (
        e.select("event_type", ((day_num + 4) % 7).alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = F.sum("n").over(W.partitionBy("event_type"))
    col_tot = F.sum("n").over(W.partitionBy("dow"))
    grand = F.sum("n").over(W.partitionBy())
    expected = row_tot * col_tot / grand.cast("double")
    return cells.select(
        "event_type",
        "dow",
        "n",
        F.round(expected, 6).alias("expected"),
        F.round(F.pow(F.col("n") - expected, 2) / expected, 6).alias(
            "chi2_term"
        ),
    )
