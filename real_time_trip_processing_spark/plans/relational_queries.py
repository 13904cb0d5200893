"""Relational queries over the TPC-H-ish star schema: multiway joins,
window top-k, rollup, pricing summary, sessionization."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.joins import join_multiway
from ..operators.sorts import topk_per_group
from ..sources import table
from .registry import declare


@declare(
    "join_multiway",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate, c_name, n_name, r_name
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_multiway_q(spark, sf_dir):
    """J3 generalized: fact ⋈ dim chain (reference notebook cell 8's CSV
    merge, scaled to a star schema). All dims broadcast — the fact side
    never shuffles."""
    joined = join_multiway(
        table(spark, sf_dir, "orders"),
        [
            (table(spark, sf_dir, "customer"), "o_custkey", "c_custkey"),
            (table(spark, sf_dir, "nation"), "c_nationkey", "n_nationkey"),
            (table(spark, sf_dir, "region"), "n_regionkey", "r_regionkey"),
        ],
    )
    return joined.select(
        "o_orderkey", "o_totalprice", "o_orderdate", "c_name", "n_name", "r_name"
    )


@declare(
    "region_revenue",
    oracle="""
    SELECT r_name, SUM(o_totalprice) AS revenue, COUNT(o_orderkey) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def region_revenue(spark, sf_dir):
    """Star-schema aggregate over the multiway join — the shape Catalyst
    turns into broadcast joins + partial/final hash agg."""
    joined = join_multiway(
        table(spark, sf_dir, "orders"),
        [
            (table(spark, sf_dir, "customer"), "o_custkey", "c_custkey"),
            (table(spark, sf_dir, "nation"), "c_nationkey", "n_nationkey"),
            (table(spark, sf_dir, "region"), "n_regionkey", "r_regionkey"),
        ],
    )
    return joined.groupBy("r_name").agg(
        F.sum("o_totalprice").alias("revenue"),
        F.count("o_orderkey").alias("n_orders"),
    )


@declare(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           SUM(l_extendedprice) AS sum_base_price,
           SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           AVG(l_quantity) AS avg_qty,
           AVG(l_extendedprice) AS avg_price,
           AVG(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape on lineitem — the engine's heavy-agg headline:
    two-key groupBy, eight aggregates, partial+final HashAggregate."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price).alias("sum_disc_price"),
        F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.avg("l_quantity").alias("avg_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@declare(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rank AS BIGINT) AS rank
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders) t
    WHERE rank <= 3
    """,
)
def topk_per_group_q(spark, sf_dir):
    """Window top-k per group (extension — SURVEY §2.6: the reference has
    no window functions). One shuffle on the group key."""
    top = topk_per_group(
        table(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        ),
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        3,
    )
    return top.withColumn("rank", F.col("rank").cast("long"))


@declare(
    "kpi_rollup",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS pickup_date,
           SUM(value) AS total_value, COUNT(*) AS n
    FROM events
    GROUP BY ROLLUP (event_type, date_trunc('day', ts))
    """,
)
def kpi_rollup(spark, sf_dir):
    """Hierarchical aggregate (rollup) — subtotal rows per event_type and
    grand total; extension beyond the reference's flat group-bys."""
    ev = table(spark, sf_dir, "events").withColumn(
        "pickup_date", F.date_trunc("day", F.col("ts"))
    )
    return ev.rollup("event_type", "pickup_date").agg(
        F.sum("value").alias("total_value"), F.count(F.lit(1)).alias("n")
    )


@declare(
    "sessionize",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                             > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events) t
    """,
)
def sessionize(spark, sf_dir):
    """Sessionization: 30-minute inactivity gap starts a new session —
    lag + running sum windows (extension; streaming flavor is
    session_window in streaming/kpis.py)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap so the threshold compare matches the oracle
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
        )
        .drop("is_new")
    )


@declare(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def semi_join(spark, sf_dir):
    """Left-semi join (EXISTS) — not in the reference (SURVEY §2.4
    'not present'); free Spark capability, declared for coverage."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@declare(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def anti_join(spark, sf_dir):
    """Left-anti join (NOT EXISTS) — customers with no big-ticket
    order (threshold chosen so the result is non-empty at every SF)."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@declare(
    "event_type_pivot",
    oracle="""
    SELECT date_trunc('day', ts) AS pickup_date,
           SUM(CASE WHEN event_type = 'click'    THEN value END) AS click,
           SUM(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
           SUM(CASE WHEN event_type = 'view'     THEN value END) AS view,
           SUM(CASE WHEN event_type = 'signup'   THEN value END) AS signup,
           SUM(CASE WHEN event_type = 'error'    THEN value END) AS error
    FROM events GROUP BY 1
    """,
)
def event_type_pivot(spark, sf_dir):
    """Pivot: daily value totals spread across event_type columns —
    groupBy().pivot() with an explicit value list (no extra distinct
    pass to discover columns, which matters at scale)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "pickup_date", F.date_trunc("day", F.col("ts"))
    )
    return (
        ev.groupBy("pickup_date")
        .pivot("event_type", ["click", "purchase", "view", "signup", "error"])
        .sum("value")
    )


@declare(
    "distinct_daily_users",
    oracle="""
    SELECT date_trunc('day', ts) AS pickup_date,
           COUNT(DISTINCT user_id) AS users,
           COUNT(event_id) AS events
    FROM events GROUP BY 1
    """,
)
def distinct_daily_users(spark, sf_dir):
    """Distinct aggregation (Spark plans the two-phase
    distinct-then-count expansion automatically)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "pickup_date", F.date_trunc("day", F.col("ts"))
    )
    return ev.groupBy("pickup_date").agg(
        F.countDistinct("user_id").alias("users"),
        F.count("event_id").alias("events"),
    )


@declare(
    "running_daily_total",
    oracle="""
    WITH d AS (SELECT date_trunc('day', ts) AS pickup_date, SUM(value) AS total_fare
               FROM events GROUP BY 1)
    SELECT pickup_date, total_fare,
           SUM(total_fare) OVER (ORDER BY pickup_date
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_total
    FROM d
    """,
)
def running_daily_total(spark, sf_dir):
    """Analytic window over the aggregate: cumulative daily revenue.
    Single-partition window over one row per day — tiny by construction
    (the agg collapses the data before the unpartitioned window)."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("pickup_date", F.date_trunc("day", F.col("ts")))
        .groupBy("pickup_date")
        .agg(F.sum("value").alias("total_fare"))
    )
    w = W.orderBy("pickup_date").rowsBetween(W.unboundedPreceding, 0)
    return daily.withColumn("running_total", F.sum("total_fare").over(w))


@declare(
    "snapshot_diff",
    oracle="""
    WITH old AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
                 FROM orders WHERE o_orderkey % 5 <> 0),
    new AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % 11 = 0 THEN 'X-UPDATED'
                        ELSE o_orderpriority END AS o_orderpriority
            FROM orders WHERE o_orderkey % 7 <> 0),
    j AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                 CASE WHEN o.o_orderkey IS NULL THEN 'added'
                      WHEN n.o_orderkey IS NULL THEN 'removed'
                      WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                        OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                        OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                      THEN 'changed' ELSE 'same' END AS status
          FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
    SELECT o_orderkey, status FROM j WHERE status <> 'same'
    """,
)
def snapshot_diff(spark, sf_dir):
    """Snapshot diff (ingest-cycle CDC): two deterministic versions of
    ``orders`` (old drops key%5==0; new drops key%7==0 and updates the
    priority of key%11==0) compared with one full-outer join on the key
    and null-safe column equality — no row hashing, so the comparison
    is exact in any engine. With bucketed snapshots the join is
    co-located (zero shuffle)."""
    from ..operators.sets import table_diff

    orders = table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 5 != 0)
    new = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X-UPDATED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return table_diff(
        old, new, "o_orderkey", ["o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@declare(
    "referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey))
    """,
)
def referential_integrity(spark, sf_dir):
    """Inter-table data-quality audit: orphaned foreign keys per
    relation edge (child rows whose key misses the parent), the
    companion to the intra-table column profile. Each edge is a
    left-anti join that only carries the key column; parents small
    enough broadcast (nation, customer at this SF), the lineitem edge
    shuffles 8-byte keys."""
    def edge(name, child, ckey, parent, pkey):
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(pkey)
        orphans = c.select(F.col(ckey).alias(pkey)).join(p, pkey, "left_anti")
        return (
            c.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(
                F.lit(name).alias("relation"),
                F.col("n_child"),
                F.col("n_orphans"),
            )
        )

    from functools import reduce

    edges = [
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    return reduce(lambda a, b: a.unionAll(b), edges)


@declare(
    "session_funnel",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM (SELECT event_id, user_id, ts, event_type,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                               > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events) t),
    per AS (
      SELECT user_id, session_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM s GROUP BY user_id, session_id),
    fl AS (
      SELECT CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS viewed,
             CASE WHEN first_view IS NOT NULL AND first_click > first_view
                  THEN 1 ELSE 0 END AS clicked_after_view,
             CASE WHEN first_view IS NOT NULL AND first_click > first_view
                       AND first_purchase > first_click
                  THEN 1 ELSE 0 END AS purchased_after_click
      FROM per)
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(viewed) AS BIGINT) AS n_viewed,
           CAST(SUM(clicked_after_view) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(purchased_after_click) AS BIGINT) AS n_purchased_after_click,
           ROUND(SUM(clicked_after_view) / greatest(SUM(viewed), 1), 8)
             AS view_to_click,
           ROUND(SUM(purchased_after_click) / greatest(SUM(clicked_after_view), 1), 8)
             AS click_to_purchase
    FROM fl
    """,
)
def session_funnel(spark, sf_dir):
    """Ordered session funnel: within each 30-min-gap session, did the
    user view, then click AFTER the view, then purchase AFTER the click
    — step order enforced by first-occurrence timestamps (NULL
    comparisons are false, so missing steps drop out naturally).
    Conversion rates per step at the end. Same session ids as the
    declared `sessionize`; everything after the session window is
    per-session aggregate arithmetic on a collapsed frame."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    s = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
        )
    )

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per = s.groupBy("user_id", "session_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
    )
    viewed = F.when(F.col("first_view").isNotNull(), 1).otherwise(0)
    clicked = F.when(
        F.col("first_view").isNotNull() & (F.col("first_click") > F.col("first_view")),
        1,
    ).otherwise(0)
    purchased = F.when(
        F.col("first_view").isNotNull()
        & (F.col("first_click") > F.col("first_view"))
        & (F.col("first_purchase") > F.col("first_click")),
        1,
    ).otherwise(0)
    fl = per.select(
        viewed.alias("viewed"),
        clicked.alias("clicked_after_view"),
        purchased.alias("purchased_after_click"),
    )
    return fl.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("viewed").cast("long").alias("n_viewed"),
        F.sum("clicked_after_view").cast("long").alias("n_clicked_after_view"),
        F.sum("purchased_after_click").cast("long").alias("n_purchased_after_click"),
        F.round(
            F.sum("clicked_after_view") / F.greatest(F.sum("viewed"), F.lit(1)), 8
        ).alias("view_to_click"),
        F.round(
            F.sum("purchased_after_click")
            / F.greatest(F.sum("clicked_after_view"), F.lit(1)),
            8,
        ).alias("click_to_purchase"),
    )


@declare(
    "bloom_semi_join",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 6) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT'
                           AND o_totalprice > 150000)
    GROUP BY l_returnflag
    """,
)
def bloom_semi_join(spark, sf_dir):
    """Runtime-filtered semi join: lineitem rows belonging to urgent
    high-value orders, with a broadcast Bloom bitmap (1 KiB, xxhash64-k-hash)
    dropping non-matching lines MAP-SIDE before the semi-join exchange.
    Output is exact — Bloom false positives die in the verify join — so
    the oracle is a plain IN-subquery; the Bloom only dials how many
    probe rows shuffle (operators/joins.bloom_filtered_semi_join)."""
    from ..operators.joins import bloom_filtered_semi_join

    li = table(spark, sf_dir, "lineitem")
    urgent = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    )
    hit = bloom_filtered_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return hit.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
    )


@declare(
    "open_order_backlog",
    oracle="""
    WITH deltas AS (
      SELECT date_trunc('day', o_orderdate) AS day, 1 AS d FROM orders
      UNION ALL
      SELECT date_trunc('day', MAX(l_shipdate)) AS day, -1 AS d
      FROM lineitem GROUP BY l_orderkey),
    daily AS (SELECT day,
                     SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS opened,
                     SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS closed,
                     SUM(d) AS net
              FROM deltas GROUP BY day)
    SELECT day, CAST(opened AS BIGINT) AS opened,
           CAST(closed AS BIGINT) AS closed,
           CAST(net AS BIGINT) AS net,
           CAST(SUM(net) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS backlog
    FROM daily
    """,
)
def open_order_backlog(spark, sf_dir):
    """Operational backlog time series: orders open (placed but not yet
    fully shipped) per day, from +1/−1 delta events — the
    interval-count pattern that avoids joining every order against
    every day it spans. An order closes on its LAST line's ship
    date; an order with no lines never closes. The running sum is a
    single-partition window BY DESIGN: its input is the day-collapsed
    frame (|days| rows — thousands at any corpus size), not the fact
    stream; the facts are collapsed by partial-aggregated groupBys
    before any window sees them."""
    from pyspark.sql import Window as W

    from ..operators.sets import union_all

    opened = (
        table(spark, sf_dir, "orders")
        .select(F.date_trunc("day", "o_orderdate").alias("day"))
        .withColumn("d", F.lit(1))
    )
    closed = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.date_trunc("day", F.max("l_shipdate")).alias("day"))
        .select("day")
        .withColumn("d", F.lit(-1))
    )
    daily = (
        union_all(opened, closed)
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("opened"),
            F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("closed"),
            F.sum("d").alias("net"),
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        F.col("opened").cast("long").alias("opened"),
        F.col("closed").cast("long").alias("closed"),
        F.col("net").cast("long").alias("net"),
        F.sum("net").over(w).cast("long").alias("backlog"),
    )


@declare(
    "revenue_share_of_parent",
    oracle="""
    WITH nrev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2)
    SELECT region, nation, ROUND(rev, 2) AS rev,
           ROUND(rev / SUM(rev) OVER (PARTITION BY region), 8)
             AS share_of_region,
           ROUND(SUM(rev) OVER (PARTITION BY region)
                 / SUM(rev) OVER (), 8) AS region_share_of_total
    FROM nrev
    """,
)
def revenue_share_of_parent(spark, sf_dir):
    """Hierarchical ratio-to-report: each nation's share of its REGION
    and each region's share of the TOTAL, in one pass — both window
    levels run on the ~25-row collapsed aggregate, so the only cost
    that scales is the fact groupBy (dims broadcast; money sums in
    exact DECIMAL so partitioning cannot flip a rounded digit)."""
    from pyspark.sql import Window as W

    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev_term = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    nrev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(rev_term).cast("double").alias("rev"))
    )
    wr = W.partitionBy("region")
    wt = W.partitionBy()
    return nrev.select(
        "region",
        "nation",
        F.round("rev", 2).alias("rev"),
        F.round(F.col("rev") / F.sum("rev").over(wr), 8).alias(
            "share_of_region"
        ),
        F.round(
            F.sum("rev").over(wr) / F.sum("rev").over(wt), 8
        ).alias("region_share_of_total"),
    )
