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
