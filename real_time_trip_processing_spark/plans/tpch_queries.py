"""TPC-H-shaped relational queries over the star-schema testdata.

The reference's relational surface is one notebook join + five KPI
group-bys (SURVEY §2.4-2.5); `pricing_summary` / `region_revenue` /
`join_multiway` already generalize those. This module adds the classic
multi-join analytical shapes (Q3/Q4/Q10/Q13/Q6 analogues, adapted to
the cut-down schema) so the engine demonstrably handles the plans a
warehouse user actually runs: fact-side filters before joins, broadcast
dims, exists-semi-joins, outer-join distributions, global top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import table
from .registry import declare


@declare(
    "top_unshipped_orders",
    oracle="""
    WITH r AS (
      SELECT l.l_orderkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1999-01-01'
        AND l.l_shipdate > TIMESTAMP '1999-01-01'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority)
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rn
          FROM r)
    WHERE rn <= 10
    """,
)
def top_unshipped_orders(spark, sf_dir):
    """Q3 analogue: highest-revenue orders taken before a date whose
    items shipped after it, for one market segment. Both date filters
    and the segment filter reach the scans (PushedFilters); customer is
    broadcast; the only big shuffle is the (orderkey) aggregate. Top-10
    via orderBy+limit → TakeOrderedAndProject: each partition keeps its
    own 10, the driver merges — no single-partition window sort."""
    cutoff = "1999-01-01"
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    r = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )
    return (
        r.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@declare(
    "order_priority_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def order_priority_count(spark, sf_dir):
    """Q4 analogue (adapted: ship-lag > 60 days stands in for the
    missing commit/receipt dates): order counts per priority where some
    item shipped late. EXISTS compiles to a left-semi join — lineitem
    is projected to two columns before the shuffle, and the semi join
    short-circuits on first match instead of materializing duplicates."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@declare(
    "returned_item_customers",
    oracle="""
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name)
    SELECT c_custkey, c_name, n_name, revenue
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rn
          FROM rev)
    WHERE rn <= 20
    """,
)
def returned_item_customers(spark, sf_dir):
    """Q10 analogue: top-20 customers by revenue lost to returns.
    Returnflag filter prunes lineitem at the scan; nation (25 rows) and
    customer are broadcast, so the fact table shuffles once — for the
    final per-customer aggregate — regardless of data size."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )
    return (
        rev.orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@declare(
    "customer_order_dist",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def customer_order_dist(spark, sf_dir):
    """Q13 analogue: how many customers placed N orders, zeros
    included (the left join keeps order-less customers; COUNT of the
    nullable key counts 0 for them). Two aggregates, but the second
    groups on a tiny domain — AQE coalesces it to a handful of tasks."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@declare(
    "nation_part_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           p.p_type,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type IN ('PROMO', 'ECONOMY')
    GROUP BY n.n_name, year(l.l_shipdate), p.p_type
    """,
)
def nation_part_profit(spark, sf_dir):
    """Q9 analogue: profit by supplier nation × year × part type. The
    only tables not yet exercised (part, supplier) join here — both are
    true dimensions (100 / 2000 rows vs 600k lineitem at sf0.1), so
    both broadcast and the type filter halves the part build side
    BEFORE the broadcast. The fact table shuffles exactly once, for the
    final aggregate."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type").isin("PROMO", "ECONOMY"))
        .select("p_partkey", "p_type")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
            "p_type",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("profit")
        )
    )


@declare(
    "revenue_forecast_delta",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 6) AS revenue_delta,
           COUNT(*) AS qualifying_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def revenue_forecast_delta(spark, sf_dir):
    """Q6 analogue: revenue impact of dropping small discounts — a
    pure scan-filter-aggregate with NO shuffle at all (partial aggs
    merge into a single row). Every predicate is scan-pushed; the read
    schema is 4 columns of 11. The shape that must stay a single
    pipelined stage at 100 TB."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6
            ).alias("revenue_delta"),
            F.count(F.lit(1)).alias("qualifying_items"),
        )
    )
