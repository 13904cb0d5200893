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


@declare(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark, sf_dir):
    """Q5 analogue: revenue per nation where the customer and supplier
    are co-national, one region, one year. Five joins but only ONE
    shuffle pair (lineitem x orders on orderkey): customer, supplier,
    nation, region are all broadcast, and the co-nationality predicate
    rides along as a post-join filter on two broadcast columns. The
    region filter prunes the nation build side before broadcast."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_in_region = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n_in_region), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


@declare(
    "nation_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def nation_trade_volume(spark, sf_dir):
    """Q7 analogue: bilateral trade volume between two nations by ship
    year. The nation pair predicate is pushed into the two broadcast
    dimension builds (each nation table pre-filtered to the 2-row
    subset), so the fact rows that survive are cut by the supplier leg
    BEFORE the orders shuffle. The OR-of-pairs residual runs on
    broadcast columns, not a shuffle."""
    pair = ("NATION_1", "NATION_2")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sup = s.join(F.broadcast(n1), s.s_nationkey == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cust = c.join(F.broadcast(n2), c.c_nationkey == F.col("cn_key")).select(
        "c_custkey", "cust_nation"
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(F.broadcast(sup), l.l_suppkey == sup.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


@declare(
    "promo_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-04-01'
    """,
)
def promo_revenue_share(spark, sf_dir):
    """Q14 analogue: share of revenue from promo parts in one quarter.
    Part is broadcast (only partkey+type read); the date filter is
    scan-pushed on lineitem; the conditional/total sums fold in one
    partial-aggregated pass with no shuffle (single global row)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@declare(
    "top_supplier",
    oracle="""
    WITH srev AS (
      SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM srev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM srev)
    """,
)
def top_supplier(spark, sf_dir):
    """Q15 analogue: the supplier(s) with max revenue in a quarter,
    ties kept. One shuffle (per-supplier agg over ~#suppliers keys);
    the max is a rank()==1 window over that already-small aggregate,
    and supplier joins in by broadcast at the end, after the data has
    shrunk to one row per supplier."""
    from pyspark.sql import Window

    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    srev = l.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("total_revenue")
    )
    ranked = srev.withColumn(
        "rk", F.rank().over(Window.orderBy(F.desc("total_revenue")))
    ).filter(F.col("rk") == 1)
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ranked.join(F.broadcast(s), ranked.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@declare(
    "small_qty_avg_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_cut
          FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < t.qty_cut
    """,
)
def small_qty_avg_revenue(spark, sf_dir):
    """Q17 analogue: revenue that would vanish if below-20%-of-average
    quantity orders stopped. The correlated scalar subquery is NOT a
    broadcast-back of a per-part aggregate — the part domain scales
    with the data, so that build side would not fit at 100 TB. Instead
    the brand filter (broadcastable: it's a filter on the dimension)
    reduces the fact 25x FIRST, then one partkey-partitioned window
    computes the per-part average in the same single shuffle that
    co-locates each part's rows. Note the avg is over the brand's
    parts' full lineitem history, which the reduced set preserves
    exactly (the part filter is independent of the lineitem rows)."""
    from pyspark.sql import Window

    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        lp.withColumn("qty_cut", 0.2 * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@declare(
    "large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def large_volume_customers(spark, sf_dir):
    """Q18 analogue: orders whose total quantity exceeds a threshold,
    with their customers.

    Round-11 shape (guide §1.2 "don't compute things you throw away"):
    the textbook plan — HAVING aggregate → semi-join the fact →
    re-aggregate — scanned and shuffled lineitem TWICE to recompute a
    sum the HAVING pass already produced. The final group keys include
    ``o_orderkey``, so ``total_qty`` per output row IS the per-order
    ``q`` of the HAVING aggregate; joining the filtered aggregate
    (rare keys: > p99) straight to orders/customer is row-for-row
    identical, including under duplicate order rows (each duplicate
    contributes one ``q``, exactly what the semi-join re-aggregate
    summed). Measured at sf0.1: 0.76 s → 0.41 s, identical rows; the
    lineitem scan and its exchange happen once."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("q").alias("total_qty"))
    )


@declare(
    "brand_discount_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def brand_discount_revenue(spark, sf_dir):
    """Q19 analogue: OR-of-ANDs predicate mixing part attributes and
    lineitem quantity. The part-only disjunction (brand x size) is
    factored out and applied to the broadcast build side — parts
    matching NO branch never enter the hash table — while the mixed
    residual evaluates post-join inside the same codegen stage."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    part_any = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p.filter(part_any)), l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


@declare(
    "idle_rich_customers",
    oracle="""
    WITH cutoff AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 6) AS totacctbal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c.c_nationkey
    """,
)
def idle_rich_customers(spark, sf_dir):
    """Q22 analogue (adapted: "no recent orders" instead of "no orders
    ever" — the synthetic data gives every customer at least one order;
    nationkey stands in for the phone country code). Shapes exercised:
    a scalar aggregate broadcast as a cross-join filter, and a NOT
    EXISTS that compiles to a left-anti join against the date-pruned
    orders scan."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )
