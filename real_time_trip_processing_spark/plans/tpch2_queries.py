"""Second wave of TPC-H-shaped analytics (round 2): the plan shapes
round 1 didn't cover — correlated-min supplier selection (Q2),
market-share conditional aggregation (Q8), global-scalar-threshold
filtering (Q11), late-line conditional counts (Q12), anti-join +
distinct counting (Q16), semi-join over a derived threshold (Q20), and
the sole-blocker exists/not-exists shape (Q21).

Adapted to the testdata schema (no partsupp / shipmode / commitdate):
each adaptation keeps the *plan shape* that makes the original query a
benchmark classic, and every declared result sticks to exact
arithmetic (integral sums, dates, ints) or late-rounded doubles so the
DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from .registry import declare


@declare(
    "min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    offers AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS min_unit
      FROM lineitem l JOIN eu_supp s ON s.s_suppkey = l.l_suppkey
      GROUP BY l.l_partkey, l.l_suppkey),
    ranked AS (
      SELECT o.l_partkey, o.l_suppkey, o.min_unit,
             row_number() OVER (PARTITION BY o.l_partkey
                                ORDER BY o.min_unit, o.l_suppkey) AS rn
      FROM offers o)
    SELECT p.p_partkey, p.p_brand, s.s_suppkey AS cheapest_supp,
           s.n_name AS nation, r.min_unit AS min_unit_price
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey AND p.p_size < 25
    JOIN eu_supp s ON s.s_suppkey = r.l_suppkey
    WHERE r.rn = 1
    """,
)
def min_cost_supplier(spark, sf_dir):
    """Q2 analogue (adapted: observed min unit price over shipped lines
    stands in for partsupp.supplycost): for every small part, the
    EUROPE supplier offering the lowest unit price, ties to the lower
    suppkey.

    Shape: the correlated MIN-subquery becomes one aggregation plus a
    per-part ranking window; supplier/nation/region prune-then-broadcast
    so the only shuffles are the (part, supp) aggregate and the
    per-part window — both partitioned by l_partkey. MIN of an exact
    division keeps every compared value order-independent, so ranking
    is engine-stable. The winning quotient is emitted RAW: the IEEE
    division is bit-identical across engines, while decimal-rounding a
    double is not (engines disagree on ties at the rounding boundary —
    observed once at sf0.1), so rounding is what would break parity."""
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    offers = (
        l.join(F.broadcast(eu_supp.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit"))
    )
    w = Window.partitionBy("l_partkey").orderBy("min_unit", "l_suppkey")
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = table(spark, sf_dir, "part").filter(F.col("p_size") < 25).select(
        "p_partkey", "p_brand"
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_supp), best.l_suppkey == eu_supp.s_suppkey)
        .select(
            "p_partkey", "p_brand",
            F.col("s_suppkey").alias("cheapest_supp"),
            F.col("n_name").alias("nation"),
            F.col("min_unit").alias("min_unit_price"),
        )
    )


@declare(
    "market_share",
    oracle="""
    WITH asia_cust AS (
      SELECT c.c_custkey FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'),
    rev AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN asia_cust ac ON ac.c_custkey = o.o_custkey
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey)
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share,
           ROUND(SUM(volume), 6) AS total_volume
    FROM rev GROUP BY o_year
    """,
)
def market_share(spark, sf_dir):
    """Q8 analogue: NATION_2's share of the ASIA-customer PROMO-part
    market per order year. The national-share pattern = one conditional
    sum over the same joined frame — never two scans. All dimension
    sides (customer-in-region, part, supplier→nation) broadcast; the
    single shuffle pair is lineitem ⋈ orders."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(F.lit(0.0))
    )
    return rev.groupBy("o_year").agg(
        F.round(nation_vol / F.sum("volume"), 6).alias("mkt_share"),
        F.round(F.sum("volume"), 6).alias("total_volume"),
    )


@declare(
    "important_parts",
    oracle="""
    WITH stock AS (
      SELECT l_partkey, SUM(l_quantity) AS qty
      FROM lineitem GROUP BY l_partkey)
    SELECT s.l_partkey AS p_partkey, CAST(s.qty AS BIGINT) AS stock_qty
    FROM stock s
    WHERE s.qty > (SELECT SUM(qty) / COUNT(*) * 1.5 FROM stock)
    """,
)
def important_parts(spark, sf_dir):
    """Q11 analogue: parts holding an outsized share of total shipped
    quantity (> 1.5× the mean per-part stock — scale-invariant, unlike
    a fixed fraction of the total) — the global-scalar-threshold shape.
    The threshold is a one-row aggregate broadcast into the filter
    (Q11's correlated scalar subquery); per-part and global sums share
    one scan-side partial aggregation. Quantities are integral, so the
    compared sums are exact in any summation order — the membership set
    is engine-stable by construction."""
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    stock = l.groupBy("l_partkey").agg(F.sum("l_quantity").alias("qty"))
    total = stock.agg(
        (F.sum("qty") / F.count(F.lit(1)) * 1.5).alias("threshold")
    )
    return (
        stock.join(F.broadcast(total))
        .filter(F.col("qty") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("qty").cast("long").alias("stock_qty"),
        )
    )


@declare(
    "late_priority_lines",
    oracle="""
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 90
    GROUP BY year(l.l_shipdate)
    """,
)
def late_priority_lines(spark, sf_dir):
    """Q12 analogue (ship-lag > 90 days stands in for the
    commit/receipt-date predicate): how many late lines belonged to
    high- vs low-priority orders, per ship year. Pure integer
    conditional counts over the lineitem ⋈ orders shuffle pair; the lag
    predicate is evaluated post-join (it needs both sides) but the
    projection reaches the scans with only 2 columns each."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.datediff("l_shipdate", "o_orderdate") > 90)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@declare(
    "supplier_part_counts",
    oracle="""
    SELECT p.p_brand,
           CAST(floor(p.p_size / 10) AS BIGINT) AS size_bucket,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type <> 'PROMO'
    WHERE l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p.p_brand, floor(p.p_size / 10)
    """,
)
def supplier_part_counts(spark, sf_dir):
    """Q16 analogue: distinct supplier counts per (brand, size bucket),
    excluding distrusted suppliers (low account balance stands in for
    the complaint predicate). The NOT IN becomes a broadcast LEFT ANTI
    join — no null-aware subquery machinery; the distinct count is the
    only shuffle (two-phase partial distinct)."""
    excluded = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO").select(
        "p_partkey", "p_brand", "p_size"
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(excluded), l.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.floor(F.col("p_size") / 10).cast("long").alias("size_bucket"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@declare(
    "promo_part_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
        AND l.l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY l.l_suppkey),
    qualified AS (
      SELECT l_suppkey, qty FROM shipped
      WHERE qty > (SELECT AVG(qty) * 1.1 FROM shipped))
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
           CAST(q.qty AS BIGINT) AS qty_shipped
    FROM qualified q
    JOIN supplier s ON s.s_suppkey = q.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def promo_part_suppliers(spark, sf_dir):
    """Q20 analogue: suppliers who shipped meaningfully more PROMO
    stock in 1998 than their peers (> 1.1× the mean, standing in for
    the half-of-stock threshold). The derived-threshold semi-join
    shape: the per-supplier aggregate joins against its own one-row
    mean (broadcast scalar), survivors then pick up supplier/nation
    attributes via broadcast. Integral quantity sums keep the
    threshold comparison exact."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = shipped.agg((F.avg("qty") * 1.1).alias("bar"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        shipped.join(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("bar"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "s_suppkey", "s_name", F.col("n_name").alias("nation"),
            F.col("qty").cast("long").alias("qty_shipped"),
        )
    )


@declare(
    "waiting_orders",
    oracle="""
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS s_last
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey),
    per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, MAX(s_last) AS mx
      FROM fl GROUP BY l_orderkey),
    blockers AS (
      SELECT f.l_orderkey, f.l_suppkey
      FROM fl f JOIN per_order p
        ON p.l_orderkey = f.l_orderkey AND f.s_last = p.mx
      WHERE p.n_supp >= 2),
    sole AS (
      SELECT l_orderkey, MAX(l_suppkey) AS blocker
      FROM blockers GROUP BY l_orderkey HAVING COUNT(*) = 1)
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
    FROM sole JOIN supplier s ON s.s_suppkey = sole.blocker
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def waiting_orders(spark, sf_dir):
    """Q21 analogue: suppliers who were the SOLE last shipper on
    multi-supplier finalized orders — the exists/not-exists pair
    becomes two cheap aggregates over the same (orderkey, suppkey)
    grouping: per-order supplier counts + max ship date, then "is the
    unique blocker" as a HAVING COUNT(*) = 1. Everything is dates and
    ints — exact on any engine; the heavy shuffle is the one
    lineitem-side grouping on l_orderkey, reused by both aggregates."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    fl = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_last"))
    )
    per_order = fl.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.max("s_last").alias("mx")
    )
    blockers = (
        fl.join(per_order, "l_orderkey")
        .filter((F.col("s_last") == F.col("mx")) & (F.col("n_supp") >= 2))
        .select("l_orderkey", "l_suppkey")
    )
    sole = (
        blockers.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("nb"), F.max("l_suppkey").alias("blocker"))
        .filter(F.col("nb") == 1)
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(s), sole.blocker == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@declare(
    "order_fulfillment_latency",
    oracle="""
    WITH last_ship AS (
      SELECT l_orderkey, MAX(l_shipdate) AS last_ship
      FROM lineitem GROUP BY l_orderkey),
    lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, ls.last_ship) AS days
      FROM orders o JOIN last_ship ls ON ls.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(AVG(days), 6) AS avg_days,
           ROUND(quantile_cont(days, 0.5), 8) AS median_days,
           ROUND(quantile_cont(days, 0.95), 8) AS p95_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def order_fulfillment_latency(spark, sf_dir):
    """Order lifecycle latency: days from order date to the LAST line
    shipment (the order is done when its slowest item ships), profiled
    per priority. The per-order max collapses lineitem on l_orderkey
    and meets orders on the same key — one shuffle chain — before the
    tiny per-priority summary. Latencies are integer day counts, so
    only the summary statistics touch floats."""
    from ..sources import table

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    lat = o.join(
        last_ship, o["o_orderkey"] == last_ship["l_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff(F.col("last_ship"), F.col("o_orderdate")).alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("days"), 6).alias("avg_days"),
        F.round(F.expr("percentile(days, 0.5)"), 8).alias("median_days"),
        F.round(F.expr("percentile(days, 0.95)"), 8).alias("p95_days"),
    )


@declare(
    "promo_share_trend",
    oracle="""
    SELECT date_trunc('month', l.l_shipdate) AS month,
           ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
               / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY date_trunc('month', l.l_shipdate)
    """,
)
def promo_share_trend(spark, sf_dir):
    """Q14 as a monthly trend: promo revenue share per ship month —
    same broadcast-part shape as promo_revenue_share, with the
    conditional/total sums folding per month in one partial-aggregated
    pass (~|months| output rows)."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 6).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@declare(
    "supplier_hhi",
    oracle="""
    WITH sup_rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey),
    tot AS (SELECT s_nationkey, SUM(rev) AS nation_rev, COUNT(*) AS n_suppliers
            FROM sup_rev GROUP BY s_nationkey)
    SELECT n.n_name AS nation, t.n_suppliers,
           ROUND(SUM((sr.rev / t.nation_rev) * (sr.rev / t.nation_rev)), 6) AS hhi
    FROM sup_rev sr
    JOIN tot t ON t.s_nationkey = sr.s_nationkey
    JOIN nation n ON n.n_nationkey = sr.s_nationkey
    GROUP BY n.n_name, t.n_suppliers
    """,
)
def supplier_hhi(spark, sf_dir):
    """Supply-concentration index per nation (Herfindahl–Hirschman:
    Σ share² over suppliers — 1/n when even, →1 when monopolized). The
    heavy shuffle is the (nation, supplier) revenue aggregate; the
    nation totals collapse from it and everything after runs on
    ~|suppliers| rows with nation broadcast for names."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sup_rev = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.round(F.sum(rev), 6).alias("rev"))
    )
    tot = sup_rev.groupBy("s_nationkey").agg(
        F.sum("rev").alias("nation_rev"), F.count(F.lit(1)).alias("n_suppliers")
    )
    share = F.col("rev") / F.col("nation_rev")
    return (
        sup_rev.join(tot, "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
        .agg(F.round(F.sum(share * share), 6).alias("hhi"))
    )
