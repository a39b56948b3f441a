"""Relational operator surface: scans, filters, projections, every join
family, aggregation varieties (SURVEY §2.2 checklist rows 3-10).

The reference implements none of these (it is a CDC client); our engine
exposes them as first-class queries over the fixture star schema, designed
scale-first:

* fixed-cardinality dimension tables (region: 5 rows, nation: 25 rows) and
  tiny computed tables are explicitly ``broadcast()``; SF-scaling dimensions
  (customer/part/supplier grow linearly with scale — multi-TB at 100 TB) are
  joined WITHOUT a hint so statistics pick the strategy: at bench scale the
  estimates choose the identical broadcast-hash join, at 100 TB they refuse
  the broadcast instead of OOMing the driver;
* aggregations are expressed so Catalyst plans partial (map-side) +
  final aggregation;
* every filter is a plain column predicate → parquet pushdown
  (``PushedFilters`` in .explain), every select prunes columns
  (``ReadSchema``).

Numeric convention (hash-stable vs the DuckDB oracle): doubles are cast to
exact ``DECIMAL(18,4)`` before summing (fixture values carry ≤2 decimals,
so the cast is lossless), and emitted via ``ROUND(.., 2)`` as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query


def dec(c):
    return F.col(c).cast("decimal(18,4)")


def money(x):
    return F.round(x, 2).cast("double")


# SQL fragments for the DuckDB side of the same conventions.
D = "CAST({} AS DECIMAL(18,4))"


# ---------------------------------------------------------------------------
# TPC-H-style analytics (adapted to the fixture schema)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS sum_qty,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE AS sum_base_price,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))), 2)::DOUBLE AS sum_disc_price,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))
                 * CAST(1 + CAST(l_tax AS DECIMAL(18,4)) AS DECIMAL(18,4))), 2)::DOUBLE AS sum_charge,
           ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4)))::DOUBLE / COUNT(*), 2) AS avg_qty,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))::DOUBLE / COUNT(*), 2) AS avg_price,
           ROUND(SUM(CAST(l_discount AS DECIMAL(18,4)))::DOUBLE / COUNT(*), 2) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1: pricing summary report (group-agg with 8 aggregates;
    partial+final agg, zero joins — the map-side-combine benchmark)."""
    (li,) = load(spark, sf_dir, "lineitem")
    disc_factor = (F.lit(1) - dec("l_discount")).cast("decimal(18,4)")
    charge_factor = (F.lit(1) + dec("l_tax")).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum(dec("l_quantity"))).alias("sum_qty"),
            money(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            money(F.sum(dec("l_extendedprice") * disc_factor)).alias("sum_disc_price"),
            money(F.sum(dec("l_extendedprice") * disc_factor * charge_factor)).alias(
                "sum_charge"
            ),
            F.round(
                F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_qty"),
            F.round(
                F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_price"),
            F.round(
                F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - CAST(l.l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate ASC, orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3: top-10 unshipped orders by revenue (broadcast dim join +
    fact-fact shuffle join + top-k with total-order tiebreak)."""
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    disc_factor = (F.lit(1) - dec("l_discount")).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(dec("l_extendedprice") * disc_factor)).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), F.asc("orderdate"), F.asc("orderkey"))
        .limit(10)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS → left-semi join, then count by priority."""
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - CAST(l.l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: 6-way join; dims join hint-free (stats pick broadcast at
    bench scale, refuse it for the SF-scaling ones at 100 TB), one
    fact-fact shuffle."""
    cust, orders, li, supp, nat, reg = load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    disc_factor = (F.lit(1) - dec("l_discount")).cast("decimal(18,4)")
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(money(F.sum(dec("l_extendedprice") * disc_factor)).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(l_discount AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure filter+scalar-agg — the predicate-pushdown benchmark
    (every predicate must reach the parquet scan)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"))
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - CAST(l.l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
    FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name AND year(l.l_shipdate) IN (1995, 1996)
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: same dim joined twice under different roles
    (supplier nation vs customer nation) — alias-disambiguation test."""
    supp, li, orders, cust, nat = load(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    disc_factor = (F.lit(1) - dec("l_discount")).cast("decimal(18,4)")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(F.year("l_shipdate").isin(1995, 1996))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(money(F.sum(dec("l_extendedprice") * disc_factor)).alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
           ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - CAST(l.l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))), 2)::DOUBLE AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-item revenue."""
    cust, orders, li, nat = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    disc_factor = (F.lit(1) - dec("l_discount")).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(money(F.sum(dec("l_extendedprice") * disc_factor)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - CAST(l.l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END)::DOUBLE
              / SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - CAST(l.l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4)))::DOUBLE, 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01' AND l.l_shipdate < TIMESTAMP '1995-12-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: conditional aggregation ratio over a broadcast join."""
    li, part = load(spark, sf_dir, "lineitem", "part")
    disc = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-12-01").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(disc).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(CAST(o.o_totalprice AS DECIMAL(18,4)), 2)::DOUBLE AS totalprice,
           ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS sum_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) > 212
    ORDER BY totalprice DESC, orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: HAVING over a join-agg (aggregate-then-filter)."""
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 212)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            money(dec("o_totalprice")).alias("totalprice"),
            money(F.col("_qty")).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Join families beyond the TPC-H shapes
# ---------------------------------------------------------------------------


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark, sf_dir):
    """Left-anti join: customers that never ordered."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_semi_active_suppliers",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
    GROUP BY n.n_name
    """,
)
def join_semi(spark, sf_dir):
    """Left-semi join: suppliers with at least one lineitem."""
    supp, li, nat = load(spark, sf_dir, "supplier", "lineitem", "nation")
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


@query(
    "join_full_outer_order_coverage",
    oracle="""
    WITH c AS (SELECT c_custkey FROM customer),
         o AS (SELECT DISTINCT o_custkey FROM orders)
    SELECT CAST(SUM(CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_sides,
           CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS customer_only,
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_only
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """Full-outer join coverage accounting."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    c = cust.select("c_custkey")
    o = orders.select("o_custkey").distinct()
    j = c.join(o, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
    one = F.lit(1)
    zero = F.lit(0)
    return j.agg(
        F.sum(
            F.when(F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), one).otherwise(zero)
        ).alias("both_sides"),
        F.sum(F.when(F.col("o_custkey").isNull(), one).otherwise(zero)).alias("customer_only"),
        F.sum(F.when(F.col("c_custkey").isNull(), one).otherwise(zero)).alias("orders_only"),
    )


@query(
    "join_range_price_bands",
    oracle="""
    SELECT b.band_name, COUNT(*) AS n_orders,
           ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS volume
    FROM orders o
    JOIN (VALUES ('small', 0.0, 50000.0), ('medium', 50000.0, 150000.0),
                 ('large', 150000.0, 1e18)) AS b(band_name, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_name
    """,
)
def join_range_bands(spark, sf_dir):
    """Non-equi (range) join against a tiny banding table — planned as a
    broadcast nested-loop join, the right physical choice for band lookup."""
    (orders,) = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50_000.0), ("medium", 50_000.0, 150_000.0), ("large", 150_000.0, 1e18)],
        "band_name string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(dec("o_totalprice"))).alias("volume"),
        )
    )


@query(
    "join_self_lineitem_pairs",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_pairs
    FROM (
      SELECT a.l_returnflag
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
      WHERE a.l_returnflag = b.l_returnflag
    ) GROUP BY l_returnflag
    """,
)
def join_self_pairs(spark, sf_dir):
    """Self-join on the fact table (co-located: both sides partition on
    l_orderkey, one shuffle shared by both inputs)."""
    (li,) = load(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    b = a.select(
        F.col("l_orderkey").alias("b_orderkey"),
        F.col("l_linenumber").alias("b_linenumber"),
        F.col("l_returnflag").alias("b_returnflag"),
    )
    return (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("b_orderkey"))
            & (F.col("l_linenumber") < F.col("b_linenumber"))
            & (F.col("l_returnflag") == F.col("b_returnflag")),
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Aggregation varieties
# ---------------------------------------------------------------------------


@query(
    "agg_rollup_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2)::DOUBLE AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (flag → flag+status → grand total)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), money(F.sum(dec("l_quantity"))).alias("qty")
    )


@query(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS volume
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE over status × priority."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), money(F.sum(dec("o_totalprice"))).alias("volume")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL API."""
    (cust,) = load(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "agg_distinct_suppliers",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    """Multiple COUNT(DISTINCT) in one aggregation (expand + two-phase)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_linestatus,
           ROUND(MIN(l_extendedprice), 2)::DOUBLE AS min_price,
           ROUND(MAX(l_extendedprice), 2)::DOUBLE AS max_price,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))::DOUBLE / COUNT(*), 2) AS mean_price,
           ROUND(stddev_samp(l_extendedprice), 1) AS sd_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_stats(spark, sf_dir):
    """Statistical aggregates. stddev is float-summed, so it is rounded to
    1 decimal for cross-engine stability (documented tolerance)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.min("l_extendedprice"), 2).cast("double").alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).cast("double").alias("max_price"),
        F.round(F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 2).alias(
            "mean_price"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 1).alias("sd_price"),
    )


@query(
    "agg_conditional_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_conditional_pivot(spark, sf_dir):
    """Pivot via .pivot() with an explicit value list (no extra pass)."""
    (orders,) = load(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("n_f"),
        F.col("O").alias("n_o"),
        F.col("P").alias("n_p"),
    )
