"""Relational engine surface over the TPC-H-ish tables: grouped rollups,
join family (inner/left/semi/anti), analytic window functions, rollup
grouping sets. The reference implements no joins (SURVEY §2.7) — these are
the standard engine surface the driver's oracle exercises, all Catalyst
built-ins.

Scale notes:
- dimension sides (region/nation/customer at these SFs; on a real cluster
  anything under spark.sql.autoBroadcastJoinThreshold) broadcast — no
  shuffle of the lineitem fact;
- money sums go through DECIMAL(18,2) casts on both engines so the hash is
  immune to float summation order;
- every ordered-limit carries a key tie-break.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import load_table
from .registry import query


@query(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
    bench=True,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: the canonical scan→filter→partial-agg
    →shuffle→final-agg plan. Money sums in DECIMAL for cross-engine hash
    stability."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "top_unshipped_orders",
    oracle="""
        SELECT l.l_orderkey AS orderkey,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               o.o_orderdate AS orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
    bench=True,
)
def top_unshipped_orders(spark, sf_dir):
    """TPC-H Q3-style: 3-way join + grouped revenue + top-k. customer and
    orders are SF-linear, so they carry NO broadcast hint (r6 hint
    policy, SCALING.md): AQE's dynamic join selection broadcasts the
    filtered sides when their runtime size is genuinely small and falls
    back to a shuffle join at 100 TB, where a forced hint would exceed
    the 8 GB broadcast hard limit."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    # r13: parallelism floor on both SF-linear sides — the single-row-group
    # test scans otherwise run the whole BHJ probe + partial agg on one
    # task (interleaved A/B at sf0.1: median 1.26 s → 1.03 s); no-op at
    # real scale (guard in tables._ensure_min_parallelism).
    o = load_table(spark, sf_dir, "orders", spread_on=("o_orderkey",)).filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem", spread_on=("l_orderkey",)).filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        l.join(
            o.join(c, o.o_custkey == c.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).cast("double").alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@query(
    "regional_revenue",
    oracle="""
        SELECT r.r_name AS region_name,
               n.n_name AS nation_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey   = c.c_custkey
        JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
        GROUP BY 1, 2
    """,
    tags=("join", "agg", "tpch"),
    bench=True,
)
def regional_revenue(spark, sf_dir):
    """TPC-H Q5-style star join: region→nation→customer→orders→lineitem.
    nation/region (bounded: 25/5 rows) broadcast by hint; the customer
    dim chain is SF-linear so it carries NO hint (r6 hint policy,
    SCALING.md) — AQE broadcasts it at small scale and shuffle-joins at
    100 TB, where every customer cannot fit one executor."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # r13: parallelism floor — the orders-side broadcast leaves lineitem
    # unshuffled, so its BHJ probe ran inside the one-task test scan
    # (interleaved A/B at sf0.1: median 2.20 s → 1.12 s); no-op at scale.
    l = load_table(spark, sf_dir, "lineitem", spread_on=("l_orderkey",))
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "customer_order_left_join",
    oracle="""
        SELECT c.c_custkey AS custkey,
               c.c_mktsegment AS mktsegment,
               COUNT(o.o_orderkey) AS n_orders,
               CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    """,
    tags=("join", "agg"),
)
def customer_order_left_join(spark, sf_dir):
    """Left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0).cast("decimal(28,2)"),
            ).cast("double").alias("total_spend"),
        )
    )


@query(
    "customers_with_open_orders",
    oracle="""
        SELECT c_custkey AS custkey, c_name AS name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    tags=("join", "semi"),
)
def customers_with_open_orders(spark, sf_dir):
    """Left-semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


@query(
    "customers_without_orders",
    oracle="""
        SELECT c_custkey AS custkey, c_mktsegment AS mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    tags=("join", "anti"),
)
def customers_without_orders(spark, sf_dir):
    """Left-anti join (NOT EXISTS): customers with no finished orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment")
    )


@query(
    "top_orders_per_customer",
    oracle="""
        SELECT custkey, orderkey, totalprice, rnk FROM (
            SELECT o_custkey AS custkey,
                   o_orderkey AS orderkey,
                   o_totalprice AS totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """,
    tags=("window",),
)
def top_orders_per_customer(spark, sf_dir):
    """Analytic window function (engine surface; reference has none, SURVEY
    §2.9): top-3 orders per customer by price, deterministic tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rnk",
        )
    )


@query(
    "order_value_running",
    oracle="""
        SELECT custkey, orderkey, lagged_price, cum_orders FROM (
            SELECT o_custkey AS custkey,
                   o_orderkey AS orderkey,
                   LAG(o_totalprice) OVER w AS lagged_price,
                   COUNT(*) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey
                                  ROWS UNBOUNDED PRECEDING) AS cum_orders
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        )
    """,
    tags=("window",),
)
def order_value_running(spark, sf_dir):
    """lag() + running count over an ordered per-customer window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.lag("o_totalprice").over(w).alias("lagged_price"),
        F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_orders"
        ),
    )


@query(
    "rollup_order_priority",
    oracle="""
        SELECT o_orderstatus AS orderstatus,
               o_orderpriority AS orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def rollup_order_priority(spark, sf_dir):
    """ROLLUP grouping sets (engine surface): per (status, priority), per
    status, and grand total in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup(
        F.col("o_orderstatus").alias("orderstatus"),
        F.col("o_orderpriority").alias("orderpriority"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "part_supplier_union",
    oracle="""
        SELECT 'part' AS kind, p_name AS name FROM part WHERE p_size > 40
        UNION ALL
        SELECT 'supplier' AS kind, s_name AS name FROM supplier WHERE s_acctbal > 5000
    """,
    tags=("setop", "union"),
)
def part_supplier_union(spark, sf_dir):
    """UNION ALL with schema reconciliation — the §2.8 'two variants in one
    topic' shape (unionByName)."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") > 40)
        .select(F.lit("part").alias("kind"), F.col("p_name").alias("name"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.lit("supplier").alias("kind"), F.col("s_name").alias("name"))
    )
    return p.unionByName(s)
