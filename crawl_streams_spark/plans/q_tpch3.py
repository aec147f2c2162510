"""Third wave of TPC-H-shaped queries — Q4, Q6, Q10, Q13, Q15, Q16, Q18
analogs — completing the Q1-Q22 plan-shape sweep over the driver's slimmed
tables (no partsupp / l_commitdate / l_receiptdate / comments; lateness is
l_shipdate vs o_orderdate, part-supplier pairs come from lineitem, and the
Q13/Q16 comment filters become priority / acctbal predicates). The
reference implements no joins (SURVEY.md §2.7); these are engine surface.

Scale notes (all shapes hold at 100 TB):
- Q4/Q18's order-level lineitem predicate is a single l_orderkey
  shuffle (semi join / partial agg), never a fact self-join;
- Q6 is the pure pushed-down scan-agg — zero joins, one exchange for the
  global sum;
- Q10's dimensions broadcast; the top-k plans as TakeOrderedAndProject;
- Q13 inherently needs two shuffles (custkey, then n_orders) — both keys
  are low-skew, and the second input is one row per customer;
- Q15's global max is a 1-row broadcast, not a window over all suppliers;
- Q16's supplier exclusion is a broadcast anti join above a distinct over
  (partkey, suppkey) — the distinct rides the same shuffle as the count.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..tables import load_table
from .registry import query

_REV_DEC = "decimal(28,4)"


def _revenue():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        _REV_DEC
    )


@query(
    "late_order_priority_counts",
    oracle="""
        SELECT o.o_orderpriority AS orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
    """,
    tags=("subquery", "semi", "tpch"),
)
def late_order_priority_counts(spark, sf_dir):
    """TPC-H Q4-shape: priority counts of one quarter's orders having at
    least one late lineitem (EXISTS → left-semi join). The correlated
    inequality (l_shipdate vs this order's o_orderdate) rides the join
    condition, so the semi join stays a single l_orderkey shuffle and the
    quarter filter is pushed to the orders scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "discount_revenue_forecast",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                             AS DECIMAL(28,4))) AS DOUBLE) AS forecast_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "pushdown", "tpch"),
)
def discount_revenue_forecast(spark, sf_dir):
    """TPC-H Q6-shape: what-if revenue of dropping mid-range discounts for
    small quantities in one ship year. The canonical predicate-pushdown
    probe — every filter reaches the parquet scan (PushedFilters), no join,
    one exchange for the single-row global sum."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_REV_DEC))
            .cast("double")
            .alias("forecast_revenue")
        )
    )


@query(
    "returned_item_customers",
    oracle="""
        SELECT c.c_custkey AS custkey,
               c.c_name AS name,
               n.n_name AS nation_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders   o ON o.o_orderkey   = l.l_orderkey
        JOIN customer c ON c.c_custkey    = o.o_custkey
        JOIN nation   n ON n.n_nationkey  = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, custkey
        LIMIT 20
    """,
    tags=("join", "topk", "tpch"),
)
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10-shape: top-20 customers by revenue lost to returned items
    in one quarter. customer⋈nation broadcasts; the quarter's orders
    broadcast onto lineitem so the fact never shuffles on a join key — its
    only exchange is the final custkey group-by, and the top-20 plans as
    TakeOrderedAndProject (tie-broken by custkey for determinism)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cust = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@query(
    "order_count_distribution",
    oracle="""
        SELECT n_orders,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY 1
        )
        GROUP BY 1
    """,
    tags=("join", "agg", "tpch"),
)
def order_count_distribution(spark, sf_dir):
    """TPC-H Q13-shape: distribution of per-customer order counts, keeping
    zero-order customers via a left join with the priority filter in the
    join condition (a WHERE would turn it inner and lose the zeros — the
    classic Q13 trap). Two inherent shuffles: custkey for the per-customer
    count, then the (tiny-domain) count itself for the histogram."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_customers")
    )


@query(
    "top_revenue_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(28,4))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY 1
        )
        SELECT s.s_suppkey AS suppkey,
               s.s_name AS name,
               CAST(r.total_rev AS DOUBLE) AS total_revenue
        FROM rev r
        JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    tags=("subquery", "join", "tpch"),
)
def top_revenue_supplier(spark, sf_dir):
    """TPC-H Q15-shape: supplier(s) with the maximum quarterly revenue.
    The per-supplier revenue aggregates once (suppkey shuffle); the global
    max is a 1-row broadcast joined back for the equality filter — exact
    because revenue stays DECIMAL until after the comparison. supplier is
    SF-linear so it carries no hint (r6 hint policy) — AQE broadcasts
    the tiny winner side instead."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_rev"))
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev == F.col("max_rev"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@query(
    "supplier_count_by_part",
    oracle="""
        SELECT p.p_brand AS brand,
               p.p_type AS type,
               p.p_size AS size,
               CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'BRAND_1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 9, 17, 25, 33, 41, 49)
          AND ps.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    tags=("join", "anti", "distinct", "tpch"),
)
def supplier_count_by_part(spark, sf_dir):
    """TPC-H Q16-shape: distinct-supplier counts per part attribute bucket,
    excluding flagged suppliers (NOT IN → broadcast anti join). Without a
    partsupp table the part-supplier relation is DISTINCT(l_partkey,
    l_suppkey) from lineitem; the distinct and the count-distinct ride the
    same partkey-bucketed shuffle; part and the exclusion list are
    SF-linear so neither carries a hint (r6 hint policy) — AQE
    broadcasts them when genuinely small."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "BRAND_1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(bad_supp, ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, ps.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "large_volume_customers",
    oracle="""
        SELECT c.c_name AS name,
               c.c_custkey AS custkey,
               o.o_orderkey AS orderkey,
               o.o_orderdate AS orderdate,
               o.o_totalprice AS totalprice,
               CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY 1 HAVING SUM(l_quantity) > 250)
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY totalprice DESC, orderkey
        LIMIT 100
    """,
    tags=("subquery", "semi", "topk", "tpch"),
)
def large_volume_customers(spark, sf_dir):
    """TPC-H Q18-shape: customers with orders totalling > 250 units. The
    HAVING-IN subquery is the same l_orderkey partial aggregate the outer
    sum needs, so the plan computes it once: aggregate lineitem by
    orderkey, filter the (rare) big orders, then broadcast that small set
    back onto orders⋈customer. The fact shuffles once, on l_orderkey."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(100)
    )
