"""Second wave of TPC-H-shaped queries: the join/aggregation plan shapes of
Q7, Q8, Q9, Q12, Q14, Q17, Q19 and Q21, adapted to the driver's slimmed
tables (no partsupp; no l_shipmode / l_commitdate / l_receiptdate — lateness
is derived from l_shipdate vs o_orderdate instead). The reference implements
no joins (SURVEY.md §2.7); these are engine surface.

Scale notes (all shapes hold at 100 TB):
- supplier/part/nation dimension chains broadcast; lineitem is shuffled at
  most once, for its final group-by;
- self-correlations on lineitem (Q17's per-part average, Q21's per-order
  max) are window functions over a single l_partkey / l_orderkey shuffle,
  not self-joins — one exchange instead of two scans;
- per-row money terms are DECIMAL-cast before SUM so the hash is immune to
  float summation order (registry conventions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import load_table
from .registry import query

_REV_DEC = "decimal(28,4)"

#: The bilateral-trade nation pair of nation_trade_volume — single source
#: of truth for the pre-filter, the pair predicate AND the oracle SQL
#: (ADVICE r13: the names were spelled in three places; editing one
#: silently returned empty results instead of failing).
_TRADE_A, _TRADE_B = "NATION_18", "NATION_19"


def _revenue():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        _REV_DEC
    )


@query(
    "nation_trade_volume",
    oracle=f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,4))) AS DOUBLE) AS volume
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey   = l.l_suppkey
        JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders   o ON o.o_orderkey  = l.l_orderkey
        JOIN customer c ON c.c_custkey   = o.o_custkey
        JOIN nation  cn ON cn.n_nationkey = c.c_nationkey
        WHERE (sn.n_name = '{_TRADE_A}' AND cn.n_name = '{_TRADE_B}')
           OR (sn.n_name = '{_TRADE_B}' AND cn.n_name = '{_TRADE_A}')
        GROUP BY 1, 2, 3
    """,
    tags=("join", "agg", "tpch"),
)
def nation_trade_volume(spark, sf_dir):
    """TPC-H Q7-shape: bilateral shipping volume between two nations by ship
    year. Six-relation join where every relation except lineitem broadcasts
    (supplier+nation collapses to a suppkey→nation map; orders⋈customer⋈
    nation to an orderkey→nation map would NOT broadcast at scale, so the
    plan keeps orders as a shuffle join and broadcasts only true dims)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    # The bilateral pair predicate below implies the single-side bound
    # n_name IN (the two nations) on BOTH dim chains — a constraint the
    # optimizer cannot derive from the cross-column OR, so apply it by
    # hand (guide §3.2 "reduce the big side before shuffling it"): the
    # nation filter prunes supplier/customer through their inner joins,
    # and those in turn drop ~(1 - (2/25)²) of lineitem/orders rows
    # BEFORE the orderkey join instead of after all joins.
    pair_nations = n.filter(F.col("n_name").isin(_TRADE_A, _TRADE_B))
    supp_nation = s.join(
        F.broadcast(pair_nations), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_nation = c.join(
        F.broadcast(pair_nations), c.c_nationkey == n.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))

    pair = (F.col("supp_nation") == _TRADE_A) & (
        F.col("cust_nation") == _TRADE_B
    ) | (F.col("supp_nation") == _TRADE_B) & (
        F.col("cust_nation") == _TRADE_A
    )
    return (
        l.join(supp_nation, l.l_suppkey == F.col("s_suppkey"))
        .join(o.join(cust_nation, o.o_custkey == F.col("c_custkey")),
              l.l_orderkey == o.o_orderkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("volume"))
    )


@query(
    "nation_market_share",
    oracle="""
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                             THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                       AS DECIMAL(28,4))
                             ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(28,4))) AS DOUBLE) AS mkt_share
        FROM lineitem l
        JOIN part     p ON p.p_partkey    = l.l_partkey
        JOIN supplier s ON s.s_suppkey    = l.l_suppkey
        JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders   o ON o.o_orderkey   = l.l_orderkey
        JOIN customer c ON c.c_custkey    = o.o_custkey
        JOIN nation  cn ON cn.n_nationkey = c.c_nationkey
        JOIN region   r ON r.r_regionkey  = cn.n_regionkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        GROUP BY 1
    """,
    tags=("join", "agg", "tpch"),
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8-shape: one nation's share of PROMO-part revenue sold to ASIA
    customers, by order year. The share is a conditional-sum / total-sum
    ratio inside one aggregation (no second pass). Both sums are exact
    DECIMAL before the double divide, so the quotient is bit-identical on
    both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    supp_nation = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    asia_cust = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi"
                )
            ),
            c.c_nationkey == F.col("n_nationkey"),
            "left_semi",
        )
    ).select("c_custkey")

    rev = _revenue()
    zero = F.lit(0).cast(_REV_DEC)
    return (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .join(supp_nation, l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(asia_cust, o.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "nation_product_profit",
    oracle="""
        SELECT sn.n_name AS nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,4))
                        - CAST(p.p_retailprice AS DECIMAL(18,2))
                          * CAST(l.l_quantity AS DECIMAL(18,2)))
                    AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part     p ON p.p_partkey    = l.l_partkey
        JOIN supplier s ON s.s_suppkey    = l.l_suppkey
        JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%gear%'
        GROUP BY 1, 2
    """,
    tags=("join", "agg", "tpch"),
)
def nation_product_profit(spark, sf_dir):
    """TPC-H Q9-shape: per-nation, per-year profit on a part-name pattern.
    The driver tables have no partsupp, so supply cost is p_retailprice *
    quantity (same plan shape: fact ⋈ two broadcast dims, grouped on
    derived columns). All money terms are DECIMAL before the SUM."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    supp_nation = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit_term = _revenue() - (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    return (
        l.join(
            p.select("p_partkey", "p_retailprice"),
            l.l_partkey == F.col("p_partkey"),
        )
        .join(supp_nation, l.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            "nation", F.year("l_shipdate").cast("long").alias("ship_year")
        )
        .agg(F.sum(profit_term).cast("double").alias("profit"))
    )


@query(
    "late_shipment_priority",
    oracle="""
        SELECT o.o_orderpriority AS priority,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        GROUP BY 1
    """,
    tags=("join", "agg", "tpch"),
)
def late_shipment_priority(spark, sf_dir):
    """TPC-H Q12-shape: count late shipments split by order priority. The
    tables carry no l_shipmode/commitdate/receiptdate, so "late" is
    shipdate > orderdate + 90 days — same join + CASE-count aggregation
    shape. The join keeps lineitem's shuffle on l_orderkey only."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "promo_revenue_share",
    oracle="""
        SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(28,4))
                        ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(28,4))) AS DOUBLE)
               AS DOUBLE) AS promo_share
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    tags=("join", "agg", "tpch"),
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14-shape: percentage of one month's revenue from PROMO parts.
    Month filter prunes lineitem before the broadcast part join; single
    global aggregate (no shuffle beyond the final 1-row reduce)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _revenue()
    zero = F.lit(0).cast(_REV_DEC)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_share")
        )
    )


@query(
    "brand_small_qty_revenue",
    oracle="""
        WITH part_avg AS (
            SELECT l_partkey, AVG(l_quantity) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(ROUND(
                 CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN part_avg a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < 0.5 * a.avg_qty
    """,
    tags=("join", "agg", "subquery", "window", "tpch"),
)
def brand_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17-shape: revenue from below-half-average-quantity lineitems
    of one brand. The correlated per-part average is a window function over
    the l_partkey shuffle instead of a lineitem self-join — one exchange,
    one scan (at 100 TB a self-join doubles the dominant-fact scan).
    AVG(double of small ints) is exact, so no rounding discipline needed on
    the threshold; the final sum is DECIMAL then ROUND(…,4) on both sides."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    w = Window.partitionBy("l_partkey")
    with_avg = l.select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).withColumn("avg_qty", F.avg("l_quantity").over(w))
    return (
        with_avg.join(
            p.select("p_partkey"),
            with_avg.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@query(
    "disjunctive_part_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "tpch"),
)
def disjunctive_part_revenue(spark, sf_dir):
    """TPC-H Q19-shape: disjunctive mixed-table predicate over a broadcast
    join. The OR spans both sides, so nothing fully pushes below the join —
    the test is that Catalyst still pushes the per-table prefixes (brand
    IN (...) to part's scan, quantity range union to lineitem's) and the
    join stays broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    qty = F.col("l_quantity")
    branch = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & qty.between(1, 11)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & qty.between(10, 20)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & qty.between(20, 30)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "last_shipper_per_order",
    oracle="""
        WITH marked AS (
            SELECT l_suppkey, l_orderkey,
                   MAX(l_shipdate) OVER (PARTITION BY l_orderkey)
                       AS order_last_ship,
                   COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
                       AS n_suppliers,
                   l_shipdate
            FROM lineitem
        )
        SELECT s.s_name AS supp_name,
               COUNT(DISTINCT m.l_orderkey) AS numwait
        FROM marked m
        JOIN orders o  ON o.o_orderkey = m.l_orderkey
        JOIN supplier s ON s.s_suppkey = m.l_suppkey
        WHERE o.o_orderstatus = 'F'
          AND m.n_suppliers >= 2
          AND m.l_shipdate = m.order_last_ship
        GROUP BY 1
        ORDER BY numwait DESC, supp_name
        LIMIT 10
    """,
    tags=("join", "agg", "window", "topk", "tpch"),
)
def last_shipper_per_order(spark, sf_dir):
    """TPC-H Q21-shape: suppliers who were the last to ship in finished
    multi-supplier orders. Q21's EXISTS / NOT EXISTS pair over other
    lineitems of the same order is expressed as two analytic windows over a
    single l_orderkey shuffle (max shipdate + distinct-supplier count) —
    at scale this replaces two lineitem self-joins with one exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    marked = l.select("l_suppkey", "l_orderkey", "l_shipdate").withColumns(
        {
            "order_last_ship": F.max("l_shipdate").over(w),
            "n_suppliers": F.size(
                F.collect_set("l_suppkey").over(w)
            ),
        }
    )
    return (
        marked.filter(
            (F.col("n_suppliers") >= 2)
            & (F.col("l_shipdate") == F.col("order_last_ship"))
        )
        .join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "supp_name")
        .limit(10)
    )
