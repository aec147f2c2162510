"""Advanced join shapes the engine must support at 100 TB: nested
semi-joins (TPC-H Q20), global-fraction HAVING (Q11), anti-join with a
scalar threshold (Q22), and the two time-series joins Spark has no
primitive for — **as-of join** and **range join** — implemented as
scalable compositions (one shuffle, no O(n^2) explosion).

The reference implements no joins (SURVEY.md §2.7 — closest constructs are
intra-row column comparisons, analysis.py:136-138); this module is engine
surface mandated by the driver contract.

Scale notes:
- as-of join = union-tag + window last-non-null: a single shuffle on
  (user_id) and a sort within partitions; never materializes candidate
  pairs. This is the standard large-scale as-of strategy (vs. DuckDB's
  native ASOF JOIN which is a single-node merge).
- range join = equi-join on (key, coarse time bucket) against the bucket
  and its predecessor, then an exact range filter: bounds the per-row
  candidate set to two buckets instead of the whole key group.
- Q20/Q11/Q22: aggregated subquery sides are one-row-per-group and
  broadcast; the fact table is scanned, never re-shuffled on a
  high-cardinality derived key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..tables import load_table
from .registry import query


@query(
    "suppliers_of_bulk_parts",
    oracle="""
        SELECT s.s_suppkey AS suppkey, s.s_name AS name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_size <= 10
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING SUM(l.l_quantity) > 60
        )
    """,
    tags=("join", "semi", "subquery", "tpch"),
)
def suppliers_of_bulk_parts(spark, sf_dir):
    """TPC-H Q20-shape: nested semi-join — suppliers that shipped more than
    a threshold quantity of any small part. The inner aggregate is one row
    per (supplier, part) surviving the HAVING; the outer is a LEFT SEMI
    join so supplier rows are never duplicated. Filtered part and the
    per-(supplier,part) aggregate are both SF-linear — no broadcast
    hints (r6 hint policy, SCALING.md); AQE broadcasts them when small
    and shuffle-joins at 100 TB."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    bulk = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
    )
    return s.join(
        bulk, s.s_suppkey == bulk.l_suppkey, "left_semi"
    ).select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))


@query(
    "important_part_value",
    oracle="""
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
               (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                            AS DOUBLE)
                       / COUNT(DISTINCT l_partkey) * 1.5
                FROM lineitem)
    """,
    tags=("agg", "subquery", "scalar", "tpch"),
)
def important_part_value(spark, sf_dir):
    """TPC-H Q11-shape: groups whose value exceeds a threshold derived from a
    global 1-row aggregate, broadcast into the HAVING filter (no second
    shuffle). Unlike textbook Q11's fixed fraction-of-total (which shrinks
    per-part share as SF grows and empties the result), the threshold is
    1.5x the MEAN per-part value — scale-invariant, so the query is
    non-vacuous at every SF. DECIMAL sums make the threshold bit-exact on
    both engines before the double divide."""
    li = load_table(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(price_dec).cast("double").alias("part_value")
    )
    total = li.agg(
        (
            F.sum(price_dec).cast("double")
            / F.count_distinct(F.col("l_partkey"))
            * 1.5
        ).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
    )


@query(
    "idle_rich_customers",
    oracle="""
        SELECT c.c_custkey AS custkey, c.c_acctbal AS acctbal
        FROM customer c
        WHERE c.c_acctbal >
              (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                           AS DOUBLE) / COUNT(*)
               FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
    """,
    tags=("join", "anti", "subquery", "scalar", "tpch"),
)
def idle_rich_customers(spark, sf_dir):
    """TPC-H Q22-shape: above-average-balance customers with no *finished*
    orders — scalar-subquery threshold + LEFT ANTI join against a filtered
    build side (the driver data gives every customer at least one order, so
    the anti-join must discriminate on status to be non-vacuous). The average
    is computed as exact DECIMAL sum / count so both engines derive the
    identical double threshold (a plain AVG(double) would be
    summation-order-sensitive)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )


@query(
    "asof_last_purchase",
    oracle="""
        SELECT event_id, user_id, ts, last_purchase_ts
        FROM (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                   MAX(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END)
                       OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS last_purchase_ts
            FROM events
            WHERE event_type IN ('click', 'purchase')
        )
        WHERE event_type = 'click'
    """,
    tags=("join", "asof", "window", "timeseries"),
)
def asof_last_purchase(spark, sf_dir):
    """As-of join: each click paired with the same user's most recent
    purchase at-or-before it. Implemented as union-tag + running
    last-non-null over a (user_id)-partitioned window — ONE shuffle, no
    candidate-pair materialization, the scalable strategy for as-of joins
    Spark lacks as a primitive. (DuckDB oracle uses the equivalent
    windowed-MAX formulation, portable ANSI SQL.)"""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", "ts", "event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "last_purchase_ts",
            F.max(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).over(w),
        )
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_ts")
    )


@query(
    "clicks_before_purchase",
    oracle="""
        WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'purchase'),
             c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'click')
        SELECT p.event_id AS purchase_id,
               COUNT(c.ts) AS n_recent_clicks
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.ts > p.ts - INTERVAL 1 HOUR
         AND c.ts <= p.ts
        GROUP BY p.event_id
    """,
    tags=("join", "range", "timeseries"),
)
def clicks_before_purchase(spark, sf_dir):
    """Range join: per purchase, how many clicks the same user made in the
    preceding hour. A naive theta-join is O(|clicks| x |purchases|) per
    user; this plans an EQUI-join on (user_id, hour bucket) with each
    purchase probing its own bucket and the previous one, then applies the
    exact range predicate — per-row candidates bounded to two buckets."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withColumn("p_bucket", F.unix_timestamp("p_ts") / F.lit(3600))
        .withColumn("p_bucket", F.floor("p_bucket"))
        .withColumn(
            "probe_bucket",
            F.explode(F.array(F.col("p_bucket"), F.col("p_bucket") - 1)),
        )
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts")
        )
        .withColumn("c_bucket", F.floor(F.unix_timestamp("c_ts") / F.lit(3600)))
    )
    matched = (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("probe_bucket") == F.col("c_bucket")),
            "inner",
        )
        .filter(
            (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts"))
        )
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id")
    )
    return purchases.join(matched, "purchase_id", "left").select(
        "purchase_id",
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_recent_clicks"),
    )


@query(
    "fuzzy_part_name_pairs",
    oracle="""
        WITH names AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a,
               b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name)::BIGINT AS dist
        FROM names a JOIN names b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    tags=("fuzzy", "similarity-join", "extension"),
)
def fuzzy_part_name_pairs(spark, sf_dir):
    """Edit-distance-≤2 pairs among distinct part names via the q-gram-
    blocked similarity join (operators/fuzzy.py): positional bigram
    blocking + count bound + length filter prune the pair space, exact
    levenshtein verifies survivors. The DuckDB oracle runs the naive
    O(n²) scan — agreement certifies the blocking loses no pairs (the
    q-gram lemma applied correctly, multiset occ semantics included)."""
    from ..operators import fuzzy as FZ

    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("nm"))
        .distinct()
    )
    pairs = FZ.fuzzy_self_join(names, id_col="nm", str_col="nm", k=2, q=2)
    return pairs.select(
        F.col("id_a").alias("name_a"),
        F.col("id_b").alias("name_b"),
        F.col("dist").cast("bigint").alias("dist"),
    )
