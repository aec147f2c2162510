"""Additional relational engine surface: correlated/scalar subqueries,
exact percentiles, conditional aggregation, string- and date-function
suites. The reference has none of these (SURVEY §2.7-2.9) — they complete
the "a reference user could run every query here" engine contract, all
Catalyst built-ins, all oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..tables import load_table
from .registry import query


@query(
    "small_quantity_orders",
    oracle="""
        SELECT l.l_partkey AS partkey,
               COUNT(*) AS n_small,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        FROM lineitem l
        JOIN (
            SELECT l_partkey, AVG(l_quantity) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        ) a ON a.l_partkey = l.l_partkey
        WHERE l.l_quantity < 0.5 * a.avg_qty
        GROUP BY l.l_partkey
    """,
    tags=("subquery", "join", "tpch"),
)
def small_quantity_orders(spark, sf_dir):
    """TPC-H Q17-shape: per-part average-quantity scalar subquery driving a
    fact filter. The aggregated side is one row PER PART — SF-linear, so
    no broadcast hint (r6 hint policy, SCALING.md): AQE broadcasts it
    when genuinely small; at 100 TB both sides hash-join on the shared
    l_partkey partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_q = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(avg_q, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count("*").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("small_revenue"),
        )
    )


@query(
    "price_percentiles",
    oracle="""
        SELECT o_orderpriority AS priority,
               quantile_disc(o_totalprice, 0.5) AS median_price,
               quantile_disc(o_totalprice, 0.9) AS p90_price,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile"),
)
def price_percentiles(spark, sf_dir):
    """Exact discrete percentiles per group — values are picked from the
    data (no interpolation), so both engines return identical doubles.
    Spark percentile() with exact semantics ≡ DuckDB quantile_disc.

    Note: approx_percentile/t-digest is the 100 TB path; the exact form is
    the oracle-checkable contract."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "median_price"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p90_price"
        ),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "conditional_aggregation",
    oracle="""
        SELECT c_mktsegment AS segment,
               COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
               COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_negative,
               CAST(SUM(CASE WHEN c_acctbal > 0 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS positive_balance,
               ROUND(AVG(CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0 END), 6) AS frac_positive
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("agg", "conditional"),
)
def conditional_aggregation(spark, sf_dir):
    """FILTER / CASE-guarded aggregation — one pass, no self-joins."""
    c = load_table(spark, sf_dir, "customer")
    pos = F.when(F.col("c_acctbal") > 0, F.col("c_acctbal").cast("decimal(18,2)")).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("n_rich"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        F.sum(pos).cast("double").alias("positive_balance"),
        F.round(
            F.avg(F.when(F.col("c_acctbal") > 0, 1.0).otherwise(0.0)), 6
        ).alias("frac_positive"),
    )


@query(
    "string_function_suite",
    oracle="""
        SELECT p_partkey AS partkey,
               upper(p_name) AS name_upper,
               substr(p_name, 1, 8) AS name_prefix,
               replace(p_type, ' ', '_') AS type_underscored,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               length(p_name) AS name_len,
               contains(p_type, 'BRASS') AS is_brass,
               split_part(p_type, ' ', 1) AS type_first_word
        FROM part
        ORDER BY p_partkey
        LIMIT 1000
    """,
    tags=("string", "projection"),
)
def string_function_suite(spark, sf_dir):
    """String scalar surface: case, substring, replace, pad, predicates,
    split_part — the building blocks of F-4/F-7/F-8-style derivations on
    arbitrary columns."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            F.col("p_partkey").alias("partkey"),
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias(
                "type_underscored"
            ),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.col("p_type").contains("BRASS").alias("is_brass"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias(
                "type_first_word"
            ),
        )
        .orderBy("partkey")
        .limit(1000)
    )


@query(
    "date_function_suite",
    oracle="""
        SELECT o_orderkey AS orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
               datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_cutoff,
               year(o_orderdate) AS order_year,
               quarter(o_orderdate) AS order_quarter,
               dayofmonth(o_orderdate) AS order_dom,
               weekofyear(o_orderdate) AS order_week
        FROM orders
        ORDER BY o_orderkey
        LIMIT 2000
    """,
    tags=("date", "projection"),
)
def date_function_suite(spark, sf_dir):
    """Date/time scalar surface: trunc, last_day, diffs, parts, formatting
    (the F-3/F-13/F-16 building blocks)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("orderkey"),
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
            F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).cast("bigint").alias(
                "days_to_cutoff"
            ),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("order_dom"),
            F.weekofyear("o_orderdate").cast("bigint").alias("order_week"),
        )
        .orderBy("orderkey")
        .limit(2000)
    )


@query(
    "cube_lineitem_status",
    oracle="""
        SELECT l_returnflag AS returnflag,
               l_linestatus AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def cube_lineitem_status(spark, sf_dir):
    """CUBE grouping sets: all 2^2 grouping combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
            "total_qty"
        ),
    )


@query(
    "cheapest_supplier_per_part",
    oracle="""
        SELECT p.p_partkey AS partkey,
               s.s_suppkey AS suppkey,
               li.l_extendedprice AS price
        FROM part p
        JOIN lineitem li ON li.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = li.l_suppkey
        WHERE p.p_size > 45
          AND li.l_extendedprice = (
              SELECT MIN(l2.l_extendedprice) FROM lineitem l2
              WHERE l2.l_partkey = p.p_partkey
          )
    """,
    tags=("subquery", "correlated", "tpch"),
)
def cheapest_supplier_per_part(spark, sf_dir):
    """TPC-H Q2-shape: correlated MIN subquery selecting the cheapest
    supply row per part. Planned as an aggregated self-join on partkey —
    part, the per-part MIN aggregate, and supplier are all SF-linear, so
    none carries a broadcast hint (r6 hint policy, SCALING.md); the
    partkey sides share one hash partitioning and AQE broadcasts any
    side that is genuinely small at runtime."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    min_price = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(min_price, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("s_suppkey").alias("suppkey"),
            F.col("l_extendedprice").alias("price"),
        )
    )


@query(
    "orders_in_top_segments",
    oracle="""
        SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        )
        AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    tags=("subquery", "semi"),
)
def orders_in_top_segments(spark, sf_dir):
    """IN-subquery (semi join) + uncorrelated scalar subquery (broadcast
    1-row relation) in one query. The semi-join side is filtered
    customer — SF-linear, no hint (r6 hint policy); the scalar keeps its
    hint (provably 1 row)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    avg_price = o.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_semi")
        .join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


_ZBITS = 8
_ZMAX = (1 << _ZBITS) - 1


def _z_interleave_sql(xcol: str, ycol: str) -> str:
    """The Morton bit-interleave as ANSI-SQL bit arithmetic — generated to
    mirror operators/layout.py::zorder_key term for term."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "zorder_curve",
    oracle=f"""
        WITH src AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
            FROM lineitem WHERE l_orderkey <= 10000
        ),
        rng AS (
            SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
                   MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
            FROM src
        ),
        scaled AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   CAST(FLOOR((l_partkey - pmin) * {_ZMAX}
                              / GREATEST(1, pmax - pmin)) AS BIGINT) AS sx,
                   CAST(FLOOR((l_suppkey - smin) * {_ZMAX}
                              / GREATEST(1, smax - smin)) AS BIGINT) AS sy
            FROM src, rng
        )
        SELECT l_orderkey AS orderkey,
               l_linenumber AS linenumber,
               l_partkey AS partkey,
               l_suppkey AS suppkey,
               ({_z_interleave_sql("sx", "sy")}) AS zval
        FROM scaled
    """,
    tags=("layout", "zorder", "extension"),
)
def zorder_curve(spark, sf_dir):
    """Morton (Z-order) curve values over (l_partkey, l_suppkey) — the
    exact key operators/layout.py::zorder_write clusters files by, under
    the cross-engine gate: min-max scaling (int64-exact product, one IEEE
    double division) and the bit interleave replay bit-for-bit in DuckDB.
    Whole-stage-codegen bit arithmetic; the only driver traffic is the
    2-scalars-per-column stats row (column_ranges)."""
    from ..operators.layout import column_ranges, zorder_key

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 10000)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    )
    ranges = column_ranges(li, ["l_partkey", "l_suppkey"])
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
        zorder_key(["l_partkey", "l_suppkey"], ranges, _ZBITS).alias("zval"),
    )


_N_BINS = 10


@query(
    "equi_depth_price_bins",
    oracle=f"""
        WITH r AS (
            SELECT l_extendedprice,
                   row_number() OVER (
                       ORDER BY l_extendedprice,
                                l_orderkey * 100 + l_linenumber) AS rn
            FROM lineitem
        ),
        n AS (SELECT COUNT(*)::BIGINT AS n_rows FROM lineitem)
        SELECT ((rn - 1) * {_N_BINS} // n.n_rows)::INT AS bin,
               COUNT(*)::BIGINT AS n_in_bin,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               (SUM(CAST(l_extendedprice AS DECIMAL(18,4))))::DOUBLE
                   AS sum_price
        FROM r CROSS JOIN n
        GROUP BY 1
    """,
    tags=("binning", "quantile", "rank", "extension"),
)
def equi_depth_price_bins(spark, sf_dir):
    """Equal-frequency price deciles over lineitem
    (operators/pipeline.py::equi_depth_bins): rows ranked by
    (price, line identity) through the scalable global-rank pattern —
    range repartition + broadcast per-partition offsets, no
    single-partition sort — and dealt into 10 bins whose populations
    differ by at most one row. Per-bin bounds expose the quantile cut
    points; the DECIMAL-exact sum keeps the hash gate order-insensitive.
    The oracle's plain row_number certifies the parallel rank."""
    from ..operators import pipeline as P

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("__tb"),
    )
    binned = P.equi_depth_bins(
        li, "l_extendedprice", "__tb", _N_BINS, bin_col="bin"
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_in_bin"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "pareto_price_size_parts",
    oracle="""
        SELECT r.p_brand, r.p_partkey, r.p_retailprice, r.p_size
        FROM part r
        WHERE NOT EXISTS (
            SELECT 1 FROM part s
            WHERE s.p_brand = r.p_brand
              AND s.p_retailprice <= r.p_retailprice
              AND s.p_size >= r.p_size
              AND (s.p_retailprice < r.p_retailprice
                   OR s.p_size > r.p_size)
        )
    """,
    tags=("skyline", "pareto", "multi-objective", "extension"),
)
def pareto_price_size_parts(spark, sf_dir):
    """Per-brand Pareto frontier of the part catalog — cheapest-for-
    their-size parts under strict dominance (minimize p_retailprice,
    maximize p_size): operators/skyline.py::skyline_2d, two aggregates +
    one PARTITIONED sweep window instead of the quadratic NOT EXISTS
    scan. The oracle IS that quadratic scan — a semantically independent
    algorithm — so the gate certifies the sweep formulation (same-cost
    dominance, strict-tie losses, co-located duplicates kept) against
    first-principles dominance, per group."""
    from ..operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(
        part, "p_retailprice", "p_size", group_cols=("p_brand",)
    ).select("p_brand", "p_partkey", "p_retailprice", "p_size")


@query(
    "qty_price_regression_stats",
    oracle="""
        WITH u AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS xi,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yi
            FROM lineitem
        ),
        partials AS (
            SELECT l_returnflag,
                   COUNT(*)::BIGINT AS n,
                   SUM(CAST(xi AS DECIMAL(38,0)))::DOUBLE AS sx,
                   SUM(CAST(yi AS DECIMAL(38,0)))::DOUBLE AS sy,
                   SUM(CAST(xi * xi AS DECIMAL(38,0)))::DOUBLE AS sxx,
                   SUM(CAST(xi * yi AS DECIMAL(38,0)))::DOUBLE AS sxy,
                   SUM(CAST(yi * yi AS DECIMAL(38,0)))::DOUBLE AS syy
            FROM u GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               ROUND((n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                     6) AS corr_qty_price,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100,
                     6) AS slope_price_per_qty,
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n / 100, 6) AS intercept_price
        FROM partials
    """,
    tags=("statistics", "regression", "correlation", "agg", "extension"),
)
def qty_price_regression_stats(spark, sf_dir):
    """Per-returnflag Pearson correlation and OLS regression of price on
    quantity — the corr/regr_slope/regr_intercept engine surface, made
    hash-gate-exact: engine-native corr() accumulates FLOATS in shuffle
    order, so instead values quantize to integer units (quantities are
    integral, prices to cents), the five sufficient statistics
    (Σx, Σy, Σx², Σxy, Σy²) accumulate as DECIMAL(38,0) — exact,
    order-insensitive — and the closed-form stats derive per group from
    one fixed double expression chain. The /100 folds the cent scaling
    back to currency units."""
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("xi"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("yi"),
    )
    d38 = "decimal(38,0)"
    partials = u.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xi").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("yi").cast(d38)).cast("double").alias("sy"),
        F.sum((F.col("xi") * F.col("xi")).cast(d38)).cast("double").alias("sxx"),
        F.sum((F.col("xi") * F.col("yi")).cast(d38)).cast("double").alias("sxy"),
        F.sum((F.col("yi") * F.col("yi")).cast(d38)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov_n = n * sxy - sx * sy
    var_x_n = n * sxx - sx * sx
    var_y_n = n * syy - sy * sy
    slope = cov_n / var_x_n
    return partials.select(
        "l_returnflag",
        "n",
        F.round(cov_n / F.sqrt(var_x_n * var_y_n), 6).alias(
            "corr_qty_price"
        ),
        F.round(slope / 100, 6).alias("slope_price_per_qty"),
        F.round((sy - slope * sx) / n / 100, 6).alias("intercept_price"),
    )


@query(
    "returnflag_status_chisq",
    oracle="""
        WITH cells AS (
            SELECT l_returnflag AS f, l_linestatus AS s,
                   COUNT(*)::BIGINT AS o
            FROM lineitem GROUP BY 1, 2
        ),
        rt AS (SELECT f, SUM(o)::BIGINT AS r FROM cells GROUP BY f),
        ct AS (SELECT s, SUM(o)::BIGINT AS c FROM cells GROUP BY s),
        n AS (SELECT SUM(o)::BIGINT AS n FROM cells),
        j AS (
            SELECT cells.f, cells.s, cells.o,
                   (rt.r * ct.c)::DOUBLE / n.n AS e
            FROM cells JOIN rt USING (f) JOIN ct USING (s) CROSS JOIN n
        ),
        pc AS (
            SELECT f, s, o,
                   ROUND(e, 6) AS expected,
                   ROUND((o - e) * (o - e) / e, 6) AS contrib
            FROM j
        ),
        tot AS (
            SELECT ROUND(list_reduce(list(contrib ORDER BY f, s),
                                     (a, b) -> a + b), 6) AS chi2_total,
                   (COUNT(DISTINCT f) - 1) * (COUNT(DISTINCT s) - 1) AS dof
            FROM pc
        )
        SELECT pc.f AS l_returnflag, pc.s AS l_linestatus,
               pc.o AS observed, pc.expected, pc.contrib,
               tot.chi2_total, tot.dof
        FROM pc CROSS JOIN tot
    """,
    tags=("statistics", "chi-square", "contingency", "agg", "extension"),
)
def returnflag_status_chisq(spark, sf_dir):
    """Chi-square test of independence over the returnflag × linestatus
    contingency table: per-cell observed/expected/contribution plus the
    total statistic and degrees of freedom. All counts are integers;
    expected values and contributions are one fixed double chain per
    cell; and the TOTAL — a float sum over cells — is computed as a
    SEQUENTIAL fold over the (flag, status)-sorted contribution array on
    both engines (Spark aggregate() HOF ≡ DuckDB list_reduce), the
    discipline that makes a float reduction hash-gateable: fixed order,
    not shuffle order."""
    li = load_table(spark, sf_dir, "lineitem")
    # r13 (guide §3.3): the contingency table is flags×statuses rows
    # (single digits) but was re-derived — a full lineitem scan each —
    # by rt, ct, n, the per-cell join base and the total (the broadcast
    # sides materialize in separate jobs, so runtime exchange reuse does
    # not cover them; measured 4 source scans per run). Pin it once.
    cells = li.groupBy(
        F.col("l_returnflag").alias("f"), F.col("l_linestatus").alias("s")
    ).agg(F.count(F.lit(1)).alias("o")).localCheckpoint(eager=False)
    rt = cells.groupBy("f").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("s").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    pc = (
        cells.join(F.broadcast(rt), "f")
        .join(F.broadcast(ct), "s")
        .crossJoin(F.broadcast(n))
        .select(
            "f",
            "s",
            "o",
            F.round(e, 6).alias("expected"),
            F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).alias(
                "contrib"
            ),
        )
    )
    tot = pc.agg(
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("f", "s", "contrib"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ),
            6,
        ).alias("chi2_total"),
        (
            (F.count_distinct("f") - 1) * (F.count_distinct("s") - 1)
        ).alias("dof"),
    )
    return pc.crossJoin(F.broadcast(tot)).select(
        F.col("f").alias("l_returnflag"),
        F.col("s").alias("l_linestatus"),
        F.col("o").alias("observed"),
        "expected",
        "contrib",
        "chi2_total",
        "dof",
    )


@query(
    "price_mad_by_flag",
    oracle="""
        WITH med AS (
            SELECT l_returnflag,
                   quantile_disc(l_extendedprice, 0.5) AS median_price
            FROM lineitem GROUP BY 1
        ),
        dev AS (
            SELECT l.l_returnflag, m.median_price,
                   ABS(l.l_extendedprice - m.median_price) AS d
            FROM lineitem l JOIN med m USING (l_returnflag)
        )
        SELECT l_returnflag, median_price,
               COUNT(*)::BIGINT AS n,
               quantile_disc(d, 0.5) AS mad
        FROM dev GROUP BY 1, 2
    """,
    tags=("statistics", "robust", "percentile", "agg", "extension"),
)
def price_mad_by_flag(spark, sf_dir):
    """Median absolute deviation per returnflag — the robust dispersion
    statistic (outlier-insensitive where stddev is not): two exact
    discrete-percentile passes (median, then median of |x − median|)
    sharing the group partitioning, with a broadcast median join between
    them. Discrete percentiles pick actual data values, and the
    deviations are single float subtractions of identical operands — so
    the whole two-stage statistic is hash-gate exact, no rounding
    needed."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("median_price")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "median_price",
        F.abs(F.col("l_extendedprice") - F.col("median_price")).alias("d"),
    )
    return dev.groupBy("l_returnflag", "median_price").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY d)").alias("mad"),
    )


@query(
    "customer_rfm_scores",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   date_diff('day', DATE '1990-01-01',
                             CAST(MAX(o_orderdate) AS DATE))::BIGINT
                       AS recency_days,
                   COUNT(*)::BIGINT AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        n AS (SELECT COUNT(*)::BIGINT AS n FROM cust),
        r AS (
            SELECT c.*,
                   row_number() OVER (ORDER BY recency_days, o_custkey) AS rr,
                   row_number() OVER (ORDER BY frequency, o_custkey) AS fr,
                   row_number() OVER (ORDER BY monetary, o_custkey) AS mr
            FROM cust c
        )
        SELECT o_custkey, recency_days, frequency,
               monetary::DOUBLE AS monetary,
               ((rr - 1) * 5 // n.n + 1)::INT AS r_score,
               ((fr - 1) * 5 // n.n + 1)::INT AS f_score,
               ((mr - 1) * 5 // n.n + 1)::INT AS m_score
        FROM r CROSS JOIN n
    """,
    tags=("rfm", "segmentation", "rank", "analytics", "extension"),
)
def customer_rfm_scores(spark, sf_dir):
    """RFM customer segmentation: recency (days since epoch anchor of
    the last order), frequency (order count), monetary (DECIMAL-exact
    lifetime spend), each scored into quintiles 1-5 by equi-depth
    ranking (operators/pipeline.py::equi_depth_bins — the scalable
    global rank, three times, no single-partition sort). Higher = more
    recent / more frequent / bigger spender; the marketing-analytics
    staple built entirely from gated kernels."""
    from ..operators import pipeline as P

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.max("o_orderdate")), F.lit("1990-01-01").cast("date")
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    ).localCheckpoint(eager=False)
    # r13 (guide §3.3): cust (customer-sized, far smaller than orders)
    # was re-derived — a full orders scan each — by the eager quantile
    # sampling job, the scored base, and each of the three bin
    # relations (measured 6 source scans per run); the pin leaves ONE.
    # FLAT composition: each metric ranks a slim 2-column projection of
    # the base and joins its (custkey, score) relation back. Chaining
    # equi_depth_bins sequentially instead would nest each rank's
    # multi-pass evaluation inside the next one's (boundary-literal
    # global_rank reads its input ~3×), re-executing the base tree
    # O(3^k) times — measured 4.3 s vs 1.3 s at sf0.01. The identical
    # base subtrees inside the one final query dedupe via exchange
    # reuse; the per-rank quantile sampling passes touch only the slim
    # projection.
    # one sampling pass for all three metrics' bucket boundaries
    probs = [i / 32 for i in range(1, 32)]
    b_r, b_f, b_m = cust.select(
        F.col("recency_days").cast("double").alias("r"),
        F.col("frequency").cast("double").alias("f"),
        F.col("monetary").cast("double").alias("m"),
    ).approxQuantile(["r", "f", "m"], probs, 0.01)
    scored = cust
    for metric, out, bounds in (
        ("recency_days", "r_score", b_r),
        ("frequency", "f_score", b_f),
        ("monetary", "m_score", b_m),
    ):
        bins = P.equi_depth_bins(
            cust.select("o_custkey", metric), metric, "o_custkey", 5,
            bin_col=out, bounds=sorted({b for b in bounds if b == b}),
        ).select("o_custkey", ((F.col(out) + 1).cast("int")).alias(out))
        scored = scored.join(bins, "o_custkey")
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
    )
