"""Data-quality validation under the cross-engine gate
(operators/validate.py): both engines evaluate the same rule set over
orders — scalar domain/range rules in one aggregate pass plus a
referential check against customer — and must agree on every violation
count. The cap rule is deliberately tight enough to FAIL on real rows,
so the gate certifies non-zero violation accounting, not just the happy
path."""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import validate as V
from ..tables import load_table
from .registry import query


@query(
    "orders_validation_report",
    oracle="""
        WITH base AS (SELECT COUNT(*)::BIGINT AS n FROM orders),
        scalar AS (
            SELECT 'orderdate_in_range' AS rule,
                   COUNT(*) FILTER (WHERE NOT COALESCE(
                       o_orderdate >= TIMESTAMP '1995-01-01'
                       AND o_orderdate <= TIMESTAMP '2001-08-02', FALSE
                   ))::BIGINT AS n_violations
            FROM orders
            UNION ALL
            SELECT 'priority_format',
                   COUNT(*) FILTER (WHERE NOT COALESCE(
                       regexp_matches(o_orderpriority, '^[1-5]-'), FALSE
                   ))::BIGINT
            FROM orders
            UNION ALL
            SELECT 'status_in_domain',
                   COUNT(*) FILTER (WHERE NOT COALESCE(
                       o_orderstatus IN ('O', 'F', 'P'), FALSE
                   ))::BIGINT
            FROM orders
            UNION ALL
            SELECT 'totalprice_below_cap',
                   COUNT(*) FILTER (WHERE NOT COALESCE(
                       o_totalprice < 250000, FALSE
                   ))::BIGINT
            FROM orders
            UNION ALL
            SELECT 'totalprice_positive',
                   COUNT(*) FILTER (WHERE NOT COALESCE(
                       o_totalprice > 0, FALSE
                   ))::BIGINT
            FROM orders
        ),
        ref AS (
            SELECT 'o_custkey_in_c_custkey' AS rule,
                   (SELECT COUNT(*)::BIGINT FROM orders o
                    ANTI JOIN customer c ON o.o_custkey = c.c_custkey
                   ) AS n_violations
        ),
        v AS (SELECT * FROM scalar UNION ALL SELECT * FROM ref)
        SELECT v.rule,
               base.n AS n_rows,
               v.n_violations,
               ROUND(v.n_violations / GREATEST(base.n, 1), 6)
                   AS violation_fraction
        FROM v, base
    """,
    tags=("validation", "data-quality", "extension"),
)
def orders_validation_report(spark, sf_dir):
    """Single-scan rule report over orders + one anti-join referential
    check: (rule, n_rows, n_violations, violation_fraction). Five scalar
    rules ride ONE aggregation (conditional sums, map-side combined —
    rule count never multiplies scans); the FK rule broadcasts the
    customer key set. NULL predicate results count as violations."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    scalar = V.validation_report(
        orders,
        {
            "orderdate_in_range": (
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") <= F.lit("2001-08-02").cast("timestamp"))
            ),
            "priority_format": F.col("o_orderpriority").rlike("^[1-5]-"),
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "totalprice_below_cap": F.col("o_totalprice") < 250000,
            "totalprice_positive": F.col("o_totalprice") > 0,
        },
    )
    ref = V.fk_violations(
        orders, "o_custkey", customer, "c_custkey",
        rule_name="o_custkey_in_c_custkey",
    )
    return V.combined_report(scalar, ref)
