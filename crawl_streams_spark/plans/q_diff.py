"""Keyed snapshot diff under the cross-engine gate (operators/diff.py).

Both engines build the same two snapshots of ``orders`` — new drops
keys ≡3 (mod 13), bumps o_totalprice on keys ≡0 (mod 7), and appends
re-keyed copies of keys ≡5 (mod 11) — then classify every key via a
full-outer join. Spark classifies through the staged md5 row digest (the
operator's slim-shuffle path); the oracle compares values directly — the
classifications agree iff the digest detects exactly the value changes,
so the gate certifies the digest kernel behaviorally.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import diff as D
from ..tables import load_table
from .registry import query

_DUCK_DIFF = """
    WITH old AS (SELECT o_orderkey, o_totalprice FROM orders),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 13 <> 3
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice
        FROM orders WHERE o_orderkey % 11 = 5
    ),
    d AS (
        SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    WHEN old.o_totalprice <> new.o_totalprice THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    )
"""


def _snapshots(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_totalprice")
    kept = orders.filter(F.col("o_orderkey") % 13 != 3).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    added = orders.filter(F.col("o_orderkey") % 11 == 5).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"), "o_totalprice"
    )
    return old, kept.unionByName(added)


@query(
    "orders_snapshot_diff",
    oracle=_DUCK_DIFF
    + """
    SELECT o_orderkey, change_type FROM d WHERE change_type <> 'unchanged'
    """,
    tags=("diff", "cdc", "extension"),
)
def orders_snapshot_diff(spark, sf_dir):
    """Every key whose row was added, removed, or value-changed between
    the two snapshots — the CDC/reconciliation primitive. The shuffle
    carries (key, 32-byte digest) only; payload columns never cross the
    exchange."""
    old, new = _snapshots(spark, sf_dir)
    d = D.table_diff(old, new, ["o_orderkey"], ["o_totalprice"])
    return d.filter(F.col("change_type") != "unchanged")


@query(
    "snapshot_diff_summary",
    oracle=_DUCK_DIFF
    + """
    SELECT change_type, count(*) AS n FROM d GROUP BY change_type
    """,
    tags=("diff", "cdc", "extension"),
)
def snapshot_diff_summary(spark, sf_dir):
    """Change-type cardinalities of the same diff (including unchanged)
    — the reconciliation report, certifying the full-outer
    classification is exhaustive and disjoint."""
    old, new = _snapshots(spark, sf_dir)
    return D.diff_summary(D.table_diff(old, new, ["o_orderkey"], ["o_totalprice"]))
