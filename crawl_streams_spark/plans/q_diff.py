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


_DUCK_SCD_SNAPS = """
    snaps AS (
        SELECT 1::BIGINT AS version, o_orderkey, o_totalprice FROM orders
        UNION ALL
        SELECT 2::BIGINT, o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                    ELSE o_totalprice END
        FROM orders WHERE o_orderkey % 13 <> 3
        UNION ALL
        SELECT 3::BIGINT, o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                    ELSE o_totalprice END
               + CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 0 END
        FROM orders
        WHERE (o_orderkey % 13 <> 3 AND o_orderkey % 11 <> 7)
           OR (o_orderkey % 13 = 3 AND o_orderkey % 3 = 0)
    )
"""


def _scd_snapshots(spark, sf_dir):
    """Three synthetic full snapshots of orders, exercising every SCD2
    path: value changes (%7, %5 price bumps), deletions (%13 at v2,
    %11 at v3), and deletion-then-reappearance (%13 ∧ %3 return in v3
    — must open a NEW run, not extend the v1 run across the gap)."""
    # r13 (guide §3.3): the three synthetic version branches carry
    # different filters, so each evaluation of the union scanned orders
    # three times; pinning the slim 2-column base leaves one source
    # scan per run, the branches read blocks.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).localCheckpoint(eager=False)
    k, p = F.col("o_orderkey"), F.col("o_totalprice")
    v2_price = F.when(k % 7 == 0, p + 1).otherwise(p)
    v1 = orders.select(
        F.lit(1).cast("bigint").alias("version"), k.alias("o_orderkey"),
        p.alias("o_totalprice"),
    )
    v2 = orders.filter(k % 13 != 3).select(
        F.lit(2).cast("bigint").alias("version"), k.alias("o_orderkey"),
        v2_price.alias("o_totalprice"),
    )
    v3 = orders.filter(
        ((k % 13 != 3) & (k % 11 != 7)) | ((k % 13 == 3) & (k % 3 == 0))
    ).select(
        F.lit(3).cast("bigint").alias("version"), k.alias("o_orderkey"),
        (v2_price + F.when(k % 5 == 0, 2).otherwise(0)).alias("o_totalprice"),
    )
    return v1.unionByName(v2).unionByName(v3)


# SCD2 run-compression CTE chain over `snaps` — shared by
# orders_scd2_history and the point-in-time join query.
_DUCK_SCD_HIST_CTES = """
        vers AS (
            SELECT version,
                   dense_rank() OVER (ORDER BY version) AS vi
            FROM (SELECT DISTINCT version FROM snaps)
        ),
        b AS (SELECT s.*, v.vi FROM snaps s JOIN vers v USING (version)),
        flagged AS (
            SELECT *,
                   CASE WHEN lag(o_totalprice) OVER w IS NULL
                         OR lag(o_totalprice) OVER w <> o_totalprice
                         OR lag(vi) OVER w + 1 <> vi
                        THEN 1 ELSE 0 END AS chg
            FROM b WINDOW w AS (PARTITION BY o_orderkey ORDER BY vi)
        ),
        runs AS (
            SELECT *,
                   SUM(chg) OVER (PARTITION BY o_orderkey ORDER BY vi
                                  ROWS UNBOUNDED PRECEDING)::BIGINT AS run
            FROM flagged
        ),
        grouped AS (
            SELECT o_orderkey, run,
                   MIN(version) AS valid_from,
                   MAX(vi) AS mx,
                   MIN(o_totalprice) AS o_totalprice
            FROM runs GROUP BY o_orderkey, run
        ),
        hist AS (
            SELECT g.o_orderkey,
                   g.o_totalprice,
                   g.valid_from,
                   v.version AS valid_to,
                   (v.version IS NULL) AS is_current
            FROM grouped g
            LEFT JOIN vers v ON v.vi = g.mx + 1
        )
"""


@query(
    "orders_scd2_history",
    oracle=f"""
        WITH {_DUCK_SCD_SNAPS},
        {_DUCK_SCD_HIST_CTES}
        SELECT o_orderkey, o_totalprice, valid_from, valid_to, is_current
        FROM hist
    """,
    tags=("scd2", "cdc", "history"),
)
def orders_scd2_history(spark, sf_dir):
    """SCD type-2 history compression over three full order snapshots
    (operators/diff.py::scd2_compress): validity runs with half-open
    [valid_from, valid_to) bounds, deletions closing runs at the vanish
    version and reappearances opening fresh runs across the gap. Spark
    detects changes through the staged md5 row digest; the oracle
    compares raw values — agreement certifies the digest kernel on the
    run-segmentation path too."""
    snaps = _scd_snapshots(spark, sf_dir)
    return D.scd2_compress(
        snaps, key_cols=["o_orderkey"], version_col="version"
    )


@query(
    "lineitem_price_asof_scd2",
    oracle=f"""
        WITH {_DUCK_SCD_SNAPS},
        {_DUCK_SCD_HIST_CTES},
        facts AS (
            SELECT l_orderkey AS o_orderkey, l_linenumber,
                   (1 + (l_linenumber % 3))::BIGINT AS asof_version
            FROM lineitem
        )
        SELECT f.o_orderkey, f.l_linenumber, f.asof_version,
               h.o_totalprice AS price_at_version,
               h.valid_from
        FROM facts f
        LEFT JOIN hist h
          ON h.o_orderkey = f.o_orderkey
         AND h.valid_from <= f.asof_version
         AND (h.valid_to IS NULL OR f.asof_version < h.valid_to)
    """,
    tags=("scd2", "point-in-time", "interval-join", "cdc"),
)
def lineitem_price_asof_scd2(spark, sf_dir):
    """Point-in-time (AS OF) join of a fact table against SCD2 history:
    each lineitem carries an as-of version stamp and looks up the order
    price that was valid THEN — the reproducible-feature/backtest join a
    warehouse runs against type-2 dimensions. Composition of two gated
    kernels: diff.scd2_compress builds the validity runs and
    interval.point_in_interval_join matches stamps into [valid_from,
    valid_to) co-keyed on the business key — an equi-join on
    (key, bucket), never a BroadcastNestedLoop range join. Facts whose
    stamp falls in a DELETION GAP surface with a null price (the join's
    LEFT form), which is exactly the semantics that distinguishes SCD2
    from a naive last-value lookup."""
    from ..operators import diff as D
    from ..operators import interval as IV

    snaps = _scd_snapshots(spark, sf_dir)
    hist = D.scd2_compress(
        snaps, key_cols=["o_orderkey"], version_col="version"
    )
    max_v = 3  # three synthetic snapshots (versions 1..3)
    intervals = hist.select(
        "o_orderkey",
        F.col("o_totalprice").alias("price_at_version"),
        "valid_from",
        # closed-interval form for the bucketed join: [from, to-1],
        # open runs extend to the last version
        F.coalesce(F.col("valid_to") - 1, F.lit(max_v)).alias("valid_until"),
    )
    facts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        (1 + (F.col("l_linenumber") % 3)).cast("bigint").alias("asof_version"),
    )
    # one LEFT bucketed interval join (r13): every fact row independently
    # finds its ≤1 containing validity run (runs per key are disjoint),
    # and gap facts keep null interval columns — identical rows to the
    # former dropDuplicates + inner join + left join-back chain, minus
    # its three SF-linear exchanges (the dedup and the two join-back
    # sides; measured 6.8 → 4.6 s fresh-process at sf0.1, 10 stages → 8)
    return IV.point_in_interval_join(
        facts,
        intervals,
        point_col="asof_version",
        start_col="valid_from",
        end_col="valid_until",
        width=1,
        keys=("o_orderkey",),
        how="left",
    ).select(
        "o_orderkey",
        "l_linenumber",
        "asof_version",
        "price_at_version",
        "valid_from",
    )


@query(
    "orders_scd2_incremental",
    oracle=f"""
        WITH {_DUCK_SCD_SNAPS},
        {_DUCK_SCD_HIST_CTES}
        SELECT o_orderkey, o_totalprice, valid_from, valid_to, is_current
        FROM hist
    """,
    tags=("scd2", "cdc", "merge", "incremental", "extension"),
)
def orders_scd2_incremental(spark, sf_dir):
    """Incremental SCD2 maintenance (operators/diff.py::scd2_merge):
    compress versions 1-2 into a history, then MERGE version 3 as a new
    full snapshot — close changed/vanished runs at v3, keep unchanged
    runs open, open fresh runs for new values and reappearances. The
    oracle recomputes the history from the FULL three-version stack
    (the exact SQL behind orders_scd2_history), so a hash match proves
    the incremental merge path equals the batch recompute — the
    maintained-table contract. The merge shuffles only the current
    slice + the snapshot on the business key; closed rows never move."""
    snaps = _scd_snapshots(spark, sf_dir)
    hist12 = D.scd2_compress(
        snaps.filter(F.col("version") <= 2),
        key_cols=["o_orderkey"],
        version_col="version",
    )
    v3 = snaps.filter(F.col("version") == 3).drop("version")
    return D.scd2_merge(
        hist12, v3, new_version=3, key_cols=["o_orderkey"],
        single_pass=True,
    )
