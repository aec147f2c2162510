"""Driver-oracle gates for the transactional-table family (r13): the
row-level DML path (delete_where / update_where), the conditional
MERGE builder (all four clause groups), the Change Data Feed, and
time travel + RESTORE — each replayed as pure ANSI SQL over the same
parquet input so DuckDB can verdict the END STATE the transactional
machinery produces.

Until this module, the whole tx family (operators/txlog.py,
operators/txmerge.py) was pytest-verified only — no named oracle gate
exercised it (VERDICT r12 noted the same gap for the crawl ops these
gates' siblings closed). Each gate builds a throwaway table under a
fresh temp directory from a DETERMINISTIC projection of ``orders``,
drives the real commit log, and returns the final state as a small
collected aggregate (the temp table is deleted before returning, so
the result frame must not reference it — hence collect + rebuild; the
aggregates are at most a handful of rows).

Money is integer cents end to end (``CAST(ROUND(o_totalprice * 100)
AS BIGINT)`` on both engines) so no float-sum noise can flip the
value hash — the registry's DECIMAL/ROUND discipline."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F

from ..tables import load_table
from .registry import query

#: Shared deterministic projection of orders, both engines. Integer
#: cents; short names keep the clause SQL readable.
_ORDERS_SQL = """
    SELECT o_orderkey AS k, o_orderstatus AS st,
           o_orderpriority AS pri, o_custkey AS ck,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
"""


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )


@query(
    "tx_dml_merge_state",
    oracle=f"""
    WITH o AS ({_ORDERS_SQL}),
    base AS (SELECT * FROM o WHERE NOT (cents < 3000000)),
    upd AS (
        SELECT k, st, pri,
               CASE WHEN pri = '1-URGENT' THEN ck + 1000000 ELSE ck END
                   AS ck,
               cents
        FROM base
    ),
    src AS (
        SELECT k, st, pri, ck, 2 * cents AS cents
        FROM o WHERE k % 5 = 0
    ),
    classified AS (
        SELECT u.k, u.st, u.pri,
               CASE WHEN s.k IS NULL AND u.pri = '5-LOW'
                    THEN u.ck + 5 ELSE u.ck END AS ck,
               CASE WHEN s.k IS NOT NULL AND s.cents > 40000000
                    THEN u.cents + s.cents ELSE u.cents END AS cents,
               CASE WHEN s.k IS NOT NULL
                         AND NOT (s.cents > 40000000)
                         AND u.pri = '2-HIGH'
                    THEN 1 ELSE 0 END AS deleted
        FROM upd u LEFT JOIN src s ON u.k = s.k
    ),
    kept AS (
        SELECT k, st, pri, ck, cents FROM classified WHERE deleted = 0
    ),
    ins AS (
        SELECT s.k, s.st, s.pri, s.ck, s.cents
        FROM src s LEFT JOIN upd u ON s.k = u.k
        WHERE u.k IS NULL AND s.cents > 5000000
    ),
    final AS (
        SELECT * FROM kept UNION ALL SELECT * FROM ins
    )
    SELECT st AS o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(SUM(ck) AS BIGINT) AS cust_sum
    FROM final GROUP BY st ORDER BY st
    """,
    tags=("tx", "dml", "merge", "extension"),
)
def tx_dml_merge_state(spark, sf_dir):
    """Row-level DELETE + UPDATE + a four-clause conditional MERGE
    (matched update / matched delete / insert / not-matched-by-source
    update), end state aggregated per partition value.

    The oracle replays the same edits as CTEs: the delete is a filter,
    the update a CASE, the merge a LEFT JOIN against the deduplicated
    source with the clause cascade as nested CASE arms, and the
    insert branch the source rows whose key the delete removed. Every
    partition is touched (the by-source clause reaches all of them),
    so this also walks merge_into's full rewrite path."""
    from ..operators.txlog import TxTable

    o = _orders(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="txgate_dml_")
    try:
        t = TxTable.create(
            spark, os.path.join(tmp, "t"), o, partition_by=["st"]
        )
        t.delete_where("cents < 3000000")
        t.update_where("pri = '1-URGENT'", {"ck": "ck + 1000000"})
        src = o.filter(F.col("k") % 5 == 0).withColumn(
            "cents", F.col("cents") * 2
        )
        (
            t.merge(src, ["k"])
            .when_matched_update(
                {"cents": "t.cents + s.cents"},
                condition="s.cents > 40000000",
            )
            .when_matched_delete(condition="t.pri = '2-HIGH'")
            .when_not_matched_insert(condition="s.cents > 5000000")
            .when_not_matched_by_source_update(
                {"ck": "t.ck + 5"}, condition="t.pri = '5-LOW'"
            )
            .execute()
        )
        rows = (
            t.read()
            .groupBy("st")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("cents").alias("cents_sum"),
                F.sum("ck").alias("cust_sum"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(
        [(r["st"], r["n_rows"], r["cents_sum"], r["cust_sum"])
         for r in rows],
        "o_orderstatus string, n_rows bigint, cents_sum bigint, "
        "cust_sum bigint",
    )
    return out.orderBy("o_orderstatus")


@query(
    "tx_cdf_change_counts",
    oracle=f"""
    WITH o AS ({_ORDERS_SQL}),
    s0 AS (SELECT * FROM o WHERE k % 3 = 0),
    a1 AS (SELECT * FROM o WHERE k % 3 = 1),
    st1 AS (SELECT * FROM s0 UNION ALL SELECT * FROM a1),
    d2 AS (SELECT * FROM st1 WHERE cents < 5000000),
    st2 AS (SELECT * FROM st1 WHERE NOT (cents < 5000000)),
    u3 AS (SELECT * FROM st2 WHERE pri = '1-URGENT'),
    ch AS (
        SELECT 'insert' AS change_type, 1 AS commit_version, k FROM a1
        UNION ALL SELECT 'delete', 2, k FROM d2
        UNION ALL SELECT 'update_preimage', 3, k FROM u3
        UNION ALL SELECT 'update_postimage', 3, k FROM u3
    )
    SELECT change_type, CAST(commit_version AS BIGINT) AS commit_version,
           COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
    FROM ch GROUP BY change_type, commit_version
    ORDER BY commit_version, change_type
    """,
    tags=("tx", "cdf", "streaming", "extension"),
)
def tx_cdf_change_counts(spark, sf_dir):
    """Change Data Feed row accounting across an append, a row-level
    DELETE and a row-level UPDATE: per (change type, commit version),
    the row count and key checksum table_changes() reports must equal
    the change rows the oracle derives by replaying the edits on the
    raw input (insert rows from the append, delete rows from the
    matching slice, pre+post image pairs from the update)."""
    from ..operators.txlog import TxTable

    o = _orders(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="txgate_cdf_")
    try:
        t = TxTable.create(
            spark,
            os.path.join(tmp, "t"),
            o.filter(F.col("k") % 3 == 0),
            partition_by=["st"],
            configuration={"enableChangeDataFeed": "true"},
        )
        t.append(o.filter(F.col("k") % 3 == 1))
        t.delete_where("cents < 5000000")
        t.update_where("pri = '1-URGENT'", {"ck": "ck + 7"})
        rows = (
            t.table_changes(0, 3)
            .groupBy("_change_type", "_commit_version")
            .agg(F.count("*").alias("n"), F.sum("k").alias("key_sum"))
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(
        [(r["_change_type"], int(r["_commit_version"]), r["n"],
          r["key_sum"]) for r in rows],
        "change_type string, commit_version bigint, n bigint, "
        "key_sum bigint",
    )
    return out.orderBy("commit_version", "change_type")


@query(
    "tx_time_travel_counts",
    oracle=f"""
    WITH o AS ({_ORDERS_SQL}),
    s0 AS (SELECT * FROM o WHERE k % 2 = 0),
    a1 AS (SELECT * FROM o WHERE k % 2 = 1 AND k % 7 = 0),
    v1 AS (SELECT * FROM s0 UNION ALL SELECT * FROM a1),
    v2 AS (SELECT * FROM v1 WHERE NOT (cents < 5000000)),
    versions AS (
        SELECT CAST(0 AS BIGINT) AS version, k, cents FROM s0
        UNION ALL SELECT 1, k, cents FROM v1
        UNION ALL SELECT 2, k, cents FROM v2
        UNION ALL SELECT 3, k, cents FROM v1
    )
    SELECT version, COUNT(*) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM versions GROUP BY version ORDER BY version
    """,
    tags=("tx", "time-travel", "extension"),
)
def tx_time_travel_counts(spark, sf_dir):
    """Snapshot isolation + RESTORE: read_version() over the whole
    history of a create → append → delete → restore(1) table. The
    restore commit (version 3) must reproduce version 1's rows
    exactly — rollback is a NEW commit, so versions 0-2 stay
    readable unchanged."""
    from ..operators.txlog import TxTable

    o = _orders(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="txgate_tt_")
    try:
        t = TxTable.create(
            spark,
            os.path.join(tmp, "t"),
            o.filter(F.col("k") % 2 == 0),
            partition_by=["st"],
        )
        t.append(o.filter((F.col("k") % 2 == 1) & (F.col("k") % 7 == 0)))
        t.delete_where("cents < 5000000")
        t.restore(1)
        # One job for the whole history (r14, guide §1.2/§2.6): the four
        # snapshot reads are independent, so aggregate each version in
        # the SAME plan (a union of single-row aggregates) instead of
        # four sequential collect()s — the scans run concurrently and
        # back-fill each other's stragglers. A union of per-version
        # GLOBAL aggregates, not a groupBy over a tagged union: an
        # empty snapshot must still yield its (v, 0, NULL) row, exactly
        # like the sequential form did.
        per_version = [
            t.read_version(v)
            .agg(
                F.count("*").alias("n"),
                F.sum("cents").alias("cents_sum"),
            )
            .select(
                F.lit(v).cast("long").alias("version"), "n", "cents_sum"
            )
            for v in range(4)
        ]
        hist = per_version[0]
        for p in per_version[1:]:
            hist = hist.unionByName(p)
        rows = [
            (r["version"], r["n"], r["cents_sum"])
            for r in sorted(hist.collect(), key=lambda r: r["version"])
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(
        rows, "version bigint, n bigint, cents_sum bigint"
    )
    return out.orderBy("version")


@query(
    "tx_generated_dml_state",
    oracle=f"""
    WITH o AS ({_ORDERS_SQL}),
    upd AS (
        SELECT k, pri, ck,
               CASE WHEN pri = '1-URGENT' THEN cents + 13
                    ELSE cents END AS cents
        FROM o
    ),
    final AS (
        SELECT k, cents,
               'p' || CAST(k % 4 AS VARCHAR) AS bucket,
               cents % 97 AS centmod
        FROM upd
    )
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum,
           CAST(SUM(centmod) AS BIGINT) AS centmod_sum
    FROM final GROUP BY bucket ORDER BY bucket
    """,
    tags=("tx", "generated", "dml", "extension"),
)
def tx_generated_dml_state(spark, sf_dir):
    """Generated columns end to end (r13): a table whose PARTITION
    column (``bucket``) and a data column (``centmod``) are generated
    — create computes them on the seed rows, append computes them on a
    batch that omits them, and a row-level UPDATE to the base column
    RECOMPUTES the derivation. The oracle replays the derivation and
    the update as plain expressions; agreement proves compute-at-write
    and recompute-under-DML both match the declared expressions."""
    from ..operators.txlog import TxTable

    o = _orders(spark, sf_dir).select("k", "pri", "ck", "cents")
    tmp = tempfile.mkdtemp(prefix="txgate_gen_")
    try:
        t = TxTable.create(
            spark,
            os.path.join(tmp, "t"),
            o.filter(F.col("k") % 2 == 0),
            partition_by=["bucket"],
            configuration={
                "generated.bucket": "concat('p', k % 4)",
                "generated.centmod": "cents % 97",
            },
        )
        t.append(o.filter(F.col("k") % 2 == 1))
        t.update_where("pri = '1-URGENT'", {"cents": "cents + 13"})
        rows = (
            t.read()
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n"),
                F.sum("cents").alias("cents_sum"),
                F.sum("centmod").alias("centmod_sum"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = spark.createDataFrame(
        [(r["bucket"], r["n"], r["cents_sum"], r["centmod_sum"])
         for r in rows],
        "bucket string, n bigint, cents_sum bigint, centmod_sum bigint",
    )
    return out.orderBy("bucket")
