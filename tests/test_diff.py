"""Keyed table diff (operators/diff.py): classification semantics, null
handling in the row digest, and composite keys. Cross-engine value gate:
plans/q_diff.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.operators import diff as D


def _t(spark, rows, schema="k bigint, a string, b bigint"):
    return spark.createDataFrame(rows, schema)


def test_classification_exhaustive(spark):
    old = _t(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _t(spark, [(2, "y", 20), (3, "z", 99), (4, "w", 40)])
    got = {r["k"]: r["change_type"] for r in D.table_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_null_vs_empty_vs_literal_distinct(spark):
    """The digest's sentinel encoding distinguishes NULL, '', and the
    NULL-lookalike string — and a value moving between columns changes
    the digest (separator prevents aliasing)."""
    old = _t(
        spark,
        [(1, None, 1), (2, "", 1), (3, "\x00\x00N", 1), (4, "ab", 1)],
    )
    new = _t(
        spark,
        [(1, "", 1), (2, None, 1), (3, "\x00\x00N", 1), (4, "a", 1)],
    )
    got = {r["k"]: r["change_type"] for r in D.table_diff(old, new, ["k"]).collect()}
    assert got[1] == "changed" and got[2] == "changed"
    assert got[3] == "unchanged"
    assert got[4] == "changed"


def test_compare_cols_subset_ignores_other_columns(spark):
    old = _t(spark, [(1, "x", 10)])
    new = _t(spark, [(1, "DIFFERENT", 10)])
    got = D.table_diff(old, new, ["k"], compare_cols=["b"]).collect()
    assert got[0]["change_type"] == "unchanged"


def test_composite_key(spark):
    schema = "k1 bigint, k2 string, v bigint"
    old = _t(spark, [(1, "a", 1), (1, "b", 2)], schema)
    new = _t(spark, [(1, "a", 5), (2, "a", 1)], schema)
    got = {
        (r["k1"], r["k2"]): r["change_type"]
        for r in D.table_diff(old, new, ["k1", "k2"]).collect()
    }
    assert got == {
        (1, "a"): "changed",
        (1, "b"): "removed",
        (2, "a"): "added",
    }


def test_diff_summary_counts(spark):
    old = _t(spark, [(i, "v", i) for i in range(10)])
    new = _t(
        spark,
        [(i, "v", i if i % 3 else i + 100) for i in range(2, 12)],
    )
    s = {
        r["change_type"]: r["n"]
        for r in D.diff_summary(D.table_diff(old, new, ["k"])).collect()
    }
    # keys 0,1 removed; 10,11 added; of 2..9: multiples of 3 (3,6,9) changed
    # — plus key 2? 2%3=2 unchanged... changed = {3,6,9}; wait i%3==0 -> +100
    assert s["removed"] == 2 and s["added"] == 2
    assert s["changed"] == 3 and s["unchanged"] == 5


def test_shuffle_carries_digest_not_payload(spark):
    """The exchange below the full-outer join projects (key, digest) only
    — payload columns are digested in a narrow map below the join."""
    old = _t(spark, [(1, "x", 10)])
    new = _t(spark, [(1, "x", 10)])
    plan = D.table_diff(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
    # the join's inputs must not carry the raw payload columns a/b
    assert "__od" in plan and "__nd" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "a#" not in line and "b#" not in line, line


# ---- SCD2 history compression ------------------------------------------


def _hist(spark, rows):
    df = spark.createDataFrame(rows, "version bigint, k bigint, v string")
    out = D.scd2_compress(df, ["k"], "version")
    return sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )


def test_scd2_stable_key_is_one_current_run(spark):
    got = _hist(spark, [(1, 7, "a"), (2, 7, "a"), (3, 7, "a")])
    assert got == [(7, "a", 1, None, True)]


def test_scd2_value_change_splits_runs(spark):
    got = _hist(spark, [(1, 7, "a"), (2, 7, "b"), (3, 7, "b")])
    assert got == [(7, "a", 1, 2, False), (7, "b", 2, None, True)]


def test_scd2_deletion_closes_run_at_vanish_version(spark):
    got = _hist(spark, [(1, 7, "a"), (2, 7, "a"), (3, 9, "x")])
    assert (7, "a", 1, 3, False) in got
    assert (9, "x", 3, None, True) in got


def test_scd2_reappearance_opens_new_run_across_gap(spark):
    """Present v1, absent v2, back with the SAME value v3 — two runs,
    the first closed at the gap."""
    got = _hist(spark, [(1, 7, "a"), (3, 7, "a"), (2, 9, "x")])
    assert [(k, v, f, t, c) for k, v, f, t, c in got if k == 7] == [
        (7, "a", 1, 2, False),
        (7, "a", 3, None, True),
    ]


def test_scd2_compare_cols_subset(spark):
    df = spark.createDataFrame(
        [(1, 7, "a", "noise1"), (2, 7, "a", "noise2")],
        "version bigint, k bigint, v string, other string",
    )
    out = D.scd2_compress(df, ["k"], "version", compare_cols=["v"]).collect()
    assert len(out) == 1 and out[0]["is_current"] is True
