"""Data-quality validation (operators/validate.py): null-is-violation
semantics, one-scan plan shape, referential checks, report union.
Cross-engine value gate: plans/q_validate.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.operators import validate as V


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, -5.0, "F"),
            (3, None, "P"),
            (4, 7.0, "Z"),
            (5, 0.0, None),
        ],
        "id bigint, price double, status string",
    )


def test_counts_and_null_is_violation(spark):
    rep = V.validation_report(
        _df(spark),
        {
            "price_positive": F.col("price") > 0,
            "status_in_domain": F.col("status").isin("O", "F", "P"),
        },
    )
    got = {r["rule"]: r for r in rep.collect()}
    # price: -5 violates, NULL violates, 0.0 violates -> 3
    assert got["price_positive"]["n_violations"] == 3
    # status: 'Z' violates, NULL violates -> 2
    assert got["status_in_domain"]["n_violations"] == 2
    assert all(r["n_rows"] == 5 for r in got.values())
    assert abs(got["price_positive"]["violation_fraction"] - 0.6) < 1e-9


def test_explicit_null_allowance(spark):
    rep = V.validation_report(
        _df(spark),
        {"price_or_null": F.col("price").isNull() | (F.col("price") > 0)},
    )
    assert rep.collect()[0]["n_violations"] == 2  # -5 and 0.0 only


def test_single_scan_regardless_of_rule_count(spark):
    rules = {f"r{i}": F.col("price") > i for i in range(12)}
    plan = (
        V.validation_report(_df(spark), rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one aggregate over one scan: no join, no union of scans
    assert "Join" not in plan and "Union" not in plan


def test_fk_violations_counts_orphans_and_null_fks(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id bigint, fk bigint"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
    got = V.fk_violations(child, "fk", parent, "pk").collect()[0]
    assert got["n_violations"] == 2  # 99 orphan + NULL fk
    assert got["n_rows"] == 4


def test_combined_report_unions_schemas(spark):
    scalar = V.validation_report(_df(spark), {"p": F.col("price") > 0})
    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    ref = V.fk_violations(_df(spark), "id", parent, "pk")
    rows = V.combined_report(scalar, ref).collect()
    assert {r["rule"] for r in rows} == {"p", "id_in_pk"}
