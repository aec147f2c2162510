"""Time-series regularization (operators/timeseries.py): densification
spans, fill overrides, forward-fill semantics incl. leading nulls.
Cross-engine value gate: hourly_series_filled."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.operators import timeseries as TS


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, b bigint, n bigint, v double")


def test_fill_gaps_densifies_per_key_span(spark):
    df = _series(spark, [("a", 0, 1, 1.0), ("a", 30, 2, 2.0), ("b", 20, 3, 3.0)])
    got = TS.fill_gaps(df, ["k"], "b", step=10, fill={"n": 0})
    rows = {(r["k"], r["b"]): (r["n"], r["v"]) for r in got.collect()}
    # key a: buckets 0,10,20,30 — its own span; key b: just 20
    assert set(rows) == {("a", 0), ("a", 10), ("a", 20), ("a", 30), ("b", 20)}
    assert rows[("a", 10)] == (0, None)  # n filled, v left null
    assert rows[("a", 0)] == (1, 1.0)


def test_fill_gaps_no_gaps_is_identity(spark):
    df = _series(spark, [("a", 0, 1, 1.0), ("a", 10, 2, 2.0)])
    got = TS.fill_gaps(df, ["k"], "b", step=10)
    assert got.count() == 2


def test_forward_fill_carries_last_observation(spark):
    df = _series(
        spark,
        [("a", 0, 1, None), ("a", 10, 1, 5.0), ("a", 20, 1, None), ("a", 30, 1, 7.0)],
    )
    got = {
        r["b"]: r["v_ffill"]
        for r in TS.forward_fill(df, ["k"], "b", ["v"]).collect()
    }
    # leading null stays null; gaps carry the last known value
    assert got == {0: None, 10: 5.0, 20: 5.0, 30: 7.0}


def test_fill_then_ffill_composes(spark):
    df = _series(spark, [("a", 0, 1, 4.0), ("a", 30, 1, 9.0)])
    dense = TS.fill_gaps(df, ["k"], "b", step=10, fill={"n": 0})
    got = {
        r["b"]: r["v_ffill"]
        for r in TS.forward_fill(dense, ["k"], "b", ["v"]).collect()
    }
    assert got == {0: 4.0, 10: 4.0, 20: 4.0, 30: 9.0}


def test_exchange_budget_of_composed_pipeline(spark):
    """Densify + ffill exchange budget: span agg (key), the two densify
    join sides (key, bucket), and the ffill window (key) — exactly 4
    hash exchanges, none redundant, and no sort beyond the window's own.
    A regression adding a 5th exchange (e.g. an accidental repartition)
    fails here."""
    df = _series(spark, [("a", 0, 1, 1.0), ("a", 30, 2, 2.0)])
    dense = TS.fill_gaps(df, ["k"], "b", step=10)
    plan = (
        TS.forward_fill(dense, ["k"], "b", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 4
