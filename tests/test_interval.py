"""Bucketed interval joins (operators/interval.py): exact-match semantics
vs a brute-force nested-loop reference, exactly-once attribution across
shared buckets, closed-interval edges, keys, and the extra_on pushdown.
Cross-engine value gate: plans/q_interval.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.operators import interval as IV


def _ivs(spark, rows, name="id bigint, s bigint, e bigint"):
    return spark.createDataFrame(rows, name)


def _brute_overlap(rows_a, rows_b, same_entity_ok=True):
    out = set()
    for ida, sa, ea in rows_a:
        for idb, sb, eb in rows_b:
            if sa <= eb and sb <= ea:
                if same_entity_ok or ida != idb:
                    out.add((ida, idb))
    return out


def test_overlap_join_matches_bruteforce(spark):
    """Random-ish fixed intervals, narrow buckets (width 10) so most pairs
    share several buckets — the attribution rule must still emit each
    exactly once."""
    rows = [
        (1, 0, 25),
        (2, 20, 40),
        (3, 38, 39),
        (4, 100, 200),
        (5, 150, 160),
        (6, 0, 200),  # spans everything: worst-case explode factor
        (7, 41, 99),  # touches nothing except 6
    ]
    df = _ivs(spark, rows)
    got = IV.interval_overlap_join(
        df, df, "s", "e", "s", "e", width=10
    ).select("id", "r_id")
    pairs = {(r["id"], r["r_id"]) for r in got.collect()}
    assert pairs == _brute_overlap(rows, rows)
    # exactly-once: collect() count equals the set size
    assert got.count() == len(pairs)


def test_overlap_closed_interval_edges(spark):
    """Touching endpoints overlap (closed intervals); zero-length
    intervals overlap iff the point sits inside the other."""
    a = _ivs(spark, [(1, 0, 10)])
    b = _ivs(spark, [(10, 10, 20), (11, 11, 20), (12, 5, 5), (13, 30, 30)])
    got = {
        (r["id"], r["r_id"])
        for r in IV.interval_overlap_join(
            a, b, "s", "e", "s", "e", width=7
        ).collect()
    }
    assert got == {(1, 10), (1, 12)}


def test_overlap_extra_on_excludes_self_pairs(spark):
    rows = [(1, 0, 10), (2, 5, 15)]
    df = _ivs(spark, rows)
    got = IV.interval_overlap_join(
        df,
        df,
        "s",
        "e",
        "s",
        "e",
        width=4,
        extra_on=F.col("id") != F.col("r_id"),
    )
    pairs = {(r["id"], r["r_id"]) for r in got.collect()}
    assert pairs == {(1, 2), (2, 1)}


def test_overlap_keys_partition_the_match_space(spark):
    schema = "k string, id bigint, s bigint, e bigint"
    a = spark.createDataFrame(
        [("x", 1, 0, 10), ("y", 2, 0, 10)], schema
    )
    b = spark.createDataFrame(
        [("x", 3, 5, 15), ("y", 4, 50, 60)], schema
    )
    got = IV.interval_overlap_join(
        a, b, "s", "e", "s", "e", width=8, keys=("k",)
    )
    pairs = {(r["k"], r["id"], r["r_id"]) for r in got.collect()}
    assert pairs == {("x", 1, 3)}
    # keys stay unprefixed and appear once
    assert got.columns.count("k") == 1


def test_right_prefix_collision_raises(spark):
    a = _ivs(spark, [(1, 0, 1)]).withColumnRenamed("id", "r_id")
    b = _ivs(spark, [(2, 0, 1)])
    try:
        IV.interval_overlap_join(a, b, "s", "e", "s", "e", width=4)
    except ValueError as e:
        assert "collides" in str(e)
    else:
        raise AssertionError("expected ValueError on column collision")


def test_point_in_interval_matches_bruteforce(spark):
    pts = spark.createDataFrame(
        [(i, p) for i, p in enumerate([0, 5, 10, 17, 100, 205])],
        "pid bigint, p bigint",
    )
    ivs = _ivs(
        spark,
        [(1, 0, 10), (2, 5, 20), (3, 90, 210), (4, 205, 205)],
    )
    got = IV.point_in_interval_join(
        pts, ivs, "p", "s", "e", width=7
    ).select("pid", "id")
    expect = {
        (pid, iid)
        for pid, p in [(0, 0), (1, 5), (2, 10), (3, 17), (4, 100), (5, 205)]
        for iid, s, e in [(1, 0, 10), (2, 5, 20), (3, 90, 210), (4, 205, 205)]
        if s <= p <= e
    }
    assert {(r["pid"], r["id"]) for r in got.collect()} == expect
    assert got.count() == len(expect)


def test_overlap_join_plan_is_hash_join_not_nested_loop(spark):
    """The rewrite's whole point: the physical plan must contain no
    BroadcastNestedLoopJoin / CartesianProduct — the range predicate rides
    an equi-join on the bucket."""
    df = _ivs(spark, [(i, i * 10, i * 10 + 15) for i in range(40)])
    plan = IV.interval_overlap_join(
        df, df, "s", "e", "s", "e", width=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_overlap_join_hot_bucket_skew_split(spark):
    """VERDICT r6 item 4: one bucket holding 50% of the sessions is
    ordinary join skew on the bucket key — with AQE thresholds scaled to
    test data the final plan must take the skew-split path (skew=true),
    not serialize the hot bucket into one task, and values must match
    brute force. At the 256 MB production thresholds the identical
    mechanism engages on real hot buckets (SCALING.md interval row)."""
    import pytest

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    # 50% of sessions in ONE hour bucket (seconds 0..3599), the rest
    # uniform across 200 other hours; 1-119 s durations inside the hour.
    hot, cold = [], []
    for i in range(2000):
        s = (i * 37) % 3480
        hot.append((i, s, s + 1 + (i % 119)))
    for i in range(2000, 4000):
        h = 1 + (i % 200)  # hours 1..200
        s = h * 3600 + (i * 13) % 3000
        cold.append((i, s, s + 1 + (i % 119)))
    rows = hot + cold
    df = _ivs(spark, rows).repartition(8)
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        joined = IV.interval_overlap_join(
            df, df, "s", "e", "s", "e", width=3600,
            extra_on=F.col("id") < F.col("r_id"),
        ).select("id", "r_id")
        got = {(r[0], r[1]) for r in joined.collect()}
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    want = {
        (a, b) for (a, b) in _brute_overlap(rows, rows) if a < b
    }
    assert got == want
    assert "isFinalPlan=true" in plan
    if "skew=true" not in plan:
        pytest.fail(
            "hot bucket did not take AQE's skew-split path:\n" + plan[:1500]
        )


def test_point_in_interval_left_keeps_gap_points(spark):
    """how="left" (r13): points contained in no interval survive with
    null interval columns, matched points carry the same rows as the
    inner form, and the plan stays an equi-join (no nested loop)."""
    pts = spark.createDataFrame(
        [(0, 0, "k1"), (1, 5, "k1"), (2, 30, "k1"), (3, 5, "k2")],
        "pid bigint, p bigint, k string",
    )
    ivs = spark.createDataFrame(
        [(1, 0, 10, "k1"), (2, 90, 95, "k1")],
        "id bigint, s bigint, e bigint, k string",
    )
    got = IV.point_in_interval_join(
        pts, ivs, "p", "s", "e", width=7, keys=("k",), how="left"
    )
    rows = {(r["pid"], r["id"]) for r in got.collect()}
    # pid 0/1 match interval 1; pid 2 (gap) and pid 3 (other key) null
    assert rows == {(0, 1), (1, 1), (2, None), (3, None)}
    assert got.count() == 4
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # inner form agrees on the matched subset
    inner = IV.point_in_interval_join(
        pts, ivs, "p", "s", "e", width=7, keys=("k",)
    )
    assert {(r["pid"], r["id"]) for r in inner.collect()} == {(0, 1), (1, 1)}
    import pytest

    with pytest.raises(ValueError, match="how"):
        IV.point_in_interval_join(
            pts, ivs, "p", "s", "e", width=7, how="full"
        )


def test_point_in_interval_shared_nonkey_column_raises(spark):
    """ADVICE r13: a shared non-key column name must fail fast with a
    descriptive error, not misbind through the DataFrame-apply join
    condition (left form) or surface as a deep ambiguity error (inner)."""
    import pytest

    pts = spark.createDataFrame(
        [(0, 3, "x")], "pid bigint, p bigint, tag string"
    )
    ivs = spark.createDataFrame(
        [(1, 0, 10, "y")], "id bigint, s bigint, e bigint, tag string"
    )
    for how in ("inner", "left"):
        with pytest.raises(ValueError, match="disjoint.*tag|tag.*disjoint"):
            IV.point_in_interval_join(
                pts, ivs, "p", "s", "e", width=7, how=how
            )
    # the same shared name declared as a KEY is fine
    got = IV.point_in_interval_join(
        pts,
        ivs.withColumn("tag", F.lit("x")),
        "p", "s", "e", width=7, keys=("tag",),
    )
    assert got.count() == 1
