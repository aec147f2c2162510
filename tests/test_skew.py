"""Skew evidence (SURVEY §1.1: the crawl fixture is 84% one host's
quota-storm rows; at 100 TB hot hosts are the expected shape).

Two runtime proofs, not plan arguments:

1. Per-host aggregation ABSORBS the hot key map-side: the shuffle after the
   partial HashAggregate carries one partial row per (host, map partition),
   never the raw events — measured from the executed plan's
   ShuffleExchangeExec recordsRead metric.
2. An intentionally skewed, broadcast-ineligible join takes AQE's
   skew-split path (SortMergeJoin(skew=true) in the final adaptive plan).

The explicit salting operators for the cases AQE can't fix live in
operators/skew.py (equivalence-tested in test_extensions2.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.operators import host_stats as HS

HOT_SHARE = 84  # percent, mirroring the reference fixture's skew


def _skewed_events(spark, n=100_000, n_cold_hosts=500):
    """84% of rows on one host, the rest uniform over cold hosts."""
    return spark.range(0, n).select(
        F.when(
            F.col("id") % 100 < HOT_SHARE, F.lit("https://hot.example.org/x")
        )
        .otherwise(
            F.concat(
                F.lit("https://h"),
                (F.col("id") % n_cold_hosts).cast("string"),
                F.lit(".example.org/"),
            )
        )
        .alias("url"),
        F.date_format(
            F.timestamp_seconds(1575000000 + F.col("id")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ).alias("timestamp"),
    )


def _walk_executed(df):
    """All physical nodes of the EXECUTED plan, descending through AQE
    wrappers and query stages."""
    out = []

    def walk(node):
        out.append(node)
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def _metric(node, key):
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == key:
            return kv._2().value()
    return None


def test_skewed_host_aggregate_partial_absorbed(spark):
    """The hot host contributes ONE partial row per map task to the
    shuffle — shuffle records scale with #hosts × #map partitions, not
    #events, no matter how skewed the key."""
    n = 100_000
    ev = _skewed_events(spark, n)
    totals = HS.host_totals(ev)
    rows = totals.collect()
    hot = next(r for r in rows if r["host"] == "hot.example.org")
    assert hot["total"] == n * HOT_SHARE // 100

    exchanges = [
        node
        for node in _walk_executed(totals)
        if node.getClass().getSimpleName() == "ShuffleExchangeExec"
    ]
    assert exchanges, "expected a shuffle in the aggregate plan"
    shuffled = sum(_metric(x, "recordsRead") or 0 for x in exchanges)
    n_hosts = len(rows)
    n_map_partitions = spark.sparkContext.defaultParallelism
    bound = n_hosts * max(n_map_partitions, 32)
    assert shuffled <= bound, (
        f"shuffle carried {shuffled} records for {n_hosts} hosts — partial "
        f"aggregation is not absorbing the hot key (bound {bound})"
    )
    assert shuffled < n / 10, (
        f"shuffle volume {shuffled} is proportional to events ({n}), "
        "not distinct hosts"
    )


def test_aqe_skew_join_splits_hot_partition(spark):
    """A broadcast-ineligible join with one hot key must take AQE's
    skew-split path: the final adaptive plan marks the join skew=true and
    the hot partition is split across tasks instead of serializing on one.
    Thresholds are lowered to make test-scale partitions 'skewed'; at real
    scale the defaults (256 MB advisory) express the identical mechanism."""
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
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB",
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")

        fact = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias(
                "pad"
            ),
        )
        dim = spark.range(0, 300_000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("y" * 100), F.col("id").cast("string")).alias(
                "pad2"
            ),
        )
        # aggregate AFTER the join so the wide payload survives pruning and
        # the hot partition's bytes actually exceed the skew threshold
        j = fact.join(dim, "k").select(
            F.sum(F.length("pad") + F.length("pad2")).alias("s")
        )
        [row] = j.collect()
        assert row["s"] is not None
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not split the hot partition:\n" + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
