"""Dynamic partition pruning (Spark's DPP): the canonical 100-TB
warehouse mechanism — a date-partitioned fact table joined to a
selective dimension must scan ONLY the partitions the dimension's rows
name, discovered at RUNTIME from the dimension side (a static filter
can't see them). Pinned on the executed plan's scan: the dynamicpruning
partition filter is present AND the partition/file read metrics show the
pruned count, not the full table. At 100 TB this is the difference
between scanning 3 date partitions and 3000."""

from __future__ import annotations

import pyspark.sql.functions as F


def _walk(node, out):
    out.append(node)
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out)
    if cls.endswith("QueryStageExec"):
        _walk(node.plan(), out)
    ch = node.children()
    for i in range(ch.length()):
        _walk(ch.apply(i), out)


def _metric(node, key):
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == key:
            return kv._2().value()
    return None


def test_dynamic_partition_pruning_fires_and_bounds_the_scan(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    n_dates = 40
    fact = spark.range(0, 40_000).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % n_dates).cast("int")).alias("d"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 3 % 1000).alias("v"),
    )
    fact.write.partitionBy("d").mode("overwrite").parquet(fact_path)

    # selective dimension: names exactly 3 of the 40 dates, discoverable
    # only at runtime (the filter is on a NON-join column)
    dim = spark.createDataFrame(
        [("2024-01-05", "keep"), ("2024-01-11", "keep"),
         ("2024-01-30", "keep"), ("2024-02-02", "drop")],
        "ds string, tag string",
    ).select(F.col("ds").cast("date").alias("d"), "tag")

    # Recreate the production size relationship at test scale: the 329 KB
    # toy fact otherwise broadcasts ITSELF (BuildLeft), leaving no dim
    # broadcast for DPP to reuse — at 100 TB the fact side is never
    # broadcastable, so a threshold between dim and fact sizes is the
    # faithful miniature, not a cheat.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    try:
        f = spark.read.parquet(fact_path)
        # the broadcast hint on the (provably bounded, 4-row) dim makes
        # the INITIAL plan a broadcast join — adaptive DPP only reuses a
        # broadcast that exists before runtime re-planning; a LocalRelation's
        # conservative static estimate otherwise plans SMJ first and the
        # pruning filter is dropped to `true`
        joined = (
            f.join(F.broadcast(dim.filter(F.col("tag") == "keep")), "d")
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        )
        rows = {str(r["d"]): (r["n"], r["sv"]) for r in joined.collect()}
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert set(rows) == {"2024-01-05", "2024-01-11", "2024-01-30"}
    assert all(n == 1000 for n, _ in rows.values())

    plan_str = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan_str, (
        "no dynamic partition pruning filter on the fact scan:\n"
        + plan_str[:2000]
    )

    # the scan's runtime metrics must show the PRUNED partition count
    nodes = []
    _walk(joined._jdf.queryExecution().executedPlan(), nodes)
    scans = [
        n for n in nodes
        if n.getClass().getSimpleName() == "FileSourceScanExec"
        and "fact" in n.toString()
    ]
    assert scans, "fact scan not found in executed plan"
    pruned = [_metric(s, "numPartitions") for s in scans]
    pruned = [p for p in pruned if p is not None]
    assert pruned and max(pruned) == 3, (
        f"expected 3 partitions read after DPP, metrics say {pruned}"
    )


def test_static_partition_filter_still_prunes(spark, tmp_path):
    """Baseline sanity next to the dynamic case: a literal predicate on
    the partition column prunes at PLAN time (PartitionFilters), reading
    one directory."""
    path = str(tmp_path / "fact2")
    spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 4).alias("p"), (F.col("id") % 100).alias("v")
    ).write.partitionBy("p").mode("overwrite").parquet(path)
    df = spark.read.parquet(path).filter(F.col("p") == 2).agg(F.sum("v"))
    [row] = df.collect()
    assert row[0] is not None
    nodes = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    scans = [
        n for n in nodes
        if n.getClass().getSimpleName() == "FileSourceScanExec"
    ]
    got = [_metric(s, "numPartitions") for s in scans]
    assert [p for p in got if p is not None] == [1], got
