"""Bucketing co-located joins (SCALING.md's shuffle-elimination path): two
tables bucketed on the join key join WITHOUT an Exchange on either side."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("orders_bkt"))
    (customer.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("customer_bkt"))
    try:
        o = spark.table("orders_bkt")
        c = spark.table("customer_bkt")
        # disable broadcast so the join would OTHERWISE shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_mktsegment"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        # and results are correct
        n = joined.count()
        want = (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .count()
        )
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_session_window_streaming_operator(spark, tmp_path):
    """The REAL session_window operator under Structured Streaming —
    the streaming twin of the oracle-checked user_sessions query."""
    import json

    d = tmp_path / "in"
    d.mkdir()
    rows = [
        {"user": "u1", "ts": "2024-01-01T10:00:00.000Z"},
        {"user": "u1", "ts": "2024-01-01T10:10:00.000Z"},  # same session
        {"user": "u1", "ts": "2024-01-01T12:00:00.000Z"},  # new session
        {"user": "u2", "ts": "2024-01-01T10:05:00.000Z"},
        # a late event far ahead to close the watermark
        {"user": "u3", "ts": "2024-01-01T20:00:00.000Z"},
    ]
    with open(d / "b.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("user string, ts string")
        .json(str(d))
        .withColumn("event_ts", F.to_timestamp("ts"))
        .withWatermark("event_ts", "10 minutes")
    )
    agg = stream.groupBy(
        F.session_window("event_ts", "30 minutes").alias("win"), F.col("user")
    ).agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        (r["user"], r["n"])
        for r in spark.sql("SELECT user, n FROM sess").collect()
    }
    # u1: one 2-event session + one 1-event session; u2: one session
    assert ("u1", 2) in got and ("u1", 1) in got and ("u2", 1) in got
