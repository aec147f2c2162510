"""Streaming metrics export (streaming/metrics.py): observe() metrics and
engine progress counters reach the listener — the working SNK-5."""

from __future__ import annotations

import json
import time

import pyspark.sql.functions as F
from pyspark.sql import types as T

from crawl_streams_spark.streaming.metrics import MetricsCollector

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
    ]
)


def _wait_for(pred, timeout_s=60):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if pred():
            return True
        time.sleep(0.5)
    return False


def test_metrics_collector_harvests_observed(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [{"url": f"http://h{i % 3}/p{i}", "status_code": 200 + i % 2}
            for i in range(40)]
    with open(src / "b0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    collector = MetricsCollector()
    spark.streams.addListener(collector)
    try:
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        observed = stream.observe(
            "ingest_metrics",
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("status_code") >= 400, 1)).alias("n_errors"),
        )
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .queryName("ingest")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        # listener callbacks arrive asynchronously after termination
        assert _wait_for(
            lambda: collector.observed_totals("ingest_metrics", "n_events") >= 40
        ), collector.history
        assert collector.observed_totals("ingest_metrics", "n_errors") == 0
        assert collector.totals().get("ingest", 0) >= 40
        batch = collector.history[0]
        assert batch.num_input_rows == 40
        assert batch.duration_ms >= 0
    finally:
        spark.streams.removeListener(collector)
