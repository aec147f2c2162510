"""Source-builder semantics: malformed-record resilience (P-1 parity with
the reference's catch-and-log, analysis.py:140-141) and Kafka option
construction (SRC-1/2/3, SNK-1, W-8)."""

from __future__ import annotations

import json

from crawl_streams_spark.sources import kafka
from crawl_streams_spark.sources.jsonl import read_crawl_log, read_uri_list


def test_malformed_records_never_fail_the_job(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    rows = [
        json.dumps({"url": "https://ok.example.org/", "timestamp": "2021-01-01T00:00:00.000Z", "status_code": 200, "thread": 1}),
        "{this is not json",
        json.dumps({"url": "https://ok2.example.org/", "timestamp": "2021-01-01T00:00:01.000Z", "status_code": -5003}),
        "",
        '"just a string"',
    ]
    p.write_text("\n".join(rows) + "\n")
    df = read_crawl_log(spark, str(p)).cache()
    good = df.filter("corrupt_record IS NULL AND url IS NOT NULL")
    bad = df.filter("corrupt_record IS NOT NULL")
    assert good.count() == 2
    assert bad.count() == 2  # broken json + bare string; blank line skipped
    assert {r["url"] for r in good.collect()} == {
        "https://ok.example.org/",
        "https://ok2.example.org/",
    }


def test_uri_list_trims_and_drops_blanks(spark, tmp_path):
    p = tmp_path / "uris.txt"
    p.write_text("  https://a.org/  \n\n\thttps://b.org/\n   \n")
    uris = [r["uri"] for r in read_uri_list(spark, str(p)).collect()]
    assert sorted(uris) == ["https://a.org/", "https://b.org/"]


def test_topic_options_semantics():
    opts = kafka.topic_options("k:9092", "fc.crawled", from_beginning=True,
                               group_id="g1", max_offsets_per_trigger=5000)
    assert opts["startingOffsets"] == "earliest"      # SRC-1 -B semantics
    assert opts["kafka.group.id"] == "g1"             # SRC-3 group id
    assert opts["maxOffsetsPerTrigger"] == "5000"     # W-8 fetch cap
    latest = kafka.topic_options("k:9092", "t", from_beginning=False)
    assert latest["startingOffsets"] == "latest"      # -L semantics


def test_time_range_options_pushdown():
    opts = kafka.time_range_options("k:9092", "fc.crawled", 1000, 2000, num_partitions=4)
    start = json.loads(opts["startingOffsetsByTimestamp"])
    end = json.loads(opts["endingOffsetsByTimestamp"])
    # SRC-2: every partition gets the event-time bounds, broker-side
    assert start["fc.crawled"] == {str(p): 1000 for p in range(4)}
    assert end["fc.crawled"] == {str(p): 2000 for p in range(4)}


def test_sink_options_durability():
    opts = kafka.kafka_sink_options("k:9092", "fc.tocrawl")
    assert opts["kafka.acks"] == "all"                # SNK-1 enqueue.py:42
