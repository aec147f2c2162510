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


# --- wire-format goldens ---------------------------------------------------
# No broker or Kafka connector jar exists in this environment, so the wire
# JSON is pinned byte-for-byte against the shape Spark's KafkaSourceProvider
# parses: {"topic": {"<partition>": <epoch_ms LONG>}} — partition ids are
# STRING keys, timestamps are UNQUOTED integers (a quoted timestamp fails
# Spark's Jackson Long parse). The fixture mirrors the reference's
# offsets_for_times maps (streamer.py:134-148: every partition of the topic
# gets the same from/to epoch-millis bound).

def test_time_range_wire_json_golden():
    opts = kafka.time_range_options(
        "k:9092", "fc.crawled", 1575000000000, 1575003600000, num_partitions=3
    )
    assert opts["startingOffsetsByTimestamp"] == (
        '{"fc.crawled": {"0": 1575000000000, "1": 1575000000000, '
        '"2": 1575000000000}}'
    )
    assert opts["endingOffsetsByTimestamp"] == (
        '{"fc.crawled": {"0": 1575003600000, "1": 1575003600000, '
        '"2": 1575003600000}}'
    )


def test_time_range_wire_json_types():
    """Type discipline Spark's parser requires: str topic → str partition →
    int (not str, not float) epoch millis."""
    opts = kafka.time_range_options("k:9092", "t", 1000, 2000, num_partitions=16)
    for key in ("startingOffsetsByTimestamp", "endingOffsetsByTimestamp"):
        parsed = json.loads(opts[key])
        assert set(parsed) == {"t"}
        for part, ts in parsed["t"].items():
            assert isinstance(part, str) and part.isdigit()
            assert isinstance(ts, int), f"epoch must serialize unquoted: {ts!r}"
        assert sorted(int(p) for p in parsed["t"]) == list(range(16))


def test_topic_options_exact_golden():
    """Full option-dict goldens for each consumer mode (no stray keys — an
    unknown option silently changes Kafka source behavior)."""
    assert kafka.topic_options("broker1:9092,broker2:9092", "fc.crawled") == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "fc.crawled",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    assert kafka.topic_options(
        "k:9092", "fc.crawled", from_beginning=False,
        group_id="crawl-streams-analysis", max_offsets_per_trigger=10000,
    ) == {
        "kafka.bootstrap.servers": "k:9092",
        "subscribe": "fc.crawled",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "kafka.group.id": "crawl-streams-analysis",
        "maxOffsetsPerTrigger": "10000",
    }
    assert kafka.kafka_sink_options("k:9092", "fc.tocrawl.npld") == {
        "kafka.bootstrap.servers": "k:9092",
        "topic": "fc.tocrawl.npld",
        "kafka.acks": "all",
    }
