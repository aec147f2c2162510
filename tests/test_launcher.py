"""Launcher pipeline golden tests (SURVEY §5.3 item 2): schedule decisions
for every frequency branch at pinned `now` values, sheet derivation,
message shape, idempotent re-run."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from crawl_streams_spark.operators import launcher as L
from crawl_streams_spark.sources.jsonl import read_crawl_feed

from .fixtures import write_crawl_feed


@pytest.fixture(scope="module")
def feed(spark, tmp_path_factory):
    path = write_crawl_feed(str(tmp_path_factory.mktemp("feed")))
    return read_crawl_feed(spark, path).cache()


def _launched_tids(feed, now: dt.datetime) -> set[int]:
    return {
        r["tid"] for r in L.run_launcher(feed, now).select("tid").collect()
    }


# (now, expected target ids) — golden decision table covering launcher.py
# frequency arithmetic incl. QUARTERLY month%3 (launcher.py:107).
GOLDEN = [
    # Wed 2020-01-01 09:00 — DAILY(2), DOMAINCRAWL never, bogus never,
    # twitter DAILY(12), ended(11) still active, no-seeds invalid.
    (dt.datetime(2020, 1, 1, 9, 0), {2, 11, 12}),
    # same day hour 10 → WEEKLY(3) anchored Wed 10:00 launches; dailies don't
    (dt.datetime(2020, 1, 1, 10, 0), {3}),
    # Wed 2021-06-09 10:00 — weekly matches weekday Wed regardless of year
    (dt.datetime(2021, 6, 9, 10, 0), {3}),
    # Thu 2021-06-10 10:00 — weekly does not match Thursday
    (dt.datetime(2021, 6, 10, 10, 0), set()),
    # 15th at 03 → MONTHLY(4) (any month ≥ start)
    (dt.datetime(2021, 7, 15, 3, 0), {4}),
    # QUARTERLY(5): anchored Feb (2%3=2) day 10 hour 6 → May matches (5%3=2)
    (dt.datetime(2021, 5, 10, 6, 0), {5}),
    # ...but April doesn't (4%3=1)
    (dt.datetime(2021, 4, 10, 6, 0), set()),
    # SIXMONTHLY(6): Jan 20 07:00 anchor → July 20 matches (7%6=1%6)
    (dt.datetime(2021, 7, 20, 7, 0), {6}),
    # ANNUAL(7): Apr 1 08:00 → only April 1st
    (dt.datetime(2022, 4, 1, 8, 0), {7}),
    (dt.datetime(2022, 5, 1, 8, 0), set()),
    # before startDate → nothing (P-13 lower bound)
    (dt.datetime(2019, 12, 31, 9, 0), set()),
    # ended(11) expired after endDate 2020-06-01
    (dt.datetime(2020, 7, 1, 9, 0), {2, 12}),
]


@pytest.mark.parametrize("now,expected", GOLDEN)
def test_schedule_decisions(feed, now, expected):
    assert _launched_tids(feed, now) == expected


def test_invalid_targets_counted(feed):
    bad = L.invalid_targets(feed).select("id").collect()
    assert {r["id"] for r in bad} == {1}


def test_sheets_and_parallel_queues(feed):
    now = dt.datetime(2020, 1, 1, 10, 0)  # weekly target: robots+subdomains+large
    seeds = L.launchable_seeds(feed, now).collect()
    assert len(seeds) == 1
    row = seeds[0]
    assert row["id"] == 3
    assert sorted(row["sheets"]) == ["higherLimit", "ignoreRobots", "subdomainsScope"]
    assert row["parallel_queues"] == 1

    now2 = dt.datetime(2020, 1, 1, 9, 0)
    by_seed = {
        r["seed"]: r for r in L.launchable_seeds(feed, now2).collect()
        if r["id"] == 12
    }
    assert by_seed["https://twitter.com/ukwebarchive"]["parallel_queues"] == 2
    assert by_seed["https://t.example.org/"]["parallel_queues"] == 1

    # plus1Scope domain value (launcher.py:183) + DEEP → noLimit
    now3 = dt.datetime(2021, 7, 15, 3, 0)  # monthly target 4
    rows = [r for r in L.launchable_seeds(feed, now3).collect() if r["id"] == 4]
    assert len(rows) == 1
    assert sorted(rows[0]["sheets"]) == ["noLimit", "plus1Scope"]


def test_launch_message_shape(feed):
    """P-17 message structure as the reference launcher emits it
    (enqueue.py:72-124 with isSeed=True, forceFetch=True, reset_quotas=True,
    inherit_launch_ts=False, refresh_depth=1) + F-14 key + W-6 idempotence
    of the embedded launchTimestamp."""
    now = dt.datetime(2020, 1, 1, 9, 0)
    msgs = L.run_launcher(feed, now).collect()
    daily = next(m for m in msgs if m["tid"] == 2)
    doc = json.loads(daily["value"])
    assert doc["url"] == "https://daily.example.org/"
    assert doc["parentUrl"] == doc["url"]
    assert doc["method"] == "GET"
    assert doc["headers"] == {}
    assert doc["isSeed"] is True and doc["forceFetch"] is True
    assert doc["hop"] == ""
    assert doc["parentUrlMetadata"]["pathFromSeed"] == ""
    hd = doc["parentUrlMetadata"]["heritableData"]
    assert hd["source"] == "tid:2:https://daily.example.org/"
    assert hd["refreshDepth"] == 1
    assert hd["heritable"] == ["source", "heritable", "refreshDepth"]
    assert hd["annotations"] == [
        "resetQuotas",
        "launchTimestamp:20200101090000",
    ]
    # inherit_launch_ts=False → launch ts rides heritableData, NOT the
    # recentlySeen sheet (enqueue.py:100-106)
    assert hd["launchTimestamp"] == "20200101090000"
    assert hd["launch_ts"] == "20200101090000"
    # no sheets and parallel_queues==1 → both optional keys omitted
    # (enqueue.py:90-91,119-121)
    assert "sheets" not in doc
    assert "targetSheet" not in doc
    # the key is the little-endian hex murmur3-32(seed 0) of the authority
    assert len(daily["key"]) == 8 and int(daily["key"], 16) >= 0

    # twitter seed → parallel queues via queueAssignmentPolicy.* target
    # sheet entries (enqueue.py:114-117), the form the crawler reads
    tw = next(m for m in msgs if m["seed"] == "https://twitter.com/ukwebarchive")
    tw_doc = json.loads(tw["value"])
    assert tw_doc["targetSheet"] == {
        "queueAssignmentPolicy.parallelQueues": 2,
        "queueAssignmentPolicy.parallelQueuesRandomAssignment": True,
        "queueAssignmentPolicy.deferToPrevious": False,
    }
    assert "recentlySeen.launchTimestamp" not in tw_doc["targetSheet"]

    # re-running the same hour yields identical messages (W-6)
    again = L.run_launcher(feed, now).collect()
    assert sorted(m["value"] for m in msgs) == sorted(m["value"] for m in again)


def test_launch_message_timestamp_matches_reference_isoformat(feed):
    """The top-level timestamp field must equal the reference's
    datetime.utcnow().isoformat() shape (enqueue.py:124): naive ISO-8601,
    microseconds when present, NO trailing 'Z' — strict wire-format
    consumers compare byte-equal."""
    now = dt.datetime(2020, 1, 1, 9, 0, 0, 123456)
    seeds = L.launchable_seeds(feed, now)
    msgs = L.launch_messages(seeds, now).collect()
    doc = json.loads(msgs[0]["value"])
    assert doc["timestamp"] == "2020-01-01T09:00:00.123456"
    assert doc["timestamp"] == now.isoformat()
    # zero-microsecond datetimes render without the fraction, as isoformat does
    plain = dt.datetime(2020, 1, 1, 9, 0)
    doc2 = json.loads(
        L.launch_messages(L.launchable_seeds(feed, plain), plain).collect()[0][
            "value"
        ]
    )
    assert doc2["timestamp"] == "2020-01-01T09:00:00"


def test_launch_message_inherit_launch_ts(feed):
    """The inherit_launch_ts=True branch (enqueue.py:100-102): launch ts
    becomes the recentlySeen.launchTimestamp sheet entry and leaves
    heritableData."""
    now = dt.datetime(2020, 1, 1, 9, 0)
    seeds = L.launchable_seeds(feed, now)
    msgs = L.launch_messages(seeds, now, inherit_launch_ts=True).collect()
    daily = json.loads(next(m for m in msgs if m["tid"] == 2)["value"])
    assert (
        daily["targetSheet"]["recentlySeen.launchTimestamp"]
        == "20200101090000"
    )
    hd = daily["parentUrlMetadata"]["heritableData"]
    assert "launchTimestamp" not in hd and "launch_ts" not in hd
    # the tracking annotation is still present (enqueue.py:110-111)
    assert "launchTimestamp:20200101090000" in hd["annotations"]


def test_mmh3_key_matches_reference_algorithm(feed, spark):
    """F-14 conformance: the Spark UDF output equals murmur3_32(seed 0,
    netloc) little-endian hex, computed independently driver-side."""
    from urllib.parse import urlparse

    from crawl_streams_spark.functions.hashing import _mmh3_32_numpy

    now = dt.datetime(2020, 1, 1, 9, 0)
    for m in L.run_launcher(feed, now).collect():
        netloc = urlparse(m["seed"]).netloc.encode()
        expect = _mmh3_32_numpy([netloc])[0].to_bytes(4, "little").hex()
        assert m["key"] == expect, m["seed"]
