"""The launcher pipeline (reference launcher.py + enqueue.py) as one
Catalyst-planned batch job (SURVEY §3.3):

    read feed → seed sanity (P-12) → explode schedules → date-range (P-13)
    → frequency match (P-14) → hour gate (P-15) → explode seeds → sheets +
    parallel_queues (P-16) → launch-message struct (P-17) → (key, value)
    for the Kafka sink (SNK-1; key = murmur3-seed-0 of netloc, F-14).

`now` is an injected parameter (the reference accepts one too,
launcher.py:41-47) so every schedule predicate is a deterministic, testable
column expression. Intended-semantics fixes (SURVEY §5.2): `==` not `is`
for the hour gate (launcher.py:163), real metrics instead of the dead
Gauge code (launcher.py:148-159) via df.observe.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.crawl import schedule_ts, source_tag
from ..functions.hashing import make_mmh3_key_udf

#: Frequencies the reference understands (launcher.py:88-134).
FREQUENCIES = (
    "DAILY",
    "WEEKLY",
    "MONTHLY",
    "QUARTERLY",
    "SIXMONTHLY",
    "ANNUAL",
    "DOMAINCRAWL",
)


def valid_targets(feed: DataFrame) -> DataFrame:
    """P-12 — reject targets with missing/empty seeds (launcher.py:58-61)."""
    return feed.filter(
        F.col("seeds").isNotNull() & (F.size(F.col("seeds")) > 0)
    )


def invalid_targets(feed: DataFrame) -> DataFrame:
    """The error branch of P-12 — feeds A-9's target_errors counter."""
    return feed.filter(
        F.col("seeds").isNull() | (F.size(F.col("seeds")) == 0)
    )


def date_range_ok(now: Column) -> Column:
    """P-13 — startDate non-null ∧ now ≥ startDate ∧ (endDate empty ∨ now ≤
    endDate) (launcher.py:69-84)."""
    start = schedule_ts(F.col("sched.startDate"))
    end = schedule_ts(F.col("sched.endDate"))
    return (
        start.isNotNull()
        & (now >= start)
        & (end.isNull() | (now <= end))
    )


def frequency_ok(now: Column) -> Column:
    """P-14 — the six frequency-match predicates (launcher.py:88-134):

      DAILY       always
      WEEKLY      isoweekday(now) == isoweekday(start)
      MONTHLY     day(now) == day(start)
      QUARTERLY   day ∧ month(now) % 3 == month(start) % 3
      SIXMONTHLY  day ∧ month(now) % 6 == month(start) % 6
      ANNUAL      day ∧ month(now) == month(start)
      DOMAINCRAWL never launched by this tool (launcher.py:128-130)
      unknown     error branch (counted, never launched)
    """
    start = schedule_ts(F.col("sched.startDate"))
    freq = F.upper(F.col("sched.frequency"))
    same_day = F.dayofmonth(now) == F.dayofmonth(start)
    return (
        F.when(freq == "DAILY", F.lit(True))
        .when(freq == "WEEKLY", F.dayofweek(now) == F.dayofweek(start))
        .when(freq == "MONTHLY", same_day)
        .when(
            freq == "QUARTERLY",
            same_day & (F.month(now) % 3 == F.month(start) % 3),
        )
        .when(
            freq == "SIXMONTHLY",
            same_day & (F.month(now) % 6 == F.month(start) % 6),
        )
        .when(freq == "ANNUAL", same_day & (F.month(now) == F.month(start)))
        .otherwise(F.lit(False))
    )


def hour_ok(now: Column) -> Column:
    """P-15 — launch only in the schedule's start hour. The reference uses
    ``is`` (identity) which only works via CPython small-int caching
    (launcher.py:163); we implement the intended ``==``."""
    return F.hour(now) == F.hour(schedule_ts(F.col("sched.startDate")))


def sheets_for_target() -> Column:
    """P-16 — per-seed sheet derivation (launcher.py:175-189):
    ignoreRobotsTxt→ignoreRobots; scope subdomains→subdomainsScope,
    plus1Scope→plus1Scope; depth CAPPED_LARGE→higherLimit, DEEP→noLimit.

    The domain value for the plus-one scope is ``plus1Scope``
    (launcher.py:183); the bare ``plus1`` spelling is accepted too as a
    defensive alias for hand-written feeds."""
    return F.array_compact(
        F.array(
            F.when(F.col("ignoreRobotsTxt"), F.lit("ignoreRobots")),
            F.when(F.col("scope") == "subdomains", F.lit("subdomainsScope")),
            F.when(
                F.col("scope").isin("plus1Scope", "plus1"), F.lit("plus1Scope")
            ),
            F.when(F.col("depth") == "CAPPED_LARGE", F.lit("higherLimit")),
            F.when(F.col("depth") == "DEEP", F.lit("noLimit")),
        )
    )


def parallel_queues() -> Column:
    """P-16 — parallel_queues=2 iff the seed mentions twitter.com
    (launcher.py:195-197)."""
    return F.when(F.col("seed").contains("twitter.com"), F.lit(2)).otherwise(
        F.lit(1)
    )


def launchable_seeds(feed: DataFrame, now: dt.datetime) -> DataFrame:
    """Feed → one row per (target, matching schedule, seed) that should
    launch at `now` — the P-12..P-16 pipeline."""
    now_c = F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp_ntz")
    d = (
        valid_targets(feed)
        .withColumn("sched", F.explode("schedules"))
        .filter(date_range_ok(now_c))
        .filter(frequency_ok(now_c))
        .filter(hour_ok(now_c))
        .withColumn("seed", F.explode("seeds"))
    )
    return d.withColumn("sheets", sheets_for_target()).withColumn(
        "parallel_queues", parallel_queues()
    )


def launch_messages(
    seeds: DataFrame,
    now: dt.datetime,
    stream: str = "frequent",
    *,
    inherit_launch_ts: bool = False,
    refresh_depth: int = 1,
) -> DataFrame:
    """P-17 + F-13..F-15 — build the nested CrawlURI document
    (enqueue.py:72-124) and the Kafka (key, value) pair (enqueue.py:127-130).

    Wire-format fidelity to ``KafkaLauncher.launch`` as the reference
    launcher calls it (launcher.py:204-206: isSeed=True, forceFetch=True,
    reset_quotas=True, inherit_launch_ts=False, refresh_depth default 1):

    - ``headers`` is an (empty) map (enqueue.py:74);
    - ``heritableData.refreshDepth`` = `refresh_depth` and ``heritable``
      lists ``['source', 'heritable', 'refreshDepth']`` (enqueue.py:82-84);
    - annotations carry ``resetQuotas`` then ``launchTimestamp:<ts>``
      (enqueue.py:96-97,110-111);
    - with ``inherit_launch_ts=False`` the launch timestamp rides
      ``heritableData.launchTimestamp``/``launch_ts`` (enqueue.py:104-106);
      with ``True`` it instead becomes the
      ``recentlySeen.launchTimestamp`` target-sheet entry (enqueue.py:102);
    - ``targetSheet`` appears only when non-empty (enqueue.py:119-121) and
      carries the ``queueAssignmentPolicy.*`` entries when
      parallel_queues > 1 (enqueue.py:114-117);
    - ``sheets`` appears only when non-empty (enqueue.py:90-91).

    The top-level ``timestamp`` matches the reference's
    ``datetime.utcnow().isoformat()`` shape exactly (enqueue.py:124):
    naive ISO-8601, no 'Z' suffix, microseconds included when the caller's
    `now` carries them — strict wire-format consumers compare equal.

    Deliberate divergence (SURVEY §5.2): launchTimestamp = the launch hour
    (yyyyMMddHHmmss with minutes/seconds zeroed) instead of the wall-clock
    `now` (launcher.py:192), making hourly re-runs idempotent — the crawler
    dedups on it (W-6, README.md:43)."""
    launch_ts = now.strftime("%Y%m%d%H") + "0000"
    iso_ts = now.isoformat()
    source = source_tag(F.col("id"), F.element_at(F.col("seeds"), 1))
    pq = F.col("parallel_queues")
    heritable_fields = [
        F.lit(refresh_depth).alias("refreshDepth"),
        source.alias("source"),
        F.array(
            F.lit("source"), F.lit("heritable"), F.lit("refreshDepth")
        ).alias("heritable"),
        F.array(
            F.lit("resetQuotas"), F.lit(f"launchTimestamp:{launch_ts}")
        ).alias("annotations"),
    ]
    if not inherit_launch_ts:
        heritable_fields += [
            F.lit(launch_ts).alias("launchTimestamp"),
            F.lit(launch_ts).alias("launch_ts"),
        ]
    # Mixed-type sheet overlay: string / int / bool values, so a struct
    # (dotted field names), not a map. Per-row-absent entries are null
    # columns, which to_json omits (spark.sql.jsonGenerator.ignoreNullFields
    # default); the whole targetSheet is omitted when it would be empty.
    target_sheet_fields = [
        F.when(pq > 1, pq).alias("queueAssignmentPolicy.parallelQueues"),
        F.when(pq > 1, F.lit(True)).alias(
            "queueAssignmentPolicy.parallelQueuesRandomAssignment"
        ),
        F.when(pq > 1, F.lit(False)).alias(
            "queueAssignmentPolicy.deferToPrevious"
        ),
    ]
    if inherit_launch_ts:
        target_sheet_fields.insert(
            0, F.lit(launch_ts).alias("recentlySeen.launchTimestamp")
        )
    sheet_used = F.lit(inherit_launch_ts) | (pq > 1)
    message = F.struct(
        F.from_json(F.lit("{}"), "map<string,string>").alias("headers"),
        F.lit("GET").alias("method"),
        F.col("seed").alias("parentUrl"),
        F.struct(
            F.lit("").alias("pathFromSeed"),
            F.struct(*heritable_fields).alias("heritableData"),
        ).alias("parentUrlMetadata"),
        F.lit(True).alias("isSeed"),
        F.lit(True).alias("forceFetch"),
        F.col("seed").alias("url"),
        F.lit("").alias("hop"),
        F.when(F.size("sheets") > 0, F.col("sheets")).alias("sheets"),
        F.when(sheet_used, F.struct(*target_sheet_fields)).alias(
            "targetSheet"
        ),
        F.lit(iso_ts).alias("timestamp"),
    )
    mmh3_key = make_mmh3_key_udf()
    out = seeds.select(
        F.col("id").alias("tid"),
        F.col("seed"),
        mmh3_key(F.col("seed")).alias("key"),
        F.to_json(message).alias("value"),
    )
    # W-6 idempotence: identical (target, seed) rows from overlapping
    # schedules collapse before the sink.
    out = out.dropDuplicates(["tid", "seed"])
    # A-9 metrics, replacing the reference's dead Gauge code
    # (launcher.py:148-159): observable counter on the launch stream.
    return out.observe(
        f"launch_metrics_{stream}", F.count(F.lit(1)).alias("n_launches")
    )


def run_launcher(
    feed: DataFrame, now: dt.datetime, stream: str = "frequent"
) -> DataFrame:
    """Full pipeline: feed → launchable seeds → (key, value) messages."""
    return launch_messages(launchable_seeds(feed, now), now, stream)


def backfill_launches(
    feed: DataFrame, start: dt.datetime, end: dt.datetime
) -> DataFrame:
    """The generalized cross-join form (SURVEY §2.7): feed × hour-dimension
    table, filtered by the same P-13/P-14/P-15 predicates — "which
    (target, seed, hour) launches were due in [start, end)?". Replaces N
    hourly runs with one distributed join; the hour dimension broadcasts.

    Returns (tid, seed, launch_hour) rows — feed the per-hour groups to
    launch_messages to materialize documents."""
    hours = feed.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start.strftime("%Y-%m-%d %H:00:00")).cast("timestamp_ntz"),
                F.lit(end.strftime("%Y-%m-%d %H:00:00")).cast("timestamp_ntz"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("now_h")
    )
    d = (
        valid_targets(feed)
        .withColumn("sched", F.explode("schedules"))
        .crossJoin(F.broadcast(hours))
    )
    now_c = F.col("now_h")
    d = (
        d.filter(date_range_ok(now_c))
        .filter(frequency_ok(now_c))
        .filter(hour_ok(now_c))
        .withColumn("seed", F.explode("seeds"))
    )
    return d.select(
        F.col("id").alias("tid"), "seed", F.col("now_h").alias("launch_hour")
    ).dropDuplicates(["tid", "seed", "launch_hour"])
