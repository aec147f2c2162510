"""Exact reference state semantics via applyInPandasWithState
(SURVEY §2.10 W-1/W-2, §7.7 "what's hard").

Structured Streaming's native state model is time-based; the reference's is
row-count- and insertion-order-based:

- W-1: a deque of the last N events (analysis.py:76-77, 88-89) feeding the
  recent status-code histogram (analysis.py:149-158).
- W-2: a 500-entry LRU-ish dict of per-host stats — ``LimitedSizeDict``
  evicts the oldest-INSERTED host when full (FIFO by first insertion;
  updates don't refresh position — analysis.py:18-31, popitem(last=False)).

The default engine path approximates both with watermarked time windows
(analysis_job.py) — the right trade at scale. These operators reproduce the
EXACT semantics for conformance: all events route to one state group (the
reference is a single-threaded consumer, so a single ordered state is the
faithful model; throughput is bounded by one task, documented and
intended — don't use these at 100 TB).

State is stored as one JSON string column — schema-stable across versions
and trivially inspectable in checkpoints.
"""

from __future__ import annotations

import json
from collections import Counter, deque
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([StructField("blob", StringType(), True)])

RECENT_OUTPUT_SCHEMA = StructType(
    [
        StructField("status", StringType(), False),
        StructField("n", LongType(), False),
    ]
)

HOST_LRU_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), True),
        StructField("total", LongType(), False),
        StructField("first_timestamp", StringType(), True),
        StructField("last_timestamp", StringType(), True),
    ]
)


def recent_status_counts(events: DataFrame, n: int = 10_000) -> DataFrame:
    """W-1 exact: histogram over the last ``n`` events (row-count window,
    arrival order), recomputed per micro-batch — the reference's
    ``recent`` deque + ``get_recent_stats`` (analysis.py:76, 149-158).

    Input needs a ``status`` string column (use functions.crawl.status_str)
    and a ``seq`` ordering column (kafka offset / monotonically increasing
    file position) so arrival order is well-defined under parallel read.
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf: deque = deque(
            json.loads(state.get[0]) if state.exists else [], maxlen=n
        )
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["seq", "status"]])
        if rows:
            allrows = pd.concat(rows).sort_values("seq")
            for s in allrows["status"]:
                buf.append(s)
        state.update((json.dumps(list(buf)),))
        cnt = Counter(buf)
        yield pd.DataFrame(
            {"status": list(cnt.keys()), "n": [int(v) for v in cnt.values()]}
        )

    routed = events.select(
        F.lit(1).alias("g"), F.col("seq"), F.col("status")
    )
    return routed.groupBy("g").applyInPandasWithState(
        update,
        RECENT_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def host_stats_lru(events: DataFrame, max_hosts: int = 500) -> DataFrame:
    """W-2 exact: per-host {total, first_ts, last_ts} in an insertion-order
    dict capped at ``max_hosts`` — evicting the oldest-inserted host when
    full, updates NOT refreshing position (LimitedSizeDict semantics,
    analysis.py:18-31; last_timestamp is arrival-order last, matching
    analysis.py:90's accept-everything behavior — no watermark drops).

    Input needs ``seq``, ``host``, ``timestamp`` columns.
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hosts: dict = (
            json.loads(state.get[0]) if state.exists else {}
        )  # insertion-ordered (py dict)
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["seq", "host", "timestamp"]])
        if rows:
            allrows = pd.concat(rows).sort_values("seq")
            for host, ts in zip(allrows["host"], allrows["timestamp"]):
                h = host if host is not None else None
                key_ = "\x00null" if h is None else h
                if key_ in hosts:
                    st = hosts[key_]
                    st["total"] += 1
                    st["last"] = ts
                else:
                    hosts[key_] = {"total": 1, "first": ts, "last": ts}
                    while len(hosts) > max_hosts:
                        # FIFO eviction of the oldest-inserted key
                        hosts.pop(next(iter(hosts)))
        state.update((json.dumps(hosts),))
        yield pd.DataFrame(
            {
                "host": [None if k == "\x00null" else k for k in hosts],
                "total": [v["total"] for v in hosts.values()],
                "first_timestamp": [v["first"] for v in hosts.values()],
                "last_timestamp": [v["last"] for v in hosts.values()],
            }
        )

    routed = events.select(
        F.lit(1).alias("g"), F.col("seq"), F.col("host"), F.col("timestamp")
    )
    return routed.groupBy("g").applyInPandasWithState(
        update,
        HOST_LRU_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
