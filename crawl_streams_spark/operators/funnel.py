"""Windowed funnel analysis: the max ordered-step level a user reaches
within a time window (ClickHouse ``windowFunnel`` semantics, Amplitude
"conversion window" funnels).

No counterpart in the reference (its analytics stop at per-host
aggregation — analysis.py's rollups); this extends the behavioral family
(plans/q_behavior.py) with the time-bounded variant: a chain of step
events must be a subsequence of the user's (ts, tie-break)-ordered
stream AND the whole chain must span at most ``window_seconds`` from its
FIRST step.

Spark-first shape: one shuffle on the user key, then a per-user
``aggregate`` HOF fold over the sorted event array — a greedy DP that is
exact (see ``window_funnel``), runs entirely in whole-stage codegen (no
UDF), and is O(events · levels) per user.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["window_funnel"]


def window_funnel(
    df: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    level_col: str = "funnel_level",
) -> DataFrame:
    """Per user: the deepest funnel level reached, where level k means
    events of types ``steps[0] .. steps[k-1]`` occur as a SUBSEQUENCE of
    the user's stream under the (ts, tiebreak) total order, with the
    k-th step at most ``window_seconds`` after the FIRST step of that
    chain. Users with at least one step-typed event appear; a user whose
    step events never include ``steps[0]`` gets level 0.

    Exactness of the greedy fold: scanning events in stream order,
    ``best[i]`` holds the LATEST possible chain-start timestamp over all
    valid chains of length i seen so far. A step-(i+1) event at time t
    extends SOME chain iff it extends the latest-starting one
    (maximizing the start minimizes t − start, the only window-feasibility
    quantity, and every recorded chain lies strictly earlier in the
    order), so the single-state DP decides existence exactly — the same
    argument ClickHouse's windowFunnel relies on. Because each chain is
    a subsequence of the ORDER (not of strictly increasing timestamps),
    equal-timestamp events chain in tie-break order, which a SQL oracle
    replays with ``(b.ts > a.ts OR (b.ts = a.ts AND b.tb > a.tb))``
    join conditions.

    Scale: filter to step types (pushed to the scan), ONE exchange on
    ``user_col``, per-user sort inside collect_list+array_sort, then a
    constant-size-accumulator fold — no window over unbounded frames, no
    Python. Skewed users cost O(their events), not O(events²).

    ``tiebreak_col`` must cast to LONG (a numeric event id); a
    non-numeric id would cast to NULL and collapse the equal-timestamp
    ordering."""
    k = len(steps)
    if k < 2:
        raise ValueError("steps must name at least 2 ordered event types")
    if len(set(steps)) != k:
        raise ValueError("steps must be distinct event types")
    tb_type = dict(df.dtypes).get(tiebreak_col, "")
    # Exact dtype match (ADVICE r5: a startswith('int') prefix also
    # accepts 'interval ...' columns, which cast('long') to NULL — the
    # silent tie-order collapse this guard exists to prevent).
    if tb_type not in {"int", "bigint", "smallint", "tinyint", "long",
                       "short", "byte"}:
        raise ValueError(
            f"tiebreak_col {tiebreak_col!r} must be an integer column "
            f"(got {tb_type or 'missing'}): a non-numeric id casts to "
            "NULL and collapses the equal-timestamp ordering"
        )
    step_map = F.create_map(
        *[F.lit(x) for i, s in enumerate(steps) for x in (s, i + 1)]
    )
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col),
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.element_at(step_map, F.col(type_col)).alias("step"),
        ).alias("__e"),
    )
    arr = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("__e")).alias("__evs")
    )
    w_us = int(window_seconds) * 1_000_000
    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def _advance(acc, x):
        out = [
            F.when(
                x["step"] == 1, F.greatest(acc[0], x["t"])
            ).otherwise(acc[0])
        ]
        for i in range(1, k):
            can = (
                (x["step"] == i + 1)
                & acc[i - 1].isNotNull()
                & ((x["t"] - acc[i - 1]) <= F.lit(w_us))
            )
            # new chain of length i+1 inherits the length-i chain's start
            out.append(
                F.when(can, F.greatest(acc[i], acc[i - 1])).otherwise(acc[i])
            )
        return F.array(*out)

    state = F.aggregate("__evs", init, _advance)
    level = F.coalesce(
        *[
            F.when(state[i].isNotNull(), F.lit(i + 1))
            for i in range(k - 1, -1, -1)
        ],
        F.lit(0),
    )
    return arr.select(
        F.col(user_col), level.cast("int").alias(level_col)
    )
