"""Pareto-frontier (skyline) computation: the rows not strictly
dominated on a (minimize cost, maximize gain) pair — the multi-objective
shortlist operator (Börzsönyi et al. 2001, "The Skyline Operator").

The naive formulation is a quadratic NOT EXISTS self-join; the
DataFrame form here is two aggregates and one window:

1. collapse to one row per distinct cost with the best gain at that cost
   (same-cost dominance resolved map-side);
2. a running strict-max of gain over cheaper costs — a cost survives iff
   its best gain EXCEEDS every cheaper cost's best gain (ties lose: a
   strictly cheaper row with equal gain dominates);
3. rejoin to keep every input row sitting exactly on a surviving
   (cost, best-gain) point (co-located duplicates all survive — neither
   strictly dominates the other). The rejoin carries NO broadcast hint
   (r6 hint policy, SCALING.md): skylines are usually tiny and AQE
   broadcasts them, but the frontier is worst-case one row per distinct
   cost (an anti-chain can be the whole input), so a forced hint would
   be the deferred 8 GB job-killer the policy exists to prevent.

Scale (100 TB): step 1 is an ordinary partial-agg'd shuffle keyed on
cost; the window in step 2 runs over the AGGREGATED relation (one row
per distinct cost — typically ≪ input; if even that is huge, range-split
the cost axis, compute per-range frontiers, and re-run the merge on the
concatenated candidates — the standard divide-and-conquer skyline; the
per-range pass is this same operator). The rejoin broadcasts the
frontier when it is small, which skylines almost always are.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rows of ``df`` on the (min ``cost_col``, max ``gain_col``) Pareto
    frontier, independently per group when ``group_cols`` is given.
    Exact strict-dominance semantics: a row survives iff no other row
    (of its group) is ≤ on cost AND ≥ on gain with at least one strict.

    Grouped skylines keep the sweep window partitioned (parallel across
    groups); the ungrouped form's window runs over the per-distinct-cost
    aggregate only."""
    keys = [*group_cols, cost_col]
    per_cost = df.groupBy(*keys).agg(
        F.max(gain_col).alias("__best_gain")
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(cost_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_cost.withColumn("__prev_best", F.max("__best_gain").over(w))
        .filter(
            F.col("__prev_best").isNull()
            | (F.col("__best_gain") > F.col("__prev_best"))
        )
        .select(*keys, "__best_gain")
    )
    return (
        df.join(frontier, keys)
        .filter(F.col(gain_col) == F.col("__best_gain"))
        .drop("__best_gain")
    )
