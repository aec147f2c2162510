"""Physical-plan audit metrics — the engine's scale fingerprint.

``plan_metrics`` reduces a DataFrame's pre-execution physical plan to the
handful of counters that decide 100 TB behavior: how many shuffles
(Exchange), which join strategies, whether any stage drops into Python, and
whether top-k planned as a bounded TakeOrderedAndProject. Tests pin these
per query in ``tests/plan_snapshots.json`` — a plan regression (an extra
shuffle, a broadcast silently turning into a sort-merge join, a new Python
stage) fails CI even while results stay correct."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["plan_metrics"]


def _physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_metrics(df: DataFrame) -> dict:
    """Counters over the initial physical plan (deterministic for fixed
    input files; AQE may improve but never worsen them at runtime)."""
    plan = _physical_plan(df)
    # one matched line per Exchange node; the node text carries the shuffle
    # origin (ENSURE_REQUIREMENTS for organic shuffles, REPARTITION_BY_NUM
    # for explicit .repartition(n[, col]) calls)
    keyed_exchanges = re.findall(
        r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)[^\n]*",
        plan,
    )
    return {
        # every Exchange is a full shuffle (or a broadcast distribute);
        # count only organic keyed shuffles here (joins/aggregations/
        # windows) — broadcasts and explicit rebalances are counted
        # separately below
        "shuffle_exchanges": len(
            [e for e in keyed_exchanges if "REPARTITION_BY_NUM" not in e]
        ),
        # explicit parallelism rebalances: repartition(n) round-robins and
        # the small-input floor in tables.load_table (repartition(n, id) —
        # hash-on-id for determinism, REPARTITION_BY_NUM origin). Not
        # organic keyed shuffles, but data still crosses the wire; tracked
        # separately so a guard that should no-op at scale can't silently
        # multiply
        "rebalance_exchanges": len(re.findall(r"Exchange RoundRobinPartitioning", plan))
        + len([e for e in keyed_exchanges if "REPARTITION_BY_NUM" in e]),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "python_stages": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        # a window whose spec starts with an ordered column or the frame
        # itself has NO partition columns — the whole input serializes
        # through one task. Always a scale bug in this engine (scalar
        # 1-row aggregates legitimately single-partition; windows never).
        "global_windows": len(
            re.findall(
                r"windowspecdefinition\((?:[\w.#]+L? (?:ASC|DESC)|specifiedwindowframe)",
                plan,
            )
        ),
    }
