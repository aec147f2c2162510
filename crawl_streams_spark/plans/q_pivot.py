"""Pivot (engine surface): long→wide reshaping of the per-host histogram
family — A-3/A-4's nested-map snapshot rendered as columns instead."""

from __future__ import annotations

import pyspark.sql.functions as F

from ..tables import load_table
from .registry import query

_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "status_pivot",
    oracle=f"""
        SELECT user_id,
               {", ".join(
                   f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}"
                   for t in _TYPES
               )}
        FROM events
        GROUP BY user_id
    """,
    tags=("pivot", "agg", "engine-surface"),
)
def status_pivot(spark, sf_dir):
    """groupBy().pivot() with pinned value list (the scale-safe form — an
    unpinned pivot runs a distinct-scan planning job first). Missing combos
    are 0 to match the oracle's FILTER counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _TYPES)
        .count()
        .na.fill(0, _TYPES)
    )
