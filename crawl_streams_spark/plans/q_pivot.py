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


@query(
    "unpivot_lineitem_metrics",
    oracle="""
        WITH wide AS (
            SELECT l_returnflag,
                   ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty,
                   CAST(COUNT(*) AS DOUBLE) AS n_items,
                   ROUND(CAST(MAX(l_extendedprice) AS DOUBLE), 4) AS max_price
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'n_items', n_items FROM wide
        UNION ALL
        SELECT l_returnflag, 'max_price', max_price FROM wide
    """,
    tags=("unpivot", "melt", "engine-surface", "extension"),
)
def unpivot_lineitem_metrics(spark, sf_dir):
    """UNPIVOT / melt (round 7 — the wide→long half of the reshaping
    surface, complementing status_pivot's long→wide): per-returnflag
    metrics computed as columns, then melted to (key, metric, value)
    rows via DataFrame.unpivot. The oracle is the portable UNION ALL
    expansion, so the gate certifies Spark's Expand-based unpivot
    against first-principles SQL. Metrics are DECIMAL-exact before the
    final rounded DOUBLE cast (the hash-compare float discipline);
    unpivot requires a common value type, hence the uniform DOUBLE."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double"), 4
        ).alias("sum_qty"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
        F.round(F.max("l_extendedprice").cast("double"), 4).alias("max_price"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "n_items", "max_price"],
        "metric",
        "value",
    )
