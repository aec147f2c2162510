"""Interval joins as bucketed equi-joins: point-in-interval and
interval-overlap matching without a nested-loop plan.

Spark has no native range-join optimization (a plain ``a.start <= b.p AND
b.p <= a.end`` condition plans as BroadcastNestedLoopJoin, or a cartesian
product when neither side broadcasts — O(n·m) row comparisons). The classic
fix is temporal bucketing:

  bucketize  map the numeric/temporal axis into fixed-width buckets;
             intervals explode to every bucket they cover (``sequence``),
             points map to exactly one bucket
  equi-join  join on (optional keys..., bucket) — a plain shuffled or
             broadcast hash join Catalyst already knows how to plan
  refine     re-check the exact range predicate (bucket co-residency is a
             superset of true overlap)
  attribute  a true pair can co-reside in several buckets; instead of a
             dropDuplicates shuffle, keep only the bucket containing the
             pair's overlap START (``bucket == floor(max(starts)/w)``) —
             every overlapping pair survives in exactly one bucket, so the
             join output is duplicate-free by construction

Scale (100 TB): cost is one shuffle of ``rows × (covered buckets)`` slim
tuples per side. Pick ``bucket_width`` near the p95 interval length: too
narrow multiplies the explode factor, too wide multiplies the refine-filter
fan-in per bucket. Dense hot buckets (everyone overlaps noon) are ordinary
join-key skew — AQE skew-join splits them, or salt the bucket key. The
explode factor for an interval is ``len/width + 1``; a pathological
interval spanning the whole axis explodes to the full bucket range, so cap
interval length upstream or raise ``bucket_width``.

Reference parity: the reference engine has no range join (its joins are
python-dict lookups over small recentness windows, analysis.py); this is a
driver-mandated engine capability (SURVEY §2.7 joins family).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "bucket_of",
    "explode_interval_buckets",
    "point_in_interval_join",
    "interval_overlap_join",
]


def bucket_of(col: Column | str, width: int) -> Column:
    """Bucket index of a non-negative int64 axis value (e.g. unix micros).

    ``floor(col / width)`` — exact for values < 2^53 (timestamps in micros
    are ~1.7e15 for year 2024; IEEE division of exactly-representable
    operands here rounds to a value whose floor is the true integer
    quotient)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / F.lit(width)).cast("bigint")


def explode_interval_buckets(
    df: DataFrame,
    start_col: str,
    end_col: str,
    width: int,
    bucket_name: str = "__bucket",
) -> DataFrame:
    """One output row per bucket the closed interval [start, end] covers.

    The exploded relation carries only the input columns plus the bucket —
    keep the input projection slim (ids + bounds) so the shuffle that
    follows carries no payload."""
    return df.withColumn(
        bucket_name,
        F.explode(
            F.sequence(
                bucket_of(start_col, width), bucket_of(end_col, width)
            )
        ),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
    keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Match each point row to every closed interval [start, end]
    containing it: intervals explode to covered buckets, points join on
    their single bucket (plus ``keys``), then the exact containment
    predicate refines. A point has exactly one bucket, so the output is
    duplicate-free without attribution logic.

    ``how="left"`` keeps points contained in NO interval, with the
    interval columns null — the AS-OF/gap semantics a point-in-time
    lookup needs. One bucketed join instead of the dedup + inner join +
    join-back chain callers otherwise build (r13: that chain cost
    lineitem_price_asof_scd2 three extra SF-linear exchanges); still an
    equi-join on (keys..., bucket), never a nested loop.

    Point and interval column names must be disjoint apart from ``keys``
    (rename upstream — cheap projections, no data movement)."""
    if how not in ("inner", "left"):
        raise ValueError(f"point_in_interval_join: how must be 'inner' "
                         f"or 'left', got {how!r}")
    # Enforce the disjointness contract up front (ADVICE r13): the left
    # form binds the join condition through DataFrame-apply references,
    # and a shared non-key name would silently misbind (or surface as an
    # ambiguity error deep inside Spark) instead of pointing here.
    shared = (set(points.columns) & set(intervals.columns)) - set(keys)
    if shared:
        raise ValueError(
            "point_in_interval_join: point and interval column names "
            f"must be disjoint apart from keys={sorted(keys)}; shared "
            f"columns {sorted(shared)} — rename upstream (a cheap "
            "projection, no data movement)"
        )
    b = "__piij_bucket"
    pts = points.withColumn(b, bucket_of(point_col, width))
    ivs = explode_interval_buckets(
        intervals, start_col, end_col, width, bucket_name=b
    )
    if how == "inner":
        contained = (F.col(start_col) <= F.col(point_col)) & (
            F.col(point_col) <= F.col(end_col)
        )
        return pts.join(ivs, [*keys, b], "inner").filter(contained).drop(b)
    # left: the containment refine must ride IN the join condition — as
    # a post-join filter it would drop the very null rows the left join
    # exists to keep (a gap point's interval columns are null, so the
    # predicate evaluates null and the filter removes the row).
    ren = {c: f"__piij_r_{c}" for c in (*keys, b)}
    r = ivs
    for old, new in ren.items():
        r = r.withColumnRenamed(old, new)
    cond = pts[b] == r[ren[b]]
    for k in keys:
        cond = cond & (pts[k] == r[ren[k]])
    cond = (
        cond
        & (r[start_col] <= pts[point_col])
        & (pts[point_col] <= r[end_col])
    )
    return pts.join(r, cond, "left").drop(b, *ren.values())


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    width: int,
    keys: tuple[str, ...] = (),
    right_prefix: str = "r_",
    extra_on: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs whose closed intervals overlap
    (``l.start <= r.end AND r.start <= l.end``), each emitted exactly once.

    Non-key right columns are renamed with ``right_prefix`` so self-joins
    and shared schemas stay unambiguous; ``keys`` (same name both sides)
    become ordinary equi-join columns kept once. ``extra_on`` is an
    additional predicate over the joined row (e.g. exclude same-entity
    pairs), applied with the refine filter.

    Output: left columns + prefixed right columns (keys unprefixed)."""
    b = "__iolj_bucket"
    ren = {
        c: f"{right_prefix}{c}" for c in right.columns if c not in keys
    }
    r = right
    for old, new in ren.items():
        r = r.withColumnRenamed(old, new)
    clash = set(left.columns) & set(ren.values())
    if clash:
        raise ValueError(
            f"right_prefix {right_prefix!r} collides with left columns "
            f"{sorted(clash)}"
        )
    rs, re_ = ren[right_start], ren[right_end]
    lx = explode_interval_buckets(left, left_start, left_end, width, b)
    rx = explode_interval_buckets(r, rs, re_, width, b)
    overlap = (F.col(left_start) <= F.col(re_)) & (
        F.col(rs) <= F.col(left_end)
    )
    attributed = F.col(b) == bucket_of(
        F.greatest(F.col(left_start), F.col(rs)), width
    )
    refine = overlap & attributed
    if extra_on is not None:
        refine = refine & extra_on
    return lx.join(rx, [*keys, b], "inner").filter(refine).drop(b)
