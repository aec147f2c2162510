"""Keyed table diff: classify rows of two snapshots of the same table as
added / removed / changed / unchanged — the primitive behind incremental
MERGE maintenance, CDC reconciliation, and re-crawl drift reports (the
batch analog of the reference's `duplicate:digest` annotation, which marks
a refetch whose content digest is unchanged — analysis.py annotation
classes).

Scale (100 TB snapshots):
- one full-outer shuffle join keyed on the (narrow) business key; AQE
  handles size asymmetry and key skew;
- row content is compared through a fixed-width md5 digest computed in a
  narrow projection BELOW the join, so the exchange carries
  (key, 32-byte digest), never the row's payload columns;
- for repeated diffs of partitioned snapshots, pre-partitioned/bucketed
  layouts co-locate the join (layout.py); the operator itself stays
  layout-agnostic.

Null semantics: each compared column is rendered with an out-of-band NULL
sentinel before digesting, so NULL ≠ '' ≠ 'NULL-string' and column
boundaries can't alias (unit-separator joins with a distinct sentinel).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["row_digest", "table_diff", "diff_summary"]

_SEP = "\x1f"
_NULL = "\x00\x00N"


def row_digest(df: DataFrame, cols: list[str]) -> F.Column:
    """md5 over the listed columns with sentinel null-encoding — a
    fixed-width change detector for wide rows."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Full-outer keyed diff. Returns one row per key present in either
    snapshot: key columns + ``change_type`` ∈
    {'added','removed','changed','unchanged'}.

    ``compare_cols`` defaults to all shared non-key columns. Digests are
    staged below the join so the shuffle carries (key, digest) only."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, row_digest(old, compare_cols).alias("__od"))
    n = new.select(*key_cols, row_digest(new, compare_cols).alias("__nd"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__od").isNull(), F.lit("added"))
        .when(F.col("__nd").isNull(), F.lit("removed"))
        .when(F.col("__od") != F.col("__nd"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, change.alias("change_type"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """(change_type, n) rollup of a diff — the reconciliation report."""
    return diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n"))
