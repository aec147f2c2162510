"""Data-quality validation: declarative rule sets evaluated in ONE
aggregate pass (the Deequ/expectations pattern — arXiv:1809.04285
describes the approach; this is an independent DataFrame-native
implementation), plus referential-integrity checks as anti-join counts.

Why one pass matters at 100 TB: a naive validator runs one
``df.filter(~rule).count()`` per rule — R full scans. Here every scalar
rule becomes a conditional-sum column in a single aggregation, so the
table is read once regardless of rule count, the partial aggregates
combine map-side, and the result is a tiny (rule, counts) relation.
Referential rules can't ride the same scan (they need the parent table);
each is one left-anti join, keyed on the FK — broadcast when the parent
is a dimension.

NULL discipline: a rule predicate that evaluates to NULL (e.g. comparing
a NULL value) counts as a VIOLATION — unknown is not a pass. Rules that
want to allow NULLs say so explicitly (``col.isNull() | predicate``).

Reference parity: the reference validates nothing (it trusts its Kafka
payloads; test.py only smoke-checks connectivity) — driver-mandated
pipeline extension (SURVEY §7.6 tier).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["validation_report", "fk_violations", "combined_report"]


def validation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate scalar rules in one scan. Returns one row per rule:
    (rule, n_rows, n_violations, violation_fraction), fraction rounded to
    6 decimals (order-insensitive integer counts underneath)."""
    if not rules:
        raise ValueError("validation_report needs at least one rule")
    aggs = [
        F.sum(
            F.when(F.coalesce(rule, F.lit(False)), 0).otherwise(1)
        )
        .cast("bigint")
        .alias(f"__v_{i}")
        for i, (_, rule) in enumerate(rules.items())
    ]
    counted = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_args = ", ".join(
        f"'{name}', __v_{i}" for i, name in enumerate(rules)
    )
    long = counted.select(
        F.col("__n"),
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
    )
    return long.select(
        "rule",
        F.col("__n").alias("n_rows"),
        "n_violations",
        F.round(
            F.col("n_violations") / F.greatest(F.col("__n"), F.lit(1)), 6
        ).alias("violation_fraction"),
    )


def fk_violations(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    rule_name: str | None = None,
) -> DataFrame:
    """Referential-integrity check: child rows whose FK has no match in
    the parent (NULL FKs violate — same unknown-is-not-a-pass stance).
    Same output schema as validation_report, so reports union cleanly."""
    name = rule_name or f"{fk_col}_in_{pk_col}"
    total = child.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    orphans = (
        child.select(F.col(fk_col))
        .join(
            parent.select(F.col(pk_col).alias(fk_col)).distinct(),
            [fk_col],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )
    return total.crossJoin(orphans).select(
        F.lit(name).alias("rule"),
        F.col("__n").alias("n_rows"),
        "n_violations",
        F.round(
            F.col("n_violations") / F.greatest(F.col("__n"), F.lit(1)), 6
        ).alias("violation_fraction"),
    )


def combined_report(*reports: DataFrame) -> DataFrame:
    """Union rule reports (scalar + referential) into one relation."""
    if not reports:
        raise ValueError("combined_report needs at least one report")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
