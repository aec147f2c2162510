"""Skew-aware join utilities (SURVEY §4.3 scale posture).

AQE's skew-join splitting handles sort-merge skew automatically; this is
the explicit salting pattern for the cases AQE can't fix — aggregation-side
skew and broadcast-ineligible hot-key joins (a handful of hosts owning a
large share of 100 TB of crawl events is the expected shape: the sample
itself is 84% one host's quota-storm rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, buckets: int, col: str = "salt") -> DataFrame:
    """Uniform random-ish salt derived from a hash of the whole row id
    space — deterministic per row via monotonically-increasing id is NOT
    stable across retries, so salt from data: xxhash of all columns."""
    return df.withColumn(
        col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_groupby_count(
    df: DataFrame, key: str, buckets: int = 16
) -> DataFrame:
    """Two-phase skew-proof count: groupBy((key, salt)) partial counts →
    groupBy(key) final sum. The hot key's rows spread over ``buckets``
    reducers in phase one instead of serializing on one."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "salt").agg(F.count("*").alias("partial_n"))
    return partial.groupBy(key).agg(F.sum("partial_n").alias("n"))


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    buckets: int = 16,
) -> DataFrame:
    """Hot-key replicated join: fact rows of hot keys get a random salt,
    dim rows of hot keys are replicated across all salts; cold keys join
    normally with salt 0. Equivalent to an inner equi-join on ``key`` but
    the hot key's fact rows fan across ``buckets`` tasks.

    (Only needed when the dim side is too big to broadcast; otherwise
    broadcast wins.)"""
    is_hot = F.col(key).isin(hot_keys)
    f = fact.withColumn(
        "__salt",
        F.when(is_hot, F.pmod(F.xxhash64(*fact.columns), F.lit(buckets))).otherwise(
            F.lit(0)
        ),
    )
    d = dim.withColumn(
        "__salts",
        F.when(
            is_hot, F.sequence(F.lit(0), F.lit(buckets - 1))
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("__salt", F.explode("__salts")).drop("__salts")
    return f.join(d, [key, "__salt"]).drop("__salt")
