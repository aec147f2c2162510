"""Registry plumbing for driver-contract queries.

Each entry pairs a Spark DataFrame builder with the ANSI-SQL oracle DuckDB
runs on the same parquet tables. Column names are aliased identically on
both sides (the driver sorts columns by name before value-hashing).

Conventions that keep the two engines hash-identical:

- ``events.ts`` is TIMESTAMP(NANOS) parquet: Spark side loads it µs-truncated
  (tables.py); oracle SQL always writes ``CAST(ts AS TIMESTAMP)`` (DuckDB's
  ns→µs truncating cast) before exposing or bucketing it.
- Sums of doubles are rounded (ROUND(x, 4)) on both sides, or cast to
  DECIMAL, so shuffle-order float noise can't flip the hash.
- Ordered-limit queries always carry a total deterministic ORDER BY
  (tie-broken by a key column) on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = False
    doc: str = field(default="")


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name,
            build=fn,
            oracle=oracle,
            tags=tags,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco
