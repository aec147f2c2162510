"""Loaders for the driver-provided test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under /root/testdata/sf*/.

The one data quirk handled here: ``events.ts`` is parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects. We flip the runtime conf
``spark.sql.legacy.parquet.nanosAsLong`` so the column arrives as LongType
(epoch nanos) and convert to TIMESTAMP_NTZ with microsecond truncation —
matching DuckDB's TIMESTAMP_NS→TIMESTAMP cast, which the oracle SQL applies
explicitly (CAST(ts AS TIMESTAMP)).

At 100 TB these loaders are unchanged: spark.read.parquet over a directory
prefix gives partition pruning + predicate pushdown for free; nothing here
collects to the driver.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Tables whose downstream pipelines are COMPUTE-heavy per row (shingle
#: hashing, signature math, vector folds) get a minimum-parallelism floor
#: (below), hash-distributed on their unique id column. Scan→aggregate/join
#: tables (lineitem/orders/events/...) do NOT: partial aggregation and
#: broadcast joins already minimize their wire volume, and a rebalance
#: would move raw rows for little gain — their serial test-scale scans are
#: bounded by I/O, not compute.
FACT_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}


#: (path, cores) → the scan's split count when it needs the parallelism
#: floor, else None. The partition-count probe (df.rdd.getNumPartitions())
#: converts the plan to an RDD driver-side — a few hundred ms — so the
#: verdict is cached: file layout under a path doesn't change mid-session.
_NEEDS_REBALANCE: dict[tuple[str, int], int | None] = {}

#: Default spread-target multiplier for loads that pass an explicit
#: ``spread_factor``: the guarded rebalance then targets
#: min(defaultParallelism, factor × scan splits) instead of the raw core
#: count (VERDICT r13 item 5: the unconditional defaultParallelism
#: target over-partitioned single-split inputs badly enough to make 32
#: cores 2.3× slower than 8 on dedup_exact). A GLOBAL bound was
#: A/B-measured (r14) and REJECTED: compute-heavy consumers of the same
#: tables want the full width — media_flac_features 0.90 → 1.82 s and
#: top_unshipped_orders 0.71 → 1.41 s at 32 cores under a 4×splits
#: bound — so the bound is a per-load dial for pipelines whose per-row
#: work is light, not a loader-wide rule. Env-tunable for cluster
#: profiles; at any real scale the guard never fires.
SPREAD_FACTOR = int(os.environ.get("SPARK_GRAFT_SPREAD_FACTOR", "4"))

#: path → inferred parquet schema. Every bare ``spark.read.parquet(path)``
#: fires a one-task footer-read job (~0.2-0.3 s of driver+task latency)
#: to infer the schema; a query plan that is rebuilt per run (the bench
#: methodology — plans are never reused across timed runs) pays it once
#: per table per build. The schema of a static table is metadata, not
#: data: cache the StructType after the first inference and pass it
#: explicitly on later loads (``spark.read.schema(s).parquet``), which
#: skips the inference job entirely while still scanning the parquet
#: bytes on every execution. (r13 measurement: regional_revenue spent
#: ~1.2 s of its 3.2 s noop time in five footer jobs.)
_SCHEMA_CACHE: dict[str, "object"] = {}


def _ensure_min_parallelism(
    df: DataFrame,
    spark: SparkSession,
    path: str,
    id_col: str | tuple[str, ...],
    factor: int | None = None,
) -> DataFrame:
    """Small-input guard: when the source scan yields fewer partitions than
    half the cores, repartition to defaultParallelism, HASHED on the
    table's unique id column.

    Why: a single parquet file with one row group scans as ONE partition,
    serializing every downstream narrow pipeline (the compute-heavy
    minhash/simhash/text stages measured 1 core busy, 31 idle). At
    production scale inputs carry orders of magnitude more splits than
    cores, the condition is false, and no exchange is added — the guard
    exists solely for the degenerate small-file case, where the shuffle it
    adds is proportionally tiny (the whole file).

    Hash-on-id, NOT round-robin: RoundRobinPartitioning draws a fresh
    random start index per evaluation, so two evaluations of the same
    plan place rows in different partitions — every downstream
    ``limit``/sample, and any operator that evaluates a shared subtree
    twice, silently stops being reproducible. Hashing the unique id gives
    the same balanced layout deterministically.

    ``factor``: when set, BOUND the target BY INPUT SIZE —
    min(defaultParallelism, factor × splits) — instead of the raw core
    count. r13's scaling block showed the unconditional target
    inverting (dedup_exact 2.3× slower on 32 cores than 8) because a
    one-split input spread 32 ways pays 32 partitions of shuffle/
    partial-agg/scheduling overhead for sub-MB of data; pipelines with
    HEAVY per-row work (codec decode, signature math) keep the full
    width — see the SPREAD_FACTOR note for the measured split."""
    cores = spark.sparkContext.defaultParallelism
    key = (path, cores)
    if key not in _NEEDS_REBALANCE:
        nparts = df.rdd.getNumPartitions()
        _NEEDS_REBALANCE[key] = (
            nparts if nparts < max(1, cores // 2) else None
        )
    splits = _NEEDS_REBALANCE[key]
    if splits is None:
        return df
    target = cores if factor is None else min(cores, factor * splits)
    if target <= splits:
        return df
    cols = (id_col,) if isinstance(id_col, str) else tuple(id_col)
    return df.repartition(target, *[F.col(c) for c in cols])


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    spread_on: tuple[str, ...] | None = None,
    spread_factor: int | None = None,
) -> DataFrame:
    """Load one test table; normalizes events.ts to TIMESTAMP_NTZ (µs).

    ``spread_on``: opt-in parallelism floor for this load, hash-
    partitioned on the given columns (same guard as FACT_TABLES —
    a no-op whenever the scan already carries enough splits, i.e. at
    any real scale). Used by queries whose pre-shuffle work (join
    probes, heavy partial aggregation) measurably serializes on the
    single-row-group test files; hash keys keep placement
    deterministic across evaluations.

    ``spread_factor``: bound the floor's target at
    min(cores, factor × scan splits) for consumers whose per-row work
    is LIGHT (see _ensure_min_parallelism — over-partitioning a tiny
    input costs more than the parallelism buys)."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos long → µs-truncated naive timestamp (UTC session tz is
        # set by apply_runtime_confs, making the NTZ cast an identity shift).
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")).cast(
                "timestamp_ntz"
            ),
        )
    if name in FACT_TABLES:
        df = _ensure_min_parallelism(
            df, spark, path, FACT_TABLES[name], factor=spread_factor
        )
    elif spread_on:
        df = _ensure_min_parallelism(
            df, spark, path, spread_on, factor=spread_factor
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register all tables as temp views (for spark.sql-built queries)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name + suffix)
