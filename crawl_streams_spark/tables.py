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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts to TIMESTAMP_NTZ (µs)."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # epoch-nanos long → µs-truncated naive timestamp (UTC session tz is
        # set by apply_runtime_confs, making the NTZ cast an identity shift).
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")).cast(
                "timestamp_ntz"
            ),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register all tables as temp views (for spark.sql-built queries)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name + suffix)
