"""SparkSession construction tuned for this engine.

The reference processes one Kafka record at a time on one thread
(report.py:262-268); partition parallelism existed (16-partition topics,
docker-compose.yml:48) but was never used. Here the session is configured so
Catalyst/AQE exploit all cores and so plans stay scale-ready:

- AQE on (runtime shuffle coalescing, skew-join splitting, dynamic join
  strategy) — the 100 TB posture is "declare the plan, let AQE re-plan".
- Arrow on — every pandas UDF (mmh3 keys, multimodal decode) moves data in
  columnar batches, not pickled rows.
- shuffle partitions sized to the local core count; on a real cluster this is
  overridden (or left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to *any* session (including one created
# by an external driver) before reading the test tables.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark cannot read natively;
    # read as LongType and convert (tables.py). Runtime-settable.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # All test data / the DuckDB oracle are timezone-naive UTC.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE family: runtime coalescing + skew handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Python DataSource filter pushdown stays OFF (the 4.1 default):
    # the JVM caches a reused base DataFrame's planned scan and does
    # not re-plan filterless queries, so any filter-dependent
    # partitions() silently loses rows under ordinary DataFrame reuse
    # (measured r11 — see the note in sources/txtable.py and the
    # canary test it names).
    "spark.sql.python.filterPushdown.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (driver-provided
    sessions included). Safe to call repeatedly."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this build — proceed; loaders
            # have fallbacks.
            pass
    return spark


def get_spark(
    app_name: str = "crawl-streams-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a tuned SparkSession.

    master defaults to local[$SPARK_GRAFT_CPUS] (env, default all cores);
    shuffle partitions default to the core count — at cluster scale pass a
    value sized so a shuffle partition is ~128-512 MiB and let AQE coalesce.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # getOrCreate() RE-APPLIES builder configs onto an EXISTING
        # session, so an embedded caller that didn't ask for a specific
        # partition count (the CLI inside pytest, say) would silently
        # re-tune the host's session to this process's core count —
        # partition-count-dependent plans (an aggregate above an
        # ArrowEvalPython node, which voids its child's
        # outputPartitioning) then change shape mid-session (the
        # pq_codes_fixed_book snapshot flake, r14). Default-parameter
        # callers get the existing session as-is; explicit
        # shuffle_partitions still applies, as requested.
        existing = SparkSession.getActiveSession()
        if existing is not None:
            return apply_runtime_confs(existing)
        shuffle_partitions = os.cpu_count() or 8 if cpus == "*" else int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Keep broadcast threshold at default 10 MiB; dimension tables
        # (region/nation/...) broadcast automatically. Explicit
        # broadcast() hints are reserved for provably BOUNDED relations
        # (SCALING.md hint policy); SF-growing sides are left to AQE's
        # dynamic join selection.
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
