"""Interleaved A/B for localCheckpoint-based plan truncation: "old" builds
the query with DataFrame.localCheckpoint monkeypatched to identity (full
duplicated subtrees), "new" is HEAD. Noop sink, same session, alternating.

Only valid for queries whose plan contains no PRE-EXISTING checkpoint the
old variant depends on (it disables all of them during build).

Usage: PYTHONPATH=. python scripts/ab_ckpt.py <rounds> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from crawl_streams_spark.plans import REGISTRY  # noqa: E402
from crawl_streams_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, query, use_ckpt):
    if use_ckpt:
        return REGISTRY[query].build(spark, sf_dir)
    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        return REGISTRY[query].build(spark, sf_dir)
    finally:
        DataFrame.localCheckpoint = orig


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    queries = sys.argv[2:] or ["concurrent_sessions"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab-ckpt", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for query in queries:
        for use in (False, True):  # warm both
            build(spark, sf_dir, query, use).write.format("noop").mode(
                "overwrite"
            ).save()
        times = {"old": [], "new": []}
        for r in range(rounds):
            for tag, use in (("old", False), ("new", True)):
                spark.sparkContext.setJobDescription(f"{query} {tag} r{r}")
                t0 = time.perf_counter()
                build(spark, sf_dir, query, use).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[tag].append(time.perf_counter() - t0)
        for tag, ts in times.items():
            ts = sorted(ts)
            print(
                f"{query} {tag}: min {ts[0]:.3f} median {ts[len(ts)//2]:.3f} "
                f"all {[round(t, 3) for t in ts]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
