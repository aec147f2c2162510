"""Interleaved A/B: old (agg + semi-join, subtree twice) vs new (window
functions, subtree once) duplicated_windows, same session, noop sink.

Usage: python scripts/ab_spans.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from crawl_streams_spark.operators import spans as SP  # noqa: E402
from crawl_streams_spark.plans import REGISTRY  # noqa: E402
from crawl_streams_spark.session import get_spark  # noqa: E402
from crawl_streams_spark.tables import load_table  # noqa: E402


def old_duplicated_windows(windows, min_docs=2, max_occurrences=None):
    counts = windows.groupBy("dig").agg(F.countDistinct("key").alias("n_docs"))
    dup = counts.filter(F.col("n_docs") >= min_docs)
    if max_occurrences is not None:
        dup = dup.filter(F.col("n_docs") <= max_occurrences)
    return windows.join(dup.select("dig"), "dig", "left_semi").select("key", "pos")


def build(spark, sf_dir, impl, query):
    orig = SP.duplicated_windows
    SP.duplicated_windows = impl
    try:
        return REGISTRY[query].build(spark, sf_dir)
    finally:
        SP.duplicated_windows = orig


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab-spans", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    impls = {"old": old_duplicated_windows, "new": SP.duplicated_windows}
    for query in ("doc_span_excision", "dup_span_doc_stats"):
        # warm both
        for tag, impl in impls.items():
            build(spark, sf_dir, impl, query).write.format("noop").mode(
                "overwrite"
            ).save()
        times = {t: [] for t in impls}
        for r in range(rounds):
            for tag, impl in impls.items():
                spark.sparkContext.setJobDescription(f"{query} {tag} r{r}")
                t0 = time.perf_counter()
                build(spark, sf_dir, impl, query).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[tag].append(time.perf_counter() - t0)
        for tag, ts in times.items():
            ts = sorted(ts)
            print(
                f"{query} {tag}: median {ts[len(ts)//2]:.3f} "
                f"all {[round(t,3) for t in ts]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
