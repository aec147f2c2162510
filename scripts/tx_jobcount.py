"""Instrumented phase log for a registry query: Spark JOB COUNT and wall
time of one steady-state execution (guide §1.5 — setJobGroup scopes the
count to exactly the probed run; the warm run burns codegen/reader init).

The r14 MERGE/DML fusions are job-count claims ("one bounded agg replaces
the dup guard + per-clause-group prechecks"), so the evidence is the job
count of the same gate query before and after, not wall alone.

Usage: python scripts/tx_jobcount.py <query> [runs]
Prints one JSON line: {"query":..., "jobs": N, "walls": [..], "sf":...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from crawl_streams_spark.plans import REGISTRY  # noqa: E402
from crawl_streams_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "tx-jobcount", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    sc = spark.sparkContext
    q = REGISTRY[name]
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q.build(spark, sf_dir).collect()  # warm
    walls = []
    jobs = None
    for i in range(runs):
        group = f"probe{i}"
        sc.setJobGroup(group, f"{name} probe run {i}")
        t0 = time.perf_counter()
        q.build(spark, sf_dir).collect()
        walls.append(round(time.perf_counter() - t0, 3))
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    print(json.dumps({
        "query": name, "jobs": jobs, "walls": walls, "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
