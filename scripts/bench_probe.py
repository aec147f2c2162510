"""Measurement harness for the optimization rounds (guide §1).

For each bench-tagged query: save .explain("formatted") to
$SPARK_GRAFT_PLANS_DIR/<name>_<tag>.txt (default plans/r14) and time
three noop-sink runs (plan rebuilt per run). Prints one JSON line with
the median per query.

Usage: python scripts/bench_probe.py <tag> [query ...]
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
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    plans_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "plans/r14")
    os.makedirs(plans_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if only:
        # explicit names probe ANY registry query, not just bench-tagged
        names = [n for n in sorted(REGISTRY) if n in only]
    else:
        names = [n for n in sorted(REGISTRY) if REGISTRY[n].bench]
    out: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        df = q.build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{plans_dir}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        spark.sparkContext.setJobDescription(f"{name} warm")
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[1], 3)
        print(f"{name}: median {out[name]} runs {[round(r,3) for r in runs]}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
