"""Regenerate tests/plan_snapshots.json — the pinned physical-plan metrics
for every registry query at sf0.001.

Run after intentionally changing a query's plan:

    python -m scripts.update_plan_snapshots

then review the diff: an increased shuffle count or a broadcast that became
a sort-merge join is a scale regression unless you can argue otherwise in
the commit message."""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl_streams_spark.plans import REGISTRY  # noqa: E402
from crawl_streams_spark.plans.audit import plan_metrics  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SNAPSHOT_SF", "/root/testdata/sf0.001")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_snapshots.json",
)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        # shuffle_partitions must MATCH the pytest fixture (conftest:
        # local[4], 4): an ArrowEvalPython node drops its child's
        # outputPartitioning, so whether the aggregate above it needs an
        # exchange depends on the partition count — a snapshot taken at
        # 8 drifts against the fixture's 4 (r14).
        .config("spark.sql.shuffle.partitions", "4")
        .appName("plan-snapshots")
        .getOrCreate()
    )
    snaps = {}
    for name in sorted(REGISTRY):
        snaps[name] = plan_metrics(REGISTRY[name].build(spark, SF_DIR))
    with open(OUT, "w") as f:
        json.dump(snaps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(snaps)} snapshots to {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
