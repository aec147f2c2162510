"""Steady-state timing sweep of EVERY registry query (bench.py covers only
the bench-tagged headline set). The per-round perf feedback loop:

    python -m scripts.sweep_timings [sf_dir]          # default sf0.1

Each query runs twice and the second, REBUILT run is reported — rebuilding
matters: re-collecting the same DataFrame object reuses shuffle files and
reads ~5× too fast (ROUNDLOG lesson 8). Slowest first; anything that stands
out by an order of magnitude is a plan bug, not a data cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl_streams_spark.plans import REGISTRY  # noqa: E402
from crawl_streams_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "sweep", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    times: dict[str, float] = {}
    import gc

    for name, q in sorted(REGISTRY.items()):
        try:
            q.build(spark, sf_dir).collect()  # warm: codegen + reader init
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()  # steady state, rebuilt plan
            times[name] = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"FAIL {name}: {str(e)[:200]}", file=sys.stderr)
        # release dropped localCheckpoint blocks NOW: 191 queries of
        # lazily-GC'd pins in one session inflate late queries 2-4×
        # (r13: dup_span_doc_stats read 6.6 s in-session vs 1.75 fresh)
        gc.collect()
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{t:8.2f}  {name}")
    ok = [t for t in times.values() if t >= 0]
    print(f"\ntotal {sum(ok):.1f}s over {len(ok)} queries at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
