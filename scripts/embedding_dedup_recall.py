"""Recall-vs-cost sweep for embedding_dedup's plane/signature dial
(operators/similarity.py):

    python -m scripts.embedding_dedup_recall [sf_dir]     # default sf0.01

Methodology: plant near-duplicates (perturb the first 8 coordinates of
unit vectors by +0.1 → cosine ≈ 0.96 to the original), run embedding_dedup
at threshold 0.9, report the fraction of planted pairs caught (recall) and
the candidate fraction — Σ_signatures Σ_buckets C(size,2) / C(n,2) — which
is the quantity that survives scale-up: at 100 TB the candidate fraction
IS the cost model.

The sweep walks an equal-budget family: (planes=p, sigs=1) vs
(planes=p+1, sigs=2) vs (planes=p+2, sigs=4) all expect the same number of
in-bucket comparisons (s·n²/2^(p+log2 s) = n²/2^p), so recall differences
are pure win. Output feeds the SCALING.md embedding-near-dup row.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from crawl_streams_spark.functions import vectors as V  # noqa: E402
from crawl_streams_spark.operators import similarity as S  # noqa: E402
from crawl_streams_spark.session import get_spark  # noqa: E402
from crawl_streams_spark.tables import load_table  # noqa: E402

N_PLANTED = 100
THRESHOLD = 0.9


def _planted(emb):
    return (
        emb.limit(N_PLANTED)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i < 8, x + F.lit(0.1)).otherwise(x),
            ),
        )
    )


def _candidate_fraction(full, num_planes, num_signatures, n):
    total = 0
    for s in range(num_signatures):
        sizes = (
            full.select(
                V.sign_bucket(
                    F.col("embedding"), S._planes(num_planes, 64, seed=s)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .count()
        )
        total += (
            sizes.agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2)
            ).collect()[0][0]
            or 0
        )
    return total / (n * (n - 1) / 2)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "dedup-recall", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    emb = load_table(spark, sf_dir, "embeddings").cache()
    full = emb.unionByName(_planted(emb)).cache()
    n = full.count()

    rows = []
    for planes, sigs in ((3, 1), (4, 2), (5, 4), (4, 1), (5, 2), (6, 4)):
        kept = S.embedding_dedup(
            full,
            threshold=THRESHOLD,
            num_planes=planes,
            num_signatures=sigs,
        )
        survivors = {
            r["vec_id"]
            for r in kept.select("vec_id").collect()
            if r["vec_id"] >= 1_000_000
        }
        recall = (N_PLANTED - len(survivors)) / N_PLANTED
        frac = _candidate_fraction(full, planes, sigs, n)
        rows.append(
            {
                "planes": planes,
                "signatures": sigs,
                "recall": round(recall, 3),
                "candidate_fraction": round(frac, 4),
            }
        )

    print(f"\ncorpus={n} planted={N_PLANTED} threshold={THRESHOLD} ({sf_dir})\n")
    print("| planes | signatures | planted-pair recall | candidate fraction |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['planes']} | {r['signatures']} | {r['recall']:.3f} "
            f"| {r['candidate_fraction']:.4f} |"
        )
    print()
    print(json.dumps({"metric": "embedding_dedup_recall", "rows": rows}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
