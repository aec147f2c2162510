"""Recall-vs-cost report for the ANN family (operators/similarity.py):

    python -m scripts.ann_recall [sf_dir]          # default sf0.01

For each configuration, measures recall@k against the exact brute-force
top-k and the *scanned fraction* — candidate pairs scored / pairs a full
scan would score — which is the quantity that survives scale-up: at 100 TB
the scanned fraction IS the cost model (wall times at sf0.01 are all
fixed-overhead-dominated, so they're reported but not the headline).

Sweeps:
  - SRP-LSH: planes ∈ {2, 3, 4} × probe radius ∈ {0, 1}
  - IVF (k-means cells): n_probe ∈ {1, 2, 4, 8}

Prints a markdown table (pasted into SCALING.md §ANN) plus one JSON line
for scripted consumption.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from crawl_streams_spark.operators import similarity as S  # noqa: E402
from crawl_streams_spark.session import get_spark  # noqa: E402
from crawl_streams_spark.tables import load_table  # noqa: E402


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(exact, approx):
    hits = total = 0
    for qid, want in exact.items():
        hits += len(want & approx.get(qid, set()))
        total += len(want)
    return hits / total if total else 1.0


def _lsh_scanned(corpus, queries, num_planes, probe_radius):
    """Candidate pairs an LSH probe scores: corpus-bucket size summed over
    each query's probed buckets."""
    cb = S.with_lsh_bucket(corpus, num_planes).groupBy("bucket").count()
    qb = S.with_lsh_bucket(queries, num_planes).select("vec_id", "bucket")
    if probe_radius == 1:
        qb = qb.withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << j))
                        for j in range(num_planes)
                    ],
                )
            ),
        )
    return (
        qb.join(cb, "bucket").agg(F.sum("count")).collect()[0][0] or 0
    )


def _ivf_scanned(corpus, queries, centroids, n_probe):
    """Candidate pairs IVF scores: per-query sum of probed-cell sizes."""
    from pyspark.sql import Window

    from crawl_streams_spark.functions import vectors as V

    sizes = corpus.groupBy(F.col("cell")).count()
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cent_sim"), F.asc("cell"))
    probes = (
        q.join(F.broadcast(centroids.select("cell", "centroid")))
        .select(
            "query_id", "cell", V.cosine("q_vec", "centroid").alias("cent_sim")
        )
        .withColumn("prb", F.row_number().over(w))
        .filter(F.col("prb") <= n_probe)
    )
    return probes.join(sizes, "cell").agg(F.sum("count")).collect()[0][0] or 0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        "ann-recall", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    k = 10
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") % 50 == 0).cache()
    n_queries = queries.count()
    full_pairs = n_queries * (n_corpus - 1)

    exact = _topk_sets(S.knn_bruteforce(emb, queries, k=k))
    rows = []

    # bytes model: full-resolution vector = dim float32s; PQ code = m
    # one-byte codewords (k ≤ 256). scanned_bytes_fraction = bytes this
    # config reads per query batch / bytes a brute-force scan reads —
    # the budget that survives scale-up, and the ONLY fair axis for
    # comparing compressed scans against full-resolution ones.
    VEC_BYTES = 64 * 4

    def add(config, recall, scanned, secs, scanned_bytes=None):
        rows.append(
            {
                "config": config,
                "recall_at_k": round(recall, 3),
                "scanned_fraction": round(scanned / full_pairs, 4),
                "scanned_bytes_fraction": round(
                    (scanned_bytes if scanned_bytes is not None else scanned * VEC_BYTES)
                    / (full_pairs * VEC_BYTES),
                    4,
                ),
                "wall_sec": round(secs, 2),
            }
        )

    t0 = time.perf_counter()
    _topk_sets(S.knn_bruteforce(emb, queries, k=k))  # steady-state rebuild
    add("brute-force (exact)", 1.0, full_pairs, time.perf_counter() - t0)

    for planes in (2, 3, 4):
        for radius in (0, 1):
            t0 = time.perf_counter()
            approx = _topk_sets(
                S.knn_lsh(emb, queries, k=k, num_planes=planes, probe_radius=radius)
            )
            secs = time.perf_counter() - t0
            scanned = _lsh_scanned(emb, queries, planes, radius)
            add(
                f"LSH planes={planes} probe_radius={radius}",
                _recall(exact, approx),
                scanned,
                secs,
            )

    cells = S.kmeans_train(emb, k=16, iters=3).withColumnRenamed(
        "cell", "cell"
    ).cache()
    cells.count()
    # assign corpus rows to trained cells once (same argmin as knn_ivf)
    from crawl_streams_spark.functions import vectors as V
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    assigned = (
        emb.join(F.broadcast(cells))
        .select(
            "vec_id",
            "embedding",
            "cell",
            V.cosine("embedding", "centroid").alias("sim"),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .drop("sim", "r")
        .cache()
    )
    assigned.count()
    for n_probe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        approx = _topk_sets(
            S.knn_ivf(
                assigned, queries, cells, k=k, n_probe=n_probe, cell_col="cell"
            )
        )
        secs = time.perf_counter() - t0
        scanned = _ivf_scanned(assigned, queries, cells, n_probe)
        add(
            f"IVF cells=16 n_probe={n_probe}",
            _recall(exact, approx),
            scanned,
            secs,
        )

    # PQ: ADC shortlist → exact rerank. Scanned fraction reports the
    # FULL-RESOLUTION pair work (|Q|·shortlist / full scan) — the ADC
    # stage additionally scans the whole CODES table, which is m small
    # ints per vector (a ~64× smaller relation at dim=64/m=8), so the
    # compressed scan is the cheap constant the shortlist dial rides on.
    for m, kcode in ((8, 16), (16, 64)):
        book = S.pq_train(emb, m=m, k=kcode, iters=3)
        codes = S.pq_encode(emb, book, m=m).cache()
        codes.count()
        for shortlist in (20, 50, 100):
            t0 = time.perf_counter()
            approx = _topk_sets(
                S.pq_knn_rerank(
                    emb, codes, book, queries, k=k, shortlist=shortlist, m=m
                )
            )
            secs = time.perf_counter() - t0
            add(
                f"PQ m={m} k={kcode} shortlist={shortlist} (+codes scan)",
                _recall(exact, approx),
                n_queries * shortlist,
                secs,
                # ADC scans the whole codes table + full-res rerank
                scanned_bytes=n_queries
                * (n_corpus * m + shortlist * 64 * 4),
            )
        codes.unpersist()

    # IVF-PQ composition (coarse prune → residual ADC → exact rerank):
    # same full-resolution accounting as the PQ rows (|Q|·shortlist), but
    # the compressed ADC stage scans only the probed cells' codes —
    # n_probe/cells of the codes table instead of all of it — and the
    # codebook quantizes RESIDUALS (a tighter distribution than raw
    # vectors), so recall at equal shortlist should match or beat plain
    # PQ while both scan knobs drop.
    def _ivf_pq_scanned_codes(ivf_codes, ivf_cents, n_probe):
        """Code rows the pruned ADC stage scans: per-query sum of probed
        cell sizes (same L2 probe order as knn_ivf_pq)."""
        from pyspark.sql import Window

        sizes = ivf_codes.groupBy("cell").count()
        q2 = queries.select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
        d = F.aggregate(
            F.zip_with(F.col("qv"), F.col("centroid"), lambda a, c: (a - c) * (a - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w2 = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cell"))
        probes = (
            q2.join(F.broadcast(ivf_cents.select("cell", "centroid")))
            .select("query_id", "cell", d.alias("cdist"))
            .withColumn("prb", F.row_number().over(w2))
            .filter(F.col("prb") <= n_probe)
        )
        return probes.join(sizes, "cell").agg(F.sum("count")).collect()[0][0] or 0

    for m, kcode in ((8, 16), (16, 64)):
        ivf_cents, ivf_book, ivf_codes = S.ivf_pq_index(
            emb, k_cells=16, m=m, k_codes=kcode, iters=3, centroids=cells
        )
        ivf_codes = ivf_codes.cache()
        ivf_codes.count()
        for n_probe, shortlist in ((4, 50), (8, 20), (8, 50), (8, 100)):
            t0 = time.perf_counter()
            approx = _topk_sets(
                S.knn_ivf_pq(
                    emb, queries, ivf_cents, ivf_book, ivf_codes,
                    k=k, n_probe=n_probe, shortlist=shortlist, m=m,
                )
            )
            secs = time.perf_counter() - t0
            code_rows = _ivf_pq_scanned_codes(ivf_codes, ivf_cents, n_probe)
            add(
                f"IVF-PQ cells=16 n_probe={n_probe} m={m} k={kcode} "
                f"shortlist={shortlist} (+probed codes scan)",
                _recall(exact, approx),
                n_queries * shortlist,
                secs,
                scanned_bytes=code_rows * m
                + n_queries * shortlist * 64 * 4,
            )
        ivf_codes.unpersist()

    # OPQ (rotate → PQ): same byte accounting as the PQ rows — the
    # rotation is a per-row map at encode/query time and adds NOTHING
    # to the scan (codes table + rerank bytes identical to plain PQ at
    # the same m/k/shortlist). The honest question on this corpus is
    # whether the learned rotation moves recall at all: the synthetic
    # embeddings are near-isotropic, so the expected answer is parity
    # (OPQ's win needs anisotropy — measured on a correlated fixture in
    # tests/test_similarity.py: 0.45 vs 0.38 ADC recall@5).
    for m, kcode in ((8, 16), (16, 64)):
        rot, obook = S.opq_train(emb, m=m, k=kcode, iters=3)
        ocodes = S.pq_encode(
            S.rotate_embeddings(emb, rot), obook, m=m
        ).cache()
        ocodes.count()
        for shortlist in (20, 50):
            t0 = time.perf_counter()
            approx = _topk_sets(
                S.knn_opq_rerank(
                    emb, queries, rot, obook, ocodes,
                    k=k, shortlist=shortlist, m=m,
                )
            )
            secs = time.perf_counter() - t0
            add(
                f"OPQ m={m} k={kcode} shortlist={shortlist} (+codes scan)",
                _recall(exact, approx),
                n_queries * shortlist,
                secs,
                scanned_bytes=n_queries
                * (n_corpus * m + shortlist * 64 * 4),
            )
        ocodes.unpersist()

    print(f"\ncorpus={n_corpus} queries={n_queries} k={k} ({sf_dir})\n")
    print("| config | recall@10 | scanned fraction | scanned bytes fraction | wall s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['config']} | {r['recall_at_k']:.3f} "
            f"| {r['scanned_fraction']:.4f} "
            f"| {r['scanned_bytes_fraction']:.4f} | {r['wall_sec']:.2f} |"
        )
    print()
    print(json.dumps({"metric": "ann_recall_cost", "rows": rows, "k": k}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
