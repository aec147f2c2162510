"""Similarity-search operators over embedding columns (north-star
extension): exact brute-force top-k (broadcast the query set) and two scale
paths — random-hyperplane LSH bucketing and IVF (centroid-partitioned)
search. The oracle-certified exact kernels live in plans/q_similarity.py;
the approximate variants are rows-only checked plus recall-tested in
tests/test_similarity.py.

Scale design (100 TB of vectors):
- brute force: only for a broadcastable query set — one narrow map over the
  corpus, per-partition partial top-k, no corpus shuffle.
- LSH: bucket id is a narrow map; join queries to corpus on bucket id —
  corpus shuffles once by bucket (or is pre-bucketed/bucketed-table), and
  each query probes its bucket + optional multi-probe neighbors.
- IVF: k centroids (tiny, broadcast) assign each vector a cell; queries
  search n_probe nearest cells only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions import vectors as V


def _planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes without RNG state: plane[j][i]
    = ±1 by parity of a hash of (j, i) — sign-pattern planes are the classic
    cheap SRP choice and need no normalization for sign tests."""
    out = []
    for j in range(num_planes):
        row = []
        for i in range(dim):
            h = (1103515245 * (j * dim + i) + 12345) % (1 << 31)
            row.append(1.0 if (h >> 13) & 1 else -1.0)
        out.append(row)
    return out


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast `queries` (small by contract), score every
    corpus vector, per-query window top-k."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = corpus.join(
        F.broadcast(q), F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        V.cosine("q_vec", vec_col).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def with_lsh_bucket(
    df: DataFrame, num_planes: int = 8, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Assign each vector its random-hyperplane sign bucket (2^num_planes
    buckets)."""
    return df.withColumn(
        "bucket", V.sign_bucket(F.col(vec_col), _planes(num_planes, dim))
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's SRP
    bucket; exact cosine re-rank inside the bucket.

    ``probe_radius=1`` enables multi-probe: each query additionally probes
    every bucket at Hamming distance 1 (one hyperplane sign flipped) — the
    buckets a true neighbor most likely fell into when it landed on the
    other side of exactly one plane. Cost grows ×(num_planes+1) probes per
    query (still tiny vs the corpus), recall rises sharply; the corpus side
    is untouched — still one bucket shuffle — so the sweep trades only
    query-side fan-out for recall. Tests measure recall-vs-cost against
    brute force."""
    if probe_radius not in (0, 1):
        raise ValueError("probe_radius must be 0 or 1")
    cb = with_lsh_bucket(corpus, num_planes, dim, vec_col)
    qb = with_lsh_bucket(queries, num_planes, dim, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "bucket",
    )
    if probe_radius == 1:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << j))
                for j in range(num_planes)
            ],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    scored = cb.join(F.broadcast(qb), "bucket").filter(
        F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        V.cosine("q_vec", vec_col).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def embedding_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate removal, LSH-bucketed: candidates
    are pairs sharing an SRP bucket (cos≈1 pairs agree on every hyperplane
    sign with probability (1-θ/π)^planes, ≈0.9^6 at cos 0.95), verified
    with exact cosine; the higher id of each confirmed pair is dropped.

    At 100 TB the all-pairs check is impossible; this does one narrow map
    (bucket id), one shuffle on bucket, and quadratic work only inside
    buckets (expected bucket size = n/2^planes). For higher recall run
    multiple independent plane sets and union the victim sets."""
    b = with_lsh_bucket(corpus, num_planes, dim, vec_col).select(
        F.col(id_col), F.col(vec_col), "bucket"
    )
    x, y = b.alias("x"), b.alias("y")
    ka, kb = F.col(f"x.{id_col}"), F.col(f"y.{id_col}")
    losers = (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (ka < kb))
        .select(
            kb.alias(id_col),
            V.cosine(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select(id_col)
        .distinct()
    )
    return corpus.join(losers, id_col, "left_anti")


def train_ivf_centroids(
    corpus: DataFrame, by: str = "label", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """IVF coarse quantizer: centroids = per-cell mean vectors. Here the
    cell assignment column is given (`label`); a full k-means would iterate
    assign→average with the same two operators."""
    return corpus.groupBy(by).agg(
        F.array(
            *[
                F.avg(F.element_at(vec_col, i + 1).cast("double"))
                for i in range(dim)
            ]
        ).alias("centroid")
    )


def kmeans_train(
    corpus: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """DataFrame-only Lloyd's k-means for the IVF coarse quantizer
    (returns (cell, centroid)). Iterative algorithm, no RDDs, no collects:

      init    cell = id % k (deterministic, no RNG)
      assign  argmin squared-L2 via broadcast(centroids) + min_by
      update  per-cell per-dimension mean

    Each iteration = one broadcast join + one grouped aggregation; the
    corpus is scanned per iteration but never shuffled by vector. Inertia
    is monotone non-increasing (Lloyd), tested in test_similarity."""
    d = corpus.select(
        F.col(id_col).alias("__id"), V.to_double_array(vec_col).alias("__v")
    )
    assigned = d.withColumn("cell", F.pmod(F.col("__id"), F.lit(k)))
    for _ in range(iters):
        cents = assigned.groupBy("cell").agg(
            F.array(
                *[
                    F.avg(F.element_at("__v", i + 1))
                    for i in range(dim)
                ]
            ).alias("centroid")
        )
        dist = F.aggregate(
            F.zip_with(
                F.col("__v"), F.col("centroid"), lambda a, c: (a - c) * (a - c)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        assigned = (
            d.join(F.broadcast(cents))
            .select("__id", "__v", F.col("cell"), dist.alias("__d"))
            .groupBy("__id", "__v")
            .agg(F.min_by("cell", "__d").alias("cell"))
        )
        assigned = assigned.localCheckpoint(eager=True)
    return assigned.groupBy("cell").agg(
        F.array(
            *[F.avg(F.element_at("__v", i + 1)) for i in range(dim)]
        ).alias("centroid")
    )


def kmeans_inertia(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Σ min-squared-distance — the k-means objective (for tests/tuning)."""
    d = corpus.select(V.to_double_array(vec_col).alias("__v"))
    dist = F.aggregate(
        F.zip_with(F.col("__v"), F.col("centroid"), lambda a, c: (a - c) * (a - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    per_vec = (
        d.join(F.broadcast(centroids))
        .select("__v", dist.alias("__d"))
        .groupBy("__v")
        .agg(F.min("__d").alias("mind"))
    )
    return per_vec.agg(F.sum("mind")).collect()[0][0]


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: route each query to its `n_probe` nearest centroids
    (broadcast centroid table), scan only those cells, exact re-rank."""
    cent = centroids.select(
        F.col(cell_col).alias("cell"), F.col("centroid")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("cell")
    )
    probes = (
        q.join(F.broadcast(cent))
        .select(
            "query_id",
            "q_vec",
            "cell",
            V.cosine("q_vec", "centroid").alias("cent_sim"),
        )
        .withColumn("prb", F.row_number().over(probe_w))
        .filter(F.col("prb") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )
    scored = corpus.withColumnRenamed(cell_col, "cell").join(
        F.broadcast(probes), "cell"
    ).filter(F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        V.cosine("q_vec", vec_col).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
