"""Similarity search over ``embeddings`` (array<float>, 64-dim) — the ANN
extension family: brute-force cosine top-k as the exact baseline, plus an
embedding-cosine near-duplicate detector. The LSH-bucketed scale path lives
in operators/similarity.py (rows-only checked — its bucketing isn't
SQL-portable).

Numeric determinism: dot products fold left in array order in DOUBLE on
both engines (Spark ``aggregate(zip_with(...))`` ≡ DuckDB
``list_dot_product`` on DOUBLE[]); outputs are rounded to 6 decimals.

Scale notes: the query set broadcasts (it is small by definition); the data
side streams through one narrow map per candidate — no shuffle until top-k,
which Spark plans as per-partition partial top-k (TakeOrderedAndProject /
window with partial sort). The near-dup all-pairs query is the per-bucket
verification kernel, certified here at oracle scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..functions import vectors as V
from ..operators import similarity as S
from ..tables import load_table
from .registry import query

_DUCK_COS = """
    ROUND(
      list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
"""


@query(
    "knn_bruteforce",
    oracle=f"""
        SELECT query_id, neighbor_id, cos_sim, rnk FROM (
            SELECT a.vec_id AS query_id,
                   b.vec_id AS neighbor_id,
                   {_DUCK_COS} AS cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_DUCK_COS} DESC, b.vec_id) AS rnk
            FROM embeddings a
            JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE a.vec_id % 50 = 0
        ) WHERE rnk <= 5
    """,
    tags=("similarity", "knn", "extension"),
    bench=True,
)
def knn_bruteforce(spark, sf_dir):
    """Exact cosine top-5 neighbors for every 50th vector: broadcast the
    query set, one narrow map over the corpus, per-query top-k. Ranks on the
    ROUNDED similarity (6 dp) so rank order is engine-portable."""
    emb = load_table(spark, sf_dir, "embeddings")
    # float→double cast and per-vector norms are staged BELOW the join, so
    # they're computed once per vector, not once per pair — the per-pair
    # work is a single dot_raw. Operand order matches the oracle exactly.
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        V.to_double_array("embedding").alias("q_emb"),
    ).select("query_id", "q_emb", V.norm_raw("q_emb").alias("q_norm"))
    corpus = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", V.to_double_array("embedding").alias("c_emb"))
        .select("vec_id", "c_emb", V.norm_raw("c_emb").alias("c_norm"))
    )
    pairs = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        V.cosine_from(
            V.dot_raw("q_emb", "c_emb"), F.col("q_norm"), F.col("c_norm")
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
    )


@query(
    "embedding_near_dup",
    oracle=f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_DUCK_COS} AS cos_sim
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id % 4 = 0 AND b.vec_id % 4 = 0
          AND {_DUCK_COS} >= 0.3
    """,
    tags=("similarity", "dedup", "extension"),
)
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.3) over a strided
    sample — the per-bucket verification kernel of embedding dedup."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 4 == 0)
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        V.to_double_array("embedding").alias("emb_a"),
    ).select("vec_a", "emb_a", V.norm_raw("emb_a").alias("norm_a"))
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        V.to_double_array("embedding").alias("emb_b"),
    ).select("vec_b", "emb_b", V.norm_raw("emb_b").alias("norm_b"))
    cos = F.round(
        V.cosine_from(
            V.dot_raw("emb_a", "emb_b"), F.col("norm_a"), F.col("norm_b")
        ),
        6,
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.3)
    )


@query(
    "embedding_norms",
    oracle="""
        SELECT vec_id,
               label,
               ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
               len(embedding) AS dim
        FROM embeddings
    """,
    tags=("similarity", "extension"),
)
def embedding_norms(spark, sf_dir):
    """Per-vector L2 norm + dimension — the normalization pass before any
    cosine pipeline (and a cheap full-scan parity check on float math)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.round(V.norm("embedding"), 6).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


@query(
    "label_centroid_sim",
    oracle="""
        WITH flat AS (
            SELECT label,
                   unnest(embedding)::DOUBLE AS v,
                   unnest(range(1, 65)) AS i
            FROM embeddings
        ),
        c AS (
            SELECT label, list(avg_v ORDER BY i) AS centroid
            FROM (SELECT label, i, AVG(v) AS avg_v FROM flat GROUP BY label, i)
            GROUP BY label
        )
        SELECT e.vec_id, e.label,
               ROUND(
                 list_dot_product(e.embedding::DOUBLE[], c.centroid)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.centroid, c.centroid))), 4) AS centroid_sim
        FROM embeddings e JOIN c ON e.label = c.label
    """,
    tags=("similarity", "ivf", "extension"),
)
def label_centroid_sim(spark, sf_dir):
    """IVF building block: per-label centroid (the 'coarse quantizer'
    trained by groupBy-avg) and each vector's similarity to its own
    centroid. Rounded to 4 dp — centroid averages accumulate in
    engine-specific order."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    cent = emb.groupBy("label").agg(
        F.array(
            *[
                F.avg(F.element_at("embedding", i + 1).cast("double")).alias(f"c{i}")
                for i in range(dim)
            ]
        ).alias("centroid")
    )
    # the vectors.py performance contract: cast + norm staged through
    # named columns BELOW the join, one dot_raw per pair above it — same
    # fold order as the convenience form (identical values), ~30% faster
    # at sf0.1 because the double-cast and norm subtrees evaluate once
    # instead of being re-inlined per cosine operand (ROUNDLOG lesson 1)
    pre = emb.select(
        "vec_id", "label", V.to_double_array("embedding").alias("__e")
    ).select("vec_id", "label", "__e", V.norm_raw("__e").alias("__n"))
    cent_n = cent.select(
        "label", "centroid", V.norm_raw("centroid").alias("__nc")
    )
    sim = F.round(
        V.cosine_from(V.dot_raw("__e", "centroid"), F.col("__n"), F.col("__nc")),
        4,
    )
    return pre.join(F.broadcast(cent_n), "label").select(
        "vec_id", "label", sim.alias("centroid_sim")
    )


# -- PQ encode under the cross-engine gate --------------------------------
# Fixed 4-subspace × 4-codeword book whose values are exact in binary
# (multiples of 0.125), so both engines parse identical doubles and every
# arithmetic step below is reproducible bit-for-bit.
_PQ_M, _PQ_K, _PQ_SUB = 4, 4, 16


def _pq_word(c: int) -> list[float]:
    return [c * 0.5 - 1.0 + i * 0.125 for i in range(_PQ_SUB)]


def _pq_book_sql() -> str:
    rows = ", ".join(
        f"({j}, {c}, [{', '.join(repr(x) for x in _pq_word(c))}])"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    return f"SELECT * FROM (VALUES {rows}) t(subspace, cell, centroid)"


def _pq_dist_sql() -> str:
    """Squared L2 between a vector's subspace slice and the joined
    codeword, as an EXPLICIT left-associated chain — the same sequential
    fold order Spark's F.aggregate uses, so the double sums agree to the
    last bit (a float-summation-order lesson, see rollup_day_reaggregation)."""
    terms = [
        f"(CAST(embedding[subspace * {_PQ_SUB} + {i}] AS DOUBLE) - centroid[{i}])"
        f" * (CAST(embedding[subspace * {_PQ_SUB} + {i}] AS DOUBLE) - centroid[{i}])"
        for i in range(1, _PQ_SUB + 1)
    ]
    return " + ".join(terms)


@query(
    "pq_codes_fixed_book",
    oracle=f"""
        WITH book AS ({_pq_book_sql()}),
        emb AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
        ),
        dist AS (
            SELECT vec_id, subspace, cell, {_pq_dist_sql()} AS d
            FROM emb CROSS JOIN book
        ),
        best AS (
            SELECT vec_id, subspace, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id, subspace ORDER BY d, cell
                   ) AS rn
            FROM dist
        ),
        codesl AS (
            SELECT vec_id, list(CAST(cell AS BIGINT) ORDER BY subspace) AS codes
            FROM best WHERE rn = 1 GROUP BY vec_id
        ),
        mind AS (
            SELECT vec_id, subspace, MIN(d) AS d FROM dist GROUP BY 1, 2
        ),
        errl AS (
            SELECT vec_id, list(d ORDER BY subspace) AS ds
            FROM mind GROUP BY vec_id
        )
        SELECT c.vec_id AS vec_id,
               array_to_string(c.codes, ',') AS codes,
               ((ds[1] + ds[2]) + ds[3]) + ds[4] AS quant_err
        FROM codesl c JOIN errl USING (vec_id)
    """,
    tags=("similarity", "pq", "extension"),
)
def pq_codes_fixed_book(spark, sf_dir):
    """Product-quantization encoding (operators/similarity.py::pq_encode)
    against a fixed literal codebook, plus the per-vector quantization
    error — the compression kernel of the PQ search family under the hard
    cross-engine gate. Codebook values are exact binary fractions; the
    distance folds are sequential in both engines; argmin ties break
    (distance, cell) lexicographically on both sides — so codes AND the
    double-typed error hash-match bit-for-bit."""
    from ..operators.similarity import _sq_dist, _subspace_rows, pq_encode

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    book = spark.createDataFrame(
        [(j, c, _pq_word(c)) for j in range(_PQ_M) for c in range(_PQ_K)],
        "subspace int, cell bigint, centroid array<double>",
    )
    codes = pq_encode(emb, book, m=_PQ_M, dim=64)
    rows = _subspace_rows(emb, _PQ_M, 64, "vec_id", "embedding")
    mind = (
        rows.join(F.broadcast(book), "subspace")
        .select(
            "__id",
            "subspace",
            _sq_dist(F.col("__v"), F.col("centroid")).alias("d"),
        )
        .groupBy("__id", "subspace")
        .agg(F.min("d").alias("d"))
    )
    err = (
        mind.groupBy("__id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("subspace", "d"))),
                    lambda s: s["d"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("quant_err")
        )
        .select(F.col("__id").alias("vec_id"), "quant_err")
    )
    return codes.join(err, "vec_id").select(
        "vec_id",
        # comma-joined, not a raw array: the driver comparator
        # canonicalizes scalar types only (same convention as
        # dedup_minhash_signatures' sig_digest)
        F.concat_ws(",", F.col("codes")).alias("codes"),
        "quant_err",
    )


# -- composed IVF-PQ search under the cross-engine gate --------------------
# Fixed coarse centroids (4 cells × 64 dims) and a fixed 4-subspace ×
# 4-codeword RESIDUAL codebook, all exact binary fractions (multiples of
# 2^-5), so cell assignment, residual encoding, ADC scoring, and the exact
# rerank reproduce bit-for-bit on both engines.
_IVF_CELLS, _IVF_NPROBE, _IVF_SHORTLIST, _IVF_TOPK = 4, 2, 10, 5


def _ivf_cent(c: int) -> list[float]:
    return [((c * 13 + i * 7) % 16) * 0.03125 - 0.25 for i in range(64)]


def _ivf_word(j: int, c: int) -> list[float]:
    return [
        ((j * 5 + c * 13 + i * 3) % 16) * 0.03125 - 0.25
        for i in range(_PQ_SUB)
    ]


def _ivf_coarse_sql() -> str:
    rows = ", ".join(
        f"({c}, [{', '.join(repr(x) for x in _ivf_cent(c))}])"
        for c in range(_IVF_CELLS)
    )
    return f"SELECT * FROM (VALUES {rows}) t(ccell, ccent)"


def _ivf_book_sql() -> str:
    rows = ", ".join(
        f"({j}, {c}, [{', '.join(repr(x) for x in _ivf_word(j, c))}])"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    return f"SELECT * FROM (VALUES {rows}) t(subspace, code, w)"


def _coarse_dist_sql(vec: str) -> str:
    """64-term left-associated squared-L2 chain to a coarse centroid —
    the same sequential fold order as Spark's F.aggregate."""
    terms = [
        f"(CAST({vec}[{i}] AS DOUBLE) - ccent[{i}])"
        f" * (CAST({vec}[{i}] AS DOUBLE) - ccent[{i}])"
        for i in range(1, 65)
    ]
    return " + ".join(terms)


def _resid_dist_sql(vec: str) -> str:
    """Subspace squared-L2 from the RESIDUAL (vec - coarse centroid) to the
    joined codeword; the residual subtraction happens per-term in the same
    double op order as ivf_assign's zip_with followed by _sq_dist."""
    terms = [
        f"((CAST({vec}[subspace * {_PQ_SUB} + {i}] AS DOUBLE)"
        f" - ccent[subspace * {_PQ_SUB} + {i}]) - w[{i}])"
        f" * ((CAST({vec}[subspace * {_PQ_SUB} + {i}] AS DOUBLE)"
        f" - ccent[subspace * {_PQ_SUB} + {i}]) - w[{i}])"
        for i in range(1, _PQ_SUB + 1)
    ]
    return " + ".join(terms)


def _rerank_dist_sql() -> str:
    terms = [
        f"(CAST(qa.embedding[{i}] AS DOUBLE) - CAST(nb.embedding[{i}] AS DOUBLE))"
        f" * (CAST(qa.embedding[{i}] AS DOUBLE) - CAST(nb.embedding[{i}] AS DOUBLE))"
        for i in range(1, 65)
    ]
    return " + ".join(terms)


@query(
    "knn_ivf_pq_fixed",
    oracle=f"""
        WITH coarse AS ({_ivf_coarse_sql()}),
        book AS ({_ivf_book_sql()}),
        cdist AS (
            SELECT vec_id, ccell, {_coarse_dist_sql('embedding')} AS d
            FROM embeddings CROSS JOIN coarse
        ),
        cass AS (
            SELECT vec_id, ccell FROM (
                SELECT vec_id, ccell,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY d, ccell) AS rn
                FROM cdist) WHERE rn = 1
        ),
        rdist AS (
            SELECT e.vec_id, b.subspace, b.code,
                   {_resid_dist_sql('e.embedding')} AS d
            FROM embeddings e
            JOIN cass a USING (vec_id)
            JOIN coarse c ON c.ccell = a.ccell
            CROSS JOIN book b
        ),
        vcodes AS (
            SELECT vec_id, subspace, code FROM (
                SELECT vec_id, subspace, code,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id, subspace
                           ORDER BY d, code) AS rn
                FROM rdist) WHERE rn = 1
        ),
        qdist AS (
            SELECT vec_id AS query_id, ccell,
                   {_coarse_dist_sql('embedding')} AS d
            FROM embeddings CROSS JOIN coarse
            WHERE vec_id % 50 = 0
        ),
        qprobe AS (
            SELECT query_id, ccell FROM (
                SELECT query_id, ccell,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id ORDER BY d, ccell) AS rn
                FROM qdist) WHERE rn <= {_IVF_NPROBE}
        ),
        qtab AS (
            SELECT p.query_id, p.ccell, b.subspace, b.code,
                   {_resid_dist_sql('e.embedding')} AS pd
            FROM qprobe p
            JOIN embeddings e ON e.vec_id = p.query_id
            JOIN coarse c ON c.ccell = p.ccell
            CROSS JOIN book b
        ),
        adc AS (
            SELECT t.query_id, v.vec_id AS neighbor_id, t.subspace, t.pd
            FROM vcodes v
            JOIN cass a USING (vec_id)
            JOIN qtab t ON t.ccell = a.ccell
                       AND t.subspace = v.subspace AND t.code = v.code
            WHERE v.vec_id <> t.query_id
        ),
        adcsum AS (
            SELECT query_id, neighbor_id,
                   list(pd ORDER BY subspace) AS ps
            FROM adc GROUP BY 1, 2
        ),
        shortl AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY ((ps[1] + ps[2]) + ps[3]) + ps[4],
                                    neighbor_id) AS rn
                FROM adcsum) WHERE rn <= {_IVF_SHORTLIST}
        ),
        rer AS (
            SELECT s.query_id, s.neighbor_id, {_rerank_dist_sql()} AS sq_dist
            FROM shortl s
            JOIN embeddings qa ON qa.vec_id = s.query_id
            JOIN embeddings nb ON nb.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, sq_dist, rnk FROM (
            SELECT query_id, neighbor_id, sq_dist,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY sq_dist, neighbor_id) AS rnk
            FROM rer) WHERE rnk <= {_IVF_TOPK}
    """,
    tags=("similarity", "pq", "ivf", "extension"),
)
def knn_ivf_pq_fixed(spark, sf_dir):
    """Composed IVF-PQ search (operators/similarity.py::knn_ivf_pq — the
    standard billion-scale IVFADC+rerank shape) under the hard
    cross-engine gate: coarse assignment, residual PQ encoding, probed
    ADC scoring, shortlist, and exact rerank all replay in SQL against
    fixed binary-exact centroids/codebook. Every distance is a
    left-associated double fold on both engines; all argmins and top-k
    windows tie-break lexicographically — so the double-typed sq_dist
    hash-matches bit-for-bit."""
    from ..operators.similarity import ivf_pq_index, knn_ivf_pq

    emb = load_table(spark, sf_dir, "embeddings")
    coarse = spark.createDataFrame(
        [(c, _ivf_cent(c)) for c in range(_IVF_CELLS)],
        "cell bigint, centroid array<double>",
    )
    book = spark.createDataFrame(
        [(j, c, _ivf_word(j, c)) for j in range(_PQ_M) for c in range(_PQ_K)],
        "subspace int, cell bigint, centroid array<double>",
    )
    _, _, codes = ivf_pq_index(
        emb, m=_PQ_M, dim=64, centroids=coarse, codebook=book
    )
    res = knn_ivf_pq(
        emb,
        emb.filter(F.col("vec_id") % 50 == 0),
        coarse,
        book,
        codes,
        k=_IVF_TOPK,
        n_probe=_IVF_NPROBE,
        shortlist=_IVF_SHORTLIST,
        m=_PQ_M,
        dim=64,
    )
    return res.select(
        "query_id",
        "neighbor_id",
        "sq_dist",
        F.col("rnk").cast("bigint").alias("rnk"),
    )


@query(
    "semantic_dedup_pairs",
    oracle="""
        WITH c AS (
            SELECT vec_id AS cell, embedding::DOUBLE[] AS cvec,
                   list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS cc
            FROM embeddings WHERE vec_id < 8
        ),
        v AS (
            SELECT vec_id, embedding::DOUBLE[] AS vec,
                   list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv
            FROM embeddings
        ),
        a AS (
            SELECT vec_id, vec, sqrt(vv) AS nrm, cell FROM (
                SELECT v.vec_id, v.vec, v.vv, c.cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY v.vv + c.cc - 2.0 * list_dot_product(v.vec, c.cvec),
                                    c.cell) AS rn
                FROM v, c
            ) WHERE rn = 1
        )
        SELECT a1.vec_id AS vec_a, a2.vec_id AS vec_b, a1.cell AS cell,
               ROUND(list_dot_product(a1.vec, a2.vec) / (a1.nrm * a2.nrm), 6)
                   AS cos_sim
        FROM a a1 JOIN a a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
        WHERE ROUND(list_dot_product(a1.vec, a2.vec) / (a1.nrm * a2.nrm), 6)
              >= 0.35
    """,
    tags=("similarity", "dedup", "semantic", "extension"),
)
def semantic_dedup_pairs(spark, sf_dir):
    """SemDeDup kernel (cluster-then-compare, arXiv:2303.09540) under the
    cross-engine gate: fixed centroids (the first 8 vectors — the
    production path trains k-means instead, operators/similarity.py::
    semantic_dedup), argmin-L2 assignment with lowest-cell tie-break, then
    in-cell cosine pairs ≥ 0.35. Assignment algebra |v|²+|c|²−2·v·c folds
    in array order on both engines, so the argmin — and therefore the
    emitted pair set — is bit-reproducible."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), V.to_double_array("embedding").alias("centroid")
    )
    # 8 fixed cells = at most 8 join keys for the quadratic pair stage
    # at ANY scale, so salt to the session's width (guide §2.5): k·S ≳
    # 2·cores keeps every core pairing. Results are salt-invariant —
    # each in-cell pair is produced exactly once for any S.
    salt = max(1, (2 * spark.sparkContext.defaultParallelism + 7) // 8)
    return S.semantic_dedup_pairs(emb, cents, threshold=0.35, pair_salt=salt)


_DENS_TAU = 0.15  # density radius (neighbor threshold)
_DUP_TAU = 0.25  # dedup threshold (victim rule applies at/above this)


@query(
    "embedding_density_dedup",
    oracle=f"""
        WITH pr AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   {_DUCK_COS} AS cos_sim
            FROM embeddings a
            JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE {_DUCK_COS} >= {_DENS_TAU}
        ),
        dens AS (
            SELECT v, count(*) AS d FROM (
                SELECT vec_a AS v FROM pr UNION ALL SELECT vec_b FROM pr
            ) GROUP BY v
        ),
        ids AS (
            SELECT e.vec_id, e.label, COALESCE(dens.d, 0)::BIGINT AS density
            FROM embeddings e LEFT JOIN dens ON dens.v = e.vec_id
        ),
        losers AS (
            SELECT DISTINCT CASE
                     WHEN da.density < db.density THEN pr.vec_a
                     WHEN da.density > db.density THEN pr.vec_b
                     ELSE greatest(pr.vec_a, pr.vec_b)
                   END AS loser
            FROM pr
            JOIN ids da ON da.vec_id = pr.vec_a
            JOIN ids db ON db.vec_id = pr.vec_b
            WHERE pr.cos_sim >= {_DUP_TAU}
        )
        SELECT ids.vec_id, ids.label, ids.density,
               (losers.loser IS NULL) AS kept
        FROM ids LEFT JOIN losers ON losers.loser = ids.vec_id
    """,
    tags=("similarity", "dedup", "density", "extension"),
)
def embedding_density_dedup(spark, sf_dir):
    """Density-ranked embedding dedup (HDBSCAN-exemplar style;
    operators/similarity.py::density_dedup_flags): density = in-label
    neighbor count at cos ≥ 0.15, then every near-duplicate pair
    (cos ≥ 0.25) drops its lower-density side (tie → higher id), keeping
    each neighborhood's densest exemplar. Pair generation is bucketed on
    the `label` cell (the SemDeDup trade: cross-cell dups missed by
    construction, quadratic work bounded per cell); the flag/density
    chain itself never touches vectors — slim id-keyed joins only."""
    from ..operators.similarity import density_dedup_flags

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("lab_a"),
        V.to_double_array("embedding").alias("emb_a"),
    ).select(
        "vec_a", "lab_a", "emb_a", V.norm_raw("emb_a").alias("norm_a")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("lab_b"),
        V.to_double_array("embedding").alias("emb_b"),
    ).select(
        "vec_b", "lab_b", "emb_b", V.norm_raw("emb_b").alias("norm_b")
    )
    cos = F.round(
        V.cosine_from(
            V.dot_raw("emb_a", "emb_b"), F.col("norm_a"), F.col("norm_b")
        ),
        6,
    )
    pairs = (
        a.join(
            b,
            (F.col("lab_a") == F.col("lab_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= _DENS_TAU)
    )
    flags = density_dedup_flags(emb, pairs, dup_threshold=_DUP_TAU)
    return flags.join(
        emb.select("vec_id", "label"), "vec_id"
    ).select("vec_id", "label", "density", "kept")


# -- OPQ search under the cross-engine gate ---------------------------------
# Fixed 2×2-block rotation: out[2t] = c·(v[2t] + v[2t+1]),
# out[2t+1] = c·(v[2t] − v[2t+1]) with c the double nearest 1/√2 —
# orthogonal to 1 ulp, and every output is a two-product chain both
# engines evaluate identically (the Spark side folds the full 64-term
# row with 62 exact-zero products, which cannot perturb a finite sum).
_OPQ_C = 0.7071067811865476


def _opq_rotation() -> list:
    rows = []
    for i in range(64):
        row = [0.0] * 64
        t = i // 2
        if i % 2 == 0:
            row[2 * t], row[2 * t + 1] = _OPQ_C, _OPQ_C
        else:
            row[2 * t], row[2 * t + 1] = _OPQ_C, -_OPQ_C
        rows.append(row)
    return rows


def _opq_rvec_sql(vec: str) -> str:
    """The rotated vector as a 64-element DOUBLE list whose every entry
    replays rotate_embeddings' left fold: a leading ``0.0 +`` mirrors the
    fold's zero accumulator (insurance against the one IEEE case where
    it matters, a ±0.0 input)."""
    elems = []
    for i in range(64):  # 0-based output index
        a, b = 2 * (i // 2) + 1, 2 * (i // 2) + 2  # 1-based input pair
        if i % 2 == 0:
            elems.append(
                f"(0.0 + {_OPQ_C!r} * CAST({vec}[{a}] AS DOUBLE))"
                f" + {_OPQ_C!r} * CAST({vec}[{b}] AS DOUBLE)"
            )
        else:
            elems.append(
                f"(0.0 + {_OPQ_C!r} * CAST({vec}[{a}] AS DOUBLE))"
                f" + {-_OPQ_C!r} * CAST({vec}[{b}] AS DOUBLE)"
            )
    return "[" + ", ".join(elems) + "]"


def _opq_sub_dist_sql() -> str:
    terms = [
        f"(rvec[subspace * {_PQ_SUB} + {i}] - centroid[{i}])"
        f" * (rvec[subspace * {_PQ_SUB} + {i}] - centroid[{i}])"
        for i in range(1, _PQ_SUB + 1)
    ]
    return " + ".join(terms)


def _opq_rerank_sql() -> str:
    terms = [
        f"(qa.rvec[{i}] - nb.rvec[{i}]) * (qa.rvec[{i}] - nb.rvec[{i}])"
        for i in range(1, 65)
    ]
    return " + ".join(terms)


_OPQ_SHORTLIST, _OPQ_TOPK = 10, 5


@query(
    "knn_opq_fixed",
    oracle=f"""
        WITH book AS ({_pq_book_sql()}),
        rot AS (
            SELECT vec_id, {_opq_rvec_sql('embedding')} AS rvec
            FROM embeddings
        ),
        dist AS (
            SELECT vec_id, subspace, cell, {_opq_sub_dist_sql()} AS d
            FROM rot CROSS JOIN book
        ),
        vcodes AS (
            SELECT vec_id, subspace, cell FROM (
                SELECT vec_id, subspace, cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id, subspace
                           ORDER BY d, cell) AS rn
                FROM dist) WHERE rn = 1
        ),
        qtab AS (
            SELECT vec_id AS query_id, subspace, cell,
                   {_opq_sub_dist_sql()} AS pd
            FROM rot CROSS JOIN book
            WHERE vec_id % 50 = 0
        ),
        adc AS (
            SELECT t.query_id, v.vec_id AS neighbor_id, t.subspace, t.pd
            FROM vcodes v
            JOIN qtab t USING (subspace, cell)
            WHERE v.vec_id <> t.query_id
        ),
        adcsum AS (
            SELECT query_id, neighbor_id,
                   list(pd ORDER BY subspace) AS ps
            FROM adc GROUP BY 1, 2
        ),
        shortl AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY ((ps[1] + ps[2]) + ps[3]) + ps[4],
                                    neighbor_id) AS rn
                FROM adcsum) WHERE rn <= {_OPQ_SHORTLIST}
        ),
        rer AS (
            SELECT s.query_id, s.neighbor_id, {_opq_rerank_sql()} AS sq_dist
            FROM shortl s
            JOIN rot qa ON qa.vec_id = s.query_id
            JOIN rot nb ON nb.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, sq_dist, rnk FROM (
            SELECT query_id, neighbor_id, sq_dist,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY sq_dist, neighbor_id) AS rnk
            FROM rer) WHERE rnk <= {_OPQ_TOPK}
    """,
    tags=("similarity", "pq", "opq", "extension"),
)
def knn_opq_fixed(spark, sf_dir):
    """OPQ search (operators/similarity.py::knn_opq_rerank — rotate,
    then the standard PQ ADC + exact-rerank pipeline) under the hard
    cross-engine gate: a FIXED near-orthogonal 2×2-block rotation (the
    double closest to a 45° Givens block, so both engines parse the
    identical literal) applies through rotate_embeddings' left fold,
    the fixed binary-exact codebook encodes the rotated space, ADC
    scores the probed codes, and the shortlist reranks exactly in
    rotated coordinates — every distance a left-associated double
    chain, every argmin/top-k lexicographically tie-broken, so sq_dist
    hash-matches bit-for-bit. The TRAINED path (opq_train: DataFrame
    moment matrix → driver 64×64 eigh → eigenvalue allocation) is
    pinned by tests/test_similarity.py (beats plain PQ on correlated
    data 0.45 vs 0.38 ADC recall@5; parity on isotropic)."""
    from ..operators.similarity import (
        knn_opq_rerank,
        pq_encode,
        rotate_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rotation = _opq_rotation()
    book = spark.createDataFrame(
        [(j, c, _pq_word(c)) for j in range(_PQ_M) for c in range(_PQ_K)],
        "subspace int, cell bigint, centroid array<double>",
    )
    codes = pq_encode(
        rotate_embeddings(emb, rotation), book, m=_PQ_M, dim=64
    )
    res = knn_opq_rerank(
        emb,
        emb.filter(F.col("vec_id") % 50 == 0),
        rotation,
        book,
        codes,
        k=_OPQ_TOPK,
        shortlist=_OPQ_SHORTLIST,
        m=_PQ_M,
        dim=64,
    )
    return res.select(
        "query_id",
        "neighbor_id",
        "sq_dist",
        F.col("rnk").cast("bigint").alias("rnk"),
    )
