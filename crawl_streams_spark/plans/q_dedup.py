"""Deduplication suite over ``documents`` — the training-data-pipeline
extension family (BASELINE.json north_star): exact, MinHash+LSH, SimHash,
n-gram Jaccard. The embedding near-dup lives in q_similarity.py.

Cross-engine hashing: every hash bottoms out in md5 (identical in Spark and
DuckDB); 60-bit integer hashes are md5's first 15 hex digits parsed base-16
(Spark ``conv(…,16,10)`` ≡ DuckDB ``('0x'||…)::BIGINT``), so MinHash
signatures, band keys and SimHash fingerprints hash-match the oracle bit for
bit.

Scale notes (100 TB): exact dedup is one hash-shuffle on a 32-char key;
MinHash signatures/bands are narrow maps; LSH candidate generation is a
self-equi-join on (band, band_hash) — the join key is uniform by
construction (md5), so no skew; only candidate pairs (a vanishing fraction)
reach the quadratic Jaccard verification. The all-pairs oracle exists only
to certify the SQL semantics at sf0.01.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import hashing as H
from ..functions import text as T
from ..tables import load_table
from .registry import query

# --- DuckDB fragments ----------------------------------------------------

_DUCK_TOKENS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"

# 3-word shingles, distinct; short docs yield one whole-text shingle
# (mirrors functions/text.py::word_shingles).
_DUCK_SHINGLES = f"""
    list_distinct(list_transform(
        range(1, greatest(len({_DUCK_TOKENS}) - 2, 1) + 1),
        i -> array_to_string(({_DUCK_TOKENS})[i:i+2], ' ')))
"""


def _duck_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


_NUM_HASHES = 16
_BANDS = 8
_ROWS_PER_BAND = 2

#: sf_dir → sampled LSH candidate-pair estimate for dedup_minhash_lsh_pairs.
#: Deterministic for a fixed dataset (seeded sample), so the broadcast
#: decision is computed once per input directory per process.
_PAIR_ESTIMATES: dict[str, float] = {}

# MinHash signature as a DuckDB list expression over a `shingles` column:
# one 31-bit md5-derived base hash per shingle, then the same universal-hash
# mixes (a_k*h+b_k) the Spark side uses (hashing.minhash_ab).
from ..functions.hashing import minhash_ab as _minhash_ab  # noqa: E402

_DUCK_BASE31 = f"list_transform(shingles, s -> {_duck_hash60('s')} & 2147483647)"
_DUCK_SIG = (
    "["
    + ", ".join(
        f"list_min(list_transform({_DUCK_BASE31}, h -> h * {a} + {b}))"
        for a, b in _minhash_ab(_NUM_HASHES)
    )
    + "]"
)


@query(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS content_md5,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    """,
    tags=("dedup", "extension"),
    bench=True,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (the reference's content_digest key,
    analysis.py:47): one hash-shuffle, keep the lowest doc_id per group.

    spread_factor=4 (r14, VERDICT r13 item 5): the per-row work here is
    one md5 + a partial agg — light enough that the full-width floor
    over-partitioned the single-split test input (driver scaling block:
    32 cores 2.3× SLOWER than 8). Bounding the spread at 4×splits makes
    the 8- and 32-core profiles identical (and is still a no-op at any
    real scale, where the scan carries its own splits)."""
    docs = load_table(spark, sf_dir, "documents", spread_factor=4)
    return (
        docs.withColumn("content_md5", F.md5("text"))
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@query(
    "dedup_minhash_signatures",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
        )
        SELECT doc_id,
               len(shingles) AS n_shingles,
               {_DUCK_SIG}[1] AS minhash_0,
               {_DUCK_SIG}[{_NUM_HASHES}] AS minhash_last,
               md5(array_to_string({_DUCK_SIG}, ',')) AS sig_digest
        FROM sh
    """,
    tags=("dedup", "minhash", "extension"),
    bench=True,
)
def dedup_minhash_signatures(spark, sf_dir):
    """MinHash signatures (16 hash functions over 3-word shingles) — the
    narrow-map stage of MinHash-LSH dedup; certified against the oracle via
    first/last component + a digest of the full signature.

    Staged through aliased columns (shingles → h31 → sig) so each expensive
    array is computed once per row; inlining it would copy the md5 subtree
    into all 16 minima (HOFs get no codegen CSE)."""
    docs = load_table(spark, sf_dir, "documents")
    staged = (
        docs.select("doc_id", T.tokens("text").alias("toks"))
        .select("doc_id", T.shingles_from_tokens(F.col("toks"), 3).alias("shingles"))
        .select("doc_id", F.size("shingles").cast("bigint").alias("n_shingles"),
                H.shingle_hashes31(F.col("shingles")).alias("h31"))
        .select("doc_id", "n_shingles",
                H.minhash_from_hashes(F.col("h31"), _NUM_HASHES).alias("sig"))
    )
    return staged.select(
        "doc_id",
        "n_shingles",
        F.element_at("sig", 1).alias("minhash_0"),
        F.element_at("sig", _NUM_HASHES).alias("minhash_last"),
        F.md5(
            F.array_join(F.transform("sig", lambda x: x.cast("string")), ",")
        ).alias("sig_digest"),
    )


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
        ),
        sig AS (
            SELECT doc_id, shingles, {_DUCK_SIG} AS sig FROM sh
        ),
        bands AS (
            SELECT doc_id, shingles, b,
                   md5(array_to_string(sig[b*{_ROWS_PER_BAND}+1 : (b+1)*{_ROWS_PER_BAND}], ',')) AS band_hash
            FROM sig CROSS JOIN (SELECT unnest(range(0, {_BANDS})) AS b) u
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                     / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
              / len(list_distinct(sa.shingles || sb.shingles)) >= 0.3
    """,
    tags=("dedup", "minhash", "lsh", "extension"),
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs: band the signatures (8 bands × 2
    rows), self-join on band hash for candidates, verify with true shingle
    Jaccard ≥ 0.3. The LSH join replaces the O(n²) all-pairs scan — the
    100 TB path.

    A thin wrapper over operators/dedup.py::minhash_lsh_candidates with
    ``hash_impl="md5"`` (the oracle-replayable hash family) — the
    tokenize/shingle/minhash/band recipe, the slim band self-join, the
    guarded broadcast-vs-shuffle verify, and the doc-sampled pair
    estimate all live in ONE place (``_lsh_pipeline``), so the query
    cannot drift from the operator. The broadcast decision is memoized
    per input dir (deterministic seeded sample), so repeat builds skip
    the sizing job; shingle arrays never ride the ×bands explode or the
    self-join exchange (measured 2.5× slower carried through, fatal at
    100 TB)."""
    from ..operators import dedup as DD

    raw = load_table(spark, sf_dir, "documents")
    est = _PAIR_ESTIMATES.get(sf_dir)
    if est is None:
        est = DD.estimate_lsh_candidates(
            raw, "text", "doc_id", _NUM_HASHES, _BANDS, 3, "md5"
        )
        _PAIR_ESTIMATES[sf_dir] = est
    pairs = DD.minhash_lsh_candidates(
        raw,
        content="text",
        key="doc_id",
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        shingle_words=3,
        hash_impl="md5",
        verify_join="broadcast" if est <= 4_000_000 else "shuffle",
    )
    jac = F.col("jaccard")
    return pairs.filter(jac >= 0.3).select(
        F.col("key_a").alias("doc_a"),
        F.col("key_b").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )


@query(
    "dedup_collapsed_lsh_pairs",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
            UNION ALL
            SELECT doc_id + 200000, text FROM documents WHERE doc_id % 50 = 0
        ),
        dg AS (
            SELECT doc_id, md5(text) AS digest FROM corpus
        ),
        grp AS (
            SELECT digest, MIN(doc_id) AS rep FROM dg GROUP BY digest
        ),
        star AS (
            SELECT g.rep AS doc_a, d.doc_id AS doc_b,
                   CAST(1.0 AS DOUBLE) AS jaccard
            FROM dg d JOIN grp g ON d.digest = g.digest
            WHERE d.doc_id <> g.rep
        ),
        sh AS (
            SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM corpus
            WHERE doc_id IN (SELECT rep FROM grp)
        ),
        sig AS (
            SELECT doc_id, shingles, {_DUCK_SIG} AS sig FROM sh
        ),
        bands AS (
            SELECT doc_id, shingles, b,
                   md5(array_to_string(sig[b*{_ROWS_PER_BAND}+1 : (b+1)*{_ROWS_PER_BAND}], ',')) AS band_hash
            FROM sig CROSS JOIN (SELECT unnest(range(0, {_BANDS})) AS b) u
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        ),
        reppairs AS (
            SELECT c.doc_a, c.doc_b,
                   ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                         / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b
            WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                  / len(list_distinct(sa.shingles || sb.shingles)) >= 0.3
        )
        SELECT doc_a, doc_b, jaccard FROM reppairs
        UNION ALL
        SELECT doc_a, doc_b, jaccard FROM star
    """,
    tags=("dedup", "minhash", "lsh", "extension"),
)
def dedup_collapsed_lsh_pairs(spark, sf_dir):
    """Exact-collapse LSH (round-7 degenerate-corpus scale path,
    operators/dedup.py::minhash_lsh_candidates_collapsed): exact
    duplicates collapse to one representative per content digest BEFORE
    banding — d identical copies cost d-1 linear star edges instead of
    d(d-1)/2 quadratic band collisions, the blowup no join strategy can
    absorb because it is real output, not skew. Returns rep-pair LSH
    matches (Jaccard ≥ 0.3) plus (rep, member) star edges at 1.0; the
    transitive closure equals the uncollapsed operator's (pinned in
    tests/test_extensions2.py).

    The base documents carry no exact duplicates, so the query
    synthesizes deterministic copies (every 50th doc twice more, shifted
    ids) identically on both engines — the star and collapse logic is
    actually exercised under the gate, not vacuously green."""
    from ..operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.unionByName(
        copies.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    ).unionByName(
        copies.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    pairs = DD.minhash_lsh_candidates_collapsed(
        corpus,
        content="text",
        key="doc_id",
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        shingle_words=3,
        hash_impl="md5",
        verify_join="shuffle",
    )
    jac = F.col("jaccard")
    return pairs.filter(jac >= 0.3).select(
        F.col("key_a").alias("doc_a"),
        F.col("key_b").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )


@query(
    "dedup_minhash_est_jaccard",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
            WHERE doc_id < 100
        ),
        sig AS (
            SELECT doc_id, {_DUCK_SIG} AS sig FROM sh
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(len(list_filter(range(1, {_NUM_HASHES} + 1),
                         i -> a.sig[i] = b.sig[i]))::DOUBLE / {_NUM_HASHES},
                     6) AS est_jaccard
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE len(list_filter(range(1, {_NUM_HASHES} + 1),
                  i -> a.sig[i] = b.sig[i])) > 0
    """,
    tags=("dedup", "minhash", "extension"),
)
def dedup_minhash_est_jaccard(spark, sf_dir):
    """Signature-estimated Jaccard (fraction of agreeing MinHash
    components — Broder's unbiased estimator) over a bounded all-pairs
    slice. Certifies the estimator the cross-batch incremental near-dup
    path verifies candidates with (operators/dedup.py::estimated_jaccard),
    where true-shingle Jaccard is unavailable because the index stores
    only signatures, never text."""
    from ..operators.dedup import estimated_jaccard

    sigs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", T.tokens("text").alias("toks"))
        .select(
            "doc_id", T.shingles_from_tokens(F.col("toks"), 3).alias("shingles")
        )
        .select(
            "doc_id", H.shingle_hashes31(F.col("shingles")).alias("h31")
        )
        .select(
            "doc_id",
            H.minhash_from_hashes(F.col("h31"), _NUM_HASHES).alias("sig"),
        )
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    est = estimated_jaccard(F.col("a.sig"), F.col("b.sig"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(est, 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") > 0)
    )


@query(
    "dedup_simhash",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   list_transform({_DUCK_TOKENS}, t -> {_duck_hash60('t')}) AS th
            FROM documents
        )
        SELECT doc_id,
               list_aggregate(
                   list_transform(range(0, 60),
                       b -> CASE WHEN 2 * len(list_filter(th, h -> (h & (1::BIGINT << b)) <> 0)) > len(th)
                                 THEN (1::BIGINT << b) ELSE 0::BIGINT END),
                   'sum')::BIGINT AS simhash
        FROM h
    """,
    tags=("dedup", "simhash", "extension"),
)
def dedup_simhash(spark, sf_dir):
    """SimHash fingerprints (60-bit, token-level majority vote): near-dup
    candidates are fingerprints within small Hamming distance — detection
    via bit_count(xor) (see operators/dedup.py for the banding variant)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", H.simhash64(T.tokens("text")).alias("simhash")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents WHERE doc_id < 150
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                     / len(list_distinct(a.shingles || b.shingles)), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.shingles, b.shingles)) > 0
          AND len(list_intersect(a.shingles, b.shingles))::DOUBLE
              / len(list_distinct(a.shingles || b.shingles)) >= 0.05
    """,
    tags=("dedup", "jaccard", "extension"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """All-pairs n-gram Jaccard on a bounded slice (doc_id < 150): the exact
    quadratic baseline the LSH variant approximates. Bounded on purpose —
    at scale this shape is only ever run per-LSH-bucket."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", T.word_shingles("text", 3).alias("shingles"))
    )
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter((inter > 0) & (jac >= 0.05))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# Shared oracle prefix: LSH-verified pair graph → recursive min-label
# closure → (doc_id, cluster_id) assignment. Consumed by
# dedup_cluster_assignment and cluster_golden_records.
_DUCK_CC_ASSIGN = f"""
        WITH RECURSIVE sh AS (
            SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM documents
        ),
        sig AS (
            SELECT doc_id, shingles, {_DUCK_SIG} AS sig FROM sh
        ),
        bands AS (
            SELECT doc_id, b,
                   md5(array_to_string(sig[b*{_ROWS_PER_BAND}+1 : (b+1)*{_ROWS_PER_BAND}], ',')) AS band_hash
            FROM sig CROSS JOIN (SELECT unnest(range(0, {_BANDS})) AS b) u
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        ),
        pairs AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b
            WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                  / len(list_distinct(sa.shingles || sb.shingles)) >= 0.3
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, lbl) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
        ),
        assign AS (
            SELECT node AS doc_id, MIN(lbl) AS cluster_id
            FROM reach GROUP BY node
        )
"""


@query(
    "dedup_cluster_assignment",
    oracle=_DUCK_CC_ASSIGN
    + """
        , sizes AS (
            SELECT cluster_id, COUNT(*)::BIGINT AS cluster_size
            FROM assign GROUP BY cluster_id
        )
        SELECT a.doc_id, a.cluster_id, s.cluster_size
        FROM assign a JOIN sizes s USING (cluster_id)
    """,
    tags=("dedup", "clustering", "connected-components", "iterative", "extension"),
)
def dedup_cluster_assignment(spark, sf_dir):
    """Transitive near-duplicate clustering: LSH-verified pairs
    (Jaccard ≥ 0.3) become an undirected graph and every document gets
    its connected component's min doc_id as cluster_id (singletons
    cluster to themselves), plus the component size — the keep/drop
    assignment a corpus-dedup pass consumes (keep doc_id == cluster_id).

    The Spark side is operators/dedup.py::cluster_duplicates — iterative
    min-label propagation with pointer jumping, O(log diameter) rounds,
    lineage cut per round. The oracle reaches the same fixed point
    through a recursive CTE (min reachable label), so the driver gate
    certifies a genuinely ITERATIVE distributed kernel end to end:
    chains A~B~C collapse into one cluster even though A~C was never a
    candidate pair."""
    assign = _cc_assign(spark, sf_dir)
    sizes = assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assign.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def _cc_assign(spark, sf_dir):
    """(doc_id, cluster_id) connected-component assignment over the
    LSH-verified pair graph — the Spark counterpart of _DUCK_CC_ASSIGN."""
    from ..operators.dedup import cluster_duplicates

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = cluster_duplicates(pairs, "doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(
        labels, docs["doc_id"] == labels["key"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster_id"),
    )


_PF_P = 19  # Jaccard threshold p/q = 0.95 as exact integer math
_PF_Q = 20


@query(
    "prefix_filter_jaccard_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct({_DUCK_TOKENS})) AS tok
            FROM documents
        ),
        freq AS (SELECT tok, COUNT(*)::BIGINT AS cnt FROM toks GROUP BY tok),
        tf AS (SELECT t.doc_id, t.tok, f.cnt FROM toks t JOIN freq f USING (tok)),
        sets AS (
            SELECT doc_id, list(tok ORDER BY cnt, tok) AS stoks,
                   COUNT(*)::BIGINT AS sz
            FROM tf GROUP BY doc_id
        ),
        pref AS (
            SELECT doc_id, sz,
                   unnest(stoks[1 : (sz - (({_PF_P}*sz + {_PF_Q} - 1) // {_PF_Q}) + 1)::INT])
                       AS tok
            FROM sets
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM pref a JOIN pref b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
             AND {_PF_Q}*least(a.sz, b.sz) >= {_PF_P}*greatest(a.sz, b.sz)
        ),
        fs AS (
            SELECT doc_id, list_distinct({_DUCK_TOKENS}) AS toks
            FROM documents
        ),
        v AS (
            SELECT c.doc_a, c.doc_b,
                   len(list_intersect(a.toks, b.toks))::BIGINT AS inter,
                   (len(a.toks) + len(b.toks)
                    - len(list_intersect(a.toks, b.toks)))::BIGINT AS uni
            FROM cand c
            JOIN fs a ON a.doc_id = c.doc_a
            JOIN fs b ON b.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b, inter, uni,
               ROUND(inter::DOUBLE / uni, 6) AS jaccard
        FROM v
        WHERE {_PF_Q}*inter >= {_PF_P}*uni
    """,
    tags=("dedup", "similarity-join", "prefix-filter", "exact", "extension"),
)
def prefix_filter_jaccard_pairs(spark, sf_dir):
    """EXACT all-pairs token-set similarity join at Jaccard ≥ 0.95 via
    prefix filtering (operators/fuzzy.py::prefix_jaccard_self_join) —
    the deterministic alternative to MinHash-LSH: rarest-first global
    token order, per-set prefixes of length sz−⌈0.95·sz⌉+1, candidates
    only from prefix-token collisions + length filter, then the integer
    verification 20·|a∩b| ≥ 19·|a∪b| (no float threshold boundary). The
    gate certifies the ordering, the prefix math, and the exact
    candidate-prune-verify pipeline end to end."""
    from ..operators import fuzzy as FZ

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(T.tokens("text")).alias("toks")
    )
    pairs = FZ.prefix_jaccard_self_join(docs, "doc_id", "toks", _PF_P, _PF_Q)
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "inter",
        "uni",
        "jaccard",
    )


@query(
    "cluster_golden_records",
    oracle=_DUCK_CC_ASSIGN
    + """
        , full_docs AS (
            SELECT d.doc_id, d.lang, d.source, a.cluster_id,
                   len(d.text)::BIGINT AS tlen
            FROM documents d JOIN assign a USING (doc_id)
        ),
        base AS (
            SELECT cluster_id, COUNT(*)::BIGINT AS n_members,
                   MIN(doc_id) AS rep_doc_id
            FROM full_docs GROUP BY cluster_id
        ),
        txt AS (
            SELECT cluster_id, doc_id AS golden_text_doc,
                   tlen AS golden_text_len,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY tlen DESC, doc_id) AS rn
            FROM full_docs
        ),
        lang_cnt AS (
            SELECT cluster_id, lang, COUNT(*) AS c
            FROM full_docs GROUP BY 1, 2
        ),
        lang_pick AS (
            SELECT cluster_id, lang AS golden_lang,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY c DESC, lang) AS rn
            FROM lang_cnt
        ),
        src_cnt AS (
            SELECT cluster_id, source, COUNT(*) AS c
            FROM full_docs GROUP BY 1, 2
        ),
        src_pick AS (
            SELECT cluster_id, source AS golden_source,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY c DESC, source) AS rn
            FROM src_cnt
        )
        SELECT b.cluster_id, b.n_members, b.rep_doc_id,
               t.golden_text_doc, t.golden_text_len,
               l.golden_lang, s.golden_source
        FROM base b
        JOIN txt t ON t.cluster_id = b.cluster_id AND t.rn = 1
        JOIN lang_pick l ON l.cluster_id = b.cluster_id AND l.rn = 1
        JOIN src_pick s ON s.cluster_id = b.cluster_id AND s.rn = 1
    """,
    tags=("dedup", "entity-resolution", "survivorship", "extension"),
)
def cluster_golden_records(spark, sf_dir):
    """Survivorship (golden-record construction) over the transitive
    dup clusters: per cluster, the member count, the min-id
    representative, the LONGEST text's owner (tie: lowest doc_id), and
    the majority lang/source (tie: lexicographic) — the master-data
    merge step an entity-resolution pipeline runs after clustering.
    Every rule is a deterministic rank-1 pick or integer aggregate, all
    sharing the cluster_id partitioning — one shuffle feeds the base
    aggregate and all three survivorship windows."""
    from pyspark.sql import Window as W

    assign = _cc_assign(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.length("text").cast("bigint").alias("tlen")
    )
    full_docs = docs.join(assign, "doc_id")
    base = full_docs.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("rep_doc_id"),
    )
    w_txt = W.partitionBy("cluster_id").orderBy(
        F.desc("tlen"), F.asc("doc_id")
    )
    txt = (
        full_docs.withColumn("rn", F.row_number().over(w_txt))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("golden_text_doc"),
            F.col("tlen").alias("golden_text_len"),
        )
    )

    def majority(col, out):
        cnt = full_docs.groupBy("cluster_id", col).agg(
            F.count(F.lit(1)).alias("c")
        )
        w = W.partitionBy("cluster_id").orderBy(F.desc("c"), F.asc(col))
        return (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cluster_id", F.col(col).alias(out))
        )

    return (
        base.join(txt, "cluster_id")
        .join(majority("lang", "golden_lang"), "cluster_id")
        .join(majority("source", "golden_source"), "cluster_id")
        .select(
            "cluster_id",
            "n_members",
            "rep_doc_id",
            "golden_text_doc",
            "golden_text_len",
            "golden_lang",
            "golden_source",
        )
    )


@query(
    "leakage_safe_split_assign",
    oracle=_DUCK_CC_ASSIGN
    + """
        SELECT a.doc_id,
               a.cluster_id,
               CASE
                 WHEN substring(md5('split:' || CAST(a.cluster_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                 WHEN substring(md5('split:' || CAST(a.cluster_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                 ELSE 'test'
               END AS split
        FROM assign a
    """,
    tags=("dedup", "pipeline", "split", "leakage", "extension"),
)
def leakage_safe_split_assign(spark, sf_dir):
    """Leakage-safe train/val/test assignment (round 7,
    operators/pipeline.py::leakage_safe_split): the split hash is keyed
    by the LSH-cluster representative instead of the document id, so
    every member of a near-duplicate cluster lands in the SAME split —
    a near-copy of a test document sitting in train inflates every
    benchmark it touches, the classic eval-leakage hole a per-document
    split leaves open.

    The oracle reaches the same clusters through the recursive-CTE
    connected components (_DUCK_CC_ASSIGN) and the same md5 bucket math
    as pipeline.hash_bucket ('e6'/'f3' = hex_threshold(0.9/0.95)), so
    the driver certifies cluster assignment AND split determinism end
    to end. The no-leak invariant (zero clusters spanning two splits)
    is structural — split is a pure function of cluster_id — and pinned
    adversarially in tests/test_extensions2.py."""
    from ..operators.pipeline import leakage_safe_split

    assign = _cc_assign(spark, sf_dir)
    clusters = assign.select(
        F.col("doc_id").alias("key"), F.col("cluster_id").alias("cluster")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = leakage_safe_split(docs, clusters)
    return out.join(assign, "doc_id").select("doc_id", "cluster_id", "split")
