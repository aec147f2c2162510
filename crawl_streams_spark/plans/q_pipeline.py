"""Training-data pipeline queries over ``documents`` — corpus splitting,
stratified sampling, sequence packing, benchmark contamination, PII
scanning (extension family, SURVEY.md §7.6 / BASELINE.json north_star; the
reference has no counterpart).

Every decision is md5-deterministic (operators/pipeline.py) so the DuckDB
oracle reproduces it bit-for-bit; PII patterns are dialect-portable
(functions/pii.py). The corpus has no natural PII, so the scan query seeds
deterministic synthetic PII from doc_id inside the query — identically on
both engines — to keep the check non-vacuous.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import pii as PII
from ..functions import text as T
from ..operators import pipeline as P
from ..tables import load_table
from .registry import query

# tokens: whitespace-split with empties removed (matches functions/text.py).
_DUCK_TOKENS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"

# --- corpus split --------------------------------------------------------

_TRAIN, _VAL = 0.9, 0.05
_T_HI = P.hex_threshold(_TRAIN)
_V_HI = P.hex_threshold(_TRAIN + _VAL)
_DUCK_SPLIT_BUCKET = "substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)"


@query(
    "train_split_counts",
    oracle=f"""
        SELECT CASE WHEN {_DUCK_SPLIT_BUCKET} < '{_T_HI}' THEN 'train'
                    WHEN {_DUCK_SPLIT_BUCKET} < '{_V_HI}' THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1, 2
    """,
    tags=("extension", "pipeline", "split"),
)
def train_split_counts(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test split by salted md5 of doc_id —
    stable under corpus growth (a doc keeps its split on re-runs), zero
    shuffle for the assignment itself; the count rollup is one exchange on
    a 15-value key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        P.split_assign("doc_id", _TRAIN, _VAL).alias("split"), "lang"
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --- stratified sampling -------------------------------------------------

_RATES = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 1.0}
_DEFAULT_RATE = 0.1
_DUCK_SAMPLE_BUCKET = "substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2)"
_DUCK_RATE_THR = (
    "CASE lang "
    + " ".join(
        f"WHEN '{k}' THEN '{P.hex_threshold(v)}'" for k, v in sorted(_RATES.items())
    )
    + f" ELSE '{P.hex_threshold(_DEFAULT_RATE)}' END"
)


@query(
    "stratified_sample_counts",
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN {_DUCK_SAMPLE_BUCKET} < {_DUCK_RATE_THR}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(SUM(CASE WHEN {_DUCK_SAMPLE_BUCKET} < {_DUCK_RATE_THR}
                             THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
        FROM documents
        GROUP BY 1
    """,
    tags=("extension", "pipeline", "sampling"),
)
def stratified_sample_counts(spark, sf_dir):
    """Per-language stratified sampling (language rebalancing: keep all zh,
    half of en, a quarter of de/es/fr). The keep-decision is a stateless
    hash map-side expression — no RNG state, no shuffle; the per-stratum
    rollup shares one exchange on lang."""
    docs = load_table(spark, sf_dir, "documents")
    keep = P.stratified_keep("doc_id", "lang", _RATES, default=_DEFAULT_RATE)
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.sum(F.when(keep, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("sampled_chars"),
    )


# --- sequence packing ----------------------------------------------------

_PACK_BUDGET = 256


@query(
    "pack_sequences",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id, len({_DUCK_TOKENS}) AS n_tok
            FROM documents
        ), c AS (
            SELECT source, n_tok,
                   SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
            FROM t
        )
        SELECT source,
               CAST(FLOOR((cum - n_tok) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
        FROM c
        GROUP BY 1, 2
    """,
    tags=("extension", "pipeline", "packing", "window"),
)
def pack_sequences(spark, sf_dir):
    """Fixed-budget sequence packing: lay documents out in doc_id order
    within each source shard and start a new pack whenever the running
    token total crosses a multiple of the budget. Sharded by source on
    purpose — a global ordering would serialize 100 TB through one
    partition; here the single shuffle is on the shard key and packs build
    in parallel. The per-pack rollup reuses the window's partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "source", "doc_id", T.token_count("text").alias("n_tok")
    )
    pack = P.pack_id("n_tok", _PACK_BUDGET, ["source"], ["doc_id"])
    return (
        staged.select("source", "n_tok", pack.alias("pack_id"))
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("pack_tokens"),
        )
    )


# --- benchmark contamination ---------------------------------------------

_GRAM_N = 4  # word 4-grams: rare enough to mean real overlap, common
# enough to stay non-vacuous on the synthetic corpus
_DUCK_GRAMS = f"""
    list_distinct(list_transform(
        range(1, greatest(len(t) - {_GRAM_N - 1}, 1) + 1),
        i -> array_to_string(t[i:i+{_GRAM_N - 1}], ' ')))
"""


@query(
    "benchmark_contamination",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
        ), g AS (
            SELECT doc_id, unnest({_DUCK_GRAMS}) AS gram FROM toks
        )
        SELECT c.doc_id AS doc_id,
               CAST(COUNT(DISTINCT c.gram) AS BIGINT) AS n_shared_grams,
               CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
        FROM g c JOIN g b ON c.gram = b.gram
        WHERE c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
        GROUP BY 1
    """,
    tags=("extension", "pipeline", "contamination", "join"),
)
def benchmark_contamination(spark, sf_dir):
    """Benchmark-contamination check: corpus documents sharing a word
    4-gram with the held-out benchmark set (here: every 20th doc stands in
    for the benchmark). Both sides explode to distinct grams. A REAL
    benchmark set is bounded and AQE will broadcast it; this stand-in is
    5% of the corpus (SF-linear), so the join carries NO forced hint
    (r6 hint policy, SCALING.md) — at small scale AQE still broadcasts,
    at 100 TB the grams hash-join on the shared gram key."""
    docs = load_table(spark, sf_dir, "documents")

    def grams_of(side):
        # filter BEFORE tokenize/shingle: each side pays only for its own
        # documents (one combined corpus pass, not two full passes)
        return docs.filter(side).select(
            "doc_id", T.tokens("text").alias("toks")
        ).select(
            "doc_id",
            F.explode(T.shingles_from_tokens(F.col("toks"), _GRAM_N)).alias(
                "gram"
            ),
        )

    corpus = grams_of(F.col("doc_id") % 20 != 0).alias("c")
    bench = grams_of(F.col("doc_id") % 20 == 0).alias("b")
    return (
        corpus.join(bench, F.col("c.gram") == F.col("b.gram"))
        .groupBy(F.col("c.doc_id").alias("doc_id"))
        .agg(
            F.count_distinct(F.col("c.gram"))
            .cast("bigint")
            .alias("n_shared_grams"),
            F.count_distinct(F.col("b.doc_id"))
            .cast("bigint")
            .alias("n_bench_docs"),
        )
    )


# --- PII scan ------------------------------------------------------------

# The synthetic corpus contains no natural PII (no digits, no '@'), so the
# scan seeds deterministic synthetic PII from doc_id — the identical
# expression on both engines — to certify the counting semantics end to
# end.
_DUCK_AUG = """
    text || CASE
        WHEN doc_id % 10 = 0
        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        WHEN doc_id % 10 = 5
        THEN ' host 10.0.' || CAST(doc_id % 200 AS VARCHAR)
             || '.' || CAST(doc_id % 100 AS VARCHAR) || ' up'
        ELSE '' END
"""


def _aug_text() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            d % 10 == 0,
            F.concat(
                F.lit(" contact user"),
                d.cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            d % 10 == 5,
            F.concat(
                F.lit(" host 10.0."),
                (d % 200).cast("string"),
                F.lit("."),
                (d % 100).cast("string"),
                F.lit(" up"),
            ),
        )
        .otherwise(F.lit("")),
    )


@query(
    "doc_pii_scan",
    oracle=f"""
        WITH a AS (SELECT source, {_DUCK_AUG} AS aug FROM documents)
        SELECT source,
               CAST(SUM(CASE WHEN len(regexp_extract_all(aug, '{PII.EMAIL_RE}')) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
               CAST(SUM(len(regexp_extract_all(aug, '{PII.EMAIL_RE}'))) AS BIGINT)
                   AS total_emails,
               CAST(SUM(CASE WHEN len(regexp_extract_all(aug, '{PII.IPV4_RE}')) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
               CAST(SUM(len(regexp_extract_all(aug, '{PII.IPV4_RE}'))) AS BIGINT)
                   AS total_ips
        FROM a
        GROUP BY 1
    """,
    tags=("extension", "pipeline", "pii", "regex"),
)
def doc_pii_scan(spark, sf_dir):
    """Per-source PII scan: documents containing (and total occurrences of)
    email addresses and IPv4 literals. Detection is a narrow regex map
    inside codegen — no shuffle until the tiny per-source rollup. The
    redaction twin (functions/pii.py::scrub) is golden-tested."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("source", _aug_text().alias("aug"))
    emails = PII.pii_count("aug", "email")
    ips = PII.pii_count("aug", "ipv4")
    return aug.groupBy("source").agg(
        F.sum(F.when(emails > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_email"),
        F.sum(emails).cast("bigint").alias("total_emails"),
        F.sum(F.when(ips > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_with_ip"),
        F.sum(ips).cast("bigint").alias("total_ips"),
    )


# --- end-to-end curation funnel ------------------------------------------

from pyspark.sql import Window  # noqa: E402

from .q_text import _DUCK_PUNCT_STAGE, _duck_lang_id, duck_quality_expr  # noqa: E402

_QUALITY_MIN = 0.5


@query(
    "corpus_curation_funnel",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, text,
                   {_DUCK_TOKENS} AS toks,
                   length(text) AS n,
                   {_DUCK_PUNCT_STAGE} AS n_punct
            FROM documents
        ), s AS (
            SELECT doc_id, lang,
                   {duck_quality_expr()} AS quality,
                   {_duck_lang_id()} AS plang,
                   md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp,
                   {_DUCK_SAMPLE_BUCKET} < {_DUCK_RATE_THR} AS keep,
                   CASE WHEN {_DUCK_SPLIT_BUCKET} < '{_T_HI}' THEN 'train'
                        WHEN {_DUCK_SPLIT_BUCKET} < '{_V_HI}' THEN 'val'
                        ELSE 'test' END AS split
            FROM t
        ), q AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM s WHERE quality >= {_QUALITY_MIN} AND plang <> 'und'
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_raw,
               (SELECT CAST(COUNT(CASE WHEN quality >= {_QUALITY_MIN} THEN 1 END) AS BIGINT)
                  FROM s) AS n_quality,
               CAST(COUNT(*) AS BIGINT) AS n_lang,
               CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_dedup,
               CAST(COUNT(CASE WHEN rn = 1 AND keep THEN 1 END) AS BIGINT) AS n_sampled,
               CAST(COUNT(CASE WHEN rn = 1 AND keep AND split = 'train' THEN 1 END) AS BIGINT)
                   AS n_train
        FROM q
    """,
    tags=("extension", "pipeline", "funnel", "window"),
)
def corpus_curation_funnel(spark, sf_dir):
    """The full curation pipeline as ONE declarative plan — quality filter
    → language gate → fingerprint dedup (keep lowest doc_id) → stratified
    sampling → train split — reported as a funnel of surviving-document
    counts. Every stage decision is the same md5-deterministic expression
    the stage's standalone query uses, so the funnel certifies the stages
    COMPOSE correctly, not just that each works alone.

    Scale shape: one narrow scoring pass over the corpus, one shuffle on
    the fingerprint for the dedup window, then two single-row aggregates
    joined by broadcast. No stage materializes an intermediate corpus."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "lang",
        T.quality_score("text").alias("quality"),
        T.lang_id("text").alias("plang"),
        T.fingerprint("text").alias("fp"),
        P.stratified_keep("doc_id", "lang", _RATES, default=_DEFAULT_RATE).alias(
            "keep"
        ),
        P.split_assign("doc_id", _TRAIN, _VAL).alias("split"),
    )
    base = staged.agg(
        F.count("*").cast("bigint").alias("n_raw"),
        F.count(F.when(F.col("quality") >= _QUALITY_MIN, 1))
        .cast("bigint")
        .alias("n_quality"),
    )
    q = staged.filter(
        (F.col("quality") >= _QUALITY_MIN) & (F.col("plang") != "und")
    ).withColumn(
        "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    )
    rep = F.col("rn") == 1
    funnel = q.agg(
        F.count("*").cast("bigint").alias("n_lang"),
        F.count(F.when(rep, 1)).cast("bigint").alias("n_dedup"),
        F.count(F.when(rep & F.col("keep"), 1)).cast("bigint").alias("n_sampled"),
        F.count(F.when(rep & F.col("keep") & (F.col("split") == "train"), 1))
        .cast("bigint")
        .alias("n_train"),
    )
    return base.crossJoin(funnel).select(
        "n_raw", "n_quality", "n_lang", "n_dedup", "n_sampled", "n_train"
    )


# --- tokenizer training (iterative; unrolled-CTE value oracle) ---------------------


def _bpe_oracle_sql(n_merges: int = 10) -> str:
    """Unroll the BPE training loop as chained MATERIALIZED CTEs (the
    host_graph_kcore 40-round-unroll discipline, r6): per round, pair
    counts over the current vocabulary (UNNEST of adjacent-pair
    structs), the deterministic argmax (ORDER BY pf DESC, l, r LIMIT 1),
    and the greedy left-to-right merge as a list_reduce fold over
    single-element lists — DuckDB's lambda accumulator must share the
    element type, and lambdas cannot hold subqueries, so the winning
    pair cross-joins in as plain columns. MATERIALIZED stops the ~3×
    per-round CTE re-inlining that would otherwise go exponential.
    Upgrades the engine's LAST rows-only query to a full value gate:
    the oracle replays all ten argmax/merge rounds from the raw corpus
    and must reproduce rank, pair, and frequency bit-for-bit."""
    parts = [f"""WITH words AS MATERIALIZED (
        SELECT w AS word, COUNT(*) AS freq
        FROM (SELECT unnest({_DUCK_TOKENS}) AS w FROM documents)
        GROUP BY 1
    ),
    r0 AS MATERIALIZED (
        SELECT freq,
               list_append(list_transform(range(1, length(word) + 1),
                                          i -> word[i:i]), '</w>') AS syms
        FROM words
    )"""]
    for k in range(n_merges):
        parts.append(f""",
    p{k} AS MATERIALIZED (
        SELECT u.l AS l, u.r AS r, SUM(freq)::BIGINT AS pf
        FROM r{k}, UNNEST(list_transform(
                 range(1, len(syms)),
                 i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS t(u)
        GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (
        SELECT l, r, pf FROM p{k} ORDER BY pf DESC, l, r LIMIT 1
    ),
    r{k + 1} AS MATERIALIZED (
        SELECT freq,
               list_reduce(
                   list_transform(syms, s -> [s]),
                   (acc, x) -> CASE
                       WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
                       THEN list_append(acc[:len(acc) - 1], b.l || b.r)
                       ELSE list_concat(acc, x) END
               ) AS syms
        FROM r{k}, b{k} b
    )""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {k}::BIGINT AS rank, l AS left, r AS right, "
        f"l || r AS merged, pf AS freq FROM b{k}"
        for k in range(n_merges)
    )
    return "".join(parts) + "\n" + sel + "\nORDER BY rank"


@query(
    "bpe_learned_merges",
    oracle=_bpe_oracle_sql(),  # r6: the iterative argmax loop, unrolled
    # into chained MATERIALIZED CTEs — see _bpe_oracle_sql
    tags=("extension", "pipeline", "tokenizer", "iterative"),
)
def bpe_learned_merges(spark, sf_dir):
    """Top-10 learned BPE merges over the corpus (operators/tokenizer.py):
    one corpus-sized word count, then per-iteration pair counts over the
    tiny vocabulary — training cost is independent of corpus size after
    the first pass, which is why BPE learning survives 100 TB."""
    from ..operators.tokenizer import learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=10)
    return spark.createDataFrame(
        [
            (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
            for m in merges
        ],
        "rank bigint, left string, right string, merged string, freq bigint",
    )


@query(
    "weighted_sample_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 0
        ORDER BY ln((('0x' || substr(md5('wsample:' || o_orderkey), 1, 15))::BIGINT + 1)
                    / 1152921504606846976.0) / o_totalprice DESC,
                 o_orderkey
        LIMIT 100
    """,
    tags=("pipeline", "sampling", "weighted"),
)
def weighted_sample_orders(spark, sf_dir):
    """100-row weighted sample of orders, inclusion probability
    proportional to o_totalprice — the Efraimidis–Spirakis top-k priority
    (operators/pipeline.py::weighted_sample). Deterministic md5-derived
    uniforms, so BOTH engines select the identical sample (value-hash
    gate over the sampled rows, certifying the priority kernel). Plans as
    TakeOrderedAndProject: per-partition heaps, no global sort — the
    mixture-sampling primitive of a training-data pipeline."""
    orders = load_table(spark, sf_dir, "orders")
    return P.weighted_sample(
        orders.select("o_orderkey", "o_totalprice"),
        id_col="o_orderkey",
        weight_col="o_totalprice",
        k=100,
    )


@query(
    "per_source_doc_sample",
    oracle="""
        SELECT source, doc_id, rk
        FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('psample:' || doc_id), doc_id
                   )::BIGINT AS rk
            FROM documents
        )
        WHERE rk <= 5
    """,
    tags=("pipeline", "sampling", "per-group"),
)
def per_source_doc_sample(spark, sf_dir):
    """Fixed-size per-group sample: exactly 5 documents per source,
    chosen by ranking on a salted md5 of the id — the deterministic
    group-wise analog of reservoir sampling (stable under reprocessing,
    replayed bit-for-bit by the oracle). One shuffle on the group key;
    rank-≤-k prunes inside the window, so only k rows per group survive
    to the output. The eyeball-QA primitive of a corpus pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("psample:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select(
            "source",
            "doc_id",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 5)
    )


_N_SHARDS = 16


@query(
    "balanced_shard_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len({_DUCK_TOKENS})::BIGINT AS n_tokens
            FROM documents
        ),
        r AS (
            SELECT doc_id, n_tokens,
                   row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
            FROM t
        )
        SELECT ((rn - 1) % {_N_SHARDS})::INT AS shard,
               COUNT(*)::BIGINT AS n_docs,
               SUM(n_tokens)::BIGINT AS total_tokens,
               MIN(n_tokens) AS min_tokens,
               MAX(n_tokens) AS max_tokens
        FROM r GROUP BY 1
    """,
    tags=("extension", "pipeline", "sharding", "balance"),
)
def balanced_shard_stats(spark, sf_dir):
    """Weight-balanced training-export shards: documents ranked by
    (token count DESC, doc_id) and dealt round-robin over 16 shards (the
    LPT heuristic — operators/pipeline.py::balanced_shards), summarized
    per shard. Visible in the result: per-shard token totals within one
    dealing round of each other — the equal-work-per-reader property
    hash sharding can't give on heavy-tailed document lengths.

    The rank comes from global_rank's scalable zipWithIndex pattern
    (range repartition + per-partition offsets), NOT a single-partition
    window; the oracle's plain row_number certifies that the parallel
    form computes the identical total-order rank."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").cast("bigint").alias("n_tokens")
    )
    sharded = P.balanced_shards(
        docs, "n_tokens", "doc_id", _N_SHARDS, shard_col="shard"
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


@query(
    "doc_length_quantile_norm",
    oracle="""
        WITH r AS (
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS rank
            FROM documents
        ),
        n AS (SELECT COUNT(*)::BIGINT AS n FROM documents)
        SELECT r.doc_id, r.n_chars, r.rank,
               CASE WHEN n.n > 1
                    THEN ROUND((r.rank - 1)::DOUBLE / (n.n - 1), 6)
                    ELSE 0.0 END AS qnorm
        FROM r CROSS JOIN n
    """,
    tags=("extension", "pipeline", "normalization", "rank"),
)
def doc_length_quantile_norm(spark, sf_dir):
    """Quantile (rank) normalization of document lengths
    (operators/pipeline.py::rank_normalize): every document's length
    maps to its empirical quantile in [0, 1] — the outlier-robust
    feature transform — through the scalable global-rank pattern, with
    the oracle's plain row_number certifying the parallel rank."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return P.rank_normalize(docs, "n_chars", "doc_id", out_col="qnorm").select(
        "doc_id", "n_chars", "rank", "qnorm"
    )


_TE_SMOOTH = 10  # pseudo-count m in the smoothed estimator


@query(
    "brand_target_encoding",
    oracle=f"""
        WITH g AS (
            SELECT SUM(CAST(p_retailprice AS DECIMAL(18,4)))::DOUBLE
                   / COUNT(*) AS global_mean
            FROM part
        ),
        b AS (
            SELECT p_brand,
                   COUNT(*)::BIGINT AS n,
                   SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS s
            FROM part GROUP BY p_brand
        )
        SELECT b.p_brand, b.n,
               ROUND(b.s::DOUBLE / b.n, 6) AS brand_mean,
               ROUND((b.s::DOUBLE + {_TE_SMOOTH} * g.global_mean)
                     / (b.n + {_TE_SMOOTH}), 6) AS encoded
        FROM b CROSS JOIN g
    """,
    tags=("extension", "pipeline", "target-encoding", "ml-prep"),
)
def brand_target_encoding(spark, sf_dir):
    """Smoothed target encoding of the brand category (the m-estimate
    encoder: (Σy + m·ȳ_global)/(n + m), m=10) — the high-cardinality
    categorical encoder ML pipelines use where one-hot explodes. Sums
    are DECIMAL-exact so the gate is order-insensitive; the global mean
    rides a broadcast single-row cross join; one partial-agg'd shuffle
    on the category total."""
    part = load_table(spark, sf_dir, "part")
    price_dec = F.col("p_retailprice").cast("decimal(18,4)")
    g = part.agg(
        (F.sum(price_dec).cast("double") / F.count(F.lit(1)))
        .alias("global_mean")
    )
    b = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(price_dec).alias("s"),
    )
    return b.crossJoin(F.broadcast(g)).select(
        "p_brand",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
            "brand_mean"
        ),
        F.round(
            (F.col("s").cast("double") + _TE_SMOOTH * F.col("global_mean"))
            / (F.col("n") + _TE_SMOOTH),
            6,
        ).alias("encoded"),
    )


@query(
    "source_share_capped_counts",
    oracle="""
        WITH w AS (
            SELECT source, doc_id, n_chars FROM documents
        ),
        src AS (
            SELECT source, SUM(n_chars)::DOUBLE AS src_w FROM w GROUP BY source
        ),
        tot AS (
            SELECT SUM(src_w) AS tot_w FROM src
        ),
        rates AS (
            SELECT source, LEAST(1.0, 0.04 * t.tot_w / s.src_w) AS rate
            FROM src s CROSS JOIN tot t
        ),
        kept AS (
            SELECT w.source, w.doc_id, w.n_chars
            FROM w JOIN rates r ON w.source = r.source
            WHERE (('0x' || substr(md5('cap:' || CAST(w.doc_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
                  / 1152921504606846976.0 < r.rate
        )
        SELECT source,
               COUNT(*)::BIGINT AS kept_docs,
               SUM(n_chars)::BIGINT AS kept_chars
        FROM kept GROUP BY source
    """,
    tags=("pipeline", "sampling", "domain-capping", "extension"),
)
def source_share_capped_counts(spark, sf_dir):
    """Domain capping (round 7, operators/pipeline.py::cap_source_share):
    no single source may exceed 4% of the corpus character weight
    (the 20 synthetic sources each hold ~5%, so the cap BINDS on every
    source — a loose cap would leave the admission math unexercised) —
    over-cap sources are deterministically downsampled to an expected
    share of exactly the cap, under-cap sources pass through whole. The
    keep decision is a salted md5 uniform compared against the source's
    rate, so the oracle replays every individual admission bit-for-bit
    (the sample_priority uniform recipe). One source-keyed partial-agg
    shuffle + a broadcast rate join + a narrow filter — the corpus never
    shuffles, hot domains cost the same per row as cold ones."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    kept = P.cap_source_share(
        docs, weight_col="n_chars", max_share=0.04, key="doc_id", salt="cap"
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_chars").alias("kept_chars"),
    )


_TB_BUDGET = 100_000


@query(
    "token_budget_selection",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, source, n_chars,
                   SUM(n_chars) OVER (
                       ORDER BY n_chars DESC, doc_id
                       ROWS UNBOUNDED PRECEDING
                   )::BIGINT AS cum_tokens
            FROM documents
        )
        SELECT doc_id, source, n_chars, cum_tokens
        FROM c WHERE cum_tokens <= {_TB_BUDGET}
    """,
    tags=("pipeline", "selection", "budget", "extension"),
)
def token_budget_selection(spark, sf_dir):
    """Best-first selection under a token budget (round 7,
    operators/pipeline.py::take_token_budget): order the corpus by
    weight descending (quality-proxy; doc_id tiebreak = a TOTAL order)
    and keep rows while the inclusive running total stays within the
    budget — "take the best N tokens". The running total is
    partitioned_cumsum, so the global window never funnels the relation
    through one task (sort-contiguous buckets + a ≤32-row offset
    window); integer sums make the cut exact, which is what lets the
    single-window SQL oracle certify the distributed form."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = P.take_token_budget(
        docs,
        order_cols=[("n_chars", "desc"), ("doc_id", "asc")],
        token_col="n_chars",
        budget=_TB_BUDGET,
    )
    return out.select("doc_id", "source", "n_chars", "cum_tokens")


@query(
    "dsir_selected_docs",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang,
                   unnest(list_filter(
                       regexp_split_to_array(trim(text), '\\s+'),
                       x -> x <> '')) AS feat
            FROM documents
        ),
        rcnt AS (
            SELECT feat, COUNT(*) AS rc,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
            FROM tok GROUP BY feat
        ),
        tot AS (
            SELECT SUM(rc) AS rtot, SUM(tc) AS ttot, COUNT(*) AS v
            FROM rcnt
        ),
        lam AS (
            SELECT feat,
                   CAST(FLOOR((ln((tc + 1)::DOUBLE) - ln((rc + 1)::DOUBLE)
                               + ln((rtot + v)::DOUBLE)
                               - ln((ttot + v)::DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS lam_micro
            FROM rcnt CROSS JOIN tot
        ),
        w AS (
            SELECT doc_id,
                   COUNT(*) AS n_feats,
                   SUM(lam_micro)::BIGINT AS logw_micro
            FROM tok JOIN lam USING (feat)
            GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang, w.n_feats, w.logw_micro
        FROM documents d JOIN w USING (doc_id)
        ORDER BY w.logw_micro DESC, d.doc_id
        LIMIT 100
    """,
    tags=("pipeline", "curation", "dsir", "extension"),
)
def dsir_selected_docs(spark, sf_dir):
    """DSIR data selection (operators/pipeline.py::dsir_select — Data
    Selection via Importance Resampling, arXiv:2302.03169) under the
    hard cross-engine gate: add-1 unigram models over the English slice
    (the 'target domain') vs the whole corpus; every document scored by
    its summed per-token log importance ratio; the 100 highest-weight
    documents selected deterministically. Per-feature log-ratios
    quantize to integer micro-nats (the perplexity gate's float
    discipline), so the BIGINT document scores — and therefore the
    selected set — hash-match exactly. The hashed-feature scale form
    (bounded broadcastable λ table) is pinned against this exact form
    in tests/test_pipeline_dsir.py."""
    from ..operators.pipeline import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_select(docs, F.col("lang") == "en", 100)
    return out.select("doc_id", "lang", "n_feats", "logw_micro")


_CHUNK, _OVERLAP = 32, 8  # stride 24


@query(
    "doc_context_chunks",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(trim(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ),
        n AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CASE WHEN len(toks) <= 0 THEN 0
                        ELSE GREATEST(1, CAST(CEIL(
                            (len(toks) - {_OVERLAP}) /
                            {_CHUNK - _OVERLAP}.0) AS BIGINT))
                   END AS k
            FROM t
        ),
        idx AS (SELECT unnest(range(0, 10000)) AS chunk_idx)
        SELECT n.doc_id,
               idx.chunk_idx,
               idx.chunk_idx * {_CHUNK - _OVERLAP} AS chunk_start,
               len(list_slice(n.toks,
                              idx.chunk_idx * {_CHUNK - _OVERLAP} + 1,
                              LEAST(idx.chunk_idx * {_CHUNK - _OVERLAP}
                                    + {_CHUNK}, n.n))) AS n_chunk_tokens,
               array_to_string(
                   list_slice(n.toks,
                              idx.chunk_idx * {_CHUNK - _OVERLAP} + 1,
                              LEAST(idx.chunk_idx * {_CHUNK - _OVERLAP}
                                    + {_CHUNK}, n.n)),
                   ' ') AS chunk_text
        FROM n JOIN idx ON idx.chunk_idx < n.k
    """,
    tags=("pipeline", "chunking", "rag", "extension"),
)
def doc_context_chunks(spark, sf_dir):
    """Context chunking for embedding/retrieval pipelines
    (operators/pipeline.py::chunk_documents): overlapping token windows
    (size 32, overlap 8) over every document — chunk index, start
    offset, token count, and the reassembled chunk text, all certified
    against a DuckDB replay of the same slicing. One narrow explode,
    no shuffle; the scale posture is embarrassingly parallel."""
    from ..operators.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=_CHUNK, overlap=_OVERLAP)


_MIX_BUDGET = 250


@query(
    "temperature_mixed_counts",
    oracle=f"""
        WITH src AS (
            SELECT source, COUNT(*)::BIGINT AS n
            FROM documents GROUP BY source
        ),
        w AS (SELECT source, n, sqrt(n::DOUBLE) AS wt FROM src),
        tot AS (SELECT SUM(wt) AS tw FROM w),
        rates AS (
            SELECT source,
                   LEAST(1.0,
                         {_MIX_BUDGET}.0 * (wt / tw) / n::DOUBLE) AS rate
            FROM w CROSS JOIN tot
        ),
        kept AS (
            SELECT d.source, d.doc_id
            FROM documents d JOIN rates r USING (source)
            WHERE (('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)),
                                   1, 15))::BIGINT)::DOUBLE
                  / 1152921504606846976.0 < r.rate
        )
        SELECT source, COUNT(*)::BIGINT AS kept_docs
        FROM kept GROUP BY source
    """,
    tags=("pipeline", "sampling", "mixing", "extension"),
)
def temperature_mixed_counts(spark, sf_dir):
    """Temperature-based source mixing (round 8,
    operators/pipeline.py::temperature_mix): resample every source
    toward n^0.5 proportions under a 250-document budget — the mixture-
    flattening recipe multilingual/multi-corpus training runs use. The
    budget binds on every source at sf0.01 (natural shares ≈ 5%, flat
    sqrt weights → rates ≈ 0.5), so the admission math is exercised
    everywhere; each keep decision is the salted md5 uniform against the
    source's rate, replayed bit-for-bit by the oracle. α = 0.5 keeps the
    share weights on sqrt (correctly-rounded IEEE on both engines —
    pow()'s last ulp is not portable, so other temperatures run outside
    the gate)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    kept = P.temperature_mix(
        docs, alpha=0.5, budget_docs=_MIX_BUDGET, key="doc_id", salt="mix"
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept_docs")
    )


_DSIR_BUCKETS = 512


@query(
    "dsir_bigram_selected_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   list_filter(
                       regexp_split_to_array(trim(text), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ),
        big AS (
            SELECT doc_id, lang,
                   unnest(list_transform(
                       range(1, greatest(len(toks), 1)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS feat0
            FROM t
        ),
        tok AS (
            SELECT doc_id, lang,
                   (('0x' || substr(md5(feat0), 1, 15))::BIGINT
                    % {_DSIR_BUCKETS}) AS feat
            FROM big
        ),
        rcnt AS (
            SELECT feat, COUNT(*) AS rc,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
            FROM tok GROUP BY feat
        ),
        tot AS (
            SELECT SUM(rc) AS rtot, SUM(tc) AS ttot, COUNT(*) AS v
            FROM rcnt
        ),
        lam AS (
            SELECT feat,
                   CAST(FLOOR((ln((tc + 1)::DOUBLE) - ln((rc + 1)::DOUBLE)
                               + ln((rtot + v)::DOUBLE)
                               - ln((ttot + v)::DOUBLE)) * 1000000.0 + 0.5)
                        AS BIGINT) AS lam_micro
            FROM rcnt CROSS JOIN tot
        ),
        w AS (
            SELECT doc_id,
                   COUNT(*) AS n_feats,
                   SUM(lam_micro)::BIGINT AS logw_micro
            FROM tok JOIN lam USING (feat)
            GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang, w.n_feats, w.logw_micro
        FROM documents d JOIN w USING (doc_id)
        ORDER BY w.logw_micro DESC, d.doc_id
        LIMIT 100
    """,
    tags=("pipeline", "curation", "dsir", "bigram", "extension"),
)
def dsir_bigram_selected_docs(spark, sf_dir):
    """DSIR with HASHED BIGRAM features under the hard cross-engine
    gate (round 9 — VERDICT r8 item 5: the paper's fidelity claim rests
    on hashed n-grams, arXiv:2302.03169 §3, and round 8 gated only the
    exact-unigram form): consecutive space-joined token pairs hashed
    into {_DSIR_BUCKETS} buckets through the md5→60-bit-int idiom the
    MinHash oracles use (identical in Spark ``conv(substr(md5,1,15))``
    and DuckDB ``('0x'||…)::BIGINT``), add-1 models over the bucketed
    counts, and the 100 highest-weight documents selected
    deterministically. The oracle replays the ENTIRE bucketed bigram
    model — bigram construction, bucket assignment, both count tables,
    micro-nat quantization — bit-for-bit; n_feats certifies the bigram
    explode (len(toks)−1 per document) and logw_micro the bucketed λ.
    The production path swaps ``hasher="spark"`` for native murmur
    hashing at ~25% less cost with the same shape
    (operators/pipeline.py::dsir_importance_weights)."""
    from ..operators.pipeline import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_select(
        docs, F.col("lang") == "en", 100,
        hash_buckets=_DSIR_BUCKETS, ngram=2, hasher="md5",
    )
    return out.select("doc_id", "lang", "n_feats", "logw_micro")
