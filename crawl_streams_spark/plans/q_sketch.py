"""Count-min sketch under the cross-engine gate (functions/sketch.py):
both engines build the same (d, bucket, cnt) sketch over the corpus token
stream with the md5 bucket kernel, then point-query it for the top-20 true
tokens — the gate certifies the bucket addressing, the mergeable-count
build, AND the min-over-depth estimator bit-for-bit (est_cnt values, not
just error bounds)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import sketch as S
from ..tables import load_table
from .registry import query

_DEPTH = 4
_WIDTH = 512


@query(
    "cms_token_estimates",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        counts AS (
            SELECT tok, COUNT(*)::BIGINT AS true_cnt FROM toks GROUP BY tok
        ),
        top AS (
            SELECT tok, true_cnt FROM counts
            ORDER BY true_cnt DESC, tok LIMIT 20
        ),
        depths AS (SELECT unnest(range({_DEPTH}))::BIGINT AS d),
        sketch AS (
            SELECT d,
                   (('0x' || substr(md5(d || ':' || tok), 1, 15))::BIGINT)
                       % {_WIDTH} AS bucket,
                   COUNT(*)::BIGINT AS cnt
            FROM toks CROSS JOIN depths
            GROUP BY 1, 2
        )
        SELECT t.tok,
               t.true_cnt,
               MIN(s.cnt) AS est_cnt
        FROM top t
        CROSS JOIN depths dd
        JOIN sketch s
          ON s.d = dd.d
         AND s.bucket = (('0x' || substr(md5(dd.d || ':' || t.tok), 1, 15))::BIGINT)
                            % {_WIDTH}
        GROUP BY t.tok, t.true_cnt
    """,
    tags=("sketch", "cms", "approx"),
)
def cms_token_estimates(spark, sf_dir):
    """Count-min estimates for the corpus's top-20 tokens, next to their
    true counts. The sketch build's reduce key space is depth×width
    (2048) regardless of corpus size — the 100 TB replacement for an
    exact token groupBy when the item domain itself is huge; lookups
    broadcast the sketch. CMS guarantee (visible in the result): est_cnt
    ≥ true_cnt, overshoot bounded by collisions."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    sketch = S.cms_build(toks, "tok", depth=_DEPTH, width=_WIDTH)
    true_top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("tok"))
        .limit(20)
    )
    return S.cms_lookup(sketch, true_top, "tok", _DEPTH, _WIDTH)
