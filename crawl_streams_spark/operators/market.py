"""Market-basket co-occurrence analytics: which items appear together in
the same basket (order), with association strength (lift) — the
"frequently bought together" / item-to-item collaborative-filtering
primitive (Linden et al. 2003, Amazon item-item CF; Agrawal & Srikant
1994 frequent itemsets at the pair level).

No reference counterpart (driver-mandated analytics extension on the
TPC-H-shaped tables).

Scale (100 TB of order lines):
- the basket relation dedupes to (order, item) first, so multi-line
  orders of one item count once;
- pair generation is a SELF-JOIN ON THE BASKET KEY — fan-out per order
  is C(items_in_order, 2), bounded by real basket sizes (tens), never by
  catalog size; both sides merge-hint so the runtime reuses ONE exchange
  of the basket relation (the lsh_pairs lesson);
- pair counts partial-aggregate on (item_a, item_b) — hot pairs (two
  bestsellers) collapse map-side like any skewed aggregate;
- item totals and the scalar order count ride broadcast joins; the
  top-k plans as TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["baskets", "pair_counts", "basket_pair_lift"]


def baskets(
    lines: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Distinct (basket, item) relation of a line-level fact."""
    return lines.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()


def pair_counts(b: DataFrame) -> DataFrame:
    """(item_a < item_b, n_ab): number of baskets containing both items.
    Self-equi-join on the basket key; merge-hinted so the distinct
    basket relation shuffles once and feeds both sides."""
    a = b.select("basket", F.col("item").alias("item_a")).alias("a")
    bb = b.select("basket", F.col("item").alias("item_b")).alias("b")
    return (
        a.hint("merge")
        .join(
            bb.hint("merge"),
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )


def basket_pair_lift(
    lines: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    k: int = 40,
) -> DataFrame:
    """Top-k co-occurring item pairs with lift:
    (item_a, item_b, n_ab, n_a, n_b, lift) where n_x counts baskets
    containing x, and lift = n_ab·N / (n_a·n_b) (>1 ⇒ bought together
    more than independence predicts). One float division per output row
    from integer counts, rounded to 6; the top-k orders by
    (n_ab DESC, item_a, item_b) — a total order, so the selected set is
    deterministic on any partitioning."""
    b = baskets(lines, basket_col, item_col)
    pairs = pair_counts(b).filter(F.col("n_ab") >= min_support)
    item_n = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    n_baskets = b.agg(
        F.count_distinct("basket").alias("n_baskets")
    )
    ca = item_n.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = item_n.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    scored = (
        # ca/cb are one row PER ITEM (SF-linear) — no broadcast hint
        # (r6 hint policy, SCALING.md); AQE broadcasts them when small.
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("n_ab"), F.asc("item_a"), F.asc("item_b")
    ).limit(k)
