"""Market-basket co-occurrence under the cross-engine gate
(operators/market.py): pair counts from a basket-keyed self-join and the
lift association measure — integer counts everywhere, one division per
output row, top-k by a total deterministic order."""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import market as M
from ..tables import load_table
from .registry import query


@query(
    "parts_bought_together",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem
        ),
        n_orders AS (
            SELECT COUNT(DISTINCT basket)::BIGINT AS n_baskets FROM items
        ),
        item_cnt AS (
            SELECT item, COUNT(*)::BIGINT AS n_item FROM items GROUP BY item
        ),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS n_ab
            FROM items a
            JOIN items b ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2
        )
        SELECT p.item_a, p.item_b, p.n_ab,
               ca.n_item AS n_a, cb.n_item AS n_b,
               ROUND((p.n_ab * n.n_baskets)::DOUBLE
                     / (ca.n_item * cb.n_item), 6) AS lift
        FROM pairs p
        JOIN item_cnt ca ON ca.item = p.item_a
        JOIN item_cnt cb ON cb.item = p.item_b
        CROSS JOIN n_orders n
        ORDER BY n_ab DESC, item_a, item_b
        LIMIT 40
    """,
    tags=("market-basket", "cooccurrence", "self-join", "extension"),
)
def parts_bought_together(spark, sf_dir):
    """Top-40 'frequently bought together' part pairs across orders, with
    lift (operators/market.py::basket_pair_lift): the item-to-item
    collaborative-filtering kernel. Pair fan-out is bounded by basket
    size — C(items per order, 2), never catalog size — and the
    merge-hinted self-join reuses one exchange of the distinct basket
    relation; item totals and the order count broadcast. The gate
    certifies the dedupe, the pair join, both aggregates, and the lift
    math."""
    li = load_table(spark, sf_dir, "lineitem")
    return M.basket_pair_lift(li, "l_orderkey", "l_partkey", k=40).select(
        F.col("item_a"),
        F.col("item_b"),
        "n_ab",
        "n_a",
        "n_b",
        "lift",
    )
