"""Market-basket co-occurrence analysis (frequently-bought-together).

The association-mining primitive over (basket, item) facts: which item
pairs co-occur in more baskets than their individual popularity
predicts. The naive item-item matrix is |items|² and intractable; the
standard distributed shape — used here — exploits that PAIRS ONLY
EXIST WITHIN A BASKET: a self-join on the basket id fans out at most
B² rows per basket (B = basket size, single digits for retail
orders), so total work is Σ B² ≈ linear in the fact table, one
shuffle on the basket id. A pathological mega-basket would square —
``max_basket`` drops baskets above a bound (they are carts-gone-wrong
or bots, and they contribute B² noise pairs), keeping the fan-out
provably bounded, the same df-cutoff discipline as the dedup family.

The reference has no co-occurrence surface; extension component
mapped to the lineitem/orders tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def co_occurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_count: int = 2,
    max_basket: int = 100,
) -> DataFrame:
    """Item-pair co-occurrence counts with lift.

    ``lift = N · n_ab / (n_a · n_b)`` — >1 means the pair co-occurs
    more than independence predicts. Emitted as ``lift_ppm`` in pure
    integer arithmetic (``1e6·N·n_ab div n_a·n_b``) so results replay
    exactly across engines; the product stays under 2^63 up to ~10^8
    baskets with ppm scaling — beyond that, report the double instead.
    Pairs are canonical (item_a < item_b), counted once per basket
    regardless of quantity (distinct basket-item pairs first).
    Returns (item_a, item_b, n_co, n_a, n_b, n_baskets, lift_ppm)
    for pairs with ``n_co >= min_count``.
    """
    b, i = F.col(basket_col), F.col(item_col)
    facts = df.select(b.alias("_b"), i.alias("_i")).distinct()
    if max_basket is not None:
        small = (
            facts.groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .where(F.col("_sz") <= max_basket)
            .select("_b")
        )
        facts = facts.join(small, on="_b")
    item_n = facts.groupBy("_i").agg(F.count(F.lit(1)).alias("_n"))
    total = facts.select("_b").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    left = facts.select("_b", F.col("_i").alias("item_a"))
    right = facts.select("_b", F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, on="_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= min_count)
    )
    return (
        pairs.join(
            item_n.select(F.col("_i").alias("item_a"),
                          F.col("_n").alias("n_a")),
            on="item_a",
        )
        .join(
            item_n.select(F.col("_i").alias("item_b"),
                          F.col("_n").alias("n_b")),
            on="item_b",
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift_ppm",
            F.expr(
                "CAST(1000000 * n_baskets * n_co AS BIGINT) "
                "DIV (n_a * n_b)"
            ),
        )
        .select(
            "item_a", "item_b", "n_co", "n_a", "n_b",
            "n_baskets", "lift_ppm",
        )
    )
