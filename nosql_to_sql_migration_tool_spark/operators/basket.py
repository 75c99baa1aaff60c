"""Market-basket co-occurrence mining — frequent item PAIRS with
support and lift, the first (and at web scale, usually the only
affordable) level of association-rule mining (Agrawal & Srikant,
VLDB 1994, restricted to 2-itemsets).

Reference analogue: none — extends the SURVEY.md §2C analytics surface
(orders are baskets, parts are items: "customers who bought X also
bought Y").

Scale shape:

- pair generation is a PER-BASKET self-join: distinct (basket, item)
  rows joined to themselves on the basket key with ``item_a < item_b``
  — fan-out is k·(k-1)/2 per basket, bounded by basket SIZE (TPC-H
  baskets hold ≤ 7 lineitems; real carts tens), never by corpus size,
  so candidate volume is linear in the number of baskets. A pipeline
  facing pathological mega-baskets caps them first (the df-cap
  discipline of the dedup family) — documented, not silently applied;
- both groupBys (pair support, item support) are map-side combinable;
- lift joins are item-keyed lookups of the (bounded, vocabulary-sized)
  item-support table — broadcastable at steady state;
- the basket total is a single-row broadcast (sanctioned crossJoin).

Determinism: support counts are integers; lift is computed as ONE
double division of two exact integer products, rounded to 6 dp — the
same order-free contract as the tf-idf family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent unordered item pairs: ``(item_a, item_b, pair_support)``
    for pairs co-occurring in at least ``min_support`` distinct
    baskets. Duplicate items within a basket count once (distinct
    projection first), so support is "number of baskets", not "number
    of line collisions"."""
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    return _pairs_from_items(items, min_support)


def _pairs_from_items(items: DataFrame, min_support: int) -> DataFrame:
    a = items.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = items.select(F.col("__b"), F.col("__i").alias("item_b"))
    return (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """``basket_pairs`` + per-item supports + lift:
    ``lift = pair_support * n_baskets / (support_a * support_b)`` —
    > 1 means the items co-occur more than independence predicts.
    Output ``(item_a, item_b, pair_support, support_a, support_b,
    lift)``.

    The distinct (basket, item) projection feeds FOUR consumers (both
    pair-join sides, item supports, the basket total); one eager
    localCheckpoint computes its shuffle once — the same explicit
    materialization decision as the dedup family's rare-rows frame
    (a production pipeline would persist this projection stage)."""
    items = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = _pairs_from_items(items, min_support)
    item_support = items.groupBy("__i").agg(
        F.count(F.lit(1)).alias("__sup")
    )
    n_baskets = items.select(
        F.count_distinct(F.col("__b")).alias("__nb")
    )
    return (
        pairs.join(
            F.broadcast(
                item_support.select(
                    F.col("__i").alias("item_a"),
                    F.col("__sup").alias("support_a"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                item_support.select(
                    F.col("__i").alias("item_b"),
                    F.col("__sup").alias("support_b"),
                )
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            F.round(
                (F.col("pair_support") * F.col("__nb")).cast("double")
                / (F.col("support_a") * F.col("support_b")),
                6,
            ).alias("lift"),
        )
    )


def basket_pair_lift_sql(
    table: str,
    basket_expr: str,
    item_expr: str,
    min_support: int = 2,
) -> str:
    """DuckDB twin of ``basket_pair_lift``."""
    return f"""
WITH __items AS (
  SELECT DISTINCT {basket_expr} AS b, {item_expr} AS i FROM {table}
),
__pairs AS (
  SELECT a.i AS item_a, bb.i AS item_b, count(*) AS pair_support
  FROM __items a JOIN __items bb ON a.b = bb.b AND a.i < bb.i
  GROUP BY a.i, bb.i
  HAVING count(*) >= {min_support}
),
__sup AS (SELECT i, count(*) AS sup FROM __items GROUP BY i),
__nb AS (SELECT count(DISTINCT b) AS nb FROM __items)
SELECT p.item_a, p.item_b, p.pair_support,
       sa.sup AS support_a, sb.sup AS support_b,
       round(CAST(p.pair_support * nb.nb AS DOUBLE)
             / (sa.sup * sb.sup), 6) AS lift
FROM __pairs p
JOIN __sup sa ON p.item_a = sa.i
JOIN __sup sb ON p.item_b = sb.i
CROSS JOIN __nb nb
"""
