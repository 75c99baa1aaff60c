"""Market-basket pair mining (operators/basket.py): hand-fixture
support/lift goldens, within-basket duplicate handling, and the
min_support cut."""

from __future__ import annotations

from nosql_to_sql_migration_tool_spark.operators.basket import (
    basket_pair_lift,
    basket_pairs,
)


def _fixture(spark):
    # baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b} — plus a duplicate (1,a)
    # line that must NOT inflate support.
    rows = [
        (1, "a"), (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    return spark.createDataFrame(rows, "basket long, item string")


def test_pair_support_counts_baskets_not_lines(spark):
    df = _fixture(spark)
    got = {
        (r["item_a"], r["item_b"]): r["pair_support"]
        for r in basket_pairs(df, "basket", "item", 1).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}


def test_min_support_cut(spark):
    df = _fixture(spark)
    got = {
        (r["item_a"], r["item_b"])
        for r in basket_pairs(df, "basket", "item", 2).collect()
    }
    assert got == {("a", "b"), ("a", "c")}


def test_lift_golden(spark):
    df = _fixture(spark)
    rows = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pair_lift(df, "basket", "item", 1).collect()
    }
    # n_baskets=4, sup(a)=3 sup(b)=3 sup(c)=2
    ab = rows[("a", "b")]
    assert (ab["support_a"], ab["support_b"]) == (3, 3)
    assert ab["lift"] == round(2 * 4 / (3 * 3), 6)
    ac = rows[("a", "c")]
    assert ac["lift"] == round(2 * 4 / (3 * 2), 6)
    bc = rows[("b", "c")]
    assert bc["lift"] == round(1 * 4 / (3 * 2), 6)


def test_single_item_baskets_produce_no_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "basket long, item string"
    )
    assert basket_pairs(df, "basket", "item", 1).count() == 0


def test_lift_property_random_baskets(spark):
    """Randomized pin against a brute-force python reference: supports,
    pair supports and lifts must match exact enumeration for arbitrary
    baskets with duplicate lines."""
    import itertools
    import random

    rng = random.Random(20260814)
    for _ in range(4):
        rows = [
            (rng.randint(1, 8), rng.choice("abcde"))
            for _ in range(rng.randint(0, 40))
        ]
        df = spark.createDataFrame(
            rows or [(1, "a")], "basket long, item string"
        )
        data = rows or [(1, "a")]
        baskets = {}
        for b, i in data:
            baskets.setdefault(b, set()).add(i)
        nb = len(baskets)
        sup = {}
        for items in baskets.values():
            for i in items:
                sup[i] = sup.get(i, 0) + 1
        pair_sup = {}
        for items in baskets.values():
            for x, y in itertools.combinations(sorted(items), 2):
                pair_sup[(x, y)] = pair_sup.get((x, y), 0) + 1
        expect = {
            (x, y): (
                c,
                sup[x],
                sup[y],
                round(c * nb / (sup[x] * sup[y]), 6),
            )
            for (x, y), c in pair_sup.items()
            if c >= 1
        }
        got = {
            (r["item_a"], r["item_b"]): (
                r["pair_support"],
                r["support_a"],
                r["support_b"],
                r["lift"],
            )
            for r in basket_pair_lift(df, "basket", "item", 1).collect()
        }
        assert got == expect, data
