"""Scale-machinery tests: bucketed tables join with zero Exchange in the
physical plan; salted joins produce row-identical results to plain joins
while spreading hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.skew import salted_join
from nosql_to_sql_migration_tool_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def _physical_plan(df) -> str:
    """Formatted physical plan as text — the public explain() surface,
    captured (plan introspection lives in tests only; package code never
    touches private APIs)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_has_exchange(df) -> bool:
    """True when the physical plan contains a shuffle Exchange — the
    bucketing assertion helper."""
    return "Exchange" in _physical_plan(df)


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in ./spark-warehouse (warehouse.dir is a
    # static conf); DROP TABLE below removes the data
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    # disable broadcast so the join would otherwise shuffle both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(customer, "b_customer", "c_custkey", 4)
        write_bucketed(orders, "b_orders", "o_custkey", 4)
        joined = colocated_join(
            spark, "b_customer", "b_orders", "c_custkey", "o_custkey"
        )
        assert not plan_has_exchange(joined), _physical_plan(joined)
        # and an unbucketed version of the same join DOES shuffle
        plain = customer.join(
            orders, customer.c_custkey == orders.o_custkey
        )
        assert plan_has_exchange(plain)
        # results identical
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_customer")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    nation_of_customer = load_table(spark, SF_DIR_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = orders.join(nation_of_customer, "o_custkey")
    salted = salted_join(orders, nation_of_customer, "o_custkey", n_salts=4)
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    a = plain.select(*sorted(plain.columns))
    b = salted.select(*sorted(plain.columns))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_salted_join_spreads_hot_key(spark):
    # a pathologically hot key: every fact row shares one key
    fact = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(7, "x")], "k long, attr string")
    out = salted_join(fact, dim, "k", n_salts=8)
    assert out.count() == 1000
    # the salt really spreads: the salted fact occupies >1 sub-key
    from nosql_to_sql_migration_tool_spark.operators.skew import F as _F  # noqa

    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(8))
    )
    assert salted_fact.select("__salt").distinct().count() > 1


def test_salted_join_rejects_outer_joins(spark):
    """right/full outer would surface per-salt null-extended dim copies —
    the operator must refuse rather than silently corrupt."""
    df = spark.range(10).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(df, df, "k", n_salts=2, how=how)


def test_key_skew_profile_buckets_and_shares(spark):
    from nosql_to_sql_migration_tool_spark.operators.skew import (
        key_skew_profile,
    )

    # keys: a×1 b×2 c×3 d×8 → buckets: 1→{a}, 2→{b,c}, 8→{d}
    rows = [("a",)] + [("b",)] * 2 + [("c",)] * 3 + [("d",)] * 8
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["log2_bucket"]: r for r in key_skew_profile(df, "k").collect()
    }
    assert set(got) == {0, 1, 3}
    assert (got[0]["n_keys"], got[0]["n_rows"]) == (1, 1)
    assert (got[1]["n_keys"], got[1]["n_rows"]) == (2, 5)
    assert (got[3]["n_keys"], got[3]["max_rows_per_key"]) == (1, 8)
    assert got[3]["rows_share"] == round(8 / 14, 6)
