"""KMV bottom-k distinct sketch (round 14, r15 queue): exact-below-k
branch, cross-engine parity of sketch AND estimator, merge ≡ whole,
partition-layout invariance, error bound on real data, and the bounded
two-phase plan."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.sketches import (
    KMV_SPACE,
    kmv_bottomk,
    kmv_distinct,
    kmv_distinct_sql,
    kmv_error_audit,
    kmv_error_audit_sql,
    kmv_merge,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_exact_below_k_and_duplicates_ignored(spark):
    rows = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "a", "a", "b"]], ["v"]
    )
    got = kmv_distinct(rows, "v", k=16).collect()[0]
    assert (got["n_kept"], got["k"], got["estimate"]) == (3, 16, 3)


def test_estimator_switches_at_k_and_is_integer_math(spark):
    rows = spark.createDataFrame([(i,) for i in range(500)], ["v"])
    got = kmv_distinct(rows, "v", k=64).collect()[0]
    assert got["n_kept"] == 64
    kth = sorted(
        r["h"] for r in kmv_bottomk(rows, "v", k=64).collect()
    )[-1]
    assert got["estimate"] == (63 * KMV_SPACE) // kth
    # the estimator should be in the right ballpark even at tiny k
    assert 250 <= got["estimate"] <= 1000


def test_cross_engine_parity_orders_custkey(spark):
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    for k in (64, 4096):
        mine = [tuple(r) for r in kmv_distinct(orders, "o_custkey", k).collect()]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"'{SF_DIR_SMOKE}/orders.parquet'"
        )
        want = [
            tuple(r)
            for r in con.execute(
                kmv_distinct_sql("SELECT * FROM orders", "o_custkey", k)
            ).fetchall()
        ]
        con.close()
        assert mine == want
    audit_mine = [
        tuple(r) for r in kmv_error_audit(orders, "o_custkey", 64).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR_SMOKE}/orders.parquet'"
    )
    audit_want = [
        tuple(r)
        for r in con.execute(
            kmv_error_audit_sql("SELECT * FROM orders", "o_custkey", 64)
        ).fetchall()
    ]
    con.close()
    assert audit_mine == audit_want


def test_merge_equals_whole_and_partition_invariance(spark):
    rows = spark.createDataFrame([(i,) for i in range(1000)], ["v"])
    a = rows.filter(F.col("v") % 2 == 0)
    b = rows.filter(F.col("v") % 2 == 1)
    k = 128
    merged = sorted(
        r["h"]
        for r in kmv_merge(
            kmv_bottomk(a, "v", k), kmv_bottomk(b, "v", k), k
        ).collect()
    )
    whole = sorted(r["h"] for r in kmv_bottomk(rows, "v", k).collect())
    assert merged == whole and len(whole) == k
    # layout invariance: 1 partition vs 32 partitions, same sketch
    one = sorted(
        r["h"] for r in kmv_bottomk(rows.coalesce(1), "v", k).collect()
    )
    many = sorted(
        r["h"] for r in kmv_bottomk(rows.repartition(32), "v", k).collect()
    )
    assert one == many == whole


def test_error_bound_on_real_column(spark):
    """~1/sqrt(k-2) expected relative error: demand < 4x that (a loose
    deterministic pin — the hash set is fixed, so this never flakes)."""
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    got = kmv_error_audit(orders, "o_orderkey", 256).collect()[0]
    assert got["exact"] > 256  # the estimation branch is exercised
    assert got["rel_err"] < 4.0 / (254.0 ** 0.5)


def test_plan_is_bounded_two_phase(spark):
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        python_stage_count,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    df = kmv_distinct(orders, "o_custkey", 1024)
    assert cartesian_products(df) == 0
    assert python_stage_count(df) == 0
    assert global_windows(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    # ADVICE r14 regression: the cut must be a spillable hash DISTINCT
    # + TakeOrdered — never a collect_set whose single array buffer
    # (and exchange row) grows with the partition's distinct count.
    assert "collect_set" not in plan
    assert "ObjectHashAggregate" not in plan


def test_type_gate_rejects_unstable_renderings(spark):
    """ADVICE r14: double/decimal/timestamp string renderings differ
    across engines — the sketch must refuse them loudly."""
    import pytest

    ok = spark.createDataFrame([(1, "a", True)], "i long, s string, b boolean")
    for c in ("i", "s", "b"):
        assert kmv_distinct(ok, c, k=8).collect()[0]["estimate"] == 1
    bad = spark.sql(
        "SELECT CAST(1.5 AS DOUBLE) AS d, CAST(1.5 AS DECIMAL(10,2)) AS dec, "
        "CAST('2024-01-01 00:00:00' AS TIMESTAMP) AS ts"
    )
    for c in ("d", "dec", "ts"):
        with pytest.raises(TypeError, match="not bit-stable"):
            kmv_bottomk(bad, c, k=8)


def test_persisted_store_equals_one_shot(spark, tmp_path):
    """The mergeable contract in its persisted form: fold three batches
    into a store, and the read-back summary is BIT-EQUAL to the
    one-shot whole-stream sketch; replaying a batch changes nothing."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        read_kmv,
        update_kmv_sketch,
    )

    rows = spark.createDataFrame([(i,) for i in range(900)], ["v"])
    path = str(tmp_path / "kmv_store")
    k = 128
    for b in range(3):
        update_kmv_sketch(
            rows.filter(F.col("v") % 3 == b), path, batch_id=b,
            col="v", k=k,
        )
    got = tuple(read_kmv(spark, path, k).collect()[0])
    want = tuple(kmv_distinct(rows, "v", k).collect()[0])
    assert got == want
    update_kmv_sketch(  # replay batch 1 — idempotent
        rows.filter(F.col("v") % 3 == 1), path, batch_id=1, col="v", k=k
    )
    assert tuple(read_kmv(spark, path, k).collect()[0]) == want


def test_grouped_kmv_parity_and_branches(spark):
    """r15 (r16 queue): kmv_distinct_by — per-group sketches, exact
    below k per group, estimator branch at small k, cross-engine
    parity on orders grouped by priority."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_distinct_by,
        kmv_distinct_by_sql,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    for k in (32, 4096):
        mine = sorted(
            tuple(r)
            for r in kmv_distinct_by(
                orders, "o_orderpriority", "o_custkey", k
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"'{SF_DIR_SMOKE}/orders.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                kmv_distinct_by_sql(
                    "SELECT * FROM orders", "o_orderpriority",
                    "o_custkey", k,
                )
            ).fetchall()
        )
        con.close()
        assert mine == want and len(mine) > 1
    # big k: every group below k -> estimate IS the exact per-group count
    exact = {
        (r["o_orderpriority"], r["n"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").cast("long").alias("n"))
        .collect()
    }
    got = {
        (r["o_orderpriority"], r["estimate"])
        for r in kmv_distinct_by(
            orders, "o_orderpriority", "o_custkey", 4096
        ).collect()
    }
    assert got == exact


def test_grouped_kmv_plan_has_no_global_window(spark):
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_distinct_by,
    )
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        python_stage_count,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    df = kmv_distinct_by(orders, "o_orderpriority", "o_custkey", 1024)
    assert cartesian_products(df) == 0
    assert python_stage_count(df) == 0
    assert global_windows(df) == 0  # the window is PARTITIONED by group


def test_intersection_exact_below_k_and_estimator(spark):
    """r15 (r16 queue): kmv_intersection — while the union fits in k the
    estimates are EXACT; past k the Binomial estimator lands within the
    sketch's error envelope. Join-cardinality estimation from sketches
    alone (the two inputs are never joined)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_intersection,
    )

    a = spark.range(0, 1000).selectExpr("id AS v")
    b = spark.range(500, 1500).selectExpr("id AS v")
    # union 1500 < k=4096 -> exact branch
    got = kmv_intersection(a, b, "v", 4096).collect()[0]
    assert (got["union_estimate"], got["intersection_estimate"]) == (1500, 500)
    assert got["rho"] == 500 and got["n_union_kept"] == 1500
    # k=256 << union -> estimator branch, loose deterministic envelope
    est = kmv_intersection(a, b, "v", 256).collect()[0]
    assert est["n_union_kept"] == 256
    assert abs(est["union_estimate"] - 1500) / 1500 < 0.5
    assert abs(est["intersection_estimate"] - 500) / 500 < 0.6


def test_intersection_cross_engine_parity(spark):
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_intersection,
        kmv_intersection_sql,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    a = orders.filter(F.col("o_orderkey") % 3 != 0)
    b = orders.filter(F.col("o_orderkey") % 2 != 0)
    for k in (64, 8192):
        mine = [
            tuple(r)
            for r in kmv_intersection(a, b, "o_custkey", k).collect()
        ]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"'{SF_DIR_SMOKE}/orders.parquet'"
        )
        want = [
            tuple(r)
            for r in con.execute(
                kmv_intersection_sql(
                    "SELECT * FROM orders WHERE o_orderkey % 3 <> 0",
                    "SELECT * FROM orders WHERE o_orderkey % 2 <> 0",
                    "o_custkey",
                    k,
                )
            ).fetchall()
        ]
        con.close()
        assert mine == want


def test_intersection_audit_parity_and_envelope(spark):
    """r15 (r16 queue): the set-operation estimators ship with their
    measured error — cross-engine parity of the whole audit row, and
    the k=256 envelope on real columns."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_intersection_error_audit,
        kmv_intersection_error_audit_sql,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    a = orders.filter(F.col("o_orderkey") % 3 != 0)
    b = orders.filter(F.col("o_orderkey") % 2 != 0)
    mine = [
        tuple(r)
        for r in kmv_intersection_error_audit(
            a, b, "o_custkey", 256
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR_SMOKE}/orders.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            kmv_intersection_error_audit_sql(
                "SELECT * FROM orders WHERE o_orderkey % 3 <> 0",
                "SELECT * FROM orders WHERE o_orderkey % 2 <> 0",
                "o_custkey",
                256,
            )
        ).fetchall()
    ]
    con.close()
    assert mine == want
    row = mine[0]
    # loose deterministic envelopes (fixed hash set — never flakes)
    assert row[4] < 4.0 / (254.0 ** 0.5)   # union rel err
    assert row[5] < 0.6                     # intersection rel err


def test_difference_exact_below_k_and_estimator(spark):
    """r15 late build: kmv_difference (the theta-sketch a-not-b shape)
    — exact while the union fits in k; past k the single-draw rho
    estimator lands in a loose deterministic envelope and can never go
    negative (unlike subtracting two independent estimates)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_difference,
    )

    a = spark.range(0, 1000).selectExpr("id AS v")
    b = spark.range(500, 1500).selectExpr("id AS v")
    got = kmv_difference(a, b, "v", 4096).collect()[0]
    assert (got["union_estimate"], got["difference_estimate"]) == (1500, 500)
    assert got["rho_a_not_b"] == 500 and got["n_union_kept"] == 1500
    # asymmetry: b \ a is a different set (here equal size by fixture)
    rev = kmv_difference(b, a, "v", 4096).collect()[0]
    assert rev["difference_estimate"] == 500
    # subset edge: a \ a is empty, exactly
    same = kmv_difference(a, a, "v", 4096).collect()[0]
    assert same["difference_estimate"] == 0
    est = kmv_difference(a, b, "v", 256).collect()[0]
    assert est["n_union_kept"] == 256
    assert 0 <= est["difference_estimate"]
    assert abs(est["difference_estimate"] - 500) / 500 < 0.6


def test_difference_cross_engine_parity(spark):
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_difference,
        kmv_difference_sql,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    a = orders.filter(F.col("o_orderkey") % 3 != 0)
    b = orders.filter(F.col("o_orderkey") % 2 != 0)
    for k in (64, 8192):
        mine = [
            tuple(r)
            for r in kmv_difference(a, b, "o_custkey", k).collect()
        ]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM "
            f"'{SF_DIR_SMOKE}/orders.parquet'"
        )
        want = [
            tuple(r)
            for r in con.execute(
                kmv_difference_sql(
                    "SELECT * FROM orders WHERE o_orderkey % 3 <> 0",
                    "SELECT * FROM orders WHERE o_orderkey % 2 <> 0",
                    "o_custkey",
                    k,
                )
            ).fetchall()
        ]
        con.close()
        assert mine == want
