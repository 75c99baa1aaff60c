"""Fellegi-Sunter record linkage (round 12): weight math, NULL/canon
semantics, true-pair recovery on the dirty-customer fixture,
cross-engine parity, and the blocked (never cross-product) plan."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import (
    DIRTY_CUSTOMER_TARGET_SQL,
    dirty_customer_target,
)
from nosql_to_sql_migration_tool_spark.operators.linkage import (
    field_weights_micro,
    linkage_matches,
    linkage_scores,
    linkage_scores_sql,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE

_PARAMS = {
    "c_name": (0.95, 0.001),     # highly discriminating
    "c_acctbal": (0.9, 0.01),
    "c_mktsegment": (0.95, 0.2),  # 5 segments -> weak evidence
}


def test_field_weights_micro_math_and_guards():
    w = field_weights_micro({"f": (0.9, 0.01)})["f"]
    assert w[0] == round(round(math.log(0.9 / 0.01), 6) * 1e6)
    assert w[1] == round(round(math.log(0.1 / 0.99), 6) * 1e6)
    assert w[0] > 0 > w[1]
    with pytest.raises(ValueError):
        field_weights_micro({"f": (1.0, 0.01)})
    with pytest.raises(ValueError):
        field_weights_micro({"f": (0.9, 0.0)})


def test_linkage_recovers_true_pairs_on_dirty_fixture(spark):
    """Customer linked to its dirtied copy (name suffixes, acctbal
    drift, dropped rows) blocked on nation: thresholded matches are
    EXACTLY the true (custkey == custkey) pairs — perturbed-but-same
    entities clear the bar on the remaining fields, different customers
    in the same nation never do."""
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    dirty = dirty_customer_target(customer)
    # the worst TRUE pair is the name-perturbed one (acctbal + segment
    # agree, name disagrees): ~ +3.06M micros; the best plausible
    # cross-entity pair disagrees on name AND acctbal: ~ -3.73M
    threshold = 2_000_000
    matches = linkage_matches(
        customer, dirty, "c_nationkey", _PARAMS, "c_custkey", threshold
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in matches}
    surviving = {
        r["c_custkey"] for r in dirty.select("c_custkey").collect()
    }
    want = {(k, k) for k in surviving}
    # every surviving true pair found...
    missing = want - got
    assert not missing, sorted(missing)[:5]
    # ...and no cross-entity pair sneaks in
    assert got == want
    # dropped rows (custkey % 31 == 0) can never appear
    assert all(a % 31 != 0 for a, _ in got)


def test_linkage_null_and_canon_semantics(spark):
    """NULL on either side contributes zero (neither agree nor
    disagree); string comparison is trim+lower."""
    a = spark.createDataFrame(
        [(1, 0, "  Alice ", 10.0), (2, 0, "Bob", None)],
        ["id", "blk", "name", "bal"],
    )
    b = spark.createDataFrame(
        [(11, 0, "alice", 10.0), (12, 0, "bob", 99.0)],
        ["id", "blk", "name", "bal"],
    )
    params = {"name": (0.9, 0.01), "bal": (0.9, 0.01)}
    w = field_weights_micro(params)
    rows = {
        (r["id_a"], r["id_b"]): (r["n_agree"], r["score_micro"])
        for r in linkage_scores(a, b, "blk", params, "id").collect()
    }
    # (1, 11): name agrees after canon, bal agrees
    assert rows[(1, 11)] == (2, w["name"][0] + w["bal"][0])
    # (2, 12): name agrees, bal NULL on a-side -> 0 contribution
    assert rows[(2, 12)] == (1, w["name"][0])
    # (1, 12): both known, both disagree
    assert rows[(1, 12)] == (0, w["name"][1] + w["bal"][1])


def test_linkage_cross_engine_parity(spark):
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    dirty = dirty_customer_target(customer)
    mine = sorted(
        map(
            tuple,
            linkage_scores(
                customer, dirty, "c_nationkey", _PARAMS, "c_custkey"
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/customer.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            linkage_scores_sql(
                "SELECT * FROM customer",
                DIRTY_CUSTOMER_TARGET_SQL,
                "c_nationkey",
                _PARAMS,
                "c_custkey",
            )
        ).fetchall()
    )
    con.close()
    assert mine == want and len(mine) > 0


def test_linkage_plan_is_blocked_equi_join(spark):
    """The candidate join is an equi-join on the blocking key — no
    cartesian product, no Python stage, no global window; weights are
    plan literals (no extra join for the model)."""
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        python_stage_count,
    )

    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    dirty = dirty_customer_target(customer)
    df = linkage_scores(customer, dirty, "c_nationkey", _PARAMS, "c_custkey")
    assert cartesian_products(df) == 0
    assert python_stage_count(df) == 0
    assert global_windows(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "c_nationkey" in plan


def test_multi_pass_blocking_recovers_dirty_block_keys(spark):
    """When the blocking field itself is dirty (some rows' nationkey
    perturbed), single-pass nation blocking loses those true pairs; a
    second pass on the name's first token recovers them — multi-pass
    candidates = union, scores dedupe exactly, and blocking_recall
    quantifies each configuration."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        blocking_recall,
        multi_pass_linkage_scores,
    )

    customer = load_table(spark, SF_DIR_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    # dirty copy: every 13th row lands in the WRONG nation block
    dirty = customer.withColumn(
        "c_nationkey",
        F.when(
            F.col("c_custkey") % 13 == 0, (F.col("c_nationkey") + 1) % 25
        ).otherwise(F.col("c_nationkey")),
    )
    blocks = ["c_nationkey", "__name_tok"]
    a = customer.withColumn(
        "__name_tok", F.split(F.col("c_name"), "#")[0]
    )
    b = dirty.withColumn("__name_tok", F.split(F.col("c_name"), "#")[0])
    truth = customer.select(
        F.col("c_custkey").alias("id_a"), F.col("c_custkey").alias("id_b")
    )
    single = blocking_recall(a, b, ["c_nationkey"], truth, "c_custkey")
    multi = blocking_recall(a, b, blocks, truth, "c_custkey")
    s, m = single.collect()[0], multi.collect()[0]
    assert s["recall"] < 1.0  # the dirty block key loses pairs
    assert m["recall"] == 1.0  # the name pass recovers every one
    assert m["n_truth"] == customer.count()

    # multi-pass scores: every true pair present exactly once, and a
    # pair found by both passes has ONE row (distinct is exact)
    scored = multi_pass_linkage_scores(
        a, b, blocks, _PARAMS, "c_custkey"
    )
    true_rows = scored.filter(F.col("id_a") == F.col("id_b"))
    assert true_rows.count() == customer.count()
    assert (
        scored.groupBy("id_a", "id_b")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )


def test_compound_block_key_parity_and_plan(spark):
    """r14: the registered configuration — compound blocking key
    (c_nationkey, c_custkey % 997), the scale-safe shape SCALE.md r12
    measured 30x faster at 10x. Cross-engine parity, candidate-set
    semantics (a pair must agree on BOTH key parts), and the blocked
    equi-join plan (no cartesian, no python, no global window)."""
    compound = ("c_nationkey", "c_custkey % 997")
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    dirty = dirty_customer_target(customer)
    got = linkage_scores(
        customer, dirty, compound, _PARAMS, "c_custkey"
    )
    mine = sorted(map(tuple, got.collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/customer.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            linkage_scores_sql(
                "SELECT * FROM customer",
                DIRTY_CUSTOMER_TARGET_SQL,
                compound,
                _PARAMS,
                "c_custkey",
            )
        ).fetchall()
    )
    con.close()
    assert mine == want and len(mine) > 0
    # the compound candidates are exactly the nation-blocked candidates
    # that ALSO agree on custkey % 997 — a strict subset, every true
    # (same-custkey) pair retained
    coarse = {
        (r["id_a"], r["id_b"])
        for r in linkage_scores(
            customer, dirty, "c_nationkey", _PARAMS, "c_custkey"
        ).collect()
    }
    fine = {(a, b) for a, b, _, _ in mine}
    assert fine <= coarse
    surviving = {
        r["c_custkey"] for r in dirty.select("c_custkey").collect()
    }
    assert {(k, k) for k in surviving} <= fine

    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        python_stage_count,
    )

    assert cartesian_products(got) == 0
    assert python_stage_count(got) == 0
    assert global_windows(got) == 0


def test_update_linkage_matches_incremental_equals_full(spark, tmp_path):
    """r14 (r15 queue): the batch-maintained match store — linking batch
    by batch accumulates EXACTLY the matches of one full-relation run
    (the score is a pure function of the pair), and replaying a batch
    is idempotent (dynamic overwrite replaces that batch_id's rows)."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        linkage_matches,
        read_linkage_matches,
        update_linkage_matches,
    )

    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    dirty = dirty_customer_target(customer)
    path = str(tmp_path / "matches")
    threshold = 2_000_000
    b0 = dirty.filter(F.col("c_custkey") % 2 == 0)
    b1 = dirty.filter(F.col("c_custkey") % 2 == 1)
    compound = ("c_nationkey", "c_custkey % 997")
    for i, b in enumerate((b0, b1)):
        update_linkage_matches(
            customer, b, path, compound, _PARAMS, "c_custkey",
            threshold, i,
        )
    got = sorted(
        (r["id_a"], r["id_b"], r["n_agree"], r["score_micro"])
        for r in read_linkage_matches(spark, path).collect()
    )
    want = sorted(
        map(
            tuple,
            linkage_matches(
                customer, dirty, compound, _PARAMS, "c_custkey", threshold
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    # replaying batch 0 changes nothing (idempotent partition overwrite)
    update_linkage_matches(
        customer, b0, path, compound, _PARAMS, "c_custkey", threshold, 0
    )
    again = sorted(
        (r["id_a"], r["id_b"], r["n_agree"], r["score_micro"])
        for r in read_linkage_matches(spark, path).collect()
    )
    assert again == got
    # per-batch rows carry their batch_id (the replay/takedown handle)
    ids = {
        r["batch_id"]
        for r in read_linkage_matches(spark, path).collect()
    }
    assert ids == {0, 1}


def test_multi_pass_sql_twin_parity(spark):
    """r14 (r15 queue): multi_pass_linkage_scores' DuckDB twin — the
    UNION-of-passes dedupe replays exactly, including a compound pass."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        multi_pass_linkage_scores,
        multi_pass_linkage_scores_sql,
    )

    blocks = ["c_mktsegment", ("c_nationkey", "c_custkey % 997")]
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    dirty = dirty_customer_target(customer)
    mine = sorted(
        map(
            tuple,
            multi_pass_linkage_scores(
                customer, dirty, blocks, _PARAMS, "c_custkey"
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/customer.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            multi_pass_linkage_scores_sql(
                "SELECT * FROM customer",
                DIRTY_CUSTOMER_TARGET_SQL,
                blocks,
                _PARAMS,
                "c_custkey",
            )
        ).fetchall()
    )
    con.close()
    assert mine == want and len(mine) > 0
