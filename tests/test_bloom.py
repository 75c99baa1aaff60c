"""Deterministic Bloom filter: cross-engine word parity, the
no-false-negative guarantee, semi-join-pruning equivalence, the fp
audit's confusion math, and the plan-shape invariants (round 12)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.bloom import (
    bloom_build,
    bloom_build_sql,
    bloom_fp_audit,
    bloom_fp_audit_sql,
    bloom_probe,
    bloom_prune,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE

_M, _K = 256, 4  # small bitmap -> dense words, measurable fp rate


def test_bloom_build_cross_engine_parity(spark):
    keys = spark.range(0, 40).select(F.col("id").alias("key"))
    got = bloom_build(keys, "key", _M, _K).collect()[0]
    con = duckdb.connect()
    want = con.execute(
        bloom_build_sql("SELECT unnest(range(40)) AS key", "key", _M, _K)
    ).fetchone()
    con.close()
    assert list(got["bits"]) == list(want[0])
    assert got["n_keys"] == want[1] == 40
    assert got["m_bits"] == _M and got["k_hashes"] == _K
    # duplicate + NULL keys change nothing: membership is a SET property
    noisy = keys.unionByName(keys).unionByName(
        spark.createDataFrame([(None,)], "key long")
    )
    again = bloom_build(noisy, "key", _M, _K).collect()[0]
    assert list(again["bits"]) == list(got["bits"])
    assert again["n_keys"] == 40


def test_bloom_no_false_negatives_and_prune_equivalence(spark):
    """The Bloom guarantee: every true member is flagged, so pruning
    before an exact semi-join returns EXACTLY the semi-join's rows."""
    build = spark.range(0, 60).select((F.col("id") * 3).alias("key"))
    probe = spark.range(0, 500).select(F.col("id").alias("key"))
    row = bloom_build(build, "key", _M, _K).localCheckpoint(eager=True)
    flagged = bloom_probe(probe, row, "key", _M, _K)
    assert (
        flagged.where(
            (F.col("key") % 3 == 0)
            & (F.col("key") < 180)
            & ~F.col("might_contain")
        ).count()
        == 0
    )
    pruned_semi = sorted(
        r["key"]
        for r in bloom_prune(probe, row, "key", _M, _K)
        .join(build.distinct(), "key", "semi")
        .collect()
    )
    exact_semi = sorted(
        r["key"] for r in probe.join(build.distinct(), "key", "semi").collect()
    )
    assert pruned_semi == exact_semi
    # and pruning really dropped most non-members (sanity, not a bound)
    assert bloom_prune(probe, row, "key", _M, _K).count() < 500


def test_bloom_fp_audit_confusion_math_and_parity(spark):
    build = spark.range(0, 40).select(F.col("id").alias("key"))
    probe = spark.range(0, 200).select(F.col("id").alias("key"))
    got = bloom_fp_audit(probe, build, "key", "key", _M, _K).collect()[0]
    assert got["n_probe"] == 200 and got["n_members"] == 40
    assert got["n_false_neg"] == 0
    assert got["n_flagged"] == got["n_members"] + got["n_false_pos"]
    assert got["fp_rate"] == round(got["n_false_pos"] / 160, 6)
    con = duckdb.connect()
    want = con.execute(
        bloom_fp_audit_sql(
            "SELECT unnest(range(200)) AS key",
            "SELECT unnest(range(40)) AS key",
            "key",
            "key",
            _M,
            _K,
        )
    ).fetchone()
    con.close()
    assert tuple(got) == want
    # persisted-artifact path == inline derivation
    row = bloom_build(build, "key", _M, _K).localCheckpoint(eager=True)
    via = bloom_fp_audit(
        probe, build, "key", "key", _M, _K, bloom_row=row
    ).collect()[0]
    assert tuple(via) == tuple(got)
    # all-member probe -> fp_rate NULL, never a division by zero
    allmem = bloom_fp_audit(build, build, "key", "key", _M, _K).collect()[0]
    assert allmem["fp_rate"] is None and allmem["n_false_pos"] == 0


def test_bloom_empty_build_side(spark):
    empty = spark.range(0).select(F.col("id").alias("key"))
    row = bloom_build(empty, "key", _M, _K).collect()[0]
    assert sum(row["bits"]) == 0 and row["n_keys"] == 0
    assert len(row["bits"]) == _M // 32


def test_bloom_plan_invariants(spark):
    """Scale shape: the probe is a pure map-side projection (its only
    join is the broadcast one-row bitmap), no Python stages, no global
    ordered windows anywhere, and the build's shuffle is position/word
    rows, never the raw keys (checked structurally: build has no
    column of the key type after the position projection)."""
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        global_windows,
        python_stage_count,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    build = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("key")
    )
    probe = load_table(spark, SF_DIR_SMOKE, "customer").select(
        F.col("c_custkey").alias("key")
    )
    row = bloom_build(build, "key")
    flagged = bloom_probe(probe, row, "key")
    audit = bloom_fp_audit(probe, build, "key", "key")
    for df in (row, flagged, audit):
        assert python_stage_count(df) == 0
        assert global_windows(df) == 0
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_probe_survives_bits_column_collision(spark):
    """A probe relation that itself has a 'bits' column must not
    collide with the broadcast bitmap (it rides in under a reserved
    name)."""
    build = spark.range(0, 20).select(F.col("id").alias("key"))
    row = bloom_build(build, "key", _M, _K)
    probe = spark.range(0, 50).select(
        F.col("id").alias("key"), F.lit(7).alias("bits")
    )
    out = bloom_probe(probe, row, "key", _M, _K).collect()
    assert {r["bits"] for r in out} == {7}
    assert all(r["might_contain"] for r in out if r["key"] < 20)
