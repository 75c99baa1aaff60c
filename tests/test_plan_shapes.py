"""Physical-plan pins: predicate pushdown and column pruning must reach
the parquet scan — at 100 TB a scan that reads every column for a
2-column projection, or filters after the scan, is the difference
between seconds and hours. These tests fail if a refactor breaks the
declarative shape Catalyst needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_filter_pushes_down_to_scan(spark):
    df = load_table(spark, SF_DIR_SMOKE, "customer").filter(
        F.col("c_custkey") == 100
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "EqualTo(c_custkey,100)" in plan, plan


def test_projection_prunes_scan_schema(spark):
    df = load_table(spark, SF_DIR_SMOKE, "orders").select("o_orderkey")
    plan = _plan(df)
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan, plan


def test_aggregate_is_partial_then_final(spark):
    # map-side combine: a partial_count must appear below the exchange
    df = (
        load_table(spark, SF_DIR_SMOKE, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(df)
    assert "partial_count" in plan, plan
