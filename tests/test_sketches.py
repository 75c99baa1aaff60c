"""Sketch contracts: estimates within tolerance of exact, and —the scale
property— partition-wise sketch union equals the whole-dataset sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    hll_merge_estimate,
    hll_sketch,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_approx_distinct_within_rsd(spark):
    events = load_table(spark, SF_DIR_SMOKE, "events")
    exact = events.select("user_id").distinct().count()
    est = approx_distinct(events, "user_id", rsd=0.02).collect()[0][
        "approx_distinct"
    ]
    assert abs(est - exact) <= max(3, 0.1 * exact)


def test_hll_partitioned_merge_matches_global(spark):
    events = load_table(spark, SF_DIR_SMOKE, "events")
    # sketches per event_type (the "per-partition pre-agg"), merged
    per_group = hll_sketch(events, "user_id", "event_type")
    merged = hll_merge_estimate(per_group).collect()[0]["approx_distinct"]
    # one global sketch over the same data
    global_est = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == global_est  # sketch union is lossless vs one pass

    exact = events.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(3, 0.1 * exact)


def test_approx_quantiles_close_to_exact(spark):
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    approx = {
        r["o_orderpriority"]: r
        for r in approx_quantiles(
            orders, "o_totalprice", "o_orderpriority", [0.5]
        ).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p50"))
        .collect()
    }
    for key, row in exact.items():
        rel_err = abs(approx[key]["p50"] - row["p50"]) / row["p50"]
        assert rel_err < 0.05, (key, approx[key]["p50"], row["p50"])
