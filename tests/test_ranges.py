"""Interval-join semantics: inclusive boundaries, key scoping, exactly-
once pair output when an interval spans many buckets, and the
no-cartesian plan shape (the whole point of bucketization)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.ranges import interval_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "k long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )


def _intervals(spark, rows):
    return (
        spark.createDataFrame(rows, "k long, iv string, s string, e string")
        .withColumn("s", F.to_timestamp("s"))
        .withColumn("e", F.to_timestamp("e"))
    )


def test_interval_join_semantics(spark):
    pts = _points(
        spark,
        [
            (1, "2024-01-01 10:00:00"),  # == start: inclusive
            (1, "2024-01-01 12:00:00"),  # == end: inclusive
            (1, "2024-01-01 11:00:00"),  # inside
            (1, "2024-01-01 12:00:01"),  # just past end
            (2, "2024-01-01 11:00:00"),  # right time, wrong key
        ],
    )
    ivs = _intervals(
        spark, [(1, "A", "2024-01-01 10:00:00", "2024-01-01 12:00:00")]
    )
    out = interval_join(pts, ivs, "ts", "s", "e", keys=["k"]).collect()
    assert sorted(str(r["ts"]) for r in out) == [
        "2024-01-01 10:00:00",
        "2024-01-01 11:00:00",
        "2024-01-01 12:00:00",
    ]


def test_interval_spanning_many_buckets_matches_once(spark):
    # 10-hour interval, 1-hour buckets: the pair must appear exactly once
    pts = _points(spark, [(1, "2024-01-01 15:30:00")])
    ivs = _intervals(
        spark, [(1, "LONG", "2024-01-01 08:00:00", "2024-01-01 18:00:00")]
    )
    out = interval_join(
        pts, ivs, "ts", "s", "e", keys=["k"], bucket_width_s=3600
    ).collect()
    assert len(out) == 1 and out[0]["iv"] == "LONG"


def test_interval_join_is_equi_join_not_cartesian(spark):
    pts = _points(spark, [(1, "2024-01-01 10:00:00")])
    ivs = _intervals(
        spark, [(1, "A", "2024-01-01 09:00:00", "2024-01-01 11:00:00")]
    )
    plan = (
        interval_join(pts, ivs, "ts", "s", "e", keys=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_rejects_reserved_name(spark):
    pts = _points(spark, [(1, "2024-01-01 10:00:00")]).withColumn(
        "__bkt", F.lit(1)
    )
    ivs = _intervals(
        spark, [(1, "A", "2024-01-01 09:00:00", "2024-01-01 11:00:00")]
    )
    with pytest.raises(ValueError, match="__bkt"):
        interval_join(pts, ivs, "ts", "s", "e", keys=["k"])
