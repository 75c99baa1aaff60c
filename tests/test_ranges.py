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


def test_interval_join_matches_bruteforce_on_random_data(spark):
    """Randomized (seeded) cross-check: bucketized interval join must
    equal the naive cross-join + range-filter on small data, across
    bucket widths that do and don't divide the interval lengths."""
    import random

    rng = random.Random(20240813)
    pts_rows = [
        (rng.randint(1, 3), f"2024-01-01 {rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:00")
        for _ in range(60)
    ]
    iv_rows = []
    for i in range(25):
        start_h = rng.randint(0, 20)
        dur_m = rng.randint(1, 300)
        iv_rows.append(
            (rng.randint(1, 3), f"iv{i}",
             f"2024-01-01 {start_h:02d}:00:00", dur_m)
        )
    pts = _points(spark, pts_rows)
    ivs = (
        spark.createDataFrame(
            iv_rows, "k long, iv string, s string, dur int"
        )
        .withColumn("s", F.to_timestamp("s"))
        .withColumn(
            "e", F.col("s") + F.expr("make_interval(0,0,0,0,0,dur,0)")
        )
        .drop("dur")
    )
    naive = (
        pts.crossJoin(
            ivs.select(
                F.col("k").alias("ik"), "iv", "s", "e"
            )
        )
        .filter(
            (F.col("k") == F.col("ik"))
            & (F.col("ts") >= F.col("s"))
            & (F.col("ts") <= F.col("e"))
        )
        .select("k", "ts", "iv")
    )
    for width in (3600, 1800, 777):
        got = interval_join(
            pts, ivs, "ts", "s", "e", keys=["k"], bucket_width_s=width
        ).select("k", "ts", "iv")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive.collect())
        ), f"width={width}"


def test_interval_join_without_keys(spark):
    """Keyless form: every point joins every covering interval."""
    pts = _points(spark, [(1, "2024-01-01 10:30:00"), (2, "2024-01-01 10:30:00")])
    ivs = _intervals(
        spark,
        [
            (9, "A", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            (9, "B", "2024-01-01 10:15:00", "2024-01-01 10:45:00"),
            (9, "C", "2024-01-01 11:00:01", "2024-01-01 12:00:00"),
        ],
    ).drop("k")
    out = interval_join(pts.drop("k"), ivs, "ts", "s", "e")
    assert sorted(r["iv"] for r in out.collect()) == ["A", "A", "B", "B"]
