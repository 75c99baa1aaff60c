"""As-of join semantics: inclusive boundary tie, carry-forward, missing
key -> NULL payload, and the no-explosion merge shape (single shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),  # exactly at an event -> matches it
            (1, "2024-01-01 10:30:00"),  # between events -> earlier one
            (1, "2024-01-01 09:00:00"),  # before all events -> NULL
            (2, "2024-01-01 12:00:00"),  # key with no events -> NULL
        ],
        "k long, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 11:00:00", "b"),
        ],
        "k long, rts string, tag string",
    ).withColumn("rts", F.to_timestamp("rts"))

    out = {
        (r["k"], str(r["lts"])): r["asof_tag"]
        for r in asof_join(left, right, "k", "lts", "rts", ["tag"]).collect()
    }
    assert out[(1, "2024-01-01 10:00:00")] == "a"  # inclusive boundary
    assert out[(1, "2024-01-01 10:30:00")] == "a"
    assert out[(1, "2024-01-01 09:00:00")] is None
    assert out[(2, "2024-01-01 12:00:00")] is None


def test_asof_is_merge_shaped(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("lts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("rts"),
        F.col("id").alias("payload"),
    )
    joined = asof_join(left, right, "k", "lts", "rts", ["payload"])
    assert joined.count() == 100  # exactly one output row per left row
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # merge form: window over a union — no join operator at all
    assert "Join" not in plan


def test_asof_deterministic_on_right_ts_ties(spark):
    """Several right rows at the identical (key, ts): the carried payload
    is the struct-max — pinned, not partitioning-dependent."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], "k long, lts string"
    ).withColumn("lts", F.to_timestamp("lts"))
    dup_rows = [(1, "2024-01-01 10:00:00", f"tag{i:02d}") for i in range(8)]
    for n_parts in (1, 4, 7):
        right = (
            spark.createDataFrame(dup_rows, "k long, rts string, tag string")
            .withColumn("rts", F.to_timestamp("rts"))
            .repartition(n_parts)
        )
        out = asof_join(left, right, "k", "lts", "rts", ["rts", "tag"]).collect()
        assert len(out) == 1 and out[0]["asof_tag"] == "tag07"


def test_asof_rejects_reserved_column_names(spark):
    import pytest

    left = spark.createDataFrame([(1, 2, 3)], "k long, lts long, __ts long")
    right = spark.createDataFrame([(1, 2, 3)], "k long, rts long, v long")
    with pytest.raises(ValueError, match="reserve"):
        asof_join(left, right, "k", "lts", "rts", ["v"])


def test_asof_tolerance_nulls_stale_payloads(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00"), (1, "2024-01-01 10:30:00")],
        "k long, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a")], "k long, rts string, tag string"
    ).withColumn("rts", F.to_timestamp("rts"))
    out = {
        str(r["lts"]): (r["asof_tag"], r["asof_rts"])
        for r in asof_join(
            left, right, "k", "lts", "rts", ["rts", "tag"],
            tolerance_s=3600,
        ).collect()
    }
    assert out["2024-01-01 10:30:00"][0] == "a"      # 30 min old: fresh
    assert out["2024-01-01 12:00:00"] == (None, None)  # 2 h old: stale

    import pytest

    with pytest.raises(ValueError, match="right_cols"):
        asof_join(left, right, "k", "lts", "rts", ["tag"], tolerance_s=60)
