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


def test_asof_matches_bruteforce_argmax_on_random_data(spark):
    """Randomized (seeded) cross-check: the merge-form as-of join must
    equal the naive join + per-left argmax (greatest right ts <= left
    ts, payload tie-broken max) on small data."""
    import random

    rng = random.Random(99)
    left = spark.createDataFrame(
        [
            (rng.randint(1, 4), rng.randint(0, 1000))
            for _ in range(80)
        ],
        "k long, lts long",
    )
    right = spark.createDataFrame(
        [
            (rng.randint(1, 4), rng.randint(0, 1000), rng.randint(0, 50))
            for _ in range(60)
        ],
        "k long, rts long, payload long",
    )
    got = asof_join(left, right, "k", "lts", "rts", ["rts", "payload"])
    naive = (
        left.join(right, "k")
        .filter(F.col("rts") <= F.col("lts"))
        .groupBy("k", "lts")
        .agg(F.max(F.struct("rts", "payload")).alias("m"))
        .select("k", "lts", F.col("m.rts").alias("asof_rts"),
                F.col("m.payload").alias("asof_payload"))
    )
    # left rows with no match carry NULLs in `got`; drop them for the
    # comparison and check their count separately
    matched = got.filter(F.col("asof_rts").isNotNull()).select(
        "k", "lts", "asof_rts", "asof_payload"
    )
    assert sorted(map(tuple, matched.distinct().collect())) == sorted(
        map(tuple, naive.collect())
    )
    n_unmatched = got.filter(F.col("asof_rts").isNull()).count()
    have_match = (
        left.join(right, "k")
        .filter(F.col("rts") <= F.col("lts"))
        .select("k", "lts")
        .distinct()
        .count()
    )
    # distinct (k, lts) pairs partition into matched/unmatched
    total_pairs = left.select("k", "lts").distinct().count()
    matched_pairs = matched.select("k", "lts").distinct().count()
    assert matched_pairs == have_match
    assert got.count() == left.count()
