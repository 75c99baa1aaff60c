"""Declarative constraint audit + numeric profiler
(operators/quality.py): failing constraints report false, thresholds
gate fractions, NULL semantics, and single-pass profile goldens."""

from __future__ import annotations

import pytest

from nosql_to_sql_migration_tool_spark.operators.quality import (
    bounds,
    constraint_report,
    in_set,
    not_null,
    numeric_profile,
    unique,
)


def _facts(spark):
    # 5 rows: one NULL key, one dup key, one negative price, one
    # out-of-domain status, one orphan customer ref.
    rows = [
        (1, 10, "O", 5.0),
        (2, 10, "F", -1.0),
        (2, 11, "X", 2.0),
        (None, 12, "O", 3.0),
        (5, 99, "P", 4.0),
    ]
    return spark.createDataFrame(
        rows, "k long, cust long, status string, price double"
    )


def _dim(spark):
    return spark.createDataFrame(
        [(10,), (11,), (12,)], "c long"
    )


def test_constraint_report_metrics_and_verdicts(spark):
    df = _facts(spark)
    out = {
        r["check_name"]: r
        for r in constraint_report(
            df,
            [
                not_null("k"),
                unique("k"),
                bounds("price", lo=0.0),
                in_set("status", ["O", "F", "P"]),
            ],
            fks=[("cust", _dim(spark), "c")],
        ).collect()
    }
    assert out["not_null(k)"]["metric"] == 0.8
    assert not out["not_null(k)"]["passed"]
    # distinct non-null keys {1,2,5} over 5 rows
    assert out["unique(k)"]["metric"] == 0.6
    assert out["bounds(price,0.0<=x)"]["metric"] == 0.8
    assert out["in_set(status,{O,F,P})"]["metric"] == 0.8
    # cust 99 is an orphan -> 4/5
    assert out["fk(cust->c)"]["metric"] == 0.8
    assert not out["fk(cust->c)"]["passed"]


def test_threshold_gates_pass(spark):
    df = _facts(spark)
    out = constraint_report(
        df, [bounds("price", lo=0.0, threshold=0.75)]
    ).collect()[0]
    assert out["metric"] == 0.8 and out["passed"]


def test_all_green_on_clean_data(spark):
    df = spark.createDataFrame(
        [(1, "O"), (2, "F")], "k long, status string"
    )
    rows = constraint_report(
        df,
        [not_null("k"), unique("k"), in_set("status", ["O", "F"])],
    ).collect()
    assert all(r["passed"] for r in rows)
    assert all(r["metric"] == 1.0 for r in rows)


def test_unknown_kind_raises(spark):
    with pytest.raises(ValueError):
        constraint_report(_facts(spark), [("no_such", "k", None, 1.0)])


def test_numeric_profile_golden(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0)], "a double, b double"
    )
    out = {
        r["col_name"]: r for r in numeric_profile(df, ["a", "b"]).collect()
    }
    a = out["a"]
    assert (a["n_rows"], a["n_non_null"], a["n_distinct"]) == (3, 3, 2)
    assert (a["min_value"], a["max_value"], a["mean_value"]) == (
        1.0,
        2.0,
        round(5 / 3, 6),
    )
    b = out["b"]
    assert (b["n_rows"], b["n_non_null"], b["n_distinct"]) == (3, 2, 2)
    assert b["mean_value"] == 20.0


def test_empty_constraint_set_raises(spark):
    with pytest.raises(ValueError, match="no constraints declared"):
        constraint_report(_facts(spark), [])


def test_numeric_drift_identity_and_disjoint(spark):
    """drift(A, A) is exactly zero; fully disjoint supports give the
    maxima (L1 = 2, KS = 1); and a hand-built shift reproduces the
    hand-computed distances."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.operators.quality import (
        numeric_drift,
    )

    a = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    same = numeric_drift(a, a, "x").first()
    assert same["l1_distance"] == 0.0 and same["ks_stat"] == 0.0
    assert same["n_a"] == same["n_b"] == 100

    lo = spark.range(50).select((F.col("id") % 5).cast("double").alias("x"))
    hi = spark.range(80).select(
        (F.col("id") % 5 + 1000).cast("double").alias("x")
    )
    far = numeric_drift(lo, hi, "x").first()
    assert far["l1_distance"] == 2.0 and far["ks_stat"] == 1.0

    # hand check: A = {0 x2, 1 x2}, B = {0 x1, 1 x3} over 2 bins
    # p = (.5, .5), q = (.25, .75): L1 = .5, KS = .25
    xa = spark.createDataFrame([(0.0,), (0.0,), (1.0,), (1.0,)], "x double")
    xb = spark.createDataFrame(
        [(0.0,), (1.0,), (1.0,), (1.0,)], "x double"
    )
    got = numeric_drift(xa, xb, "x", n_bins=2).first()
    assert got["l1_distance"] == 0.5 and got["ks_stat"] == 0.25


def test_categorical_drift_identity_and_hand_case(spark):
    from nosql_to_sql_migration_tool_spark.operators.quality import (
        categorical_drift,
    )

    a = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("y",)], "cat string"
    )
    same = categorical_drift(a, a, "cat").first()
    assert same["l1_distance"] == 0.0 and same["max_rate_gap"] == 0.0
    assert same["n_categories"] == 2

    # A: x .5 / y .5; B: x .25 / y .25 / z .5
    b = spark.createDataFrame(
        [("x",), ("y",), ("z",), ("z",)], "cat string"
    )
    got = categorical_drift(a, b, "cat").first()
    assert got["n_categories"] == 3
    # |.5-.25| + |.5-.25| + |0-.5| = 1.0 ; max gap = .5
    assert got["l1_distance"] == 1.0 and got["max_rate_gap"] == 0.5


def test_numeric_baseline_store_equals_recompute_and_clamps(spark, tmp_path):
    """Incremental drift baseline (VERDICT r8 next #6): auditing live
    data against the STORED reference bins must equal the same audit
    with the reference recomputed in memory, and live values outside
    the frozen bounds must clamp into the edge bins (out-of-range mass
    is drift, not an error)."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.operators.quality import (
        numeric_drift_vs_baseline,
        save_numeric_baseline,
    )

    # reference: 0..999 uniform; live: same distribution + escapees
    ref = spark.range(1000).select((F.col("id") * 1.0).alias("x"))
    live = spark.range(500).select((F.col("id") * 2.0).alias("x"))
    p1 = str(tmp_path / "base1")
    save_numeric_baseline(ref, "x", p1)
    row = numeric_drift_vs_baseline(live, "x", p1).collect()[0]
    assert row["n_a"] == 1000 and row["n_b"] == 500
    # same uniform coverage of the bins -> small drift (±1-per-bin
    # boundary wobble from the even-only live values is ~0.02 L1)
    assert row["l1_distance"] <= 0.05 and row["ks_stat"] <= 0.05

    # stored ≡ recompute: saving the SAME reference twice (fresh path)
    # and re-auditing gives bit-identical results
    p2 = str(tmp_path / "base2")
    save_numeric_baseline(ref, "x", p2)
    again = numeric_drift_vs_baseline(live, "x", p2).collect()[0]
    assert again.asDict() == row.asDict()

    # clamping: live mass entirely below/above the reference range lands
    # in bins 0 and 63 — hand-computable drift. Reference: one point per
    # bin edge 0..63 via 64 values 0..63 scaled -> uniform 64 bins.
    ref2 = spark.range(64).select((F.col("id") * 1.0).alias("x"))
    out = spark.createDataFrame(
        [(-100.0,), (-50.0,), (500.0,), (600.0,)], "x double"
    )
    p3 = str(tmp_path / "base3")
    save_numeric_baseline(ref2, "x", p3)
    r = numeric_drift_vs_baseline(out, "x", p3).collect()[0]
    # exact integers: na=64, nb=4; bin0: ca=1,cb=2 -> |1*4-2*64|=124;
    # bin63: ca=1 (x=63 maps to bin 63), cb=2 -> 124; other 62 bins:
    # ca=1,cb=0 -> 4 each. L1 = (124+124+62*4)/256 = 496/256
    assert abs(r["l1_distance"] - 496 / 256) < 1e-6
    assert r["n_b"] == 4


def test_categorical_baseline_matches_two_snapshot_audit(spark, tmp_path):
    """The stored-baseline categorical audit must equal the two-snapshot
    audit bit-for-bit when fed the same reference data (categories are
    discrete — unlike the numeric twin there is no binning difference),
    including categories that exist on only one side."""
    from nosql_to_sql_migration_tool_spark.operators.quality import (
        categorical_drift,
        categorical_drift_vs_baseline,
        save_categorical_baseline,
    )

    a = spark.createDataFrame(
        [("x",)] * 6 + [("y",)] * 3 + [("gone",)] * 1, "cat string"
    )
    b = spark.createDataFrame(
        [("x",)] * 2 + [("y",)] * 5 + [("new",)] * 3, "cat string"
    )
    p = str(tmp_path / "catbase")
    save_categorical_baseline(a, "cat", p)
    want = categorical_drift(a, b, "cat").collect()[0].asDict()
    got = categorical_drift_vs_baseline(b, "cat", p).collect()[0].asDict()
    assert got == want
    assert got["n_categories"] == 4  # union: x, y, gone, new
