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
