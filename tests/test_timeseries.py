"""Time-series operators (operators/timeseries.py): gap filling, LOCF
carry-forward, cohort retention — hand-checkable fixtures; corpus-level
cross-engine values are covered by the oracle-parity suite."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_hourly_gapfill_fills_and_carries_forward(spark):
    from nosql_to_sql_migration_tool_spark.operators.timeseries import (
        hourly_gapfill,
    )

    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 7, 10.0),
        (2, datetime(2024, 1, 1, 0, 40), 7, 2.5),
        # hour 1 and 2 silent
        (3, datetime(2024, 1, 1, 3, 5), 7, 4.0),
        (4, datetime(2024, 1, 1, 5, 0), 9, 1.0),  # other key: 1-hour span
    ]
    got = {
        (r["user_id"], r["hour"].hour): r
        for r in hourly_gapfill(_events(spark, rows)).collect()
    }
    # key 7 spans hours 0..3 inclusive -> 4 rows; key 9 -> 1 row
    assert len(got) == 5
    assert got[(7, 0)]["n"] == 2 and got[(7, 0)]["total"] == 12.5
    for h in (1, 2):
        r = got[(7, h)]
        assert r["n"] == 0 and r["total"] is None
        assert r["locf_total"] == 12.5  # carried forward across the gap
    assert got[(7, 3)]["locf_total"] == 4.0
    assert got[(9, 5)]["n"] == 1 and got[(9, 5)]["locf_total"] == 1.0


def test_cohort_retention_cells_and_horizon(spark):
    from nosql_to_sql_migration_tool_spark.operators.timeseries import (
        cohort_retention,
    )

    # 2024-01-01 is a Monday (week start on both engines)
    rows = [
        (1, datetime(2024, 1, 2), 1, 0.0),   # u1 cohort wk0
        (2, datetime(2024, 1, 9), 1, 0.0),   # u1 active wk1
        (3, datetime(2024, 1, 23), 1, 0.0),  # u1 active wk3
        (4, datetime(2024, 1, 3), 2, 0.0),   # u2 cohort wk0
        (5, datetime(2024, 1, 10), 3, 0.0),  # u3 cohort wk1
        (6, datetime(2024, 3, 10), 3, 0.0),  # u3 beyond horizon 8
    ]
    got = {
        (str(r["cohort_week"].date()), r["weeks_since"]): r["n_users"]
        for r in cohort_retention(
            _events(spark, rows), horizon_weeks=8
        ).collect()
    }
    assert got[("2024-01-01", 0)] == 2      # u1, u2
    assert got[("2024-01-01", 1)] == 1      # u1
    assert got[("2024-01-01", 3)] == 1      # u1
    assert got[("2024-01-08", 0)] == 1      # u3
    assert ("2024-01-08", 8) not in got     # horizon filtered
    assert len(got) == 4


def test_trailing_active_users_window_membership(spark):
    from nosql_to_sql_migration_tool_spark.operators.timeseries import (
        trailing_active_users,
    )

    rows = [
        (1, datetime(2024, 1, 1, 5), 1, 0.0),
        (2, datetime(2024, 1, 1, 9), 1, 0.0),   # same (user, day): no double
        (3, datetime(2024, 1, 5, 1), 2, 0.0),
        (4, datetime(2024, 1, 9, 1), 1, 0.0),
    ]
    got = {
        str(r["report_day"].date()): r["active_users"]
        for r in trailing_active_users(
            _events(spark, rows), window_days=7
        ).collect()
    }
    assert got["2024-01-01"] == 1           # u1 only
    assert got["2024-01-05"] == 2           # u1 (jan1 within 7d) + u2
    assert got["2024-01-07"] == 2           # jan1 still in trailing 7 (d..d+6)
    assert got["2024-01-08"] == 1           # jan1 aged out; u2 remains
    assert got["2024-01-09"] == 2           # u2 (jan5) + u1 (jan9)


def test_event_funnel_strict_ordering(spark):
    from nosql_to_sql_migration_tool_spark.operators.timeseries import (
        event_funnel,
    )

    rows = [
        # u1 completes in order
        (1, datetime(2024, 1, 1, 1), 1, "view"),
        (2, datetime(2024, 1, 1, 2), 1, "click"),
        (3, datetime(2024, 1, 1, 3), 1, "purchase"),
        # u2 clicks BEFORE first view: click must not count
        (4, datetime(2024, 1, 1, 1), 2, "click"),
        (5, datetime(2024, 1, 1, 2), 2, "view"),
        (6, datetime(2024, 1, 1, 3), 2, "purchase"),  # no qualifying click
        # u3 views only
        (7, datetime(2024, 1, 1, 1), 3, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = event_funnel(df).first()
    assert (r["n_step1"], r["n_step2"], r["n_step3"]) == (3, 1, 1)


def test_mad_outlier_days_flags_only_extreme_days(spark):
    from nosql_to_sql_migration_tool_spark.operators.timeseries import (
        mad_outlier_days,
    )

    # series 'x': daily counts 4,4,4,5,5,20 → med 4.5, absdevs
    # {.5,.5,.5,.5,.5,15.5} → MAD .5 → threshold 1.5 ⇒ only the
    # 20-count day flags. The extreme day cannot mask itself (it
    # WOULD under a mean/stddev rule with few days).
    rows = []
    counts = [4, 4, 4, 5, 5, 20]
    eid = 0
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            rows.append(
                (eid, datetime(2024, 3, day, 12, 0, 0), "x")
            )
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = mad_outlier_days(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 20
    assert r["med"] == 4.5 and r["mad"] == 0.5
    assert r["day"] == datetime(2024, 3, 6, 0, 0, 0)


def test_mad_zero_flags_any_deviation(spark):
    from nosql_to_sql_migration_tool_spark.operators.timeseries import (
        mad_outlier_days,
    )

    # counts 3,3,3,4 → med 3, absdevs {0,0,0,1} → MAD 0 ⇒ the single
    # deviating day flags (3*0 threshold).
    rows = []
    eid = 0
    for day, n in enumerate([3, 3, 3, 4], start=1):
        for _ in range(n):
            rows.append((eid, datetime(2024, 3, day, 1, 0, 0), "y"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = mad_outlier_days(df).collect()
    assert [(r["n_events"], r["mad"]) for r in out] == [(4, 0.0)]
