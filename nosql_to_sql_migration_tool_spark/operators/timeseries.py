"""Time-series operators over the events table — gap filling, LOCF
interpolation, cohort retention (SURVEY.md §2C north-star events
surface; the hypertable convenience layer: TimescaleDB's
``time_bucket_gapfill`` / ``locf`` and the product-analytics retention
matrix, restated as plain Spark plans).

Reference analogue: none — the migration tool has no time-series
surface at all.

Scale shapes:

- ``hourly_gapfill``: the dense grid is generated PER KEY from that
  key's own [min, max] hour span (one combinable min/max aggregate,
  then a ``sequence`` explode — no driver-side calendar, no global
  range). Grid size is sum over keys of span-hours; the join back to
  observed hours is an equi-join on (key, hour), both sides already
  hash-partitioned by the same key. LOCF is one window per key ordered
  by hour — the partition is a single key's grid, never global.
- ``cohort_retention``: two combinable aggregates (first-seen week per
  user, then distinct users per (cohort, offset) cell) — the matrix is
  cohorts × horizon cells, metadata-sized at any event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DecimalType


def hourly_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-key hourly series over each key's observed span:
    ``(key, hour, n, total, locf_total)`` where missing hours appear
    with n=0, NULL total, and ``locf_total`` carrying the last
    observed hour's total forward (TimescaleDB ``locf``). Totals are
    exact DECIMAL, cast to double for presentation."""
    hour = F.date_trunc("hour", F.col(ts_col))
    observed = (
        events.select(F.col(key_col).alias("key"), hour.alias("hour"),
                      F.col(value_col).alias("v"))
        .groupBy("key", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast(DecimalType(18, 2))).alias("__tot"),
        )
    )
    spans = observed.groupBy("key").agg(
        F.min("hour").alias("__h0"), F.max("hour").alias("__h1")
    )
    grid = spans.select(
        "key",
        F.explode(
            F.sequence("__h0", "__h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    dense = grid.join(observed, ["key", "hour"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        F.col("key").alias(key_col),
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.col("__tot").cast("double").alias("total"),
        F.last("__tot", ignorenulls=True).over(w).cast("double").alias(
            "locf_total"
        ),
    )


def hourly_gapfill_sql(
    table: str,
    key_expr: str = "user_id",
    ts_expr: str = "ts",
    value_expr: str = "value",
) -> str:
    """DuckDB twin of ``hourly_gapfill``."""
    return f"""
WITH observed AS (
  SELECT {key_expr} AS key, date_trunc('hour', {ts_expr}) AS hour,
         count(*) AS n,
         sum(CAST({value_expr} AS DECIMAL(18,2))) AS tot
  FROM {table} GROUP BY 1, 2
),
spans AS (
  SELECT key, min(hour) AS h0, max(hour) AS h1 FROM observed GROUP BY key
),
grid AS (
  SELECT key, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM spans
)
SELECT g.key AS {key_expr}, g.hour AS hour,
       coalesce(o.n, 0) AS n,
       CAST(o.tot AS DOUBLE) AS total,
       CAST(last_value(o.tot IGNORE NULLS) OVER (
         PARTITION BY g.key ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS locf_total
FROM grid g LEFT JOIN observed o ON g.key = o.key AND g.hour = o.hour
"""


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon_weeks: int = 8,
) -> DataFrame:
    """Weekly cohort retention matrix: cohort = ISO week of the key's
    FIRST event; one row per (cohort_week, weeks_since) with the
    distinct keys active that week, bounded to ``horizon_weeks``."""
    week = F.date_trunc("week", F.col(ts_col))
    acts = events.select(F.col(key_col).alias("key"), week.alias("wk"))
    first = acts.groupBy("key").agg(F.min("wk").alias("cohort_week"))
    joined = acts.join(first, "key")
    weeks_since = F.floor(
        F.datediff(F.col("wk"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        joined.select("key", "cohort_week", weeks_since.alias("weeks_since"))
        .filter(F.col("weeks_since") < horizon_weeks)
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("key").alias("n_users"))
    )


def cohort_retention_sql(
    table: str,
    key_expr: str = "user_id",
    ts_expr: str = "ts",
    horizon_weeks: int = 8,
) -> str:
    """DuckDB twin of ``cohort_retention``."""
    return f"""
WITH acts AS (
  SELECT {key_expr} AS key, date_trunc('week', {ts_expr}) AS wk
  FROM {table}
),
first AS (
  SELECT key, min(wk) AS cohort_week FROM acts GROUP BY key
)
SELECT f.cohort_week,
       CAST(floor(date_diff('day', f.cohort_week, a.wk) / 7) AS INT)
         AS weeks_since,
       count(DISTINCT a.key) AS n_users
FROM acts a JOIN first f ON a.key = f.key
WHERE floor(date_diff('day', f.cohort_week, a.wk) / 7) < {horizon_weeks}
GROUP BY 1, 2
"""


def trailing_active_users(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-N-day distinct actives per day (the WAU/MAU counter):
    each key's distinct active DAY fans out to the ``window_days``
    report days it contributes to (bounded explode), then one distinct
    count per report day. EXACT — no sketch — with work linear in
    (active key-days x window), the standard scale shape for sliding
    distinct counts; swap in an HLL sketch only when the window or
    cardinality makes exactness unaffordable."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    key_days = events.select(
        F.col(key_col).alias("key"), day.alias("d")
    ).distinct()
    fanout = key_days.select(
        "key",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("__d"),
    )
    # midnight TIMESTAMP, not DATE: DuckDB's generate_series yields
    # timestamps and its DATE still maps to datetime64 in pandas, so a
    # DATE here would string-format differently in the driver compare.
    return (
        fanout.groupBy(
            F.col("__d").cast("timestamp").alias("report_day")
        )
        .agg(F.count_distinct("key").alias("active_users"))
    )


def trailing_active_users_sql(
    table: str,
    key_expr: str = "user_id",
    ts_expr: str = "ts",
    window_days: int = 7,
) -> str:
    """DuckDB twin of ``trailing_active_users``."""
    return f"""
WITH key_days AS (
  SELECT DISTINCT {key_expr} AS key,
         CAST(date_trunc('day', {ts_expr}) AS DATE) AS d
  FROM {table}
),
fanout AS (
  SELECT key, unnest(generate_series(CAST(d AS TIMESTAMP),
                   CAST(d AS TIMESTAMP) + INTERVAL {window_days - 1} DAY,
                   INTERVAL 1 DAY)) AS report_day
  FROM key_days
)
SELECT report_day, count(DISTINCT key) AS active_users
FROM fanout GROUP BY report_day
"""


def event_funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order first-touch funnel: users whose first ``steps[0]``
    precedes a later ``steps[1]`` which precedes a later ``steps[2]``.
    Three combinable conditional-min aggregates chained by key joins —
    each stage shuffles only (key, ts) pairs, never event payloads.
    One summary row ``(n_step1, n_step2, n_step3)``."""
    s1, s2, s3 = steps
    k, ts, et = F.col(key_col), F.col(ts_col), F.col(type_col)
    t1 = events.filter(et == s1).groupBy(k.alias("key")).agg(
        F.min(ts).alias("t1")
    )
    t2 = (
        events.filter(et == s2)
        .select(k.alias("key"), ts.alias("__ts"))
        .join(t1, "key")
        .filter(F.col("__ts") > F.col("t1"))
        .groupBy("key")
        .agg(F.min("__ts").alias("t2"))
    )
    t3 = (
        events.filter(et == s3)
        .select(k.alias("key"), ts.alias("__ts"))
        .join(t2, "key")
        .filter(F.col("__ts") > F.col("t2"))
        .groupBy("key")
        .agg(F.min("__ts").alias("t3"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_step1"))
        .crossJoin(F.broadcast(t2.agg(F.count(F.lit(1)).alias("n_step2"))))
        .crossJoin(F.broadcast(t3.agg(F.count(F.lit(1)).alias("n_step3"))))
    )


def event_funnel_sql(
    table: str,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    key_expr: str = "user_id",
    ts_expr: str = "ts",
    type_expr: str = "event_type",
) -> str:
    """DuckDB twin of ``event_funnel``."""
    s1, s2, s3 = steps
    return f"""
WITH t1 AS (
  SELECT {key_expr} AS key, min({ts_expr}) AS t1
  FROM {table} WHERE {type_expr} = '{s1}' GROUP BY 1
),
t2 AS (
  SELECT e.{key_expr} AS key, min(e.{ts_expr}) AS t2
  FROM {table} e JOIN t1 ON e.{key_expr} = t1.key
  WHERE e.{type_expr} = '{s2}' AND e.{ts_expr} > t1.t1 GROUP BY 1
),
t3 AS (
  SELECT e.{key_expr} AS key, min(e.{ts_expr}) AS t3
  FROM {table} e JOIN t2 ON e.{key_expr} = t2.key
  WHERE e.{type_expr} = '{s3}' AND e.{ts_expr} > t2.t2 GROUP BY 1
)
SELECT (SELECT count(*) FROM t1) AS n_step1,
       (SELECT count(*) FROM t2) AS n_step2,
       (SELECT count(*) FROM t3) AS n_step3
"""


def mad_outlier_days(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    k: int = 3,
) -> DataFrame:
    """Robust per-series anomaly detection: flag days whose event count
    deviates from that series' MEDIAN daily count by more than
    ``k`` × MAD (median absolute deviation) — the breakdown-resistant
    alternative to the z-score detector (``event_value_outliers``),
    which a single extreme day can mask by inflating its own sigma.
    Output one row per flagged (series, day):
    ``(event_type, day, n_events, med, mad)``.

    Determinism contract: daily counts are integers; both engines
    define median of an even count as the mean of the two middle values
    — every median/MAD here is therefore an exact binary fraction
    (``x.0``/``x.5``/``x.25`` grid), so the ``> k*MAD`` comparison can
    never straddle a rounding difference. No libm anywhere.

    Plan: one combinable (type, day) count, two metadata-sized
    median aggregates over the per-day table (series × days rows, tiny
    relative to events), two broadcastable joins back. Linear at
    100 TB; no window, no global sort — median runs per series key.
    """
    day = F.date_trunc("day", F.col(ts_col))
    # The (series, day) count table feeds three consumers (median, the
    # deviation join, the MAD aggregate); it is series×days rows —
    # metadata-sized — so one eager localCheckpoint computes the
    # data-sized daily scan exactly once.
    daily = (
        events.select(F.col(type_col).alias("event_type"), day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    med = daily.groupBy("event_type").agg(
        F.median("n_events").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "__absdev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.median("__absdev").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            F.abs(F.col("n_events") - F.col("med"))
            > F.lit(float(k)) * F.col("mad")
        )
        .select("event_type", "day", "n_events", "med", "mad")
    )


def mad_outlier_days_sql(
    table: str = "events",
    ts_expr: str = "ts",
    type_expr: str = "event_type",
    k: int = 3,
) -> str:
    """DuckDB twin of ``mad_outlier_days``."""
    return f"""
WITH __daily AS (
  SELECT {type_expr} AS event_type,
         date_trunc('day', {ts_expr}) AS day,
         count(*) AS n_events
  FROM {table} GROUP BY 1, 2
),
__med AS (
  SELECT event_type, median(n_events) AS med FROM __daily GROUP BY 1
),
__dev AS (
  SELECT d.*, m.med, abs(d.n_events - m.med) AS absdev
  FROM __daily d JOIN __med m USING (event_type)
),
__mad AS (
  SELECT event_type, median(absdev) AS mad FROM __dev GROUP BY 1
)
SELECT d.event_type, d.day, d.n_events, d.med, a.mad
FROM __dev d JOIN __mad a USING (event_type)
WHERE abs(d.n_events - d.med) > {k}.0 * a.mad
"""
