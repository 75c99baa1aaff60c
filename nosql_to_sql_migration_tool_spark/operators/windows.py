"""Windowed aggregation over the events stream table (SURVEY.md M6).

These are the batch-equivalent forms of the streaming windows in
``streaming/cdc_stream.py`` — identical plans run under ``readStream``
(plus a watermark); the declared queries check them against DuckDB
``time_bucket`` / gaps-and-islands oracles.

Aggregated measures are summed as DECIMAL(18,2) — exact arithmetic, so
cross-engine float summation order can never flip a digit.

Scale: tumbling/sliding windows are plain groupBy aggregates with
map-side partial combine (sliding emits exactly window/slide rows per
event — 2 here); session windows shuffle by user and sort within
partition, Spark's native ``session_window`` handles the merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DecimalType

GAP = "5 minutes"


def _measure(col: str = "value"):
    # exact decimal accumulation (order-independent), double presentation
    # (identical dtype/text on both engines)
    return (
        F.sum(F.col(col).cast(DecimalType(18, 2)))
        .cast("double")
        .alias("total")
    )


def tumbling_window_agg(
    events: DataFrame, size: str = "1 hour"
) -> DataFrame:
    """Per-hour, per-event-type counts and exact sums."""
    return (
        events.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _measure())
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_window_agg(
    events: DataFrame, size: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Hopping 1-hour windows every 30 minutes: each event lands in
    exactly size/slide windows."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _measure())
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def session_window_agg(events: DataFrame, gap: str = GAP) -> DataFrame:
    """Per-user session windows (gap timeout): session ends ``gap`` after
    its last event; an event exactly at the boundary starts a new
    session (Spark's half-open [start, last+gap) semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )
