"""Continuous aggregate — the hypertable-rollup shape: an hourly
rollup table maintained INCREMENTALLY by a stream, so dashboard-scale
aggregates never rescan the raw events table.

Reference analogue: none — the migration tool has no aggregate
maintenance at all; this is the time-series side of the north-star
surface (events table), the streaming twin of
``operators/windows.py:tumbling_window_agg``.

Scale contract: per micro-batch, work is proportional to the batch
plus the few hour partitions it touches — never to the rollup's
history. That holds because the stored measures are ADDITIVE (count +
exact DECIMAL sum): merging is read-touched-partitions → union →
re-aggregate → dynamic-partition overwrite of ONLY those hour
directories. Late events fold into their (old) hour exactly like
current ones — additivity makes reprocessing order-free — and a crash
between batches is safe because the checkpoint replays the batch into
an idempotent per-partition overwrite.

Derived measures (averages, rates) are computed at READ time from the
additive ones (``read_rollup``) — storing a pre-divided average would
break mergeability, the classic continuous-aggregate design rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import DecimalType
from pyspark.sql.utils import AnalysisException

HOUR_FMT = "yyyy-MM-dd-HH"


def _hourly_partial(events: DataFrame) -> DataFrame:
    """Additive hourly partial aggregate of an events (micro-)batch:
    ``(hour_key, window_start, event_type, n, total_dec)``. DECIMAL sum
    keeps merges exact at any batch split."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DecimalType(18, 2)))
            .cast(DecimalType(18, 2))
            .alias("total_dec"),
        )
        .select(
            F.date_format(F.col("w.start"), HOUR_FMT).alias("hour_key"),
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_dec",
        )
    )


def merge_rollup_batch(
    spark: SparkSession, batch: DataFrame, rollup_path: str
) -> None:
    """Merge one batch's hourly partials into the rollup table: read
    ONLY the touched hour partitions, re-aggregate the union, overwrite
    only those partitions (dynamic partition overwrite). Idempotence
    across replays is per-batch: a replayed batch rewrites the same
    partitions from the same inputs."""
    partial = _hourly_partial(batch).localCheckpoint(eager=True)
    hours = [r["hour_key"] for r in partial.select("hour_key").distinct().collect()]
    if not hours:
        return
    try:
        existing = (
            spark.read.parquet(rollup_path)
            .filter(F.col("hour_key").isin(hours))
            .select(
                "hour_key", "window_start", "event_type", "n",
                F.col("total_dec").cast(DecimalType(18, 2)).alias("total_dec"),
            )
        )
        merged_src = partial.unionByName(existing)
    except AnalysisException:  # first batch: rollup does not exist yet
        merged_src = partial
    merged = (
        merged_src.groupBy("hour_key", "window_start", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_dec").cast(DecimalType(18, 2)).alias("total_dec"),
        )
        # materialize before overwriting the partitions this plan reads
        .localCheckpoint(eager=True)
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour_key")
        .parquet(rollup_path)
    )


def stream_hourly_rollup(
    events_stream: DataFrame, rollup_path: str, checkpoint_path: str
) -> StreamingQuery:
    """Maintain the hourly rollup from an events stream
    (``availableNow``: drain pending input, merge, stop — the scheduled
    incremental-refresh shape; a real deployment drops the trigger for
    true continuous maintenance)."""

    def handle_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_rollup_batch(batch_df.sparkSession, batch_df, rollup_path)

    return (
        events_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Query-facing view of the rollup: derived measures (avg) computed
    from the additive ones at read time, doubles for presentation."""
    r = spark.read.parquet(rollup_path)
    return r.select(
        "window_start",
        "event_type",
        "n",
        F.col("total_dec").cast("double").alias("total"),
        F.round(
            F.col("total_dec").cast("double") / F.col("n"), 6
        ).alias("avg_value"),
    )
