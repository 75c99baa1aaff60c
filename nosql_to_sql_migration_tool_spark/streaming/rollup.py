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
exact DECIMAL sum): merging is write-this-batch's-partials →
re-aggregate the touched hours' partials → dynamic-partition overwrite
of ONLY those hour directories. Late events fold into their (old) hour
exactly like current ones — additivity makes reprocessing order-free.

Replay safety (ADVICE r5, high): an earlier design read the rollup's
existing hour partitions and re-ADDED the batch partials — so a batch
replayed after the overwrite committed but before the streaming
checkpoint committed would double-count (the rewrite's input included
its own prior output). The merge is now a pure function of a
PARTIALS STORE keyed by ``(hour_key, batch_id)``:

  1. the batch's hourly partials are written with dynamic-partition
     overwrite into ``<rollup>/.__partials`` — a replayed batch (same
     ``batch_id``, same data: foreachBatch's replay contract)
     overwrites exactly its own partition dirs with identical content;
  2. each touched hour partition of the rollup is rebuilt by
     re-aggregating ALL partials for that hour.

Both steps are idempotent under exactly-replayed batches, so a crash
at ANY point between them (or before the checkpoint commit) yields the
correct table after replay — genuine exactly-once table maintenance on
top of foreachBatch's at-least-once delivery. Partials-per-hour is
bounded by the number of batches that touched the hour (current hours:
a handful; late-data hours: rare by definition); a maintenance window
can fold an old hour's partials into one row (``compact_partials``)
without changing any query result, since the rebuild is associative.

Derived measures (averages, rates) are computed at READ time from the
additive ones (``read_rollup``) — storing a pre-divided average would
break mergeability, the classic continuous-aggregate design rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import DecimalType
from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

HOUR_FMT = "yyyy-MM-dd-HH"
PARTIALS_DIR = ".__partials"


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


def _partials_path(rollup_path: str) -> str:
    return rollup_path.rstrip("/") + "/" + PARTIALS_DIR


def merge_rollup_batch(
    spark: SparkSession, batch: DataFrame, rollup_path: str,
    batch_id: int = 0,
) -> None:
    """Merge one batch's hourly partials into the rollup table,
    replay-safely (see module docstring): write the batch's partials
    under ``(hour_key, batch_id)`` (idempotent dynamic-partition
    overwrite), then rebuild ONLY the touched hour partitions from the
    partials store. The rollup is always a pure re-aggregation of
    partials — never of its own previous output — so replaying a
    crashed batch cannot double-count."""
    partial = _hourly_partial(batch).localCheckpoint(eager=True)
    hours = [r["hour_key"] for r in partial.select("hour_key").distinct().collect()]
    if not hours:
        return
    ppath = _partials_path(rollup_path)
    (
        partial.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour_key", "batch_id")
        .parquet(ppath)
    )
    merged = (
        spark.read.parquet(ppath)
        .filter(F.col("hour_key").isin(hours))
        .groupBy("hour_key", "window_start", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_dec").cast(DecimalType(18, 2)).alias("total_dec"),
        )
        # materialize before overwriting partitions a future plan reads
        .localCheckpoint(eager=True)
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("hour_key")
        .parquet(rollup_path)
    )


def last_committed_batch_id(
    spark: SparkSession, checkpoint_path: str
) -> int | None:
    """Highest batch id the streaming checkpoint has COMMITTED (the
    ``commits/`` dir holds one file per completed batch — Structured
    Streaming's public checkpoint layout). Batches above this value may
    replay after a restart; pass the result to ``compact_partials`` as
    ``max_safe_batch_id``. Returns None when no batch has committed."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import (
        list_files,
        path_exists,
    )

    commits = checkpoint_path.rstrip("/") + "/commits"
    if not path_exists(spark, commits):
        return None
    ids = []
    for p, _size in list_files(spark, commits):
        base = p.rsplit("/", 1)[-1]
        if base.isdigit():
            ids.append(int(base))
    return max(ids) if ids else None


def compact_partials(
    spark: SparkSession,
    rollup_path: str,
    hours: list[str] | None = None,
    max_safe_batch_id: int | None = None,
) -> None:
    """Maintenance: fold an hour's many per-batch partial rows into one
    (stored under the reserved ``batch_id=-1``), bounding the partials
    store for long-lived late-data hours. Associativity of the additive
    measures makes this a no-op for every query result. Run OUTSIDE the
    stream (single writer — SCALE.md known limits).

    Crash-window rule (ADVICE r6, medium): a batch whose partials are
    written but whose streaming checkpoint has NOT committed may replay
    after restart — if compaction had folded it into the ``batch_id=-1``
    row, the replay would re-create its ``(hour_key, batch_id)``
    partition while its contribution also survives inside ``-1``,
    double-counting the hour. Pass ``max_safe_batch_id`` (from
    ``last_committed_batch_id`` on the stream's checkpoint) and only
    batches known committed are folded; partials above the bound are
    preserved verbatim. ``max_safe_batch_id=None`` folds everything and
    is only safe when no stream is attached or the stream is known
    cleanly stopped (no pending replay)."""
    ppath = _partials_path(rollup_path)
    parts = try_read_parquet(spark, ppath)
    if parts is None:
        return
    if hours is not None:
        parts = parts.filter(F.col("hour_key").isin(hours))
    if max_safe_batch_id is not None:
        safe_pred = (F.col("batch_id") == -1) | (
            F.col("batch_id") <= int(max_safe_batch_id)
        )
    else:
        safe_pred = F.lit(True)
    folded = (
        parts.filter(safe_pred)
        .groupBy("hour_key", "window_start", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_dec").cast(DecimalType(18, 2)).alias("total_dec"),
        )
        .withColumn("batch_id", F.lit(-1))
        # unsafe (possibly-replaying) batches ride along untouched so the
        # per-hour overwrite below cannot lose them
        .unionByName(parts.filter(~safe_pred))
        .localCheckpoint(eager=True)
    )
    touched = [r["hour_key"] for r in folded.select("hour_key").distinct().collect()]
    if not touched:
        return
    # STATIC overwrite of the touched hour_key dirs replaces ALL their
    # batch_id subdirs with the folded row (+ any preserved unsafe
    # partials). The mode is pinned per-write: under a session-level
    # partitionOverwriteMode=dynamic (any caller may have set it), a
    # plain overwrite would replace only the batch_id dirs present in
    # the OUTPUT and leave the folded batches' old dirs alive —
    # double-counting every fold (caught by the round-7 crash-window
    # test once another test left the session in dynamic mode). Done
    # hour-by-hour so an interrupted compaction leaves every untouched
    # hour intact.
    for hk in touched:
        folded.filter(F.col("hour_key") == hk).drop("hour_key").write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "static").partitionBy(
            "batch_id"
        ).parquet(f"{ppath}/hour_key={hk}")


def stream_hourly_rollup(
    events_stream: DataFrame, rollup_path: str, checkpoint_path: str
) -> StreamingQuery:
    """Maintain the hourly rollup from an events stream
    (``availableNow``: drain pending input, merge, stop — the scheduled
    incremental-refresh shape; a real deployment drops the trigger for
    true continuous maintenance)."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_rollup_batch(
            batch_df.sparkSession, batch_df, rollup_path, batch_id=batch_id
        )

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
