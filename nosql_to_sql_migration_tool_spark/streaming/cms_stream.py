"""Streaming / mergeable count-min-sketch maintenance (VERDICT r8 next
#3): the CMS extended the way the LSH band indexes were — a persisted
PARTIALS store maintained per batch, merged at read, compacted under the
same crash-window gate as the hourly rollup. The ingest pipeline gets a
token-frequency monitor that never rescans the corpus: each batch folds
its own tokens into a depth x width partial (bounded rows), and the
current sketch is the pure SUM of partials — the textbook mergeable-
sketch property (CMS cells are counters; merge is cellwise addition).

Replay safety mirrors ``rollup.py``: partials are keyed by ``batch_id``
and written with dynamic-partition overwrite, so an at-least-once replay
(foreachBatch after a crash before the checkpoint commit) overwrites
exactly its own partition with identical content — idempotent by
construction, no read-your-own-output double count. ``compact_partials``
folds committed batches into the reserved ``batch_id=-1`` row set and
must be gated by ``last_committed_batch_id`` when a stream is attached
(the rollup's crash-window rule, ADVICE r6).

Scale shape: per batch, ONE combinable groupBy bounded at depth*width
output rows; the partials store grows by <= depth*width rows per batch
and compaction folds it back to depth*width. Reading the sketch costs a
groupBy over (batches x depth x width) rows of pure integers — metadata
scale, never corpus scale.

Reference analogue: none (the migration tool has no sketches); this is
north-star training-data-pipeline surface, and the md5-hex bucket
convention keeps the MERGED sketch bit-reproducible in DuckDB (the
whole-corpus CMS equals the sum of batch partials exactly, so the
driver's oracle verifies the merge is lossless, not just shaped right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

from nosql_to_sql_migration_tool_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counts,
)


def merge_cms_batch(
    batch: DataFrame,
    cms_path: str,
    batch_id: int = 0,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> None:
    """Fold one (micro-)batch of items into the persisted CMS partials
    store: write the batch's own depth x width partial under its
    ``batch_id`` partition (dynamic overwrite — a replayed batch
    replaces its own partition with identical content)."""
    partial = cms_counts(batch, col=col, depth=depth, width=width)
    (
        partial.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(cms_path)
    )


def read_cms(spark: SparkSession, cms_path: str) -> DataFrame:
    """The current sketch: cellwise SUM of all persisted partials —
    ``(row_idx, bucket, cnt)``. Merging is exact (integer addition), so
    this equals the CMS of the full concatenated stream regardless of
    how the batches split it."""
    return (
        spark.read.parquet(cms_path)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def compact_cms_partials(
    spark: SparkSession,
    cms_path: str,
    max_safe_batch_id: int | None = None,
) -> None:
    """Fold per-batch partials into the reserved ``batch_id=-1`` row
    set, bounding the store at depth*width rows (+ any preserved unsafe
    batches). Same crash-window rule as the rollup: a batch whose
    checkpoint has not committed may replay, so only batches at or below
    ``max_safe_batch_id`` (from ``rollup.last_committed_batch_id``) are
    folded; ``None`` folds everything and is only safe with no attached
    stream. Static overwrite per the rollup's compaction lesson — under
    a session-level dynamic mode, a plain overwrite would leave folded
    batches' old partitions alive and double-count every fold."""
    parts = try_read_parquet(spark, cms_path)
    if parts is None:
        return
    if max_safe_batch_id is not None:
        safe_pred = (F.col("batch_id") == -1) | (
            F.col("batch_id") <= int(max_safe_batch_id)
        )
    else:
        safe_pred = F.lit(True)
    folded = (
        parts.filter(safe_pred)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .withColumn("batch_id", F.lit(-1))
        .unionByName(parts.filter(~safe_pred))
        .localCheckpoint(eager=True)
    )
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(cms_path)
    )


def stream_cms_maintenance(
    items_stream: DataFrame,
    cms_path: str,
    checkpoint_path: str,
    col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> StreamingQuery:
    """Maintain the CMS partials store from an item stream
    (``availableNow``: drain pending input, fold, stop — the scheduled
    monitor shape, same trigger discipline as the ingest gates)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_cms_batch(
            batch_df, cms_path, batch_id=batch_id,
            col=col, depth=depth, width=width,
        )

    return (
        items_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_lc_maintenance(
    items_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    col: str = "token",
    m: int | None = None,
) -> StreamingQuery:
    """Maintain a linear-counting distinct sketch from an item stream —
    the distinct-cardinality twin of ``stream_cms_maintenance``: each
    micro-batch folds its occupied md5 buckets into the persisted store
    (``update_lc_index`` — batch_id-keyed, replay-idempotent), and
    ``read_lc`` answers "how many distinct so far" at any time without
    rescanning the stream's history. Same availableNow scheduled shape
    and the same crash-window compaction gate (``compact_lc_index``)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        LC_M,
        update_lc_index,
    )

    m_eff = LC_M if m is None else m

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        update_lc_index(
            batch_df, index_path, batch_id=batch_id, col=col, m=m_eff
        )

    return (
        items_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_kmv_maintenance(
    items_stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    col: str = "token",
    k: int | None = None,
) -> StreamingQuery:
    """Maintain a KMV bottom-k distinct sketch from an item stream —
    the third member of the sketch-maintenance trio (CMS counts, LC
    distinct-bitmap, KMV distinct-order-statistics): each micro-batch
    folds its bottom-k hashes into the persisted store
    (``update_kmv_sketch`` — batch_id-keyed, replay-idempotent, at
    most k longs per partition), and ``read_kmv`` answers "how many
    distinct so far" at any time bit-equal to the one-shot
    whole-stream sketch. Same availableNow scheduled shape as the
    other maintainers."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        KMV_K,
        update_kmv_sketch,
    )

    k_eff = KMV_K if k is None else k

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        update_kmv_sketch(
            batch_df, store_path, batch_id=batch_id, col=col, k=k_eff
        )

    return (
        items_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_quantile_bins_maintenance(
    items_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> StreamingQuery:
    """Maintain a fixed-bound quantile-bin store from an item stream —
    the distributional member of the maintenance family: each
    micro-batch folds its fixed-edge histogram into the persisted
    store (``update_quantile_bins`` — additive cells, batch_id-keyed,
    replay-idempotent), and ``read_quantile_bins`` answers "what do
    the quantiles look like so far" bit-equal to the one-shot sketch
    over the whole stream. The (lo, hi, n_bins) config is pinned for
    the store's life (the mergeability contract). Same availableNow
    scheduled shape and crash-window compaction gate
    (``compact_quantile_bins``)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        update_quantile_bins,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        update_quantile_bins(
            batch_df, col, index_path, lo, hi,
            batch_id=batch_id, n_bins=n_bins,
        )

    return (
        items_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
