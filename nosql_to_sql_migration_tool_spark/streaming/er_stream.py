"""Streaming entity-resolution ingest (round 15): the ER family's
stream twin. A migration that receives target batches continuously
(the reference's scheduled sync loop, ``private/Sync.ps1:125-163``,
with keys absent or dirty) maintains two stores per micro-batch:

  match store  — the batch's COMPLETE match relation (reference x
                 batch multi-pass scores ∪ batch-internal
                 ``er_matches``), multi-pass-deduped, written under
                 ONE batch_id partition with a replay-idempotent
                 dynamic overwrite. Persisting the union keeps the
                 store consistent with the labels: a consumer
                 rebuilding clusters from ``read_linkage_matches``
                 reaches the same components the label store holds
                 (a per-pass or cross-only store would not — pairs
                 matched by several passes would double, and
                 batch-internal pairs would be missing).
  label store  — ``update_er_label_store``: churn-bounded relabel +
                 partition-scoped rewrite of the bucket-partitioned
                 ``(id, entity_id)`` table

The blocked score joins are computed ONCE per batch and pinned; both
stores fold from the same frame. Replay safety: the match overwrite is
idempotent by construction; the label fold is idempotent because
relabeling with an already-folded batch's matches reaches the same
fixpoint (components already merged stay merged — label repair is
monotone in the match set), pinned by the replay test.

availableNow trigger — the scheduled-sync shape shared by every
maintainer in ``cms_stream`` / ``ingest_stream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from nosql_to_sql_migration_tool_spark.operators.linkage import (
    er_matches,
    multi_pass_linkage_scores,
    update_er_label_store,
)

__all__ = ["fold_er_batch", "stream_er_maintenance"]


def fold_er_batch(
    spark: SparkSession,
    reference: DataFrame,
    batch: DataFrame,
    match_store_path: str,
    label_store_path: str,
    block_cols: list,
    params: dict[str, tuple[float, float]],
    id_col: str,
    threshold_micro: int,
    batch_id: int,
    n_buckets: int = 64,
) -> None:
    """Fold ONE entity batch into both ER stores — the unit of work the
    stream twin schedules, callable directly for batch-driven syncs.
    ``reference`` is the already-resolved entity table the batch links
    against (at 100 TB, a snapshot/dim table — scanned per pass, never
    shuffled beyond the blocked equi-join).

    Scope contract: a batch is matched against ``reference`` and
    against ITSELF; pairs between this batch and an EARLIER batch are
    found only if the caller's reference includes previously accepted
    entities (the usual setup — the reference is the growing target
    table). A static reference misses cross-batch duplicates, by
    construction."""
    cross = multi_pass_linkage_scores(
        reference, batch, block_cols, params, id_col
    ).filter(F.col("score_micro") >= int(threshold_micro))
    internal = er_matches(
        batch, block_cols, params, id_col, threshold_micro
    )
    # the batch's complete, deduped match relation — computed once,
    # pinned, and the frame BOTH stores fold from
    matches = cross.unionByName(internal).localCheckpoint(eager=True)
    (
        matches.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(match_store_path)
    )
    update_er_label_store(
        spark,
        label_store_path,
        matches,
        id_col,
        new_entities=batch,
        n_buckets=n_buckets,
    )


def stream_er_maintenance(
    entity_stream: DataFrame,
    reference: DataFrame,
    match_store_path: str,
    label_store_path: str,
    block_cols: list,
    params: dict[str, tuple[float, float]],
    id_col: str,
    threshold_micro: int,
    checkpoint_path: str,
    n_buckets: int = 64,
) -> StreamingQuery:
    """Maintain the ER match + label stores from an entity stream
    (availableNow: drain pending batches, fold each, stop — the
    scheduled-sync trigger discipline)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_er_batch(
            batch_df.sparkSession,
            reference,
            batch_df,
            match_store_path,
            label_store_path,
            block_cols,
            params,
            id_col,
            threshold_micro,
            batch_id,
            n_buckets=n_buckets,
        )

    return (
        entity_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
