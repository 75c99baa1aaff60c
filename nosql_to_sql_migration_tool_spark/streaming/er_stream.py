"""Streaming entity-resolution ingest (round 15): the ER family's
stream twin. A migration that receives target batches continuously
(the reference's scheduled sync loop, ``private/Sync.ps1:125-163``,
with keys absent or dirty) maintains two stores per micro-batch:

  match store  — ``update_linkage_matches``: one blocked a x batch
                 equi-join, O(batch) appended rows, batch_id-keyed
                 replay-idempotent overwrite
  label store  — ``update_er_label_store``: churn-bounded relabel +
                 partition-scoped rewrite of the bucket-partitioned
                 ``(id, entity_id)`` table

Batch-internal duplicates are covered per the ``update_er_clusters``
completeness contract (the batch is also self-matched — both sides are
O(batch)-bounded blocked joins). Replay safety: the match store
overwrite is idempotent by construction; the label fold is idempotent
because relabeling with an already-folded batch's matches reaches the
same fixpoint (components already merged stay merged — label repair is
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
    update_linkage_matches,
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
    for i, col in enumerate(block_cols):
        update_linkage_matches(
            reference,
            batch,
            match_store_path,
            col,
            params,
            id_col,
            threshold_micro,
            # one partition per (batch, pass): replay overwrites both
            batch_id * len(block_cols) + i,
        )
    cross = multi_pass_linkage_scores(
        reference, batch, block_cols, params, id_col
    ).filter(F.col("score_micro") >= int(threshold_micro))
    internal = er_matches(
        batch, block_cols, params, id_col, threshold_micro
    )
    update_er_label_store(
        spark,
        label_store_path,
        cross.unionByName(internal),
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
