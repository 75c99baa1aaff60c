"""Streaming corpus ingestion with near-dup gating — the stream twin
of ``operators/dedup.py``'s incremental ingest family: each micro-batch
of incoming documents probes the PERSISTED LSH band index, near-dups of
the existing corpus are routed to a quarantine sink, fresh documents
land in the accepted sink, and the index is updated append-only with
the batch's own bucket rows — so corpus-side work per batch stays
O(batch) forever (VERDICT r6 next #7, streaming form).

Reference analogue: the reference's scheduled incremental sync
(``Invoke-ScheduledSync``, private/Sync.ps1) moves documents without
any similarity gating; this adds the training-data-pipeline dedup gate
the north-star surface requires.

Scale shape per micro-batch: signature build + bucket probe + Jaccard
verify are all bounded by the batch and its candidates (the index scan
prunes on band_idx; corpus shingles join only candidate ids); the
index append is the batch's own bucket rows. Replay safety: accepted/
quarantine sinks carry ``batch_id`` so a replayed batch (foreachBatch
at-least-once) re-writes identical rows — readers take the latest per
(doc, batch) which is idempotent because the gate is deterministic in
the batch contents and the index state; the index append tolerates
replay because duplicate bucket rows cannot change any probe verdict
(the candidate join is a DISTINCT semi-probe).

Within-batch near-dups: the gate is batch-vs-CORPUS; two near-dup docs
arriving in the SAME batch both pass (neither is in the index yet) and
collapse on the next batch — callers needing intra-batch dedup run the
batch through ``near_dup_pairs`` first, exactly like the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from nosql_to_sql_migration_tool_spark.operators.dedup import (
    ingest_near_dup_flags,
    update_band_index,
)


def stream_ingest_near_dup(
    doc_stream: DataFrame,
    corpus: DataFrame,
    index_path: str,
    accepted_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Gate a document stream against the corpus's persisted band
    index (built once with ``build_band_index``; this stream maintains
    it). ``corpus`` supplies candidate shingles for the Jaccard verify
    (at scale: the document store the candidate point-fetch hits) —
    accepted batches are ALSO probed against, because every accepted
    batch's buckets append to the index before the next batch runs.
    availableNow trigger: drain pending drops, then stop (the
    scheduled-ingest shape)."""

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            buckets = spark.read.parquet(index_path).select(
                "band_idx", "band_hash", id_col
            )
        except AnalysisException:
            buckets = None
        # corpus text for the verify step = original corpus + every
        # previously ACCEPTED doc (their buckets are in the index, so
        # their text must be joinable for candidates)
        verify_side = corpus.select(id_col, text_col)
        try:
            accepted_prior = spark.read.parquet(accepted_path).select(
                id_col, text_col
            )
            verify_side = verify_side.unionByName(accepted_prior)
        except AnalysisException:
            pass
        flags = ingest_near_dup_flags(
            verify_side,
            batch_df,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            corpus_buckets=buckets,
        ).localCheckpoint(eager=True)
        batch_cols = batch_df.withColumn("batch_id", F.lit(int(batch_id)))
        routed = batch_cols.join(
            flags.select(id_col, "best_jaccard", "is_near_dup"), id_col
        )
        accepted = routed.filter(~F.col("is_near_dup")).drop("is_near_dup")
        quarantined = routed.filter(F.col("is_near_dup")).drop("is_near_dup")
        accepted.write.mode("append").parquet(accepted_path)
        quarantined.write.mode("append").parquet(quarantine_path)
        # index maintenance LAST: O(batch) bucket rows, append-only
        update_band_index(
            accepted.select(id_col, text_col), index_path,
            text_col=text_col, id_col=id_col,
        )

    return (
        doc_stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
