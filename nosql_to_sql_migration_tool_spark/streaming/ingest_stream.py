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
(doc, batch). That idempotency holds even when the crash fell AFTER
the index append / accepted write but BEFORE the checkpoint commit,
because the gate anti-joins the ids this SAME batch_id already sunk
out of the probed index and the verify side (see ``gate_batch``): the
replayed probe sees the corpus exactly as the first delivery did, so
verdicts are bit-identical and no doc can land in both sinks with
conflicting flags (ADVICE r7). The exclusion is keyed by batch_id
(ADVICE r8): an id redelivered under a DIFFERENT batch_id is a
cross-batch redelivery, not a replay — it is dropped from the batch
(already ingested, verdict stands) instead of silently bypassing the
gate. Replay-duplicated index rows are also deduped before the
bucket-width cap inside ``ingest_near_dup_flags``.

The replay/redelivery classification probes a compact ``(id,
batch_id)`` LEDGER (ADVICE r9), written batch_id-partitioned BEFORE
any sink/index mutation and folded by ``compact_ingest_ledger`` under
the same crash-window gate as the CMS/LC stores — per-batch gate cost
is one pruned single-column scan of the folded ledger, never a rescan
of the full accepted + quarantine sinks (which grow with total corpus
ingested and whose compaction can never shrink the text payload).

Within-batch near-dups: the gate is batch-vs-CORPUS; two near-dup docs
arriving in the SAME batch both pass (neither is in the index yet) and
collapse on the next batch — callers needing intra-batch dedup run the
batch through ``near_dup_pairs`` first, exactly like the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

from nosql_to_sql_migration_tool_spark.operators.dedup import (
    band_bucket_rows,
    ingest_near_dup_flags,
    shingle_sets,
)
from nosql_to_sql_migration_tool_spark.operators.similarity import (
    embedding_band_rows,
    ingest_embedding_near_dup_flags,
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
        gate_batch(
            batch_df,
            batch_id,
            corpus,
            index_path,
            accepted_path,
            quarantine_path,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
        )

    return (
        doc_stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _ledger_path(accepted_path: str) -> str:
    return accepted_path.rstrip("/") + ".__ledger"


def _concurrent(*thunks) -> None:
    """Gate/takedown overlap of independent per-batch store actions —
    ``hadoop_fs.run_concurrent`` with the replay-contract note: callers
    here only overlap actions with no cross-store ordering requirement;
    the ledger-first discipline is preserved by sequencing AROUND the
    overlap (pinned by tests/test_replay_equivalence.py)."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import run_concurrent

    run_concurrent(*thunks)


def _migrate_legacy_sink(spark: SparkSession, sink_path: str) -> bool:
    """One-time sink layout upgrade (ADVICE r10 medium): pre-round-10
    deployments appended sinks UNPARTITIONED, with batch_id as a data
    column in root-level files; round-10 gates append
    ``partitionBy('batch_id')``. Without this rewrite the first
    post-upgrade append produces a mixed root-files-plus-batch_id=N
    layout that breaks every later read of the sink (conflicting
    directory structures / batch_id as both data and partition column)
    — including the gate's own verify-side read. Runs inside the same
    once-per-deployment ledger-bootstrap branch ('sinks exist, no
    ledger'), so the full-sink rewrite happens at most once; a
    partitioned sink (no root-level data files) is untouched. Returns
    whether a rewrite happened."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import (
        list_files,
        path_exists,
    )

    if not path_exists(spark, sink_path):
        return False
    root_data_files = [
        p
        for p, _ in list_files(spark, sink_path)
        if not p.rsplit("/", 1)[-1].startswith((".", "_"))
    ]
    if not root_data_files:
        return False
    # LAZINESS HAZARD: checkpoint before overwriting the path we read
    rows = spark.read.parquet(sink_path).localCheckpoint(eager=True)
    (
        rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(sink_path)
    )
    return True


def _ledger_append(ids: DataFrame, ledger_path: str, batch_id: int) -> None:
    """Record the batch's (post-foreign-drop) ids under its batch_id —
    dynamic-partition overwrite, so a replayed batch rewrites exactly
    its own partition with identical rows (the CMS/LC store
    discipline)."""
    (
        ids.distinct()
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(ledger_path)
    )


def _bootstrap_ledger(
    spark: SparkSession,
    sink_paths: tuple[str, str],
    id_col: str,
    ledger_path: str,
) -> DataFrame | None:
    """One-time pre-ledger deployment upgrade, shared by the gate's
    replay split and ``takedown_docs`` (ADVICE r11 medium): migrate any
    legacy UNPARTITIONED sink to the batch_id-partitioned layout, then
    derive the ``(id, batch_id)`` ledger from the sinks and persist it.
    Returns the derived ledger rows, or ``None`` when no sink exists
    yet (fresh deployment — nothing to bootstrap)."""
    prior = None
    for path in sink_paths:
        _migrate_legacy_sink(spark, path)
        part = try_read_parquet(spark, path)
        if part is None:
            continue
        part = part.select(id_col, "batch_id")
        prior = part if prior is None else prior.unionByName(part)
    if prior is not None:
        prior = prior.distinct().localCheckpoint(eager=True)
        (
            prior.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("batch_id")
            .parquet(ledger_path)
        )
    return prior


def _replay_partition(
    batch_df: DataFrame,
    batch_id: int,
    sink_paths: tuple[str, str],
    id_col: str,
    ledger_path: str,
) -> tuple[DataFrame, DataFrame | None]:
    """Split prior ingest state by THIS batch_id (ADVICE r8): the gate
    excludes the batch's ids from the probed index/verify side on EVERY
    delivery, so a doc redelivered under a NEW batch_id (or an id
    colliding with a prior batch's) must not silently skip duplicate
    detection, double-accept, or append duplicate index rows.

    The classification source is the compact ``(id, batch_id)`` LEDGER,
    not the sinks (ADVICE r9): scanning the full accepted + quarantine
    sinks cost O(total docs ever ingested) per batch and compaction
    never shrank it; the ledger is a single pruned id column per
    partition and ``compact_ingest_ledger`` folds committed batches to
    one compact row set. Pre-ledger deployments bootstrap once: when
    the ledger is absent but sinks exist, it is derived from the sinks
    (the one remaining full scan) and persisted, so every later batch
    probes only the ledger.

    Returns ``(batch_df, replayed_ids)`` where

    * ids already ingested under a DIFFERENT batch_id (including the
      reserved compacted ``batch_id=-1`` — a fold happens only after
      its batches' checkpoints committed, so no fold victim can ever
      replay) are dropped from the batch entirely — a cross-batch
      redelivery is already ingested and its verdict stands (idempotent
      skip, no duplicate sink/index rows);
    * ``replayed_ids`` are ids already ingested under the SAME
      batch_id — a true at-least-once replay of a crashed commit; only
      THESE are excluded from the probed index and verify side so the
      replayed probe sees the corpus exactly as the first delivery
      did."""
    spark = batch_df.sparkSession
    prior = try_read_parquet(spark, ledger_path)
    if prior is not None:
        prior = prior.select(id_col, "batch_id")
    else:
        # bootstrap from pre-ledger sinks (upgrade path), persisted so
        # this full scan happens at most once per deployment; the same
        # branch migrates any legacy UNPARTITIONED sink to the
        # batch_id-partitioned layout before this round's append can
        # create a mixed layout (ADVICE r10 medium)
        prior = _bootstrap_ledger(spark, sink_paths, id_col, ledger_path)
    if prior is None:
        return batch_df, None
    foreign = (
        prior.filter(F.col("batch_id") != int(batch_id))
        .select(id_col)
        .distinct()
    )
    # BOTH outputs are consumed after _ledger_append dynamically
    # overwrites this batch's ledger partition; materialize them now
    # (batch-scale rows) so no downstream plan re-lists the replaced
    # ledger files mid-flight
    replayed = (
        prior.filter(F.col("batch_id") == int(batch_id))
        .select(id_col)
        .distinct()
        .localCheckpoint(eager=True)
    )
    filtered = batch_df.join(foreign, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    return filtered, replayed


def compact_ingest_ledger(
    spark: SparkSession,
    accepted_path: str,
    max_safe_batch_id: int | None = None,
    ledger_path: str | None = None,
) -> None:
    """Fold committed batches' ledger rows into the reserved
    ``batch_id=-1`` partition — the CMS/LC compaction discipline applied
    to the replay ledger, bounding it at one distinct-id row set (+
    preserved unsafe batches). Semantically safe because a COMMITTED
    batch_id can never replay: its ids only ever need the "different
    batch_id ⇒ already ingested, drop" classification, which -1
    (never a real batch id — Structured Streaming ids are >= 0)
    provides. Same crash-window gate as the rollup/CMS compactions:
    pass ``max_safe_batch_id`` (``rollup.last_committed_batch_id``)
    while a stream is attached; ``None`` folds everything and is only
    safe with no attached stream. Static overwrite per the rollup's
    compaction lesson."""
    path = ledger_path if ledger_path is not None else _ledger_path(
        accepted_path
    )
    parts = try_read_parquet(spark, path)
    if parts is None:
        return
    if max_safe_batch_id is not None:
        safe_pred = (F.col("batch_id") == -1) | (
            F.col("batch_id") <= int(max_safe_batch_id)
        )
    else:
        safe_pred = F.lit(True)
    id_cols = [c for c in parts.columns if c != "batch_id"]
    folded = (
        parts.filter(safe_pred)
        .select(*id_cols)
        .distinct()
        .withColumn("batch_id", F.lit(-1))
        .unionByName(parts.filter(~safe_pred))
        .localCheckpoint(eager=True)
    )
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("batch_id")
        .parquet(path)
    )


def gate_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus: DataFrame,
    index_path: str,
    accepted_path: str,
    quarantine_path: str,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the near-dup gate, module-level so the
    at-least-once REPLAY contract is directly testable (call twice with
    the same batch_id — exactly what foreachBatch does after a crash
    between the sink/index writes and the checkpoint commit).

    Replay safety (ADVICE r7): a crash after the index append but
    before the checkpoint commit leaves the batch's own bucket rows in
    the index and its own text in ``accepted_path``; without exclusion
    the replayed batch would self-match at Jaccard 1.0 and re-route
    every previously-accepted doc to quarantine — the doc would land in
    BOTH sinks with conflicting verdicts. ADVICE r8 narrowed the
    exclusion to TRUE replays: only ids this same batch_id already sunk
    are anti-joined out of the probed index and verify side (the index
    must represent the corpus as it stood before this batch); ids sunk
    by a DIFFERENT batch_id are cross-batch redeliveries and are dropped
    from the batch entirely (their verdict stands — no double-accept, no
    duplicate index rows). Width counts dedupe replay-duplicated index
    rows inside ``ingest_near_dup_flags``.

    Id-namespace contract: stream ids must be disjoint from corpus ids —
    a batch doc reusing a corpus id would have its one legitimate
    comparison dropped by the flags' same-id self-pair guard."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    ledger = _ledger_path(accepted_path)
    batch_df, replayed_ids = _replay_partition(
        batch_df, batch_id, (accepted_path, quarantine_path), id_col, ledger
    )
    if batch_df.isEmpty():
        return
    buckets = try_read_parquet(spark, index_path)
    if buckets is not None:
        buckets = buckets.select("band_idx", "band_hash", id_col)
        if replayed_ids is not None:
            buckets = buckets.join(replayed_ids, id_col, "left_anti")
    # corpus text for the verify step = original corpus + every
    # previously ACCEPTED doc (their buckets are in the index, so
    # their text must be joinable for candidates) — minus TRUE-replay
    # ids only (their text is already in accepted_path from the
    # crashed first delivery)
    verify_side = corpus.select(id_col, text_col)
    accepted_prior = try_read_parquet(spark, accepted_path)
    if accepted_prior is not None:
        verify_side = verify_side.unionByName(
            accepted_prior.select(id_col, text_col)
        )
    # dropDuplicates: replayed appends leave duplicate accepted rows,
    # which would double-count n_cand through the verify join
    if replayed_ids is not None:
        verify_side = verify_side.join(replayed_ids, id_col, "left_anti")
    verify_side = verify_side.dropDuplicates([id_col])
    # r16 (guide §2.4 remove redundant passes): the batch's shingle
    # projection and its band bucket rows feed THREE consumers — the
    # probe side of the flags (signature build), the Jaccard verify
    # side, and the index append. Both are O(batch) narrow frames (the
    # signature/shingle store an LSH pipeline persists anyway at
    # scale); staging each once replaces two extra tokenize passes and
    # a full batch minhash re-computation in update_band_index.
    #
    # Ledger-FIRST contract, overlapped (r16 session 3, guide §2.6):
    # the ledger append must complete before any SINK/INDEX mutation —
    # which happens strictly after this block — while the staging and
    # the flags probe are pure computations over already-read state
    # (their localCheckpoints land in executor scratch, not a store),
    # so the two run as concurrent jobs. Crash anywhere in the overlap
    # leaves either no ledger row (clean re-gate) or the ledger row
    # with zero mutations ("exclusions are no-ops against not-yet-
    # mutated state" — the documented replay point); verdicts replay
    # bit-identically either way (tests/test_replay_equivalence.py).
    staged: dict[str, DataFrame] = {}

    def _stage_and_probe() -> None:
        staged["sh"] = shingle_sets(
            batch_df, text_col, id_col
        ).localCheckpoint(eager=True)
        staged["buckets"] = band_bucket_rows(
            batch_df, text_col, id_col, shingles=staged["sh"]
        ).localCheckpoint(eager=True)
        staged["flags"] = ingest_near_dup_flags(
            verify_side,
            batch_df,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            corpus_buckets=buckets,
            batch_buckets=staged["buckets"],
            batch_shingles=staged["sh"],
        ).localCheckpoint(eager=True)

    _concurrent(
        lambda: _ledger_append(batch_df.select(id_col), ledger, batch_id),
        _stage_and_probe,
    )
    batch_buckets = staged["buckets"]
    flags = staged["flags"]
    batch_cols = batch_df.withColumn("batch_id", F.lit(int(batch_id)))
    routed = batch_cols.join(
        flags.select(id_col, "best_jaccard", "is_near_dup"), id_col
    )
    accepted = routed.filter(~F.col("is_near_dup")).drop("is_near_dup")
    quarantined = routed.filter(F.col("is_near_dup")).drop("is_near_dup")

    # batch_id-partitioned sinks (round 10): partition pruning for
    # readers AND the partition-scoped rewrite takedown_docs needs.
    # r16 (guide §2.6): the two sink writes touch different paths and
    # the index append touches a third; the replay contract orders only
    # ledger-BEFORE-everything (classification source) — verdicts
    # replay bit-identically from any crash point regardless of which
    # store committed first (tests/test_replay_equivalence.py pins
    # this) — so the accepted chain (sink append, then its index rows)
    # and the quarantine append overlap.
    def _accepted_chain():
        accepted.write.mode("append").partitionBy("batch_id").parquet(
            accepted_path
        )
        # index maintenance: O(batch) bucket rows, append-only — the
        # accepted docs' rows are a pure per-doc function ALREADY
        # computed above (pytest-pinned purity), so filter the staged
        # frame instead of re-running the batch minhash.
        (
            batch_buckets.join(accepted.select(id_col), id_col, "semi")
            .select("band_idx", "band_hash", id_col)
            .write.mode("append")
            .partitionBy("band_idx")
            .parquet(index_path)
        )

    _concurrent(
        _accepted_chain,
        lambda: quarantined.write.mode("append")
        .partitionBy("batch_id")
        .parquet(quarantine_path),
    )


def gate_embedding_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus: DataFrame,
    index_path: str,
    accepted_path: str,
    quarantine_path: str,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """The embedding twin of ``gate_batch`` (VERDICT r7 next #5): one
    micro-batch of vectors probes the persisted hyperplane-LSH index
    (``build_embedding_index`` / ``update_embedding_index``), near-dups
    of the existing corpus quarantine, fresh vectors land in the
    accepted sink and their band rows append to the index. Same replay
    contract (ADVICE r8 form): TRUE-replay ids (same batch_id already
    sunk) are anti-joined out of the probed index and verify side so a
    replayed batch reproduces its original verdicts; cross-batch
    redeliveries are dropped from the batch (already ingested). Stream
    ids must be disjoint from corpus ids — see ``gate_batch``."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    ledger = _ledger_path(accepted_path)
    batch_df, replayed_ids = _replay_partition(
        batch_df, batch_id, (accepted_path, quarantine_path), id_col, ledger
    )
    if batch_df.isEmpty():
        return
    bands = try_read_parquet(spark, index_path)
    if bands is not None:
        bands = bands.select("band_idx", "band_val", id_col)
        if replayed_ids is not None:
            bands = bands.join(replayed_ids, id_col, "left_anti")
    verify_side = corpus.select(id_col, vec_col)
    accepted_prior = try_read_parquet(spark, accepted_path)
    if accepted_prior is not None:
        verify_side = verify_side.unionByName(
            accepted_prior.select(id_col, vec_col)
        )
    if replayed_ids is not None:
        verify_side = verify_side.join(replayed_ids, id_col, "left_anti")
    verify_side = verify_side.dropDuplicates([id_col])
    # r16 (guide §2.4): the batch's band rows feed three consumers (the
    # index-prune key build, the candidate probe, the index append) —
    # one O(batch) staging replaces two extra 64-plane signature passes
    # and unlocks the flags' bucket-key semi-prune of the index.
    # Ledger-FIRST contract overlapped with the pure staging/probe jobs
    # exactly as in gate_batch (r16 session 3, guide §2.6): no store
    # mutates until both finish, so every crash point replays
    # bit-identically.
    staged: dict[str, DataFrame] = {}

    def _stage_and_probe() -> None:
        staged["bands"] = embedding_band_rows(
            batch_df, vec_col=vec_col, id_col=id_col
        ).localCheckpoint(eager=True)
        staged["flags"] = ingest_embedding_near_dup_flags(
            verify_side,
            batch_df,
            threshold=threshold,
            vec_col=vec_col,
            id_col=id_col,
            corpus_bands=bands,
            batch_bands=staged["bands"],
        ).localCheckpoint(eager=True)

    _concurrent(
        lambda: _ledger_append(batch_df.select(id_col), ledger, batch_id),
        _stage_and_probe,
    )
    batch_bands = staged["bands"]
    flags = staged["flags"]
    batch_cols = batch_df.withColumn("batch_id", F.lit(int(batch_id)))
    routed = batch_cols.join(
        flags.select(id_col, "best_cos", "is_near_dup"), id_col
    )
    accepted = routed.filter(~F.col("is_near_dup")).drop("is_near_dup")
    quarantined = routed.filter(F.col("is_near_dup")).drop("is_near_dup")

    # r16 (guide §2.6): same overlap as gate_batch — accepted chain
    # (sink append then its index rows) concurrent with the quarantine
    # append; ledger-first ordering already established above.
    def _accepted_chain():
        accepted.write.mode("append").partitionBy("batch_id").parquet(
            accepted_path
        )
        # index maintenance: the accepted vectors' band rows are a pure
        # per-vector function ALREADY staged above — filter, don't
        # recompute the 64-plane signatures (mirrors gate_batch).
        (
            batch_bands.join(accepted.select(id_col), id_col, "semi")
            .select("band_idx", "band_val", id_col)
            .write.mode("append")
            .partitionBy("band_idx")
            .parquet(index_path)
        )

    _concurrent(
        _accepted_chain,
        lambda: quarantined.write.mode("append")
        .partitionBy("batch_id")
        .parquet(quarantine_path),
    )


def stream_ingest_embedding_near_dup(
    vec_stream: DataFrame,
    corpus: DataFrame,
    index_path: str,
    accepted_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> StreamingQuery:
    """Gate an embedding stream against the corpus's persisted
    hyperplane-LSH index — the multimodal/embedding ingest twin of
    ``stream_ingest_near_dup``, same availableNow scheduled-ingest
    shape and the same per-batch O(batch + candidates) cost."""

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        gate_embedding_batch(
            batch_df,
            batch_id,
            corpus,
            index_path,
            accepted_path,
            quarantine_path,
            threshold=threshold,
            vec_col=vec_col,
            id_col=id_col,
        )

    return (
        vec_stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _takedown_sink(
    spark: SparkSession,
    sink_path: str,
    ids: DataFrame,
    id_col: str,
) -> int:
    """Remove ``ids`` from one batch_id-partitioned sink via
    PARTITION-SCOPED rewrite: a column-pruned (id, batch_id) scan finds
    the partitions that actually hold target ids, only those partitions
    are read in full, anti-joined and dynamically overwritten — the
    rest of the sink is untouched bytes. Returns the number of rows
    removed."""
    sink = try_read_parquet(spark, sink_path)
    if sink is None:
        return 0
    # hit partitions stay a DataFrame (VERDICT r10 #7): an isin over a
    # collected literal list grew with the number of touched batches;
    # a broadcast semi-join keeps partition location distributed and
    # lets dynamic partition pruning skip the untouched bytes
    hit = (
        sink.select(id_col, "batch_id")
        .join(ids, id_col, "semi")
        .select("batch_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    if hit.isEmpty():
        return 0
    affected = sink.join(F.broadcast(hit), "batch_id", "semi")
    kept = affected.join(ids, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    removed = affected.count() - kept.count()
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(sink_path)
    )
    # dynamic overwrite only touches partitions PRESENT in the written
    # frame — a partition whose every row was taken down has nothing to
    # write and would silently keep its old files (the purged rows!);
    # delete those directories explicitly. The only collect here is the
    # emptied-partition list, which delete_paths needs driver-side
    # anyway and is bounded by the takedown's own blast radius.
    emptied = [
        r[0]
        for r in hit.join(
            kept.select("batch_id").distinct(), "batch_id", "left_anti"
        ).collect()
    ]
    if emptied:
        from nosql_to_sql_migration_tool_spark.hadoop_fs import delete_paths

        delete_paths(
            spark,
            [
                f"{sink_path.rstrip('/')}/batch_id={b}"
                for b in emptied
            ],
        )
    return removed


def takedown_docs(
    spark: SparkSession,
    ids: DataFrame,
    accepted_path: str,
    quarantine_path: str,
    index_path: str,
    id_col: str = "doc_id",
    purge_ledger: bool = False,
) -> dict[str, int]:
    """Right-to-be-forgotten sweep over the ingest family's persisted
    state: every CONTENT row for the given ids is removed from the
    accepted sink, the quarantine sink and the LSH index (works for the
    text band index and the embedding hyperplane index alike — the
    rewrite keys only on ``id_col``). Returns removed-row counts per
    store.

    Scale shape: sinks are batch_id-partitioned, so content removal is
    a partition-scoped rewrite — one pruned (id, batch_id) scan to
    locate hit partitions, then only those partitions rewrite
    (``_takedown_sink``). The index holds no content (band hashes +
    ids) but has no per-id partitioning, so it compacts via one full
    anti-join rewrite — it is the smallest store by far (no text
    payload). Crash-safe by idempotence: a crash mid-sweep leaves some
    partitions rewritten and some not; re-running the same takedown
    completes it (every step is a pure anti-join of the target ids).

    The replay LEDGER by default KEEPS the ids' (id, batch_id) rows AND
    gains TOMBSTONES at the reserved ``batch_id = -2``: the retained
    row alone drops redeliveries under a NEW batch_id, but an
    at-least-once REPLAY of the original batch (its checkpoint never
    committed) would classify the purged id as a true replay and write
    its content straight back — the tombstone closes that hole, because
    the gate's foreign-id drop (``_replay_partition``: any prior row
    under a DIFFERENT batch_id ⇒ drop from the batch) sees ``-2`` on
    every delivery, including the same-batch replay. Tombstones are
    written FIRST, before any content mutation, so a crash mid-sweep
    already blocks re-ingestion and a re-run completes the sweep.
    ``compact_ingest_ledger`` may later fold ``-2`` into the compacted
    ``-1`` set — equivalent semantics (known id ⇒ drop). Note the
    RTBF consequence: a tombstoned id is never ingestible again, even
    if it was never ingested before the takedown.

    A deployment whose policy forbids retaining even the bare ids
    passes ``purge_ledger=True`` — the ledger rows are removed too
    (reported under ``'ledger'``) and NO tombstones are written; the
    documented trade is accepted: a later redelivery of a purged id
    re-enters the gate as a fresh document.

    Takedown-FIRST on a pre-ledger legacy deployment (ADVICE r11
    medium): before any tombstone or content mutation, an absent
    ledger is bootstrapped from the sinks via the same
    ``_bootstrap_ledger`` path the gate uses — otherwise the tombstone
    write would CREATE the ledger, the gate's ledger-absent branch
    (the only place legacy sinks migrate and legacy ids enter the
    ledger) would never fire, later redeliveries of never-ledgered
    legacy ids would re-ingest, and ``_takedown_sink``'s
    partition-scoped dynamic overwrite would leave purged rows in the
    old root-level files while adding partition dirs."""
    ids = ids.select(id_col).distinct().localCheckpoint(eager=True)
    ledger = _ledger_path(accepted_path)
    if try_read_parquet(spark, ledger) is None:
        _bootstrap_ledger(
            spark, (accepted_path, quarantine_path), id_col, ledger
        )
    if not purge_ledger:
        tombs = ids.withColumn("batch_id", F.lit(-2))
        ledger_rows = try_read_parquet(spark, ledger)
        if ledger_rows is not None:
            prior = ledger_rows.filter(F.col("batch_id") == -2).select(
                id_col, "batch_id"
            )
            tombs = tombs.unionByName(prior).distinct().localCheckpoint(
                eager=True
            )
        (
            tombs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(ledger)
        )
    # r16 (guide §2.6): the four sweeps touch four disjoint stores and
    # each is an idempotent pure anti-join of the same checkpointed id
    # frame — no cross-store ordering exists to preserve (the docstring
    # crash contract is "re-run completes it", which holds per store),
    # so they run as concurrent Spark jobs; tombstones above stay
    # strictly FIRST. Equivalence vs the sequential form is pinned by
    # tests/test_replay_equivalence.py.
    out = {"accepted": 0, "quarantine": 0, "index": 0}

    def _index_sweep():
        index = try_read_parquet(spark, index_path)
        if index is None:
            return
        kept = index.join(ids, id_col, "left_anti").localCheckpoint(
            eager=True
        )
        out["index"] = index.count() - kept.count()
        if out["index"]:
            # preserve the band_idx-partitioned layout (ADVICE r10
            # high): build_*/update_*_index all write
            # partitionBy('band_idx'); an unpartitioned rewrite here
            # left a mixed layout, so the NEXT gated batch's index
            # append produced conflicting directory structures and
            # broke the stream. Static overwrite replaces every
            # partition, so fully-emptied bands vanish without an
            # explicit directory delete.
            (
                kept.write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy("band_idx")
                .parquet(index_path)
            )

    def _sweep(store: str, path: str):
        out[store] = _takedown_sink(spark, path, ids, id_col)

    sweeps = [
        lambda: _sweep("accepted", accepted_path),
        lambda: _sweep("quarantine", quarantine_path),
        _index_sweep,
    ]
    if purge_ledger:
        sweeps.append(lambda: _sweep("ledger", ledger))
    _concurrent(*sweeps)
    return out


def _id_fingerprint(col: str):
    """60-bit integer fold of md5(id-as-string) — the ``md5canon``
    export convention (``sources/export.py``), reused so the audit's
    order-free ``bit_xor`` membership checksum replays bit-identically
    in DuckDB (``CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1,
    15)) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def takedown_audit(
    spark: SparkSession,
    ids: DataFrame,
    accepted_path: str,
    quarantine_path: str,
    index_path: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """READ-ONLY post-takedown audit (VERDICT r10 next #6): recompute
    the invariants a completed ``takedown_docs`` sweep must leave in
    the persisted ingest state — the reference's validation trio
    (count, membership, checksum;
    ``private/Migration_Validation.ps1:365-418``) applied to the
    right-to-be-forgotten contract. One ``(invariant, n)`` row each:

    * ``accepted_purged_present`` / ``quarantine_purged_present`` /
      ``index_purged_present`` — rows for purged ids still in a content
      store (must be 0);
    * ``accepted_missing_from_index`` — accepted docs with no index
      band rows (must be 0: every accepted doc stays probe-able);
    * ``ledger_purged_retained`` — purged ids still in the replay
      ledger (must be ALL of them: redeliveries stay excluded);
    * ``content_docs`` / ``content_ids_xor`` — distinct-doc count and
      order-free md5-fold checksum over accepted ∪ quarantine, pinning
      that the sweep removed EXACTLY the purged ids and nothing else.

    Every check is a semi/anti-join + tiny aggregate over the
    persisted stores (no content scan beyond the pruned id/partition
    columns); a store that does not exist (e.g. a quarantine that
    never received a row) audits as empty."""
    ids = ids.select(id_col).distinct()

    def _read(path: str, *cols: str) -> DataFrame | None:
        df = try_read_parquet(spark, path)
        return None if df is None else df.select(*cols)

    def _row(name: str, df: DataFrame | None, agg=None) -> DataFrame:
        if df is None:
            return spark.range(1).select(
                F.lit(name).alias("invariant"),
                F.lit(0).cast("long").alias("n"),
            )
        agg = agg if agg is not None else F.count(F.lit(1)).cast("long")
        return df.agg(agg.alias("n")).select(
            F.lit(name).alias("invariant"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )

    accepted = _read(accepted_path, id_col)
    quarantine = _read(quarantine_path, id_col)
    index = _read(index_path, id_col)
    ledger = _read(_ledger_path(accepted_path), id_col)

    def _semi(df: DataFrame | None) -> DataFrame | None:
        return None if df is None else df.join(ids, id_col, "semi")

    content = None
    for part in (accepted, quarantine):
        if part is not None:
            content = part if content is None else content.unionByName(part)
    content_ids = None if content is None else content.distinct()
    missing = (
        None
        if accepted is None
        else accepted.distinct().join(
            index if index is not None else accepted.limit(0),
            id_col,
            "left_anti",
        )
    )
    ledger_retained = (
        None
        if ledger is None
        else ledger.select(id_col).distinct().join(ids, id_col, "semi")
    )
    checks = [
        _row("accepted_purged_present", _semi(accepted)),
        _row("quarantine_purged_present", _semi(quarantine)),
        _row("index_purged_present", _semi(index)),
        _row("accepted_missing_from_index", missing),
        _row("ledger_purged_retained", ledger_retained),
        _row("content_docs", content_ids),
        _row(
            "content_ids_xor",
            content_ids,
            agg=F.bit_xor(_id_fingerprint(id_col)),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def takedown_audit_sql(
    batch_pred: str, purged_pred: str, id_expr: str = "doc_id"
) -> str:
    """DuckDB twin of ``takedown_audit`` for a gated-ingest deployment
    whose batch membership and purge set are expressible as predicates
    over the source ``documents`` table: the content stores must hold
    EXACTLY (batch minus purged) — verdict-independent, because
    accepted ∪ quarantine partitions the gated batch — the index must
    cover every accepted doc and no purged one, and the ledger retains
    the purge set."""
    fp = (
        f"CAST(concat('0x', substr(md5(CAST({id_expr} AS VARCHAR)), 1, 15))"
        " AS BIGINT)"
    )
    return f"""
WITH batch AS (SELECT {id_expr} AS id FROM documents WHERE {batch_pred}),
purged AS (SELECT {id_expr} AS id FROM documents WHERE {purged_pred}),
content AS (SELECT id FROM batch WHERE id NOT IN (SELECT id FROM purged))
SELECT 'accepted_purged_present' AS invariant, CAST(0 AS BIGINT) AS n
UNION ALL
SELECT 'quarantine_purged_present', CAST(0 AS BIGINT)
UNION ALL
SELECT 'index_purged_present', CAST(0 AS BIGINT)
UNION ALL
SELECT 'accepted_missing_from_index', CAST(0 AS BIGINT)
UNION ALL
SELECT 'ledger_purged_retained', (SELECT CAST(count(*) AS BIGINT) FROM purged)
UNION ALL
SELECT 'content_docs', (SELECT CAST(count(*) AS BIGINT) FROM content)
UNION ALL
SELECT 'content_ids_xor',
       (SELECT CAST(coalesce(bit_xor({fp.replace(id_expr, 'id')}), 0)
               AS BIGINT) FROM content)
"""


def _compact_store(
    spark: SparkSession, path: str, partition_col: str
) -> dict[str, int]:
    """Shared compaction body: distinct over ALL columns, static
    partition-preserving overwrite. Returns before/after row counts
    ({'before': 0, 'after': 0} when the store does not exist)."""
    rows = try_read_parquet(spark, path)
    if rows is None:
        return {"before": 0, "after": 0}
    before = rows.count()
    deduped = rows.distinct().localCheckpoint(eager=True)
    after = deduped.count()
    if after < before:
        (
            deduped.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy(partition_col)
            .parquet(path)
        )
    return {"before": before, "after": after}


def compact_ingest_index(
    spark: SparkSession, index_path: str
) -> dict[str, int]:
    """Fold replay-appended duplicate rows out of a persisted LSH index
    (text band index or embedding hyperplane index alike — both are
    band_idx-partitioned): an at-least-once replay re-appends the
    batch's bucket rows bit-identically, so readers dedupe at probe
    time (``ingest_near_dup_flags``) — correct, but the file set grows
    with every replay. One distinct + static rewrite restores the
    minimal index; same operating rule as ``compact_ingest_ledger`` /
    the CMS-store compaction: run it with no stream attached (or after
    the last batch's checkpoint committed). Returns before/after row
    counts."""
    return _compact_store(spark, index_path, "band_idx")


def compact_ingest_sinks(
    spark: SparkSession, accepted_path: str, quarantine_path: str
) -> dict[str, dict[str, int]]:
    """The sink twin of ``compact_ingest_index``: a replayed batch
    re-appends its accepted/quarantined rows BIT-IDENTICALLY (the
    replay contract pins identical verdicts and scores), so duplicates
    are exact and one distinct per sink removes them. Partition-scoped
    readers see the same rows before and after; only the bytes shrink.
    Same no-attached-stream operating rule. Returns before/after
    counts per sink."""
    return {
        "accepted": _compact_store(spark, accepted_path, "batch_id"),
        "quarantine": _compact_store(spark, quarantine_path, "batch_id"),
    }
