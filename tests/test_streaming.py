"""Structured-Streaming integration: the availableNow CDC sync processes
two snapshot drops (initial load, then a changed snapshot) against a
parquet target + persisted state, and a streaming windowed aggregate
matches its batch twin exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import changed_customer_source
from nosql_to_sql_migration_tool_spark.operators.windows import (
    tumbling_window_agg,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from nosql_to_sql_migration_tool_spark.streaming import (
    read_snapshot_stream,
    stream_sync,
    stream_window_counts,
)
from tests.conftest import SF_DIR_SMOKE


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _rollup_events(spark, n_hours: int = 48):
    """Events with ts compressed onto ``n_hours`` distinct hours. The
    rollup tests exercise merge/replay/compaction SEMANTICS, not
    calendar spread — sf0.001's natural 531 distinct hours made every
    dynamic-partition overwrite write ~531 directories, and the three
    replay tests alone cost ~10 min of suite wall time (VERDICT r7
    next #8: suite under ~15 min cold). Row count, event types and
    additive measures are unchanged; only the hour fan-out shrinks."""
    return (
        load_table(spark, SF_DIR_SMOKE, "events")
        .select("event_id", "user_id", "event_type", "value")
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(789_000_000)
                + (F.col("event_id") % n_hours) * 3600
                + (F.col("event_id") % 59) * 13
            ),
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def test_stream_sync_two_snapshot_rounds(spark, tmp_path):
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    source_dir = str(tmp_path / "drops")
    paths = {
        "state": str(tmp_path / "state"),
        "target": str(tmp_path / "target"),
        "ckpt": str(tmp_path / "ckpt"),
    }

    def run_round():
        stream = read_snapshot_stream(spark, source_dir, customer.schema)
        q = stream_sync(
            stream,
            "c_custkey",
            paths["state"],
            paths["target"],
            "c_nationkey",
            paths["ckpt"],
        )
        q.awaitTermination(120)

    # round 1: initial snapshot -> full load
    customer.coalesce(1).write.mode("append").parquet(source_dir)
    run_round()
    target = spark.read.parquet(paths["target"]).select(*customer.columns)
    assert _same_rows(target, customer)

    # round 2: changed snapshot dropped -> diff applied via state
    changed = changed_customer_source(customer)
    changed.coalesce(1).write.mode("append").parquet(source_dir)
    run_round()
    target = spark.read.parquet(paths["target"]).select(*customer.columns)
    assert _same_rows(target, changed)

    # persisted state reflects the latest snapshot (no DELETED keys)
    state = spark.read.parquet(paths["state"])
    assert state.count() == changed.count()


def test_stateful_user_profiles_across_restarts(spark, tmp_path):
    from nosql_to_sql_migration_tool_spark.streaming.stateful import (
        start_user_profiles,
    )

    events = load_table(spark, SF_DIR_SMOKE, "events")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    stream_dir = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "profiles")

    # round 1: half the events
    first.coalesce(1).write.mode("append").parquet(stream_dir)
    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    start_user_profiles(stream, ckpt, out).awaitTermination(120)

    # round 2: a NEW query resumes state from the checkpoint
    second.coalesce(1).write.mode("append").parquet(stream_dir)
    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    start_user_profiles(stream, ckpt, out).awaitTermination(120)

    # latest state per user must equal the full-batch ground truth
    latest = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("last_ts").alias("last_ts"),
        )
    )
    truth = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    assert latest.exceptAll(truth).isEmpty()
    assert truth.exceptAll(latest).isEmpty()


def test_stream_window_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMOKE, "events")
    stream_dir = str(tmp_path / "events_stream")
    events.coalesce(2).write.parquet(stream_dir)

    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    q = stream_window_counts(
        stream, str(tmp_path / "wckpt"), query_name="win_counts"
    )
    q.awaitTermination(120)

    streamed = spark.sql("SELECT * FROM win_counts")
    batch = tumbling_window_agg(events)
    assert _same_rows(streamed, batch)


def test_stream_dedup_drops_replayed_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a replayed (at-least-once) event
    batch must come out exactly once."""
    from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
        stream_dedup,
    )

    events = load_table(spark, SF_DIR_SMOKE, "events").limit(200)
    stream_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # write the same events TWICE — simulated source replay
    events.write.mode("overwrite").parquet(stream_dir)
    events.write.mode("append").parquet(stream_dir)

    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    deduped = stream_dedup(stream, ["event_id"], "ts")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()


def test_stream_enrich_joins_static_dim(spark, tmp_path):
    from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
        stream_enrich,
    )

    events = load_table(spark, SF_DIR_SMOKE, "events").limit(100)
    dim = (
        events.select("user_id").distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("string"))
    )
    stream_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events.write.parquet(stream_dir)
    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    q = (
        stream_enrich(stream, dim, "user_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 100
    assert out.filter(F.col("tier").isNull()).count() == 0


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream attribution join == the same join run
    in batch over the identical inputs."""
    from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
        stream_stream_attribution_join,
    )

    events = load_table(spark, SF_DIR_SMOKE, "events")
    views = events.where(F.col("event_type") == "view")
    purchases = events.where(F.col("event_type") == "purchase")
    v_dir, p_dir = str(tmp_path / "views"), str(tmp_path / "purch")
    views.coalesce(2).write.parquet(v_dir)
    purchases.coalesce(2).write.parquet(p_dir)

    v_stream = spark.readStream.schema(events.schema).parquet(v_dir)
    p_stream = spark.readStream.schema(events.schema).parquet(p_dir)
    joined = stream_stream_attribution_join(v_stream, p_stream)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = stream_stream_attribution_join(
        spark.read.parquet(v_dir), spark.read.parquet(p_dir)
    )
    streamed = spark.read.parquet(out_dir)
    assert streamed.count() > 0
    assert _same_rows(streamed, batch)


def test_stream_session_window_matches_batch(spark, tmp_path):
    """Streaming session windows (stateful merge) == batch
    session_window_agg over the same events."""
    from nosql_to_sql_migration_tool_spark.operators.windows import (
        session_window_agg,
    )
    from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
        stream_session_counts,
    )

    events = load_table(spark, SF_DIR_SMOKE, "events")
    stream_dir = str(tmp_path / "events_stream")
    events.coalesce(2).write.parquet(stream_dir)

    stream = spark.readStream.schema(events.schema).parquet(stream_dir)
    q = stream_session_counts(
        stream, str(tmp_path / "sckpt"), query_name="sess_counts"
    )
    q.awaitTermination(120)

    streamed = spark.sql("SELECT * FROM sess_counts")
    batch = session_window_agg(events)
    assert streamed.count() > 0
    assert _same_rows(streamed, batch)


def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """Append-mode windowed agg across two availableNow runs sharing a
    checkpoint: the second batch's too-late event (hours behind the
    watermark) must NOT reopen or change its already-finalized window."""
    from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
        stream_window_append,
    )

    stream_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    # batch 1: two events in hour 0, then events through hour 6 so the
    # 2h watermark passes hour 0's window end
    batch1 = [(i, t0 + dt.timedelta(hours=h), 1, "view", 1.0)
              for i, h in enumerate([0, 0, 3, 4, 5, 6])]
    mk(batch1).write.mode("overwrite").parquet(stream_dir)
    stream = spark.readStream.schema(mk(batch1).schema).parquet(stream_dir)
    q = stream_window_append(stream, out_dir, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(out_dir)
    hour0 = [r for r in first.collect() if r["window_start"].hour == 0]
    assert len(hour0) == 1 and hour0[0]["n"] == 2

    # batch 2: one event back in hour 0 — beyond the watermark, dropped
    mk([(100, t0, 1, "view", 1.0)]).write.mode("append").parquet(stream_dir)
    stream2 = spark.readStream.schema(mk(batch1).schema).parquet(stream_dir)
    q2 = stream_window_append(stream2, out_dir, ckpt)
    q2.awaitTermination(120)

    after = spark.read.parquet(out_dir)
    hour0_after = [
        r for r in after.collect() if r["window_start"].hour == 0
    ]
    # still exactly one finalized hour-0 window with the original count
    assert len(hour0_after) == 1 and hour0_after[0]["n"] == 2


def test_stream_clean_corpus_matches_batch(spark, tmp_path):
    """The scrub pass is stateless — streaming it over the noisy corpus
    must produce exactly the batch operator's rows."""
    from nosql_to_sql_migration_tool_spark.fixtures import noisy_documents
    from nosql_to_sql_migration_tool_spark.operators.cleaning import (
        with_clean_text,
    )
    from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
        stream_clean_corpus,
    )

    docs = noisy_documents(
        load_table(spark, SF_DIR_SMOKE, "documents")
    ).limit(200)
    stream_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.write.mode("overwrite").parquet(stream_dir)

    stream = spark.readStream.schema(docs.schema).parquet(stream_dir)
    q = (
        stream_clean_corpus(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _same_rows(spark.read.parquet(out_dir), with_clean_text(docs))


def test_stream_mixture_ingest_matches_batch(spark, tmp_path):
    """Mixture sampling at ingest is stateless given the offline rate
    table: streaming the corpus through it must keep exactly the batch
    operator's rows."""
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        domain_mixture_rates,
        domain_mixture_sample,
    )
    from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
        stream_mixture_ingest,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "lang"
    )
    rates = domain_mixture_rates(
        load_table(spark, SF_DIR_SMOKE, "documents"), "lang", 0.8
    )
    stream_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.write.mode("overwrite").parquet(stream_dir)

    stream = spark.readStream.schema(docs.schema).parquet(stream_dir)
    q = (
        stream_mixture_ingest(stream, rates)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = domain_mixture_sample(
        load_table(spark, SF_DIR_SMOKE, "documents"), "lang",
        budget_frac=0.8,
    )
    assert _same_rows(spark.read.parquet(out_dir), batch)


def test_stream_hourly_rollup_matches_batch_and_resumes(spark, tmp_path):
    """Continuous aggregate: three event drops (the third overlapping
    hours already rolled up) processed across two availableNow runs
    against one checkpoint must yield EXACTLY the batch tumbling
    aggregate of all events — additive merge, partition-scoped rewrite,
    no double counting on resume."""
    from nosql_to_sql_migration_tool_spark.streaming.rollup import (
        read_rollup,
        stream_hourly_rollup,
    )

    events = _rollup_events(spark).localCheckpoint(eager=True)
    stream_dir = str(tmp_path / "drops")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    part1 = events.filter(F.col("event_id") % 3 == 0)
    part2 = events.filter(F.col("event_id") % 3 == 1)
    part3 = events.filter(F.col("event_id") % 3 == 2)  # same hours again

    def run():
        stream = spark.readStream.schema(events.schema).parquet(stream_dir)
        q = stream_hourly_rollup(stream, rollup, ckpt)
        q.awaitTermination(180)

    part1.coalesce(1).write.mode("append").parquet(stream_dir)
    part2.coalesce(1).write.mode("append").parquet(stream_dir)
    run()
    part3.coalesce(1).write.mode("append").parquet(stream_dir)
    run()  # resume from checkpoint: parts 1-2 must not re-count

    got = read_rollup(spark, rollup).select(
        "window_start", "event_type", "n", "total"
    )
    want = tumbling_window_agg(events)
    assert _same_rows(got, want)
    # spot-check a derived measure is consistent with the additive ones
    r = read_rollup(spark, rollup).filter(F.col("n") > 0).first()
    assert abs(r["avg_value"] - round(r["total"] / r["n"], 6)) < 1e-9


def test_rollup_merge_replayed_batch_is_idempotent(spark, tmp_path):
    """ADVICE r5 (high): a micro-batch replayed after its rollup
    overwrite committed but before the streaming checkpoint committed
    must NOT double-count. Simulate the crash window by calling
    merge_rollup_batch twice with the same batch_id/data (exactly what
    foreachBatch replay delivers) — the table must be unchanged, and a
    genuinely NEW batch over the same hours must still merge
    additively."""
    from nosql_to_sql_migration_tool_spark.streaming.rollup import (
        compact_partials,
        merge_rollup_batch,
        read_rollup,
    )

    events = _rollup_events(spark).localCheckpoint(eager=True)
    rollup = str(tmp_path / "rollup")
    b1 = events.filter(F.col("event_id") % 2 == 0)
    b2 = events.filter(F.col("event_id") % 2 == 1)  # same hours

    merge_rollup_batch(spark, b1, rollup, batch_id=0)
    once = read_rollup(spark, rollup).toPandas()
    merge_rollup_batch(spark, b1, rollup, batch_id=0)  # replay crash window
    twice = read_rollup(spark, rollup)
    assert _same_rows(twice, spark.createDataFrame(once))

    merge_rollup_batch(spark, b2, rollup, batch_id=1)
    merge_rollup_batch(spark, b2, rollup, batch_id=1)  # replay again
    got = read_rollup(spark, rollup).select(
        "window_start", "event_type", "n", "total"
    )
    want = tumbling_window_agg(events)
    assert _same_rows(got, want)

    # Maintenance compaction folds per-batch partials without changing
    # any result, and a post-compaction late batch still merges.
    compact_partials(spark, rollup)
    assert _same_rows(
        read_rollup(spark, rollup).select(
            "window_start", "event_type", "n", "total"
        ),
        want,
    )


def test_compaction_preserves_uncommitted_batch_for_replay(spark, tmp_path):
    """ADVICE r6 (medium): compaction run in the crash window — after a
    batch's partials landed but BEFORE its streaming checkpoint commit —
    must not fold that batch into the ``batch_id=-1`` row, or its replay
    re-adds a contribution the fold already absorbed. With
    ``max_safe_batch_id``, the unsafe batch's partials survive compaction
    verbatim, so the replay overwrites its own partition (idempotent) and
    the hour never double-counts."""
    from nosql_to_sql_migration_tool_spark.streaming.rollup import (
        compact_partials,
        merge_rollup_batch,
        read_rollup,
    )

    events = _rollup_events(spark).localCheckpoint(eager=True)
    rollup = str(tmp_path / "rollup")
    b1 = events.filter(F.col("event_id") % 3 == 0)
    b2 = events.filter(F.col("event_id") % 3 == 1)
    b3 = events.filter(F.col("event_id") % 3 == 2)
    want = tumbling_window_agg(b1.unionByName(b2).unionByName(b3))

    merge_rollup_batch(spark, b1, rollup, batch_id=0)
    merge_rollup_batch(spark, b2, rollup, batch_id=1)
    # batch 2's partials land, checkpoint does NOT commit (crash window)
    merge_rollup_batch(spark, b3, rollup, batch_id=2)
    # maintenance compaction during downtime: only batches <= 1 are safe
    compact_partials(spark, rollup, max_safe_batch_id=1)
    partials = spark.read.parquet(rollup + "/.__partials")
    left = {r["batch_id"] for r in partials.select("batch_id").distinct().collect()}
    assert left == {-1, 2}, left
    # post-restart replay of the uncommitted batch (same id, same data)
    merge_rollup_batch(spark, b3, rollup, batch_id=2)
    got = read_rollup(spark, rollup).select(
        "window_start", "event_type", "n", "total"
    )
    assert _same_rows(got, want)
    # a second compaction once batch 2 IS committed folds everything
    compact_partials(spark, rollup, max_safe_batch_id=2)
    partials = spark.read.parquet(rollup + "/.__partials")
    left = {r["batch_id"] for r in partials.select("batch_id").distinct().collect()}
    assert left == {-1}, left
    assert _same_rows(
        read_rollup(spark, rollup).select(
            "window_start", "event_type", "n", "total"
        ),
        want,
    )


def test_last_committed_batch_id_reads_checkpoint(spark, tmp_path):
    """last_committed_batch_id reads the commits/ dir of a real
    Structured Streaming checkpoint and returns the max committed id."""
    from nosql_to_sql_migration_tool_spark.streaming.rollup import (
        last_committed_batch_id,
        stream_hourly_rollup,
    )

    assert last_committed_batch_id(spark, str(tmp_path / "absent")) is None
    src = str(tmp_path / "src")
    load_table(spark, SF_DIR_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).limit(50).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    )
    rollup, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    q = stream_hourly_rollup(stream, rollup, ckpt)
    q.awaitTermination(120)
    got = last_committed_batch_id(spark, ckpt)
    assert got is not None and got >= 0


def test_stream_constraint_metrics_per_batch(spark, tmp_path):
    """Continuous quality monitoring: each micro-batch's audit lands as
    metric rows tagged with its batch_id, and per-batch values equal
    the batch operator run directly on the same data."""
    from nosql_to_sql_migration_tool_spark.operators.quality import (
        bounds,
        constraint_report,
        not_null,
    )
    from nosql_to_sql_migration_tool_spark.streaming.quality_stream import (
        stream_constraint_metrics,
    )

    source_dir = str(tmp_path / "drops")
    metrics = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    checks = [not_null("k"), bounds("v", lo=0.0)]
    batch1 = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 3.0)], "k long, v double"
    )
    batch2 = spark.createDataFrame(
        [(4, 1.0), (5, 2.0)], "k long, v double"
    )

    def run_round():
        stream = spark.readStream.schema(batch1.schema).parquet(source_dir)
        q = stream_constraint_metrics(stream, checks, metrics, ckpt)
        q.awaitTermination(120)

    batch1.coalesce(1).write.mode("append").parquet(source_dir)
    run_round()
    batch2.coalesce(1).write.mode("append").parquet(source_dir)
    run_round()

    got = spark.read.parquet(metrics)
    assert got.count() == 4  # 2 checks x 2 batches
    by_batch = {
        (r["batch_id"], r["check_name"]): r for r in got.collect()
    }
    # batch ids are distinct across rounds (checkpointed epoch counter)
    batch_ids = sorted({b for b, _ in by_batch})
    assert len(batch_ids) == 2
    b1, b2 = batch_ids
    # per-batch streamed metrics == direct batch audit
    direct1 = {
        r["check_name"]: r for r in constraint_report(batch1, checks).collect()
    }
    assert by_batch[(b1, "not_null(k)")]["metric"] == direct1["not_null(k)"]["metric"]
    assert by_batch[(b1, "bounds(v,0.0<=x)")]["metric"] == direct1["bounds(v,0.0<=x)"]["metric"]
    assert not by_batch[(b1, "bounds(v,0.0<=x)")]["passed"]
    assert by_batch[(b2, "not_null(k)")]["metric"] == 1.0
    assert by_batch[(b2, "bounds(v,0.0<=x)")]["passed"]


def test_stream_ingest_near_dup_gates_and_maintains_index(spark, tmp_path):
    """Streaming twin of ingest_near_dup: batch 1's accepted docs enter
    the index, so batch 2's near-copies of THEM quarantine — proof the
    per-batch index append feeds the next batch's gate. Fresh docs
    accept; near-copies of the original corpus quarantine."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        stream_ingest_near_dup,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    fresh = docs.filter(F.col("doc_id") >= 300)
    idx = str(tmp_path / "index")
    build_band_index(corpus, idx)
    paths = dict(
        accepted=str(tmp_path / "accepted"),
        quarantine=str(tmp_path / "quarantine"),
        ckpt=str(tmp_path / "ckpt"),
        drops=str(tmp_path / "drops"),
    )

    def run():
        stream = spark.readStream.schema(docs.schema).parquet(paths["drops"])
        q = stream_ingest_near_dup(
            stream, corpus, idx, paths["accepted"],
            paths["quarantine"], paths["ckpt"],
        )
        q.awaitTermination(120)

    # batch 1: fresh docs + near-copies of CORPUS docs
    b1 = fresh.filter(F.col("doc_id") < 400).unionByName(
        corpus.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
    )
    b1.coalesce(1).write.mode("append").parquet(paths["drops"])
    run()
    acc1 = spark.read.parquet(paths["accepted"])
    qua1 = spark.read.parquet(paths["quarantine"])
    assert qua1.filter(F.col("doc_id") >= 10_000).count() == corpus.filter(
        F.col("doc_id") % 50 == 0
    ).count()
    assert acc1.filter(F.col("doc_id") >= 10_000).count() == 0
    n_acc1 = acc1.count()
    assert n_acc1 > 0

    # batch 2: near-copies of batch-1 ACCEPTED docs (not in the
    # original corpus) -> must quarantine via the UPDATED index,
    # plus genuinely fresh docs -> must accept
    b2 = fresh.filter(F.col("doc_id") >= 400).unionByName(
        acc1.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))
        .select(
            (F.col("doc_id") + 20_000).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
    )
    b2.coalesce(1).write.mode("append").parquet(paths["drops"])
    run()
    acc2 = spark.read.parquet(paths["accepted"])
    qua2 = spark.read.parquet(paths["quarantine"])
    n_copies = acc1.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 350)
    ).count()
    assert n_copies > 0
    assert qua2.filter(F.col("doc_id") >= 20_000).count() == n_copies
    assert acc2.filter(F.col("doc_id") >= 20_000).count() == 0
    assert acc2.count() > n_acc1  # fresh batch-2 docs accepted


def test_compaction_random_crash_points_never_change_results(spark, tmp_path):
    """Randomized crash-window property: for random batch splits, a
    compaction at ANY safe bound, followed by replay of every batch
    above the bound, must leave the rebuilt rollup equal to the batch
    ground truth — and a second full compaction must collapse the
    partials to the single -1 row without changing results."""
    import random

    from nosql_to_sql_migration_tool_spark.streaming.rollup import (
        compact_partials,
        merge_rollup_batch,
        read_rollup,
    )

    rng = random.Random(0xC0FFEE)
    events = _rollup_events(spark).localCheckpoint(eager=True)
    for trial in range(2):
        n_batches = rng.randint(2, 3)
        rollup = str(tmp_path / f"rollup{trial}")
        batches = [
            events.filter(F.col("event_id") % n_batches == i)
            for i in range(n_batches)
        ]
        want = tumbling_window_agg(events)
        for i, b in enumerate(batches):
            merge_rollup_batch(spark, b, rollup, batch_id=i)
        safe = rng.randint(-1, n_batches - 1)
        compact_partials(spark, rollup, max_safe_batch_id=safe)
        # replay everything above the safe bound (the crash window)
        for i in range(safe + 1, n_batches):
            merge_rollup_batch(spark, batches[i], rollup, batch_id=i)
        got = read_rollup(spark, rollup).select(
            "window_start", "event_type", "n", "total"
        )
        assert _same_rows(got, want), (trial, n_batches, safe)
        compact_partials(spark, rollup, max_safe_batch_id=n_batches - 1)
        partials = spark.read.parquet(rollup + "/.__partials")
        ids = {r["batch_id"] for r in partials.select("batch_id").distinct().collect()}
        assert ids == {-1}, (trial, ids)
        assert _same_rows(
            read_rollup(spark, rollup).select(
                "window_start", "event_type", "n", "total"
            ),
            want,
        )


def test_ingest_gate_replay_reproduces_verdicts(spark, tmp_path):
    """ADVICE r7 replay crash window: a crash AFTER the sink writes and
    the index append but BEFORE the checkpoint commit re-delivers the
    same batch. The replayed gate probes an index already holding the
    batch's own rows and reads its own text from accepted_path — the
    verdicts must still be bit-identical (no accepted doc re-routed to
    quarantine), and the next batch must gate correctly through the
    replay-duplicated index."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_batch,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    batch0 = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 360))
        .unionByName(
            corpus.filter(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 10_000).alias("doc_id"),
                F.concat("text", F.lit(" tail")).alias("text"),
            )
        )
        .localCheckpoint(eager=True)
    )

    def sink_ids(path):
        return {r["doc_id"] for r in spark.read.parquet(path).select("doc_id").distinct().collect()}

    gate_batch(batch0, 0, corpus, idx, acc, qua)
    acc1, qua1 = sink_ids(acc), sink_ids(qua)
    assert qua1 and acc1 and not (acc1 & qua1)
    # every planted near-copy quarantined, none accepted (fresh docs may
    # ALSO quarantine — the documents fixture carries natural near-dups)
    n_planted = batch0.filter(F.col("doc_id") >= 10_000).count()
    assert len({d for d in qua1 if d >= 10_000}) == n_planted
    assert not {d for d in acc1 if d >= 10_000}

    # the crash-window replay: same batch, same batch_id, dirty state
    gate_batch(batch0, 0, corpus, idx, acc, qua)
    assert sink_ids(acc) == acc1
    assert sink_ids(qua) == qua1
    assert not (sink_ids(acc) & sink_ids(qua))
    # a second replay (two crashes) must be just as stable
    gate_batch(batch0, 0, corpus, idx, acc, qua)
    assert sink_ids(acc) == acc1 and sink_ids(qua) == qua1

    # next batch through the replay-duplicated index: EXACT copies of
    # batch-0 ACCEPTED docs quarantine (their buckets are in the index,
    # three times over, and must still gate), fresh docs accept
    accepted_sample = sorted(d for d in acc1 if d < 10_000)[:20]
    batch1 = (
        docs.filter((F.col("doc_id") >= 360) & (F.col("doc_id") < 400))
        .unionByName(
            docs.filter(F.col("doc_id").isin(accepted_sample)).select(
                (F.col("doc_id") + 20_000).alias("doc_id"), "text"
            )
        )
        .localCheckpoint(eager=True)
    )
    gate_batch(batch1, 1, corpus, idx, acc, qua)
    qua2 = sink_ids(qua)
    acc2 = sink_ids(acc)
    assert len({d for d in qua2 if d >= 20_000}) == len(accepted_sample)
    assert not {d for d in acc2 if d >= 20_000}
    assert len(acc2) > len(acc1)  # some fresh batch-1 docs accepted


def test_ingest_gate_cross_batch_redelivery_is_idempotent(spark, tmp_path):
    """ADVICE r8: the replay exclusion is keyed by batch_id. A doc
    redelivered in a LATER batch under a DIFFERENT batch_id must not
    bypass the gate (the old all-ids anti-join double-accepted it and
    appended duplicate index rows) — it is already ingested, so the
    redelivery is dropped and every sink/index keeps exactly one row
    set for it, while genuinely fresh docs in the same batch still
    gate normally."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_batch,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    batch0 = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 340)
    ).localCheckpoint(eager=True)
    gate_batch(batch0, 0, corpus, idx, acc, qua)
    acc_df = spark.read.parquet(acc)
    qua_rows0 = spark.read.parquet(qua).count()
    acc_rows0 = acc_df.count()
    index_rows0 = spark.read.parquet(idx).count()
    assert acc_rows0 > 0

    # redeliver the SAME docs under a NEW batch_id, mixed with fresh ones
    fresh = docs.filter((F.col("doc_id") >= 340) & (F.col("doc_id") < 360))
    batch1 = batch0.unionByName(fresh).localCheckpoint(eager=True)
    gate_batch(batch1, 1, corpus, idx, acc, qua)

    acc_after = spark.read.parquet(acc)
    # no doc_id appears under two batch_ids in either sink
    dup_acc = (
        acc_after.groupBy("doc_id")
        .agg(F.countDistinct("batch_id").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup_acc == 0, "redelivered doc double-accepted"
    qua_after = spark.read.parquet(qua)
    dup_qua = (
        qua_after.groupBy("doc_id")
        .agg(F.countDistinct("batch_id").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup_qua == 0
    # index holds ONE row set per accepted doc (no duplicate band rows)
    index_after = spark.read.parquet(idx)
    assert (
        index_after.groupBy("doc_id", "band_idx").count().filter(
            F.col("count") > 1
        ).count()
        == 0
    )
    # fresh docs were still gated: every batch-1 fresh id landed in
    # exactly one sink
    sunk1 = {
        r["doc_id"]
        for r in acc_after.unionByName(qua_after)
        .filter(F.col("batch_id") == 1)
        .select("doc_id")
        .collect()
    }
    fresh_ids = {r["doc_id"] for r in fresh.select("doc_id").collect()}
    assert sunk1 == fresh_ids
    # and batch-0 verdicts are untouched
    assert acc_after.filter(F.col("batch_id") == 0).count() == acc_rows0
    assert qua_after.filter(F.col("batch_id") == 0).count() == qua_rows0
    assert index_rows0 <= spark.read.parquet(idx).count()


def test_ingest_ledger_compaction_and_bootstrap(spark, tmp_path):
    """ADVICE r9: the replay gate probes the compact (id, batch_id)
    ledger, not the full sinks. Three contracts: (1) compaction folds
    committed batches to the reserved batch_id=-1 set and a post-fold
    cross-batch redelivery is STILL dropped (−1 classifies as 'different
    batch_id ⇒ already ingested'); (2) the crash-window gate preserves
    unsafe batches; (3) a pre-ledger deployment (sinks exist, no ledger)
    bootstraps the ledger from the sinks once and classifies
    correctly."""
    import shutil

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        _ledger_path,
        compact_ingest_ledger,
        gate_batch,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    batch0 = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 330)
    ).localCheckpoint(eager=True)
    batch1 = docs.filter(
        (F.col("doc_id") >= 330) & (F.col("doc_id") < 360)
    ).localCheckpoint(eager=True)
    gate_batch(batch0, 0, corpus, idx, acc, qua)
    gate_batch(batch1, 1, corpus, idx, acc, qua)

    ledger = _ledger_path(acc)
    ids_before = {
        r["doc_id"]
        for r in spark.read.parquet(ledger).select("doc_id").collect()
    }
    assert ids_before == {
        r["doc_id"] for r in batch0.unionByName(batch1).select("doc_id").collect()
    }

    # (2) gated fold: batch 1 not yet committed -> its partition survives
    compact_ingest_ledger(spark, acc, max_safe_batch_id=0)
    led = spark.read.parquet(ledger)
    assert set(
        r["batch_id"] for r in led.select("batch_id").distinct().collect()
    ) == {-1, 1}

    # (1) full fold, then cross-batch redelivery of folded ids is dropped
    compact_ingest_ledger(spark, acc)
    led = spark.read.parquet(ledger)
    assert set(
        r["batch_id"] for r in led.select("batch_id").distinct().collect()
    ) == {-1}
    assert {r["doc_id"] for r in led.select("doc_id").collect()} == ids_before

    sink_rows = spark.read.parquet(acc).count() + spark.read.parquet(qua).count()
    gate_batch(batch0, 2, corpus, idx, acc, qua)  # pure redelivery
    assert (
        spark.read.parquet(acc).count() + spark.read.parquet(qua).count()
        == sink_rows
    )

    # (3) bootstrap: wipe the ledger; the next gate derives it from the
    # sinks and still drops the redelivery
    shutil.rmtree(ledger)
    fresh = docs.filter(
        (F.col("doc_id") >= 360) & (F.col("doc_id") < 380)
    ).localCheckpoint(eager=True)
    gate_batch(batch0.unionByName(fresh), 3, corpus, idx, acc, qua)
    led = spark.read.parquet(ledger)
    # redelivered batch-0 ids carry their ORIGINAL batch ids in the
    # bootstrapped ledger; only the fresh docs were ingested under 3
    sunk3 = {
        r["doc_id"]
        for r in led.filter(F.col("batch_id") == 3).select("doc_id").collect()
    }
    assert sunk3 == {r["doc_id"] for r in fresh.select("doc_id").collect()}
    # no doc appears in both sinks or under two batch_ids
    both = spark.read.parquet(acc).select("doc_id").intersect(
        spark.read.parquet(qua).select("doc_id")
    )
    assert both.count() == 0


def test_stream_ingest_embedding_gate_and_replay(spark, tmp_path):
    """Embedding twin of the text gate (VERDICT r7 next #5): batch 1's
    accepted vectors enter the hyperplane-LSH index, so batch 2's exact
    copies of THEM quarantine — the per-batch index append feeds the
    next batch's gate. Then the replay contract: re-delivering batch 2
    against the dirty post-crash state reproduces its verdicts."""
    from nosql_to_sql_migration_tool_spark.operators.similarity import (
        build_embedding_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_embedding_batch,
        stream_ingest_embedding_near_dup,
    )

    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 3 != 0)
    fresh = emb.filter(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "emb_index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")
    drops = str(tmp_path / "drops")
    build_embedding_index(corpus, idx)

    def run():
        stream = spark.readStream.schema(emb.schema).parquet(drops)
        q = stream_ingest_embedding_near_dup(
            stream, corpus, idx, acc, qua, ckpt
        )
        q.awaitTermination(120)

    def sink_ids(path):
        return {r["vec_id"] for r in spark.read.parquet(path).select("vec_id").distinct().collect()}

    # batch 1: fresh vectors + exact copies of CORPUS vectors
    b1 = fresh.filter(F.col("vec_id") % 2 == 0).unionByName(
        corpus.filter(F.col("vec_id") % 40 == 1).select(
            (F.col("vec_id") + 500_000).alias("vec_id"), "embedding"
        )
    )
    b1.coalesce(1).write.mode("append").parquet(drops)
    run()
    acc1, qua1 = sink_ids(acc), sink_ids(qua)
    n_planted = corpus.filter(F.col("vec_id") % 40 == 1).count()
    assert n_planted > 0
    assert len({v for v in qua1 if v >= 500_000}) == n_planted
    assert not {v for v in acc1 if v >= 500_000}
    assert acc1

    # batch 2: copies of batch-1 ACCEPTED vectors -> quarantine via the
    # UPDATED index; remaining fresh vectors -> accept
    some_accepted = sorted(v for v in acc1 if v < 500_000)[:20]
    b2 = fresh.filter(F.col("vec_id") % 2 == 1).unionByName(
        emb.filter(F.col("vec_id").isin(some_accepted)).select(
            (F.col("vec_id") + 600_000).alias("vec_id"), "embedding"
        )
    ).localCheckpoint(eager=True)
    b2.coalesce(1).write.mode("append").parquet(drops)
    run()
    acc2, qua2 = sink_ids(acc), sink_ids(qua)
    assert len({v for v in qua2 if v >= 600_000}) == len(some_accepted)
    assert not {v for v in acc2 if v >= 600_000}
    assert len(acc2) > len(acc1)

    # replay crash window: re-deliver batch 2 against the dirty state
    gate_embedding_batch(b2, 1, corpus, idx, acc, qua)
    assert sink_ids(acc) == acc2
    assert sink_ids(qua) == qua2
    assert not (sink_ids(acc) & sink_ids(qua))


def test_cms_partials_stream_equals_batch_and_survives_replay(spark, tmp_path):
    """Mergeable-CMS maintenance contract (VERDICT r8 next #3), mirroring
    gate_batch's: (1) a streamed, batch-split sketch merges to EXACTLY
    the one-shot whole-corpus sketch (cellwise additivity); (2) an
    at-least-once replay of a batch is a no-op (partition overwrite);
    (3) compaction under the crash-window gate folds only safe batches,
    preserves unsafe ones, and never changes the merged sketch."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        cms_counts,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import tokens
    from nosql_to_sql_migration_tool_spark.streaming.cms_stream import (
        compact_cms_partials,
        merge_cms_batch,
        read_cms,
        stream_cms_maintenance,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).localCheckpoint(eager=True)
    want = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in cms_counts(toks.select("token")).collect()
    }

    def merged(path):
        return {
            (r["row_idx"], r["bucket"]): r["cnt"]
            for r in read_cms(spark, path).collect()
        }

    # (1) true streaming path: 3 parquet drops -> availableNow stream
    drops = str(tmp_path / "drops")
    store = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        toks.filter(F.col("doc_id") % 3 == i).select("token").coalesce(
            1
        ).write.mode("append").parquet(drops)
        stream = spark.readStream.schema("token string").parquet(drops)
        q = stream_cms_maintenance(stream, store, ckpt)
        q.awaitTermination(120)
    assert merged(store) == want

    # (2) replay: re-fold an arbitrary batch under its original batch_id
    b1 = toks.filter(F.col("doc_id") % 3 == 1).select("token")
    merge_cms_batch(b1, store, batch_id=1)
    merge_cms_batch(b1, store, batch_id=1)
    assert merged(store) == want

    # (3) gated compaction: batch 2 above the safe bound is preserved
    compact_cms_partials(spark, store, max_safe_batch_id=1)
    parts = spark.read.parquet(store)
    ids = {r["batch_id"] for r in parts.select("batch_id").distinct().collect()}
    assert ids == {-1, 2}, ids
    assert merged(store) == want
    # replay of the unsafe batch AFTER compaction is still a no-op
    b2 = toks.filter(F.col("doc_id") % 3 == 2).select("token")
    merge_cms_batch(b2, store, batch_id=2)
    assert merged(store) == want
    # final full fold collapses to the single -1 set, sketch unchanged
    compact_cms_partials(spark, store, max_safe_batch_id=2)
    parts = spark.read.parquet(store)
    ids = {r["batch_id"] for r in parts.select("batch_id").distinct().collect()}
    assert ids == {-1}, ids
    assert merged(store) == want
    # store is bounded at depth*width rows after the fold
    assert parts.count() <= 4 * 512


def test_stream_drift_metrics_per_batch(spark, tmp_path):
    """Streaming drift monitor: per micro-batch one metrics row equal to
    the batch audit against the frozen baseline — numeric and
    categorical kinds, metrics table keyed by batch_id."""
    from nosql_to_sql_migration_tool_spark.operators.quality import (
        categorical_drift_vs_baseline,
        numeric_drift_vs_baseline,
        save_categorical_baseline,
        save_numeric_baseline,
    )
    from nosql_to_sql_migration_tool_spark.streaming.quality_stream import (
        stream_drift_metrics,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    split = F.to_timestamp(F.lit("1998-01-01"))
    ref = orders.filter(F.col("o_orderdate") < split)
    live = orders.filter(F.col("o_orderdate") >= split).localCheckpoint(
        eager=True
    )

    nbase = str(tmp_path / "nbase")
    save_numeric_baseline(ref, "o_totalprice", nbase)
    drops = str(tmp_path / "drops")
    live.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(drops)
    live.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(drops)
    q = stream_drift_metrics(
        spark.readStream.schema(live.schema).parquet(drops),
        "o_totalprice", nbase,
        str(tmp_path / "metrics"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    metrics = spark.read.parquet(str(tmp_path / "metrics"))
    rows = {r["batch_id"]: r for r in metrics.collect()}
    assert len(rows) >= 1
    # every metrics row equals the batch-local audit recomputed directly
    total_nb = sum(r["n_b"] for r in rows.values())
    assert total_nb == live.count()
    whole = numeric_drift_vs_baseline(live, "o_totalprice", nbase).collect()[0]
    if len(rows) == 1:
        only = next(iter(rows.values()))
        assert only["l1_distance"] == whole["l1_distance"]
        assert only["metric2"] == whole["ks_stat"]

    # categorical kind over events
    events = load_table(spark, SF_DIR_SMOKE, "events")
    esplit = F.to_timestamp(F.lit("2024-01-16"))
    cbase = str(tmp_path / "cbase")
    save_categorical_baseline(
        events.filter(F.col("ts") < esplit), "event_type", cbase
    )
    elive = events.filter(F.col("ts") >= esplit).localCheckpoint(eager=True)
    edrops = str(tmp_path / "edrops")
    elive.coalesce(1).write.mode("append").parquet(edrops)
    q2 = stream_drift_metrics(
        spark.readStream.schema(elive.schema).parquet(edrops),
        "event_type", cbase,
        str(tmp_path / "emetrics"), str(tmp_path / "eckpt"),
        kind="categorical",
    )
    q2.awaitTermination(120)
    em = spark.read.parquet(str(tmp_path / "emetrics")).collect()
    want = categorical_drift_vs_baseline(elive, "event_type", cbase).collect()[0]
    assert len(em) == 1
    assert em[0]["l1_distance"] == want["l1_distance"]
    assert em[0]["metric2"] == want["max_rate_gap"]


def test_stream_lc_maintenance_matches_one_shot(spark, tmp_path):
    """Streamed LC sketch == one-shot whole-corpus sketch bit-for-bit
    (set-union mergeability through the availableNow stream path)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        linear_count,
        read_lc,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import tokens
    from nosql_to_sql_migration_tool_spark.streaming.cms_stream import (
        stream_lc_maintenance,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).localCheckpoint(eager=True)
    want = linear_count(toks.select("token"), "token").collect()[0].asDict()

    drops = str(tmp_path / "drops")
    idx = str(tmp_path / "lc")
    ckpt = str(tmp_path / "ckpt")
    for i in range(2):
        toks.filter(F.col("doc_id") % 2 == i).select("token").coalesce(
            1
        ).write.mode("append").parquet(drops)
        q = stream_lc_maintenance(
            spark.readStream.schema("token string").parquet(drops), idx, ckpt
        )
        q.awaitTermination(120)
    assert read_lc(spark, idx).collect()[0].asDict() == want


def test_takedown_docs_partition_scoped_purge(spark, tmp_path):
    """Right-to-be-forgotten sweep (round 10): taken-down ids vanish
    from both sinks and the band index; unrelated docs and partitions
    are untouched; the replay ledger RETAINS the ids so a later
    redelivery is still dropped; the sweep is idempotent."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        _ledger_path,
        gate_batch,
        takedown_docs,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    batch0 = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 330)
    ).localCheckpoint(eager=True)
    batch1 = docs.filter(
        (F.col("doc_id") >= 330) & (F.col("doc_id") < 360)
    ).localCheckpoint(eager=True)
    gate_batch(batch0, 0, corpus, idx, acc, qua)
    gate_batch(batch1, 1, corpus, idx, acc, qua)

    accepted = spark.read.parquet(acc)
    # pick 2 accepted docs from batch 0 to take down
    targets = sorted(
        r["doc_id"]
        for r in accepted.filter(F.col("batch_id") == 0)
        .select("doc_id")
        .collect()
    )[:2]
    assert len(targets) == 2
    ids = spark.createDataFrame([(t,) for t in targets], ["doc_id"])

    before_acc = accepted.count()
    before_idx = spark.read.parquet(idx).count()
    removed = takedown_docs(spark, ids, acc, qua, idx)
    assert removed["accepted"] == 2
    assert removed["index"] > 0

    after_acc = spark.read.parquet(acc)
    assert after_acc.count() == before_acc - 2
    assert after_acc.filter(F.col("doc_id").isin(targets)).count() == 0
    assert (
        spark.read.parquet(idx)
        .filter(F.col("doc_id").isin(targets))
        .count()
        == 0
    )
    assert spark.read.parquet(idx).count() == before_idx - removed["index"]
    # batch 1's partition untouched row-for-row
    assert (
        after_acc.filter(F.col("batch_id") == 1).count()
        == accepted.filter(F.col("batch_id") == 1).count()
    )
    # ledger retains the ids -> redelivery under a new batch_id drops
    led = spark.read.parquet(_ledger_path(acc))
    assert (
        led.filter(F.col("doc_id").isin(targets))
        .select("doc_id")
        .distinct()
        .count()
        == 2
    )
    # plus the round-11 tombstones that keep even a same-batch replay
    # from resurrecting the purged content
    assert (
        led.filter(
            (F.col("batch_id") == -2) & F.col("doc_id").isin(targets)
        ).count()
        == 2
    )
    redeliver = docs.filter(F.col("doc_id").isin(targets)).localCheckpoint(
        eager=True
    )
    gate_batch(redeliver, 5, corpus, idx, acc, qua)
    assert (
        spark.read.parquet(acc).filter(F.col("doc_id").isin(targets)).count()
        == 0
    )
    # idempotent: re-running the sweep removes nothing further
    removed2 = takedown_docs(spark, ids, acc, qua, idx)
    assert removed2 == {"accepted": 0, "quarantine": 0, "index": 0}


def test_takedown_fully_emptied_partition_is_deleted(spark, tmp_path):
    """Regression: dynamic partition overwrite only touches partitions
    PRESENT in the written frame, so taking down EVERY doc of one batch
    previously left that partition's files (the purged rows!) on disk —
    the emptied directory must be deleted explicitly."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_batch,
        takedown_docs,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    batch0 = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 320)
    ).localCheckpoint(eager=True)
    batch1 = docs.filter(
        (F.col("doc_id") >= 320) & (F.col("doc_id") < 340)
    ).localCheckpoint(eager=True)
    gate_batch(batch0, 0, corpus, idx, acc, qua)
    gate_batch(batch1, 1, corpus, idx, acc, qua)

    # take down EVERYTHING batch 0 sank (accepted and quarantined)
    ids = batch0.select("doc_id")
    n_batch0 = (
        spark.read.parquet(acc).filter(F.col("batch_id") == 0).count()
        + spark.read.parquet(qua).filter(F.col("batch_id") == 0).count()
    )
    removed = takedown_docs(spark, ids, acc, qua, idx)
    assert removed["accepted"] + removed["quarantine"] == n_batch0

    import os

    assert not os.path.exists(os.path.join(acc, "batch_id=0"))
    acc_after = spark.read.parquet(acc)
    assert acc_after.filter(F.col("batch_id") == 0).count() == 0
    assert acc_after.join(ids, "doc_id", "semi").count() == 0
    # batch 1 intact
    assert acc_after.filter(F.col("batch_id") == 1).count() > 0


def test_takedown_docs_embedding_family(spark, tmp_path):
    """takedown_docs is id-keyed and format-agnostic — prove the claim
    on the EMBEDDING ingest family: purged vectors vanish from the
    accepted sink and the hyperplane-LSH index, other vectors and
    partitions untouched, and the sweep is idempotent."""
    from nosql_to_sql_migration_tool_spark.operators.similarity import (
        build_embedding_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_embedding_batch,
        takedown_docs,
    )

    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 3 != 0)
    fresh = emb.filter(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "emb_index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_embedding_index(corpus, idx)

    b0 = fresh.filter(F.col("vec_id") % 2 == 0).localCheckpoint(eager=True)
    b1 = fresh.filter(F.col("vec_id") % 2 == 1).localCheckpoint(eager=True)
    gate_embedding_batch(b0, 0, corpus, idx, acc, qua)
    gate_embedding_batch(b1, 1, corpus, idx, acc, qua)

    accepted = spark.read.parquet(acc)
    targets = sorted(
        r["vec_id"]
        for r in accepted.filter(F.col("batch_id") == 0)
        .select("vec_id")
        .collect()
    )[:3]
    assert len(targets) == 3
    ids = spark.createDataFrame([(t,) for t in targets], ["vec_id"])

    before_acc = accepted.count()
    removed = takedown_docs(spark, ids, acc, qua, idx, id_col="vec_id")
    assert removed["accepted"] == 3 and removed["index"] > 0

    after = spark.read.parquet(acc)
    assert after.count() == before_acc - 3
    assert after.filter(F.col("vec_id").isin(targets)).count() == 0
    assert (
        spark.read.parquet(idx)
        .filter(F.col("vec_id").isin(targets))
        .count()
        == 0
    )
    assert (
        after.filter(F.col("batch_id") == 1).count()
        == accepted.filter(F.col("batch_id") == 1).count()
    )
    assert takedown_docs(spark, ids, acc, qua, idx, id_col="vec_id") == {
        "accepted": 0,
        "quarantine": 0,
        "index": 0,
    }


def test_gate_batch_after_takedown_keeps_index_layout(spark, tmp_path):
    """ADVICE r10 (high): the takedown index rewrite must preserve the
    band_idx-partitioned layout — the old unpartitioned rewrite made
    the NEXT gated batch's partitionBy('band_idx') append produce a
    mixed layout that broke every later index read. Gate → takedown →
    gate again must work end-to-end."""
    import os

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_batch,
        takedown_docs,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    batch0 = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 330)
    ).localCheckpoint(eager=True)
    gate_batch(batch0, 0, corpus, idx, acc, qua)

    targets = sorted(
        r["doc_id"]
        for r in spark.read.parquet(acc).select("doc_id").collect()
    )[:2]
    ids = spark.createDataFrame([(t,) for t in targets], ["doc_id"])
    removed = takedown_docs(spark, ids, acc, qua, idx)
    assert removed["accepted"] == 2 and removed["index"] > 0

    # the rewritten index kept its hive layout: band_idx=N dirs, no
    # root-level data files
    entries = os.listdir(idx)
    assert any(e.startswith("band_idx=") for e in entries)
    assert not any(
        e.endswith(".parquet") and not e.startswith((".", "_"))
        for e in entries
    )

    # the stream keeps working: gate another batch against the
    # rewritten index, then read every store back
    batch1 = docs.filter(
        (F.col("doc_id") >= 330) & (F.col("doc_id") < 360)
    ).localCheckpoint(eager=True)
    gate_batch(batch1, 1, corpus, idx, acc, qua)
    idx_df = spark.read.parquet(idx)
    assert idx_df.join(ids, "doc_id", "semi").count() == 0
    assert idx_df.filter(F.col("band_idx").isNull()).count() == 0
    acc_df = spark.read.parquet(acc)
    assert acc_df.filter(F.col("batch_id") == 1).count() > 0
    assert acc_df.join(ids, "doc_id", "semi").count() == 0


def test_legacy_unpartitioned_sink_migrates_on_bootstrap(spark, tmp_path):
    """ADVICE r10 (medium): a pre-round-10 deployment wrote sinks
    unpartitioned (batch_id as a data column in root-level files); the
    first post-upgrade gate must migrate them to the
    batch_id-partitioned layout during the one-time ledger bootstrap,
    or its own append would create a mixed, unreadable layout."""
    import os

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        _ledger_path,
        gate_batch,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    # simulate the legacy deployment: batches 0 and 1 appended
    # UNPARTITIONED with batch_id as a plain column, and no ledger
    legacy0 = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 320)
    ).withColumn("batch_id", F.lit(0)).withColumn(
        "best_jaccard", F.lit(0.0)
    )
    legacy1 = docs.filter(
        (F.col("doc_id") >= 320) & (F.col("doc_id") < 340)
    ).withColumn("batch_id", F.lit(1)).withColumn(
        "best_jaccard", F.lit(0.0)
    )
    legacy0.write.mode("append").parquet(acc)
    legacy1.write.mode("append").parquet(acc)
    n_legacy = spark.read.parquet(acc).count()
    root_files = [
        e for e in os.listdir(acc)
        if e.endswith(".parquet") and not e.startswith((".", "_"))
    ]
    assert root_files, "fixture must start as a root-file layout"

    # first post-upgrade gate: bootstraps the ledger AND migrates
    batch2 = docs.filter(
        (F.col("doc_id") >= 340) & (F.col("doc_id") < 360)
    ).localCheckpoint(eager=True)
    gate_batch(batch2, 2, corpus, idx, acc, qua)

    entries = os.listdir(acc)
    assert any(e.startswith("batch_id=") for e in entries)
    assert not any(
        e.endswith(".parquet") and not e.startswith((".", "_"))
        for e in entries
    )
    migrated = spark.read.parquet(acc)
    # every legacy row survived the rewrite, new batch appended on top
    assert migrated.filter(F.col("batch_id") < 2).count() == n_legacy
    assert migrated.filter(F.col("batch_id") == 2).count() > 0
    # ledger bootstrapped from the legacy sinks: a redelivery of a
    # legacy id under a new batch_id is dropped, sinks stay readable
    redeliver = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 305)
    ).localCheckpoint(eager=True)
    gate_batch(redeliver, 3, corpus, idx, acc, qua)
    after = spark.read.parquet(acc)
    assert after.filter(F.col("batch_id") == 3).count() == 0
    assert after.count() == migrated.count()
    led = spark.read.parquet(_ledger_path(acc))
    assert led.filter(F.col("doc_id") == 300).count() == 1


def test_takedown_audit_invariants_and_oracle(spark, tmp_path):
    """READ-ONLY post-takedown audit (VERDICT r10 next #6): after a
    gate x2 + sweep, the invariant rows pin purged-id absence, index
    coverage, ledger retention and exact content membership — and the
    DuckDB twin recomputes the same rows from the source table alone.
    Also: a store that never materialized (here: quarantine under a
    threshold of 1.01 — nothing quarantines) audits as empty instead of
    erroring."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_batch,
        takedown_audit,
        takedown_audit_sql,
        takedown_docs,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    k = F.col("doc_id")
    corpus = docs.filter(k % 5 != 0)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)
    gate_batch(
        docs.filter(k % 10 == 0).localCheckpoint(eager=True),
        0, corpus, idx, acc, qua,
    )
    gate_batch(
        docs.filter(k % 10 == 5).localCheckpoint(eager=True),
        1, corpus, idx, acc, qua,
    )
    purged = docs.filter(k % 15 == 0).select("doc_id")
    takedown_docs(spark, purged, acc, qua, idx)

    got = {
        r["invariant"]: r["n"]
        for r in takedown_audit(spark, purged, acc, qua, idx).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/documents.parquet'"
    )
    want = dict(
        con.execute(
            takedown_audit_sql("doc_id % 5 = 0", "doc_id % 15 = 0")
        ).fetchall()
    )
    con.close()
    assert got == want
    assert got["accepted_purged_present"] == 0
    assert got["index_purged_present"] == 0
    assert got["accepted_missing_from_index"] == 0
    assert got["ledger_purged_retained"] > 0
    assert got["content_docs"] > 0

    # tamper detection: put one purged doc's band rows back and the
    # membership checks catch it
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        update_band_index,
    )

    one = docs.filter(k % 15 == 0).limit(1).localCheckpoint(eager=True)
    update_band_index(one, idx)
    tampered = {
        r["invariant"]: r["n"]
        for r in takedown_audit(spark, purged, acc, qua, idx).collect()
    }
    assert tampered["index_purged_present"] > 0

    # missing store audits as empty: a quarantine path that never
    # received a row (fresh deployment, nothing gated yet)
    empty_audit = {
        r["invariant"]: r["n"]
        for r in takedown_audit(
            spark,
            purged,
            acc,
            str(tmp_path / "never_written"),
            idx,
        ).collect()
    }
    assert empty_audit["quarantine_purged_present"] == 0


def test_compaction_folds_replay_duplicates(spark, tmp_path):
    """An at-least-once replay re-appends bit-identical sink and index
    rows (readers dedupe — correct but growing); compact_ingest_index /
    compact_ingest_sinks restore the minimal stores, and a later gated
    batch behaves identically against the compacted state."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        compact_ingest_index,
        compact_ingest_sinks,
        gate_batch,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)
    batch = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 330)
    ).localCheckpoint(eager=True)
    gate_batch(batch, 0, corpus, idx, acc, qua)
    acc_rows = spark.read.parquet(acc).count()
    idx_rows = spark.read.parquet(idx).count()
    # crash replay: same batch_id delivered again
    gate_batch(batch, 0, corpus, idx, acc, qua)
    assert spark.read.parquet(acc).count() > acc_rows  # duplicates exist
    assert spark.read.parquet(idx).count() > idx_rows

    sink_stats = compact_ingest_sinks(spark, acc, qua)
    idx_stats = compact_ingest_index(spark, idx)
    assert sink_stats["accepted"]["after"] == acc_rows
    assert sink_stats["accepted"]["before"] > acc_rows
    assert idx_stats["after"] == idx_rows and idx_stats["before"] > idx_rows
    after = spark.read.parquet(acc)
    assert after.count() == acc_rows
    assert after.select("doc_id").distinct().count() == acc_rows
    # idempotent
    assert compact_ingest_index(spark, idx) == {
        "before": idx_rows, "after": idx_rows
    }
    # the stream keeps working against the compacted state
    batch1 = docs.filter(
        (F.col("doc_id") >= 330) & (F.col("doc_id") < 360)
    ).localCheckpoint(eager=True)
    gate_batch(batch1, 1, corpus, idx, acc, qua)
    assert (
        spark.read.parquet(acc).filter(F.col("batch_id") == 1).count() > 0
    )
    # missing store compacts as a no-op
    assert compact_ingest_index(spark, str(tmp_path / "nope")) == {
        "before": 0, "after": 0
    }


def test_takedown_purge_ledger_policy(spark, tmp_path):
    """purge_ledger=True removes even the bare (id, batch_id) ledger
    rows — and the documented trade holds: a redelivery of the purged
    id re-enters the gate as a fresh doc instead of being dropped."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        _ledger_path,
        gate_batch,
        takedown_docs,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)
    batch = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 330)
    ).localCheckpoint(eager=True)
    gate_batch(batch, 0, corpus, idx, acc, qua)
    target = spark.read.parquet(acc).select("doc_id").orderBy("doc_id").limit(1)
    target_id = target.collect()[0][0]
    removed = takedown_docs(
        spark, target, acc, qua, idx, purge_ledger=True
    )
    assert removed["accepted"] == 1 and removed["ledger"] == 1
    led = spark.read.parquet(_ledger_path(acc))
    assert led.filter(F.col("doc_id") == target_id).count() == 0
    # redelivery under a new batch_id re-enters the gate (fresh doc)
    redeliver = docs.filter(F.col("doc_id") == target_id).localCheckpoint(
        eager=True
    )
    gate_batch(redeliver, 7, corpus, idx, acc, qua)
    back = (
        spark.read.parquet(acc).unionByName(spark.read.parquet(qua))
        .filter(F.col("doc_id") == target_id)
    )
    assert back.count() == 1 and back.collect()[0]["batch_id"] == 7


def test_takedown_audit_embedding_family(spark, tmp_path):
    """takedown_audit is id-keyed and store-agnostic — prove it on the
    EMBEDDING ingest family too: after gating + sweeping vectors, the
    same invariant rows hold (purged absence, index coverage, ledger
    retention, exact content membership)."""
    from nosql_to_sql_migration_tool_spark.operators.similarity import (
        build_embedding_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        gate_embedding_batch,
        takedown_audit,
        takedown_docs,
    )

    emb = spark.read.parquet(f"{SF_DIR_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    k = F.col("vec_id")
    corpus = emb.filter(k % 5 != 0)
    idx = str(tmp_path / "emb_index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_embedding_index(corpus, idx)
    gate_embedding_batch(
        emb.filter(k % 5 == 0).localCheckpoint(eager=True),
        0, corpus, idx, acc, qua,
    )
    purged = emb.filter(k % 15 == 0).select("vec_id")
    n_purged = purged.count()
    takedown_docs(spark, purged, acc, qua, idx, id_col="vec_id")

    got = {
        r["invariant"]: r["n"]
        for r in takedown_audit(
            spark, purged, acc, qua, idx, id_col="vec_id"
        ).collect()
    }
    n_batch = emb.filter(k % 5 == 0).count()
    assert got["accepted_purged_present"] == 0
    assert got["quarantine_purged_present"] == 0
    assert got["index_purged_present"] == 0
    assert got["accepted_missing_from_index"] == 0
    assert got["ledger_purged_retained"] == n_purged
    assert got["content_docs"] == n_batch - n_purged


def test_takedown_survives_same_batch_replay(spark, tmp_path):
    """The round-11 tombstone fix: an at-least-once REPLAY of the
    original batch (same batch_id — its checkpoint never committed)
    must NOT resurrect taken-down content. Before tombstones, the
    retained (id, batch_id) ledger row classified the purged id as a
    true replay and wrote its content straight back."""
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        compact_ingest_ledger,
        gate_batch,
        takedown_docs,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)
    batch = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 330)
    ).localCheckpoint(eager=True)
    gate_batch(batch, 0, corpus, idx, acc, qua)
    target = (
        spark.read.parquet(acc).select("doc_id").orderBy("doc_id").limit(1)
    )
    target_id = target.collect()[0][0]
    takedown_docs(spark, target, acc, qua, idx)

    # crash replay: the SAME batch_id redelivers the full batch
    gate_batch(batch, 0, corpus, idx, acc, qua)
    content = spark.read.parquet(acc).unionByName(spark.read.parquet(qua))
    assert content.filter(F.col("doc_id") == target_id).count() == 0
    assert (
        spark.read.parquet(idx).filter(F.col("doc_id") == target_id).count()
        == 0
    )
    # non-purged batch docs are still present exactly as before
    assert (
        content.select("doc_id").distinct().count()
        == batch.count() - 1
    )
    # a redelivery under a NEW batch_id stays excluded too
    redeliver = docs.filter(F.col("doc_id") == target_id).localCheckpoint(
        eager=True
    )
    gate_batch(redeliver, 9, corpus, idx, acc, qua)
    assert (
        spark.read.parquet(acc).filter(F.col("doc_id") == target_id).count()
        == 0
    )
    # tombstones survive ledger compaction semantically: folding to -1
    # still drops the id on the next delivery
    compact_ingest_ledger(spark, acc)
    gate_batch(redeliver, 11, corpus, idx, acc, qua)
    assert (
        spark.read.parquet(acc).filter(F.col("doc_id") == target_id).count()
        == 0
    )


def test_takedown_first_on_legacy_sink_bootstraps_and_purges(spark, tmp_path):
    """ADVICE r11 (medium): a takedown that arrives BEFORE any
    post-upgrade gate on a pre-ledger deployment must bootstrap the
    ledger from (and migrate) the legacy sinks first — otherwise the
    tombstone write creates the ledger, the gate's bootstrap branch
    never fires, legacy ids never enter the ledger (redeliveries
    re-ingest), and the partition-scoped purge misses rows living in
    root-level files."""
    import os

    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
    )
    from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
        _ledger_path,
        gate_batch,
        takedown_docs,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 300)
    idx = str(tmp_path / "index")
    acc = str(tmp_path / "accepted")
    qua = str(tmp_path / "quarantine")
    build_band_index(corpus, idx)

    # legacy deployment: one unpartitioned accepted sink, no ledger
    legacy = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 340)
    ).withColumn("batch_id", F.lit(0)).withColumn(
        "best_jaccard", F.lit(0.0)
    )
    legacy.write.mode("append").parquet(acc)
    assert any(
        e.endswith(".parquet") and not e.startswith((".", "_"))
        for e in os.listdir(acc)
    ), "fixture must start as a root-file layout"

    # takedown FIRST — before any post-upgrade gate ever ran
    ids = spark.createDataFrame([(300,), (301,)], ["doc_id"])
    removed = takedown_docs(spark, ids, acc, qua, idx)
    assert removed["accepted"] == 2

    # the sink migrated to the partitioned layout and the purge REALLY
    # removed the rows (no copies left behind in old root files)
    entries = os.listdir(acc)
    assert any(e.startswith("batch_id=") for e in entries)
    assert not any(
        e.endswith(".parquet") and not e.startswith((".", "_"))
        for e in entries
    )
    after = spark.read.parquet(acc)
    assert after.join(ids, "doc_id", "semi").count() == 0
    assert after.count() == 38

    # the ledger holds every legacy id + the tombstones, so BOTH a
    # purged id and an untouched legacy id redelivered later are dropped
    led = spark.read.parquet(_ledger_path(acc))
    assert led.filter(F.col("batch_id") == -2).count() == 2
    assert led.filter(
        (F.col("doc_id") == 305) & (F.col("batch_id") == 0)
    ).count() == 1
    redeliver = docs.filter(
        F.col("doc_id").isin(300, 305)
    ).localCheckpoint(eager=True)
    gate_batch(redeliver, 7, corpus, idx, acc, qua)
    final = spark.read.parquet(acc)
    assert final.filter(F.col("batch_id") == 7).count() == 0
    assert final.count() == 38


def test_stream_kmv_maintenance_matches_one_shot(spark, tmp_path):
    """Streamed KMV sketch == one-shot whole-corpus sketch bit-for-bit
    (bottom-k set mergeability through the availableNow stream path)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        kmv_distinct,
        read_kmv,
    )
    from nosql_to_sql_migration_tool_spark.streaming.cms_stream import (
        stream_kmv_maintenance,
    )

    orders = load_table(spark, SF_DIR_SMOKE, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("string").alias("token")
    )
    want = kmv_distinct(orders, "token").collect()[0].asDict()
    # read_kmv names the count column n_kept; the one-shot names it
    # n_union... align on values: (count, k, estimate)
    want_vals = tuple(want.values())

    drops = str(tmp_path / "drops")
    store = str(tmp_path / "kmv")
    ckpt = str(tmp_path / "ckpt")
    for i in range(2):
        orders.filter(F.col("o_orderkey") % 2 == i).select(
            "token"
        ).coalesce(1).write.mode("append").parquet(drops)
        q = stream_kmv_maintenance(
            spark.readStream.schema("token string").parquet(drops),
            store,
            ckpt,
        )
        q.awaitTermination(120)
    got = read_kmv(spark, store).collect()[0].asDict()
    assert tuple(got.values()) == want_vals


def test_stream_quantile_bins_maintenance_matches_one_shot(
    spark, tmp_path
):
    """Streamed fixed-bound quantile store == one-shot sketch over the
    whole stream bit-for-bit (additive-cell mergeability through the
    availableNow stream path)."""
    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        fixed_binned_quantiles,
        read_quantile_bins,
    )
    from nosql_to_sql_migration_tool_spark.streaming.cms_stream import (
        stream_quantile_bins_maintenance,
    )

    lo, hi, nb = 0.0, 600_000.0, 128
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    orders = load_table(spark, SF_DIR_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    want = sorted(
        map(
            tuple,
            fixed_binned_quantiles(
                orders, "o_totalprice", lo, hi, qs, nb
            ).collect(),
        )
    )

    drops = str(tmp_path / "drops")
    store = str(tmp_path / "qbins")
    ckpt = str(tmp_path / "ckpt")
    for i in range(2):
        orders.filter(F.col("o_orderkey") % 2 == i).select(
            "o_totalprice"
        ).coalesce(1).write.mode("append").parquet(drops)
        q = stream_quantile_bins_maintenance(
            spark.readStream.schema("o_totalprice double").parquet(drops),
            store,
            ckpt,
            "o_totalprice",
            lo,
            hi,
            n_bins=nb,
        )
        q.awaitTermination(120)
    got = sorted(
        map(
            tuple,
            read_quantile_bins(spark, store, lo, hi, qs, nb).collect(),
        )
    )
    assert got == want and len(got) == len(qs)


def test_stream_er_maintenance_matches_full_resolution(spark, tmp_path):
    """Streaming ER ingest: two dirty-entity batches folded through the
    availableNow twin leave (a) the label store equal to the full
    er_clusters recompute over reference ∪ both batches, and (b) a
    replayed batch a no-op on both stores (match overwrite idempotence
    + monotone label repair)."""
    from nosql_to_sql_migration_tool_spark.fixtures import messy_customers
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        er_clusters,
        er_matches,
        read_er_label_store,
        read_linkage_matches,
        write_er_label_store,
    )
    from nosql_to_sql_migration_tool_spark.streaming.er_stream import (
        fold_er_batch,
        stream_er_maintenance,
    )

    params = {
        "c_name": (0.95, 0.001),
        "c_acctbal": (0.9, 0.01),
        "c_mktsegment": (0.95, 0.2),
    }
    passes = [("c_nationkey", "c_name"), ("c_mktsegment", "c_acctbal")]
    thresh = 2_000_000
    m = messy_customers(
        load_table(spark, SF_DIR_SMOKE, "customer")
    ).localCheckpoint(eager=True)
    clean = m.filter(F.col("c_custkey") < 1_000_000)
    dirty = m.filter(F.col("c_custkey") >= 1_000_000)

    matches_p = str(tmp_path / "matches")
    labels_p = str(tmp_path / "labels")
    drops = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    write_er_label_store(
        clean.select("c_custkey", F.col("c_custkey").alias("entity_id")),
        labels_p,
        "c_custkey",
        n_buckets=16,
    )
    schema = ("c_custkey bigint, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string")
    for i in range(2):
        dirty.filter(F.col("c_custkey") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(drops)
        q = stream_er_maintenance(
            spark.readStream.schema(schema).parquet(drops),
            clean,
            matches_p,
            labels_p,
            passes,
            params,
            "c_custkey",
            thresh,
            ckpt,
            n_buckets=16,
        )
        q.awaitTermination(180)

    want = sorted(
        map(
            tuple,
            er_clusters(
                m, er_matches(m, passes, params, "c_custkey", thresh),
                "c_custkey",
            ).collect(),
        )
    )
    got = sorted(map(tuple, read_er_label_store(spark, labels_p).collect()))
    assert got == want and len(got) > 0

    before_matches = sorted(
        map(tuple, read_linkage_matches(spark, matches_p).collect())
    )
    # replay batch 0 directly through the fold unit — must be a no-op
    fold_er_batch(
        spark,
        clean,
        dirty.filter(F.col("c_custkey") % 2 == 0),
        matches_p,
        labels_p,
        passes,
        params,
        "c_custkey",
        thresh,
        0,
        n_buckets=16,
    )
    assert got == sorted(
        map(tuple, read_er_label_store(spark, labels_p).collect())
    )
    assert before_matches == sorted(
        map(tuple, read_linkage_matches(spark, matches_p).collect())
    )


def test_fold_er_batch_match_store_is_complete_and_deduped(
    spark, tmp_path
):
    """Review r15: the persisted match relation must agree with the
    labels — a batch-INTERNAL duplicate pair lands in the match store,
    and a pair matched by BOTH blocking passes is stored once (the
    multi-pass dedupe), so clusters rebuilt from read_linkage_matches
    equal the label store."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        er_clusters,
        read_er_label_store,
        read_linkage_matches,
        write_er_label_store,
    )
    from nosql_to_sql_migration_tool_spark.streaming.er_stream import (
        fold_er_batch,
    )

    params = {"name": (0.95, 0.001), "seg": (0.9, 0.2)}
    passes = [("blk", "name"), ("blk", "seg")]
    thresh = 2_000_000
    reference = spark.createDataFrame(
        [(1, 0, "alice", "A"), (2, 0, "bob", "B")],
        ["id", "blk", "name", "seg"],
    )
    # 10 matches reference 1 by BOTH passes (name+seg agree);
    # 20/21 duplicate EACH OTHER only (internal pair)
    batch = spark.createDataFrame(
        [
            (10, 0, "alice", "A"),
            (20, 0, "carol", "C"),
            (21, 0, "carol", "C"),
        ],
        ["id", "blk", "name", "seg"],
    )
    matches_p = str(tmp_path / "matches")
    labels_p = str(tmp_path / "labels")
    write_er_label_store(
        reference.select("id", F.col("id").alias("entity_id")),
        labels_p,
        "id",
        n_buckets=8,
    )
    fold_er_batch(
        spark, reference, batch, matches_p, labels_p,
        passes, params, "id", thresh, 0, n_buckets=8,
    )
    stored = sorted(
        (r["id_a"], r["id_b"])
        for r in read_linkage_matches(spark, matches_p).collect()
    )
    # complete: the internal pair is present; deduped: the two-pass
    # match appears exactly once
    assert stored == [(1, 10), (20, 21)]
    # consistency: clusters rebuilt from the match store == label store
    entities = reference.unionByName(batch).select("id")
    rebuilt = sorted(
        map(
            tuple,
            er_clusters(
                entities,
                read_linkage_matches(spark, matches_p).select(
                    "id_a", "id_b"
                ),
                "id",
            ).collect(),
        )
    )
    assert rebuilt == sorted(
        map(tuple, read_er_label_store(spark, labels_p).collect())
    )
