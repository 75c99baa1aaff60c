"""Replay-equivalence proof harness (VERDICT r15 next #1).

Round 16 restructures the ingest gate / takedown chain for per-batch
latency. The replay contract (ledger-first ordering, true-replay vs
cross-batch-redelivery classification, tombstones, partition-scoped
sweeps) is correctness-critical and crash-ordering-sensitive, so the
restructure is gated on THIS harness: the same randomized sequence of
gated batches, injected at-least-once replays, cross-batch
redeliveries and a mid-sequence right-to-be-forgotten sweep is driven
through the FROZEN r15 state machine (``tests/_reference_ingest_r15``)
and the LIVE one, and every persisted store (accepted sink, quarantine
sink, LSH index, replay ledger) must come out ROW-IDENTICAL, along
with the takedown's removed-row accounting.

Both implementations call the same (separately pinned) similarity
operators; what this file proves is that the restructured STATE
MACHINE writes exactly the state the r15 one did, from every crash
point the scenario injects.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests._reference_ingest_r15 import (
    gate_batch as ref_gate_batch,
    takedown_docs as ref_takedown_docs,
)
from nosql_to_sql_migration_tool_spark.streaming.ingest_stream import (
    gate_batch as live_gate_batch,
    takedown_docs as live_takedown_docs,
)
from nosql_to_sql_migration_tool_spark.operators.dedup import (
    build_band_index,
)
from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet
from nosql_to_sql_migration_tool_spark.queries import load_table

from tests.conftest import SF_DIR_SMOKE


def _store_rows(spark, path):
    """Every row of a persisted store as a sorted tuple set (partition
    columns included — batch routing is part of the contract)."""
    df = try_read_parquet(spark, path)
    if df is None:
        return None
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _run_scenario(spark, base, gate, takedown, docs, corpus, script):
    """Replay one scripted operation sequence against one implementation
    rooted at ``base``; returns the takedown accounting dicts."""
    idx = base + "/index"
    acc = base + "/accepted"
    qua = base + "/quarantine"
    build_band_index(corpus, idx)
    out = []
    for op in script:
        if op[0] == "gate":
            _, batch_id, batch_df = op
            gate(batch_df, batch_id, corpus, idx, acc, qua)
        else:  # ("takedown", ids_df)
            out.append(takedown(spark, op[1], acc, qua, idx))
    return out


@pytest.mark.parametrize("seed", [0xA5A5, 0x5EED])
def test_randomized_batch_sequence_state_equivalence(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 250)
    pool = docs.filter(F.col("doc_id") >= 250).localCheckpoint(eager=True)
    pool_ids = [r[0] for r in pool.select("doc_id").collect()]
    rng.shuffle(pool_ids)
    n_batches = 3
    slices = [pool_ids[i::n_batches] for i in range(n_batches)]

    # Build the scripted op sequence ONCE (same frames for both sides):
    # each batch carries fresh docs, planted near-copies of corpus docs,
    # and (from batch 1 on) a cross-batch redelivery of earlier ids; a
    # random batch is replayed (same batch_id, twice); one takedown of a
    # random victim set lands mid-sequence.
    script = []
    seen_ids: list[int] = []
    replay_at = rng.randrange(n_batches)
    takedown_after = rng.randrange(n_batches)
    for b in range(n_batches):
        ids = slices[b]
        batch = pool.filter(F.col("doc_id").isin(ids))
        planted_src = rng.sample(range(0, 250), 4)
        planted = corpus.filter(F.col("doc_id").isin(planted_src)).select(
            (F.col("doc_id") + 10_000 * (b + 1)).alias("doc_id"),
            F.concat("text", F.lit(" tail")).alias("text"),
        )
        batch = batch.unionByName(planted)
        if seen_ids:
            redelivered = rng.sample(seen_ids, min(5, len(seen_ids)))
            batch = batch.unionByName(
                pool.filter(F.col("doc_id").isin(redelivered))
            )
        batch = batch.localCheckpoint(eager=True)
        script.append(("gate", b, batch))
        if b == replay_at:  # crash-window replay: same frame, same id
            script.append(("gate", b, batch))
        seen_ids.extend(ids)
        if b == takedown_after:
            victims = rng.sample(seen_ids, min(8, len(seen_ids)))
            vdf = (
                spark.createDataFrame(
                    [(int(v),) for v in victims], "doc_id long"
                ).localCheckpoint(eager=True)
            )
            script.append(("takedown", vdf))

    ref_base = str(tmp_path / "ref")
    live_base = str(tmp_path / "live")
    ref_out = _run_scenario(
        spark, ref_base, ref_gate_batch, ref_takedown_docs, docs, corpus,
        script,
    )
    live_out = _run_scenario(
        spark, live_base, live_gate_batch, live_takedown_docs, docs,
        corpus, script,
    )
    assert live_out == ref_out  # takedown removed-row accounting
    for store in (
        "/accepted",
        "/quarantine",
        "/index",
        "/accepted.__ledger",
    ):
        ref_rows = _store_rows(spark, ref_base + store)
        live_rows = _store_rows(spark, live_base + store)
        assert live_rows == ref_rows, f"{store} diverged (seed {seed:x})"
