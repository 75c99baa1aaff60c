"""Persisted inverted index / incremental BM25 (round 12): indexed
retrieval == corpus-scan retrieval, replay idempotence, compaction
equivalence, and partition pruning to the query terms' buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.inverted import (
    bm25_topk_indexed,
    compact_inverted_index,
    read_index_stats,
    update_inverted_index,
)
from nosql_to_sql_migration_tool_spark.operators.text import bm25_topk
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE

_TERMS = ("hash", "join", "spark", "window")


def _docs(spark):
    return load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )


def test_indexed_bm25_equals_corpus_scan(spark, tmp_path):
    """Two ingest batches -> the store answers EXACTLY like the one-shot
    corpus scan (same idf pin, same integer micros, same ties)."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    update_inverted_index(docs.filter(F.col("doc_id") % 2 == 0), path, 0)
    update_inverted_index(docs.filter(F.col("doc_id") % 2 == 1), path, 1)

    want = [tuple(r) for r in bm25_topk(docs, _TERMS, k=25).collect()]
    got = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    assert got == want
    stats = read_index_stats(spark, path).collect()[0]
    assert stats["n_docs"] == docs.count()


def test_index_replay_idempotent(spark, tmp_path):
    """Re-delivering batch 1 (at-least-once replay) rewrites its own
    partitions with identical rows — queries unchanged, no duplicate
    postings, stats not double-counted."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    update_inverted_index(b0, path, 0)
    update_inverted_index(b1, path, 1)
    before = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    update_inverted_index(b1, path, 1)  # replay
    after = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    assert after == before
    assert read_index_stats(spark, path).collect()[0]["n_docs"] == (
        docs.count()
    )


def test_index_compaction_preserves_results(spark, tmp_path):
    """Folding committed batches into batch_id=-1 changes layout, never
    answers; a second compaction is a no-op pile-up-wise (one folded
    stats row set, not one per compaction); an uncommitted batch above
    max_safe_batch_id survives unfolded."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    for b in range(3):
        update_inverted_index(docs.filter(F.col("doc_id") % 3 == b), path, b)
    want = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    compact_inverted_index(spark, path, max_safe_batch_id=1)
    mid = spark.read.parquet(str(tmp_path / "idx/postings"))
    assert set(
        r["batch_id"] for r in mid.select("batch_id").distinct().collect()
    ) == {-1, 2}
    assert [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ] == want
    compact_inverted_index(spark, path)
    post = spark.read.parquet(str(tmp_path / "idx/postings"))
    assert set(
        r["batch_id"] for r in post.select("batch_id").distinct().collect()
    ) == {-1}
    assert [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ] == want
    stats = spark.read.parquet(str(tmp_path / "idx/stats"))
    assert stats.count() == 1  # folds merge, never pile up


def test_indexed_query_prunes_to_term_buckets(spark, tmp_path):
    """The scale contract: the postings scan carries a partition filter
    on bucket (so only the query terms' directories are read), and the
    plan has no Python stage / cartesian product."""
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        python_stage_count,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    update_inverted_index(docs, path, 0)
    df = bm25_topk_indexed(spark, path, _TERMS, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert python_stage_count(df) == 0
    assert cartesian_products(df) == 0
    # and the pruned read really returns only the probed terms
    got = {r["term"] for r in spark.read.parquet(
        str(tmp_path / "idx/postings")
    ).where(F.col("term").isin(*_TERMS)).select("term").distinct().collect()}
    assert got <= set(_TERMS)


def test_phrase_match_indexed_equals_scan(spark, tmp_path):
    """Candidate pruning via the postings store never loses a match
    (every phrase doc contains each word) and never adds one (the
    positional verify is exact) — bit-equal to the corpus-scan
    operator, including repeated-word phrases."""
    from nosql_to_sql_migration_tool_spark.operators.inverted import (
        phrase_match_indexed,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import (
        phrase_match,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    update_inverted_index(docs.filter(F.col("doc_id") % 2 == 0), path, 0)
    update_inverted_index(docs.filter(F.col("doc_id") % 2 == 1), path, 1)
    for phrase in ("hash join", "the the", "table part"):
        want = sorted(
            map(tuple, phrase_match(docs, phrase).collect())
        )
        got = sorted(
            map(
                tuple,
                phrase_match_indexed(spark, path, docs, phrase).collect(),
            )
        )
        assert got == want, phrase


def test_cross_batch_reingest_raises(spark, tmp_path):
    """The append contract (VERDICT/ADVICE r12): a doc_id may live in
    at most one batch. Same-batch replay stays idempotent; a cross-batch
    re-ingest raises BEFORE any write (tf/df can never inflate), the
    guard survives compaction (ledger folds to batch_id=-1), and the
    reserved batch_id=-1 is rejected as input."""
    import pytest

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    update_inverted_index(even, path, 0)
    update_inverted_index(even, path, 0)  # replay: no clash, idempotent
    base = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=10).collect()
    ]

    with pytest.raises(ValueError, match="one batch per doc_id"):
        update_inverted_index(even, path, 1)  # same docs, NEW batch
    after = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=10).collect()
    ]
    assert after == base  # the rejected append wrote nothing

    update_inverted_index(odd, path, 1)
    compact_inverted_index(spark, path)
    with pytest.raises(ValueError, match="one batch per doc_id"):
        update_inverted_index(odd.limit(3), path, 2)  # folded docs guard
    with pytest.raises(ValueError, match="batch_id must be >= 0"):
        update_inverted_index(odd, path, -1)
    # the explicit opt-out for upstream-gated pipelines still works
    update_inverted_index(
        odd.limit(0), path, 3, enforce_unique_docs=False
    )


def test_takedown_from_inverted_index(spark, tmp_path):
    """RTBF removal from the retrieval store: after the sweep the
    indexed BM25 equals the corpus scan over SURVIVORS exactly (idf/
    avgdl shift with the removed mass), stats are recomputed from the
    post-image, a re-run is a no-op, the freed ids may re-ingest under
    a new batch, and the sweep works on the compacted batch_id=-1
    partition too."""
    from nosql_to_sql_migration_tool_spark.operators.inverted import (
        takedown_from_inverted_index,
    )
    from nosql_to_sql_migration_tool_spark.operators.text import tokens

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    update_inverted_index(docs.filter(F.col("doc_id") % 2 == 0), path, 0)
    update_inverted_index(docs.filter(F.col("doc_id") % 2 == 1), path, 1)

    victims = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id")
    n_victims = victims.count()
    out = takedown_from_inverted_index(spark, path, victims)
    assert out["docs_removed"] == n_victims > 0
    assert out["postings_removed"] > 0

    survivors = docs.join(victims, "doc_id", "anti")
    want = [tuple(r) for r in bm25_topk(survivors, _TERMS, k=25).collect()]
    got = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    assert got == want

    st = read_index_stats(spark, path).collect()[0]
    assert st["n_docs"] == survivors.count()
    want_tokens = survivors.select(
        F.sum(F.size(tokens(F.col("text")))).alias("t")
    ).collect()[0]["t"]
    assert st["total_tokens"] == want_tokens

    # idempotent: the same sweep again removes nothing, changes nothing
    again = takedown_from_inverted_index(spark, path, victims)
    assert again == {"docs_removed": 0, "postings_removed": 0}
    got2 = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    assert got2 == want

    # the ledger rows are gone, so a corrected re-ingest under a NEW
    # batch is legal again — and restores corpus-scan equality
    update_inverted_index(
        docs.join(victims, "doc_id", "semi"), path, 2
    )
    full = [tuple(r) for r in bm25_topk(docs, _TERMS, k=25).collect()]
    got3 = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    assert got3 == full

    # compaction then takedown: the sweep rewrites the -1 partition
    compact_inverted_index(spark, path)
    out4 = takedown_from_inverted_index(spark, path, victims)
    assert out4["docs_removed"] == n_victims
    got4 = [
        tuple(r)
        for r in bm25_topk_indexed(spark, path, _TERMS, k=25).collect()
    ]
    assert got4 == want

    # r14: the disk-staged post-image (the bounded-memory fix the 1000x
    # broad-takedown probe forced — localCheckpoint of O(hit partitions)
    # rows blew executor memory) is cleaned up after every sweep
    import os

    assert not os.path.exists(str(tmp_path / "idx" / "postings.__takedown_stage"))
