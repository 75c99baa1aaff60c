"""Small-files compaction: data-preserving, file-count-reducing,
idempotent, and abort-safe."""

from __future__ import annotations

import pytest

from nosql_to_sql_migration_tool_spark.hadoop_fs import list_files
from nosql_to_sql_migration_tool_spark.sources.maintenance import (
    compact_parquet,
    plan_output_files,
)


def _write_fragmented(spark, path: str, n_files: int = 40, n_rows: int = 2000):
    df = spark.range(n_rows).selectExpr(
        "id", "cast(id % 7 as string) AS grp", "id * 1.5 AS val"
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    _write_fragmented(spark, path, n_files=40)
    before = list_files(spark, path, suffix=".parquet")
    assert len(before) == 40
    total = sum(s for _, s in before)

    stats = compact_parquet(spark, path, target_bytes=total)  # -> 1 file
    assert stats.compacted
    assert stats.files_before == 40
    assert stats.files_after == 1
    assert stats.rows == 2000

    out = spark.read.parquet(path)
    assert out.count() == 2000
    assert sorted(r["id"] for r in out.select("id").collect()) == list(
        range(2000)
    )
    # schema survives the round trip
    assert set(out.columns) == {"id", "grp", "val"}


def test_compaction_is_idempotent_noop_on_healthy_table(spark, tmp_path):
    path = str(tmp_path / "frag2")
    _write_fragmented(spark, path, n_files=30)
    total = sum(s for _, s in list_files(spark, path, suffix=".parquet"))
    first = compact_parquet(spark, path, target_bytes=total)
    assert first.compacted
    second = compact_parquet(spark, path, target_bytes=total)
    assert not second.compacted
    assert second.files_before == second.files_after == first.files_after
    assert spark.read.parquet(path).count() == 2000


def test_compaction_respects_min_gain(spark, tmp_path):
    path = str(tmp_path / "small")
    _write_fragmented(spark, path, n_files=3)
    total = sum(s for _, s in list_files(spark, path, suffix=".parquet"))
    # 3 -> 1 files saves 2 files; min_gain=3 must refuse to churn
    stats = compact_parquet(spark, path, target_bytes=total, min_gain=3)
    assert not stats.compacted
    assert len(list_files(spark, path, suffix=".parquet")) == 3


def test_plan_output_files_ceiling():
    assert plan_output_files(0, 128) == 1
    assert plan_output_files(1, 128) == 1
    assert plan_output_files(128, 128) == 1
    assert plan_output_files(129, 128) == 2
    assert plan_output_files(1280, 128) == 10


def test_compaction_targets_multiple_output_files(spark, tmp_path):
    path = str(tmp_path / "frag3")
    _write_fragmented(spark, path, n_files=40)
    total = sum(s for _, s in list_files(spark, path, suffix=".parquet"))
    target = max(1, total // 4)  # aim for ~4-5 files
    stats = compact_parquet(spark, path, target_bytes=target)
    assert stats.compacted
    assert 1 < stats.files_after < 10
    assert spark.read.parquet(path).count() == 2000


def test_partitioned_compaction_preserves_index_probe(spark, tmp_path):
    """VERDICT r7 next #4: the persisted band index fragments one
    parquet delta per ingested batch; compaction must happen WITHIN
    each band_idx= partition so the probe's pruning layout survives.
    Checks (a) probe verdicts identical pre/post, (b) file count
    reduced, (c) hive partition layout intact, (d) idempotent re-run."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.hadoop_fs import list_dirs
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        build_band_index,
        ingest_near_dup_flags,
        update_band_index,
    )
    from nosql_to_sql_migration_tool_spark.sources.maintenance import (
        compact_partitioned_parquet,
    )
    from tests.conftest import SF_DIR_SMOKE

    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    idx = str(tmp_path / "band_index")
    build_band_index(corpus.filter(F.col("doc_id") % 3 == 0), idx)
    # fragment: several appended micro-batches
    for i in (1, 2):
        update_band_index(corpus.filter(F.col("doc_id") % 3 == i), idx)

    def count_files(root):
        return sum(
            len(list_files(spark, f"{root}/{d}", suffix=".parquet"))
            for d in list_dirs(spark, root)
        )

    dirs_before = list_dirs(spark, idx)
    files_before = count_files(idx)
    assert len(dirs_before) > 1 and files_before > len(dirs_before)

    probe = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + F.lit(900_000)).alias("doc_id"), "text"
    )

    def verdicts():
        return ingest_near_dup_flags(
            corpus, probe,
            corpus_buckets=spark.read.parquet(idx).select(
                "band_idx", "band_hash", "doc_id"
            ),
        ).localCheckpoint(eager=True)

    want = verdicts()
    stats = compact_partitioned_parquet(spark, idx, min_gain=1)
    assert any(s.compacted for s in stats.values())
    # (c) layout intact: same partition dirs, still hive-readable with
    # band_idx as a partition column
    assert list_dirs(spark, idx) == dirs_before
    assert "band_idx" in spark.read.parquet(idx).columns
    # (b) fewer files
    assert count_files(idx) < files_before
    # (a) identical probe verdicts
    got = verdicts()
    assert want.exceptAll(got).isEmpty() and got.exceptAll(want).isEmpty()
    # (d) second run is a per-partition no-op
    again = compact_partitioned_parquet(spark, idx, min_gain=1)
    assert not any(s.compacted for s in again.values())
