"""Snapshot-diff CDC — the reference's incremental sync, as one join.

The reference classifies every source document against a persisted
``{_id → md5}`` state and the target key-set using driver-side hashtable
probes (``Start-IncrementalSync``, private/Sync.ps1:125-163):

- key in state/target, hash differs   -> UPDATED
- key in state/target, hash equal     -> UNCHANGED
- key not in target                   -> NEW
- target key absent from the source   -> DELETED

Here the whole classification is a single full-outer join on the key plus
a ``when`` ladder — one shuffle, fully distributed, no driver-side state.
At 100 TB the state side is a narrow ``(key, row_hash)`` projection; when
it is small relative to the source (steady-state syncs) AQE selects a
broadcast join automatically.

State persistence (reference: sync_state_<t>.json, Sync.ps1:296-349) is a
parquet state table — ``save_state`` / ``load_state`` below. The
streaming analogue (foreachBatch upsert + checkpoint, availableNow
trigger) lives in ``streaming/cdc_stream.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from nosql_to_sql_migration_tool_spark.functions.hashing import row_hash, scalar_columns

CHANGE_TYPES = ("NEW", "UPDATED", "DELETED", "UNCHANGED")


def save_state(state: DataFrame, path: str) -> None:
    """Persist the ``(key, row_hash)`` sync state between runs
    (Save-SyncState, Sync.ps1:331-349)."""
    state.write.mode("overwrite").parquet(path)


def load_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Load persisted sync state; ``None`` (missing/unreadable state)
    means the caller falls back to a full sync — the reference's
    corrupt-state fallback (Get-SyncState, Sync.ps1:296-329)."""
    from nosql_to_sql_migration_tool_spark.hadoop_fs import try_read_parquet

    return try_read_parquet(spark, path)


def with_row_hash(
    df: DataFrame,
    cols: list[str] | None = None,
    hash_col: str = "row_hash",
) -> DataFrame:
    """Attach the canonical MD5 row hash (Get-DocumentHash parity,
    Sync.ps1:351-393). Hash covers key-sorted top-level scalars only."""
    return df.withColumn(hash_col, row_hash(df, cols))


def snapshot_state(df: DataFrame, key: str, hash_col: str = "row_hash") -> DataFrame:
    """Build the persisted sync state from a snapshot: ``(key, row_hash)``.

    Replaces the reference's DocumentHashes map (Sync.ps1:296-349)."""
    return with_row_hash(df, hash_col=hash_col).select(key, hash_col)


def snapshot_diff(
    source: DataFrame,
    state: DataFrame,
    key: str,
    hash_col: str = "row_hash",
    change_col: str = "change_type",
) -> DataFrame:
    """Classify every key as NEW / UPDATED / DELETED / UNCHANGED.

    ``source`` is the current snapshot (full schema); ``state`` is the
    persisted ``(key, row_hash)``. Returns all source columns + the key
    (non-null even for DELETED rows) + ``change_type``.
    """
    src = with_row_hash(source, hash_col=hash_col).withColumnRenamed(key, f"__src_{key}")
    st = state.select(
        F.col(key).alias(f"__st_{key}"), F.col(hash_col).alias(f"__st_{hash_col}")
    )
    joined = src.join(
        st, src[f"__src_{key}"] == st[f"__st_{key}"], "full_outer"
    )
    change = (
        F.when(st[f"__st_{key}"].isNull(), F.lit("NEW"))
        .when(src[f"__src_{key}"].isNull(), F.lit("DELETED"))
        .when(F.col(hash_col) != F.col(f"__st_{hash_col}"), F.lit("UPDATED"))
        .otherwise(F.lit("UNCHANGED"))
    )
    data_cols = [c for c in source.columns if c != key]
    return joined.select(
        F.coalesce(F.col(f"__src_{key}"), F.col(f"__st_{key}")).alias(key),
        *data_cols,
        F.col(hash_col),
        change.alias(change_col),
    )


def apply_changes(
    target: DataFrame,
    diff: DataFrame,
    key: str,
    change_col: str = "change_type",
) -> DataFrame:
    """MERGE semantics on an immutable store: rewrite the target snapshot as
    (target minus DELETED minus UPDATED) union (NEW union UPDATED).

    Vanilla parquet has no ACID MERGE; the reference applies per-row
    INSERT/UPDATE/DELETE DML (Sync.ps1:179-247). The distributed
    equivalent is an anti-join + union — one shuffle on the key, and the
    unchanged majority of the target is rewritten without modification.
    On a transactional table format this operator maps 1:1 onto MERGE.
    """
    changed_keys = diff.filter(
        F.col(change_col).isin("UPDATED", "DELETED")
    ).select(key)
    upserts = diff.filter(F.col(change_col).isin("NEW", "UPDATED")).select(
        *target.columns
    )
    kept = target.join(changed_keys, key, "left_anti")
    return kept.unionByName(upserts)


def merge_available() -> bool:
    """Whether a transactional table format with MERGE INTO is on the
    classpath. Gated on Delta Lake's python binding (`delta-spark`) —
    absent from this container (verified rounds 3-5), so the gate stays
    closed here and ``merge_changes`` below is exercised the day the
    deployment provides the jar (tests skip-if-absent)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401

        return True
    except ImportError:
        return False


def merge_changes(
    spark: SparkSession,
    target_path: str,
    diff: DataFrame,
    key: str,
    change_col: str = "change_type",
) -> None:
    """ACID ``MERGE INTO`` apply — the 1:1 mapping of the reference's
    REPLACE/UPDATE/DELETE DML (Sync.ps1:601-705) onto a transactional
    table format, replacing the snapshot/partition rewrite fallback
    (``apply_changes*``) with a single atomic, conflict-checked commit:

        MERGE INTO target t USING diff s ON t.key = s.key
        WHEN MATCHED AND s.change = 'DELETED' THEN DELETE
        WHEN MATCHED AND s.change = 'UPDATED' THEN UPDATE SET data cols
        WHEN NOT MATCHED AND s.change = 'NEW' THEN INSERT data cols

    At 100 TB this is the steady-state shape: the engine rewrites only
    the files containing matched keys (data skipping / file pruning),
    and concurrent writers serialize through the table log instead of
    racing a directory overwrite. Raises ``RuntimeError`` when no MERGE
    runtime is present (``merge_available``)."""
    if not merge_available():
        raise RuntimeError(
            "MERGE INTO needs a transactional table format on the "
            "classpath (delta-spark); use apply_changes_to_path for "
            "vanilla parquet"
        )
    from delta.tables import DeltaTable

    tgt = DeltaTable.forPath(spark, target_path)
    data_cols = [c for c in tgt.toDF().columns]
    sets = {c: F.col(f"s.{c}") for c in data_cols}
    (
        tgt.alias("t")
        .merge(diff.alias("s"), f"t.{key} = s.{key}")
        .whenMatchedDelete(condition=f"s.{change_col} = 'DELETED'")
        .whenMatchedUpdate(
            condition=f"s.{change_col} = 'UPDATED'", set=sets
        )
        .whenNotMatchedInsert(
            condition=f"s.{change_col} = 'NEW'", values=sets
        )
        .execute()
    )


def apply_changes_partitioned(
    target: DataFrame,
    diff: DataFrame,
    key: str,
    partition_col: str,
    change_col: str = "change_type",
) -> tuple[DataFrame, DataFrame]:
    """Partition-scoped MERGE: ``(rows_to_write, touched_partitions)``.

    The scale fix for ``apply_changes``' full-snapshot rewrite: only
    partitions containing a NEW/UPDATED/DELETED row are recomputed, and
    ``rows_to_write`` is their complete new content — written with
    dynamic partition overwrite, the unchanged majority of a 100 TB
    target is never read or rewritten. Touched partitions come from the
    source side for NEW/UPDATED rows and from a target semi-join for
    DELETED/UPDATED keys (a DELETED row's partition value exists only in
    the target).
    """
    upsert_parts = diff.filter(
        F.col(change_col).isin("NEW", "UPDATED")
    ).select(partition_col)
    gone_keys = diff.filter(
        F.col(change_col).isin("DELETED", "UPDATED")
    ).select(key)
    gone_parts = target.join(gone_keys, key, "left_semi").select(partition_col)
    touched = upsert_parts.union(gone_parts).distinct()
    scoped_target = target.join(F.broadcast(touched), partition_col, "left_semi")
    return apply_changes(scoped_target, diff, key, change_col), touched


def apply_changes_to_path(
    spark,
    target_path: str,
    diff: DataFrame,
    key: str,
    partition_col: str,
    change_col: str = "change_type",
) -> None:
    """Apply a diff in place on a partitioned parquet directory.

    Uses dynamic partition overwrite so only touched partition
    directories are replaced (the reference's per-row DML, Sync.ps1:179-247,
    becomes one scoped write). ``localCheckpoint`` materializes the new
    content first because Spark refuses to overwrite a path it is still
    reading; a production deployment on object storage would stage to a
    temp prefix or use a transactional table format's MERGE instead.

    Dynamic overwrite only replaces partitions PRESENT in the written
    data — a partition whose every row was DELETED produces no output
    rows, so its old directory would silently survive. Touched
    partitions that received no output are therefore removed explicitly
    through the Hadoop FileSystem API (works on any Hadoop-supported
    store). The two collects are metadata-sized: touched-partition
    values, never data rows.
    """
    target = spark.read.parquet(target_path)
    rows, touched = apply_changes_partitioned(
        target, diff, key, partition_col, change_col
    )
    rows = rows.localCheckpoint(eager=True)
    touched_vals = {r[0] for r in touched.collect()}
    written_vals = {
        r[0] for r in rows.select(partition_col).distinct().collect()
    }
    # dynamic mode pinned PER WRITE, not via session conf: the previous
    # session-level set was never restored, silently flipping every
    # later overwrite in the session to dynamic (exposed in round 7 by
    # the rollup-compaction test, whose static overwrite then leaked
    # stale batch_id dirs).
    rows.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(target_path)
    emptied = touched_vals - written_vals
    if emptied:
        from nosql_to_sql_migration_tool_spark.hadoop_fs import delete_paths

        # Spark's partition-dir naming for scalar values; NULL
        # partitions write __HIVE_DEFAULT_PARTITION__.
        delete_paths(
            spark,
            (
                f"{target_path}/{partition_col}="
                f"{'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
                for v in emptied
            ),
        )


def sync(
    source: DataFrame,
    state: DataFrame | None,
    key: str,
    hash_col: str = "row_hash",
) -> tuple[DataFrame, DataFrame]:
    """One incremental-sync round: ``(diff, new_state)``.

    With no prior state every row classifies as NEW (full sync fallback,
    Sync.ps1:62-65). New state carries the source's hashes forward —
    the reference's carry-forward of unchanged hashes (Sync.ps1:250-256)
    is implicit because hashes are recomputed from the source snapshot.
    """
    if state is None:
        diff = with_row_hash(source, hash_col=hash_col).withColumn(
            "change_type", F.lit("NEW")
        )
    else:
        diff = snapshot_diff(source, state, key, hash_col=hash_col)
    new_state = (
        diff.filter(F.col("change_type") != "DELETED").select(key, hash_col)
    )
    return diff, new_state


def diff_counts(diff: DataFrame, change_col: str = "change_type") -> DataFrame:
    """Sync-report counters (Export-SyncReport, Sync.ps1:720-772)."""
    return (
        diff.groupBy(change_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(change_col)
    )


def maintain_aggregate(
    old_snapshot: DataFrame,
    new_source: DataFrame,
    key: str,
    group_col: str,
    measure_col: str,
    validate_unique_key: bool = False,
) -> DataFrame:
    """Incremental view maintenance for a grouped (count, sum)
    aggregate: given the OLD snapshot and the NEW source, produce the
    new ``(group, n_rows, sum_measure)`` by applying per-group DELTAS
    to the old aggregate instead of re-aggregating the world — the
    continuous-aggregate discipline of ``streaming/rollup.py`` applied
    to the CDC batch path.

    Per churned key the delta is: departure ``(-1, -old_measure)`` from
    the old group, arrival ``(+1, +new_measure)`` to the new group —
    group MOVES decompose into both, UNCHANGED rows (same group, same
    measure) contribute nothing and are filtered before the shuffle.

    Scale shape: at 100 TB the old aggregate is a PERSISTED
    metadata-sized table and the diff comes from a change feed, so
    maintenance cost is one join bounded by churn + one combinable
    delta aggregate over churned rows only — never a re-scan of the
    snapshot. (Here the old aggregate is computed from the fixture
    snapshot because nothing persists between driver runs; the delta
    path is the part under test, oracle-proved equal to a full
    recompute of the new source.)

    Determinism: measures accumulate as DECIMAL(18,2) (order-free);
    NULL measures count as 0 so a group of NULLs maintains to 0, not
    NULL. Groups whose count reaches zero drop out, matching the
    recompute.

    PRECONDITION (ADVICE r6): ``key`` must be unique in BOTH snapshots.
    A duplicate key fans out the full_outer join, multiplying its
    departure/arrival deltas and silently corrupting the aggregate.
    ``validate_unique_key=True`` adds one cheap groupBy-count guard per
    side (a separate job, run before the maintenance plan) and raises
    ``ValueError`` on the first duplicate found.
    """
    if validate_unique_key:
        for side, df in (("old_snapshot", old_snapshot), ("new_source", new_source)):
            dup = (
                df.groupBy(key)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"maintain_aggregate: duplicate key {key}="
                    f"{dup[0][key]!r} in {side} — the full_outer join "
                    "would fan out and multiply deltas"
                )
    dec = lambda c: F.coalesce(c, F.lit(0)).cast("decimal(18,2)")  # noqa: E731
    # Presence flags, not group-NULL checks: a live row whose GROUP
    # value is NULL must still contribute its departure/arrival.
    old = old_snapshot.select(
        F.col(key).alias("__k"),
        F.col(group_col).alias("__g_old"),
        dec(F.col(measure_col)).alias("__m_old"),
        F.lit(True).alias("__old_present"),
    )
    new = new_source.select(
        F.col(key).alias("__k"),
        F.col(group_col).alias("__g_new"),
        dec(F.col(measure_col)).alias("__m_new"),
        F.lit(True).alias("__new_present"),
    )
    joined = old.join(new, "__k", "full_outer")
    both = F.coalesce(F.col("__old_present"), F.lit(False)) & F.coalesce(
        F.col("__new_present"), F.lit(False)
    )
    changed = joined.filter(
        ~(
            both
            & F.col("__g_old").eqNullSafe(F.col("__g_new"))
            & F.col("__m_old").eqNullSafe(F.col("__m_new"))
        )
    )
    departures = changed.filter(F.col("__old_present")).select(
        F.col("__g_old").alias(group_col),
        F.lit(-1).cast("long").alias("__dn"),
        (-F.col("__m_old")).alias("__dm"),
    )
    arrivals = changed.filter(F.col("__new_present")).select(
        F.col("__g_new").alias(group_col),
        F.lit(1).cast("long").alias("__dn"),
        F.col("__m_new").alias("__dm"),
    )
    deltas = (
        departures.unionByName(arrivals)
        .groupBy(group_col)
        .agg(F.sum("__dn").alias("__dn"), F.sum("__dm").alias("__dm"))
    )
    old_agg = old.groupBy(F.col("__g_old").alias(group_col)).agg(
        F.sum(F.lit(1)).alias("__dn"), F.sum("__m_old").alias("__dm")
    )
    # Merge by UNION + groupBy, not a join on the group column: a JOIN
    # key never matches NULL to NULL, so a NULL-valued group's old
    # aggregate and its delta would land in two separate output rows;
    # groupBy treats NULL as one group (caught by the randomized IVM
    # property test).
    merged = (
        old_agg.unionByName(deltas)
        .groupBy(group_col)
        .agg(
            F.sum("__dn").alias("n_rows"),
            F.sum("__dm").alias("__sum"),
        )
    )
    return merged.filter(F.col("n_rows") > 0).select(
        group_col,
        "n_rows",
        F.col("__sum").cast("double").alias("sum_measure"),
    )
