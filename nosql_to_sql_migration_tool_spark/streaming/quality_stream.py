"""Continuous data-quality monitoring — the deequ-style constraint
audit (``operators/quality.py``) evaluated PER MICRO-BATCH and appended
to a metrics table, turning one-shot audits into a quality TIME SERIES
(the "metrics repository" half of the deequ design: alert when a
constraint's metric drifts, not just when a single load fails).

Reference analogue: generalizes the reference's per-sync validation
report (``Export-SyncReport``, private/Sync.ps1:720-772) from counters
written to a log file into queryable per-batch metric rows.

Scale shape: each micro-batch pays exactly the batch-audit cost — one
combinable aggregate pass over the batch plus a broadcast left join per
FK check — and appends constraint-count ROWS to the metrics sink
(metadata-sized forever). ``foreachBatch`` because the audit is an
aggregate-and-append side effect, not a row transformation; the
checkpoint makes batch processing exactly-once, and the metrics table
carries ``batch_id`` so replayed batches overwrite-by-append
idempotently at read time (latest row per (batch_id, check_name) —
duplicates are identical rows by construction since the audit is
deterministic in the batch contents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from nosql_to_sql_migration_tool_spark.operators.quality import (
    Check,
    constraint_report,
)


def stream_constraint_metrics(
    batch_stream: DataFrame,
    checks: list[Check],
    metrics_path: str,
    checkpoint_path: str,
    fk_dim: DataFrame | None = None,
    fk: tuple[str, str] | None = None,
) -> StreamingQuery:
    """Audit every micro-batch against the declared constraints and
    append ``(batch_id, check_name, metric, threshold, passed)`` rows
    to the parquet metrics table at ``metrics_path``. ``fk`` declares
    an optional referential check ``(fact_col, dim_col)`` against the
    STATIC ``fk_dim`` dimension (broadcast per batch). availableNow
    trigger: drains pending input, then stops — the scheduled-audit
    twin of the reference's per-sync report."""

    def _audit(batch_df: DataFrame, batch_id: int) -> None:
        fks = (
            [(fk[0], fk_dim, fk[1])]
            if fk is not None and fk_dim is not None
            else None
        )
        report = constraint_report(batch_df, checks, fks=fks)
        (
            report.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .select(
                "batch_id", "check_name", "metric", "threshold", "passed"
            )
            .write.mode("append")
            .parquet(metrics_path)
        )

    return (
        batch_stream.writeStream.foreachBatch(_audit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_drift_metrics(
    batch_stream: DataFrame,
    col: str,
    baseline_path: str,
    metrics_path: str,
    checkpoint_path: str,
    kind: str = "numeric",
) -> StreamingQuery:
    """Continuous distribution-drift monitoring (round 9): every
    micro-batch audits against the STORED reference distribution
    (``save_numeric_baseline`` / ``save_categorical_baseline``) and
    appends one metrics row — ``(batch_id, n_a, n_b, l1_distance,
    metric2)`` where ``metric2`` is ``ks_stat`` (numeric) or
    ``max_rate_gap`` (categorical) — turning the one-shot drift audit
    into a drift TIME SERIES over the ingest stream. Per-batch cost is
    one scan of the batch plus bin/category-bounded metadata work; the
    reference data is never rescanned (the incremental-baseline
    contract). Replay-safe the same way as the constraint metrics:
    drift is deterministic in (batch contents, frozen baseline), so a
    replayed batch appends identical rows and readers take the latest
    per batch_id."""
    from nosql_to_sql_migration_tool_spark.operators.quality import (
        categorical_drift_vs_baseline,
        numeric_drift_vs_baseline,
    )

    if kind not in ("numeric", "categorical"):
        raise ValueError(f"unknown drift kind {kind!r}")

    def _audit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if kind == "numeric":
            row = numeric_drift_vs_baseline(batch_df, col, baseline_path)
            row = row.select(
                "n_a", "n_b", "l1_distance",
                F.col("ks_stat").alias("metric2"),
            )
        else:
            row = categorical_drift_vs_baseline(batch_df, col, baseline_path)
            row = row.select(
                "n_a", "n_b", "l1_distance",
                F.col("max_rate_gap").alias("metric2"),
            )
        (
            row.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .select("batch_id", "n_a", "n_b", "l1_distance", "metric2")
            .write.mode("append")
            .parquet(metrics_path)
        )

    return (
        batch_stream.writeStream.foreachBatch(_audit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
