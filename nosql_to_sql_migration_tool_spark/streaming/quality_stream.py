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
