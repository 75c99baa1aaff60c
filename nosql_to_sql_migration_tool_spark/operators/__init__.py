from nosql_to_sql_migration_tool_spark.operators.cdc import (
    apply_changes,
    snapshot_diff,
    sync,
    with_row_hash,
)

__all__ = ["apply_changes", "snapshot_diff", "sync", "with_row_hash"]
