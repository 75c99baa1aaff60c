from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
    read_snapshot_stream,
    stream_sync,
    stream_window_counts,
)

__all__ = ["read_snapshot_stream", "stream_sync", "stream_window_counts"]
