from nosql_to_sql_migration_tool_spark.streaming.cdc_stream import (
    read_snapshot_stream,
    stream_sync,
    stream_window_counts,
)
from nosql_to_sql_migration_tool_spark.streaming.rollup import (
    read_rollup,
    stream_hourly_rollup,
)
from nosql_to_sql_migration_tool_spark.streaming.stateful import (
    running_user_profiles,
    start_user_profiles,
)

__all__ = [
    "read_rollup",
    "read_snapshot_stream",
    "running_user_profiles",
    "start_user_profiles",
    "stream_hourly_rollup",
    "stream_sync",
    "stream_window_counts",
]
