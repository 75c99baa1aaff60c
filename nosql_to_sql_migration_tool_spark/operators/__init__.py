from nosql_to_sql_migration_tool_spark.operators import (
    cdc,
    dedup,
    infer,
    multimodal,
    normalize_docs,
    relational,
    similarity,
    skew,
    text,
    validation,
    windows,
)
from nosql_to_sql_migration_tool_spark.operators.cdc import (
    apply_changes,
    snapshot_diff,
    sync,
    with_row_hash,
)

__all__ = [
    "apply_changes",
    "cdc",
    "dedup",
    "infer",
    "multimodal",
    "normalize_docs",
    "relational",
    "similarity",
    "skew",
    "snapshot_diff",
    "sync",
    "text",
    "validation",
    "windows",
    "with_row_hash",
]
