from nosql_to_sql_migration_tool_spark.functions.normalize import (
    hash_canon,
    hash_canon_sql,
    normalize_for_comparison,
    normalize_sql,
)
from nosql_to_sql_migration_tool_spark.functions.hashing import (
    HASH_SEP,
    row_hash,
    row_hash_sql,
    scalar_columns,
)

__all__ = [
    "HASH_SEP",
    "hash_canon",
    "hash_canon_sql",
    "normalize_for_comparison",
    "normalize_sql",
    "row_hash",
    "row_hash_sql",
    "scalar_columns",
]
