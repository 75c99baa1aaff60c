"""PySpark-native analytics engine with the data-processing capabilities of
milanVanTrimpont/NoSQL-to-SQL-migration-tool, re-expressed Spark-first.

The reference (a PowerShell MongoDB→MySQL/SQLServer ETL module) provides:
schema inference by sampling, relational normalization of nested documents,
batch load, snapshot-diff CDC sync, schema-drift evolution, and validation
(see /root/repo/SURVEY.md). This package rebuilds those capabilities as
composable DataFrame→DataFrame operators that Catalyst can optimize
end-to-end, plus the large-scale training-data-pipeline operators a 100 TB
deployment needs (dedup, similarity search, text analysis, multimodal
columns).

Design stance (SURVEY.md §7.0):
- No custom Catalyst rules — every operator is plan composition over
  built-in expressions.
- No ``collect()`` on data paths; the driver handles only schemas, plans
  and small stats.
- Shuffles only where semantically required (CDC join, dedup, group-bys).
"""

from nosql_to_sql_migration_tool_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
