"""Declared query surface — the driver contract.

Every implemented operator from SURVEY.md §2 is declared here twice:
as a DataFrame builder ``(spark, sf_dir) -> DataFrame`` and (where
SQL-expressible) as DuckDB oracle SQL over the same parquet tables.
``__spark_entry__.py`` re-exports these.

Column-name parity rule: every computed column is aliased identically in
the Spark plan and the oracle SQL (driver hashes values under sorted
column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nosql_to_sql_migration_tool_spark.fixtures import (
    CHANGED_CUSTOMER_SOURCE_SQL,
    changed_customer_source,
)
from nosql_to_sql_migration_tool_spark.functions.hashing import row_hash_sql
from nosql_to_sql_migration_tool_spark.operators.cdc import (
    diff_counts,
    snapshot_diff,
    snapshot_state,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# M0 flagship: snapshot-diff CDC classification (Start-IncrementalSync,
# reference private/Sync.ps1:125-163; golden matrix Tests/Sync.Tests.ps1:76-130)
# ---------------------------------------------------------------------------

_CUSTOMER_HASH_COLS = ["c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey"]

# DuckDB computes the identical canonical row hash (same normalization,
# same separator, same MD5) — the cross-engine hash contract of SURVEY §7.2.
from pyspark.sql import types as T  # noqa: E402

_CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

_CDC_CLASSIFY_ORACLE = f"""
WITH src AS ({CHANGED_CUSTOMER_SOURCE_SQL}),
srch AS (
  SELECT c_custkey, {row_hash_sql(_CUSTOMER_SCHEMA)} AS row_hash FROM src
),
sth AS (
  SELECT c_custkey, {row_hash_sql(_CUSTOMER_SCHEMA)} AS row_hash FROM customer
),
diff AS (
  SELECT CASE
           WHEN t.c_custkey IS NULL THEN 'NEW'
           WHEN s.c_custkey IS NULL THEN 'DELETED'
           WHEN s.row_hash <> t.row_hash THEN 'UPDATED'
           ELSE 'UNCHANGED'
         END AS change_type
  FROM srch s FULL OUTER JOIN sth t ON s.c_custkey = t.c_custkey
)
SELECT change_type, count(*) AS n
FROM diff
GROUP BY change_type
ORDER BY change_type
"""


@query("cdc_classify", _CDC_CLASSIFY_ORACLE)
def q_cdc_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts of NEW/UPDATED/DELETED/UNCHANGED between a simulated current
    snapshot of ``customer`` and the persisted state — one full-outer join
    plus a when-ladder (no driver-side state)."""
    customer = load_table(spark, sf_dir, "customer")
    source = changed_customer_source(customer)
    state = snapshot_state(customer, "c_custkey")
    return diff_counts(snapshot_diff(source, state, "c_custkey"))
