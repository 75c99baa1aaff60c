"""Deterministic fixture transforms derived from the driver tables.

FIXTURES.md §B says the CDC matrix (B2), schema-drift (B3) and
dirty-target (B4) fixtures "can be derived from ``customer`` with a
deterministic transform" — these are those transforms, defined once with
both a DataFrame builder and the equivalent DuckDB SQL text so the oracle
sees byte-identical inputs.

The golden CDC proportions mirror the reference's key semantic test
(Tests/Sync.Tests.ps1:76-130): a source snapshot containing UNCHANGED,
UPDATED and NEW rows and omitting DELETED keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Rules (disjoint by construction on c_custkey):
#   deleted   : c_custkey % 11 == 0      -> omitted from the source
#   updated   : c_custkey % 7  == 0 (and not deleted) -> c_acctbal + 10.0
#   new       : one extra row per c_custkey % 13 == 0, key shifted +10_000_000
NEW_KEY_OFFSET = 10_000_000


def changed_customer_source(customer: DataFrame) -> DataFrame:
    """The 'current MongoDB snapshot' for CDC tests: customer with
    deterministic updates, deletes and inserts applied."""
    surviving = customer.filter(F.col("c_custkey") % 11 != 0)
    updated = surviving.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(10.0)
        ).otherwise(F.col("c_acctbal")),
    )
    new_rows = (
        customer.filter(F.col("c_custkey") % 13 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + F.lit(NEW_KEY_OFFSET))
        .withColumn("c_name", F.concat(F.lit("NEW "), F.col("c_name")))
    )
    return updated.unionByName(new_rows)


CHANGED_CUSTOMER_SOURCE_SQL = f"""
SELECT c_custkey,
       c_name,
       c_nationkey,
       CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END
         AS c_acctbal,
       c_mktsegment
FROM customer
WHERE c_custkey % 11 <> 0
UNION ALL
SELECT c_custkey + {NEW_KEY_OFFSET},
       'NEW ' || c_name,
       c_nationkey,
       c_acctbal,
       c_mktsegment
FROM customer
WHERE c_custkey % 13 = 0
"""
