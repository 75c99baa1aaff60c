"""Every declared query with an oracle must match DuckDB locally —
the same gate the driver applies at sf0.01 (run here at the fixture SF)."""

from __future__ import annotations

import pytest

from nosql_to_sql_migration_tool_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR_CORRECTNESS)
    duck_rel = duck.sql(ORACLES[name])
    problems = compare(spark_df, duck_rel)
    assert not problems, f"{name}: {problems}"


def test_all_queries_run(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR_CORRECTNESS)
        assert df.count() >= 0, name
