from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter for unit tests

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_CORRECTNESS = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the driver's table views pre-registered,
    mirroring the driver's oracle setup."""
    import duckdb

    from nosql_to_sql_migration_tool_spark.sources.registry import (
        EVENTS_TS_ORACLE,
        TABLES,
    )

    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            # Apply the driver's pinned ts expression so the local oracle
            # matches load_table's ns→µs floor for BOTH testdata
            # generations (TIMESTAMP_NS: identical floor; TIMESTAMP(µs):
            # exact identity) instead of relying on strftime truncation.
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE "
                f"({EVENTS_TS_ORACLE} AS ts) FROM "
                f"'{SF_DIR_CORRECTNESS}/{t}.parquet'"
            )
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR_CORRECTNESS}/{t}.parquet'"
        )
    yield con
    con.close()
