"""Property-based pin of the hash canon's injectivity: for arbitrary
string tuples (including separator/escape control characters, whitespace,
empty vs NULL), distinct rows must hash distinctly and the DuckDB twin
must agree byte-for-byte. DuckDB evaluates the canon so hypothesis can
run hundreds of cases without a Spark job per example; the Spark twin is
pinned against DuckDB on adversarial values in test_hashing.py."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from nosql_to_sql_migration_tool_spark.functions.hashing import row_hash_sql

SCHEMA = T.StructType(
    [
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
    ]
)

# strings heavy in the control characters the escaping must handle
tricky_text = st.text(
    alphabet=st.sampled_from("\x10\x11\x1fabN V"), max_size=6
)
value = st.one_of(st.none(), tricky_text)
row = st.tuples(value, value)


@settings(max_examples=30, deadline=None)
@given(st.lists(row, min_size=2, max_size=12, unique=True))
def test_distinct_rows_hash_distinctly(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    hashes = [
        h for (h,) in con.execute(
            f"SELECT {row_hash_sql(SCHEMA)} FROM t"
        ).fetchall()
    ]
    con.close()
    assert len(set(hashes)) == len(rows), (
        f"collision among {rows!r}: {hashes}"
    )
