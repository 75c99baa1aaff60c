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


# --- round 11: the md5 bucket/uniform primitives -----------------------------
#
# split_bucket / lc_bucket / _dsir_bucket / weighted_sample's uniform all
# rest on the same convention: a prefix of md5(CAST(key AS STRING)) parsed
# as a hex integer. One Spark pass over a hypothesis-generated adversarial
# id table, compared row-for-row against DuckDB evaluating the twin
# expressions on the SAME table — unicode, quotes, control characters,
# whitespace-only, empty, huge ints and negatives must all agree, or every
# split/sketch/sample built on the convention diverges cross-engine.

adversarial_id = st.one_of(
    st.text(max_size=12),  # full unicode, incl. quotes/backslashes
    st.text(alphabet=st.sampled_from("'\"\\\n\t `$%_0 "), max_size=8),
    st.integers(min_value=-(2**62), max_value=2**62).map(str),
)


@settings(max_examples=30, deadline=None)
@given(st.lists(adversarial_id, min_size=1, max_size=8, unique=True))
def test_md5_bucket_and_uniform_cross_engine(spark, ids):
    import pandas as pd

    from nosql_to_sql_migration_tool_spark.operators.sketches import (
        lc_bucket,
        lc_bucket_sql,
    )
    from nosql_to_sql_migration_tool_spark.operators.traindata import (
        _sample_uniform,
        split_bucket,
        split_bucket_sql,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"k": pd.Series(ids, dtype="string")})
    )
    got = {
        r["k"]: (r["sb"], r["lb"], r["u"])
        for r in df.select(
            "k",
            split_bucket("k").alias("sb"),
            lc_bucket(F.col("k")).alias("lb"),
            _sample_uniform("k").alias("u"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": pd.Series(ids, dtype="string")}))
    u_sql = (
        "(CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 13)) "
        "AS BIGINT) + 1) / 4503599627370496.0"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT k, {split_bucket_sql('k')} AS sb, "
            f"{lc_bucket_sql('k')} AS lb, {u_sql} AS u FROM t"
        ).fetchall()
    }
    con.close()
    assert got == want
    for sb, lb, u in got.values():
        assert 0 <= sb < 100 and 0 <= lb < 4096 and 0.0 < u <= 1.0
