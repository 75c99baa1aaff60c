"""Compression-ratio quality signal (round 13): ordering properties
(looped < prose < noise), hand ends, determinism across reruns and
repartitionings, the band filter, and the shuffle-free Arrow plan."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.operators.compress import (
    COMPRESS_LEVEL,
    compression_band_filter,
    compression_ratio,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_ratio_hand_cases_and_ordering(spark):
    import random

    rng = random.Random(13)
    noise = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(2000)
    )
    rows = spark.createDataFrame(
        [
            (1, "spam " * 400),                      # looped boilerplate
            (2, ("the quick brown fox jumps over the lazy dog and then "
                 "discusses query optimization at length ") * 20),
            (3, noise),                               # incompressible
            (4, ""),                                  # empty
            (5, None),                                # NULL text
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in compression_ratio(rows).collect()}
    # exact replay of the pinned zlib call
    want1 = round(
        len(zlib.compress(("spam " * 400).encode(), COMPRESS_LEVEL))
        / len(("spam " * 400).encode()),
        6,
    )
    assert got[1]["compress_ratio"] == want1
    # ordering: looped << prose << noise
    assert (
        got[1]["compress_ratio"]
        < got[2]["compress_ratio"]
        < got[3]["compress_ratio"]
    )
    assert got[3]["compress_ratio"] > 0.6  # ~36-symbol noise floor
    assert got[4]["n_bytes"] == 0 and got[4]["compress_ratio"] is None
    assert got[5]["n_bytes"] == 0 and got[5]["compress_ratio"] is None


def test_ratio_deterministic_and_partition_invariant(spark):
    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    a = sorted(map(tuple, compression_ratio(docs).collect()))
    b = sorted(map(tuple, compression_ratio(docs.repartition(7)).collect()))
    assert a == b and len(a) == docs.count()


def test_band_filter_cuts_both_tails(spark):
    import random

    rng = random.Random(7)
    noise = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
        for _ in range(2000)
    )
    rows = spark.createDataFrame(
        [
            (1, "spam " * 400),
            (2, "a genuinely varied sentence about joins and scans " * 10),
            (3, noise),
        ],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["compress_ratio"]
        for r in compression_ratio(rows).collect()
    }
    lo = (scored[1] + scored[2]) / 2
    hi = (scored[2] + scored[3]) / 2
    kept = compression_band_filter(rows, lo, hi)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    assert kept.columns == ["doc_id", "text"]


def test_ratio_plan_is_one_arrow_pass(spark):
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        python_stage_count,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    df = compression_ratio(docs)
    assert python_stage_count(df) == 1  # the sanctioned codec stage
    assert cartesian_products(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ratio_null_id_and_null_text_pass_through(spark):
    """ADVICE r13 regression: Arrow hands NULL longs to pandas as NaN
    floats, so the old `k is None` guard never fired and int(k) raised
    — NULL ids (and NULL text) must pass through as the Int64 output
    dtype always intended."""
    rows = spark.createDataFrame(
        [(None, "some text"), (2, None), (None, None)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["n_bytes"], r["compress_ratio"] is None)
        for r in compression_ratio(rows).collect()
    }
    assert (None, len(b"some text"), False) in got
    assert (2, 0, True) in got
    assert (None, 0, True) in got
