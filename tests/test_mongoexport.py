"""mongoexport Extended JSON ingestion (round 14): wrapper unwrapping
for every v2 type form, nesting through structs/arrays, pass-through of
plain values, and the shuffle-free projection plan."""

from __future__ import annotations

import datetime
import json

from nosql_to_sql_migration_tool_spark.sources.mongoexport import (
    read_mongoexport,
)


def _write_dump(tmp_path, lines):
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    return str(p)


def test_all_wrapper_forms_unwrap(spark, tmp_path):
    path = _write_dump(
        tmp_path,
        [
            {
                "_id": {"$oid": "64b2f0c8e4b0a1b2c3d4e5f6"},
                "created": {"$date": "2023-07-15T12:30:00Z"},
                "updated": {"$date": {"$numberLong": "1689424200123"}},
                "count": {"$numberLong": "9007199254740993"},
                "small": {"$numberInt": "42"},
                "ratio": {"$numberDouble": "2.5"},
                "price": {"$numberDecimal": "19.99"},
                "name": "alice",
                "plain": 7,
            }
        ],
    )
    row = read_mongoexport(spark, path).collect()[0]
    assert row["_id"] == "64b2f0c8e4b0a1b2c3d4e5f6"
    assert row["created"] == datetime.datetime(2023, 7, 15, 12, 30)
    assert row["updated"] == datetime.datetime(
        2023, 7, 15, 12, 30, 0, 123000
    )
    assert row["count"] == 9007199254740993  # > 2^53: long, not double
    assert row["small"] == 42
    assert row["ratio"] == 2.5
    assert float(row["price"]) == 19.99
    assert row["name"] == "alice" and row["plain"] == 7


def test_nested_structs_and_arrays_unwrap(spark, tmp_path):
    path = _write_dump(
        tmp_path,
        [
            {
                "meta": {
                    "owner": {"$oid": "aaaaaaaaaaaaaaaaaaaaaaaa"},
                    "tags": ["x", "y"],
                    "weights": [{"$numberLong": "1"}, {"$numberLong": "2"}],
                },
                "refs": [
                    {"rid": {"$oid": "bbbbbbbbbbbbbbbbbbbbbbbb"}, "n": 1},
                ],
            }
        ],
    )
    row = read_mongoexport(spark, path).collect()[0]
    assert row["meta"]["owner"] == "aaaaaaaaaaaaaaaaaaaaaaaa"
    assert row["meta"]["tags"] == ["x", "y"]
    assert row["meta"]["weights"] == [1, 2]
    assert row["refs"][0]["rid"] == "bbbbbbbbbbbbbbbbbbbbbbbb"
    assert row["refs"][0]["n"] == 1


def test_plain_structs_pass_through(spark, tmp_path):
    """A user struct that is NOT a wrapper (two fields, or one field
    not in the wrapper set) must survive untouched."""
    path = _write_dump(
        tmp_path,
        [
            {
                "addr": {"city": "x", "zip": "9"},
                "single": {"note": "keep"},
            }
        ],
    )
    row = read_mongoexport(spark, path).collect()[0]
    assert row["addr"]["city"] == "x" and row["addr"]["zip"] == "9"
    assert row["single"]["note"] == "keep"


def test_unwrap_plan_is_projection_only(spark, tmp_path):
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        python_stage_count,
    )

    path = _write_dump(
        tmp_path,
        [
            {"_id": {"$oid": "cc" * 12}, "n": {"$numberLong": str(i)}}
            for i in range(50)
        ],
    )
    df = read_mongoexport(spark, path)
    assert cartesian_products(df) == 0
    assert python_stage_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_feeds_the_normalize_pipeline(spark, tmp_path):
    """The promise of the module: an exported collection flows into the
    SAME schema-inference machinery a live collection would."""
    from nosql_to_sql_migration_tool_spark.operators.infer import (
        infer_schema,
    )

    path = _write_dump(
        tmp_path,
        [
            {"_id": {"$oid": "ab" * 12}, "qty": {"$numberLong": "5"},
             "name": "n1"},
            {"_id": {"$oid": "cd" * 12}, "qty": {"$numberLong": "7"},
             "name": "n2"},
        ],
    )
    from pyspark.sql import functions as F

    df = read_mongoexport(spark, path)
    json_form = df.select(
        F.crc32(F.col("_id")).cast("long").alias("id"),
        F.to_json(F.struct(*df.columns)).alias("doc"),
    )
    inferred = {
        r["path"]: r for r in infer_schema(json_form, "doc", "id").collect()
    }
    assert "_id" in inferred and "qty" in inferred and "name" in inferred


def test_dump_roundtrip_on_customer_fixture(spark, tmp_path):
    """The r15-queue registration shape: customer written as an
    Extended JSON dump (deterministic md5 $oid, $numberLong keys,
    plain values), read back through the unwrap — the round trip
    reproduces the source rows exactly, and _id is re-derivable by an
    oracle (md5 prefix of the key)."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.sources.mongoexport import (
        write_mongoexport_dump,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import (
        load_table,
    )
    from tests.conftest import SF_DIR_SMOKE

    customer = load_table(spark, SF_DIR_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    path = str(tmp_path / "customer_dump")
    write_mongoexport_dump(
        customer, path, oid_col="c_custkey", long_cols=()
    )
    back = read_mongoexport(spark, path)
    got = {
        (r["c_custkey"], r["c_name"], r["c_acctbal"], r["c_mktsegment"])
        for r in back.collect()
    }
    want = {tuple(r) for r in customer.collect()}
    assert got == want and len(got) > 0
    # the $oid is the documented pure function of the key
    one = back.select(
        "_id",
        F.substring(
            F.md5(F.col("c_custkey").cast("string")), 1, 24
        ).alias("expect"),
    ).collect()
    assert all(r["_id"] == r["expect"] for r in one)


def test_dump_roundtrip_preserves_timestamp_millis(spark, tmp_path):
    """ADVICE r14 regression: $date must carry sub-second precision —
    the second-granular format silently truncated millis the read path
    supports. (UTC rendering is the session.py pin; asserted here so a
    config drift fails loudly.)"""
    import datetime

    from nosql_to_sql_migration_tool_spark.sources.mongoexport import (
        write_mongoexport_dump,
    )

    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    ts = datetime.datetime(2023, 7, 15, 12, 30, 5, 123000)
    df = spark.createDataFrame([(1, ts)], "k long, created timestamp")
    path = str(tmp_path / "ts_dump")
    write_mongoexport_dump(df, path, oid_col="k", date_cols=("created",))
    row = read_mongoexport(spark, path).collect()[0]
    assert row["created"] == ts  # millis survive the round trip
    raw = spark.read.text(path).collect()
    assert any('"$date":"2023-07-15T12:30:05.123Z"' in r["value"]
               for r in raw)
