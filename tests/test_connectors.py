"""Connector surface: file-format round trips are tested for real;
JDBC/Mongo option building is pure-tested; unavailable connectors raise
the documented clear error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.sources.connectors import (
    jdbc_options,
    mongo_options,
    read_file,
    read_jdbc,
    write_jdbc,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_file_format_round_trips(spark, tmp_path):
    nation = load_table(spark, SF_DIR_SMOKE, "nation")
    for fmt in ("parquet", "json", "csv", "orc"):
        path = str(tmp_path / f"nation_{fmt}")
        w = nation.write.format(fmt)
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(path)
        back = read_file(spark, path, fmt)
        assert back.count() == nation.count()
        assert sorted(back.columns) == sorted(nation.columns)

    with pytest.raises(ValueError):
        read_file(spark, "/tmp/x", "avro")


def test_json_source_feeds_inference(spark, tmp_path):
    """The schemaless path: JSON-lines source -> infer_schema."""
    from nosql_to_sql_migration_tool_spark.fixtures import ragged_documents
    from nosql_to_sql_migration_tool_spark.operators.infer import infer_schema

    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    path = str(tmp_path / "docs_json")
    ragged_documents(customer).limit(200).select("doc").write.text(path)
    raw = spark.read.text(path).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    stats = infer_schema(raw, "value", "doc_id").collect()
    assert {s["path"] for s in stats} >= {"name", "age"}


def test_jdbc_option_building():
    opts = jdbc_options(
        "mysql", "db.example", "shop", "users", user="u", password="p"
    )
    assert opts["url"] == "jdbc:mysql://db.example:3306/shop"
    assert opts["dbtable"] == "users" and opts["batchsize"] == "1000"
    mssql = jdbc_options("sqlserver", "h", "d", "t", port=1444)
    assert mssql["url"] == "jdbc:sqlserver://h:1444;databaseName=d"
    with pytest.raises(ValueError):
        jdbc_options("oracle", "h", "d", "t")


def test_jdbc_partitioned_read_option_building():
    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        jdbc_partitioned_read_options,
    )

    base = jdbc_options("mysql", "db.example", "shop", "orders")
    opts = jdbc_partitioned_read_options(
        base, "o_orderkey", 1, 6_000_000, num_partitions=64
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["lowerBound"] == "1" and opts["upperBound"] == "6000000"
    assert opts["numPartitions"] == "64" and opts["fetchsize"] == "10000"
    assert opts["url"] == base["url"]  # base options survive the merge
    with pytest.raises(ValueError):
        jdbc_partitioned_read_options(base, "k", 0, 1, num_partitions=0)


def test_mongo_option_building():
    opts = mongo_options("mongodb://localhost:27017", "appdb", "users")
    assert opts == {
        "connection.uri": "mongodb://localhost:27017",
        "database": "appdb",
        "collection": "users",
    }


def test_unavailable_jdbc_raises_clear_error(spark):
    opts = jdbc_options("mysql", "nohost.invalid", "d", "t")
    with pytest.raises(RuntimeError, match="JDBC read failed"):
        read_jdbc(spark, opts)
    nation = load_table(spark, SF_DIR_SMOKE, "nation")
    with pytest.raises(RuntimeError, match="JDBC write failed"):
        write_jdbc(nation, opts, column_types={"n_name": "VARCHAR(255)"})


def test_derby_executed_roundtrip_and_modes(spark, tmp_path):
    """EXECUTED JDBC path on embedded Derby (the jar ships with Spark):
    batched write, typed DDL, read-back parity, append accumulation,
    overwrite replacement."""
    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        derby_options,
        jdbc_roundtrip,
        read_jdbc,
        write_jdbc,
    )

    nation = load_table(spark, SF_DIR_SMOKE, "nation")
    opts = derby_options(str(tmp_path / "db"), "nation_rt")
    back = jdbc_roundtrip(
        nation, opts, column_types={"n_name": "VARCHAR(128)"}
    )
    assert back.count() == nation.count()
    assert sorted(back.columns) == sorted(nation.columns)
    assert {r["n_name"] for r in back.collect()} == {
        r["n_name"] for r in nation.collect()
    }
    # append doubles, overwrite resets
    write_jdbc(nation, opts, mode="append")
    assert read_jdbc(spark, opts).count() == 2 * nation.count()
    write_jdbc(nation, opts, mode="overwrite")
    assert read_jdbc(spark, opts).count() == nation.count()


def test_derby_partitioned_parallel_read(spark, tmp_path):
    """jdbc_partitioned_read_options against a REAL database: the
    4-partition range read returns the same rows as the single-stream
    read (bounds shape splits, never filter)."""
    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        derby_options,
        jdbc_partitioned_read_options,
        read_jdbc,
        write_jdbc,
    )

    nation = load_table(spark, SF_DIR_SMOKE, "nation")
    opts = derby_options(str(tmp_path / "pdb"), "nation_p")
    write_jdbc(nation, opts, mode="overwrite")
    popts = jdbc_partitioned_read_options(
        opts, "n_nationkey", 0, 24, num_partitions=4
    )
    df = read_jdbc(spark, popts)
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r["n_nationkey"] for r in df.collect()) == sorted(
        r["n_nationkey"] for r in nation.collect()
    )


def test_derby_decimal_exactness(spark, tmp_path):
    """DECIMAL survives the write/read round trip bit-exactly — the
    validation contract the jdbc_roundtrip_agg query hash-checks."""
    from pyspark.sql import types as T

    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        derby_options,
        jdbc_roundtrip,
    )

    cust = load_table(spark, SF_DIR_SMOKE, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast(T.DecimalType(18, 2)).alias("bal"),
    )
    back = jdbc_roundtrip(
        cust,
        derby_options(str(tmp_path / "ddb"), "cust_dec"),
        column_types={"bal": "DECIMAL(18,2)"},
    )
    want = cust.agg(F.sum("bal").alias("s")).first()["s"]
    got = back.agg(F.sum("bal").alias("s")).first()["s"]
    assert got == want


def test_connection_probe_executes(spark, tmp_path):
    """Test-*Connection parity, EXECUTED: the probe runs SELECT 1
    through the JDBC reader — True against a real (embedded Derby)
    endpoint, False (never raising) against an unreachable host."""
    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        derby_options,
        jdbc_options,
        test_connection,
    )

    assert test_connection(
        spark, derby_options(str(tmp_path / "probe_db"), "unused")
    )
    assert not test_connection(
        spark, jdbc_options("mysql", "nohost.invalid", "d", "t")
    )


def test_probe_mongo_reports_false_without_connector(spark):
    """ADVICE r6: Mongo reachability is PROBED (1-row read attempt),
    not hardcoded — in this container the connector package is absent
    so the probe returns False, never raises; against a live server
    with the connector on the classpath the same call returns True."""
    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        mongo_options,
        probe_mongo,
    )

    opts = mongo_options("mongodb://localhost:27017", "db", "coll")
    assert probe_mongo(spark, opts) is False


def test_export_training_shards_roundtrip_and_verify(spark, tmp_path):
    """Sharded training export: deterministic md5 shard assignment
    (re-export -> identical manifest), loss-free roundtrip, manifest
    verification green on intact data, and shard-granular detection of
    tampering/loss."""
    import shutil

    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.sources.export import (
        export_training_shards,
        read_manifest,
        verify_shards,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "shards")
    m1 = {r["shard"]: r.asDict() for r in
          export_training_shards(docs, out, n_shards=8).collect()}
    assert set(m1) == set(range(8))
    assert sum(r["n_rows"] for r in m1.values()) == docs.count()

    # roundtrip: every row present exactly once
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert back.join(docs, ["doc_id", "text"]).count() == docs.count()

    # deterministic: re-export to a fresh path -> identical manifest
    out2 = str(tmp_path / "shards2")
    m2 = {r["shard"]: r.asDict() for r in
          export_training_shards(docs, out2, n_shards=8).collect()}
    assert m1 == m2
    # and the stored manifest equals the returned one (modulo the
    # self-describing hash_mode column)
    stored = {r["shard"]: r.asDict() for r in
              read_manifest(spark, out).drop("hash_mode").collect()}
    assert stored == m1

    # verification green on intact data
    v = verify_shards(spark, out)
    assert v.count() == 8
    assert v.filter(~F.col("rows_match") | ~F.col("content_match")).count() == 0

    # tamper: drop one shard directory -> exactly that shard flags
    shutil.rmtree(tmp_path / "shards" / "shard=3")
    bad = verify_shards(spark, out).filter(
        ~F.col("rows_match") | ~F.col("content_match")
    ).collect()
    assert len(bad) == 1 and bad[0]["shard"] == 3
    assert bad[0]["actual_rows"] is None

    # json-lines variant roundtrips too (loader-friendly format)
    outj = str(tmp_path / "shards_json")
    export_training_shards(docs, outj, n_shards=4, fmt="json")
    vj = verify_shards(spark, outj, fmt="json")
    assert vj.count() == 4
    assert vj.filter(~F.col("rows_match") | ~F.col("content_match")).count() == 0


def test_export_manifest_advice_r9_hardening(spark, tmp_path):
    """The three ADVICE r9 export nits, each reproduced:

    1. manifest computed from READ-BACK — a nondeterministic input frame
       still verifies green (the stored manifest describes the disk);
    2. json exports with non-(long,string) columns verify green (stored
       and recomputed fingerprints both see post-round-trip types);
    3. md5canon mode: the stored manifest is bit-replayable in DuckDB
       (external audit without Spark)."""
    import duckdb
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.sources.export import (
        export_training_shards,
        manifest_sql,
        read_manifest,
        verify_shards,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )

    # 1. nondeterministic input: unseeded rand() sample — pre-read-back
    #    manifests would disagree with the written files
    nondet = docs.filter(F.rand() < 0.7)
    out_nd = str(tmp_path / "nd")
    export_training_shards(nondet, out_nd, n_shards=4)
    v = verify_shards(spark, out_nd)
    assert v.filter(~F.col("rows_match") | ~F.col("content_match")).count() == 0

    # 2. json export with int/double/timestamp columns (the types a json
    #    round trip retypes) verifies green
    typed = load_table(spark, SF_DIR_SMOKE, "orders").select(
        F.col("o_orderkey").alias("doc_id"),
        F.col("o_custkey").cast("int").alias("cust"),
        "o_totalprice",
        "o_orderdate",
    )
    out_j = str(tmp_path / "typed_json")
    export_training_shards(
        typed, out_j, n_shards=4, text_col=None, fmt="json"
    )
    vj = verify_shards(spark, out_j, text_col=None, fmt="json")
    assert vj.count() == 4
    assert vj.filter(
        ~F.col("rows_match") | ~F.col("content_match")
    ).count() == 0

    # 3. md5canon: DuckDB recomputes the manifest bit-identically from
    #    the source table
    out_c = str(tmp_path / "canon")
    export_training_shards(docs, out_c, n_shards=4, hash_mode="md5canon")
    stored = {
        r["shard"]: (r["n_rows"], r["content_xor"], r["n_tokens"])
        for r in read_manifest(spark, out_c).collect()
    }
    sql = manifest_sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR_SMOKE}/documents.parquet')",
        4,
        docs.schema,
    )
    con = duckdb.connect()
    oracle = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(sql).fetchall()
    }
    con.close()
    assert stored == oracle
    # and verify (which recomputes in md5canon from the files) is green
    vc = verify_shards(spark, out_c)
    assert vc.filter(
        ~F.col("rows_match") | ~F.col("content_match")
    ).count() == 0
