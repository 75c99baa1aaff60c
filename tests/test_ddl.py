"""Goldens for the DDL layer (plans/ddl.py), mirroring the reference's
Convert-MongoTypeToSQL mapping table (Sql_Schema_Generator.ps1:404-458),
New-SQLSchema partitioning (:57-181), the four table shapes (:199-402),
and the Convert-ToMySQLSyntax dialect mapping (Data_Migration.ps1:324-361)."""

from __future__ import annotations

import pytest

from nosql_to_sql_migration_tool_spark.operators.infer import (
    explode_json_paths,
    schema_stats,
)
from nosql_to_sql_migration_tool_spark.plans.ddl import (
    plan_tables,
    render_schema,
    render_table,
    sql_type,
)


@pytest.mark.parametrize(
    ("majority", "path", "max_len", "expected"),
    [
        ("string", "name", 10, "VARCHAR(255)"),
        ("string", "bio", 300, "VARCHAR(MAX)"),
        ("string", "_id", 5, "VARCHAR(24)"),
        ("integer", "_id", None, "VARCHAR(24)"),  # _id wins over type
        ("integer", "age", None, "INT"),
        ("number", "score", None, "DECIMAL(18,2)"),
        ("boolean", "active", None, "BIT"),
        ("datetime", "created", None, "DATETIME2"),
        ("ObjectId", "ref", None, "VARCHAR(24)"),
        ("null", "nick", None, "VARCHAR(255)"),
        ("object", "address", None, "VARCHAR(MAX)"),
        ("array", "tags", None, "VARCHAR(MAX)"),
    ],
)
def test_sql_type_mapping_goldens(majority, path, max_len, expected):
    assert sql_type(majority, path, max_len) == expected


DOCS = [
    (1, '{"_id": "a1", "name": "Alice", "age": 30, '
        '"address": {"city": "Gent", "zip": "9000"}, '
        '"tags": ["x", "y"], '
        '"items": [{"sku": "A1", "qty": 2}]}'),
    (2, '{"_id": "b2", "name": "Bob", "age": 41, '
        '"address": {"city": "Aalst", "zip": "9300"}, '
        '"tags": ["z"], '
        '"items": [{"sku": "B9", "qty": 1}]}'),
    (3, '{"_id": "c3", "name": "Carol"}'),  # sparse doc -> nullable fields
]


@pytest.fixture(scope="module")
def plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, doc string")
    stats = [
        r.asDict()
        for r in schema_stats(
            explode_json_paths(df, "doc", "doc_id"), with_type_set=True
        ).collect()
    ]
    return plan_tables(stats, "users", primary_key="_id", total_docs=3)


def test_plan_partitions_tables(plan):
    assert plan.main_table == "users"
    assert plan.table_names == [
        "users",
        "users_address",
        "users_items",
        "users_tags",
    ]
    kinds = {t.name: t.kind for t in plan.tables}
    assert kinds["users_address"] == "nested"
    assert kinds["users_items"] == "array_object"
    assert kinds["users_tags"] == "array_primitive"
    assert plan.relationships == [
        "users_address -> users (_id)",
        "users_items -> users (_id)",
        "users_tags -> users (_id)",
    ]


def test_main_table_columns_and_not_null(plan):
    main = plan.tables[0]
    cols = {c.name: c for c in main.columns}
    assert set(cols) == {"_id", "name", "age"}
    assert cols["_id"].primary_key and cols["_id"].sql_type == "VARCHAR(24)"
    # name occurs in 3/3 docs -> NOT NULL; age in 2/3 -> nullable
    assert cols["name"].not_null
    assert not cols["age"].not_null


def test_child_table_shapes(plan):
    items = next(t for t in plan.tables if t.name == "users_items")
    # field names sorted, as the reference does ($Fields.Keys | Sort-Object)
    assert [c.name for c in items.columns] == [
        "id",
        "users__id",
        "array_index",
        "qty",
        "sku",
    ]
    assert items.columns[0].identity
    tags = next(t for t in plan.tables if t.name == "users_tags")
    assert [c.name for c in tags.columns] == [
        "id",
        "users__id",
        "array_index",
        "value",
    ]
    # tags elements are all strings -> VARCHAR(MAX) per priority rule
    assert tags.columns[-1].sql_type == "VARCHAR(MAX)"


def test_primitive_value_type_priority():
    stats = [
        {"path": "xs", "majority_type": "array", "max_len": None, "n_docs": 1},
        {
            "path": "xs[]",
            "majority_type": "string",
            "max_len": 3,
            "n_docs": 1,
            # integer present anywhere in the histogram wins
            "type_set": ["integer", "string"],
        },
    ]
    plan = plan_tables(stats, "t", total_docs=1)
    tags = next(t for t in plan.tables if t.name == "t_xs")
    assert tags.columns[-1].sql_type == "INT"


def test_dialect_rendering(plan):
    items = next(t for t in plan.tables if t.name == "users_items")

    sqlserver = render_table(items, "sqlserver")
    assert "IF OBJECT_ID('users_items', 'U') IS NOT NULL" in sqlserver
    assert "[id] INT IDENTITY(1,1) PRIMARY KEY" in sqlserver
    assert "[array_index] INT NOT NULL" in sqlserver
    assert "FOREIGN KEY ([users__id]) REFERENCES users([_id])" in sqlserver

    mysql = render_table(items, "mysql")
    assert "DROP TABLE IF EXISTS users_items;" in mysql
    assert "`id` INT AUTO_INCREMENT PRIMARY KEY" in mysql
    assert "[" not in mysql

    main = render_table(plan.tables[0], "mysql")
    assert "`_id` VARCHAR(24) PRIMARY KEY" in main

    # dialect type overrides (BIT/DATETIME2/VARCHAR(MAX))
    from nosql_to_sql_migration_tool_spark.plans.ddl import ColumnPlan, TablePlan

    t = TablePlan(
        "probe",
        "main",
        [
            ColumnPlan("b", "BIT"),
            ColumnPlan("d", "DATETIME2"),
            ColumnPlan("s", "VARCHAR(MAX)"),
        ],
    )
    my = render_table(t, "mysql", include_drop=False)
    assert "TINYINT(1)" in my and "DATETIME" in my and "LONGTEXT" in my
    ansi = render_table(t, "ansi", include_drop=False)
    assert "BOOLEAN" in ansi and "TIMESTAMP" in ansi and "TEXT" in ansi

    with pytest.raises(ValueError):
        render_table(t, "oracle")


def test_drift_alter_statements(spark):
    from nosql_to_sql_migration_tool_spark.plans.ddl import (
        drift_alter_statements,
    )

    target = spark.createDataFrame([(1, "a")], "k long, name string")
    incoming = spark.createDataFrame(
        [(1, "a", 2.5, True, "x")],
        "k long, name string, score double, ok boolean, tier string",
    )
    stmts = drift_alter_statements(target, incoming, "users", "mysql")
    assert stmts == [
        "ALTER TABLE users ADD COLUMN `score` DECIMAL(18,2) NULL;",
        "ALTER TABLE users ADD COLUMN `ok` TINYINT(1) NULL;",
        "ALTER TABLE users ADD COLUMN `tier` VARCHAR(255) NULL;",
    ]
    assert drift_alter_statements(incoming, target, "users") == []


def test_export_schema_file(plan, tmp_path):
    from nosql_to_sql_migration_tool_spark.plans.ddl import export_sql_schema

    out = tmp_path / "schema_users.sql"
    export_sql_schema(plan, str(out), "mysql")
    text = out.read_text()
    assert text.count("CREATE TABLE") == 4
    assert "-- users_address -> users (_id)" in text
    assert len(render_schema(plan, "mysql")) == 4
