"""Unit tests for document->relational normalization (operators/normalize_docs):
naming conventions, deep-leaf flattening, null-document handling, and the
whole-table pipeline partitioning. The oracle-parity suite covers the
value-level contract against DuckDB UNNEST."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import nested_customer
from nosql_to_sql_migration_tool_spark.operators import normalize_docs as N
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return nested_customer(load_table(spark, SF_DIR_SMOKE, "customer"))


def test_normalize_partitions_tables(docs):
    tables = N.normalize_document_table(docs, "_id", "customer")
    assert set(tables) == {
        "customer",
        "customer_address",
        "customer_tags",
        "customer_items",
    }
    assert tables["customer"].columns == ["_id", "name", "acctbal"]
    assert tables["customer_address"].columns == ["customer__id", "city", "zip"]
    assert tables["customer_tags"].columns == [
        "customer__id",
        "array_index",
        "value",
    ]
    assert tables["customer_items"].columns == [
        "customer__id",
        "array_index",
        "sku",
        "qty",
    ]


def test_null_documents_produce_no_child_rows(docs):
    n_total = docs.count()
    n_with_address = docs.filter(F.col("address").isNotNull()).count()
    assert n_with_address < n_total  # fixture really has NULLs
    child = N.flatten_struct(docs, "_id", "address", "customer")
    assert child.count() == n_with_address
    # one child row per parent (nested object, not array)
    assert child.select("customer__id").distinct().count() == n_with_address


def test_array_index_is_dense_zero_based(docs):
    tags = N.explode_array_of_primitives(docs, "_id", "tags", "customer")
    per_parent = tags.groupBy("customer__id").agg(
        F.min("array_index").alias("lo"),
        F.max("array_index").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = per_parent.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count()
    assert bad == 0


def test_deep_struct_flattens_to_dotted_leaves(spark):
    df = spark.createDataFrame(
        [(1, (("a", 2.0),))],
        "k long, root struct<geo: struct<name: string, lat: double>>",
    )
    child = N.flatten_struct(df, "k", "root", "t")
    assert child.columns == ["t_k", "geo.name", "geo.lat"]
    row = child.collect()[0]
    assert row["t_k"] == 1 and row["geo.name"] == "a"


def test_type_errors(docs):
    with pytest.raises(TypeError):
        N.flatten_struct(docs, "_id", "tags", "customer")
    with pytest.raises(TypeError):
        N.explode_array_of_structs(docs, "_id", "tags", "customer")
    with pytest.raises(TypeError):
        N.explode_array_of_primitives(docs, "_id", "address", "customer")


def test_surrogate_ids_unique(docs):
    child = N.with_surrogate_id(
        N.explode_array_of_structs(docs, "_id", "items", "customer")
    )
    total = child.count()
    assert child.select("id").distinct().count() == total
