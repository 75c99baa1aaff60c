"""End-to-end workflow tests: schemaless JSON -> inferred schema -> DDL
script -> typed parse -> normalized parquet tables -> validation
(Invoke-FullMigration parity), then incremental sync rounds over the
written store (Invoke-IncrementalMigration parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import (
    changed_customer_source,
    ragged_documents,
)
from nosql_to_sql_migration_tool_spark.operators.infer import (
    explode_json_paths,
    schema_stats,
    spark_schema_from_stats,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from nosql_to_sql_migration_tool_spark.workflow import (
    full_migration,
    incremental_migration,
)
from tests.conftest import SF_DIR_SMOKE


def test_spark_schema_from_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, '{"name": "A", "age": 3, "address": {"city": "G"}, '
                '"tags": ["x"], "items": [{"sku": "S", "qty": 1}]}'),
            (2, '{"name": "B", "score": 1.5, "ok": true}'),
        ],
        "doc_id long, doc string",
    )
    stats = [
        r.asDict()
        for r in schema_stats(explode_json_paths(docs, "doc", "doc_id")).collect()
    ]
    schema = spark_schema_from_stats(stats)
    ddl = schema.simpleString()
    assert "name:string" in ddl and "age:bigint" in ddl
    assert "score:double" in ddl and "ok:boolean" in ddl
    assert "address:struct<city:string>" in ddl
    assert "tags:array<string>" in ddl
    assert "items:array<struct<qty:bigint,sku:string>>" in ddl


def test_full_migration_end_to_end(spark, tmp_path):
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    docs = ragged_documents(customer)
    out = str(tmp_path / "migrated")
    report = full_migration(
        spark,
        docs,
        doc_col="doc",
        id_col="doc_id",
        table_name="people",
        output_dir=out,
        dialect="mysql",
        sample_size=1000,
    )
    assert set(report.tables) == {
        "people",
        "people_address",
        "people_tags",
        "people_items",
    }
    assert report.tables["people"] == docs.count()
    # child tables only for docs that have the structure
    n_with_addr = docs.filter(F.col("doc").contains('"address"')).count()
    assert report.tables["people_address"] == n_with_addr
    assert report.tables["people_tags"] > 0
    assert report.tables["people_items"] > 0

    ddl = open(report.ddl_path).read()
    assert ddl.count("CREATE TABLE") == 4
    assert "`array_index` INT NOT NULL" in ddl  # mysql dialect

    assert report.validation["status"] == "PASSED"

    # written child tables carry parent FK + ordinal
    tags = spark.read.parquet(f"{out}/people_tags.parquet")
    assert set(tags.columns) == {"people_doc_id", "array_index", "value"}


def test_run_workflow_multi_collection(spark, tmp_path):
    import json

    from nosql_to_sql_migration_tool_spark.workflow import (
        run_migration_workflow,
    )

    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    docs = ragged_documents(customer)
    report_path = str(tmp_path / "workflow_report.json")
    reports = run_migration_workflow(
        spark,
        {"alpha": docs.limit(50), "beta": docs.limit(30)},
        "FullMigration",
        str(tmp_path / "wf"),
        doc_col="doc",
        id_col="doc_id",
        report_path=report_path,
        sample_size=50,
    )
    assert set(reports) == {"alpha", "beta"}
    assert reports["alpha"].tables["alpha"] == 50
    assert reports["beta"].tables["beta"] == 30
    written = json.load(open(report_path))
    assert written["alpha"]["validation"]["status"] == "PASSED"


def test_incremental_migration_rounds(spark, tmp_path):
    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    out = str(tmp_path / "inc")

    first = incremental_migration(
        spark, customer, "c_custkey", "customer", out, "c_nationkey"
    )
    assert first.operation == "InitialLoad"
    assert first.tables["customer"] == customer.count()

    changed = changed_customer_source(customer)
    second = incremental_migration(
        spark, changed, "c_custkey", "customer", out, "c_nationkey"
    )
    assert second.operation == "IncrementalSync"
    assert set(second.validation) == {"NEW", "UPDATED", "DELETED", "UNCHANGED"}
    assert second.tables["customer"] == changed.count()

    # a third run with the same source is a no-op sync
    third = incremental_migration(
        spark, changed, "c_custkey", "customer", out, "c_nationkey"
    )
    assert set(third.validation) == {"UNCHANGED"}


def test_clean_corpus_pipeline(spark):
    """End-to-end corpus cleaning: quality gate -> exact dedup -> near
    dedup -> decontamination -> packing, with monotone shrinking counts
    and windows only over survivors."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.fixtures import (
        duplicated_documents,
    )
    from nosql_to_sql_migration_tool_spark.pipeline import clean_corpus
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = duplicated_documents(load_table(spark, SF_DIR_SMOKE, "documents"))
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    clean, windows, rep = clean_corpus(docs, eval_set, report=True)

    assert rep is not None
    assert (
        rep.n_input >= rep.n_quality >= rep.n_exact >= rep.n_near
        >= rep.n_clean > 0
    )
    # exact dedup actually removed the planted byte-identical copies
    assert rep.n_exact < rep.n_quality
    # every window row is a surviving document, exactly once
    assert windows.count() == rep.n_clean
    assert windows.join(clean, "doc_id", "left_anti").count() == 0
    # eval members that survived this far are heavily contaminated by
    # construction (they ARE the eval set) and must have been dropped
    assert clean.filter(F.col("doc_id") % 97 == 0).count() == 0


def test_clean_corpus_keep_best_policy(spark):
    """keep_best survivorship yields one doc per near-dup component —
    same component count as greedy on this fixture (planted dups only),
    but the kept ids may differ because the LONGEST copy wins."""
    from pyspark.sql import functions as F

    from nosql_to_sql_migration_tool_spark.fixtures import (
        duplicated_documents,
    )
    from nosql_to_sql_migration_tool_spark.pipeline import clean_corpus
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    docs = duplicated_documents(load_table(spark, SF_DIR_SMOKE, "documents"))
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    greedy, _, _ = clean_corpus(docs, eval_set)
    best, windows, _ = clean_corpus(docs, eval_set, keep_best=True)
    assert best.count() == greedy.count()
    assert windows.join(best, "doc_id", "left_anti").count() == 0
    # no surviving doc is a near-dup of another survivor
    from nosql_to_sql_migration_tool_spark.operators.dedup import (
        near_dup_pairs,
    )

    assert near_dup_pairs(best).count() == 0
