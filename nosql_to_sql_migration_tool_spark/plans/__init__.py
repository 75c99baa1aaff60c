from nosql_to_sql_migration_tool_spark.plans.ddl import (
    ColumnPlan,
    SchemaPlan,
    TablePlan,
    export_sql_schema,
    plan_tables,
    render_schema,
    render_table,
    sql_type,
    sql_type_expr,
)

__all__ = [
    "ColumnPlan",
    "SchemaPlan",
    "TablePlan",
    "export_sql_schema",
    "plan_tables",
    "render_schema",
    "render_table",
    "sql_type",
    "sql_type_expr",
]
