"""Report renderer goldens (Export-MigrationLog / Export-SyncReport /
Export-ValidationReport / Display-SchemaResults parity)."""

from __future__ import annotations

from nosql_to_sql_migration_tool_spark.reports import (
    export_report,
    render_migration_log,
    render_schema_results,
    render_sync_report,
    render_validation_html,
)
from nosql_to_sql_migration_tool_spark.workflow import MigrationReport


def test_migration_log():
    r = MigrationReport(
        "users",
        "FullMigration",
        tables={"users": 100, "users_tags": 250},
        ddl_path="/tmp/schema_users.sql",
        validation={"status": "PASSED", "issues": 0},
        duration_sec=12.34,
    )
    log = render_migration_log(r)
    assert "Operation: FullMigration" in log
    assert "  - users_tags: 250 rows" in log
    assert "Total rows loaded: 350" in log
    assert "status: PASSED" in log


def test_sync_report():
    txt = render_sync_report(
        {"NEW": 3, "UPDATED": 2, "DELETED": 1, "UNCHANGED": 94}, "users"
    )
    assert "Documents processed: 100" in txt
    assert "  DELETED: 1" in txt


def test_validation_html(tmp_path):
    html = render_validation_html(
        {"status": "PARTIAL", "samples_failed": 2, "issues": 3}, "users"
    )
    assert "PARTIAL" in html and "#f39c12" in html
    assert "<td>samples_failed</td><td>2</td>" in html
    out = export_report(html, str(tmp_path / "report.html"))
    assert open(out).read() == html


def test_schema_results_display():
    stats = [
        {"path": "name", "majority_type": "string", "n_docs": 3,
         "n_values": 3, "max_len": 5},
        {"path": "age", "majority_type": "integer", "n_docs": 2,
         "n_values": 2, "max_len": None},
    ]
    txt = render_schema_results(stats, total_docs=3)
    assert "100.0%" in txt  # name occurs in all docs
    assert "66.7%" in txt  # age in 2/3
    assert "integer" in txt
