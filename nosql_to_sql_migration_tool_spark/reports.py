"""Report sinks — the reference's log/report exports as renderers over
the engine's small result objects (Export-MigrationLog,
private/Data_Migration.ps1:429-479; Export-SyncReport,
private/Sync.ps1:720-772; Export-ValidationReport HTML,
private/Migration_Validation.ps1:420-576; Display-SchemaResults,
private/Analyze_scheme.ps1:269-349).

Renderers take already-computed small results (a MigrationReport, a
validation verdict row, collected inference stats) — they never trigger
jobs themselves, so reporting cost is independent of data scale.
"""

from __future__ import annotations

from datetime import datetime, timezone

from nosql_to_sql_migration_tool_spark.workflow import MigrationReport

_RULE = "=" * 60


def _now() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def render_migration_log(report: MigrationReport) -> str:
    """Text migration log (Export-MigrationLog parity)."""
    lines = [
        _RULE,
        f"Migration Log - {_now()}",
        _RULE,
        "",
        f"Operation: {report.operation}",
        f"Duration: {report.duration_sec:.1f}s",
        f"Total rows loaded: {report.total_rows}",
        "",
        "Tables created:",
        *[f"  - {name}: {rows} rows" for name, rows in report.tables.items()],
    ]
    if report.ddl_path:
        lines += ["", f"DDL script: {report.ddl_path}"]
    if report.validation:
        lines += ["", "Validation:"]
        lines += [f"  {k}: {v}" for k, v in report.validation.items()]
    return "\n".join(lines) + "\n"


def render_sync_report(counts: dict[str, int], table_name: str) -> str:
    """Text sync report (Export-SyncReport parity) over the diff's
    change-type counters."""
    total = sum(counts.values())
    lines = [
        _RULE,
        f"Incremental Sync Report - {table_name} - {_now()}",
        _RULE,
        "",
        f"Documents processed: {total}",
        *[
            f"  {kind}: {counts.get(kind, 0)}"
            for kind in ("NEW", "UPDATED", "DELETED", "UNCHANGED")
        ],
    ]
    return "\n".join(lines) + "\n"


def render_validation_html(verdict: dict, table_name: str) -> str:
    """HTML validation report (Export-ValidationReport parity): status
    banner + metric table."""
    status = verdict.get("status", "ERROR")
    color = {"PASSED": "#27ae60", "PARTIAL": "#f39c12"}.get(status, "#c0392b")
    metrics = "\n".join(
        f"<tr><td>{k}</td><td>{v}</td></tr>"
        for k, v in verdict.items()
        if k != "status"
    )
    return f"""<!DOCTYPE html>
<html><head><title>Validation Report - {table_name}</title></head>
<body>
<h1>Migration Validation Report: {table_name}</h1>
<div style="background:{color};color:white;padding:10px">{status}</div>
<p>Generated {_now()}</p>
<table border="1">
<tr><th>Metric</th><th>Value</th></tr>
{metrics}
</table>
</body></html>
"""


def render_schema_results(stats: list[dict], total_docs: int) -> str:
    """Schema-inference display (Display-SchemaResults parity):
    per-path occurrence %, majority type, value counts."""
    lines = [
        _RULE,
        f"Inferred schema ({len(stats)} paths over {total_docs} documents)",
        _RULE,
        f"{'path':<30} {'type':<10} {'occur%':>7} {'values':>7} {'max_len':>8}",
    ]
    for s in sorted(stats, key=lambda s: s["path"]):
        pct = 100.0 * s["n_docs"] / total_docs if total_docs else 0.0
        max_len = s.get("max_len")
        lines.append(
            f"{s['path']:<30} {s['majority_type']:<10} {pct:>6.1f}% "
            f"{s['n_values']:>7} {max_len if max_len is not None else '-':>8}"
        )
    return "\n".join(lines) + "\n"


def export_report(text: str, path: str) -> str:
    with open(path, "w") as fh:
        fh.write(text)
    return path
