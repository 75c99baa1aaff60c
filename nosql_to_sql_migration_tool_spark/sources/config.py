"""Application configuration surface — the reference's config-file
layer (Get-AppConfig, ``private/Config.ps1:14-24``: JSON with MongoDB /
MySQL / SQLServer sections holding connection settings) and its
connection bootstrap (Initialize-DatabaseConnections,
``private/Connection_DB.ps1:160-218``: load config, probe each required
endpoint, return an overall bool).

Spark-first restatement: the config maps straight onto the option-dict
builders in ``connectors.py`` — the SAME keys the reference's JSON uses
(Server/Database/Port/Username/Password, ConnectionString/Database/
Collection) — and the bootstrap executes the real ``test_connection``
probe per endpoint. A ``Derby`` section makes the whole flow executable
in this environment (embedded database, no server); Mongo/MySQL/
SQL Server sections carry the identical shape against live endpoints.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from nosql_to_sql_migration_tool_spark.sources.connectors import (
    derby_options,
    jdbc_options,
    mongo_options,
    test_connection,
)


def load_app_config(path: str) -> dict:
    """Get-AppConfig parity: read + parse the JSON configuration.
    Raises ``FileNotFoundError`` with the reference's message shape
    when the file is absent (Config.ps1:19-21) and ``ValueError`` on
    malformed JSON instead of an opaque parser traceback."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError as exc:
        raise ValueError(f"Config file is not valid JSON: {path}: {exc}") from exc


def connector_options_from_config(
    config: dict, section: str, table: str | None = None
) -> dict[str, str]:
    """Map a config section to reader/writer options using the SAME key
    names the reference's config.json uses. Sections: ``MongoDB``
    (ConnectionString/Database/Collection), ``MySQL`` / ``SQLServer``
    (Server/Database/Port/Username/Password), plus ``Derby``
    (DatabasePath) for the embedded executable target."""
    if section not in config:
        raise KeyError(f"config has no {section!r} section")
    c = config[section]
    if section == "MongoDB":
        return mongo_options(
            c["ConnectionString"], c["Database"], table or c.get("Collection", "")
        )
    if section in ("MySQL", "SQLServer"):
        return jdbc_options(
            "mysql" if section == "MySQL" else "sqlserver",
            c["Server"],
            c["Database"],
            table or c.get("Table", ""),
            user=c.get("Username"),
            password=c.get("Password"),
            port=c.get("Port"),
        )
    if section == "Derby":
        return derby_options(c["DatabasePath"], table or c.get("Table", ""))
    raise KeyError(f"unknown config section {section!r}")


def initialize_connections(
    spark: SparkSession, config: dict, sections: list[str]
) -> dict[str, bool]:
    """Initialize-DatabaseConnections parity: probe every required
    endpoint, return per-section reachability (the reference ANDs these
    into one bool — ``all(result.values())``; per-section detail is
    strictly more useful and the AND is one call away). JDBC-backed
    sections run the EXECUTED ``test_connection`` probe; MongoDB runs a
    real 1-row read probe that reports False when the connector package
    or server is absent (ADVICE r6: probed, not hardcoded — against a
    live server with the connector on the classpath the same call
    returns True)."""
    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        probe_mongo,
    )

    out: dict[str, bool] = {}
    for section in sections:
        opts = connector_options_from_config(config, section)
        if section == "MongoDB":
            out[section] = probe_mongo(spark, opts)
        else:
            out[section] = test_connection(spark, opts)
    return out
