"""Config-file surface (sources/config.py): Get-AppConfig +
Initialize-DatabaseConnections parity, executed end-to-end against the
embedded Derby target."""

from __future__ import annotations

import json

import pytest

from nosql_to_sql_migration_tool_spark.sources.config import (
    connector_options_from_config,
    initialize_connections,
    load_app_config,
)

CONFIG = {
    "MongoDB": {
        "ConnectionString": "mongodb://fake",
        "Database": "testdb",
        "Collection": "users",
    },
    "MySQL": {
        "Server": "nohost.invalid",
        "Database": "testdb",
        "Port": 3306,
        "Username": "u",
        "Password": "p",
    },
}


def test_load_app_config_errors_and_roundtrip(tmp_path):
    p = tmp_path / "config.json"
    with pytest.raises(FileNotFoundError, match="Config file not found"):
        load_app_config(str(p))
    p.write_text("{not json")
    with pytest.raises(ValueError, match="not valid JSON"):
        load_app_config(str(p))
    p.write_text(json.dumps(CONFIG))
    assert load_app_config(str(p)) == CONFIG


def test_section_mapping_uses_reference_key_names():
    mongo = connector_options_from_config(CONFIG, "MongoDB")
    assert mongo == {
        "connection.uri": "mongodb://fake",
        "database": "testdb",
        "collection": "users",
    }
    mysql = connector_options_from_config(CONFIG, "MySQL", table="orders")
    assert mysql["url"] == "jdbc:mysql://nohost.invalid:3306/testdb"
    assert mysql["dbtable"] == "orders"
    assert mysql["user"] == "u" and mysql["password"] == "p"
    with pytest.raises(KeyError, match="no 'SQLServer' section"):
        connector_options_from_config(CONFIG, "SQLServer")


def test_initialize_connections_executes_probes(spark, tmp_path):
    """The bootstrap flow EXECUTED: a config-declared embedded Derby
    endpoint probes True, the unreachable MySQL probes False, MongoDB
    reports False (no executable probe here) — and config-built Derby
    options drive a real write/read round trip."""
    from nosql_to_sql_migration_tool_spark.sources.connectors import (
        jdbc_roundtrip,
    )
    from nosql_to_sql_migration_tool_spark.sources.registry import load_table
    from tests.conftest import SF_DIR_SMOKE

    config = dict(CONFIG)
    config["Derby"] = {
        "DatabasePath": str(tmp_path / "appdb"),
        "Table": "nation_cfg",
    }
    got = initialize_connections(
        spark, config, ["Derby", "MySQL", "MongoDB"]
    )
    assert got == {"Derby": True, "MySQL": False, "MongoDB": False}

    nation = load_table(spark, SF_DIR_SMOKE, "nation")
    opts = connector_options_from_config(config, "Derby")
    back = jdbc_roundtrip(nation, opts)
    assert back.count() == nation.count()
