"""Edge cases for the corpus scrub pass (operators/cleaning.py); the
oracle-parity gate covers corpus-level cross-engine values."""

from __future__ import annotations

from nosql_to_sql_migration_tool_spark.operators.cleaning import (
    with_clean_text,
)


def _clean(spark, *texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in with_clean_text(df).collect()}


def test_html_strip_and_entities(spark):
    rows = _clean(
        spark,
        "<div class='x'>a &amp; b</div>\n\n<br/>c",
        "no markup here",
        "",
    )
    assert rows[0]["clean_text"] == "a & b c"
    assert rows[1]["clean_text"] == "no markup here"
    assert rows[2]["clean_text"] == ""


def test_pii_masking_order_and_counts(spark):
    rows = _clean(
        spark,
        "mail a@b.co and c.d@e-f.org now",
        "host 10.0.0.1 and 255.255.255.255",
        "call +1 (555) 123-4567 ok",
        "ip 1.2.3.4 then phone 555-123-4567",
    )
    assert rows[0]["clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert rows[0]["n_emails"] == 2
    assert rows[1]["clean_text"] == "host <IP> and <IP>"
    assert rows[1]["n_ips"] == 2 and rows[1]["n_phones"] == 0
    assert rows[2]["clean_text"] == "call <PHONE> ok"
    assert rows[2]["n_phones"] == 1
    # the IP is masked BEFORE the phone pattern can swallow it
    assert rows[3]["clean_text"] == "ip <IP> then phone <PHONE>"
    assert rows[3]["n_ips"] == 1 and rows[3]["n_phones"] == 1
