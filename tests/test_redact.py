"""PII redaction (round 13): hand semantics (chain order, overlap,
multi-hit), planted-fixture cross-engine parity, nothing left behind,
and the shuffle-free single-projection plan."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import (
    PII_DOCUMENTS_SQL,
    pii_documents,
)
from nosql_to_sql_migration_tool_spark.operators.redact import (
    redact_pii,
    redact_pii_sql,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_redact_hand_cases(spark):
    rows = spark.createDataFrame(
        [
            (1, "mail a.user+x@sub.example.org now"),
            (2, "hosts 10.0.0.1 and 192.168.255.254."),
            (3, "call 555-123-4567 or 555.987.6543"),
            (4, "multi x@y.io at 1.2.3.4 call 555-111-2222"),
            (5, "clean text, nothing to scrub"),
            (6, "not-an-ip 1234.5.6.7890 stays"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in redact_pii(rows).collect()}
    assert got[1]["text"] == "mail <EMAIL> now"
    assert got[1]["n_email"] == 1 and got[1]["n_ipv4"] == 0
    assert got[2]["text"] == "hosts <IP> and <IP>."
    assert got[2]["n_ipv4"] == 2
    assert got[3]["text"] == "call <PHONE> or <PHONE>"
    assert got[3]["n_phone"] == 2
    assert got[4]["text"] == "multi <EMAIL> at <IP> call <PHONE>"
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (
        1, 1, 1,
    )
    assert got[5]["text"] == "clean text, nothing to scrub"
    assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_phone"]) == (
        0, 0, 0,
    )
    # \b guards: a 4-digit first octet is not an IPv4
    assert got[6]["n_ipv4"] == 0 and "1234.5.6.7890" in got[6]["text"]


def test_redact_fixture_parity_and_completeness(spark):
    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    planted = pii_documents(docs)
    out = redact_pii(planted)
    rows = out.collect()
    # the plants were found: every doc_id % 13 == 0 doc has one email...
    for r in rows:
        k = r["doc_id"]
        assert r["n_email"] == (1 if k % 13 == 0 else 0), k
        assert r["n_ipv4"] == (1 if k % 11 == 0 else 0), k
        assert r["n_phone"] == (1 if k % 7 == 0 else 0), k
    # ...and nothing PII-shaped survives the chain: re-run the counter
    # over the REDACTED text
    redacted = out.select("doc_id", "text")
    n_left = redact_pii(redacted).agg(
        F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
    ).collect()[0][0]
    assert n_left == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            redact_pii_sql(PII_DOCUMENTS_SQL)
        ).fetchall()
    )
    con.close()
    mine = sorted(
        (r["doc_id"], r["text"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in rows
    )
    assert mine == want and len(mine) > 0


def test_redact_plan_is_single_projection(spark):
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        python_stage_count,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    df = redact_pii(pii_documents(docs))
    assert python_stage_count(df) == 0
    assert cartesian_products(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # shuffle-free narrow projection


def test_redact_matches_python_re_on_fuzzed_text(spark):
    """Third-engine check: the Java (Spark) and RE2 (DuckDB) parity
    test above could share a blind spot, so the same chain replayed
    with Python's ``re`` must agree on fuzzed ASCII text mixing PII
    shards with near-misses."""
    import random
    import re

    from nosql_to_sql_migration_tool_spark.operators.redact import (
        PII_PATTERNS,
    )

    rng = random.Random(13)
    frags = [
        "plain word", "a@b.io", "x.y@mail.example.com", "not@@bad",
        "10.0.0.1", "999.999.999.999", "1234.5.6.7", "555-123-4567",
        "555.9.1", "call 555.987.6543 now", "v1.2.3", "a@b", ".com",
        "user_%+x@ex-a.mple.org", "0.0.0.0", "12-34-5678",
    ]
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]

    def py_chain(t):
        out = []
        for _, pat, rep in PII_PATTERNS:
            out.append(len(re.findall(pat, t)))
            t = re.sub(pat, rep, t)
        return (t, *out)

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in redact_pii(df).collect()
    }
    for i, t in rows:
        assert got[i] == py_chain(t), (i, t)
