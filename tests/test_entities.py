"""Entity-lite mining (round 14, r15 queue): span-extraction hand
semantics, top-k determinism, cross-engine parity over the documents
corpus, and the shuffle-minimal plan."""

from __future__ import annotations

import duckdb

from nosql_to_sql_migration_tool_spark.operators.entities import (
    entity_counts,
    entity_counts_sql,
    entity_spans,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def test_entity_spans_hand_semantics(spark):
    rows = spark.createDataFrame(
        [
            (1, "We moved New York data to Apache Spark at New York."),
            (2, "lowercase only, no entities here"),
            (3, "Singleton Capitals Are fine but Lone ones are not X Y"),
        ],
        "doc_id long, text string",
    )
    got = [(r["doc_id"], r["entity"]) for r in entity_spans(rows).collect()]
    # duplicates within a doc preserved; single capitalized words never
    # extracted; adjacent TitleCase runs fold into ONE maximal span
    assert got.count((1, "New York")) == 2
    assert (1, "Apache Spark") in got
    assert all(d != 2 for d, _ in got)
    assert (3, "Singleton Capitals Are") in got
    assert all(" " in e for _, e in got)  # no single-word spans


def test_entity_counts_topk_and_parity(spark):
    """Parity over the TitleCase fixture — the registered
    configuration. The raw driver corpus is all-lowercase, so parity
    over it would pass vacuously on two empty lists (the r15 lesson:
    entity_counts over raw documents returned 0 rows)."""
    from nosql_to_sql_migration_tool_spark.fixtures import (
        TITLECASED_DOCUMENTS_SQL,
        titlecased_documents,
    )

    docs = titlecased_documents(
        load_table(spark, SF_DIR_SMOKE, "documents").select("doc_id", "text")
    )
    mine = [tuple(r) for r in entity_counts(docs, k=20).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/documents.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            entity_counts_sql(f"({TITLECASED_DOCUMENTS_SQL})", k=20)
        ).fetchall()
    ]
    con.close()
    assert mine == want
    assert len(mine) == 20  # NON-vacuous: the fixture produces spans
    # ordered by occurrences desc then entity asc, counts sane
    occ = [n for _, _, n in mine]
    assert occ == sorted(occ, reverse=True)
    assert all(nd <= n for _, nd, n in mine)


def test_entity_counts_plan_is_takeordered_scan(spark):
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        global_windows,
        python_stage_count,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    df = entity_counts(docs, k=50)
    assert cartesian_products(df) == 0
    assert python_stage_count(df) == 0
    assert global_windows(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    # ADVICE r14: the exact count_distinct(doc_id) column costs the
    # standard TWO-shuffle partial-distinct expansion — pin it so the
    # docstring's stated shape stays honest (a third shuffle would be
    # a regression; one would mean the distinct silently vanished).
    assert plan.count("Exchange hashpartitioning") == 2


def test_scrub_entities_hand_semantics_and_parity(spark):
    """r15 (r16 queue): scrub_entities — the decontamination action for
    the blast-radius table. Hand case: longest-first maximal munch,
    word boundaries, per-doc hit counts; then whole-corpus cross-engine
    parity over the TitleCase fixture using entity_counts' own top
    entities; then the end-to-end invariant: after the scrub, the
    scrubbed entities mine to ZERO mentions."""
    import pytest

    from nosql_to_sql_migration_tool_spark.fixtures import (
        TITLECASED_DOCUMENTS_SQL,
        titlecased_documents,
    )
    from nosql_to_sql_migration_tool_spark.operators.entities import (
        scrub_entities,
        scrub_entities_sql,
    )

    rows = spark.createDataFrame(
        [
            (1, "We like New York City and New York and york."),
            (2, "Nothing to scrub here."),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_entity"])
        for r in scrub_entities(
            rows, ["New York", "New York City"]
        ).collect()
    }
    # maximal munch: the CITY span is one hit, not "New York" + "City";
    # the bare lowercase "york" is boundary-safe and untouched
    assert got[1] == ("We like <ENTITY> and <ENTITY> and york.", 2)
    assert got[2] == ("Nothing to scrub here.", 0)

    with pytest.raises(ValueError, match="outside"):
        scrub_entities(rows, ["bad(regex"])
    with pytest.raises(ValueError, match="empty"):
        scrub_entities(rows, [])

    # corpus parity on the registered fixture, entities from the miner
    docs = titlecased_documents(
        load_table(spark, SF_DIR_SMOKE, "documents").select("doc_id", "text")
    )
    ents = [r["entity"] for r in entity_counts(docs, k=10).collect()]
    mine = sorted(
        tuple(r) for r in scrub_entities(docs, ents).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            scrub_entities_sql(TITLECASED_DOCUMENTS_SQL, ents)
        ).fetchall()
    )
    con.close()
    assert mine == want and any(n > 0 for _, _, n in mine)

    # decontamination invariant: scrubbed entities mine to zero
    scrubbed = scrub_entities(docs, ents).select("doc_id", "text")
    remaining = {
        r["entity"] for r in entity_counts(scrubbed, k=50).collect()
    }
    assert not (set(ents) & remaining)


def test_scrub_entities_plan_is_projection_only(spark):
    from nosql_to_sql_migration_tool_spark.operators.entities import (
        scrub_entities,
    )
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        cartesian_products,
        python_stage_count,
    )

    docs = load_table(spark, SF_DIR_SMOKE, "documents").select(
        "doc_id", "text"
    )
    df = scrub_entities(docs, ["Alpha Beta", "Gamma"])
    assert cartesian_products(df) == 0
    assert python_stage_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
