"""Entity-resolution completion (round 15 build, r17 queue): the match
relation's transitive CLUSTER closure and per-cluster GOLDEN-RECORD
survivorship.

The linkage family (round 12-15) ends at the thresholded match store;
a migration that consolidates duplicate entities (the reference's end
goal — one clean SQL row per real-world entity, reference
``private/Sync.ps1:125-163`` classify + ``private/Data_Migration.ps1``
upsert generalized to keyless data) needs two more steps:

  er_matches   -> self-ER match relation over ONE messy table
  er_clusters  -> connected components over matches (two-star reuse)
  er_golden_records -> one consolidated row per cluster under
                       reviewable per-field survivorship policies

Covered here: closure semantics on hand chains, each survivorship
policy's exact semantics (canonical/min/max/mode incl. NULL and
tie-break), rule validation, and cross-engine parity of both outputs
against the DuckDB recursive-CTE / window twins on the
``messy_customers`` self-ER fixture."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nosql_to_sql_migration_tool_spark.fixtures import (
    MESSY_CUSTOMERS_SQL,
    messy_customers,
)
from nosql_to_sql_migration_tool_spark.operators.linkage import (
    er_clusters,
    er_clusters_sql,
    er_golden_records,
    er_golden_records_sql,
    er_matches,
    er_matches_sql,
)
from nosql_to_sql_migration_tool_spark.sources.registry import load_table
from tests.conftest import SF_DIR_SMOKE

# The self-ER model: block on natural fields (the surrogate key differs
# between duplicate rows BY DEFINITION, so key-derived blocks like
# `custkey % 997` can never pair a record with its duplicate); score on
# the same three fields the linkage family uses.
_PARAMS = {
    "c_name": (0.95, 0.001),
    "c_acctbal": (0.9, 0.01),
    "c_mktsegment": (0.95, 0.2),
}
_PASSES = [
    ("c_nationkey", "c_name"),       # exact-name pass (near-unique names)
    ("c_mktsegment", "c_acctbal"),   # catches name-corrupted duplicates
]
_THRESHOLD = 2_000_000


def test_er_clusters_transitive_chain(spark):
    """A match CHAIN a~b~c collapses to one entity labelled by the min
    member id; unmatched records are singleton entities labelled by
    their own id."""
    ents = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11)], ["id"]
    )
    matches = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["id"]: r["entity_id"]
        for r in er_clusters(ents, matches, "id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 10: 10, 11: 10}


def test_er_golden_records_policies(spark):
    """canonical = value from the min-id member; min/max = field
    extremes; mode = most frequent non-NULL value, ties to the smallest
    value; a mode field with no non-NULL values in a cluster yields
    NULL (left join, cluster is kept)."""
    ents = spark.createDataFrame(
        [
            # cluster 1: ids 1,2,3
            (1, "alpha", 5.0, "B"),
            (2, "beta", 9.0, "A"),
            (3, "gamma", 1.0, "A"),
            # cluster 10: ids 10,11 — mode tie (one X, one W) -> "W"
            (10, "delta", 2.0, "X"),
            (11, "epsilon", 4.0, "W"),
            # singleton 20 with NULL mode field
            (20, "zeta", 7.0, None),
        ],
        ["id", "name", "bal", "seg"],
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        ["id", "entity_id"],
    )
    rules = {"name": "canonical", "bal": "max", "seg": "mode"}
    got = {
        r["entity_id"]: (r["n_members"], r["name"], r["bal"], r["seg"])
        for r in er_golden_records(ents, clusters, "id", rules).collect()
    }
    assert got == {
        1: (3, "alpha", 9.0, "A"),
        10: (2, "delta", 4.0, "W"),
        20: (1, "zeta", 7.0, None),
    }
    # min policy on the same frame
    got_min = {
        r["entity_id"]: r["bal"]
        for r in er_golden_records(
            ents, clusters, "id", {"bal": "min"}
        ).collect()
    }
    assert got_min == {1: 1.0, 10: 2.0, 20: 7.0}


def test_er_golden_records_rejects_unknown_policy(spark):
    ents = spark.createDataFrame([(1, "a")], ["id", "name"])
    clusters = spark.createDataFrame([(1, 1)], ["id", "entity_id"])
    with pytest.raises(ValueError, match="policy"):
        er_golden_records(ents, clusters, "id", {"name": "newest"})


def test_er_matches_recovers_rekeyed_duplicates(spark):
    """On the messy fixture every re-keyed dirty twin whose name OR
    acctbal survived corruption matches its clean original (pass 1
    blocks clean-name twins, pass 2 blocks clean-balance twins); a twin
    with BOTH fields corrupted (custkey % 391 == 0) is unreachable by
    either pass and stays a singleton — the documented multi-pass
    residue."""
    m = messy_customers(load_table(spark, SF_DIR_SMOKE, "customer"))
    matches = er_matches(m, _PASSES, _PARAMS, "c_custkey", _THRESHOLD)
    got = {(r["id_a"], r["id_b"]) for r in matches.collect()}
    surviving = {
        r["c_custkey"] - 1_000_000
        for r in m.filter(F.col("c_custkey") > 1_000_000)
        .select("c_custkey")
        .collect()
    }
    want = {
        (k, k + 1_000_000)
        for k in surviving
        if not (k % 17 == 0 and k % 23 == 0)
    }
    missing = want - got
    assert not missing, sorted(missing)[:5]
    # both-fields-corrupted twins never match their original
    assert all(
        not (a % 17 == 0 and a % 23 == 0 and b == a + 1_000_000)
        for a, b in got
    )


def test_er_clusters_parity_on_messy_fixture(spark):
    m = messy_customers(load_table(spark, SF_DIR_SMOKE, "customer"))
    matches = er_matches(m, _PASSES, _PARAMS, "c_custkey", _THRESHOLD)
    mine = sorted(
        map(tuple, er_clusters(m, matches, "c_custkey").collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/customer.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            er_clusters_sql(
                MESSY_CUSTOMERS_SQL,
                er_matches_sql(
                    MESSY_CUSTOMERS_SQL,
                    _PASSES,
                    _PARAMS,
                    "c_custkey",
                    _THRESHOLD,
                ),
                "c_custkey",
            )
        ).fetchall()
    )
    con.close()
    assert mine == want
    # non-vacuous: real multi-member clusters exist
    assert len(mine) > len({e for _, e in mine}) > 0


def test_er_golden_records_parity_on_messy_fixture(spark):
    """End-to-end survivorship parity: canonical name (min-id member =
    the clean record, so ' X' corruption never survives), max acctbal
    (keeps the +0.5 drift — deliberately visible), mode segment."""
    rules = {
        "c_name": "canonical",
        "c_acctbal": "max",
        "c_mktsegment": "mode",
    }
    m = messy_customers(load_table(spark, SF_DIR_SMOKE, "customer"))
    matches = er_matches(m, _PASSES, _PARAMS, "c_custkey", _THRESHOLD)
    clusters = er_clusters(m, matches, "c_custkey")
    mine = sorted(
        map(
            tuple,
            er_golden_records(m, clusters, "c_custkey", rules).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/customer.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            er_golden_records_sql(
                MESSY_CUSTOMERS_SQL,
                er_matches_sql(
                    MESSY_CUSTOMERS_SQL,
                    _PASSES,
                    _PARAMS,
                    "c_custkey",
                    _THRESHOLD,
                ),
                "c_custkey",
                rules,
            )
        ).fetchall()
    )
    con.close()
    assert mine == want and len(mine) > 0
    # the ' X' name corruption never survives consolidation: canonical
    # takes the min-id member, and clean originals have the lower id
    assert not any(
        name.endswith(" X")
        for _, n, name, _, _ in mine
        if n > 1
    )


def test_update_er_clusters_incremental_equals_full(spark):
    """The churn-bounded IVM contract applied to ER: start from the
    clean customers as all-singleton labels, fold in the re-keyed dirty
    copy as one ingest batch (its matches + its new entities) — the
    incrementally maintained labels must equal the full ``er_clusters``
    recompute over the whole messy table, row for row."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        update_er_clusters,
    )

    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    m = messy_customers(customer)
    clean = m.filter(F.col("c_custkey") < 1_000_000)
    dirty = m.filter(F.col("c_custkey") >= 1_000_000)
    # initial state: clean entities only, no matches -> all singletons
    initial = clean.select(
        "c_custkey", F.col("c_custkey").alias("entity_id")
    )
    all_matches = er_matches(m, _PASSES, _PARAMS, "c_custkey", _THRESHOLD)
    got = sorted(
        map(
            tuple,
            update_er_clusters(
                initial, all_matches, "c_custkey", new_entities=dirty
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, er_clusters(m, all_matches, "c_custkey").collect())
    )
    assert got == want and len(got) > 0


def test_update_er_clusters_covers_batch_internal_duplicates(spark):
    """The completeness contract: a batch carrying its OWN duplicate
    pair must fold correctly when the caller supplies base x batch
    matches UNION batch-internal matches (and would be missed by the
    base x batch side alone)."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        multi_pass_linkage_scores,
        update_er_clusters,
    )

    base = spark.createDataFrame(
        [(1, 0, "alice", "A"), (2, 0, "bob", "B")],
        ["id", "blk", "name", "seg"],
    )
    # ids 10/11 duplicate EACH OTHER (names agree) and nothing in base
    batch = spark.createDataFrame(
        [(10, 0, "carol", "A"), (11, 0, "carol", "B")],
        ["id", "blk", "name", "seg"],
    )
    params = {"name": (0.95, 0.001), "seg": (0.9, 0.2)}
    thresh = 2_000_000
    labels = base.select("id", F.col("id").alias("entity_id"))
    cross = multi_pass_linkage_scores(
        base, batch, ["blk"], params, "id"
    ).filter(F.col("score_micro") >= thresh)
    internal = er_matches(batch, ["blk"], params, "id", thresh)
    got = {
        r["id"]: r["entity_id"]
        for r in update_er_clusters(
            labels,
            cross.unionByName(internal),
            "id",
            new_entities=batch,
        ).collect()
    }
    want = {
        r["id"]: r["entity_id"]
        for r in er_clusters(
            base.unionByName(batch),
            er_matches(
                base.unionByName(batch), ["blk"], params, "id", thresh
            ),
            "id",
        ).collect()
    }
    assert got == want
    assert got[10] == got[11] == 10  # the batch-internal pair merged


def test_er_label_store_fold_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """The 100 TB label-store contract: folding one batch (a) leaves
    the store's content equal to the full recompute, and (b) never
    opens untouched bucket partitions for write — their parquet files
    are byte-identical before and after the fold."""
    import hashlib
    from pathlib import Path

    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        multi_pass_linkage_scores,
        read_er_label_store,
        update_er_label_store,
        write_er_label_store,
    )

    customer = load_table(spark, SF_DIR_SMOKE, "customer")
    m = messy_customers(customer)
    clean = m.filter(F.col("c_custkey") < 1_000_000)
    # a SMALL ingest batch (~15 entities over 64 buckets) so the
    # partition-scoped contract is observable: most buckets untouched
    dirty = m.filter(
        (F.col("c_custkey") >= 1_000_000)
        & ((F.col("c_custkey") - 1_000_000) % 100 == 1)
    )
    path = str(tmp_path / "labels")
    write_er_label_store(
        clean.select("c_custkey", F.col("c_custkey").alias("entity_id")),
        path,
        "c_custkey",
        n_buckets=64,
    )

    def file_hashes():
        return {
            str(p): hashlib.md5(p.read_bytes()).hexdigest()
            for p in Path(path).rglob("*.parquet")
        }

    before = file_hashes()
    batch_matches = multi_pass_linkage_scores(
        clean, dirty, _PASSES, _PARAMS, "c_custkey"
    ).filter(F.col("score_micro") >= _THRESHOLD)
    update_er_label_store(
        spark, path, batch_matches, "c_custkey",
        new_entities=dirty, n_buckets=64,
    )
    after = file_hashes()

    got = sorted(
        map(tuple, read_er_label_store(spark, path).collect())
    )
    full = clean.unionByName(dirty)
    want = sorted(
        map(
            tuple,
            er_clusters(
                full,
                er_matches(
                    full, _PASSES, _PARAMS, "c_custkey", _THRESHOLD
                ),
                "c_custkey",
            ).collect(),
        )
    )
    assert got == want
    # untouched partitions' files byte-identical (dict-subset check:
    # every surviving pre-fold file outside rewritten buckets unchanged)
    untouched = {
        f: h for f, h in before.items() if f in after and after[f] == h
    }
    rewritten_buckets = {
        f.split("__bucket=")[1].split("/")[0]
        for f in after
        if f not in before or before.get(f) != after[f]
    }
    untouched_buckets = {
        f.split("__bucket=")[1].split("/")[0] for f in untouched
    }
    # the fold touched SOME buckets but not all 16
    assert rewritten_buckets and untouched_buckets
    # and every pre-fold file in a bucket that was NOT rewritten
    # survived byte-identical
    for f, h in before.items():
        b = f.split("__bucket=")[1].split("/")[0]
        if b not in rewritten_buckets:
            assert after.get(f) == h, f


def test_er_plan_shapes_no_cartesian_no_global_window(spark):
    """The plan-gate detectors applied to the queued-but-unregistered
    ER surface (registration inherits the CI full-surface gate; this
    pins the shape now): matches are blocked equi-joins (no cartesian
    product), golden-record mode windows are entity-partitioned (no
    global ordered window), and no Python stage anywhere."""
    from nosql_to_sql_migration_tool_spark.plans.audit import (
        physical_plan,
        plan_report_from_string,
    )

    m = messy_customers(load_table(spark, SF_DIR_SMOKE, "customer"))
    matches = er_matches(m, _PASSES, _PARAMS, "c_custkey", _THRESHOLD)
    clusters = er_clusters(m, matches, "c_custkey")
    golden = er_golden_records(
        m,
        clusters,
        "c_custkey",
        {"c_name": "canonical", "c_acctbal": "max", "c_mktsegment": "mode"},
    )
    for df in (matches, golden):
        rep = plan_report_from_string(physical_plan(df))
        assert rep["cartesian_products"] == 0, rep
        assert rep["global_windows"] == 0, rep
        assert rep["python_stages"] == 0, rep


def test_er_label_store_rejects_bucket_config_mismatch(spark, tmp_path):
    """Review r15: folding with an n_buckets differing from the store's
    write-time layout would strand stale rows in old partitions; the
    fold must detect the mismatch against stored __bucket values and
    raise instead of corrupting."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        update_er_label_store,
        write_er_label_store,
    )

    labels = spark.createDataFrame(
        [(i, i) for i in range(50)], ["id", "entity_id"]
    )
    path = str(tmp_path / "labels")
    write_er_label_store(labels, path, "id", n_buckets=16)
    matches = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="n_buckets"):
        update_er_label_store(spark, path, matches, "id", n_buckets=64)


def test_er_survivorship_report_semantics(spark):
    """Hand-checkable conflict counts: n_values = distinct non-NULL
    values in the cluster, n_dissenting = non-NULL members differing
    from the survivorship choice; singletons report zero dissent."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        er_survivorship_report,
    )

    ents = spark.createDataFrame(
        [
            (1, "alpha", 5.0, "B"),
            (2, "beta", 9.0, "A"),
            (3, "alpha", 1.0, "A"),
            (20, "zeta", 7.0, None),
        ],
        ["id", "name", "bal", "seg"],
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (20, 20)], ["id", "entity_id"]
    )
    rules = {"name": "canonical", "bal": "max", "seg": "mode"}
    got = {
        (r["entity_id"], r["field"]): (
            r["n_members"], r["policy"], r["n_values"], r["n_dissenting"]
        )
        for r in er_survivorship_report(
            ents, clusters, "id", rules
        ).collect()
    }
    assert got == {
        # cluster 1: canonical name "alpha" (id 1) — member 2 dissents;
        # max bal 9.0 — members 1 and 3 dissent; mode seg "A" — 1 dissents
        (1, "name"): (3, "canonical", 2, 1),
        (1, "bal"): (3, "max", 3, 2),
        (1, "seg"): (3, "mode", 2, 1),
        # singleton: no dissent anywhere; NULL seg -> 0 values
        (20, "name"): (1, "canonical", 1, 0),
        (20, "bal"): (1, "max", 1, 0),
        (20, "seg"): (1, "mode", 0, 0),
    }


def test_er_survivorship_report_parity_on_messy_fixture(spark):
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        er_survivorship_report,
        er_survivorship_report_sql,
    )

    rules = {
        "c_name": "canonical",
        "c_acctbal": "max",
        "c_mktsegment": "mode",
    }
    m = messy_customers(load_table(spark, SF_DIR_SMOKE, "customer"))
    matches = er_matches(m, _PASSES, _PARAMS, "c_custkey", _THRESHOLD)
    clusters = er_clusters(m, matches, "c_custkey")
    mine = sorted(
        map(
            tuple,
            er_survivorship_report(
                m, clusters, "c_custkey", rules
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/customer.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            er_survivorship_report_sql(
                MESSY_CUSTOMERS_SQL,
                er_matches_sql(
                    MESSY_CUSTOMERS_SQL,
                    _PASSES,
                    _PARAMS,
                    "c_custkey",
                    _THRESHOLD,
                ),
                "c_custkey",
                rules,
            )
        ).fetchall()
    )
    con.close()
    assert mine == want and len(mine) > 0
    # the fixture's ' X' name corruption shows up as measured conflict:
    # some multi-member cluster has a dissenting name
    assert any(
        f == "c_name" and nd > 0 for _, n, f, _, _, nd in mine if n > 1
    )


def test_er_golden_records_latest_policy(spark):
    """'latest' takes the MAX-id member's value (last-writer-wins under
    ingest-monotonic ids) — the mirror of canonical, in both engines."""
    from nosql_to_sql_migration_tool_spark.operators.linkage import (
        er_golden_records_sql,
    )

    ents = spark.createDataFrame(
        [(1, "old"), (2, "mid"), (3, "new"), (9, "solo")],
        ["id", "name"],
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], ["id", "entity_id"]
    )
    got = {
        r["entity_id"]: r["name"]
        for r in er_golden_records(
            ents, clusters, "id", {"name": "latest"}
        ).collect()
    }
    assert got == {1: "new", 9: "solo"}
    # parity on the messy fixture: latest acctbal = the re-keyed dirty
    # twin's value wherever one exists (dirty ids are higher)
    m = messy_customers(load_table(spark, SF_DIR_SMOKE, "customer"))
    matches = er_matches(m, _PASSES, _PARAMS, "c_custkey", _THRESHOLD)
    clusters_m = er_clusters(m, matches, "c_custkey")
    rules = {"c_acctbal": "latest"}
    mine = sorted(
        map(
            tuple,
            er_golden_records(m, clusters_m, "c_custkey", rules).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"'{SF_DIR_SMOKE}/customer.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            er_golden_records_sql(
                MESSY_CUSTOMERS_SQL,
                er_matches_sql(
                    MESSY_CUSTOMERS_SQL,
                    _PASSES,
                    _PARAMS,
                    "c_custkey",
                    _THRESHOLD,
                ),
                "c_custkey",
                rules,
            )
        ).fetchall()
    )
    con.close()
    assert mine == want and len(mine) > 0
