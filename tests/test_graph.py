"""Fixed-round PageRank (operators/graph.py): hand-graph goldens,
symmetry, mass conservation, and the unrolled-SQL replay parity."""

from __future__ import annotations

import duckdb

from nosql_to_sql_migration_tool_spark.operators.graph import (
    pagerank,
    pagerank_sql,
)

_PAIRS = [(1, 2), (2, 3), (3, 4), (1, 3), (5, 6)]


def _spark_pairs(spark):
    return spark.createDataFrame(_PAIRS, "id_a long, id_b long")


def test_hub_ranks_highest_and_symmetric_pair_ties(spark):
    out = {r["node"]: r["pagerank"] for r in pagerank(_spark_pairs(spark)).collect()}
    # node 3 touches 1, 2 and 4 — the hub of the 4-node cluster
    assert out[3] == max(out.values())
    # the isolated symmetric pair {5,6} must tie exactly
    assert out[5] == out[6]
    # degree-symmetric nodes 1 and 2 (both link {2|1, 3}) tie exactly
    assert out[1] == out[2]


def test_rank_mass_is_conserved(spark):
    out = [r["pagerank"] for r in pagerank(_spark_pairs(spark)).collect()]
    # an undirected graph has no dangling mass: Σpr = 1 up to the 6-dp
    # rounding applied per contribution and per node each round
    assert abs(sum(out) - 1.0) < 1e-4


def test_sql_replay_is_bit_identical(spark):
    out = {r["node"]: r["pagerank"] for r in pagerank(_spark_pairs(spark)).collect()}
    values = ",".join(f"({a},{b})" for a, b in _PAIRS)
    sql = (
        f"WITH pairs(id_a, id_b) AS (VALUES {values}),\n"
        + pagerank_sql("pairs")
    )
    got = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert out == got


def test_regular_graph_is_uniform(spark):
    # a 4-cycle is 2-regular: every node must hold exactly 1/4
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "id_a long, id_b long"
    )
    out = {r["node"]: r["pagerank"] for r in pagerank(pairs).collect()}
    assert set(out.values()) == {0.25}
