"""The driver verifies a bounded prefix of queries() per round, so the
rotation in __spark_entry__ IS the correctness-coverage mechanism: these
tests pin that it advances as rounds record results and never loses a
query or an oracle."""

from __future__ import annotations

import json

import __spark_entry__ as entry
from nosql_to_sql_migration_tool_spark.queries import ORACLES, QUERIES

WINDOW = 50


def test_ordering_is_a_permutation_with_consistent_oracles():
    names = entry._ordered_names()
    assert sorted(names) == sorted(QUERIES)
    assert list(entry.queries()) == names
    assert list(entry.oracle_sql()) == [n for n in names if n in ORACLES]


def test_never_verified_queries_fill_the_window():
    verified = set(entry._verified_round())
    window = entry._ordered_names()[:WINDOW]
    never = [n for n in QUERIES if n not in verified]
    # every window slot is either never-verified or an explicit priority
    # re-check (e.g. an operator whose semantics changed this round)
    for n in window:
        assert n not in verified or n in entry._PRIORITY_HEAD, n
    # and no never-verified query is displaced while slots remain
    assert len([n for n in window if n in never]) >= min(
        len(never), WINDOW - len(entry._PRIORITY_HEAD)
    )


def test_changed_query_recheck_then_release(tmp_path):
    """ivf_topk changed semantics in round 4: with only its round-2 row
    recorded it must sit in the window; once a round >= 4 records it, it
    must release its slot (and so must the whole satisfied head)."""
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"ivf_topk": {"hash_match": True}})
    )
    assert "ivf_topk" in entry._ordered_names(tmp_path)[:WINDOW]
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps(
            {n: {"hash_match": True} for n in entry._PRIORITY_HEAD}
        )
    )
    nxt = entry._ordered_names(tmp_path)
    verified = set(entry._verified_round(tmp_path))
    # every window slot now goes to a still-unverified query
    assert all(n not in verified for n in nxt[:WINDOW])


def test_rotation_advances_when_a_round_records_results(tmp_path):
    """Simulate the driver writing this round's window: next round's
    ordering must promote the queries that missed the window."""
    current = entry._ordered_names()
    window, missed = current[:WINDOW], current[WINDOW:]
    for prior in sorted(entry._REPO.glob("CORRECTNESS_r*.json")):
        (tmp_path / prior.name).write_text(prior.read_text())
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({n: {"hash_match": True} for n in window})
    )
    nxt = entry._ordered_names(tmp_path)
    never_next = [
        n for n in nxt if n not in entry._verified_round(tmp_path)
    ]
    # everything still unverified (the missed tail) now leads the
    # non-priority part of the ordering
    head = [n for n in nxt[:WINDOW] if n not in entry._PRIORITY_HEAD]
    for n in head[: len(never_next)]:
        assert n in missed or n in never_next, n
    # and the freshly-verified window sinks below older-verified queries
    pos = {n: i for i, n in enumerate(nxt)}
    oldest_round = [
        n for n, r in entry._verified_round(tmp_path).items() if r <= 3
    ]
    if oldest_round and window:
        assert min(pos[n] for n in oldest_round if n in pos) < max(
            pos[n] for n in window
        )
