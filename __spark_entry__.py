"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``nosql_to_sql_migration_tool_spark`` — this file
only adapts the package's query registry to the driver's interface.

The driver verifies a bounded prefix of ``queries()`` per round (50 in
rounds 1-3), so registration order IS the correctness budget.
``_ordered_names`` therefore rotates the registry every round: queries
with no CORRECTNESS_r*.json row yet come first (a judge-prioritized
head, then registration order), already-verified queries follow
oldest-verification-first. As the driver records new rounds, the
rotation advances automatically — no manual reordering per round.
"""

from __future__ import annotations

import json
import re
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

from nosql_to_sql_migration_tool_spark.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Queries whose SEMANTICS changed in a given round, mapped to that round:
# they re-enter the verification window until the driver records them in a
# round at or after the change, even though an older CORRECTNESS row exists.
# Manual entries cover Spark-side-only changes; oracle-TEXT changes are
# detected mechanically via oracle_fingerprints.json (see fingerprints.py —
# a pytest fails until `python -m nosql_to_sql_migration_tool_spark.
# fingerprints` re-pins an edited oracle with the upcoming round).
_MANUAL_CHANGED_IN_ROUND: dict[str, int] = {
    # Round 7 emptied this dict: plan-only changes are now detected
    # mechanically (plan_fingerprints.json — builder-AST closure hashes,
    # see fingerprints.plan_hash), so the historical entries (ivf_topk
    # r4, customer_spend_deciles/price_quantile_sketch r6) were pruned
    # once their re-verification rounds were recorded green. Manual
    # entries remain the fallback for semantic changes NO fingerprint
    # can see (e.g. a fixture-data change outside the package).
}


def _changed_in_round() -> dict[str, int]:
    from nosql_to_sql_migration_tool_spark.fingerprints import (
        changed_rounds,
        plan_changed_rounds,
    )

    merged = dict(_MANUAL_CHANGED_IN_ROUND)
    # oracle-TEXT pins and Spark-PLAN pins (round 7: builder-source AST
    # closure hashes) both mechanically re-queue; manual dict is fallback.
    for source in (changed_rounds(), plan_changed_rounds()):
        for name, rnd in source.items():
            if rnd > merged.get(name, 0):
                merged[name] = rnd
    return merged


_CHANGED_IN_ROUND = _changed_in_round()

# Highest-priority names for the next verification window (VERDICT r3 §next
# item 1): the reference's headline normalization pipeline
# (Sql_Schema_Generator.ps1:57-402), then the k-means family whose quantizer
# changed this round (must be re-verified), then the dedup/similarity and
# training-data families the driver has never checked.
_PRIORITY_HEAD = [
    "normalize_main_table",
    "child_nested_object",
    "child_array_of_objects",
    "child_array_of_primitives",
    "variant_doc_extract",
    "ivf_topk",
    "semantic_near_dup",
    "knn_batch",
    "simhash_near_pairs",
    "near_dup_component_labels",
    "dedup_exact_survivors",
    "dedup_near_survivors",
    "dedup_quality_survivors",
    "contamination_scores",
    "ingest_new_docs",
    "clean_documents",
    "train_test_split",
    "corpus_shuffle_order",
    "vocab_coverage_report",
    "length_bucketed_batches",
    "doc_training_windows",
]


def _row_failed(row: object) -> bool:
    """A recorded driver row that did NOT fully verify: an error, or any
    explicit match=false."""
    if not isinstance(row, dict):
        return False
    if row.get("err"):
        return True
    return any(
        row.get(k) is False
        for k in ("rows_match", "schema_match", "hash_match")
    )


def _driver_rows(repo: Path = _REPO) -> dict[str, tuple[int, bool]]:
    """name -> (latest round with any recorded driver row, whether that
    latest row fully verified). Presence means the driver spent budget on
    the query, green or not."""
    seen: dict[str, tuple[int, bool]] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(rows, dict):
            for name, row in rows.items():
                if rnd >= seen.get(name, (0, True))[0]:
                    seen[name] = (rnd, not _row_failed(row))
    return seen


def _verified_round(repo: Path = _REPO) -> dict[str, int]:
    """name -> latest round with any recorded driver row (green or not)."""
    return {n: rnd for n, (rnd, _ok) in _driver_rows(repo).items()}


def _ordered_names(repo: Path = _REPO) -> list[str]:
    rows = _driver_rows(repo)
    # Three bands, each stable within itself:
    #   0: needs driver attention — never verified (registration order,
    #      with the judge-prioritized head first), semantics changed since
    #      the last recorded round, or the last recorded row FAILED
    #      (ADVICE r4: a failed-then-fixed query must not sink to the back).
    #   1: fully verified — oldest-verification-round first.
    head_order = {n: i for i, n in enumerate(_PRIORITY_HEAD)}

    def rank(name: str) -> tuple:
        rnd, ok = rows.get(name, (0, True))
        needs = (
            rnd == 0
            or rnd < _CHANGED_IN_ROUND.get(name, 0)
            or not ok
        )
        if needs:
            # Within the needs-attention band: semantics-CHANGED or
            # FAILED queries (rnd > 0) outrank brand-new ones (rnd ==
            # 0) — a stale green row is silently wrong until re-checked,
            # while a new query is at least locally parity-tested and
            # can wait a round if the band overflows the window.
            return (0, head_order.get(name, len(head_order)), -rnd)
        return (1, len(head_order), rnd)

    names = list(QUERIES)
    names.sort(key=rank)
    return names


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: snapshot-diff CDC classification
    (SURVEY.md §7.1 M0)."""
    return QUERIES["cdc_classify"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: ORACLES[name] for name in _ordered_names() if name in ORACLES}
