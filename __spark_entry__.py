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
# they re-enter the priority head until the driver records them in a round
# at or after the change, even though an older CORRECTNESS row exists.
_CHANGED_IN_ROUND = {
    "ivf_topk": 4,  # round 4: sample-trained quantizer (train_limit=256)
}

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
    "semantic_near_dup_multiprobe",
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


def _verified_round(repo: Path = _REPO) -> dict[str, int]:
    """name -> latest round with any recorded driver row (green or not —
    presence means the driver spent budget on it)."""
    seen: dict[str, int] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(rows, dict):
            for name in rows:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def _ordered_names(repo: Path = _REPO) -> list[str]:
    verified = _verified_round(repo)
    # The priority head only applies while its names are unverified (or
    # verified only BEFORE a semantics change) — once the driver records
    # them, they sink with the other verified queries so later rounds
    # spend the window on what is still unseen.
    head = [
        n
        for n in _PRIORITY_HEAD
        if n in QUERIES
        and verified.get(n, 0) < _CHANGED_IN_ROUND.get(n, 1)
    ]
    rest = [n for n in QUERIES if n not in set(head)]
    # Stable sort: never-verified (rank 0) keep registration order, then
    # verified names oldest-round-first.
    rest.sort(key=lambda n: verified.get(n, 0))
    return head + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: snapshot-diff CDC classification
    (SURVEY.md §7.1 M0)."""
    return QUERIES["cdc_classify"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: ORACLES[name] for name in _ordered_names() if name in ORACLES}
