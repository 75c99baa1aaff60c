"""Oracle-text fingerprints — the change-detection side of the driver
rotation contract (ADVICE r4, __spark_entry__.py:40).

``_CHANGED_IN_ROUND`` in ``__spark_entry__`` re-queues a query for driver
verification after its semantics change. Spark-side-only changes need a
manual entry, but an oracle-SQL edit is mechanically detectable: this
module pins an md5 per oracle string in ``oracle_fingerprints.json``.
``tests/test_entry_rotation.py`` asserts the pins match the live
``ORACLES`` text, so any oracle edit fails CI until the author reruns

    python -m nosql_to_sql_migration_tool_spark.fingerprints

which re-pins changed/new entries with ``changed_in_round`` = (max
recorded CORRECTNESS round) + 1.  ``__spark_entry__`` merges those
rounds into its rotation, so an edited query re-enters the verification
window automatically — forgetting the bookkeeping is no longer possible.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

_HERE = Path(__file__).resolve().parent
FINGERPRINT_PATH = _HERE / "oracle_fingerprints.json"


def oracle_hash(sql: str) -> str:
    return hashlib.md5(sql.encode("utf-8")).hexdigest()


def load_fingerprints(path: Path = FINGERPRINT_PATH) -> dict[str, dict]:
    try:
        return json.loads(path.read_text())
    except (OSError, json.JSONDecodeError):
        return {}


def changed_rounds(path: Path = FINGERPRINT_PATH) -> dict[str, int]:
    """name -> round its oracle text last changed (1 = initial)."""
    return {
        name: int(entry.get("changed_in_round", 1))
        for name, entry in load_fingerprints(path).items()
    }


def next_round(repo: Path) -> int:
    """(max recorded driver CORRECTNESS round) + 1."""
    rounds = [0]
    for p in repo.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def refresh(repo: Path | None = None, path: Path = FINGERPRINT_PATH) -> dict:
    """Re-pin fingerprints: unchanged entries keep their round, changed or
    new entries get the upcoming round; dropped queries are pruned."""
    from nosql_to_sql_migration_tool_spark.queries import ORACLES

    repo = repo if repo is not None else _HERE.parent
    prior = load_fingerprints(path)
    # Bootstrap (no prior pins): the current oracle text is what the
    # recorded rounds verified, so pin it as round 1, not as a change.
    rnd = next_round(repo) if prior else 1
    pinned: dict[str, dict] = {}
    for name, sql in ORACLES.items():
        h = oracle_hash(sql)
        old = prior.get(name)
        if old and old.get("hash") == h:
            pinned[name] = old
        else:
            pinned[name] = {"hash": h, "changed_in_round": rnd}
    path.write_text(json.dumps(pinned, indent=1, sort_keys=True) + "\n")
    return pinned


if __name__ == "__main__":
    result = refresh()
    print(f"pinned {len(result)} oracle fingerprints -> {FINGERPRINT_PATH}")
