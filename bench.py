#!/usr/bin/env python
"""Benchmark harness — the driver's per-round perf probe.

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line on stdout:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` sink (full computation
of every column, no driver collect, no disk write) so the timing measures
the distributed plan, not result serialization. A tiny warmup job runs
first so JVM/session startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from nosql_to_sql_migration_tool_spark.queries import QUERIES
    from nosql_to_sql_migration_tool_spark.session import get_spark

    spark = get_spark("bench")
    # Warmup: absorb session/JVM/codegen startup outside the timings.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    errors: list[str] = []
    for name, fn in QUERIES.items():
        start = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # one broken query must not zero the bench
            errors.append(name)
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - start, 3)

    result = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }
    if errors:
        result["errors"] = errors
    _regression_report(timings, Path(__file__).resolve().parent)
    print(json.dumps(result), flush=True)


def _regression_report(timings: dict[str, float], repo: Path) -> None:
    """Compare against the newest prior BENCH_r*.json the driver
    recorded and flag >1.5x per-query slowdowns on stderr (stdout stays
    the one-JSON-line contract). A silent-regression guard: round 1's
    bench breakage went unnoticed because nothing diffed rounds."""
    prev_runs = sorted(repo.glob("BENCH_r*.json"))
    prev = None
    for p in reversed(prev_runs):
        try:
            parsed = json.loads(p.read_text()).get("parsed")
        except (OSError, json.JSONDecodeError):
            continue
        if parsed and parsed.get("queries"):
            prev = (p.name, parsed["queries"])
            break
    if prev is None:
        return
    name, old = prev
    flagged = []
    for q, t in timings.items():
        if q in old and old[q] > 0.2 and t > 1.5 * old[q]:
            flagged.append(f"{q}: {old[q]:.2f}s -> {t:.2f}s")
    total_old, total_new = sum(old.values()), sum(timings.values())
    print(
        f"bench: vs {name}: total {total_old:.1f}s -> {total_new:.1f}s "
        f"({len(timings)} vs {len(old)} queries)",
        file=sys.stderr,
    )
    for line in flagged:
        print(f"bench: REGRESSION {line}", file=sys.stderr)


if __name__ == "__main__":
    main()
